"""Checkpoint-manifest resume semantics (north_rule; resolve.py:150-187,
cache.py:95-102, metadata_updater.py dry-run/skip analogs)."""

import json
import os

import pytest

from anzlic_validator_spark.manifest import Manifest, input_snapshot
from anzlic_validator_spark.run import run_validation
from anzlic_validator_spark.synth import clips, transcript_index

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CATALOG = os.path.join(REPO, "configs/rules_default.yaml")


@pytest.fixture(scope="module")
def data_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("clipsdata")
    clips(spark, 1040, seed=42, num_partitions=4).write.parquet(str(d / "clips"))
    transcript_index(spark, 1040, seed=42).write.parquet(str(d / "index"))
    return d


def _run(spark, data_dir, out, **kw):
    df = spark.read.parquet(str(data_dir / "clips"))
    refs = {"transcript_index": spark.read.parquet(str(data_dir / "index"))}
    return run_validation(
        spark, df, catalog_path=kw.pop("catalog", CATALOG), output=str(out),
        refs=refs, n_buckets=8, input_paths=[str(data_dir / "clips")], **kw
    )


def _violations(spark, out):
    return sorted(
        map(tuple, spark.read.parquet(f"{out}/violations").select(
            "key", "rule_id", "observed", "expected").collect())
    )


def test_resume_skips_and_reproduces(spark, data_dir, tmp_path):
    out = tmp_path / "out"
    s1 = _run(spark, data_dir, out)
    assert s1["pending_buckets"] == list(range(8))
    v1 = _violations(spark, out)
    assert v1  # anomaly categories fire

    # identical rerun: everything skipped
    s2 = _run(spark, data_dir, out)
    assert s2["pending_buckets"] == [] and len(s2["skipped_buckets"]) == 8

    # drop three buckets from the manifest → only those revalidate,
    # and the full output is reproduced byte-identically
    mpath = out / "manifest.json"
    doc = json.loads(mpath.read_text())
    for b in ("1", "4", "6"):
        del doc["buckets"][b]
    mpath.write_text(json.dumps(doc))
    s3 = _run(spark, data_dir, out)
    assert s3["pending_buckets"] == [1, 4, 6]
    assert _violations(spark, out) == v1


def test_catalog_change_invalidates(spark, data_dir, tmp_path):
    out = tmp_path / "out"
    _run(spark, data_dir, out)
    # a changed catalog (different hash) must revalidate every bucket
    alt = tmp_path / "alt_rules.yaml"
    alt.write_text(
        "version: 1\nrules:\n  - {id: clip_id.exists, type: exists, column: clip_id}\n"
    )
    s = _run(spark, data_dir, out, catalog=str(alt))
    assert s["pending_buckets"] == list(range(8))


def test_dry_run_writes_nothing(spark, data_dir, tmp_path):
    out = tmp_path / "out"
    s = _run(spark, data_dir, out, dry_run=True)
    assert s["dry_run"] and s["pending_buckets"] == list(range(8))
    assert not (out / "manifest.json").exists()
    assert not (out / "violations").exists()


def test_input_snapshot_sensitivity(tmp_path):
    f = tmp_path / "x.parquet"
    f.write_bytes(b"aaa")
    s1 = input_snapshot([str(tmp_path)])
    f.write_bytes(b"aaab")
    assert input_snapshot([str(tmp_path)]) != s1


def test_bucket_count_mismatch_rejected(tmp_path):
    m = Manifest.load(str(tmp_path), n_buckets=8)
    m.record_run("r1", "rv", "snap", [], {0: {"rows": 1}}, 0.1)
    with pytest.raises(ValueError, match="n_buckets"):
        Manifest.load(str(tmp_path), n_buckets=16)
