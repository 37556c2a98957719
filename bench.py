"""Benchmark harness (driver contract + BASELINE.md protocol).

Runs the headline jobs at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...,
     "clips": {...validated-clips/sec detail...}}

Two parts:
1. the oracle-checked demo queries (validation rules, uniqueness,
   referential, all_of, drift, profile, histograms, dedup, ANN, text) —
   each timed to completion (count()).
2. the BASELINE.json headline: full rule-catalog validation INCLUDING the
   Arrow PCM-decode checks over the synthetic clips table sized ∝ SF
   (20k clips/GB-ish at sf0.1), reported as validated clips/sec.
   The clips table is synthesized ONCE into a cache dir and re-read as
   parquet (synthesis excluded from timing, per BASELINE.md §3).

Scaling evidence (N vs 4N): scripts/scaling_bench.py runs part 2 at
local[8] and local[32] via spark-submit and writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CLIPS_CACHE = os.environ.get("SPARK_GRAFT_CLIPS_CACHE", "/tmp/spark_graft_bench")
CLIPS_PER_SF = 200_000  # sf0.1 → 20k clips (~1 GB of PCM)


def parse_sf(sf_dir: str) -> float:
    try:
        return float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        return 0.1


def build_session(cpus: int):
    # must precede JVM launch: Python UDF workers inherit this env. Keeps
    # clip-sized numpy allocations on the heap instead of mmap/munmap pairs
    # (32 workers × per-alloc munmap = TLB-shootdown storm, ~90% sys time).
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(128 * 1024 * 1024))
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("anzlic_validator_bench")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # keep the default 10k-row Arrow batches: small batches looked
        # memory-safe but cost ~2s of IPC overhead per batch — measured 77s
        # vs 5s for the same UDF pass. Batch memory is bounded by partition
        # sizing (maxPartitionBytes), not by shrinking batches.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")  # small heap on purpose: leave RAM to the page cache — a 90g heap evicted the 5GB input and forced ~50MB/s disk re-reads
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def ensure_clips(spark, sf: float, seed: int = 42, n_override: int | None = None) -> tuple[str, str, int]:
    """Synthesize the SF-sized clips + index parquet once; return paths."""
    n = n_override or max(2000, int(CLIPS_PER_SF * sf))
    base = os.path.join(CLIPS_CACHE, f"sf{sf}_n{n}_seed{seed}")
    clips_path, idx_path = f"{base}/clips", f"{base}/index"
    marker = f"{base}/_READY"
    if not os.path.exists(marker):
        from anzlic_validator_spark.synth import clips, transcript_index

        parts = max(CPUS * 2, 16)
        # uncompressed parquet on purpose: the payloads are already
        # codec-compressed, so snappy on top just burns scan-side memory
        # bandwidth (measured: the 5 GB scan pinned at ~1.5 GB/s aggregate
        # regardless of core count)
        clips(spark, n, seed=seed, num_partitions=parts).write.mode("overwrite").option(
            "compression", "none"
        ).parquet(clips_path)
        transcript_index(spark, n, seed=seed, num_partitions=parts).write.mode(
            "overwrite"
        ).parquet(idx_path)
        with open(marker, "w") as fh:
            fh.write(str(n))
    return clips_path, idx_path, n


def bench_clips(spark, sf: float, warmup: int = 1, runs: int = 3, n_override: int | None = None) -> dict:
    """The BASELINE.json headline: full catalog incl PCM decode, timed.

    One warmup run (first-touch page cache + Python worker spawn), then the
    median of ``runs`` measured runs — this sandbox VM shows heavy CPU-steal
    variance, so a single cold sample misstates steady-state throughput.
    """
    from anzlic_validator_spark.run import run_validation

    clips_path, idx_path, n = ensure_clips(spark, sf, n_override=n_override)
    df = spark.read.parquet(clips_path)
    refs = {"transcript_index": spark.read.parquet(idx_path)}
    walls = []
    summary = {}
    for r in range(warmup + runs):
        out = tempfile.mkdtemp(prefix="bench_out_")
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.monotonic()
        summary = run_validation(
            spark,
            df,
            catalog_path=os.path.join(REPO, "configs/rules_default.yaml"),
            output=out,
            key_col="clip_id",
            refs=refs,
            n_buckets=64,
            input_paths=[clips_path],
        )
        wall = time.monotonic() - t0
        shutil.rmtree(out, ignore_errors=True)
        if r >= warmup:
            walls.append(wall)
    walls.sort()
    med = walls[len(walls) // 2]
    # min alongside median (VERDICT r03): this VM's ±30%/2x steal band makes
    # the min the best steady-state estimate and the median the honest
    # central tendency — report both, plus every sample
    return {
        "clips": n,
        "validated_rows": summary.get("rows", 0),
        "violations": summary.get("violations", 0),
        "wall_clock_s": round(med, 3),
        "wall_clock_min_s": round(walls[0], 3),
        "wall_clock_all_s": [round(w, 3) for w in walls],
        "clips_per_sec": round(n / med, 1),
        "clips_per_sec_best": round(n / walls[0], 1),
    }


QUERY_NAMES = [
    "lineitem_rules",
    "lineitem_verdicts",
    "unique_custkey",
    "ref_missing",
    "ref_mapped",
    "all_of_status",
    "drift_ks",
    "profile_lineitem",
    "hist_returnflag",
    "hist_events",
    "report_orders",
    "events_rules",
    "conditional_any_of",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "dedup_winnow",
    "dedup_clusters",
    "dedup_keep",
    "audio_dedup",
    "audio_neardup",
    "image_meta",
    "dedup_embedding",
    "ann_bruteforce",
    "ann_lsh",
    "ann_ivf",
    "embedding_norms",
    "quality",
    "quality_rep",
    "langid",
    "decontaminate",
    "stream_unique",
    "stream_unique_state",
    "resume_buckets",
    "dedup_incremental",
    "audio_dedup_incremental",
    "stream_dedup",
    "audio_neardup_incremental",
    "embedding_dedup_incremental",
]


def _clips_subprocess() -> dict:
    """Run the headline clips bench in its OWN fresh interpreter/JVM.

    r03 post-mortem: running it last inside the suite's session — after 25
    queries' persisted caches, GC pressure and page-cache churn — distorted
    the headline 3x (driver-recorded 62.3 s vs 21.5 s in a fresh session on
    identical code). A subprocess is the same isolation scripts/
    scaling_bench.py already uses for the N-vs-4N evidence."""
    import subprocess

    proc = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--clips-only"],
        capture_output=True,
        text=True,
        timeout=3600,  # a hung child JVM must not wedge the whole bench
    )
    for line in reversed(proc.stdout.strip().splitlines()):
        line = line.strip()
        if line.startswith("{"):
            return json.loads(line)
    raise RuntimeError(
        f"clips bench subprocess failed (rc={proc.returncode}):\n"
        + proc.stderr[-2000:]
    )


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    sf = parse_sf(SF_DIR)
    if "--clips-only" in argv:
        spark = build_session(CPUS)
        spark.sparkContext.setLogLevel("ERROR")
        print(json.dumps(bench_clips(spark, sf)))
        spark.stop()
        return 0

    # headline clips bench FIRST, isolated in a fresh JVM (see _clips_subprocess;
    # the child reads the same SPARK_GRAFT_* env, so sf/cpus match this process)
    clips_stats = _clips_subprocess()

    spark = build_session(CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as e

    qs = e.queries()
    # untimed JVM/codegen warm-up (synthetic op, touches no suite input):
    # otherwise the first timed query absorbs ~5 s of session cold-start
    # (measured: lineitem_rules 6.5-9 s as the cold opener vs 1.6-2.5 s in
    # a warm session) and reads as a regression that isn't one
    spark.range(1_000_000).selectExpr("xxhash64(string(id)) AS h").agg(
        {"h": "max"}
    ).collect()
    timings: dict[str, float] = {}
    for name in QUERY_NAMES:
        t0 = time.monotonic()
        qs[name](spark, SF_DIR).count()
        timings[name] = round(time.monotonic() - t0, 3)
        # several dedup queries persist projections for intra-query reuse
        # and document that the SESSION owner releases them; do so here so
        # pinned storage never accumulates across the suite and distorts
        # later queries (the r03 contamination lesson)
        spark.catalog.clearCache()

    timings["clips_full_validation"] = clips_stats["wall_clock_s"]

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "validation_suite_e2e",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": CPUS,
                "clips": clips_stats,
                # protocol changes vs r03 BENCH numbers (apples-to-apples
                # note for trend readers): clips job now runs FIRST in an
                # isolated fresh JVM; an untimed JVM warm-up precedes the
                # query loop (r03 charged ~5s of cold-start to the first
                # query); caches cleared between queries
                "protocol": {
                    "clips_isolated_subprocess": True,
                    "jvm_warmup_untimed": True,
                    "cache_cleared_between_queries": True,
                },
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
