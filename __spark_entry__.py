"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Operator coverage map (SURVEY §2 → query):
  R1/R3/R4/R11/R17 row rules .... lineitem_rules / lineitem_verdicts
  R10/R19 uniqueness ............ unique_custkey
  R13 referential ............... ref_missing
  R14 referential_mapped ........ ref_mapped
  R7/R8 all_of set cover ........ all_of_status
  drift (KS vs baseline) ........ drift_ks
  A1 histograms ................. hist_returnflag / hist_events
  A2 single-pass profile ........ profile_lineitem
  dedup (exact / minhash / simhash) dedup_exact / dedup_minhash / dedup_simhash
  similarity (brute / LSH) ...... ann_bruteforce / ann_lsh
  text analysis ................. quality / langid
  R18 audio decode (full catalog) audio_violations / audio_verdict_summary
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from anzlic_validator_spark.plans import demo, demo_ml  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full row-rule catalog validation over lineitem at sf0.001."""
    return demo.q_lineitem_rules(spark, "/root/testdata/sf0.001")


def _sf_rows(sf_dir: str, per_unit: int = 100000, floor: int = 1040) -> int:
    """Deterministic synthetic-clips row count proportional to the SF."""
    tail = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf = float(tail)
    except ValueError:
        sf = 0.001
    return max(floor, int(per_unit * sf))


def _audio_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anzlic_validator_spark.engine import validate
    from anzlic_validator_spark.rules import load_catalog
    from anzlic_validator_spark.synth import clips, transcript_index

    n = _sf_rows(sf_dir)
    df = clips(spark, n, seed=42)
    idx = transcript_index(spark, n, seed=42)
    cat = load_catalog(os.path.join(_REPO, "configs/rules_default.yaml"))
    return validate(df, cat, key_col="clip_id", refs={"transcript_index": idx}).violations


def _audio_verdict_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    from anzlic_validator_spark.engine import validate
    from anzlic_validator_spark.rules import load_catalog
    from anzlic_validator_spark.synth import clips, transcript_index

    n = _sf_rows(sf_dir)
    df = clips(spark, n, seed=42)
    idx = transcript_index(spark, n, seed=42)
    cat = load_catalog(os.path.join(_REPO, "configs/rules_default.yaml"))
    res = validate(df, cat, key_col="clip_id", refs={"transcript_index": idx})
    return res.partition_summary(n_buckets=16)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "lineitem_rules": demo.q_lineitem_rules,
        "lineitem_verdicts": demo.q_lineitem_verdicts,
        "unique_custkey": demo.q_unique_custkey,
        "ref_missing": demo.q_ref_missing,
        "ref_mapped": demo.q_ref_mapped,
        "all_of_status": demo.q_all_of_status,
        "drift_ks": demo.q_drift_ks,
        "profile_lineitem": demo.q_profile_lineitem,
        "hist_returnflag": demo.q_hist_returnflag,
        "hist_events": demo.q_hist_events,
        "report_orders": demo.q_report_orders,
        "events_rules": demo.q_events_rules,
        "conditional_any_of": demo.q_conditional_any_of,
        "dedup_exact": demo_ml.q_dedup_exact,
        "dedup_minhash": demo_ml.q_dedup_minhash,
        "dedup_simhash": demo_ml.q_dedup_simhash,
        "ann_bruteforce": demo_ml.q_ann_bruteforce,
        "ann_lsh": demo_ml.q_ann_lsh,
        "embedding_norms": demo_ml.q_embedding_norms,
        "quality": demo_ml.q_quality,
        "langid": demo_ml.q_langid,
        "audio_violations": _audio_violations,
        "audio_verdict_summary": _audio_verdict_summary,
    }


def oracle_sql() -> dict[str, str]:
    # audio_* and the approximate ops (simhash, lsh) are non-SQL-expressible
    # (Arrow decode UDFs / bit-vote signatures / approximate recall) →
    # rows-only checks, per the driver contract.
    return {
        "lineitem_rules": demo.SQL_LINEITEM_RULES,
        "lineitem_verdicts": demo.SQL_LINEITEM_VERDICTS,
        "unique_custkey": demo.SQL_UNIQUE_CUSTKEY,
        "ref_missing": demo.SQL_REF_MISSING,
        "ref_mapped": demo.SQL_REF_MAPPED,
        "all_of_status": demo.SQL_ALL_OF_STATUS,
        "drift_ks": demo.SQL_DRIFT_KS,
        "profile_lineitem": demo.SQL_PROFILE_LINEITEM,
        "hist_returnflag": demo.SQL_HIST_RETURNFLAG,
        "hist_events": demo.SQL_HIST_EVENTS,
        "report_orders": demo.SQL_REPORT_ORDERS,
        "events_rules": demo.SQL_EVENTS_RULES,
        "conditional_any_of": demo.SQL_CONDITIONAL_ANY_OF,
        "dedup_exact": demo_ml.SQL_DEDUP_EXACT,
        "dedup_minhash": demo_ml.SQL_DEDUP_MINHASH,
        "ann_bruteforce": demo_ml.SQL_ANN_BRUTEFORCE,
        "embedding_norms": demo_ml.SQL_EMBEDDING_NORMS,
        "quality": demo_ml.SQL_QUALITY,
        "langid": demo_ml.SQL_LANGID,
    }
