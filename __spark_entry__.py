"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Operator coverage map (SURVEY §2 → query):
  R1/R3/R4/R11/R17 row rules .... lineitem_rules / lineitem_verdicts
  R17 disjunctive (any_of) ...... conditional_any_of
  R10/R19 uniqueness ............ unique_custkey
  R13 referential ............... ref_missing
  R14 referential_mapped ........ ref_mapped
  R7/R8 all_of set cover ........ all_of_status
  drift (KS vs baseline) ........ drift_ks
  A1 histograms ................. hist_returnflag / hist_events
  A2 single-pass profile ........ profile_lineitem
  dedup (exact/minhash/simhash/embedding) dedup_exact / dedup_minhash /
                                  dedup_simhash / dedup_embedding
  similarity (brute / LSH) ...... ann_bruteforce / ann_lsh
  text analysis ................. quality / quality_rep / langid
  decontamination ............... decontaminate
  incremental dedup state ....... dedup_incremental
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

from anzlic_validator_spark.plans import demo, demo_incremental, demo_ml  # noqa: E402


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


def _audio_validate(spark: SparkSession, sf_dir: str):
    from anzlic_validator_spark.engine import validate
    from anzlic_validator_spark.rules import load_catalog
    from anzlic_validator_spark.synth import clips, transcript_index

    n = _sf_rows(sf_dir)
    df = clips(spark, n, seed=42)
    idx = transcript_index(spark, n, seed=42)
    cat = load_catalog(os.path.join(_REPO, "configs/rules_default.yaml"))
    return validate(df, cat, key_col="clip_id", refs={"transcript_index": idx})


def _audio_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full rule-catalog violations over the synthetic clips table as
    (key, rule_id, n) — the generator plants every anomaly by row-index
    arithmetic (synth.CATEGORIES), so the complete expected violation set,
    including duplicate-key multiplicities, is expressible in closed-form
    SQL over generate_series (SQL_AUDIO_VIOLATIONS): a real value oracle
    for the Arrow decode path, not a rows-only check."""
    from pyspark.sql import functions as F

    res = _audio_validate(spark, sf_dir)
    return res.violations.groupBy("key", "rule_id").agg(F.count(F.lit(1)).alias("n"))


def _audio_verdict_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verdict tallies (A3): per first-violated-rule key counts + violation
    row counts, including the passed bucket (first_rule_id NULL). Derived
    from the same closed-form census as SQL_AUDIO_VIOLATIONS."""
    from pyspark.sql import functions as F

    res = _audio_validate(spark, sf_dir)
    return res.verdicts.groupBy("first_rule_id").agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n_violations").alias("n_violations"),
    )


# Closed-form expected-violation census for clips(n=1040, seed=42) under
# configs/rules_default.yaml — pure row-index arithmetic mirroring
# synth.category_of / transcript_index hole-punching, independent of the
# engine. The driver's correctness gate runs at sf0.01 → n = 1040.
_AUDIO_CENSUS_CTE = """
WITH ids AS (
  SELECT CAST(r.range AS BIGINT) AS j FROM range(1040) r
  WHERE r.range % 1000 < 940 OR r.range % 1000 >= 950  -- dup window rows replicate j-1..=base+939
),
c AS (
  SELECT j,
    CASE
      WHEN j % 1000 BETWEEN 950 AND 954 THEN 'null_t'
      WHEN j % 1000 BETWEEN 955 AND 959 THEN 'empty_t'
      WHEN j % 1000 BETWEEN 960 AND 964 THEN 'bad_codec'
      WHEN j % 1000 BETWEEN 965 AND 969 THEN 'sr_mis'
      WHEN j % 1000 BETWEEN 970 AND 974 THEN 'dur_mis'
      WHEN j % 1000 BETWEEN 975 AND 979 THEN 'corrupt'
      WHEN j % 1000 BETWEEN 980 AND 989 THEN 'low_snr'
      WHEN j % 1000 BETWEEN 990 AND 994 THEN 'bad_id'
      WHEN j % 1000 BETWEEN 995 AND 999 THEN 'short_dur'
      ELSE 'correct' END AS cat,
    CASE WHEN j % 1000 = 939
         THEN 1 + greatest(0, least(1040, j + 11) - (j + 1))
         ELSE 1 END AS mult
  FROM ids
),
r AS (
  SELECT j, cat, CAST(mult AS BIGINT) AS mult,
    CASE WHEN cat = 'bad_id' THEN 'CLIP_' || CAST(j AS VARCHAR)
         ELSE 'clip-' || lpad(CAST(j AS VARCHAR), 12, '0') END AS key,
    ((j % 101 <> 100) AND cat <> 'bad_id') AS joined,
    CASE j % 3 WHEN 0 THEN 'pcm_s16le' WHEN 1 THEN 'wav' ELSE 'flac' END AS expect_codec,
    CASE WHEN j % 2 = 1 THEN 'wav' ELSE 'flac' END AS srmis_codec
  FROM c
),
expected AS (
  SELECT key, 'clip_id.format.incorrect' AS rule_id, mult AS n FROM r WHERE cat = 'bad_id'
  UNION ALL SELECT key, 'codec.in_set.incorrect', mult FROM r WHERE cat = 'bad_codec'
  UNION ALL SELECT key, 'dur_ms.range.incorrect', mult FROM r WHERE cat = 'short_dur'
  UNION ALL SELECT key, 'transcript.exists.missing', mult FROM r WHERE cat = 'null_t'
  UNION ALL SELECT key, 'transcript.exists.empty', mult FROM r WHERE cat = 'empty_t'
  UNION ALL SELECT key, 'transcript.referential.missing_ref', mult FROM r
    WHERE cat = 'bad_id' OR j % 101 = 100
  UNION ALL SELECT key, 'transcript.referential.incorrect', mult FROM r
    WHERE joined AND (cat IN ('null_t', 'empty_t') OR j % 97 = 96)
  UNION ALL SELECT key, 'codec.referential_mapped.incorrect', mult FROM r
    WHERE joined AND (cat = 'bad_codec' OR (cat = 'sr_mis' AND srmis_codec <> expect_codec))
  UNION ALL SELECT key, 'clips.audio.decode', mult FROM r WHERE cat IN ('bad_codec', 'corrupt')
  UNION ALL SELECT key, 'clips.audio.sr', mult FROM r WHERE cat = 'sr_mis'
  UNION ALL SELECT key, 'clips.audio.dur', mult FROM r WHERE cat IN ('dur_mis', 'sr_mis')
  UNION ALL SELECT key, 'clips.audio.snr', mult FROM r WHERE cat IN ('low_snr', 'sr_mis')
  UNION ALL SELECT key, 'clip_id.unique.incorrect', mult FROM r WHERE mult > 1
)
"""

SQL_AUDIO_VIOLATIONS = _AUDIO_CENSUS_CTE + """
SELECT key, rule_id, n FROM expected
"""

# verdict tallies from the same census: first rule per key by catalog order
# (ties broken by rule_id string, matching the engine's min(struct) ranking);
# passed keys = all 1030 distinct keys minus the violated ones
SQL_AUDIO_VERDICT_SUMMARY = _AUDIO_CENSUS_CTE + """
, ordered AS (
  SELECT key, rule_id, n,
    CASE
      WHEN rule_id = 'clip_id.format.incorrect' THEN 1
      WHEN rule_id = 'clip_id.unique.incorrect' THEN 2
      WHEN rule_id = 'codec.in_set.incorrect' THEN 3
      WHEN rule_id = 'dur_ms.range.incorrect' THEN 5
      WHEN rule_id LIKE 'transcript.exists.%' THEN 6
      WHEN rule_id LIKE 'transcript.referential.%' THEN 7
      WHEN rule_id = 'codec.referential_mapped.incorrect' THEN 8
      WHEN rule_id LIKE 'clips.audio.%' THEN 9
    END AS ord
  FROM expected
),
per_key AS (  -- min by (ord, rule_id) via a sortable tag (min_by lacks struct keys)
  SELECT key,
    substr(min(lpad(CAST(ord AS VARCHAR), 2, '0') || '~' || rule_id), 4) AS first_rule_id,
    CAST(sum(n) AS BIGINT) AS n_violations
  FROM ordered GROUP BY key
),
tallies AS (
  -- CASTs: DuckDB sum() yields HUGEINT; Spark returns BIGINT and the
  -- driver's value-hash is type-sensitive (VERDICT r02 "What's wrong" #1).
  SELECT first_rule_id, count(*) AS n_keys,
         CAST(sum(n_violations) AS BIGINT) AS n_violations
  FROM per_key GROUP BY first_rule_id
)
SELECT first_rule_id, n_keys, n_violations FROM tallies
UNION ALL
SELECT NULL,
       (SELECT count(DISTINCT key) FROM r) - (SELECT count(*) FROM per_key),
       CAST(0 AS BIGINT)
"""


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
        "dedup_winnow": demo_ml.q_dedup_winnow,
        "dedup_clusters": demo_ml.q_dedup_clusters,
        "dedup_keep": demo_ml.q_dedup_keep,
        "audio_dedup": demo_ml.q_audio_dedup,
        "audio_neardup": demo_ml.q_audio_neardup,
        "image_meta": demo_ml.q_image_meta,
        "dedup_embedding": demo_ml.q_dedup_embedding,
        "ann_bruteforce": demo_ml.q_ann_bruteforce,
        "ann_lsh": demo_ml.q_ann_lsh,
        "ann_ivf": demo_ml.q_ann_ivf,
        "embedding_norms": demo_ml.q_embedding_norms,
        "quality": demo_ml.q_quality,
        "quality_rep": demo_ml.q_quality_rep,
        "langid": demo_ml.q_langid,
        "decontaminate": demo_ml.q_decontaminate,
        "audio_violations": _audio_violations,
        "audio_verdict_summary": _audio_verdict_summary,
        "stream_unique": demo_incremental.q_stream_unique,
        "stream_unique_state": demo_incremental.q_stream_unique_state,
        "resume_buckets": demo_incremental.q_resume_buckets,
        "dedup_incremental": demo_incremental.q_dedup_incremental,
        "audio_dedup_incremental": demo_incremental.q_audio_dedup_incremental,
        "stream_dedup": demo_incremental.q_stream_dedup,
        "audio_neardup_incremental": demo_incremental.q_audio_neardup_incremental,
        "embedding_dedup_incremental": demo_incremental.q_embedding_dedup_incremental,
    }


def oracle_sql() -> dict[str, str]:
    # 100% oracle coverage (r02): audio_* use the closed-form planted-anomaly
    # census, simhash the md5 bit-vote re-expressed in DuckDB, ann_lsh the
    # measured-recall fixture.
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
        "dedup_simhash": demo_ml.SQL_DEDUP_SIMHASH,
        "dedup_winnow": demo_ml.SQL_DEDUP_WINNOW,
        "dedup_clusters": demo_ml.SQL_DEDUP_CLUSTERS,
        "dedup_keep": demo_ml.SQL_DEDUP_KEEP,
        "audio_dedup": demo_ml.SQL_AUDIO_DEDUP,
        "audio_neardup": demo_ml.SQL_AUDIO_NEARDUP,
        "image_meta": demo_ml.SQL_IMAGE_META,
        "dedup_embedding": demo_ml.SQL_DEDUP_EMBEDDING,
        "ann_bruteforce": demo_ml.SQL_ANN_BRUTEFORCE,
        "ann_lsh": demo_ml.SQL_ANN_LSH,
        "ann_ivf": demo_ml.SQL_ANN_IVF,
        "embedding_norms": demo_ml.SQL_EMBEDDING_NORMS,
        "quality": demo_ml.SQL_QUALITY,
        "quality_rep": demo_ml.SQL_QUALITY_REP,
        "langid": demo_ml.SQL_LANGID,
        "decontaminate": demo_ml.SQL_DECONTAMINATE,
        "audio_violations": SQL_AUDIO_VIOLATIONS,
        "audio_verdict_summary": SQL_AUDIO_VERDICT_SUMMARY,
        "stream_unique": demo_incremental.SQL_STREAM_UNIQUE,
        "stream_unique_state": demo_incremental.SQL_STREAM_UNIQUE_STATE,
        "resume_buckets": demo_incremental.SQL_RESUME_BUCKETS,
        "dedup_incremental": demo_incremental.SQL_DEDUP_INCREMENTAL,
        "audio_dedup_incremental": demo_incremental.SQL_AUDIO_DEDUP_INCREMENTAL,
        "stream_dedup": demo_incremental.SQL_STREAM_DEDUP,
        "audio_neardup_incremental": demo_incremental.SQL_AUDIO_NEARDUP_INCREMENTAL,
        "embedding_dedup_incremental": demo_incremental.SQL_EMBEDDING_DEDUP_INCREMENTAL,
    }
