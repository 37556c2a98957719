"""Uniqueness / cardinality rule (R10/R19).

Reference: exactly-one-occurrence cardinality check raising
'Multiple pointOfContact fields' (scripts/errorChecker.py:379-380,400-401,
checkAddress :411-432) and the duplicate-field sweep
(testing-dublin-core.py:72-83).

Scale design (north_star: "uniqueness via salted hash-repartition on clip_id
with skew-aware AQE splits"): a plain ``groupBy(key).count()`` dies when one
key holds a large share of a 10^12-row table — a single reducer gets the hot
key. We do a SALTED two-phase aggregate:

    phase 1: groupBy(key, salt) partial counts   (hot key spread over S salts)
    phase 2: groupBy(key) sum(partial)           (S rows per key, tiny)

Both phases are map-side-combined hash aggregates; AQE
(`spark.sql.adaptive.enabled`) additionally splits skewed shuffle partitions
at runtime. The dup-key set is then joined back (Catalyst/AQE picks broadcast
when the dup set is small — the common case) to emit one violation row per
offending record, matching the reference's per-record exception granularity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anzlic_validator_spark.rules import Rule

DEFAULT_SALTS = 32


def duplicate_keys(df: DataFrame, cols: list[str], n_salts: int = DEFAULT_SALTS) -> DataFrame:
    """Keys occurring more than once, with their total count.

    Returns DataFrame[cols..., n: long] — only keys with n > 1.
    """
    salt = F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).alias("__salt")
    partial = (
        df.select(*cols, salt)
        .groupBy(*cols, "__salt")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    return (
        partial.groupBy(*cols)
        .agg(F.sum("__n").alias("n"))
        .where(F.col("n") > 1)
    )


def unique_violations(df: DataFrame, rule: Rule, key_col: str) -> DataFrame:
    """Per-record violation rows for duplicated keys.

    Output schema: key, rule_id, observed, expected, rule_order.
    observed carries the duplicate count (the reference's message names the
    multiplicity class: 'Multiple <field> fields').
    """
    cols = [str(c) for c in rule.get("columns")]
    dupes = duplicate_keys(df, cols)
    joined = df.select(key_col, *[c for c in cols if c != key_col]).join(dupes, on=cols, how="inner")
    return joined.select(
        F.col(key_col).cast("string").alias("key"),
        F.lit(f"{rule.rule_id}.incorrect").alias("rule_id"),
        F.concat(F.lit("count="), F.col("n").cast("string")).alias("observed"),
        F.lit("unique (" + ",".join(cols) + ")").alias("expected"),
        F.lit(rule.order).cast("int").alias("rule_order"),
    )
