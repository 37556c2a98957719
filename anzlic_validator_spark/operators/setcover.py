"""ALL-OF / AT-LEAST-SET rules (R7/R8) — required values must all appear.

Reference: every configured value must appear among a field's occurrences;
leftovers raise 'Missing [...]' (scripts/errorChecker.py:358-367,389-393,
402-408).  In the columnar model "occurrences" are either the elements of an
ArrayType column (per-record check, pure Catalyst, no shuffle) or the values
of a scalar column within a group (one hash-aggregate collect_set per group).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anzlic_validator_spark.rules import Rule


def all_of_violations(df: DataFrame, rule: Rule, key_col: str) -> DataFrame:
    col = str(rule.get("column"))
    required = [str(v) for v in rule.get("values")]
    group_by = rule.get("group_by")
    req_arr = F.array(*[F.lit(v) for v in required])
    expected = "all of [" + ",".join(required) + "]"

    is_array = dict(df.dtypes).get(col, "").startswith("array")
    if is_array and not group_by:
        # per-record set cover over an array column — no shuffle
        missing = F.array_except(req_arr, F.transform(F.col(col), lambda x: x.cast("string")))
        return (
            df.select(F.col(key_col).alias("__k"), missing.alias("__miss"))
            .where(F.size("__miss") > 0)
            .select(
                F.col("__k").cast("string").alias("key"),
                F.lit(f"{rule.rule_id}.incorrect").alias("rule_id"),
                F.concat(F.lit("Missing ["), F.concat_ws(",", F.array_sort("__miss")), F.lit("]")).alias(
                    "observed"
                ),
                F.lit(expected).alias("expected"),
                F.lit(rule.order).cast("int").alias("rule_order"),
            )
        )

    # scalar column: occurrences within each group (global if no group_by).
    # Group-level keys live in the reserved "__" namespace (like "__table__")
    # so they are never mistaken for record keys: verdicts and the partition
    # summary exclude them, and the batch runner routes them to the reserved
    # bucket instead of hashing a synthetic key into an arbitrary bucket.
    keys = [str(k) for k in (group_by or [])]
    grouped = (
        df.groupBy(*[F.col(k) for k in keys])
        .agg(F.collect_set(F.col(col).cast("string")).alias("__seen"))
        .withColumn("__miss", F.array_except(req_arr, F.col("__seen")))
        .where(F.size("__miss") > 0)
    )
    key_expr = (
        F.concat_ws("|", F.lit("__group__"), *[F.col(k).cast("string") for k in keys])
        if keys
        else F.lit("__table__")
    )
    return grouped.select(
        key_expr.alias("key"),
        F.lit(f"{rule.rule_id}.incorrect").alias("rule_id"),
        F.concat(F.lit("Missing ["), F.concat_ws(",", F.array_sort("__miss")), F.lit("]")).alias(
            "observed"
        ),
        F.lit(expected).alias("expected"),
        F.lit(rule.order).cast("int").alias("rule_order"),
    )
