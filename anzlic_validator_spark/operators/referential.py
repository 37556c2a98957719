"""Referential rules (R13/R14) — value must agree with an authority table.

Reference: per-record HTTPS GET to the LDS API comparing the metadata CRS
against the authoritative one (checkReferenceSystem,
scripts/errorChecker.py:462-500) and the kind→code mapped variant
(checkSpatialRepresentation, :502-532).  The per-record network call becomes
a single distributed JOIN against the authority table (north_star:
"referential checks via broadcast/sort-merge anti-joins of clip_id against
the transcript index").

Scale design: one LEFT OUTER join on the key serves both violation classes
in one shuffle — a NULL ref side is the 'no reference row' case (what a
left-anti join would return), a non-NULL mismatch is the 'incorrect' case.
Catalyst/AQE picks broadcast-hash when the authority fits
``spark.sql.autoBroadcastJoinThreshold`` (set ``broadcast=True`` to force the
hint for known-small authorities, e.g. a codec vocabulary), sort-merge
otherwise; AQE skew-join splits hot key ranges at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from anzlic_validator_spark.errors import InvalidConfigException
from anzlic_validator_spark.rules import Rule


def _prep(df: DataFrame, ref: DataFrame, rule: Rule, key_col: str):
    key = str(rule.get("key", key_col))
    # join_on lets FK-style lookups join on the FK column while reporting
    # violations against the record key (default: join on the key itself,
    # the clip_id↔clip_id shape of the transcript index)
    join_on = str(rule.get("join_on", key))
    col = str(rule.get("column"))
    ref_key = str(rule.get("ref_key"))
    ref_col = str(rule.get("ref_column"))
    left = df.select(
        F.col(key).alias("__k"),
        F.col(join_on).alias("__j"),
        F.col(col).cast("string").alias("__v"),
    )
    right = ref.select(
        F.col(ref_key).alias("__j"), F.col(ref_col).cast("string").alias("__ref")
    )
    if rule.get("broadcast", False):
        right = F.broadcast(right)
    return left.join(right, on="__j", how="left"), col


def referential_violations(
    df: DataFrame, rule: Rule, key_col: str, refs: dict[str, DataFrame]
) -> DataFrame:
    ref = _lookup_ref(rule, refs)
    joined, col = _prep(df, ref, rule, key_col)
    on_missing = rule.get("on_missing", "violation")
    missing = F.col("__ref").isNull()
    mismatch = F.col("__ref").isNotNull() & ~F.col("__v").eqNullSafe(F.col("__ref"))
    cls = (
        F.when(missing, F.lit(f"{rule.rule_id}.missing_ref"))
        .when(mismatch, F.lit(f"{rule.rule_id}.incorrect"))
    )
    cond = mismatch if on_missing == "ignore" else (missing | mismatch)
    return joined.where(cond).select(
        F.col("__k").cast("string").alias("key"),
        cls.alias("rule_id"),
        F.coalesce(F.col("__v"), F.lit("None")).alias("observed"),
        F.coalesce(F.col("__ref"), F.lit(f"reference row for {col}")).alias("expected"),
        F.lit(rule.order).cast("int").alias("rule_order"),
    )


def referential_mapped_violations(
    df: DataFrame, rule: Rule, key_col: str, refs: dict[str, DataFrame]
) -> DataFrame:
    """Authority value passes through a literal mapping before comparison.

    Mirrors checkSpatialRepresentation's kind→code dict
    ({'raster':'grid','grid':'grid','table':'textTable','vector':'vector'},
    errorChecker.py:509-527); an authority value absent from the mapping is
    itself a violation (unknown kind → incorrect, :528-530) unless
    on_unmapped == 'ignore'.
    """
    ref = _lookup_ref(rule, refs)
    mapping = rule.get("mapping") or {}
    if not isinstance(mapping, dict) or not mapping:
        raise InvalidConfigException(f"rule {rule.rule_id}: 'mapping' must be a non-empty dict")
    joined, col = _prep(df, ref, rule, key_col)
    map_expr = F.create_map(*[F.lit(str(x)) for kv in mapping.items() for x in kv])
    joined = joined.withColumn("__mapped", map_expr[F.col("__ref")])
    on_missing = rule.get("on_missing", "violation")
    on_unmapped = rule.get("on_unmapped", "violation")
    missing = F.col("__ref").isNull()
    unmapped = F.col("__ref").isNotNull() & F.col("__mapped").isNull()
    mismatch = F.col("__mapped").isNotNull() & ~F.col("__v").eqNullSafe(F.col("__mapped"))
    cls = (
        F.when(missing, F.lit(f"{rule.rule_id}.missing_ref"))
        .when(unmapped, F.lit(f"{rule.rule_id}.unmapped"))
        .when(mismatch, F.lit(f"{rule.rule_id}.incorrect"))
    )
    cond = mismatch
    if on_missing != "ignore":
        cond = cond | missing
    if on_unmapped != "ignore":
        cond = cond | unmapped
    expected = (
        F.when(missing, F.lit(f"reference row for {col}"))
        .when(unmapped, F.lit("mapped value for " + ",".join(sorted(mapping))))
        .otherwise(F.col("__mapped"))
    )
    return joined.where(cond).select(
        F.col("__k").cast("string").alias("key"),
        cls.alias("rule_id"),
        F.coalesce(F.col("__v"), F.lit("None")).alias("observed"),
        expected.alias("expected"),
        F.lit(rule.order).cast("int").alias("rule_order"),
    )


def _lookup_ref(rule: Rule, refs: dict[str, DataFrame]) -> DataFrame:
    name = rule.get("ref_table")
    if name not in refs:
        raise InvalidConfigException(
            f"rule {rule.rule_id}: ref_table {name!r} not provided (have {sorted(refs)})"
        )
    return refs[name]
