"""Single-pass per-column profiling + value histograms.

Reference analogs:
- per-field presence counts across the catalog (testing-dublin-core.py:49-51,
  85-92) → one ``agg`` carrying every column's stats (A2);
- per-field value-frequency "unique lists" split Private/Public
  (Metadata-LDS/Contact/contactDetailsUniqueList.txt) → grouped histogram
  (A1);
- the ~70-field wide report row (allMetadataCheck.py:204-303) → the profile
  output itself.

Scale design: ONE aggregation pass computes count/nulls/blank/distinct for
every column simultaneously (map-side combined, no per-column jobs).
Distinct counts use HyperLogLog++ (`approx_count_distinct`) so state stays
O(1) per column at 10^12 rows; quantiles use `percentile_approx`
(Greenwald-Khanna / KLL-class sketch) — both merge associatively inside
Spark's partial aggregation, which IS the single-pass treeAggregate-of-
sketches the north_star asks for, without driver-side merge code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_PROBS = [0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99]

_NUMERIC = ("int", "bigint", "double", "float", "smallint", "tinyint", "decimal")


def _is_numeric(dtype: str) -> bool:
    return any(dtype.startswith(n) for n in _NUMERIC)


def profile(df: DataFrame, columns: list[str] | None = None, approx: bool = True) -> DataFrame:
    """Long-format profile: one row per (column, stat).

    stats: n, nulls, blanks (string cols), distinct, min, max, mean (numeric).
    ``approx=False`` swaps HLL++ for exact countDistinct (oracle-comparable
    at small SF; never use exact at production scale).
    """
    cols = columns or df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        distinct = (
            F.approx_count_distinct(c) if approx else F.countDistinct(c)
        )
        aggs.append(distinct.cast("long").alias(f"{c}__distinct"))
        if _is_numeric(dtypes[c]):
            aggs.append(F.min(F.col(c).cast("double")).alias(f"{c}__min"))
            aggs.append(F.max(F.col(c).cast("double")).alias(f"{c}__max"))
            aggs.append(F.avg(F.col(c).cast("double")).alias(f"{c}__mean"))
        elif dtypes[c] == "string":
            aggs.append(
                F.sum((F.length(F.trim(F.col(c))) == 0).cast("long")).alias(f"{c}__blanks")
            )
    one = df.agg(*aggs)
    # unpivot to long format: stack() stays in the JVM
    pairs = []
    for c in cols:
        pairs.append((c, "n", "__n"))
        pairs.append((c, "nulls", f"{c}__nulls"))
        pairs.append((c, "distinct", f"{c}__distinct"))
        if _is_numeric(dtypes[c]):
            for s in ("min", "max", "mean"):
                pairs.append((c, s, f"{c}__{s}"))
        elif dtypes[c] == "string":
            pairs.append((c, "blanks", f"{c}__blanks"))
    stack_args = ", ".join(f"'{c}', '{s}', cast(`{a}` as double)" for c, s, a in pairs)
    return one.selectExpr(
        f"stack({len(pairs)}, {stack_args}) as (column, stat, value)"
    )


def quantile_profile(
    df: DataFrame, columns: list[str], probs: list[float] | None = None
) -> dict:
    """Baseline profile for the drift rule: per-column quantile grids.

    One job; `percentile_approx` computes all grids in a single pass.
    Returns {"probs": [...], "columns": {col: {"probs":…, "quantiles":…}}}.
    """
    probs = probs or DEFAULT_PROBS
    aggs = [
        F.percentile_approx(F.col(c).cast("double"), probs, 10000).alias(c) for c in columns
    ]
    row = df.agg(*aggs).collect()[0]
    return {
        "probs": probs,
        "columns": {
            c: {"probs": probs, "quantiles": [float(x) for x in row[c]]} for c in columns
        },
    }


def value_histogram(
    df: DataFrame, column: str, group_cols: list[str] | None = None, top_k: int | None = None
) -> DataFrame:
    """Value-frequency histogram, optionally split by grouping columns
    (the Private/Public split of the reference's unique lists).

    Returns DataFrame[*group_cols, value, n] ordered by n desc.  At scale,
    pass top_k — the full distinct-value set of a high-cardinality column
    does not belong on one node.
    """
    groups = [F.col(g) for g in (group_cols or [])]
    out = (
        df.groupBy(*groups, F.col(column).cast("string").alias("value"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("value"))
    )
    return out.limit(top_k) if top_k else out
