"""Driver-checkable demo queries over the TESTDATA tables.

Each entry exercises an operator family from SURVEY §2 through the real
engine (validation rules) or the training-data operators, paired with an
ANSI-SQL oracle that DuckDB runs on the same parquet — the driver compares
row counts, schemas and order-insensitive value hashes at sf0.01
(see /root/repo/__spark_entry__.py).

Naming discipline: every computed column is aliased identically in the Spark
plan and the oracle SQL (the driver sorts columns by name before hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from anzlic_validator_spark.engine import validate
from anzlic_validator_spark.functions.display import camel_title, md_to_html
from anzlic_validator_spark.operators.drift import ks_distance_df
from anzlic_validator_spark.operators.profile import profile, value_histogram
from anzlic_validator_spark.rules import parse_catalog
from anzlic_validator_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# validation: row rules over lineitem (R1/R3/R4/R11/R17 analog)
# --------------------------------------------------------------------------

LINEITEM_CATALOG = {
    "rules": [
        {"id": "rf", "type": "in_set", "column": "l_returnflag", "values": ["A", "N"]},
        {"id": "qty", "type": "range", "column": "l_quantity", "min": 1, "max": 40},
        {"id": "ls", "type": "format", "column": "l_linestatus", "pattern": "^[OF]$"},
        {
            "id": "cond",
            "type": "conditional",
            "when": {"column": "l_returnflag", "equals": "R"},
            "then": {"type": "value", "column": "l_linestatus", "value": "F"},
        },
    ]
}


def q_lineitem_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True).withColumn(
        "li_key", F.concat_ws("-", "l_orderkey", "l_linenumber")
    )
    res = validate(li, parse_catalog(LINEITEM_CATALOG), key_col="li_key")
    return res.violations


SQL_LINEITEM_RULES = """
WITH li AS (
  SELECT l_orderkey || '-' || l_linenumber AS key, * FROM lineitem
)
SELECT key, 'rf.incorrect' AS rule_id, l_returnflag AS observed,
       'one of [A,N]' AS expected
FROM li WHERE l_returnflag NOT IN ('A','N')
UNION ALL
SELECT key, 'qty.incorrect', CAST(l_quantity AS VARCHAR), 'in [1,40]'
FROM li WHERE l_quantity < 1 OR l_quantity > 40
UNION ALL
SELECT key, 'ls.incorrect', l_linestatus, 'matches ^[OF]$'
FROM li WHERE NOT regexp_matches(l_linestatus, '^[OF]$')
UNION ALL
SELECT key, 'cond.incorrect', l_linestatus, 'F'
FROM li WHERE l_returnflag = 'R' AND l_linestatus <> 'F'
"""

# --------------------------------------------------------------------------
# validation: verdicts — fail-fast headline per record (errorChecker dispatch)
# --------------------------------------------------------------------------


def q_lineitem_verdicts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem", spread=True).withColumn(
        "li_key", F.concat_ws("-", "l_orderkey", "l_linenumber")
    )
    res = validate(li, parse_catalog(LINEITEM_CATALOG), key_col="li_key")
    return res.verdicts.select(
        "key",
        F.col("passed").cast("int").alias("passed"),
        F.coalesce("first_rule_id", F.lit("")).alias("first_rule_id"),
        "n_violations",
    )


SQL_LINEITEM_VERDICTS = """
-- NOTE: the generated lineitem has duplicate (orderkey, linenumber) pairs,
-- so verdicts (one per distinct key) use DISTINCT keys as the base set.
WITH li AS (
  SELECT l_orderkey || '-' || l_linenumber AS key, * FROM lineitem
),
k AS (
  SELECT DISTINCT key FROM li
),
v AS (
  SELECT key, rule_id, ord FROM (
    SELECT key, 'rf.incorrect' AS rule_id, 0 AS ord FROM li WHERE l_returnflag NOT IN ('A','N')
    UNION ALL
    SELECT key, 'qty.incorrect', 1 FROM li WHERE l_quantity < 1 OR l_quantity > 40
    UNION ALL
    SELECT key, 'ls.incorrect', 2 FROM li WHERE NOT regexp_matches(l_linestatus, '^[OF]$')
    UNION ALL
    SELECT key, 'cond.incorrect', 3 FROM li WHERE l_returnflag = 'R' AND l_linestatus <> 'F'
  )
)
SELECT k.key,
       CAST(CASE WHEN f.key IS NULL THEN 1 ELSE 0 END AS INT) AS passed,
       COALESCE(f.first_rule_id, '') AS first_rule_id,
       COALESCE(f.n_violations, 0) AS n_violations
FROM k
LEFT JOIN (
  -- tiebreak mirrors Spark's min(struct(rule_order, rule_id))
  SELECT key,
         min_by(rule_id, lpad(CAST(ord AS VARCHAR), 3, '0') || '|' || rule_id) AS first_rule_id,
         count(*) AS n_violations
  FROM v GROUP BY key
) f USING (key)
"""

# --------------------------------------------------------------------------
# uniqueness (R10/R19): orders sharing a customer — salted dup detection
# --------------------------------------------------------------------------


def q_unique_custkey(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cat = parse_catalog({"rules": [{"id": "ck", "type": "unique", "columns": ["o_custkey"]}]})
    return validate(orders, cat, key_col="o_orderkey").violations


SQL_UNIQUE_CUSTKEY = """
WITH d AS (
  SELECT o_custkey, count(*) AS n FROM orders GROUP BY 1 HAVING count(*) > 1
)
SELECT CAST(o_orderkey AS VARCHAR) AS key,
       'ck.incorrect' AS rule_id,
       'count=' || n AS observed,
       'unique (o_custkey)' AS expected
FROM orders JOIN d USING (o_custkey)
"""

# --------------------------------------------------------------------------
# referential (R13): orders → customer authority with a hole punched in it
# --------------------------------------------------------------------------


def q_ref_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") != "BUILDING")
    cat = parse_catalog(
        {
            "rules": [
                {
                    "id": "fk",
                    "type": "referential",
                    "column": "o_custkey",
                    "key": "o_orderkey",
                    "join_on": "o_custkey",
                    "ref_table": "cust",
                    "ref_key": "c_custkey",
                    "ref_column": "c_custkey",
                }
            ]
        }
    )
    return validate(orders, cat, key_col="o_orderkey", refs={"cust": cust}).violations


SQL_REF_MISSING = """
SELECT CAST(o_orderkey AS VARCHAR) AS key,
       'fk.missing_ref' AS rule_id,
       CAST(o_custkey AS VARCHAR) AS observed,
       'reference row for o_custkey' AS expected
FROM orders
WHERE o_custkey NOT IN (SELECT c_custkey FROM customer WHERE c_mktsegment <> 'BUILDING')
"""

# --------------------------------------------------------------------------
# referential_mapped (R14): nation → region name→key mapping (AFRICA broken
# on purpose so the mismatch class fires)
# --------------------------------------------------------------------------

_REGION_MAP = {"AFRICA": "9", "AMERICA": "1", "ASIA": "2", "EUROPE": "3", "MIDDLE EAST": "4"}


def q_ref_mapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cat = parse_catalog(
        {
            "rules": [
                {
                    "id": "rg",
                    "type": "referential_mapped",
                    "column": "n_regionkey",
                    "key": "n_regionkey",
                    "ref_table": "region",
                    "ref_key": "r_regionkey",
                    "ref_column": "r_name",
                    "mapping": _REGION_MAP,
                }
            ]
        }
    )
    return validate(nation, cat, key_col="n_regionkey", refs={"region": region}).violations


SQL_REF_MAPPED = """
SELECT CAST(n_regionkey AS VARCHAR) AS key,
       'rg.incorrect' AS rule_id,
       CAST(n_regionkey AS VARCHAR) AS observed,
       m.v AS expected
FROM nation
JOIN region ON n_regionkey = r_regionkey
JOIN (VALUES ('AFRICA','9'),('AMERICA','1'),('ASIA','2'),('EUROPE','3'),('MIDDLE EAST','4')) m(k,v)
  ON r_name = m.k
WHERE CAST(n_regionkey AS VARCHAR) <> m.v
"""

# --------------------------------------------------------------------------
# all_of set cover (R7/R8): orders that never reached both linestatuses
# --------------------------------------------------------------------------


def q_all_of_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cat = parse_catalog(
        {
            "rules": [
                {
                    "id": "st",
                    "type": "all_of",
                    "column": "l_linestatus",
                    "values": ["O", "F"],
                    "group_by": ["l_orderkey"],
                }
            ]
        }
    )
    return validate(li, cat, key_col="l_orderkey").violations


# group-level keys live in the reserved '__group__|' namespace (engine.py
# RESERVED_KEY_PREFIX) so they are never mistaken for record keys
SQL_ALL_OF_STATUS = """
SELECT '__group__|' || CAST(l_orderkey AS VARCHAR) AS key,
       'st.incorrect' AS rule_id,
       'Missing [' || CASE
         WHEN NOT bool_or(l_linestatus = 'F') AND NOT bool_or(l_linestatus = 'O') THEN 'F,O'
         WHEN NOT bool_or(l_linestatus = 'F') THEN 'F'
         ELSE 'O' END || ']' AS observed,
       'all of [O,F]' AS expected
FROM lineitem
GROUP BY l_orderkey
HAVING NOT (bool_or(l_linestatus = 'O') AND bool_or(l_linestatus = 'F'))
"""

# --------------------------------------------------------------------------
# drift: KS distance of l_quantity vs a fixed baseline grid
# --------------------------------------------------------------------------

_KS_PROBS = [0.25, 0.5, 0.75]
_KS_QUANTILES = [13.0, 25.0, 38.0]


def q_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return ks_distance_df(li, "l_quantity", _KS_PROBS, _KS_QUANTILES).select(
        F.round("ks", 6).alias("ks")
    )


SQL_DRIFT_KS = """
SELECT round(greatest(
  abs(avg(CASE WHEN l_quantity <= 13.0 THEN 1.0 ELSE 0.0 END) - 0.25),
  abs(avg(CASE WHEN l_quantity <= 25.0 THEN 1.0 ELSE 0.0 END) - 0.5),
  abs(avg(CASE WHEN l_quantity <= 38.0 THEN 1.0 ELSE 0.0 END) - 0.75)
), 6) AS ks
FROM lineitem
"""

# --------------------------------------------------------------------------
# profile (A2): single-pass per-column stats (exact flavor for the oracle)
# --------------------------------------------------------------------------

_PROFILE_STATS = ("n", "nulls", "distinct", "min", "max")


def q_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    prof = profile(li, ["l_quantity", "l_extendedprice", "l_returnflag"], approx=False)
    return prof.where(F.col("stat").isin(*_PROFILE_STATS)).select(
        "column", "stat", F.round("value", 4).alias("value")
    )


SQL_PROFILE_LINEITEM = """
WITH s AS (
  SELECT
    count(*)::DOUBLE AS q_n, sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)::DOUBLE AS q_nulls,
    count(DISTINCT l_quantity)::DOUBLE AS q_d, min(l_quantity)::DOUBLE AS q_min, max(l_quantity)::DOUBLE AS q_max,
    count(*)::DOUBLE AS p_n, sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END)::DOUBLE AS p_nulls,
    count(DISTINCT l_extendedprice)::DOUBLE AS p_d, min(l_extendedprice)::DOUBLE AS p_min, max(l_extendedprice)::DOUBLE AS p_max,
    count(*)::DOUBLE AS r_n, sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END)::DOUBLE AS r_nulls,
    count(DISTINCT l_returnflag)::DOUBLE AS r_d
  FROM lineitem
)
SELECT 'l_quantity' AS "column", 'n' AS stat, round(q_n,4) AS value FROM s
UNION ALL SELECT 'l_quantity','nulls',round(q_nulls,4) FROM s
UNION ALL SELECT 'l_quantity','distinct',round(q_d,4) FROM s
UNION ALL SELECT 'l_quantity','min',round(q_min,4) FROM s
UNION ALL SELECT 'l_quantity','max',round(q_max,4) FROM s
UNION ALL SELECT 'l_extendedprice','n',round(p_n,4) FROM s
UNION ALL SELECT 'l_extendedprice','nulls',round(p_nulls,4) FROM s
UNION ALL SELECT 'l_extendedprice','distinct',round(p_d,4) FROM s
UNION ALL SELECT 'l_extendedprice','min',round(p_min,4) FROM s
UNION ALL SELECT 'l_extendedprice','max',round(p_max,4) FROM s
UNION ALL SELECT 'l_returnflag','n',round(r_n,4) FROM s
UNION ALL SELECT 'l_returnflag','nulls',round(r_nulls,4) FROM s
UNION ALL SELECT 'l_returnflag','distinct',round(r_d,4) FROM s
"""

# --------------------------------------------------------------------------
# histograms (A1): value-frequency lists
# --------------------------------------------------------------------------


def q_hist_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_histogram(load_table(spark, sf_dir, "lineitem"), "l_returnflag")


SQL_HIST_RETURNFLAG = """
SELECT CAST(l_returnflag AS VARCHAR) AS value, count(*) AS n
FROM lineitem GROUP BY 1
"""


def q_hist_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_histogram(load_table(spark, sf_dir, "events"), "event_type")


SQL_HIST_EVENTS = """
SELECT CAST(event_type AS VARCHAR) AS value, count(*) AS n
FROM events GROUP BY 1
"""

# --------------------------------------------------------------------------
# wide report row (P1/P2/P4/P5): the ~70-field per-record extraction of
# allMetadataCheck.py:204-303 — single-value fields with None markers,
# multi-value fields joined with '|', presence flags, display casing
# --------------------------------------------------------------------------


def q_report_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # multi-occurrence field → '|'-joined occurrences (add_layer_text,
    # allMetadataCheck.py:136-146): the order's distinct linestatuses
    statuses = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_linestatus")).alias("__sts")
    )
    return (
        orders.join(statuses, orders.o_orderkey == statuses.l_orderkey, "left")
        .select(
            F.col("o_orderkey").alias("key"),
            # P1: single field with 'None' default marker
            F.coalesce(F.col("o_orderdate").cast("date").cast("string"), F.lit("None")).alias(
                "orderdate"
            ),
            # P2: multi-occurrence join with '|', 'empty' marker
            F.when(F.size("__sts") > 0, F.concat_ws("|", "__sts"))
            .otherwise(F.lit("empty"))
            .alias("linestatuses"),
            # P4: presence flag projection ('X' when present)
            F.when(F.array_contains(F.col("__sts"), "O"), F.lit("X"))
            .otherwise(F.lit(""))
            .alias("has_open"),
            # P5: display-casing rewrite
            F.initcap(F.lower("o_orderpriority")).alias("priority_disp"),
            # P5 full parity: camel-case field label + markdown→HTML rewrite
            # (linz_metadata.py:1313, 1373-1405) over a deterministic
            # markdown-bearing derivation of the row
            camel_title(F.concat(F.lit("order"), F.col("o_orderstatus"))).alias("field_label"),
            md_to_html(
                F.concat(
                    F.lit("**"), F.col("o_orderstatus"), F.lit("** *"),
                    F.lower("o_orderpriority"), F.lit("* [order "),
                    F.col("o_orderkey").cast("string"), F.lit("](/orders/"),
                    F.col("o_orderkey").cast("string"), F.lit(")\nsee customer "),
                    F.col("o_custkey").cast("string"),
                )
            ).alias("abstract_html"),
            F.col("o_totalprice").alias("totalprice"),
        )
    )


SQL_REPORT_ORDERS = """
WITH statuses AS (
  SELECT l_orderkey, list_sort(list_distinct(list(l_linestatus))) AS sts
  FROM lineitem GROUP BY l_orderkey
)
SELECT o_orderkey AS key,
       COALESCE(CAST(CAST(o_orderdate AS DATE) AS VARCHAR), 'None') AS orderdate,
       CASE WHEN len(sts) > 0 THEN array_to_string(sts, '|') ELSE 'empty' END AS linestatuses,
       CASE WHEN list_contains(sts, 'O') THEN 'X' ELSE '' END AS has_open,
       -- mirror Spark initcap: lowercase, then capitalize the first char of
       -- each space-separated word ('4-not specified' → '4-not Specified')
       array_to_string(
         list_transform(string_split(lower(o_orderpriority), ' '),
                        w -> upper(substr(w, 1, 1)) || substr(w, 2)),
         ' ') AS priority_disp,
       -- camel_title('order' || status): split before capitals, initcap
       array_to_string(
         list_transform(
           string_split(regexp_replace('order' || o_orderstatus, '([A-Z])', ' \\1', 'g'), ' '),
           w -> upper(substr(w, 1, 1)) || lower(substr(w, 2))),
         ' ') AS field_label,
       -- md_to_html: bold pairs, italic pairs, links, per-line <br>
       regexp_replace(
         regexp_replace(
           regexp_replace(
             regexp_replace(
               '**' || o_orderstatus || '** *' || lower(o_orderpriority) ||
               '* [order ' || o_orderkey || '](/orders/' || o_orderkey ||
               ')' || chr(10) || 'see customer ' || o_custkey,
               '\\*\\*([^*]+)\\*\\*', '<b>\\1</b>', 'g'),
             '\\*([^*]+)\\*', '<i>\\1</i>', 'g'),
           '\\[([^\\[\\]]+)\\]\\(([^()\\[\\]]+)\\)', '<a href="\\2">\\1</a>', 'g'),
         chr(10), '<br>', 'g') || '<br>' AS abstract_html,
       o_totalprice AS totalprice
FROM orders LEFT JOIN statuses ON o_orderkey = l_orderkey
"""

# --------------------------------------------------------------------------
# events row-rule sweep: oracle coverage for the remaining row-rule families
# (exists R1, value R3, contains R9, dateformat R11, empty_scan R12,
#  not_both R15, equal_fields R16) in one catalog over derived columns
# --------------------------------------------------------------------------

EVENTS_CATALOG = {
    "rules": [
        {"id": "props.exists", "type": "exists", "column": "props"},
        {"id": "etype.value", "type": "value", "column": "event_type", "value": "click"},
        {"id": "props.contains", "type": "contains", "column": "props", "values": ['"k"']},
        {
            "id": "day.dateformat",
            "type": "format",
            "column": "ts_day",
            "pattern": r"^\d{4}(-\d{2}(-\d{2})?)?$",
        },
        {"id": "scan", "type": "empty_scan", "columns": ["event_type", "props"]},
        {"id": "xor", "type": "not_both", "columns": ["always_set", "click_only"]},
        {"id": "eq", "type": "equal_fields", "columns": ["event_type", "etype_rev"]},
    ]
}


def q_events_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .withColumn("ts_day", F.date_format("ts", "yyyy-MM-dd"))
        .withColumn("always_set", F.lit("x"))
        .withColumn(
            "click_only", F.when(F.col("event_type") == "click", F.lit("y"))
        )
        .withColumn("etype_rev", F.reverse("event_type"))
    )
    res = validate(ev, parse_catalog(EVENTS_CATALOG), key_col="event_id")
    return res.violations


SQL_EVENTS_RULES = """
WITH ev AS (
  SELECT CAST(event_id AS VARCHAR) AS key, event_type, props,
         strftime(ts, '%Y-%m-%d') AS ts_day,
         'x' AS always_set,
         CASE WHEN event_type = 'click' THEN 'y' END AS click_only,
         reverse(event_type) AS etype_rev
  FROM events
)
SELECT key, 'props.exists.missing' AS rule_id, 'None' AS observed,
       'present and non-empty' AS expected FROM ev WHERE props IS NULL
UNION ALL
SELECT key, 'props.exists.empty', '''''', 'present and non-empty'
FROM ev WHERE props IS NOT NULL AND length(trim(props)) = 0
UNION ALL
SELECT key, 'etype.value.missing', 'None', 'click' FROM ev WHERE event_type IS NULL
UNION ALL
SELECT key, 'etype.value.incorrect', event_type, 'click'
FROM ev WHERE event_type IS NOT NULL AND length(trim(event_type)) > 0
         AND event_type <> 'click'
UNION ALL
SELECT key, 'props.contains.incorrect', props, 'contains ["k"]'
FROM ev WHERE props IS NOT NULL AND length(trim(props)) > 0
         AND NOT contains(props, '"k"')
UNION ALL
SELECT key, 'day.dateformat.missing', 'None', 'matches ^\\d{4}(-\\d{2}(-\\d{2})?)?$'
FROM ev WHERE ts_day IS NULL
UNION ALL
SELECT key, 'day.dateformat.incorrect', ts_day, 'matches ^\\d{4}(-\\d{2}(-\\d{2})?)?$'
FROM ev WHERE ts_day IS NOT NULL AND length(trim(ts_day)) > 0
         AND NOT regexp_matches(ts_day, '^\\d{4}(-\\d{2}(-\\d{2})?)?$')
UNION ALL
SELECT key, 'scan.event_type.empty', '''''', 'non-empty'
FROM ev WHERE event_type IS NOT NULL AND length(trim(event_type)) = 0
UNION ALL
SELECT key, 'scan.props.empty', '''''', 'non-empty'
FROM ev WHERE props IS NOT NULL AND length(trim(props)) = 0
UNION ALL
SELECT key, 'xor.incorrect', always_set || ',' || click_only,
       'not both always_set and click_only'
FROM ev WHERE always_set IS NOT NULL AND click_only IS NOT NULL
UNION ALL
SELECT key, 'eq.incorrect', event_type || ',' || etype_rev,
       'all equal: event_type,etype_rev'
FROM ev WHERE event_type IS DISTINCT FROM etype_rev
"""

# --------------------------------------------------------------------------
# disjunctive conditional (R17 full parity): the reference's "bounding box OR
# geographic description" rule (validate.py:205-215) — when the guard holds,
# at least one alternative must pass; a violation reports every alternative's
# own failure observation
# --------------------------------------------------------------------------

ANY_OF_CATALOG = {
    "rules": [
        {
            "id": "geo",
            "type": "conditional",
            "when": {"column": "event_type", "equals": "error"},
            "then": {
                "type": "any_of",
                "rules": [
                    {"type": "range", "column": "value", "max": 50},
                    {"type": "format", "column": "props", "pattern": '"k": [0-5]'},
                ],
            },
        }
    ]
}


def q_conditional_any_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return validate(ev, parse_catalog(ANY_OF_CATALOG), key_col="event_id").violations


SQL_CONDITIONAL_ANY_OF = """
SELECT CAST(event_id AS VARCHAR) AS key,
       'geo.incorrect' AS rule_id,
       'value=' || CAST(value AS VARCHAR) || '; props=' || props AS observed,
       'any of [value,props]' AS expected
FROM events
WHERE event_type = 'error' AND value > 50
  AND NOT regexp_matches(props, '"k": [0-5]')
"""
