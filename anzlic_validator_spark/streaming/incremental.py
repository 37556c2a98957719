"""Incremental validation — Structured Streaming over the same engine.

The reference is batch-only but explicitly incremental (SURVEY §2.8): new
catalog records are validated as they appear, history is kept, completed
work is never redone (cache.py:95-102, resolve.py:150-187). The streaming
re-expression: a file-source stream over the clips table with
``foreachBatch`` running the SAME rule catalog per micro-batch — identical
rule compilation, identical violation rows.

Dataset-rule scope (VERDICT r01 #6): per-record rules evaluate identically
per micro-batch. ``unique`` rules get CROSS-BATCH state: every batch appends
its key set to an epoch-partitioned ``_seen_keys`` log, and duplicates are
detected both within the batch (the salted batch aggregate) and against all
PRIOR epochs (an anti-pattern-free join on the pruned key log). Table-global
rules (``all_of`` on scalars, ``drift``) are REJECTED up front — silently
rescoping them to a micro-batch would change their semantics; run them in
the batch sweep.

Sink idempotence: violations/verdicts/key-log are partitioned by epoch and
written with dynamic partition overwrite, so a micro-batch retried after a
sink failure rewrites ITS OWN partition instead of double-appending
(at-least-once foreachBatch → effectively exactly-once output).

``availableNow`` triggers make this a catch-up batch: process everything
new, then stop — the streaming twin of the updater's resumable sweep
(metadata_updater.py:364-465).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anzlic_validator_spark.engine import ValidationResult, validate
from anzlic_validator_spark.errors import InvalidConfigException
from anzlic_validator_spark.rules import Rule, RuleCatalog
from anzlic_validator_spark.schema import CLIPS_SCHEMA

# table-global rules whose group is not a function of the record key —
# micro-batch scope would silently change their meaning
CROSS_BATCH_UNSAFE = {"all_of", "drift"}

_SEEN_SCHEMA = "rule_id string, k string, epoch long"


def _path_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(spark._jsc.hadoopConfiguration()).exists(p)


def _unique_key_expr(rule: Rule) -> F.Column:
    cols = [str(c) for c in rule.get("columns")]
    return F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols])


def validate_stream(
    spark: SparkSession,
    input_path: str,
    catalog: RuleCatalog,
    output_path: str,
    checkpoint_path: str,
    key_col: str = "clip_id",
    refs: dict[str, DataFrame] | None = None,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
):
    """Validate a growing parquet directory incrementally.

    Returns the started StreamingQuery; violations/verdicts land under
    ``{output_path}/`` partitioned by epoch (idempotent per-epoch
    overwrite). Use ``q.awaitTermination()`` (availableNow) or ``q.stop()``.

    Raises InvalidConfigException for table-global rules (CROSS_BATCH_UNSAFE)
    BEFORE the stream starts.
    """
    bad = [r.rule_id for r in catalog.rules if r.type in CROSS_BATCH_UNSAFE]
    if bad:
        raise InvalidConfigException(
            f"rules {bad} are table-global; evaluating them per micro-batch would "
            "silently change their semantics — run them in the batch sweep (run.py), "
            "which routes them to the reserved bucket over the full input"
        )
    unique_rules = [r for r in catalog.rules if r.type == "unique"]
    local_catalog = RuleCatalog(
        rules=tuple(r for r in catalog.rules if r.type != "unique"), version=catalog.version
    )
    seen_path = f"{output_path}/_seen_keys"

    reader = spark.readStream.schema(CLIPS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        from anzlic_validator_spark.operators.uniqueness import unique_violations

        s = batch_df.sparkSession
        s.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        result = validate(batch_df, local_catalog, key_col=key_col, refs=refs or {})
        ranked = result.violations_ranked
        seen_parts = []
        prior = None
        if unique_rules and _path_exists(s, seen_path):
            # epoch < current: a RETRIED epoch never collides with itself
            prior = (
                s.read.schema(_SEEN_SCHEMA)
                .parquet(seen_path)
                .where(F.col("epoch") < F.lit(epoch_id))
            )
        for rule in unique_rules:
            # intra-batch duplicates: the same salted aggregate as batch mode
            ranked = ranked.unionByName(unique_violations(batch_df, rule, key_col))
            kexpr = _unique_key_expr(rule)
            bk = batch_df.select(
                F.col(key_col).cast("string").alias("key"), kexpr.alias("k")
            )
            if prior is not None:
                # cross-batch duplicates: batch keys seen in ANY prior epoch.
                # The log is (rule_id, key-tuple, epoch) — pruned scalars only.
                hits = (
                    bk.join(
                        prior.where(F.col("rule_id") == rule.rule_id).select("k", "epoch"),
                        on="k",
                    )
                    .groupBy("key", "k")
                    .agg(F.min("epoch").alias("first_epoch"))
                )
                cols = ",".join(str(c) for c in rule.get("columns"))
                ranked = ranked.unionByName(
                    hits.select(
                        F.col("key"),
                        F.lit(f"{rule.rule_id}.incorrect").alias("rule_id"),
                        F.concat(F.lit("seen_in_epoch="), F.col("first_epoch").cast("string")).alias(
                            "observed"
                        ),
                        F.lit(f"unique ({cols})").alias("expected"),
                        F.lit(rule.order).cast("int").alias("rule_order"),
                    )
                )
            seen_parts.append(
                bk.select(F.lit(rule.rule_id).alias("rule_id"), F.col("k")).distinct()
            )
        full = ValidationResult(
            df=batch_df, key_col=key_col, catalog=catalog, violations_ranked=ranked.persist()
        )
        (
            full.violations.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .partitionBy("epoch")
            .parquet(f"{output_path}/violations")
        )
        (
            full.verdicts.withColumn("epoch", F.lit(epoch_id))
            .write.mode("overwrite")
            .partitionBy("epoch")
            .parquet(f"{output_path}/verdicts")
        )
        full.violations_ranked.unpersist()
        if seen_parts:
            log = seen_parts[0]
            for p in seen_parts[1:]:
                log = log.unionByName(p)
            (
                log.select("rule_id", "k").withColumn("epoch", F.lit(epoch_id))
                .write.mode("overwrite")
                .partitionBy("epoch")
                .parquet(seen_path)
            )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_path)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def violation_rate_stream(
    events: DataFrame,
    ts_col: str,
    predicate,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Windowed violation-rate aggregation for a streaming events source —
    the monitoring analog of the reference's per-sweep tallies (A3/A5):
    late data handled by watermark, rate = violations / rows per window.
    """
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    flag = F.when(predicate, F.lit(1)).otherwise(F.lit(0))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(flag).alias("violations"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "rows",
            "violations",
            (F.col("violations") / F.col("rows")).alias("violation_rate"),
        )
    )
