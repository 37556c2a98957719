"""Incremental validation — Structured Streaming over the same engine.

The reference is batch-only but explicitly incremental (SURVEY §2.8): new
catalog records are validated as they appear, history is kept, completed
work is never redone (cache.py:95-102, resolve.py:150-187). The streaming
re-expression: a file-source stream over the clips table with
``foreachBatch`` running the SAME rule catalog per micro-batch — identical
rule compilation, identical violation rows, exactly-once sink appends via
Spark's checkpointed epochs (replacing the manifest for the streaming path;
batch jobs keep the manifest).

``availableNow`` triggers make this a catch-up batch: process everything
new, then stop — the streaming twin of the updater's resumable sweep
(metadata_updater.py:364-465).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from anzlic_validator_spark.engine import validate
from anzlic_validator_spark.rules import RuleCatalog
from anzlic_validator_spark.schema import CLIPS_SCHEMA


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

    Returns the started StreamingQuery; violations append to
    ``{output_path}/violations`` with per-batch epoch ids. Use
    ``q.awaitTermination()`` (availableNow) or ``q.stop()``.
    """
    reader = spark.readStream.schema(CLIPS_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(input_path)

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        result = validate(batch_df, catalog, key_col=key_col, refs=refs or {})
        (
            result.violations.withColumn("epoch", F.lit(epoch_id))
            .write.mode("append")
            .parquet(f"{output_path}/violations")
        )
        (
            result.verdicts.withColumn("epoch", F.lit(epoch_id))
            .write.mode("append")
            .parquet(f"{output_path}/verdicts")
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
