"""spark-submit worker for the N-vs-4N scaling evidence (BASELINE.md §3).

Launched by scripts/scaling_bench.py as:

    spark-submit --master local[N] --py-files pkg.zip scripts/scale_worker.py \
        --cores N --sf 0.1

Runs the identical full-catalog clips validation (incl PCM decode) on the
identical cached input, warmup + median-of-3, and prints one JSON line.
The session takes its master from spark-submit — this script must not
override it.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(128 * 1024 * 1024))

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, required=True)
    ap.add_argument("--sf", type=float, default=0.1)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--clips", type=int, default=None)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName(f"scale_worker_{args.cores}")
        .config("spark.sql.shuffle.partitions", str(args.cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import bench_clips

    stats = bench_clips(spark, args.sf, warmup=1, runs=args.runs, n_override=args.clips)
    stats["cores"] = args.cores
    stats["master"] = spark.sparkContext.master
    stats["shuffle_partitions"] = spark.conf.get("spark.sql.shuffle.partitions")
    print("SCALE_RESULT " + json.dumps(stats))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
