"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, key: str) -> DataFrame:
    """Repartition before an explode fan-out: document tables often
    arrive in a handful of file splits, and a 50-100× gram/window
    expansion would otherwise run with the input's file parallelism —
    often ONE task.

    The target comes from ``spark.sql.shuffle.partitions``; non-numeric
    values (AQE configs allow ``auto``) fall back to the cluster's
    default parallelism instead of raising. The current-parallelism
    probe reads ``df.rdd`` — a driver-side plan-to-RDD conversion (no
    job), which assumes a classic (non-Connect) session like the rest
    of this package's plan gates."""
    conf = df.sparkSession.conf.get("spark.sql.shuffle.partitions", None)
    try:
        target = int(conf)
    except (TypeError, ValueError):
        target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        df = df.repartition(target, key)
    return df
