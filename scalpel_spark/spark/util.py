"""Small physical-plan helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Ensure at least ``min_partitions`` (default: cluster default
    parallelism) ahead of a CPU-heavy Python stage.

    Single-row-group parquet files — common from single-writer tools —
    scan as ONE task no matter the split size; a compute stage inheriting
    that partitioning serializes on one core. The shuffle this inserts
    moves only the selected columns and is amortized by the Python work
    it parallelizes. No-op when the input is already wide enough.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
