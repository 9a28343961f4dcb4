"""Small physical-plan helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ahead of a CPU-heavy Python stage.

    Single-row-group parquet files — common from single-writer tools —
    scan as ONE task no matter the split size; a compute stage inheriting
    that partitioning serializes on one core. The shuffle this inserts
    moves only the selected columns and is amortized by the Python work
    it parallelizes. We repartition unconditionally: probing the input's
    partition count would force a logical→RDD plan conversion per call,
    and a redundant round-robin exchange on an already-wide input is
    cheaper than that at scale (and often removed by AQE anyway).
    """
    spark = df.sparkSession
    slots = spark.sparkContext.defaultParallelism
    # 4× slots: enough granularity that the last wave's tail wastes <25%
    # of one wave (e.g. 18 partitions on 8 slots = 3 ragged waves at 75%
    # utilization; 32 on 8 = 4 even waves)
    target = min_partitions or slots * 4
    return df.repartition(target)
