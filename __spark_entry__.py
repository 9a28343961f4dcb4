"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: Arrow-batched HTML extraction (the
reference's image+caption acceptance shape) over a corpus derived from
the sf0.001 documents table, aggregated per language.

``queries()`` / ``oracle_sql()`` — the operator catalog with DuckDB
oracles; implementations live in ``scalpel_spark.queries``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from scalpel_spark.queries import QUERIES

    extracted = QUERIES["scrape_img_attrs"](spark, "/root/testdata/sf0.001")
    return (
        extracted.groupBy(F.col("alt").alias("lang"))
        .agg(F.count(F.lit(1)).alias("n_images"))
        .orderBy("lang")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from scalpel_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from scalpel_spark.queries import ORACLES

    return dict(ORACLES)
