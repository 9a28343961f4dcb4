"""Replicates the driver's correctness gate locally: every query with an
oracle must match DuckDB on row count, column names, and
order-insensitive values at sf0.001 (driver runs sf0.01)."""

import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.astype(object).where(pd.notna(df), None)
    rows = sorted(
        [tuple(str(v) for v in row) for row in df.itertuples(index=False)]
    )
    return rows


def _query_names():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from scalpel_spark.queries import ORACLES, QUERIES

    return sorted(QUERIES), ORACLES


ALL_QUERIES, _ = _query_names()


@pytest.fixture(autouse=True)
def _release_persisted_frames(spark):
    """The neardup/LSH pipelines persist small frames their lazy plans
    reference repeatedly; release them between queries so the ~50-query
    suite doesn't accumulate cached storage (mirrors bench.py)."""
    yield
    from scalpel_spark.spark.util import release_candidate_cache

    release_candidate_cache()


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_runs_and_matches_oracle(spark, ddb, name):
    from scalpel_spark.queries import ORACLES, QUERIES

    sdf = QUERIES[name](spark, SF_DIR)
    spdf = sdf.toPandas()
    assert len(spdf) >= 0
    if name not in ORACLES:
        # rows-only contract: runs, stable schema
        assert list(spdf.columns)
        return
    odf = ddb.sql(ORACLES[name]).df()
    assert len(spdf) == len(odf), f"{name}: rowcount {len(spdf)} vs {len(odf)}"
    assert sorted(spdf.columns) == sorted(odf.columns), name
    assert _norm(spdf) == _norm(odf), f"{name}: value mismatch"
