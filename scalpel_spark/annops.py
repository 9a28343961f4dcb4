"""Similarity search over an embedding column (``array<float>``).

Two tiers per SURVEY's training-pipeline mandate:

* ``cosine_topk`` — brute-force cosine top-k, fully JVM-side
  (``zip_with`` + ``aggregate`` inside codegen; no Python): the exact
  baseline. Queries are broadcast; the big side streams. Cost O(Q·N) —
  right up to a few thousand queries over any N.
* ``lsh_topk`` — random-hyperplane LSH bucketing: signatures via one
  vectorized numpy matmul per Arrow batch, candidates only within
  (table, probe) buckets → the scale path (sub-linear candidate sets;
  multiprobe widens recall).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .spark.util import spread


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k neighbors per query by cosine; output (query_id, neighbor_id,
    rank). Ties broken by neighbor id for determinism; self-matches
    excluded."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
    )
    v = spread(vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vvec")))
    sim = _dot(F.col("qvec"), F.col("vvec")) / (
        _norm(F.col("qvec")) * _norm(F.col("vvec"))
    )
    scored = (
        q.crossJoin(v)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def hyperplane_signatures(
    df: DataFrame,
    n_planes: int = 16,
    dim: int | None = None,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket) — sign pattern of ``n_planes`` random hyperplanes,
    one numpy matmul per Arrow batch."""
    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("bucket", T.LongType()),
        ]
    )

    def gen(batches):
        planes = None
        weights = None
        for pdf in batches:
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float32)
            if planes is None:
                rng = np.random.default_rng(seed)
                planes = rng.standard_normal((mat.shape[1], n_planes)).astype(
                    np.float32
                )
                weights = (1 << np.arange(n_planes, dtype=np.int64))
            bits = (mat @ planes) >= 0
            buckets = (bits.astype(np.int64) * weights).sum(axis=1)
            yield pd.DataFrame({id_col: pdf[id_col].tolist(), "bucket": buckets})

    return spread(df.select(id_col, vec_col)).mapInPandas(gen, schema)


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed ANN: exact cosine ranking *within* shared hyperplane
    buckets. Recall < 1 by construction; the scale path when Q·N is too
    big to brute-force. Output (query_id, neighbor_id, rank)."""
    vs = hyperplane_signatures(vectors, n_planes, seed=seed, id_col=id_col, vec_col=vec_col)
    qs = hyperplane_signatures(queries, n_planes, seed=seed, id_col=id_col, vec_col=vec_col)
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vvec")).join(
        vs.select(F.col(id_col).alias("neighbor_id"), "bucket"), "neighbor_id"
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")).join(
        qs.select(F.col(id_col).alias("query_id"), "bucket"), "query_id"
    )
    sim = _dot(F.col("qvec"), F.col("vvec")) / (
        _norm(F.col("qvec")) * _norm(F.col("vvec"))
    )
    scored = (
        q.join(v, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )
