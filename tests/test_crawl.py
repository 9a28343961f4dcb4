"""Crawl correctness: the Spark BSP engine must reproduce the
single-threaded reference simulator exactly — crawl order, URL-seen set,
extracted image records — under the same seeds + politeness budgets
(BASELINE.json north_rule), and resume from a mid-crawl checkpoint must
yield byte-identical results.
"""

import numpy as np
import pytest

from scalpel_spark.crawl.simulator import simulate_crawl
from scalpel_spark.datagen.world import WorldParams, write_world

PARAMS = WorldParams(seed=42, n_hosts=6, n_pages=80, n_images=40)
MAX_ROUNDS = 40


@pytest.fixture(scope="module")
def world_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("world")
    write_world(str(d), PARAMS)
    return str(d)


@pytest.fixture(scope="module")
def sim_result(world_dir):
    import pyarrow.parquet as pq

    pages = {
        r["url"]: r for r in pq.read_table(f"{world_dir}/pages.parquet").to_pylist()
    }
    seeds = pq.read_table(f"{world_dir}/seeds.parquet").to_pylist()
    robots = {
        r["host"]: r for r in pq.read_table(f"{world_dir}/robots.parquet").to_pylist()
    }
    return simulate_crawl(pages, seeds, robots, max_rounds=MAX_ROUNDS)


def test_simulator_sanity(sim_result):
    assert len(sim_result.fetch_log) > 20
    seqs = [r.fetch_seq for r in sim_result.fetch_log]
    assert seqs == list(range(len(seqs)))
    # politeness: per (round, host) counts never exceed max budget range
    from collections import Counter

    per = Counter((r.round, r.host) for r in sim_result.fetch_log)
    assert max(per.values()) <= 7  # robots budgets are 2..7
    # disallowed pages never fetched
    for r in sim_result.fetch_log:
        assert "/private/" not in r.url


@pytest.fixture(scope="module")
def engine_result(spark, world_dir, tmp_path_factory):
    from scalpel_spark.crawl.engine import CrawlEngine

    out = str(tmp_path_factory.mktemp("crawl_out"))
    eng = CrawlEngine(spark, world_dir, out, max_rounds=MAX_ROUNDS)
    summary = eng.run()
    return eng, summary


def _sim_log_tuples(sim):
    return [
        (r.fetch_seq, r.round, r.url, r.url_hash, r.host, r.parent_url, r.status, r.n_images)
        for r in sim.fetch_log
    ]


def _eng_log_tuples(eng):
    rows = eng.fetch_log_df().orderBy("fetch_seq").collect()
    return [
        (r.fetch_seq, r.round, r.url, r.url_hash, r.host, r.parent_url, r.status, r.n_images)
        for r in rows
    ]


def test_engine_matches_simulator_exactly(sim_result, engine_result):
    eng, summary = engine_result
    assert summary["total_fetched"] == len(sim_result.fetch_log)
    assert _eng_log_tuples(eng) == _sim_log_tuples(sim_result)


def test_seen_set_matches(sim_result, engine_result):
    eng, _ = engine_result
    eng_seen = {(r.url_hash, r.url) for r in eng.seen_df().collect()}
    sim_seen = {(h, u) for h, u in sim_result.seen.items()}
    assert eng_seen == sim_seen


def test_images_match(sim_result, engine_result):
    eng, _ = engine_result
    eng_imgs = sorted(
        (r.page_url, r.image_id, r.src, r.caption) for r in eng.images_df().collect()
    )
    sim_imgs = sorted(sim_result.images)
    assert eng_imgs == sim_imgs


def test_image_fidelity_vs_corpus(spark, world_dir, engine_result):
    """input_hint invariant: decoded pixels allclose / PSNR>=40dB and
    caption equality, per extracted row joined against the images table."""
    from scalpel_spark.datagen.images import decode_png, psnr
    from scalpel_spark.datagen.world import image_pixels, is_lossy

    from pyspark.sql import functions as F

    eng, _ = engine_result
    corpus = spark.read.parquet(f"{world_dir}/images.parquet")
    ext = (
        eng.images_df()
        .select("image_id", F.col("caption").alias("extracted_caption"))
        .distinct()
    )
    joined = ext.join(corpus.select("image_id", "caption", "bytes"), "image_id")
    rows = joined.collect()
    assert rows
    for r in rows:
        assert r.extracted_caption == r.caption
        i = int(r.image_id.split("-")[1])
        decoded = decode_png(bytes(r.bytes))
        truth = image_pixels(i, PARAMS.seed)
        if is_lossy(i, PARAMS):
            assert psnr(decoded, truth) >= 40.0
        else:
            assert np.array_equal(decoded, truth)


def test_partitioned_bloom_mode_matches(spark, world_dir, sim_result, tmp_path_factory):
    """bloom_mode='partitioned' (sharded parquet bloom probed via a
    co-grouped join, zero driver bloom traffic — the 10^10 path) must
    produce the identical crawl; compaction is forced every 2 rounds so
    the OR-merge + atomic-swap path is exercised."""
    from scalpel_spark.crawl.engine import CrawlEngine

    out = str(tmp_path_factory.mktemp("crawl_part"))
    eng = CrawlEngine(
        spark, world_dir, out, max_rounds=MAX_ROUNDS,
        bloom_mode="partitioned", bloom_compact_every=2,
    )
    summary = eng.run()
    assert summary["total_fetched"] == len(sim_result.fetch_log)
    assert _eng_log_tuples(eng) == _sim_log_tuples(sim_result)
    eng_seen = {(r.url_hash, r.url) for r in eng.seen_df().collect()}
    assert eng_seen == {(h, u) for h, u in sim_result.seen.items()}


def test_resume_is_exact(spark, world_dir, sim_result, tmp_path_factory):
    """Run k rounds, stop, resume from the manifest — final fetch log and
    seen set byte-identical to the uninterrupted run."""
    from scalpel_spark.crawl.engine import CrawlEngine

    out = str(tmp_path_factory.mktemp("crawl_resume"))
    eng1 = CrawlEngine(spark, world_dir, out, max_rounds=3)
    eng1.run()
    assert eng1.store.last_complete_round() == 2

    eng2 = CrawlEngine(spark, world_dir, out, max_rounds=MAX_ROUNDS)
    eng2.run(resume=True)
    assert _eng_log_tuples(eng2) == _sim_log_tuples(sim_result)
    eng_seen = {(r.url_hash, r.url) for r in eng2.seen_df().collect()}
    assert eng_seen == {(h, u) for h, u in sim_result.seen.items()}
