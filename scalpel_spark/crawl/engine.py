"""The Spark BSP crawl engine.

One round (SURVEY §3.4):

  frontier snapshot
    → politeness batch   (broadcast robots join; two-phase salted
                          window-rank per host — skew-bounded top-k)
    → resolver join      (frontier ⋈ corpus on url; the offline stand-in
                          for the HTTP fetch stage, URL.hs:72-82)
    → extraction         (one Arrow-batched mapInPandas pass: images +
                          canonical outlinks + murmur3 hashes per page)
    → link dedup         (min-by-parent-fetch-seq groupBy — matches the
                          simulator's first-discoverer-wins rule)
    → robots filter      (broadcast join + JVM-side prefix check)
    → bloom prefilter    (broadcast shards; definite-new rows BYPASS the
                          anti-join; only maybe-seen rows shuffle)
    → seen anti-join     (exact decision; bloom is prune-only)
    → append deltas + next-frontier snapshot + manifest commit

Scale notes (10^10 frontier, 1000 executors):
* the full frontier is never collected; every per-round structure is a
  DataFrame. Driver state = bloom shards (size independent of row
  count) + scalar counters.
* politeness ranking partitions by host; hot hosts are pre-pruned by a
  salted first-phase top-k so no partition ever sees more than
  ``n_salts × budget`` rows per host.
* global fetch_seq is a row_number over the *politeness-bounded* batch
  (≤ Σ per-host budgets per round), not over the frontier.
* bloom shards are built distributively (groupBy(shard).applyInPandas)
  and OR-merged on the driver — bytes moved per round = shard bytes,
  not keys.
* exact resume: state lives in per-round parquet + manifest
  (tableio.SnapshotStore); a torn round never commits.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Iterable

_TRACE = os.environ.get("SCALPEL_CRAWL_TRACE", "") == "1"


def _trace(msg: str, t0: float) -> float:
    t = time.perf_counter()
    if _TRACE:
        print(f"[crawl-trace] {msg}: {t - t0:.2f}s", file=sys.stderr, flush=True)
    return t

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bloom import BloomShards, build_bits
from .logic import DEFAULT_BUDGET, PRIORITY_DECAY, extract_page, url_hash
from .tableio import SnapshotStore
from .urlnorm import canonicalize_url, url_host

FRONTIER_SCHEMA = (
    "url string, url_hash long, host string, priority double, depth int, parent_url string"
)

_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("fetch_seq", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("url_hash", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("parent_url", T.StringType()),
        T.StructField("priority", T.DoubleType()),
        T.StructField("depth", T.IntegerType()),
        T.StructField("status", T.IntegerType()),
        T.StructField("n_images", T.IntegerType()),
        T.StructField(
            "imgs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("image_id", T.StringType()),
                        T.StructField("src", T.StringType()),
                        T.StructField("caption", T.StringType()),
                    ]
                )
            ),
        ),
        T.StructField(
            "links",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("url", T.StringType()),
                        T.StructField("url_hash", T.LongType()),
                    ]
                )
            ),
        ),
    ]
)


def _extract_batches(batches: Iterable[pd.DataFrame]):
    """mapInPandas kernel: fetched pages → extraction rows (one out-row
    per page; images/links as arrays so a single parse serves both)."""
    for pdf in batches:
        out = {name: [] for name in _EXTRACT_SCHEMA.fieldNames()}
        for row in pdf.itertuples(index=False):
            status = int(row.status) if pd.notna(row.status) else 0
            html = row.html if isinstance(row.html, str) else None
            imgs: list = []
            links: list = []
            if html is not None and status == 200:
                ext = extract_page(html, row.url)
                imgs = [
                    {"image_id": iid, "src": src, "caption": cap}
                    for iid, src, cap in ext.images
                ]
                links = [{"url": u, "url_hash": url_hash(u)} for u in ext.links]
            out["fetch_seq"].append(row.fetch_seq)
            out["url"].append(row.url)
            out["url_hash"].append(row.url_hash)
            out["host"].append(row.host)
            out["parent_url"].append(row.parent_url)
            out["priority"].append(row.priority)
            out["depth"].append(row.depth)
            out["status"].append(status)
            out["n_images"].append(len(imgs))
            out["imgs"].append(imgs)
            out["links"].append(links)
        yield pd.DataFrame(out)


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        corpus_dir: str,
        out_dir: str,
        max_rounds: int = 50,
        n_salts: int = 8,
        bloom_shards: int = 16,
        bloom_bits_per_shard: int = 1 << 20,
        bloom_k: int = 7,
    ):
        self.spark = spark
        self.corpus_dir = corpus_dir
        self.store = SnapshotStore(out_dir)
        self.max_rounds = max_rounds
        self.n_salts = n_salts
        self._bloom_cfg = (bloom_shards, bloom_bits_per_shard, bloom_k)
        self.bloom = BloomShards(bloom_shards, bloom_bits_per_shard, bloom_k)

        self.pages = spark.read.parquet(os.path.join(corpus_dir, "pages.parquet"))
        robots = spark.read.parquet(os.path.join(corpus_dir, "robots.parquet"))
        self.robots = robots.select(
            "host",
            F.col("max_fetches_per_round").alias("budget"),
            F.col("disallow_prefixes").alias("disallow"),
        )

    # ------------------------------------------------------------------

    def _seed_frontier(self) -> DataFrame:
        """Distributed seed prep: canonicalize+hash in Arrow batches, then
        dedupe by hash keeping the lexicographically-first URL (the
        simulator's iteration order over url-sorted seeds)."""
        seeds = self.spark.read.parquet(os.path.join(self.corpus_dir, "seeds.parquet"))

        def canon(batches):
            for pdf in batches:
                rows = {"url": [], "url_hash": [], "host": [], "priority": []}
                for r in pdf.itertuples(index=False):
                    c = canonicalize_url(r.url)
                    if c is None:
                        continue
                    rows["url"].append(c)
                    rows["url_hash"].append(url_hash(c))
                    rows["host"].append(url_host(c) or "")
                    rows["priority"].append(float(r.priority))
                yield pd.DataFrame(rows)

        canonical = seeds.repartition(self.spark.sparkContext.defaultParallelism).mapInPandas(
            canon, "url string, url_hash long, host string, priority double"
        )
        df = (
            canonical.groupBy("url_hash")
            .agg(F.min(F.struct("url", "priority", "host")).alias("s"))
            .select(
                F.col("s.url").alias("url"),
                "url_hash",
                F.col("s.host").alias("host"),
                F.col("s.priority").alias("priority"),
                F.lit(0).alias("depth"),
                F.lit("").alias("parent_url"),
            )
        )
        # robots filter on seeds, same rule as links
        return self._filter_disallowed(df)

    def _filter_disallowed(self, df: DataFrame) -> DataFrame:
        path = F.coalesce(F.parse_url(F.col("url"), F.lit("PATH")), F.lit("/"))
        joined = df.join(F.broadcast(self.robots.select("host", "disallow")), "host", "left")
        blocked = F.when(
            F.col("disallow").isNotNull(),
            F.exists("disallow", lambda p: F.startswith(path, p)),
        ).otherwise(F.lit(False))
        return joined.where(~blocked).drop("disallow")

    def _bloom_maybe_seen(self, df: DataFrame, hash_col: str) -> DataFrame:
        """Adds boolean ``maybe_seen`` via broadcast bloom shards."""
        rows = self.bloom.to_rows()
        bc = self.spark.sparkContext.broadcast(rows)
        schema = T.StructType(
            df.schema.fields + [T.StructField("maybe_seen", T.BooleanType())]
        )
        names = df.schema.fieldNames()

        def probe(batches):
            bf = BloomShards.from_rows(bc.value)
            for pdf in batches:
                hashes = pdf[hash_col].to_numpy(dtype=np.int64)
                pdf = pdf.copy()
                pdf["maybe_seen"] = bf.contains_many(hashes)
                yield pdf[names + ["maybe_seen"]]

        return df.mapInPandas(probe, schema)

    def _bloom_add_distributed(self, df_hashes: DataFrame, hash_col: str) -> None:
        """Distributed delta-shard build; driver merges shard bytes."""
        n_shards, m, k = self._bloom_cfg
        shard_col = F.pmod(F.shiftrightunsigned(F.col(hash_col), 48), F.lit(n_shards))

        def build(key, pdf):
            bits = build_bits(pdf[hash_col].to_numpy(dtype=np.int64), m, k)
            return pd.DataFrame(
                [{"shard": int(key[0]), "m": m, "k": k, "bits": bits.tobytes()}]
            )

        delta = (
            df_hashes.select(F.col(hash_col), shard_col.alias("shard"))
            .groupBy("shard")
            .applyInPandas(build, "shard int, m int, k int, bits binary")
        )
        for row in delta.collect():
            self.bloom.bits[row["shard"]] |= np.frombuffer(row["bits"], dtype=np.uint8)

    def _write(self, df: DataFrame, rnd: int, name: str) -> tuple[str, int]:
        path = self.store.table_path(rnd, name)
        df.write.mode("overwrite").parquet(path)
        return path, self.spark.read.parquet(path).count()

    def _seen_paths(self, upto_round: int) -> list[str]:
        paths = [self.store.table_path(-1, "seen_delta")]
        paths += [self.store.table_path(r, "seen_delta") for r in range(upto_round)]
        return [p for p in paths if os.path.exists(p)]

    # ------------------------------------------------------------------

    def run(self, resume: bool = False) -> dict:
        spark = self.spark
        last = self.store.last_complete_round() if resume else None
        if last is None:
            self.store.init_engine(
                {
                    "corpus": self.corpus_dir,
                    "n_salts": self.n_salts,
                    "bloom": list(self._bloom_cfg),
                    "priority_decay": PRIORITY_DECAY,
                    "default_budget": DEFAULT_BUDGET,
                }
            )
            t0 = time.perf_counter()
            seeded = self._seed_frontier().persist()
            tables = {
                "frontier_next": self._write(seeded, -1, "frontier_next"),
                "seen_delta": self._write(seeded.select("url_hash", "url"), -1, "seen_delta"),
            }
            t0 = _trace("bootstrap seed+write", t0)
            self._bloom_add_distributed(seeded.select("url_hash"), "url_hash")
            t0 = _trace("bootstrap bloom", t0)
            bloom_df = spark.createDataFrame(
                self.bloom.to_rows(), "shard int, m int, k int, bits binary"
            )
            tables["bloom"] = self._write(bloom_df, -1, "bloom")
            self.store.commit_round(
                -1, tables, {"n_fetched": 0, "total_fetched": 0, "n_pending": tables["frontier_next"][1]}
            )
            seeded.unpersist()
            start_round, seq_offset = 0, 0
            pending_rows = tables["frontier_next"][1]
        else:
            manifest = self.store.read_manifest()
            entry = [r for r in manifest["rounds"] if r["round"] == last][0]
            seq_offset = entry["metrics"]["total_fetched"]
            start_round = last + 1
            self.bloom = BloomShards.from_rows(
                [
                    (r["shard"], r["m"], r["k"], bytes(r["bits"]))
                    for r in spark.read.parquet(
                        self.store.table_path(last, "bloom")
                    ).collect()
                ]
            )
            pending_rows = entry["tables"]["frontier_next"]["rows"]

        rounds_sec = 0.0
        for rnd in range(start_round, self.max_rounds):
            round_t0 = time.perf_counter()
            # pending count comes from the previous round's committed
            # parquet row count — no extra action per round
            n_pending = pending_rows
            if n_pending == 0:
                break
            frontier = spark.read.parquet(self.store.table_path(rnd - 1, "frontier_next"))

            # --- politeness: two-phase salted top-k per host ------------
            cand = frontier.join(
                F.broadcast(self.robots.select("host", "budget")), "host", "left"
            ).withColumn("budget", F.coalesce("budget", F.lit(DEFAULT_BUDGET)))
            order = [F.desc("priority"), F.asc("url_hash"), F.asc("url")]
            w1 = Window.partitionBy("host", "salt").orderBy(*order)
            pre = (
                cand.withColumn("salt", F.pmod(F.col("url_hash"), F.lit(self.n_salts)))
                .withColumn("r1", F.row_number().over(w1))
                .where(F.col("r1") <= F.col("budget"))
            )
            w2 = Window.partitionBy("host").orderBy(*order)
            ranked = (
                pre.withColumn("rank", F.row_number().over(w2) - 1)
                .where(F.col("rank") < F.col("budget"))
                .drop("salt", "r1", "budget")
            ).persist()
            # global fetch_seq = offset + position in (host ASC, rank ASC)
            # order, WITHOUT a single-partition global window: per-host
            # counts (tiny: one row per host) get exclusive cumulative
            # offsets, broadcast back, and fetch_seq = host_base + rank.
            w_host = Window.orderBy("host").rowsBetween(
                Window.unboundedPreceding, -1
            )
            host_base = (
                ranked.groupBy("host")
                .agg(F.max("rank").alias("mx"))
                .select(
                    "host",
                    F.coalesce(F.sum(F.col("mx") + 1).over(w_host), F.lit(0)).alias(
                        "host_base"
                    ),
                )
            )
            batch = (
                ranked.join(F.broadcast(host_base), "host")
                .withColumn(
                    "fetch_seq",
                    (F.col("host_base") + F.col("rank") + F.lit(seq_offset)).cast(
                        "long"
                    ),
                )
                .drop("host_base")
            )
            if _TRACE:
                tt = time.perf_counter()
                batch.count()
                _trace(f"r{rnd} politeness batch", tt)

            # --- resolver join + extraction -----------------------------
            # repartition after the join: the resolver join would otherwise
            # leave the python extraction stage on the (possibly few) scan
            # partitions; 4× slots keeps task waves balanced
            par = max(self.spark.sparkContext.defaultParallelism * 4, 8)
            fetched_in = batch.join(
                self.pages.select("url", "html", "status"), "url", "left"
            ).repartition(par)
            extracted = fetched_in.mapInPandas(
                lambda it: _extract_batches(it), _EXTRACT_SCHEMA
            ).persist()
            if _TRACE:
                tt = time.perf_counter()
                extracted.count()
                _trace(f"r{rnd} resolver+extract materialize", tt)

            fetch_log = extracted.select(
                "fetch_seq",
                F.lit(rnd).alias("round"),
                "url",
                "url_hash",
                "host",
                "parent_url",
                "status",
                "n_images",
            )
            images = extracted.select(
                F.col("url").alias("page_url"), F.explode("imgs").alias("img")
            ).select("page_url", "img.image_id", "img.src", "img.caption")

            # --- new links: dedup → robots → bloom → exact anti-join ----
            links = extracted.select(
                "fetch_seq",
                F.col("url").alias("parent_url"),
                "priority",
                "depth",
                F.explode("links").alias("l"),
            ).select(
                F.col("l.url").alias("url"),
                F.col("l.url_hash").alias("url_hash"),
                "fetch_seq",
                "parent_url",
                "priority",
                "depth",
            )
            deduped = (
                links.groupBy("url", "url_hash")
                .agg(
                    F.min(F.struct("fetch_seq", "parent_url", "priority", "depth")).alias(
                        "p"
                    )
                )
                .select(
                    "url",
                    "url_hash",
                    F.col("p.parent_url").alias("parent_url"),
                    (F.col("p.priority") * F.lit(PRIORITY_DECAY)).alias("priority"),
                    (F.col("p.depth") + 1).alias("depth"),
                )
                .withColumn("host", F.lower(F.parse_url(F.col("url"), F.lit("HOST"))))
            )
            allowed = self._filter_disallowed(deduped)
            probed = self._bloom_maybe_seen(allowed, "url_hash").persist()
            if _TRACE:
                tt = time.perf_counter()
                probed.count()
                _trace(f"r{rnd} links dedup+robots+bloom probe", tt)
            definite_new = probed.where(~F.col("maybe_seen")).drop("maybe_seen")
            maybe = probed.where(F.col("maybe_seen")).drop("maybe_seen")
            seen_paths = self._seen_paths(rnd)
            seen_df = spark.read.parquet(*seen_paths).select("url_hash")
            confirmed_new = maybe.join(seen_df, "url_hash", "left_anti")
            new_entries = definite_new.unionByName(confirmed_new).select(
                "url", "url_hash", "host", "priority", "depth", "parent_url"
            ).persist()

            # --- next frontier + state updates --------------------------
            remaining = cand.select(
                "url", "url_hash", "host", "priority", "depth", "parent_url"
            ).join(batch.select("url_hash"), "url_hash", "left_anti")
            frontier_next = remaining.unionByName(new_entries)

            t0 = time.perf_counter()
            tables = {"fetched": self._write(fetch_log, rnd, "fetched")}
            t0 = _trace(f"r{rnd} fetch+extract+write", t0)
            tables["images"] = self._write(images, rnd, "images")
            t0 = _trace(f"r{rnd} images write", t0)
            tables["seen_delta"] = self._write(
                new_entries.select("url_hash", "url"), rnd, "seen_delta"
            )
            t0 = _trace(f"r{rnd} links dedup+bloom+anti+write", t0)
            tables["frontier_next"] = self._write(frontier_next, rnd, "frontier_next")
            t0 = _trace(f"r{rnd} frontier write", t0)
            ranked.unpersist()
            extracted.unpersist()
            self._bloom_add_distributed(new_entries.select("url_hash"), "url_hash")
            t0 = _trace(f"r{rnd} bloom delta build", t0)
            bloom_df = spark.createDataFrame(
                self.bloom.to_rows(), "shard int, m int, k int, bits binary"
            )
            tables["bloom"] = self._write(bloom_df, rnd, "bloom")
            t0 = _trace(f"r{rnd} bloom write", t0)

            n_fetched = tables["fetched"][1]
            pending_rows = tables["frontier_next"][1]
            seq_offset += n_fetched
            self.store.commit_round(
                rnd,
                tables,
                {
                    "n_pending": n_pending,
                    "n_fetched": n_fetched,
                    "n_new_links": tables["seen_delta"][1],
                    "n_images": tables["images"][1],
                    "total_fetched": seq_offset,
                },
            )
            probed.unpersist()
            new_entries.unpersist()
            rounds_sec += time.perf_counter() - round_t0
            if n_fetched == 0:
                break

        return {
            "total_fetched": seq_offset,
            "rounds_sec": round(rounds_sec, 2),
            "rounds": self.store.read_manifest()["rounds"],
        }

    # ------------------------------------------------------------------

    def fetch_log_df(self) -> DataFrame:
        rounds = [r["round"] for r in self.store.read_manifest()["rounds"] if r["round"] >= 0]
        paths = [self.store.table_path(r, "fetched") for r in rounds]
        paths = [p for p in paths if os.path.exists(p)]
        return self.spark.read.parquet(*paths)

    def seen_df(self) -> DataFrame:
        return self.spark.read.parquet(*self._seen_paths(10**6))

    def images_df(self) -> DataFrame:
        rounds = [r["round"] for r in self.store.read_manifest()["rounds"] if r["round"] >= 0]
        paths = [self.store.table_path(r, "images") for r in rounds]
        paths = [p for p in paths if os.path.exists(p)]
        return self.spark.read.parquet(*paths)
