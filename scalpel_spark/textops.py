"""Training-data pipeline operators over a documents table
``(doc_id, text, lang, source, n_chars)``.

Design rules (100 TB corpus):

* anything expressible in ``pyspark.sql.functions`` stays JVM-side
  (whole-stage codegen, no Python);
* Python appears only as Arrow-batched pandas UDFs computing per-doc
  signatures (minhash/simhash/langid/fingerprint) — O(1) output per doc,
  so the shuffle that follows carries signatures, never text;
* near-dup candidate generation is LSH banding: shuffle keyed on
  (band_id, band_hash) so each bucket is tiny; exact verification runs
  only inside buckets. No all-pairs joins anywhere.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .crawl.bloom import _fmix64_np
from .spark.util import spread

# ---------------------------------------------------------------------------
# exact dedup


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Representative (min id) + duplicate count per distinct text.

    Hash-groupBy on xxhash64(text): the shuffle carries (hash, id) only.
    64-bit collisions are ~1e-9 at 1e5 docs; for strict exactness at
    10^12 docs add a length column to the key (done here — free).
    """
    return (
        df.groupBy(
            F.xxhash64(F.col(text_col)).alias("text_hash"),
            F.length(text_col).alias("text_len"),
        )
        .agg(
            F.min(id_col).alias("rep_doc_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
        .select("text_hash", "text_len", "rep_doc_id", "n_dupes")
    )


# ---------------------------------------------------------------------------
# minhash + LSH

_WORD_RE = re.compile(r"\w+", re.UNICODE)


def _shingle_hashes(text: str, k: int) -> np.ndarray:
    words = _WORD_RE.findall(text.lower())
    if len(words) < k:
        shingles = [" ".join(words)] if words else [""]
    else:
        shingles = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    # cheap stable 64-bit hash per shingle (python's hash is salted → no)
    out = np.empty(len(shingles), dtype=np.uint64)
    for i, s in enumerate(shingles):
        h = 1469598103934665603
        for b in s.encode("utf-8"):
            h = ((h ^ b) * 1099511628211) & ((1 << 64) - 1)
        out[i] = h
    return out


def minhash_signatures(
    df: DataFrame,
    n_hashes: int = 64,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, sig: array<bigint>) — vectorized: per doc, one numpy
    (n_shingles × n_hashes) min-reduction using splitmix-style remixes of
    the shingle hashes (no per-hash python loops over shingles)."""
    seeds = np.arange(1, n_hashes + 1, dtype=np.uint64) * np.uint64(
        0x9E3779B97F4A7C15
    )

    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("sig", T.ArrayType(T.LongType())),
        ]
    )

    def gen(batches):
        for pdf in batches:
            ids = pdf[id_col].tolist()
            sigs = []
            for text in pdf[text_col]:
                sh = _shingle_hashes(text or "", shingle_k)
                # remix: fmix64(shingle ^ seed) — distinct hash per seed
                m = _fmix64_np(sh[:, None] ^ seeds[None, :])
                sigs.append(m.min(axis=0).astype(np.int64).tolist())
            yield pd.DataFrame({id_col: ids, "sig": sigs})

    return spread(df.select(id_col, text_col)).mapInPandas(gen, schema)


def lsh_candidate_pairs(
    sigs: DataFrame, n_bands: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """Band the signatures; docs sharing any band bucket are candidates.
    Shuffle key = (band, band_hash) → bucket-local self-join only."""
    n_hashes = 64  # length of sig arrays; bands of n_hashes/n_bands rows
    rows = n_hashes // n_bands
    bands = sigs.select(
        id_col,
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.lit(b), *[F.col("sig")[b * rows + r] for r in range(rows)]
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "band_hash"),
    )
    left = bands.alias("l")
    right = bands.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .distinct()
    )


def minhash_jaccard_pairs(
    sigs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Estimated jaccard for candidate pairs from signature agreement."""
    a = sigs.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"))
    b = sigs.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b")
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda v: v
        )
    )
    return joined.select(
        "id_a", "id_b", (agree / F.size("sig_a")).alias("est_jaccard")
    )


def minhash_neardup(
    df: DataFrame,
    threshold: float = 0.8,
    n_bands: int = 16,
    shingle_k: int = 3,
) -> DataFrame:
    """shingle → minhash → band → bucket-join → estimate ≥ threshold."""
    sigs = minhash_signatures(df, shingle_k=shingle_k)
    pairs = lsh_candidate_pairs(sigs, n_bands=n_bands)
    est = minhash_jaccard_pairs(sigs, pairs)
    return est.where(F.col("est_jaccard") >= threshold)


# ---------------------------------------------------------------------------
# simhash


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit simhash over word hashes (per-doc numpy bit-vote)."""
    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("simhash", T.LongType()),
        ]
    )
    bit_idx = np.arange(64, dtype=np.uint64)

    def gen(batches):
        for pdf in batches:
            out = []
            for text in pdf[text_col]:
                words = _WORD_RE.findall((text or "").lower())
                if not words:
                    out.append(0)
                    continue
                hs = _shingle_hashes(" ".join(words), 1)
                bits = ((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(
                    np.int64
                )
                votes = (2 * bits - 1).sum(axis=0)
                v = 0
                for i in range(64):
                    if votes[i] >= 0:
                        v |= 1 << i
                out.append(v - (1 << 64) if v >= (1 << 63) else v)
            yield pd.DataFrame({id_col: pdf[id_col].tolist(), "simhash": out})

    return spread(df.select(id_col, text_col)).mapInPandas(gen, schema)


def simhash_neardup(df: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by simhash hamming distance ≤ k, block-joined on
    16-bit chunks (any pair within distance 3 shares ≥1 of 4 chunks)."""
    sh = simhash64(df)
    chunks = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    (F.shiftrightunsigned("simhash", 16 * i) % F.lit(1 << 16))
                    for i in range(4)
                ]
            )
        ).alias("chunk_idx", "chunk"),
    )
    l, r = chunks.alias("l"), chunks.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.chunk_idx") == F.col("r.chunk_idx"))
            & (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("id_a"),
            F.col("r.doc_id").alias("id_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", ham.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


# ---------------------------------------------------------------------------
# language id (n-gram/stopword heuristic), quality, tokens, fingerprint

_LANG_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "en", "por", "que"},
}


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language guess; 'und' (undetermined) when no vote."""
    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("lang_pred", T.StringType()),
            T.StructField("lang_conf", T.DoubleType()),
        ]
    )
    langs = sorted(_LANG_STOPWORDS)

    def gen(batches):
        for pdf in batches:
            preds, confs = [], []
            for text in pdf[text_col]:
                words = _WORD_RE.findall((text or "").lower())
                if not words:
                    preds.append("und")
                    confs.append(0.0)
                    continue
                scores = {
                    lg: sum(w in _LANG_STOPWORDS[lg] for w in words) for lg in langs
                }
                best = max(langs, key=lambda lg: (scores[lg], lg))
                total = sum(scores.values())
                preds.append(best if scores[best] > 0 else "und")
                confs.append(scores[best] / total if total else 0.0)
            yield pd.DataFrame(
                {id_col: pdf[id_col].tolist(), "lang_pred": preds, "lang_conf": confs}
            )

    return spread(df.select(id_col, text_col)).mapInPandas(gen, schema)


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count — pure JVM (codegen) path."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0)).otherwise(F.size(toks))
    return df.withColumn("n_tokens", n)


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/uppercase heuristics — pure JVM path; score
    scaled to int to keep oracle comparison exact."""
    length = F.length(text_col)
    punct = length - F.length(F.regexp_replace(text_col, r"[.!?,;:]", ""))
    upper = length - F.length(F.regexp_replace(text_col, r"[A-Z]", ""))
    spaces = length - F.length(F.regexp_replace(text_col, r" ", ""))
    mean_word_len = (length - spaces) / (spaces + 1)
    score = (
        F.least(length / F.lit(1000.0), F.lit(1.0)) * 0.4
        + (1.0 - F.least(punct / (length + 1) * 10, F.lit(1.0))) * 0.3
        + (1.0 - F.least(upper / (length + 1) * 5, F.lit(1.0))) * 0.2
        + F.least(mean_word_len / 10, F.lit(1.0)) * 0.1
    )
    return df.withColumn("quality_i4", F.round(score * 10000).cast("bigint"))


def doc_fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-sensitive rolling polynomial hash of the normalized word
    stream → int64 fingerprint (content identity robust to whitespace)."""
    schema = T.StructType(
        [
            T.StructField(id_col, df.schema[id_col].dataType),
            T.StructField("fingerprint", T.LongType()),
        ]
    )

    def gen(batches):
        mask = (1 << 64) - 1
        for pdf in batches:
            fps = []
            for text in pdf[text_col]:
                h = 0
                for w in _WORD_RE.findall((text or "").lower()):
                    wh = 1469598103934665603
                    for b in w.encode("utf-8"):
                        wh = ((wh ^ b) * 1099511628211) & mask
                    h = (h * 31 + wh) & mask
                fps.append(h - (1 << 64) if h >= (1 << 63) else h)
            yield pd.DataFrame({id_col: pdf[id_col].tolist(), "fingerprint": fps})

    return spread(df.select(id_col, text_col)).mapInPandas(gen, schema)
