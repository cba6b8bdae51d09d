"""Deduplication operators over the documents table.

- exact_dedup:            hash-groupBy keeper selection (SQL-portable).
- ngram_jaccard_pairs:    exact character-n-gram Jaccard similarity for
                          candidate pairs (SQL-portable via shingle explode +
                          distinct self-join — one shuffle per side).
- minhash_near_duplicates: MinHash + LSH banding — the scale path: shingle ->
                          k permuted min-hashes -> b bands -> bucket join; only
                          same-band candidates are verified.  Arrow-vectorized
                          pandas UDF computes signatures; banding/bucketing is
                          pure DataFrame.
- simhash_near_duplicates: 64-bit SimHash over token hashes; near-dups =
                          bucket-join on rotated prefixes with Hamming check.

Determinism: all hash families are seeded xxhash64 (JVM-side) or seeded NumPy
multiplies — reruns give identical candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One keeper per distinct text (min id), plus group size.
    Hash-groupBy: one shuffle on the text hash; at scale, group by
    (length, md5) instead of raw text to keep shuffle rows narrow."""
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --------------------------------------------------------------------------
# n-gram Jaccard (exact, SQL-portable)
# --------------------------------------------------------------------------

def _shingles(docs: DataFrame, n: int, text_col: str, id_col: str) -> DataFrame:
    """Distinct character n-grams per doc via sequence+transform (JVM-side)."""
    t = F.col(text_col)
    idx = F.sequence(F.lit(1), F.greatest(F.length(t) - (n - 1), F.lit(0)))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.transform(idx, lambda i: F.substr(t, i, F.lit(n)))).alias("shingle"),
    ).distinct()


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 5,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_a, doc_b, jaccard) for pairs sharing >= 1 shingle and
    jaccard >= threshold; doc_a < doc_b.  Exact Jaccard on distinct
    character n-grams.  The shingle self-join is the candidate generator —
    at 100TB scale use minhash_near_duplicates instead (this is the oracle)."""
    sh = _shingles(docs, n, text_col, id_col).persist()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_shingles", "sa"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_shingles", "sb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("n_common") / (F.col("sa") + F.col("sb") - F.col("n_common")), 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def _minhash_udf(num_hashes: int, shingle_n: int, seed: int):
    rng = np.random.default_rng(seed)
    A = rng.integers(1, int(_MERSENNE) - 1, size=num_hashes, dtype=np.uint64)
    B = rng.integers(0, int(_MERSENNE) - 1, size=num_hashes, dtype=np.uint64)

    @pandas_udf("array<long>")
    def minhash(text: pd.Series) -> pd.Series:
        out = []
        for s in text:
            grams = {s[i : i + shingle_n] for i in range(max(len(s) - shingle_n + 1, 0))}
            if not grams:
                out.append(np.zeros(num_hashes, dtype=np.int64))
                continue
            # stable 64-bit shingle hashes -> (a*x+b) mod mersenne, min over shingles
            hv = np.fromiter(
                (np.uint64(hash_shingle(g)) for g in grams), dtype=np.uint64, count=len(grams)
            )
            with np.errstate(over="ignore"):
                prod = np.outer(A, hv) + B[:, None]  # wraps mod 2^64
                prod = (prod & _MERSENNE) + (prod >> np.uint64(61))
                prod = np.where(prod >= _MERSENNE, prod - _MERSENNE, prod)
            out.append(prod.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return minhash


def hash_shingle(g: str) -> int:
    """Deterministic 61-bit FNV-1a over UTF-8 (portable, seed-free)."""
    h = 14695981039346656037
    for byte in g.encode("utf-8"):
        h = ((h ^ byte) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h & ((1 << 61) - 1)


def minhash_near_duplicates(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    threshold: float = 0.5,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_a, doc_b, est_jaccard) candidate near-duplicate pairs.

    Pipeline: signature (pandas UDF) -> band rows (posexplode of band slices)
    -> groupBy(band, band_hash) bucket join -> signature-estimated Jaccard
    filter.  Shuffle volume is #docs * bands rows, never the n^2 pair space.
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    sig = docs.select(
        F.col(id_col).alias("doc_id"),
        _minhash_udf(num_hashes, shingle_n, seed)(F.col(text_col)).alias("sig"),
    ).persist()
    band_slices = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(
                    F.concat_ws(",", F.slice("sig", i * rows_per_band + 1, rows_per_band)),
                    F.lit(seed),
                ).alias("bh"),
            )
            for i in range(bands)
        ]
    )
    buckets = sig.select("doc_id", F.explode(band_slices).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sa = sig.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sig", "sig_a")
    sb = sig.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sig", "sig_b")
    est = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.aggregate(
                    F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
                    F.lit(0),
                    lambda acc, v: acc + v,
                ).cast("double")
                / F.lit(float(num_hashes)),
                6,
            ).alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= threshold)
    )
    return est


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def _simhash_udf(seed: int):
    @pandas_udf("long")
    def simhash(text: pd.Series) -> pd.Series:
        out = np.zeros(len(text), dtype=np.int64)
        for i, s in enumerate(text):
            toks = s.split()
            if not toks:
                continue
            hv = np.fromiter(
                (hash_shingle(t) ^ seed for t in set(toks)), dtype=np.uint64
            )
            bits = ((hv[:, None] >> np.arange(61, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
            vote = (2 * bits - 1).sum(axis=0)
            out[i] = int((vote > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(61, dtype=np.uint64)))
        return pd.Series(out)

    return simhash


_SIMHASH_BITS = 61


def _simhash_blocks(max_hamming: int) -> list[tuple[int, int]]:
    """(shift, width) per block: max_hamming+1 disjoint blocks covering all 61
    bits.  Pigeonhole: two hashes within Hamming max_hamming must agree on at
    least one of max_hamming+1 disjoint blocks, so bucketing on every block is
    a complete candidate generator at ANY threshold value."""
    nb = max_hamming + 1
    assert 1 <= nb <= _SIMHASH_BITS, "max_hamming must be in [0, 60]"
    base, rem = divmod(_SIMHASH_BITS, nb)
    blocks, shift = [], 0
    for i in range(nb):
        w = base + (1 if i < rem else 0)
        blocks.append((shift, w))
        shift += w
    return blocks


def simhash_pairs_from_hashes(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(doc_a, doc_b, hamming) from a (doc_id, sh) table of 61-bit simhashes.

    Candidate generation: bucket on each of max_hamming+1 disjoint bit blocks
    (block count derived from the threshold so the pigeonhole recall guarantee
    holds for every requested max_hamming); verification via bit_count(xor).
    Shuffle volume is #docs * (max_hamming+1) bucket rows, never the n^2 pair
    space.
    """
    pieces = [
        hashes.select(
            "doc_id",
            "sh",
            (F.shiftright("sh", shift).bitwiseAND(F.lit((1 << width) - 1))).alias("bk"),
            F.lit(i).alias("blk"),
        )
        for i, (shift, width) in enumerate(_simhash_blocks(max_hamming))
    ]
    buckets = pieces[0]
    for piece in pieces[1:]:
        buckets = buckets.unionAll(piece)
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.bk") == F.col("b.bk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return cand


def simhash_near_duplicates(
    docs: DataFrame,
    max_hamming: int = 3,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_a, doc_b, hamming) pairs with Hamming(simhash) <= max_hamming over
    64-bit-family SimHash of whitespace tokens (61 effective bits)."""
    sh = docs.select(
        F.col(id_col).alias("doc_id"), _simhash_udf(seed)(F.col(text_col)).alias("sh")
    )
    return simhash_pairs_from_hashes(sh, max_hamming=max_hamming)
