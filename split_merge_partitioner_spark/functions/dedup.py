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
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..storage import release
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
    A, B = minhash_coefficients(num_hashes, seed)

    @pandas_udf("array<long>")
    def minhash(text: pd.Series) -> pd.Series:
        out = []
        for s in text:
            # distinct shingle hashes, fully vectorized (no per-shingle Python)
            hv = shingle_hashes(s, shingle_n)
            if hv.size == 0:
                out.append(np.zeros(num_hashes, dtype=np.int64))
                continue
            with np.errstate(over="ignore"):
                prod = np.outer(A, hv) + B[:, None]  # wraps mod 2^64
                prod = (prod & _MERSENNE) + (prod >> np.uint64(61))
                prod = np.where(prod >= _MERSENNE, prod - _MERSENNE, prod)
            out.append(prod.min(axis=1).astype(np.int64))
        return pd.Series(out)

    return minhash


_POLY_BASE = 1099511628211  # FNV prime as the polynomial base


def minhash_coefficients(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """The (a, b) permutation coefficients — shared by the Spark UDF and the
    driver's DuckDB oracle so both engines evaluate the identical family."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, int(_MERSENNE) - 1, size=num_hashes, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE) - 1, size=num_hashes, dtype=np.uint64)
    return a, b


def hash_shingle(g: str) -> int:
    """Deterministic 61-bit polynomial hash over Unicode code points (Horner,
    base=FNV prime, mod 2^64 then mod 2^61).  Seed-free and ANSI-SQL-portable:
    `list_reduce` over `ord()` of each char with HUGEINT arithmetic reproduces
    it bit-for-bit, which is what earns minhash/simhash their cross-engine
    driver oracles (__spark_entry__.oracle_sql)."""
    h = 0
    for ch in g:
        h = (h * _POLY_BASE + ord(ch)) & 0xFFFFFFFFFFFFFFFF
    return h & ((1 << 61) - 1)


def shingle_hashes(s: str, n: int) -> np.ndarray:
    """Distinct hash_shingle values of every length-n character shingle of s,
    vectorized: code points decoded in one shot (utf-32 view), the Horner fold
    runs as n shifted multiply-adds over the whole position axis (uint64
    wraparound = mod 2^64), never per-shingle Python."""
    codes = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    m = codes.size - n + 1
    if m <= 0:
        return np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = np.zeros(m, dtype=np.uint64)
        for t in range(n):
            h = h * np.uint64(_POLY_BASE) + codes[t : t + m]
    return np.unique(h & _MERSENNE)


def _band_buckets(sig: DataFrame, bands: int, rows_per_band: int, seed: int) -> DataFrame:
    """(doc_id, band, bh) LSH band-bucket rows of a (doc_id, sig) relation —
    shared by the self-join near-dup pipeline and the train-vs-eval
    decontamination variant so the banding can never drift between them."""
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
    return sig.select("doc_id", F.explode(band_slices).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")
    )


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
    # spread the signature UDF across tasks: a single-file docs scan would
    # otherwise run the whole Python stage in ONE task (guide §2.5 input
    # skew / §4 — the exchange carries only the two needed columns and the
    # signature is a pure per-doc function, so values are unchanged)
    shuffle_n = int(docs.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("__text__")
    ).repartition(shuffle_n)
    sig = base.select(
        "doc_id",
        _minhash_udf(num_hashes, shingle_n, seed)(F.col("__text__")).alias("sig"),
    ).persist()
    # materialize the signatures BEFORE building the multi-consumer plan:
    # the downstream query scans sig four times (both band-bucket sides +
    # both est-join sides), and AQE submits those leaf stages concurrently —
    # against a still-lazy persist each one re-runs the signature UDF
    # (profiled: 4 overlapping ~1.1 s jobs at sf0.1).  One count pins the
    # cache so every scan is a read.
    sig.count()
    buckets = _band_buckets(sig, bands, rows_per_band, seed)
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


# --------------------------------------------------------------------------
# embedding-cosine near-duplicates
# --------------------------------------------------------------------------

def embedding_near_duplicates(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_tables: int = 4,
    n_probes: int = 2,
    seed: int = 42,
    exact: bool = False,
    max_broadcast_rows: int = 100_000,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with id_a < id_b and cosine >= threshold
    (rounded to 6, matching the knn operators).

    exact=False (the 100-TB path): LSH-bucketed — multi-probe random-hyperplane
    buckets (similarity._hyperplane_udf), each (table, bucket) group verifies
    its pairs with one chunked-BLAS matmul; candidates only, recall governed by
    (n_planes, n_tables, n_probes) exactly like lsh_knn.

    exact=True (oracle path): blocked all-pairs sweep — query blocks of at most
    max_broadcast_rows are broadcast, the corpus streams through mapInPandas,
    one matmul per Arrow batch; driver memory stays bounded (same scheme as
    brute_force_knn).  Quadratic — for oracle runs and explicit small sets.
    """
    from collections.abc import Iterator

    from .similarity import build_probe_tables, normalize

    spark = emb.sparkSession
    normed = normalize(emb, vec_col).select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    ).persist()
    first_row = normed.first()
    if first_row is None:
        release(normed)
        return spark.createDataFrame([], "id_a long, id_b long, cosine double")

    if exact:
        n_q = normed.count()
        n_blocks = max(1, -(-n_q // max_broadcast_rows))
        bcs = []
        parts = []

        def make_task(bc):
            def task(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                qids, Q = bc.value
                for pdf in batches:
                    if len(pdf) == 0 or len(qids) == 0:
                        continue
                    cids = pdf["vid"].to_numpy(np.int64)
                    C = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
                    S = np.round(C @ Q.T, 6)
                    # id_a < id_b: keep corpus row as the smaller id
                    keep = (S >= threshold) & (cids[:, None] < qids[None, :])
                    ci, qi = np.nonzero(keep)
                    yield pd.DataFrame(
                        {"id_a": cids[ci], "id_b": qids[qi], "cosine": S[ci, qi]}
                    )

            return task

        try:
            for blk in range(n_blocks):
                blk_df = (
                    normed
                    if n_blocks == 1
                    else normed.where(F.pmod(F.xxhash64("vid"), F.lit(n_blocks)) == blk)
                )
                q_pdf = blk_df.toPandas()
                qids = q_pdf["vid"].to_numpy(np.int64)
                Q = (
                    np.vstack(q_pdf["vec"].to_numpy()).astype(np.float64)
                    if len(q_pdf)
                    else np.zeros((0, 1))
                )
                bc = spark.sparkContext.broadcast((qids, Q))
                bcs.append(bc)
                parts.append(
                    normed.mapInPandas(
                        make_task(bc), schema="id_a long, id_b long, cosine double"
                    )
                )
            out = parts[0]
            for extra in parts[1:]:
                out = out.unionAll(extra)
            return out.localCheckpoint(eager=True)
        finally:
            for bc in bcs:
                bc.destroy()
            release(normed)

    buckets = build_probe_tables(
        normed, len(first_row["vec"]), n_planes, n_tables, n_probes, seed
    )

    def pair_kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        nb = len(pdf)
        if nb < 2:
            return pd.DataFrame(
                {"id_a": np.empty(0, np.int64), "id_b": np.empty(0, np.int64),
                 "cosine": np.empty(0, np.float64)}
            )
        pdf = pdf.drop_duplicates("vid").sort_values("vid")
        ids = pdf["vid"].to_numpy(np.int64)
        M = np.vstack(pdf["vec"].to_numpy()).astype(np.float64)
        out_a, out_b, out_c = [], [], []
        chunk = 1024
        for lo in range(0, len(ids), chunk):
            hi = min(lo + chunk, len(ids))
            S = np.round(M[lo:hi] @ M.T, 6)
            ra, cb = np.nonzero(S >= threshold)
            keep = ids[lo + ra] < ids[cb]  # strict upper triangle by id
            out_a.append(ids[lo + ra][keep])
            out_b.append(ids[cb][keep])
            out_c.append(S[ra, cb][keep])
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b),
             "cosine": np.concatenate(out_c)}
        )

    out = (
        buckets.groupBy("tbl", "bk")
        .applyInPandas(pair_kernel, schema="id_a long, id_b long, cosine double")
        .dropDuplicates(["id_a", "id_b"])
    )
    try:
        # materialize so the persisted normalized table can be released
        return out.localCheckpoint(eager=True)
    finally:
        release(normed)


def near_duplicate_clusters(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    threshold: float = 0.5,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, cluster, is_canonical): transitive near-duplicate CLUSTERS —
    connected components over the minhash candidate-pair graph, each cluster
    labeled by its minimum doc id, the canonical survivor.

    Pair lists are not what a dedup pipeline ships: if A≈B and B≈C the
    corpus must keep ONE of {A, B, C} even when A and C never pair directly
    (the standard production setup — e.g. the C4/RefinedWeb/SlimPajama
    pipelines cluster candidate pairs before dropping).  Components are
    computed with the star-contraction CC (graph/components.py) — pure
    JVM, diameter-independent, so a pathological duplicate CHAIN (each doc
    pairing only with its neighbor) costs O(log² n) rounds, not O(chain).

    Every document appears in the output; singletons are their own
    canonical cluster.  Deterministic end to end (portable minhash family
    + min-labeling), hence the chained DuckDB replay hash-matches.
    """
    from ..graph.components import connected_components_stars

    pairs = minhash_near_duplicates(
        docs,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        threshold=threshold,
        seed=seed,
        text_col=text_col,
        id_col=id_col,
    )
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comps, _ = connected_components_stars(edges)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comps.withColumnRenamed("vertex", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("cluster"),
            (F.coalesce("component", F.col("doc_id")) == F.col("doc_id")).alias(
                "is_canonical"
            ),
        )
    )


def dedup_corpus(docs: DataFrame, id_col: str = "doc_id", **cluster_kwargs) -> DataFrame:
    """The filtered corpus: one representative (minimum id) per near-duplicate
    cluster, all original columns preserved — the keep-one composition of
    near_duplicate_clusters, semi-joined back so document payloads never
    ride through the clustering shuffles."""
    keep = near_duplicate_clusters(docs, id_col=id_col, **cluster_kwargs).where(
        F.col("is_canonical")
    )
    return docs.join(
        keep.select(F.col("doc_id").alias(id_col)), id_col, "left_semi"
    )


def segment_dedup(
    docs: DataFrame,
    block_tokens: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide keep-first segment dedup — the C4 "deduplicate at the
    line level" rule (Raffel et al. 2020, §2.2) restated over fixed
    ``block_tokens``-word blocks, the standard fallback for corpora whose
    documents carry no newline structure (ours don't).

    Every document is cut into consecutive blocks of ``block_tokens``
    whitespace tokens (the final short remainder block included); a block
    survives only in its first occurrence corpus-wide, "first" = smallest
    (doc_id, block_idx) — a total, retry-stable order.  Returns one row per
    document: (doc_id, n_blocks, n_kept, text_kept) with text_kept the
    surviving blocks re-joined in document order (possibly '').

    Scale shape: tokenize + block-slice are narrow array expressions on the
    scan; the dedup itself is ONE exchange hash-partitioned by block text
    (a window over the block key — rank-1 keeps the first), then one
    groupBy(doc_id) to reassemble.  Nothing is quadratic and no block list
    ever sits on the driver.  At 100 TB the block-key exchange is the same
    volume as the corpus — the minimum any exact corpus-wide dedup can move.
    """
    from .text import _token_array
    from pyspark.sql import Window

    n_blk = F.ceil(F.size("__toks__") / F.lit(block_tokens)).cast("long")
    blocks = (
        docs.select(
            F.col(id_col).alias("doc_id"), _token_array(text_col).alias("__toks__")
        )
        .select(
            "doc_id",
            n_blk.alias("n_blocks"),
            # guarded for the empty document: sequence(1, 0, +step) errors
            # rather than returning [] (cf. the _word_ngrams guard)
            F.when(F.size("__toks__") == 0, F.array().cast("array<string>"))
            .otherwise(
                F.expr(
                    f"transform(sequence(1, size(__toks__), {block_tokens}), "
                    f"i -> array_join(slice(__toks__, i, {block_tokens}), ' '))"
                )
            )
            .alias("__blks__"),
        )
        .select("doc_id", "n_blocks", F.posexplode_outer("__blks__").alias("block_idx", "blk"))
    )
    w = Window.partitionBy("blk").orderBy("doc_id", "block_idx")
    kept = blocks.withColumn(
        "keep", (F.row_number().over(w) == 1) & F.col("blk").isNotNull()
    )
    return kept.groupBy("doc_id").agg(
        F.first("n_blocks").alias("n_blocks"),
        F.sum(F.col("keep").cast("long")).alias("n_kept"),
        # collect_list drops the NULL (non-kept) entries; struct sort orders
        # by block_idx (first field), so the join is in document order
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.when(F.col("keep"), F.struct("block_idx", "blk")))
                ),
                lambda x: x["blk"],
            ),
            " ",
        ).alias("text_kept"),
    )


def jaccard_join_prefix(
    docs: DataFrame,
    n: int = 5,
    threshold_ppm: int = 400_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_a, doc_b, jaccard): EXACTLY ngram_jaccard_pairs at threshold =
    threshold_ppm/1e6, computed with PPJoin-style prefix filtering
    (Chaudhuri et al. 2006; Xiao et al. WWW 2008) — the scale path for
    exact-threshold similarity joins.

    Lossless pruning: order each doc's shingles globally by (document
    frequency, shingle) ascending — rarest first — and keep only the first
    |S| - ceil(t*|S|) + 1 as the doc's PREFIX.  Two sets with Jaccard >= t
    MUST collide inside their prefixes (if all prefix tokens miss, the
    intersection is too small by the pigeonhole bound), so the candidate
    join runs on prefix rows only; the full intersection is then counted
    for candidates alone.  The hot shingles that dominate the naive
    self-join's fanout are exactly the ones the rarest-first prefix
    excludes, so candidate volume collapses on skewed corpora while the
    RESULT stays bit-identical (the oracle is the plain join's SQL, and
    equality with ngram_jaccard_pairs is pinned in tests).

    ceil(t*|S|) is exact integer arithmetic on ppm: (t_ppm*s + 999_999)
    div 1_000_000 — no float enters until the final ROUND(jaccard, 6).
    """
    sh = _shingles(docs, n, text_col, id_col).persist()
    try:
        sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("ns"))
        dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
        w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("shingle"))
        ranked = (
            sh.join(dfreq, "shingle")
            .withColumn("rk", F.row_number().over(w))
            .join(sizes, "doc_id")
        )
        prefix = ranked.where(
            F.col("rk")
            <= F.col("ns")
            - F.expr(f"(({threshold_ppm} * ns) + 999999) div 1000000")
            + 1
        ).select("doc_id", "shingle")
        pa = prefix.select(F.col("doc_id").alias("doc_a"), "shingle")
        pb = prefix.select(F.col("doc_id").alias("doc_b"), "shingle")
        cand = (
            pa.join(pb, "shingle")
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        # exact verification on candidates only
        ja = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        jb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        inter = (
            cand.join(ja, "doc_a")
            .join(jb, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("n_common"))
        )
        out = (
            inter.join(
                sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("ns", "sa"),
                "doc_a",
            )
            .join(
                sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("ns", "sb"),
                "doc_b",
            )
            .select(
                "doc_a",
                "doc_b",
                F.round(
                    F.col("n_common") / (F.col("sa") + F.col("sb") - F.col("n_common")),
                    6,
                ).alias("jaccard"),
            )
            .where(F.col("jaccard") >= threshold_ppm / 1_000_000)
        )
        return out.localCheckpoint(eager=True)
    finally:
        sh.unpersist()


# --------------------------------------------------------------------------
# SemDeDup: semantic dedup via within-kmeans-cluster exact cosine
# --------------------------------------------------------------------------

def semdedup_pairs(
    emb: DataFrame,
    k: int = 8,
    threshold_ppm: int = 300_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): find semantic
    near-duplicate pairs by clustering the embedding space with k-means and
    comparing ONLY within clusters — the published recipe that makes
    embedding dedup sub-quadratic at corpus scale: the all-pairs matrix is
    never formed; quadratic work is confined to cluster blocks (expected
    n^2/k per cluster, parallel across clusters).

    Returns (cid, id_a, id_b, dot) with id_a < id_b for every within-cluster
    pair whose cosine >= threshold_ppm/1e6.  The cosine test is EXACT
    integer arithmetic over the kmeans SCALE-quantized vectors — the
    predicate ``dot > 0 AND dot^2 * 10^12 >= t_ppm^2 * |a|^2 * |b|^2``
    evaluated in DECIMAL(38,0) (HUGEINT in the DuckDB oracle), so no float
    cosine ever enters and the pair set is bit-stable across engines,
    partitionings, and retries.  ``dot`` is the exact quantized inner
    product (BIGINT).

    Scale shape: one zero-shuffle kmeans assign scan, one exchange on cid
    for the block self-join (AQE skew-split handles fat clusters), dot
    products inside one codegen stage via zip_with/aggregate.
    """
    from .kmeans import _quantized, kmeans_assign

    q = _quantized(emb, vec_col, id_col)
    asg = kmeans_assign(emb, k=k, vec_col=vec_col, id_col=id_col).select("vec_id", "cid")
    n2 = F.aggregate(
        F.transform("q", lambda x: x * x), F.lit(0).cast("long"), lambda s, x: s + x
    )
    aq = asg.join(q, "vec_id").select("vec_id", "cid", "q", n2.alias("n2"))
    left = aq.select(
        F.col("cid"),
        F.col("vec_id").alias("id_a"),
        F.col("q").alias("qa"),
        F.col("n2").alias("na2"),
    )
    right = aq.select(
        F.col("cid"),
        F.col("vec_id").alias("id_b"),
        F.col("q").alias("qb"),
        F.col("n2").alias("nb2"),
    )
    dot = F.aggregate(
        F.zip_with("qa", "qb", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )
    pairs = (
        left.join(right, "cid")
        .where(F.col("id_a") < F.col("id_b"))
        .select("cid", "id_a", "id_b", dot.alias("dot"), "na2", "nb2")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    lhs = dec(F.col("dot")) * dec(F.col("dot")) * dec(F.lit(10**12))
    rhs = (
        dec(F.lit(int(threshold_ppm)))
        * dec(F.lit(int(threshold_ppm)))
        * dec(F.col("na2"))
        * dec(F.col("nb2"))
    )
    return pairs.where((F.col("dot") > 0) & (lhs >= rhs)).select(
        "cid", "id_a", "id_b", "dot"
    )


def semdedup_keep(
    emb: DataFrame,
    k: int = 8,
    threshold_ppm: int = 300_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, keep): the SemDeDup keep decision — drop every vector that
    has a LOWER-id near-duplicate in its own cluster (keep-first rule, the
    deterministic representative choice; same discipline as dedup_corpus).
    keep=true rows are the deduplicated corpus membership."""
    pairs = semdedup_pairs(emb, k, threshold_ppm, id_col, vec_col)
    drops = pairs.select(F.col("id_b").alias("vec_id")).distinct()
    return (
        emb.select(F.col(id_col).cast("long").alias("vec_id"))
        .join(drops.withColumn("_drop", F.lit(True)), "vec_id", "left")
        .select("vec_id", F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"))
    )
