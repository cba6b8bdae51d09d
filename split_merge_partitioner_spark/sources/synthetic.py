"""Deterministic synthetic graph fixtures (FIXTURES.md F2).

Mirrors the *shape* of the reference's benchmark graphs (power-law web/social,
full.pdf Table 2) at sandbox scale.  NumPy only, seed-stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# F2.1 tiny-handmade: n=8, m=12 — two squares joined by a bridge, plus chords.
_TINY = [
    (0, 1), (1, 2), (2, 3), (0, 3), (0, 2),          # square A + chord
    (4, 5), (5, 6), (6, 7), (4, 7), (5, 7),          # square B + chord
    (3, 4),                                          # bridge
    (1, 3),                                          # extra chord in A
]


def tiny_graph_pdf() -> pd.DataFrame:
    return pd.DataFrame(_TINY, columns=["src", "dst"]).astype("int64")


def zipf_config_edges_pdf(
    n: int = 4_000, m: int = 24_000, alpha: float = 0.7, seed: int = 2
) -> pd.DataFrame:
    """Configuration-model graph with zipf(alpha)-weighted endpoint sampling —
    a skewed but CONTINUOUS degree distribution (unlike the BA generator whose
    per-edge degree asymmetry makes DBH unrealistically good).  This is the
    fixture shape on which the paper's RF ordering RF(NE) <= RF(HDRF) <=
    RF(DBH) reproduces (full.pdf §5.2.2 analog).  Canonical src<dst, deduped,
    seed-stable."""
    rng = np.random.default_rng(seed)
    w = 1.0 / np.arange(1, n + 1) ** alpha
    w /= w.sum()
    src = rng.choice(n, m * 2, p=w)
    dst = rng.choice(n, m * 2, p=w)
    keep = src != dst
    out = pd.DataFrame(
        {"src": np.minimum(src, dst)[keep], "dst": np.maximum(src, dst)[keep]}
    ).drop_duplicates().head(m).reset_index(drop=True)
    return out.astype("int64")


def powerlaw_edges_pdf(n: int = 2_000, m_per_node: int = 10, seed: int = 42) -> pd.DataFrame:
    """Barabasi-Albert-style preferential attachment, vectorized NumPy.

    Each new node v attaches to m distinct targets sampled from the current
    repeated-endpoint pool (degree-proportional), guaranteeing hubs above the
    HEP high-degree threshold hdf*avg_degree (/root/reference/src/hep_graph.cpp:17)
    so hub-salting paths get exercised.  Returns canonical src<dst, deduped.
    """
    rng = np.random.default_rng(seed)
    m = m_per_node
    # seed clique on m+1 nodes
    seeds = [(i, j) for i in range(m + 1) for j in range(i + 1, m + 1)]
    src0 = np.array([e[0] for e in seeds], dtype=np.int64)
    dst0 = np.array([e[1] for e in seeds], dtype=np.int64)
    # preallocated endpoint pool; sampling uniformly from it IS
    # degree-proportional sampling.  Nodes are added in batches (each batch
    # samples from the pool as of batch start) — vectorized O(n*m) instead of
    # a per-node Python loop.
    pool = np.empty(2 * (len(seeds) + (n * m)), dtype=np.int64)
    pos = 2 * len(seeds)
    pool[: len(seeds)] = src0
    pool[len(seeds) : pos] = dst0
    srcs = [src0]
    dsts = [dst0]
    v = m + 1
    while v < n:
        batch = min(8192, n - v)
        vs = np.repeat(np.arange(v, v + batch, dtype=np.int64), m)
        ts = pool[rng.integers(0, pos, size=batch * m)]
        srcs.append(vs)
        dsts.append(ts)
        k = batch * m
        pool[pos : pos + k] = vs
        pool[pos + k : pos + 2 * k] = ts
        pos += 2 * k
        v += batch
    s = np.concatenate(srcs)
    d = np.concatenate(dsts)
    lo = np.minimum(s, d)
    hi = np.maximum(s, d)
    out = pd.DataFrame({"src": lo, "dst": hi})
    out = out[out.src != out.dst].drop_duplicates().reset_index(drop=True)
    return out
