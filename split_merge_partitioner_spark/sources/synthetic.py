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
    src = [e[0] for e in seeds]
    dst = [e[1] for e in seeds]
    pool = np.array(src + dst, dtype=np.int64)
    pool_list = [pool]
    pool_size = pool.size
    for v in range(m + 1, n):
        flat = np.concatenate(pool_list) if len(pool_list) > 1 else pool_list[0]
        pool_list = [flat]
        targets = np.unique(flat[rng.integers(0, pool_size, size=m * 2)])[:m]
        src.extend([v] * targets.size)
        dst.extend(targets.tolist())
        add = np.concatenate([np.full(targets.size, v, dtype=np.int64), targets])
        pool_list.append(add)
        pool_size += add.size
    pdf = pd.DataFrame({"src": src, "dst": dst}).astype("int64")
    lo = np.minimum(pdf["src"], pdf["dst"])
    hi = np.maximum(pdf["src"], pdf["dst"])
    out = pd.DataFrame({"src": lo, "dst": hi})
    out = out[out.src != out.dst].drop_duplicates().reset_index(drop=True)
    return out
