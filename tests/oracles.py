"""Plain-NumPy reference implementations (FIXTURES.md F7) — no Spark, no
external graph libs.  These define the exact semantics the engine must match."""

from __future__ import annotations

import numpy as np
import pandas as pd


def _dense(edges: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    verts = np.unique(np.concatenate([edges.src.to_numpy(), edges.dst.to_numpy()]))
    s = np.searchsorted(verts, edges.src.to_numpy())
    d = np.searchsorted(verts, edges.dst.to_numpy())
    return verts, s, d


def pagerank_oracle(edges: pd.DataFrame, damping: float = 0.85, tol: float = 1e-12,
                    max_iter: int = 1000) -> pd.DataFrame:
    verts, s, d = _dense(edges)
    n = len(verts)
    deg = np.bincount(s, minlength=n) + np.bincount(d, minlength=n)
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        c = r / deg
        g = np.zeros(n)
        np.add.at(g, d, c[s])
        np.add.at(g, s, c[d])
        r_new = (1 - damping) / n + damping * g
        if np.max(np.abs(r_new - r)) <= tol:
            r = r_new
            break
        r = r_new
    return pd.DataFrame({"vertex": verts, "rank": r})


def components_oracle(edges: pd.DataFrame) -> pd.DataFrame:
    verts, s, d = _dense(edges)
    parent = np.arange(len(verts))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(s, d):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    roots = np.array([find(int(i)) for i in range(len(verts))])
    # component id = min ORIGINAL vertex id in the component; roots are minimal
    # dense ids, and dense order preserves original order, so verts[root] works.
    return pd.DataFrame({"vertex": verts, "component": verts[roots]})


def label_propagation_oracle(edges: pd.DataFrame, n_iter: int = 5) -> pd.DataFrame:
    verts, s, d = _dense(edges)
    n = len(verts)
    lab = verts.copy()  # labels are original ids
    for _ in range(n_iter):
        recv = np.concatenate([d, s])
        nlab = np.concatenate([lab[s], lab[d]])
        df = pd.DataFrame({"v": recv, "l": nlab})
        cnt = df.groupby(["v", "l"]).size().reset_index(name="c")
        # argmax count, tie -> min label
        cnt = cnt.sort_values(["v", "c", "l"], ascending=[True, False, True])
        best = cnt.drop_duplicates("v", keep="first").set_index("v")["l"]
        new = lab.copy()
        new[best.index.to_numpy()] = best.to_numpy()
        lab = new
    return pd.DataFrame({"vertex": verts, "label": lab})


def triangle_count_oracle(edges: pd.DataFrame) -> int:
    verts, s, d = _dense(edges)
    n = len(verts)
    adj: list[set[int]] = [set() for _ in range(n)]
    for a, b in zip(s, d):
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))
    total = 0
    for a, b in zip(s, d):
        total += len(adj[int(a)] & adj[int(b)])
    return total // 3
