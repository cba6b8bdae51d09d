"""HybridBL (topology refactorization / TopoX-style fusion-fission) edge
partitioner.

Reference parity (/root/reference/src/hybridbl_partitioner.{hpp,cpp}):
- p logical machines round-robin (cpp:103-137): each machine either pops its
  BFS queue or takes a free vertex
- low-degree free vertex (degree < 100, hpp:40) starts a FUSION cluster:
  root's bucket = current least-loaded (init_fusion, cpp:160-173); fusion(v)
  assigns every unassigned incident edge of v to the root's bucket and
  enqueues the neighbors (cpp:176-207); BFS expands while dist < gamma = 3
  (hpp:42, cpp:128-131) and the vertex is not yet in a supernode
- high-degree free vertex FISSIONs: its unassigned edges scatter to the
  OTHER endpoint's id % p (cpp:210-225)

Spark-first distribution (same family as NE/HEP): the round-robin machine
loop runs per locality group inside applyInPandas with partition-local
occupied/super state, writing into the global bucket space [0, p).
Documented deviations: the free-vertex scan is a deterministic shared pointer
per group (the reference keeps one scan cursor per machine over the global
vertex range); degree classification uses the GLOBAL undirected degree (the
reference uses in-degree, an artifact of its directed CSR — our canonical
src<dst orientation makes in/out arbitrary).
"""

from __future__ import annotations

from collections import deque

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fsm import _locality_grouped, _NE_SCHEMA

DEGREE_THRESHOLD = 100  # hybridbl_partitioner.hpp:40
GAMMA = 3               # hybridbl_partitioner.hpp:42


def _hybridbl_group(p: int, degree_threshold: float, gamma: int):
    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        src = pdf["src"].to_numpy(np.int64)
        dst = pdf["dst"].to_numpy(np.int64)
        m_local = len(src)
        if m_local == 0:
            return pd.DataFrame({"src": src, "dst": dst, "bucket": src})
        verts, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
        ls, ld = inv[:m_local], inv[m_local:]
        nloc = len(verts)
        gdeg = np.zeros(nloc, dtype=np.float64)
        gdeg[ls] = pdf["deg_src"].to_numpy(np.float64)
        gdeg[ld] = pdf["deg_dst"].to_numpy(np.float64)
        ends = np.concatenate([ls, ld])
        deg = np.bincount(ends, minlength=nloc)
        offs = np.zeros(nloc + 1, dtype=np.int64)
        np.cumsum(deg, out=offs[1:])
        sort_order = np.argsort(ends, kind="stable")
        inc = np.tile(np.arange(m_local, dtype=np.int64), 2)[sort_order]
        other = np.where(ends[sort_order] == ld[inc], ls[inc], ld[inc])

        assigned = np.full(m_local, -1, dtype=np.int64)
        rem_deg = deg.astype(np.int64).copy()  # unassigned incident edges
        occupied = np.zeros(p, dtype=np.int64)
        super_of = np.full(nloc, -1, dtype=np.int64)   # supernode root per vertex
        root_bucket: dict[int, int] = {}
        handled = np.zeros(nloc, dtype=bool)           # V bitset (cpp:181,211)
        queues: list[deque] = [deque() for _ in range(p)]
        free_ptr = 0

        def assign_incident(v: int, b: int, by_endpoint: bool) -> list[int]:
            """Assign v's unassigned incident edges; returns pushed neighbors."""
            pushed = []
            for ii in range(offs[v], offs[v + 1]):
                e = int(inc[ii])
                if assigned[e] >= 0:
                    continue
                u = int(other[ii])
                if by_endpoint:  # fission: scatter by other endpoint id % p
                    tb = int(verts[u]) % p
                else:
                    tb = b
                assigned[e] = tb
                occupied[tb] += 1
                rem_deg[v] -= 1
                rem_deg[u] -= 1
                pushed.append(u)
            return pushed

        def fusion(machine: int, v: int, root: int, dist: int) -> None:
            handled[v] = True
            super_of[v] = root
            b = root_bucket[root]
            for u in assign_incident(v, b, by_endpoint=False):
                queues[machine].append((u, root, dist + 1))

        while True:
            stop = True
            for machine in range(p):
                if not queues[machine]:
                    # take a free (unhandled, has-unassigned-edges) vertex
                    while free_ptr < nloc and (
                        handled[free_ptr] or rem_deg[free_ptr] == 0
                    ):
                        free_ptr += 1
                    if free_ptr >= nloc:
                        continue
                    stop = False
                    v = free_ptr
                    if gdeg[v] < degree_threshold and super_of[v] < 0:
                        # init_fusion: root bucket = least loaded (cpp:160-173)
                        root_bucket[v] = int(occupied.argmin())
                        fusion(machine, v, v, 0)
                    else:
                        handled[v] = True  # fission (cpp:210-225)
                        assign_incident(v, -1, by_endpoint=True)
                else:
                    stop = False
                    u, root, dist = queues[machine].popleft()
                    if dist < gamma and super_of[u] < 0:
                        fusion(machine, u, root, dist)
            if stop:
                break
        # safety net: any edge left (both endpoints hub-skipped mid-queue)
        # scatters like fission — conservation is an invariant (cpp:141)
        left = np.flatnonzero(assigned < 0)
        if len(left):
            assigned[left] = verts[ld[left]] % p
        return pd.DataFrame({"src": src, "dst": dst, "bucket": assigned})

    return kernel


def hybridbl_partition(
    edges: DataFrame,
    p: int,
    degree_threshold: float = DEGREE_THRESHOLD,
    gamma: int = GAMMA,
    num_groups: int | None = None,
    grouping: str = "range",
    deg: DataFrame | None = None,
) -> DataFrame:
    """(src, dst, bucket) HybridBL edge partition into p buckets."""
    from ..sources.edges import degrees as degrees_of

    if deg is None:
        # materialized: the degree agg feeds BOTH endpoint joins
        deg = degrees_of(edges).localCheckpoint(eager=True)
    degb = F.broadcast(deg)
    e = (
        edges.join(degb.withColumnRenamed("vertex", "src").withColumnRenamed("degree", "deg_src"), "src")
        .join(degb.withColumnRenamed("vertex", "dst").withColumnRenamed("degree", "deg_dst"), "dst")
    )
    grouped = _locality_grouped(e, num_groups or p, grouping)
    return (
        grouped.select("grp", "src", "dst", "deg_src", "deg_dst")
        .groupBy("grp")
        .applyInPandas(_hybridbl_group(p, degree_threshold, gamma), schema=_NE_SCHEMA)
    )
