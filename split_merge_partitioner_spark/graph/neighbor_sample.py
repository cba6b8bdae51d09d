"""Layer-wise deterministic neighbor sampling — the GNN-training mini-batch
primitive (GraphSAGE fanouts, computed layer-wise a la FastGCN/LADIES) over
the partitioned link graph.

Given seed vertices and per-hop fanouts (f1, f2, ...), emit for each hop h
up to f_h sampled out-neighbors of every frontier vertex; the hop-(h+1)
frontier is the distinct set of hop-h sampled endpoints.  Layer-wise (one
shared sample per frontier vertex, not per root) is the scalable variant:
state is O(|frontier| * f_h) rows per hop instead of the per-root tree
product, and hubs reached by many roots are sampled ONCE.

Determinism contract (same discipline as functions/sampling.py, whose
Lehmer/MINSTD hash this reuses): the sample is a pure function of
(src, dst, seed, hop) — identical under repartitioning, task retries, and
cluster resizing, and identical across engines, so the whole operator
replays as ANSI SQL (ROW_NUMBER over the same integer hash) for the DuckDB
oracle.  Neighbors of u rank by hash(u * PAIR_MULT + dst, seed + hop) with
dst as the tie-break; ranks <= fanout are kept.

Plan shape per hop (explain-audited on parquet input): at most TWO
exchanges — the frontier ⋈ adjacency join, plus one Exchange(u) for the
row_number window when the join broadcasts the frontier (a shuffle join
already leaves the data hash-partitioned by u and Catalyst reuses it).
The window exchange is cheap by construction: Spark's WindowGroupLimit
pushdown truncates each map partition to the top-``fanout`` candidates per
vertex BEFORE the shuffle, so at most fanout rows per (vertex, map
partition) move.  Output is capped at |frontier| * fanout rows — hub
explosion is structurally impossible; state never exceeds the sampled
frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from split_merge_partitioner_spark.functions.sampling import M31, sample_hash

# packs (u, dst) into one integer key: u * PAIR_MULT + dst stays < 2^63 for
# vertex ids < 2^41 / PAIR_MULT ~ 4.4e11 on the u side and < PAIR_MULT on
# the dst side after the mod-M31 fold inside sample_hash (the fold keeps
# distinct pairs distinct mod M31 only statistically — fine for ranking)
PAIR_MULT = 2_097_169  # prime > 2^21


def layerwise_neighbor_sample(
    edges: DataFrame,
    fanouts: tuple[int, ...] = (3, 2),
    seed: int = 42,
    seed_fraction: float = 0.02,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """(hop, src, dst, rn): rn-ranked sampled neighbors per frontier vertex.

    ``edges`` is the undirected canonical (src, dst) table; sampling walks
    the doubled adjacency.  ``seeds`` is an optional (vertex) DataFrame;
    default = the deterministic ~``seed_fraction`` hash-sample of the
    vertex set (coordinated with every other sampler sharing the seed).

    Lineage note: hop h's frontier derives from hop h-1's picks, so an
    uncached plan re-evaluates earlier hops once per later hop.  Every
    pick is a pure function of (ids, seed), so results are identical
    either way; for the typical 2-3 GNN hops the re-derivation is cheaper
    than a checkpoint barrier, and deeper pipelines should persist the
    per-hop picks (walks.py's release discipline) before chaining.
    """
    if not fanouts or any(f < 1 for f in fanouts):
        raise ValueError("fanouts must be a non-empty tuple of ints >= 1")
    adj = edges.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
        edges.select(F.col("dst").alias("u"), F.col("src").alias("v"))
    )
    if seeds is None:
        verts = adj.select(F.col("u").alias("vertex")).distinct()
        seeds = verts.where(
            sample_hash("vertex", seed) < int(seed_fraction * M31)
        )
    frontier = seeds.select(F.col(seeds.columns[0]).alias("u")).distinct()

    out = None
    for hop, fanout in enumerate(fanouts, start=1):
        cand = frontier.join(adj, "u")
        h = sample_hash(
            F.col("u") * F.lit(PAIR_MULT) + F.col("v"), seed + hop
        )
        w = Window.partitionBy("u").orderBy(h.asc(), F.col("v").asc())
        picked = (
            cand.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= fanout)
            .select(
                F.lit(hop).cast("int").alias("hop"),
                F.col("u").alias("src"),
                F.col("v").alias("dst"),
                F.col("rn").cast("long").alias("rn"),
            )
        )
        out = picked if out is None else out.unionAll(picked)
        frontier = picked.select(F.col("dst").alias("u")).distinct()
    return out
