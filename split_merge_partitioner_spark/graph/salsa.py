"""SALSA authority/hub scores via the exact closed form.

Lempel & Moran's SALSA (TOIS 2001) replaces HITS's mutual reinforcement
with two random walks on the bipartite support graph: the authority chain
steps backward along an in-link then forward along an out-link.  Its
stationary distribution has a CLOSED FORM (ibid. §3.2): within each
connected component c of the support graph,

    pi_a(v) = din(v) / m_c            (v an authority in c)

and the standard component weighting scores

    salsa(v) = (|A_c| / |A|) * (din(v) / m_c)

where A_c = authority nodes of c and m_c = edges of c.  So SALSA is not an
iteration at all — it is a COMPOSITION of connected components and degree
counting, which is exactly how this engine computes it: star-contraction CC
(diameter-independent, pure Catalyst) + one degree aggregate + one
per-component aggregate.  No superstep loop, no float: the score is emitted
as exact parts-per-billion, floor((din * |A_c| * 1e9) div (m_c * |A|)),
so the DuckDB oracle (recursive min-reachability CC + the same integer
arithmetic) matches hash-for-hash.

This is the centrality used in production "who to follow" systems
(Twitter's WTF, Goel et al. 2013) precisely because the closed form makes
it one groupBy cheaper than a power iteration at web scale.  Contrast
hits.py: HITS needs the iteration (its principal eigenvector has no
degree-only closed form); SALSA does not — implementing it as supersteps
would be paying PageRank cost for a degree count.

Directionality: edges are (src -> dst); authorities gather on dst
(``side="auth"``), hubs on src (``side="hub"`` — the symmetric chain, out-
degrees over the same components).

Overflow is guarded, not hoped away (the hits.py discipline): the ppb
numerator din * |A_c| * 1e9 must fit BIGINT, so the driver checks
max(din) * max(|A_c|) <= 9e9 and fails fast naming the remedy (the bound
only binds past ~10^5-vertex components with ~10^5-degree hubs; the
DECIMAL(38,0) upgrade is noted in the error).

No counterpart in the reference engine (a graph partitioner); file kept in
the centrality family beside hits.py/eigencentrality.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release

PPB = 1_000_000_000


def salsa_scores(edges: DataFrame, side: str = "auth") -> DataFrame:
    """(vertex, deg, component, salsa_ppb) for every node on the chosen
    side of the directed bipartite edge table.  deg = in-degree of the
    authority (dst) side or out-degree of the hub (src) side;
    salsa_ppb = floor(deg * |S_c| * 1e9 / (m_c * |S|)) with S the chosen
    side's node set — exact integers end to end."""
    if side not in ("auth", "hub"):
        raise ValueError("side must be 'auth' or 'hub'")
    from .components import connected_components_stars

    key = "dst" if side == "auth" else "src"
    deg = edges.groupBy(F.col(key).alias("vertex")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    comps, _ = connected_components_stars(edges)
    # materialize: referenced by the per-component aggregate AND the final
    # select — without a cut the CC fixpoint subplan would execute twice
    labeled = deg.join(comps, "vertex").localCheckpoint(eager=True)
    try:
        # m_c = sum of side-degrees within the component (every edge has
        # exactly one endpoint on each side, so this IS the component's
        # edge count); |S_c| = side nodes in the component
        per_comp = labeled.groupBy("component").agg(
            F.count(F.lit(1)).alias("n_side_c"),
            F.sum("deg").alias("m_c"),
        )
        # one fused scalar pass for the total, the overflow caps included
        # (dmax = max deg is a column of labeled = the aggregate's input,
        # so all three scalars come from per_comp's parent in one job each
        # side: per_comp carries the component rollup, labeled the degrees)
        totals = per_comp.agg(
            F.sum("n_side_c").alias("n_side"), F.max("n_side_c").alias("cmax")
        ).collect()[0]
        n_side = int(totals["n_side"] or 0)
        if n_side == 0:
            return edges.sparkSession.createDataFrame(
                [], "vertex long, deg long, component long, salsa_ppb long"
            )
        caps = labeled.agg(F.max("deg").alias("dmax")).collect()[0]
        if int(caps["dmax"]) * int(totals["cmax"]) > 9_000_000_000:
            raise ValueError(
                "salsa_scores ppb numerator would overflow BIGINT "
                f"(max deg {caps['dmax']} x max component side size "
                f"{totals['cmax']} x 1e9 > ~9.2e18); upgrade the score "
                "expression to DECIMAL(38,0) for graphs this dense"
            )
        # eager-materialize the result BEFORE releasing the checkpointed
        # scratch it is built on (lineage is truncated — the triangles.py
        # release discipline)
        return (
            labeled.join(F.broadcast(per_comp), "component")
            .select(
                "vertex",
                F.col("deg").cast("long").alias("deg"),
                F.col("component").cast("long").alias("component"),
                F.expr(
                    f"(deg * n_side_c * CAST({PPB} AS BIGINT)) "
                    f"div (m_c * CAST({n_side} AS BIGINT))"
                ).alias("salsa_ppb"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        release(labeled)
