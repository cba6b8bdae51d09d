"""Spinner — balanced k-way VERTEX partitioning by label propagation
(Martella, Logothetis, Loukas & Siganos, "Spinner: Scalable Graph
Partitioning in the Cloud", ICDE 2017), derandomized so the whole run is a
pure function of (edges, k, rounds, seed) and replayable round-for-round
in SQL.

Where it sits in the inventory: the reference engine (and operators/fsm.py,
hdrf.py, ...) partitions EDGES; vertex2edgepart.cpp consumes an external
METIS vertex partition.  Spinner is the in-engine way to PRODUCE such a
vertex partition at web scale — the paper runs it on Giraph over
billion-edge graphs with exactly the message pattern used here, and its
output feeds ``operators/vertex_cut.py::vertex2edge_partition`` the same
way a gpmetis ``.part`` file does (sources/writers.py::read_metis_vertexparts).

Scoring, made exact.  Spinner moves v to the label l maximizing
    n_l(v)/deg(v) + c * (1 - load(l)/CAP),
n_l = v's neighbors currently holding l, CAP = ceil(n/k) the balanced
capacity.  For fixed v the comparison across labels is invariant under
multiplying by deg(v)*CAP > 0, so with c = 1 we rank by the INTEGER
    score(v, l) = n_l * CAP + deg(v) * (CAP - load(l)),
ties to the smaller label — no floats anywhere, so Spark and DuckDB agree
bit-for-bit.  |score| <= 2 * n * CAP, guarded <= 2^62 (n <= 2e9).

Derandomized migration.  The paper breaks synchronous-LP oscillation by
letting each improving vertex migrate with probability ~1/2; we instead
gate moves on (vertex + round) % 2 — the deterministic half/half schedule
(the same parity trick graph/mis.py uses for Luby rounds).  Two adjacent
vertices can still swap in one round only if they share parity AND both
strictly improve, and the alternating gate kills the classic bipartite
flip-flop: after two consecutive zero-move rounds (one per parity) the
state is provably a fixpoint — labels and loads are unchanged and the
move predicate depends on the round only through its parity, so every
later round is also a no-op.  ``spinner_partition`` therefore early-stops
on a two-round dry streak while the SQL oracle replays the full
``rounds`` budget; results are identical by the argument above.

Capacity admission (the paper's c > 1 headroom, derandomized).  The
score's load penalty alone does NOT bound imbalance — on hub-dense
graphs synchronous pile-in floods one label and starves others to death
(a dead label is in nobody's candidate set and can never repopulate).
So migration is additionally ADMISSION-CONTROLLED: would-be migrants to
label l rank by (score gain DESC, vertex ASC) and only the top
cap_adm − load(l) are admitted, cap_adm = CAP + max(1, CAP//20) — the
paper's remaining-capacity acceptance probability turned into a
deterministic top-k.  Imbalance is hard-bounded at ~1.05·CAP while the
5% slack leaves room for locality-improving swaps (a zero-slack bound
would freeze a balanced init entirely).  One extra per-round window,
partitioned by target label.

Scale shape (per round, all Catalyst): one n-row exchange keyed by vertex
(the neighbor-label count; the argmax window repartitions on the same
key), a k-row load aggregate broadcast back, and two broadcast-free joins
against the checkpointed static degree relation.  Labels are
localCheckpointed per round and the previous round's relation released
(storage.release) — constant executor storage regardless of rounds.
Loads enter the score as a k-row broadcast, NOT per-vertex state: the
global bookkeeping lives in the aggregate, the exact shape the paper's
sharded counters implement on Giraph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.sampling import sample_hash
from ..storage import release

_N_CAP = 2_000_000_000  # |score| <= 2*n*ceil(n/k) must stay < 2^63


def spinner_partition(
    edges: DataFrame,
    k: int,
    rounds: int = 8,
    seed: int = 42,
) -> tuple[DataFrame, dict]:
    """((vertex, label), info) — balanced k-way vertex partition of the
    undirected canonical edge table after at most ``rounds`` synchronous
    Spinner rounds (early-stopped at the provable two-dry-round fixpoint).
    Labels are 0..k-1, initialized by the keyed Lehmer hash (ANSI-safe,
    SQL-replayable) so the start is balanced independent of the vid
    distribution.  info: rounds_run, moves (per round), converged, n, cap."""
    if k < 2:
        raise ValueError("spinner_partition needs k >= 2")
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    e = (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    nb = (
        e.select(F.col("src").alias("v"), F.col("dst").alias("nb"))
        .unionAll(e.select(F.col("dst").alias("v"), F.col("src").alias("nb")))
        .localCheckpoint(eager=True)
    )
    deg = (
        nb.groupBy("v")
        .agg(F.count(F.lit(1)).cast("long").alias("degree"))
        .localCheckpoint(eager=True)
    )
    n = deg.count()
    if n > _N_CAP:
        raise ValueError(
            f"spinner_partition: n = {n} exceeds {_N_CAP}; the integer score "
            "n_l*CAP + deg*(CAP - load) would overflow int64 — shard the label "
            "space or rescale CAP first"
        )
    cap = (n + k - 1) // k  # ceil(n/k), the balanced capacity
    # admission capacity = cap + 5% slack (>= 1): the Spinner paper's c > 1
    # headroom — without it a balanced init leaves zero remaining capacity
    # anywhere and migration freezes; with it, imbalance is hard-bounded at
    # cap_adm while locality-improving swaps still have room to flow
    cap_adm = cap + max(1, cap // 20)
    lab_ck = deg.select(
        F.col("v").alias("vertex"),
        (sample_hash("v", seed) % F.lit(k)).cast("long").alias("label"),
    ).localCheckpoint(eager=True)
    labels = lab_ck
    info: dict = {"rounds_run": 0, "moves": [], "converged": False, "n": n, "cap": cap}
    scratch = [nb, deg]
    try:
        dry = 0
        for r in range(1, rounds + 1):
            info["rounds_run"] = r
            loads = labels.groupBy("label").agg(
                F.count(F.lit(1)).cast("long").alias("load")
            )
            # candidate labels of v = labels among neighbors (with their
            # counts) union v's current label at count 0; MAX dedups
            cnt = nb.join(
                labels.select(F.col("vertex").alias("nb"), "label"), "nb"
            ).groupBy("v", "label").agg(F.count(F.lit(1)).cast("long").alias("nl"))
            cand = (
                cnt.unionByName(
                    labels.select(
                        F.col("vertex").alias("v"),
                        "label",
                        F.lit(0).cast("long").alias("nl"),
                    )
                )
                .groupBy("v", "label")
                .agg(F.max("nl").alias("nl"))
            )
            scored = (
                cand.join(F.broadcast(loads), "label")
                .join(deg, "v")
                .select(
                    "v",
                    "label",
                    "load",
                    (
                        F.col("nl") * F.lit(cap)
                        + F.col("degree") * (F.lit(cap) - F.col("load"))
                    ).alias("score"),
                )
            )
            w = Window.partitionBy("v").orderBy(F.desc("score"), F.asc("label"))
            best = (
                scored.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select(
                    "v",
                    F.col("label").alias("bl"),
                    F.col("score").alias("bs"),
                    F.col("load").alias("bload"),
                )
            )
            cur = scored.join(
                labels.select(F.col("vertex").alias("v"), "label"), ["v", "label"]
            ).select("v", F.col("label").alias("cl"), F.col("score").alias("cs"))
            # migration gates, applied in order:
            # 1. parity dry-round gate (oscillation damper, as before);
            # 2. CAPACITY ADMISSION — the Spinner paper's remaining-capacity
            #    acceptance made deterministic: would-be migrants to label L
            #    rank by (gain DESC, v ASC) and only the top cap − load(L)
            #    are admitted, so a label can never overshoot cap by
            #    synchronous pile-in and the label-flood / label-death
            #    degeneracy on hub-dense graphs cannot start
            movers = (
                best.join(cur, "v")
                .where(
                    (F.col("bs") > F.col("cs"))
                    & ((F.col("v") + F.lit(r)) % 2 == 0)
                    & (F.col("bload") < F.lit(cap_adm))
                )
                .select(
                    "v", "bl", "bload", (F.col("bs") - F.col("cs")).alias("gain")
                )
            )
            wadm = Window.partitionBy("bl").orderBy(F.desc("gain"), F.asc("v"))
            admitted = (
                movers.withColumn("rn", F.row_number().over(wadm))
                .where(F.col("rn") <= F.lit(cap_adm) - F.col("bload"))
                .select("v", "bl")
            )
            nxt = (
                labels.join(
                    admitted.select(F.col("v").alias("vertex"), "bl"),
                    "vertex",
                    "left",
                )
                .select(
                    "vertex",
                    F.coalesce("bl", F.col("label")).alias("label"),
                    F.col("bl").isNotNull().cast("long").alias("moved"),
                )
                .localCheckpoint(eager=True)
            )
            moves = nxt.agg(F.sum("moved")).collect()[0][0] or 0
            info["moves"].append(int(moves))
            release(lab_ck)  # consumed: nxt owns this round's labels
            lab_ck = nxt
            labels = nxt.select("vertex", "label")
            dry = dry + 1 if moves == 0 else 0
            if dry >= 2:
                info["converged"] = True
                break
        # re-checkpoint the bare (vertex, label) projection so the RETURNED
        # relation is itself releasable (storage.release only frees root
        # LogicalRDDs, not projections over one) and free the 3-col round
        # relation — constant executor storage regardless of rounds
        out = labels.localCheckpoint(eager=True)
        release(lab_ck)
        return out, info
    finally:
        for df in scratch:
            release(df)


def spinner_quality(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-label quality of a (vertex, label) assignment over the canonical
    undirected edge table: ``(label, n_vertices, internal_edges,
    cut_edges)`` — cut_edges counts edges with exactly one endpoint in the
    label (each cut edge appears under both its labels; sum(internal) +
    sum(cut)/2 = m).  Two broadcast-free joins + one k-row aggregate."""
    e = (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    ls = labels.select(F.col("vertex").alias("src"), F.col("label").alias("l_src"))
    ld = labels.select(F.col("vertex").alias("dst"), F.col("label").alias("l_dst"))
    el = e.join(ls, "src").join(ld, "dst")
    per_edge = el.select(
        F.col("l_src").alias("label"),
        (F.col("l_src") == F.col("l_dst")).cast("long").alias("internal"),
    ).unionAll(
        el.where(F.col("l_src") != F.col("l_dst")).select(
            F.col("l_dst").alias("label"), F.lit(0).cast("long").alias("internal")
        )
    )
    counts = per_edge.groupBy("label").agg(
        F.sum("internal").cast("long").alias("internal_edges"),
        F.sum(1 - F.col("internal")).cast("long").alias("cut_edges"),
    )
    nv = labels.groupBy("label").agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices")
    )
    return (
        nv.join(counts, "label", "left")
        .select(
            "label",
            "n_vertices",
            F.coalesce("internal_edges", F.lit(0)).cast("long").alias("internal_edges"),
            F.coalesce("cut_edges", F.lit(0)).cast("long").alias("cut_edges"),
        )
    )
