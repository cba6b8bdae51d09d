"""Seeded label spreading (semi-supervised node classification): a small
set of vertices carries a known class label; every round each UNLABELED
vertex adopts the majority label among its labeled neighbors
(deterministic tie-break: smaller label wins), while seed labels stay
CLAMPED (Zhu & Ghahramani 2002 harmonic-function flavor, hard-label
variant).  Distinct from graph/labelprop.py, which is unsupervised
community detection where every vertex relabels every round.

Determinism: the vote is an integer (neighbor, label) count; argmax with
(count desc, label asc) ordering is a pure function of the multiset, so a
fixed-round run replays exactly as chained SQL CTEs — the driver oracle
hash-matches every row.

Execution (the superstep shape every iterative op here uses): static
doubled edge relation hash-partitioned by destination and checkpointed
once; per round one co-located join (labeled state ⋈ edges), one
map-side-combined count groupBy, one window argmax, one anti-join to keep
seeds clamped.  State = (vertex, label) for labeled vertices only — grows
monotonically toward n rows, never beyond.  Rounds are a fixed horizon
(labels stabilize in O(diameter) rounds; unreached vertices stay
unlabeled and are reported with label NULL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..storage import release


def label_spreading(
    edges: DataFrame,
    seeds: DataFrame,
    n_rounds: int = 3,
) -> DataFrame:
    """(vertex, label, is_seed) after ``n_rounds`` of clamped majority-vote
    spreading of ``seeds`` = (vertex, label) over the undirected (src, dst)
    edge table.  Vertices no labeled vertex reaches within the horizon
    report label NULL, is_seed false."""
    if n_rounds < 1:
        raise ValueError("n_rounds must be >= 1")
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    scratch: list = []
    try:
        und = (
            edges.select(F.col("src").alias("nb"), F.col("dst").alias("v"))
            .unionAll(
                edges.select(F.col("dst").alias("nb"), F.col("src").alias("v"))
            )
            .repartition(shuffle_n, "nb")
            .localCheckpoint(eager=True)
        )
        scratch.append(und)
        seed_state = (
            seeds.select("vertex", F.col("label").cast("long").alias("label"))
            .dropDuplicates(["vertex"])
            .localCheckpoint(eager=True)
        )
        scratch.append(seed_state)
        cur = seed_state
        for _ in range(n_rounds):
            votes = (
                cur.hint("shuffle_hash")
                .join(und, cur["vertex"] == und["nb"])
                .groupBy(F.col("v").alias("vertex"), "label")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            w = Window.partitionBy("vertex").orderBy(
                F.col("n").desc(), F.col("label").asc()
            )
            adopted = (
                votes.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select("vertex", "label")
                # clamp: seeds keep their label, and already-labeled
                # non-seeds RE-VOTE each round (labels may flip as the
                # labeled frontier grows — the hard-label spreading rule)
                .join(seed_state.select("vertex"), "vertex", "left_anti")
            )
            nxt = seed_state.unionAll(adopted).localCheckpoint(eager=True)
            scratch.append(nxt)
            cur = nxt
        universe = und.select(F.col("v").alias("vertex")).distinct()
        return (
            universe.join(cur, "vertex", "left")
            .join(
                seed_state.select("vertex", F.lit(True).alias("is_seed")),
                "vertex",
                "left",
            )
            .select(
                "vertex",
                "label",
                F.coalesce("is_seed", F.lit(False)).alias("is_seed"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        for df in scratch:
            release(df)
