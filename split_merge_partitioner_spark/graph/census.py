"""Exact directed triadic census — all 16 Holland-Leinhardt MAN classes.

The classic SNA structural profile (Wasserman & Faust ch. 14; Batagelj &
Mrvar 2001 for the subtraction scheme): count every one of the C(n,3)
vertex triples into its isomorphism class 003..300.  Naming follows the
standard MAN convention (e.g. '021D' = B->A, B->C out-star;
'111D' = A<->B<-C; '120C' = A->B->C with A<->C).

Why this is NOT an n^3 (or even wedge-enumeration) job:

- The 7 CLOSED classes (all 3 pairs linked: 300 210 120D/U/C 030T/C) come
  from degree-oriented triangle enumeration over the undirected support
  E* — O(sum out-deg^2) with the O(sqrt m) hub cap, the exact kernel
  triangle_count/ktruss already run — each triangle classified by pure
  column logic over its 6 direction bits.
- The 4 OPEN two-path classes (021D/U/C, 111D/U, 201) come from
  per-vertex dyad-role counts: a center with m mutual / a_out / a_in
  asymmetric neighbors contributes C(m,2), m*a_out, ... RAW two-paths;
  closed triples pollute each raw count a FIXED number of times per
  class, so exact counts fall out by subtracting the (already counted)
  triangle classes.  Zero wedge rows ever materialize.
- The single-link classes (012, 102) are per-EDGE closed forms:
  (n-2) - |N*(u) ∪ N*(v) \\ {u,v}|, with the union expanded through the
  per-edge common-neighbor count (= triangle support, 3 rows per
  enumerated triangle).
- 003 is C(n,3) minus everything else.

Everything is exact BIGINT arithmetic; the final assembly collects a
CONSTANT-size set of scalars (one raw-moment row, <= 7 closed-class rows,
2 single-link rows) to the driver — never data-scale rows — and the
internal identity sum(census) == C(n,3) is asserted before returning.

Reference parity: the FSM reference computes no triadic census; this is
engine-native analytics breadth on the same edge tables its partitioners
produce.
"""

from __future__ import annotations

from math import comb

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pagerank import release
from .triangles import _oriented

TRIAD_TYPES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]


def triadic_census(edges: DataFrame) -> DataFrame:
    """(triad_type, n_triads): exact counts of all 16 directed triad
    classes over the simple digraph (self-loops dropped, parallel edges
    deduped).  n = number of distinct endpoints in the edge relation.
    Always returns exactly 16 rows (zeros included)."""
    spark = SparkSession.getActiveSession()
    d = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )

    # canonical pair relation with direction flags: f_lh = lo->hi exists
    pr = (
        d.select(
            F.least("src", "dst").alias("lo"),
            F.greatest("src", "dst").alias("hi"),
            (F.col("src") < F.col("dst")).cast("int").alias("lh"),
            (F.col("src") > F.col("dst")).cast("int").alias("hl"),
        )
        .groupBy("lo", "hi")
        .agg(F.max("lh").alias("f_lh"), F.max("hl").alias("f_hl"))
        .localCheckpoint(eager=True)  # reused by roles, triangles, singles
    )
    try:
        mut = F.col("f_lh") + F.col("f_hl") == 2

        # per-vertex dyad roles: m / a_out / a_in
        lo_side = pr.select(
            F.col("lo").alias("v"),
            mut.cast("long").alias("im"),
            ((~mut) & (F.col("f_lh") == 1)).cast("long").alias("io"),
            ((~mut) & (F.col("f_hl") == 1)).cast("long").alias("ii"),
        )
        hi_side = pr.select(
            F.col("hi").alias("v"),
            mut.cast("long").alias("im"),
            ((~mut) & (F.col("f_hl") == 1)).cast("long").alias("io"),
            ((~mut) & (F.col("f_lh") == 1)).cast("long").alias("ii"),
        )
        pv = (
            lo_side.unionAll(hi_side)
            .groupBy("v")
            .agg(F.sum("im").alias("m"), F.sum("io").alias("aout"), F.sum("ii").alias("ain"))
            .localCheckpoint(eager=True)
        )

        n = pv.count()

        # raw two-path moments (include closed triples; subtracted below)
        raw = pv.agg(
            F.sum(F.expr("m * (m - 1) div 2")).alias("raw201"),
            F.sum(F.col("m") * F.col("aout")).alias("raw111u"),
            F.sum(F.col("m") * F.col("ain")).alias("raw111d"),
            F.sum(F.expr("aout * (aout - 1) div 2")).alias("raw021d"),
            F.sum(F.expr("ain * (ain - 1) div 2")).alias("raw021u"),
            F.sum(F.col("aout") * F.col("ain")).alias("raw021c"),
        ).collect()[0]

        # triangle enumeration on E* (degree-oriented; hub-capped wedges)
        es = pr.select(F.col("lo").alias("src"), F.col("hi").alias("dst"))
        o = _oriented(es, "degree")
        try:
            ab = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
            bc = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
            ac = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
            tri = ab.join(bc, "b").join(ac, ["a", "c"]).select("a", "b", "c")
            tri = tri.localCheckpoint(eager=True)  # reused: classify + support
        finally:
            release(o)

        try:
            # per-pair flags for the triangle's three pairs P1=(a,b),
            # P2=(b,c), P3=(a,c); z (the non-mutual-pair vertex when
            # exactly one pair is mutual): P1->c, P2->a, P3->b
            def flags(i: int, x: str, y: str):
                p = pr.select(
                    F.col("lo").alias(f"lo{i}"),
                    F.col("hi").alias(f"hi{i}"),
                    mut.alias(f"m{i}"),
                    F.when(~mut, F.when(F.col("f_lh") == 1, F.col("lo")).otherwise(F.col("hi")))
                    .alias(f"s{i}"),
                )
                cond = (F.least(F.col(x), F.col(y)) == F.col(f"lo{i}")) & (
                    F.greatest(F.col(x), F.col(y)) == F.col(f"hi{i}")
                )
                return p, cond

            p1, c1 = flags(1, "a", "b")
            wide = tri.join(p1, c1)
            p2, c2 = flags(2, "b", "c")
            wide = wide.join(p2, c2)
            p3, c3 = flags(3, "a", "c")
            wide = wide.join(p3, c3)

            nm = sum(F.col(f"m{i}").cast("int") for i in (1, 2, 3))

            def out_of(v: str):
                return sum(
                    F.coalesce((F.col(f"s{i}") == F.col(v)).cast("int"), F.lit(0))
                    for i in (1, 2, 3)
                )

            z = (
                F.when(F.col("m1"), F.col("c"))
                .when(F.col("m2"), F.col("a"))
                .otherwise(F.col("b"))
            )
            zout = sum(
                F.coalesce((F.col(f"s{i}") == z).cast("int"), F.lit(0))
                for i in (1, 2, 3)
            )
            cls = (
                F.when(nm == 3, F.lit("300"))
                .when(nm == 2, F.lit("210"))
                .when(
                    nm == 1,
                    F.when(zout == 2, F.lit("120D"))
                    .when(zout == 0, F.lit("120U"))
                    .otherwise(F.lit("120C")),
                )
                .otherwise(
                    F.when(
                        F.greatest(out_of("a"), out_of("b"), out_of("c")) == 2,
                        F.lit("030T"),
                    ).otherwise(F.lit("030C"))
                )
            )
            closed = {
                r.cls: r.c
                for r in wide.select(cls.alias("cls"))
                .groupBy("cls")
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            }
            for t in ("300", "210", "120D", "120U", "120C", "030T", "030C"):
                closed.setdefault(t, 0)

            # per-pair common-neighbor counts (triangle support), then the
            # single-link closed form per pair, summed by pair type
            sup = (
                tri.select(F.col("a").alias("x"), F.col("b").alias("y"))
                .unionAll(tri.select(F.col("b"), F.col("c")))
                .unionAll(tri.select(F.col("a"), F.col("c")))
                .select(F.least("x", "y").alias("lo"), F.greatest("x", "y").alias("hi"))
                .groupBy("lo", "hi")
                .agg(F.count(F.lit(1)).alias("cn"))
            )
            deg = pv.select("v", (F.col("m") + F.col("aout") + F.col("ain")).alias("dstar"))
            singles_df = (
                pr.join(sup, ["lo", "hi"], "left")
                .join(deg.withColumnRenamed("v", "lo").withColumnRenamed("dstar", "dl"), "lo")
                .join(deg.withColumnRenamed("v", "hi").withColumnRenamed("dstar", "dh"), "hi")
                .select(
                    mut.alias("ism"),
                    (
                        F.lit(n - 2)
                        - (F.col("dl") - 1)
                        - (F.col("dh") - 1)
                        + F.coalesce(F.col("cn"), F.lit(0))
                    ).alias("iso"),
                )
                .groupBy("ism")
                .agg(F.sum("iso").alias("s"))
            )
            singles = {r.ism: r.s for r in singles_df.collect()}
            n102 = int(singles.get(True, 0))
            n012 = int(singles.get(False, 0))
        finally:
            release(tri)
    finally:
        release(pr)
        try:
            release(pv)
        except NameError:
            pass

    census = {
        "300": closed["300"],
        "210": closed["210"],
        "120D": closed["120D"],
        "120U": closed["120U"],
        "120C": closed["120C"],
        "030T": closed["030T"],
        "030C": closed["030C"],
        # open two-path classes: raw moments minus closed pollution
        "201": int(raw.raw201) - 3 * closed["300"] - closed["210"],
        "111D": int(raw.raw111d) - 2 * closed["120D"] - closed["120C"] - closed["210"],
        "111U": int(raw.raw111u) - 2 * closed["120U"] - closed["120C"] - closed["210"],
        "021D": int(raw.raw021d) - closed["120D"] - closed["030T"],
        "021U": int(raw.raw021u) - closed["120U"] - closed["030T"],
        "021C": int(raw.raw021c) - closed["120C"] - 3 * closed["030C"] - closed["030T"],
        "102": n102,
        "012": n012,
    }
    census["003"] = comb(n, 3) - sum(census.values())
    total = sum(census.values())
    if total != comb(n, 3) or min(census.values()) < 0:
        raise RuntimeError(
            f"triadic census identity violated: sum={total} != C({n},3)={comb(n, 3)} "
            f"or negative class in {census}"
        )
    return spark.createDataFrame(
        [(t, census[t]) for t in TRIAD_TYPES], "triad_type string, n_triads long"
    )


def dyad_census(edges: DataFrame) -> DataFrame:
    """One row — the Holland-Leinhardt DYAD census of the simple digraph
    (self-loops dropped, parallel arcs deduped), the 2-vertex companion of
    :func:`triadic_census`:

    (n_vertices, n_arcs, mutual, asym, null_dyads, reciprocity_ppm)

    mutual = unordered pairs linked in both directions, asym = exactly one,
    null_dyads = C(n,2) − mutual − asym; reciprocity_ppm = ⌊1e6 · 2·mutual /
    n_arcs⌋ — the classic arc-reciprocity r (fraction of arcs whose reverse
    also exists), reported as an exact integer ppm so the cross-engine hash
    has no float surface.  n_arcs = 0 reports reciprocity_ppm = 0.

    Plan: one distinct + one canonical-pair groupBy (map-side combined) +
    constant-size scalar aggregates — two exchanges total, no driver
    collect, no iteration.  The pair relation is the same shape every
    partitioner stats op shuffles, so this is free at any scale the engine
    already handles.
    """
    d = edges.select("src", "dst").where(F.col("src") != F.col("dst")).distinct()
    pair_counts = d.groupBy(
        F.least("src", "dst").alias("lo"), F.greatest("src", "dst").alias("hi")
    ).agg(F.count(F.lit(1)).alias("c"))
    agg = pair_counts.agg(
        F.sum((F.col("c") == 2).cast("long")).alias("mutual"),
        F.sum((F.col("c") == 1).cast("long")).alias("asym"),
        F.sum("c").alias("n_arcs"),
    )
    nv = (
        d.select(F.col("src").alias("v"))
        .unionAll(d.select(F.col("dst").alias("v")))
        .agg(F.countDistinct("v").alias("n_vertices"))
    )
    return nv.crossJoin(agg).select(
        "n_vertices",
        F.coalesce("n_arcs", F.lit(0)).cast("long").alias("n_arcs"),
        F.coalesce("mutual", F.lit(0)).cast("long").alias("mutual"),
        F.coalesce("asym", F.lit(0)).cast("long").alias("asym"),
        (
            F.expr("CAST(n_vertices * (n_vertices - 1) AS BIGINT) div 2")
            - F.coalesce("mutual", F.lit(0))
            - F.coalesce("asym", F.lit(0))
        ).cast("long").alias("null_dyads"),
        F.when(F.coalesce("n_arcs", F.lit(0)) > 0,
               F.expr("CAST(2000000 * mutual AS BIGINT) div n_arcs"))
        .otherwise(F.lit(0)).cast("long").alias("reciprocity_ppm"),
    )
