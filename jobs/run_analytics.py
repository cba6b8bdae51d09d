#!/usr/bin/env python
"""spark-submit entry point: the downstream analytics suite over an edge table.

One CLI for every iterative/graph analytic the engine ships (run_pagerank.py
stays the checkpoint/resume-focused PageRank job):

  spark-submit --py-files engine.zip jobs/run_analytics.py \
      --input /data/edges.parquet --algo cc \
      [--p 32] [--output /data/out.parquet] [--json-out /data/info.json]

Algos: cc (connected components), lp (label propagation), triangles
(per-vertex triangle counts), tricount (single global count), clustering
(local clustering coefficient), linkpred (top-k common-neighbor
suggestions), bfs (--source vertex), diameter (double-sweep), hyperanf
(neighborhood function + effective diameter), kcore (coreness), walks
(deterministic random-walk corpus), ppr (personalized pagerank from
--seeds), betweenness (Brandes from --seeds), closeness (seed-sampled
harmonic centrality, exact lcm-numerator BFS to --max-dist), summary (assortativity +
global clustering one-row table), eigen (eigenvector centrality, exact
integer power iteration), hits (hubs/authorities over the DIRECTED edge
table — direction is semantic, no canonicalization), scc (strongly
connected components, FW-BW coloring, directed as-is), dpagerank
(directed PageRank with dangling redistribution), densest
(batched Charikar peel round stats), mis (Luby maximal independent
set) / matching (maximal matching, the coarsening primitive) —
both derandomized keyed-hash priorities, wpagerank (weighted rank
splitting, --weight-col), sssp (weighted
shortest paths from --source; --weight-col names an integer edge weight),
modularity (Newman Q of the labelprop communities), ktruss (support
peeling; --k, canonical-edge input canonicalized internally via the
triangle path's orientation), butterfly (bipartite 4-cycle count +
per-vertex participation), nsample (layer-wise GraphSAGE fanout sample;
--fanouts/--seed-fraction), node2vec (second-order
biased walks, --bias "wr,wc,wx"), louvain (multi-level Louvain community
detection: --levels levels x --n-iter parity-gated local-move rounds
with weighted contraction between levels), abcore (bipartite (α,β)-core
peel; --alpha/--beta per-side degree floors, disjoint-id fail-fast),
orbits (per-vertex 15-orbit graphlet degree vectors).  Partition-aware algos
(cc, lp, bfs, diameter, hyperanf) partition the edges with DBH first
(cheap, pure expression) unless --no-partition is given.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct `python jobs/run_*.py` invocation: put the repo root on sys.path
# (spark-submit --py-files provides the package on executors either way)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _default_seeds(edges, n: int = 5) -> list:
    """The 5 smallest vertex ids — the shared --seeds fallback for
    ppr/betweenness/closeness/cascade/spammass."""
    from pyspark.sql import functions as F

    return [
        r.v
        for r in edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .distinct()
        .orderBy("v")
        .limit(n)
        .collect()
    ]


def main(argv=None, stop: bool = True) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument(
        "--algo", required=True,
        choices=["cc", "lp", "triangles", "tricount", "clustering", "linkpred", "bfs",
                 "diameter", "hyperanf", "kcore", "walks", "ppr", "betweenness",
                 "summary", "eigen", "hits", "sssp", "modularity", "ktruss",
                 "closeness", "scc", "densest", "wpagerank", "mis", "matching",
                 "dpagerank", "coloring", "butterfly", "nsample", "louvain", "node2vec",
                 "richclub", "katz", "daglevels", "salsa", "kclique", "squares",
                 "gini", "compsizes", "onion", "trussness", "census", "spectral",
                 "sweep", "wl", "msf", "bridges", "twoecc", "bicc", "articulation",
                 "rcm", "gapbits", "widest", "abcore", "orbits",
                 "twins", "landmarks", "rewire", "fingerprint", "cascade",
                 "spammass"],
    )
    ap.add_argument("--output", default=None, help="result parquet")
    ap.add_argument("--json-out", default=None, help="write the info dict here")
    ap.add_argument("--p", type=int, default=32, help="DBH partition count")
    ap.add_argument("--max-iter", type=int, default=200)
    ap.add_argument("--source", type=int, default=None, help="bfs source vertex")
    ap.add_argument("--n-steps", type=int, default=32, help="hyperanf supersteps")
    ap.add_argument("--cc-algo", choices=["label", "stars"], default="label",
                    help="cc: min-label supersteps (O(diameter)) or "
                         "large/small-star contraction (O(log^2 n) rounds)")
    ap.add_argument("--peel-rounds", type=int, default=8,
                    help="densest: peeling rounds (best density tracked)")
    ap.add_argument("--max-dist", type=int, default=16,
                    help="closeness BFS horizon (harmonic sum truncation)")
    ap.add_argument("--n-iter", type=int, default=5,
                    help="lp synchronous supersteps (lp runs EXACTLY this many)")
    ap.add_argument("--k", type=int, default=5, help="linkpred suggestions per vertex")
    ap.add_argument("--closed", action="store_true",
                    help="twins: closed-neighborhood (N[v]) classes")
    ap.add_argument("--p-ppm", type=int, default=100_000,
                    help="cascade: IC edge probability in ppm")
    ap.add_argument("--n-sims", type=int, default=8,
                    help="cascade: Monte-Carlo simulations")
    ap.add_argument("--alpha", type=int, default=2, help="abcore src-side degree floor")
    ap.add_argument("--beta", type=int, default=2, help="abcore dst-side degree floor")
    ap.add_argument("--labels-input", default=None,
                    help="cc: precomputed (vertex, component) parquet — with "
                         "--delta-input, merge the delta incrementally instead "
                         "of recomputing from --input")
    ap.add_argument("--delta-input", default=None,
                    help="cc/kcore: delta edge parquet for the incremental merge")
    ap.add_argument("--coreness-input", default=None,
                    help="kcore: checkpointed (vertex, coreness) parquet — with "
                         "--delta-input, warm-start the exact merged recompute")
    ap.add_argument("--min-common", type=int, default=2,
                    help="linkpred common-neighbor floor")
    ap.add_argument("--max-center-degree", default="auto",
                    help="linkpred hub truncation: drop wedge centers above this "
                         "degree.  Default 'auto' = max(16, ceil(sqrt(2m))); "
                         "'none' opts in to unbounded wedge volume (safe only "
                         "without power-law hubs; see linkpred.py)")
    ap.add_argument("--no-partition", action="store_true",
                    help="skip DBH pre-partitioning (forces shuffle paths)")
    ap.add_argument("--seeds", default=None,
                    help="comma-separated vertex ids for ppr/betweenness "
                         "(default: the 5 smallest vertex ids)")
    ap.add_argument("--n-rounds", type=int, default=4, help="hits rounds")
    ap.add_argument("--k-truss", type=int, default=4, help="ktruss k (>= 3)")
    ap.add_argument("--n-power-iter", type=int, default=6,
                    help="eigen power-iteration steps (integer-exact; the "
                         "module fail-fasts if dmax^steps overflows)")
    ap.add_argument("--max-supersteps", type=int, default=8,
                    help="sssp Bellman-Ford horizon (stops early at fixpoint)")
    ap.add_argument("--weight-col", default=None,
                    help="sssp/wpagerank: edge-weight column (default: unit / derived)")
    ap.add_argument("--walk-length", type=int, default=16)
    ap.add_argument("--walks-per-vertex", type=int, default=2)
    ap.add_argument("--seed", type=int, default=42, help="walks/mis hash seed")
    ap.add_argument("--fanouts", default="3,2", help="nsample per-hop fanouts")
    ap.add_argument("--levels", type=int, default=2, help="louvain levels")
    ap.add_argument("--bias", default="1,1,1",
                    help="node2vec integer bias weights wr,wc,wx")
    ap.add_argument("--seed-fraction", type=float, default=0.02,
                    help="nsample seed-vertex hash fraction")
    args = ap.parse_args(argv)

    from split_merge_partitioner_spark.graph import (
        approximate_diameter,
        bfs_distances,
        connected_components,
        coreness,
        hyperanf,
        label_propagation,
        link_suggestions,
        local_clustering,
        triangle_count,
        triangles_per_vertex,
    )
    from split_merge_partitioner_spark.operators import dbh_partition
    from split_merge_partitioner_spark.session import get_spark

    spark = get_spark(app_name=f"smp-analytics-{args.algo}")
    edges = spark.read.parquet(args.input).localCheckpoint(eager=True)
    assigned = None if args.no_partition else dbh_partition(edges, args.p)

    # cc/lp's gather-scatter mode needs the edge partition; without one the
    # join mode is the correct (and only) configuration
    cc_lp_mode = "join" if assigned is None else "gas"
    info: dict = {}
    if args.algo == "cc":
        if args.labels_input and args.delta_input:
            # incremental merge: precomputed labels + a delta edge batch;
            # equals a full recompute without rescanning the base edges
            from split_merge_partitioner_spark.graph import (
                connected_components_incremental,
            )

            lab = spark.read.parquet(args.labels_input)
            delta = spark.read.parquet(args.delta_input)
            out, info = connected_components_incremental(lab, delta)
        elif args.cc_algo == "stars":
            # diameter-independent star contraction; needs no partition
            from split_merge_partitioner_spark.graph import connected_components_stars

            out, info = connected_components_stars(edges)
        else:
            out, info = connected_components(edges, assigned=assigned,
                                             mode=cc_lp_mode, max_iter=args.max_iter)
    elif args.algo == "lp":
        out = label_propagation(edges, assigned=assigned, mode=cc_lp_mode,
                                n_iter=args.n_iter)
    elif args.algo == "triangles":
        out = triangles_per_vertex(edges)
    elif args.algo == "clustering":
        out = local_clustering(edges)
    elif args.algo == "linkpred":
        mcd = args.max_center_degree
        if isinstance(mcd, str):
            mcd = None if mcd.lower() == "none" else ("auto" if mcd == "auto" else int(mcd))
        # arbitrary external edge tables are canonicalized inside
        # link_suggestions (its degree counts + anti-join require
        # deduped src<dst edges)
        out = link_suggestions(edges, k=args.k, min_common=args.min_common,
                               max_center_degree=mcd)
    elif args.algo == "tricount":
        n_tri = triangle_count(edges)  # returns the scalar
        info = {"triangles": int(n_tri)}
        out = spark.createDataFrame([(int(n_tri),)], "n_triangles long")
    elif args.algo == "bfs":
        if args.source is None:
            ap.error("--algo bfs requires --source")
        out = bfs_distances(edges, args.source, assigned=assigned)
    elif args.algo == "diameter":
        out, info = approximate_diameter(edges, assigned=assigned)
    elif args.algo == "hyperanf":
        out, info = hyperanf(edges, assigned=assigned, n_steps=args.n_steps)
    elif args.algo == "kcore":
        if args.coreness_input and args.delta_input:
            # incremental maintenance: checkpointed coreness + delta batch
            from split_merge_partitioner_spark.graph.kcore import (
                coreness_incremental,
            )

            prior = spark.read.parquet(args.coreness_input)
            delta = spark.read.parquet(args.delta_input)
            out, info = coreness_incremental(edges, delta, prior,
                                             max_iter=args.max_iter)
        else:
            out, info = coreness(edges, max_iter=args.max_iter)
    elif args.algo == "dpagerank":
        # DIRECTED semantics like hits/scc: src->dst as given
        from split_merge_partitioner_spark.graph import directed_pagerank

        out = directed_pagerank(edges, n_iter=args.n_iter)
    elif args.algo == "matching":
        from split_merge_partitioner_spark.graph import maximal_matching

        out, info = maximal_matching(edges, seed=args.seed)
    elif args.algo == "mis":
        from split_merge_partitioner_spark.graph import maximal_independent_set

        out, info = maximal_independent_set(edges, seed=args.seed)
    elif args.algo == "coloring":
        from split_merge_partitioner_spark.graph import greedy_coloring

        out, info = greedy_coloring(edges, seed=args.seed)
    elif args.algo == "louvain":
        # multi-level Louvain: --levels levels of (--n-iter local-move
        # rounds + weighted contraction); labels map back to original ids
        from split_merge_partitioner_spark.graph import louvain

        out, info = louvain(edges, n_levels=args.levels, n_rounds=args.n_iter)
        from split_merge_partitioner_spark.graph.modularity import modularity
        from pyspark.sql import functions as F

        info["modularity"] = float(
            modularity(
                edges, out.select("vertex", F.col("comm").alias("label"))
            ).collect()[0]["modularity"]
        )
    elif args.algo == "node2vec":
        # second-order biased walks; --bias "wr,wc,wx" = 1/p : 1 : 1/q ints
        from split_merge_partitioner_spark.graph import node2vec_walks

        wr, wc, wx = (int(x) for x in args.bias.split(","))
        out = node2vec_walks(edges, walk_length=args.walk_length,
                             walks_per_vertex=args.walks_per_vertex,
                             seed=args.seed, w_return=wr, w_common=wc,
                             w_explore=wx)
        info = {"bias": [wr, wc, wx]}
    elif args.algo == "katz":
        from pyspark.sql import functions as F

        from split_merge_partitioner_spark.graph import katz_centrality

        canon = (
            edges.select(F.least("src", "dst").alias("src"),
                         F.greatest("src", "dst").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
        )
        out = katz_centrality(canon, n_iter=args.n_power_iter)
    elif args.algo == "daglevels":
        # Kahn layering on the id-oriented DAG (longest path from sources);
        # raises if the oriented input still contains a cycle
        from pyspark.sql import functions as F

        from split_merge_partitioner_spark.graph import topological_levels

        dag = (
            edges.select(F.least("src", "dst").alias("src"),
                         F.greatest("src", "dst").alias("dst"))
            .where(F.col("src") != F.col("dst"))
        )
        out = topological_levels(dag)
        info = {"depth": out.agg(F.max("level")).collect()[0][0]}
    elif args.algo == "richclub":
        from split_merge_partitioner_spark.graph import rich_club

        out = rich_club(edges)
    elif args.algo == "salsa":
        # closed-form SALSA on the directed bipartite edge table; authority
        # side (dst) — use --weight-col none etc. upstream, none needed here
        from split_merge_partitioner_spark.graph import salsa_scores

        out = salsa_scores(edges, side="auth")
    elif args.algo == "kclique":
        from pyspark.sql import functions as F

        from split_merge_partitioner_spark.graph import kclique_count

        canon = (
            edges.select(F.least("src", "dst").alias("src"),
                         F.greatest("src", "dst").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
        )
        cnt = kclique_count(canon, k=args.k)
        info = {"k": args.k, "n_cliques": cnt}
        out = spark.createDataFrame([(args.k, cnt)], "k long, n_cliques long")
    elif args.algo == "squares":
        from pyspark.sql import functions as F

        from split_merge_partitioner_spark.graph import square_count

        canon = (
            edges.select(F.least("src", "dst").alias("src"),
                         F.greatest("src", "dst").alias("dst"))
            .where(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
        )
        mcd = None if args.max_center_degree == "auto" else int(args.max_center_degree)
        out = square_count(canon, max_center_degree=mcd)
    elif args.algo == "gini":
        from split_merge_partitioner_spark.graph import degree_gini

        out = degree_gini(edges)
    elif args.algo == "compsizes":
        from split_merge_partitioner_spark.graph import component_size_histogram

        out = component_size_histogram(edges)
    elif args.algo == "onion":
        # k-core peel layers (onion decomposition)
        from split_merge_partitioner_spark.graph import onion_decomposition

        out, info = onion_decomposition(edges)
    elif args.algo == "trussness":
        # full per-edge truss numbers via batched support peeling
        from split_merge_partitioner_spark.graph.truss import truss_decomposition

        out, info = truss_decomposition(edges)
    elif args.algo == "census":
        # exact 16-class directed triadic census (directed edges as-is)
        from split_merge_partitioner_spark.graph import triadic_census

        out = triadic_census(edges)
    elif args.algo == "spectral":
        # integer-exact Fiedler bisection; --n-iter supersteps
        from split_merge_partitioner_spark.graph.spectral import spectral_bisect

        out = spectral_bisect(edges, n_iter=max(args.n_iter, 12))
    elif args.algo == "sweep":
        # ACL local community around --seeds via the PPR sweep cut
        from split_merge_partitioner_spark.graph import ppr_sweep_cut

        seeds = [int(x) for x in (args.seeds or "").split(",") if x != ""]
        if not seeds:
            ap.error("--seeds is required for --algo sweep")
        out = ppr_sweep_cut(edges, seeds)
    elif args.algo == "wl":
        # 1-WL color refinement fingerprints
        from split_merge_partitioner_spark.graph import wl_colors

        out = wl_colors(edges, n_rounds=args.n_rounds)
    elif args.algo == "msf":
        # Borůvka minimum spanning forest (--weight-col, default unit
        # weights => the lexicographically least forest)
        from split_merge_partitioner_spark.graph.mst import boruvka_msf
        from pyspark.sql import functions as F

        we = (
            edges
            if args.weight_col
            else edges.withColumn("w", F.lit(1).cast("long"))
        )
        out, info = boruvka_msf(we, weight_col=args.weight_col or "w")
    elif args.algo == "bridges":
        # seeded XOR cut-sketch bridge detection
        from split_merge_partitioner_spark.graph.bridges import bridges as _bridges

        out, info = _bridges(edges, seed=args.seed)
    elif args.algo == "twoecc":
        # 2-edge-connected components (CC of the non-bridge subgraph)
        from split_merge_partitioner_spark.graph.bridges import two_edge_components

        out, info = two_edge_components(edges, seed=args.seed)
    elif args.algo == "rcm":
        # Reverse Cuthill-McKee bandwidth-reduction vertex order
        from split_merge_partitioner_spark.graph.ordering import (
            cuthill_mckee_order,
        )

        out, info = cuthill_mckee_order(edges)
    elif args.algo == "gapbits":
        # delta-encoding cost of the adjacency under natural / degree-desc
        # / RCM vertex orders (exact integer bits)
        from split_merge_partitioner_spark.graph.ordering import (
            order_compression_report,
        )

        out = order_compression_report(edges)
    elif args.algo == "bicc":
        # biconnected components: canonical min-edge-key label per edge
        # (Tarjan-Vishkin over the deterministic spanning forest)
        from split_merge_partitioner_spark.graph.biconnectivity import (
            biconnected_components,
        )

        out, info = biconnected_components(edges)
    elif args.algo == "articulation":
        # articulation points (>= 2 distinct biconnected components at a
        # vertex); shares the bicc pipeline
        from split_merge_partitioner_spark.graph.biconnectivity import (
            articulation_points,
        )

        out, info = articulation_points(edges)
    elif args.algo == "abcore":
        # bipartite (α,β)-core peel (abcore.py) — src side needs --alpha,
        # dst side --beta; fails fast if the id spaces overlap
        from split_merge_partitioner_spark.graph import ab_core

        out, info = ab_core(edges, alpha=args.alpha, beta=args.beta)
    elif args.algo == "orbits":
        # per-vertex 15-orbit graphlet degree vectors (orbits.py)
        from split_merge_partitioner_spark.graph import orbit_counts

        out = orbit_counts(edges)
    elif args.algo == "landmarks":
        # Potamias'09 distance sketch from --k top-degree landmarks,
        # horizon --max-dist (landmarks.py)
        from split_merge_partitioner_spark.graph import landmark_sketch

        out = landmark_sketch(edges, k=args.k, max_dist=args.max_dist)
        info = {"k": args.k, "max_dist": args.max_dist}
    elif args.algo == "rewire":
        # configuration-model null graph (rewire.py), --seed
        from split_merge_partitioner_spark.graph import configuration_rewire

        out = configuration_rewire(edges, seed=args.seed)
    elif args.algo == "fingerprint":
        # whole-graph 1-WL fingerprint (wl.py), --n-rounds via --max-iter
        from split_merge_partitioner_spark.graph import graph_fingerprint

        out = graph_fingerprint(edges, n_rounds=min(args.max_iter, 8))
    elif args.algo in ("cascade", "spammass"):
        # IC influence / TrustRank spam mass; --seeds = cascade seed set /
        # trust whitelist (default: the 5 smallest vertex ids, the
        # ppr/betweenness convention); cascade also takes --p-ppm, --n-sims;
        # spammass takes --n-iter (the dpagerank convention)
        if args.seeds:
            seeds = [int(x) for x in args.seeds.split(",")]
        else:
            seeds = _default_seeds(edges)
        if args.algo == "cascade":
            from split_merge_partitioner_spark.graph import ic_influence

            out = ic_influence(edges, seeds=seeds, p_ppm=args.p_ppm,
                               n_sims=args.n_sims, seed=args.seed)
            info = {"seeds": seeds, "p_ppm": args.p_ppm, "n_sims": args.n_sims}
        else:
            from split_merge_partitioner_spark.graph import spam_mass

            out = spam_mass(edges, trusted=seeds, n_iter=args.n_iter)
            info = {"trusted": seeds, "n_iter": args.n_iter}
    elif args.algo == "twins":
        # exact structural twin classes (twins.py); --closed for N[v] twins
        from split_merge_partitioner_spark.graph import structural_twins

        out = structural_twins(edges, closed=args.closed)
        info = {"closed": args.closed}
    elif args.algo == "butterfly":
        # bipartite 4-cycle count + per-vertex participation (butterflies.py)
        from split_merge_partitioner_spark.graph import (
            butterflies_per_vertex,
            butterfly_count,
        )

        row = butterfly_count(edges).collect()[0]
        info = {k: row[k] for k in ("n_butterflies", "n_copair_rows",
                                    "n_wedges", "wedge_side")}
        out = butterflies_per_vertex(edges)
    elif args.algo == "nsample":
        # layer-wise GraphSAGE fanout sample; --fanouts "3,2", --seed
        from split_merge_partitioner_spark.graph import layerwise_neighbor_sample

        fanouts = tuple(int(x) for x in args.fanouts.split(","))
        out = layerwise_neighbor_sample(edges, fanouts=fanouts, seed=args.seed,
                                        seed_fraction=args.seed_fraction)
        info = {"fanouts": list(fanouts)}
    elif args.algo == "densest":
        from split_merge_partitioner_spark.graph import densest_subgraph_peel

        out = densest_subgraph_peel(edges, rounds=args.peel_rounds)
    elif args.algo == "scc":
        # DIRECTED semantics like hits: src->dst as given, no canonicalization
        from split_merge_partitioner_spark.graph import strongly_connected_components

        out, info = strongly_connected_components(edges)
    elif args.algo == "hits":
        # DIRECTED semantics: src->dst direction is the hub->authority
        # relation, so the input is taken as-is (no canonicalization)
        from split_merge_partitioner_spark.graph import hits

        out = hits(edges, n_rounds=args.n_rounds)
    elif args.algo == "wpagerank":
        from pyspark.sql import functions as F

        from split_merge_partitioner_spark.graph import weighted_pagerank

        we = (edges if args.weight_col
              else edges.withColumn("w", (F.col("src") + F.col("dst")) % 7 + 1))
        out = weighted_pagerank(we, n_iter=args.n_iter,
                                weight_col=args.weight_col or "w")
    elif args.algo == "sssp":
        if args.source is None:
            ap.error("--algo sssp requires --source")
        from split_merge_partitioner_spark.graph.sssp import shortest_paths

        out = shortest_paths(edges, [args.source],
                             max_supersteps=args.max_supersteps,
                             weight_col=args.weight_col)
    elif args.algo == "widest":
        # max-min bottleneck path widths from --source (the (max, min)
        # dual of sssp); --weight-col names a positive int capacity < 2^31
        if args.source is None:
            ap.error("--algo widest requires --source")
        from split_merge_partitioner_spark.graph.sssp import widest_paths

        out = widest_paths(edges, [args.source],
                           max_supersteps=args.max_supersteps,
                           capacity_col=args.weight_col)
    elif args.algo == "ktruss":
        from pyspark.sql import functions as F

        from split_merge_partitioner_spark.graph.truss import ktruss

        canon = (
            edges.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
        )
        out = ktruss(canon, k=args.k_truss, max_rounds=args.max_iter)
    elif args.algo == "modularity":
        from split_merge_partitioner_spark.graph import label_propagation
        from split_merge_partitioner_spark.graph.modularity import modularity

        labels = label_propagation(edges, assigned=assigned, mode=cc_lp_mode,
                                   n_iter=args.n_iter)
        out = modularity(edges, labels)
    elif args.algo in ("walks", "ppr", "betweenness", "summary", "eigen", "closeness"):
        from pyspark.sql import functions as F

        from split_merge_partitioner_spark.graph import (
            betweenness,
            degree_assortativity,
            global_clustering,
            personalized_pagerank,
            random_walks,
        )

        if args.algo == "walks":
            out = random_walks(edges, walk_length=args.walk_length,
                               walks_per_vertex=args.walks_per_vertex,
                               seed=args.seed)
        elif args.algo == "summary":
            out = degree_assortativity(edges).crossJoin(global_clustering(edges))
        elif args.algo == "eigen":
            from split_merge_partitioner_spark.graph import eigenvector_centrality

            # canonical-edge contract (same rule as ppr/betweenness below)
            canon = (
                edges.select(
                    F.least("src", "dst").alias("src"),
                    F.greatest("src", "dst").alias("dst"),
                )
                .where(F.col("src") != F.col("dst"))
                .dropDuplicates(["src", "dst"])
            )
            out = eigenvector_centrality(canon, n_iter=args.n_power_iter)
        else:
            if args.seeds:
                seeds = [int(x) for x in args.seeds.split(",")]
            else:
                seeds = _default_seeds(edges)
            # ppr/betweenness document a canonical-edge input contract;
            # arbitrary external parquet gets canonicalized here (the
            # linkpred ADVICE-r3 rule)
            canon = (
                edges.select(
                    F.least("src", "dst").alias("src"),
                    F.greatest("src", "dst").alias("dst"),
                )
                .where(F.col("src") != F.col("dst"))
                .dropDuplicates(["src", "dst"])
            )
            if args.algo == "ppr":
                out = personalized_pagerank(canon, seeds, n_iter=args.n_iter)
            elif args.algo == "closeness":
                from split_merge_partitioner_spark.graph import harmonic_closeness

                out = harmonic_closeness(canon, seeds, max_dist=args.max_dist)
            else:
                out = betweenness(canon, seeds)
            info = {"seeds": seeds}

    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        out.limit(10).show()
    print(json.dumps(info))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(info, f)
    if stop:  # keep the session when embedded (tests reuse one session)
        spark.stop()


if __name__ == "__main__":
    main()
