"""split_merge_partitioner_spark — a from-scratch PySpark-native link-graph
analytics engine with the capabilities of lcj2021/split-merge-partitioner
(FSM, VLDB 2024).

The reference (/root/reference, C++17) computes dual-balanced vertex-cut edge
partitionings of large graphs (split k*p fine-grained buckets, then greedily
merge to p partitions balancing edge count AND replicated-vertex count), and
the paper evaluates PageRank / connected components / label propagation on the
resulting partitions.  This package re-expresses those capabilities
Spark-first:

- ``sources``    edge-table derivation (co-occurrence self-joins), dense
                 renumbering, degree tables, synthetic power-law generators.
- ``operators``  partitioners (DBH, PowerLyra-hybrid, HDRF, FSM split+merge)
                 and the balance/replication statistics + validation suite.
- ``graph``      iterative analytics (PageRank, CC, label propagation,
                 triangle count) as partition-aligned gather-scatter over
                 CSR-encoded per-partition Arrow blocks.
- ``functions``  vectorized pandas/Arrow UDFs: sha256 content verification,
                 dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard),
                 embedding similarity search, text quality analysis,
                 multimodal binary-column plumbing.
- ``checkpoint`` per-superstep lineage + convergence metric tables for
                 resumable runs.
"""

__version__ = "0.1.0"
