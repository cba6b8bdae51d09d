"""SparkSession factory with scale-appropriate defaults.

Defaults target a multi-executor cluster (AQE, skew-join handling, Arrow
batching); in the sandbox we run ``local[N]``.  Nothing here is
sandbox-specific: the same conf ships via ``spark-submit --py-files``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "split-merge-partitioner-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    master defaults to ``local[$SPARK_GRAFT_CPUS]`` in the sandbox; on a real
    cluster pass ``master=None`` and let spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # One-time session warmup (guarded so repeated get_spark calls returning
    # the same session do nothing): exercise the shuffle machinery/codegen
    # and spin up the per-SparkContext Python worker pool before the first
    # real query.  Init work belongs to session init — the first Python
    # stage of a fresh context otherwise pays worker spawn for every core
    # mid-query.  No input data is touched; nothing is cached.
    if spark.conf.get("spark.graft.session.warmed", "false") != "true":
        try:
            n = spark.sparkContext.defaultParallelism
            spark.range(4 * n, numPartitions=n).repartition(n).count()
            spark.range(n, numPartitions=n).mapInPandas(
                lambda it: it, schema="id long"
            ).count()
        except Exception:
            pass
        spark.conf.set("spark.graft.session.warmed", "true")
    return spark
