"""SparkSession factory with scale-appropriate defaults.

Local mode here is a stand-in for a multi-executor cluster; every knob is
chosen so the same code runs unchanged under spark-submit --py-files on a
real cluster (north_rule).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "elasticsearch_batch_percolator_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    AQE is on (runtime coalesce + skew-join split — the north_rule calls for
    explicit skew handling; AQE is the built-in half, salting in
    index/build.py is the custom half). Arrow is on for every pandas-UDF
    crossing.
    """
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # the distributed registry compile ships executor-pickled plan
        # blobs back through the driver-result channel; at a 10^7-query
        # registry that is a multi-GB (legitimate, bounded-by-registry)
        # result that the 1g default ABORTS — measured: the abort trips
        # the serial-compile fallback, turning a ~2-min distributed
        # compile into ~18 min of driver python. 8g covers 10^7; real
        # deployments size it with the registry.
        .config("spark.driver.maxResultSize", os.environ.get(
            "SPARK_GRAFT_MAX_RESULT", "8g"))
        # default 64MB coalesces mid-size local shuffles down to a handful
        # of partitions, serializing post-shuffle stages; 8MB keeps all
        # cores busy at bench scale (retune upward on a real cluster where
        # per-partition overhead is network-bound)
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION", "8m"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # shuffle/broadcast codec: measured crossover on the bench box (tmpfs
        # shuffle — compression is a pure CPU-vs-bus trade there). zstd wins
        # when transport is the contended resource: 800k-doc index build at
        # local[8] 39.4s→35.3s and N→4N efficiency 0.75→0.90. lz4 wins only
        # when CPU is saturated AND shuffle is RAM-backed: 1M-doc build at
        # local[32] 20.9s (lz4) vs 29.8s (zstd). Default zstd — the usual
        # cluster case shuffles across real disk/network where the byte
        # savings win; the local bench harnesses opt into lz4 explicitly
        # (EBP_IO_CODEC=lz4) because their shuffle lives in tmpfs.
        .config(
            "spark.io.compression.codec", os.environ.get("EBP_IO_CODEC", "zstd")
        )
    )
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
