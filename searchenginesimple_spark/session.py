"""SparkSession factory with the engine's physical-execution defaults.

Local-mode testing uses ``local[N]``; on a real cluster the same config ships
via ``spark-submit --py-files`` (see cli.py).  Every setting here is a stock
Spark knob — no custom Catalyst rules or strategies are installed (SURVEY.md
§4: the whole reference optimizer surface is covered by built-ins).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "searchenginesimple-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for the index/query workload.

    AQE is on (runtime partition coalescing + skew-join splitting), Arrow is
    on (every pandas UDF exchange is vectorized), and shuffle partitions
    default to the core count instead of 200 — at 100 TB scale the build
    plan explicitly repartitions its two shuffles anyway (plans/build.py).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")

    def _bracket_threads(default: int) -> int:
        """Thread count from a local master: first bracket field only —
        ``local[4,2]`` / ``local-cluster[2,1,1024]`` carry extra fields."""
        if "[" not in master:
            return default
        head = master[master.find("[") + 1 : master.find("]")].split(",")[0].strip()
        return 32 if head == "*" else int(head) if head else default

    if shuffle_partitions is None:
        shuffle_partitions = max(8, _bracket_threads(int(cpus)))
    # Local mode: the driver JVM *is* the executor; a fixed heap starves GC
    # as task threads grow (worse at 4N than N → fake scaling loss).  Scale
    # heap with parallelism unless explicitly pinned.
    if master.startswith("local"):
        n_threads = _bracket_threads(1)
        heap_gb = min(48, max(8, 2 * n_threads))
    else:  # cluster master: executor memory is the cluster manager's knob
        heap_gb = 8

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # CPU-heavy scans (tokenize/simhash ≫ IO): 128m splits under-
        # parallelize small-to-mid corpora (a 375 MB stage = 3 tasks on 32
        # cores); 16m keeps every core fed and is harmless at TB scale.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", str(16 * 1024 * 1024)),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", f"{heap_gb}g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # v2 commit: task outputs move directly, no serial job-commit renames
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
