"""SparkSession factory tuned for this engine.

Local-mode defaults follow the public Spark tuning guidance: shuffle
partitions sized to cores (not the 200 default), AQE on for runtime
re-planning (skew joins, partition coalescing), Arrow on for the
pandas-UDF hot path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spark_tsne_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    On a real cluster, ``master`` comes from the environment and
    ``spark.sql.shuffle.partitions`` should be ~2-3x total cores; AQE
    coalesces from there at runtime.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    conf: dict[str, str] = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions or cpus),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEM", "8g"),
    }
    # Host-class mitigation (see runtime.py): private anonymous pages
    # fault ~600x slower than shared/file-backed ones here, and a
    # growing JVM heap is the biggest private-anon consumer — heavy
    # queries stall for tens of seconds touching fresh heap. Placing
    # the heap on tmpfs (-XX:AllocateHeapAt) makes heap faults take
    # the fast path. Local-mode-only tuning; a real cluster would set
    # executor JVM flags in its own submit conf.
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK) and not os.environ.get(
        "SPARK_GRAFT_NO_HEAPAT"
    ):
        conf["spark.driver.extraJavaOptions"] = "-XX:AllocateHeapAt=/dev/shm"
    for k, v in (extra_conf or {}).items():
        if k == "spark.driver.extraJavaOptions" and k in conf:
            conf[k] = conf[k] + " " + v
        else:
            conf[k] = v
    builder = SparkSession.builder.appName(app_name).master(master or f"local[{cpus}]")
    for k, v in conf.items():
        builder = builder.config(k, v)
    from spark_tsne_spark.runtime import tune_malloc

    tune_malloc()
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
