"""SparkSession factory tuned for this engine.

Local testing runs on local[N]; the config profile is written for a real
multi-executor cluster (AQE, skew handling, Arrow) and degrades gracefully
to local mode. Shuffle partitioning is sized by env for the bench harness.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hrdp_variant_load_pipeline_spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    At 100 TB scale the same settings apply — AQE coalesces / splits shuffle
    partitions at runtime, skew-join handles hot keys, and shuffle
    partitions start near total-cores. Only ``spark.driver.memory`` is a
    local-mode-only knob.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # testdata events.parquet carries TIMESTAMP(NANOS); Spark 4 reads
        # nanos only as long with this flag (sources/tables.py converts back)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
