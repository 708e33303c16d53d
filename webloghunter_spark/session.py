"""SparkSession factory with engine defaults.

Defaults are tuned for correctness-parity with a UTC-naive oracle
(session timezone pinned to UTC) and for scale (AQE on, Arrow on,
shuffle partitions sized to the machine rather than the 200 default).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel


def materialize(df: DataFrame, memory: bool = True) -> DataFrame:
    """Reliable multi-consumer materialization / pushdown barrier.

    Used where a (typically small) intermediate feeds BOTH sides of a
    self-join or must not have filters substituted below it. persist()
    is lazy (no eager physical planning, unlike localCheckpoint) and —
    unlike localCheckpoint's executor-local blocks — is recomputable
    from lineage after an executor loss, so a 1000-executor run does
    not die with the first node. MEMORY_AND_DISK spills instead of
    OOMing when the intermediate outgrows executor memory; pass
    memory=False for DISK_ONLY when it is known to be large.
    """
    level = StorageLevel.MEMORY_AND_DISK if memory else StorageLevel.DISK_ONLY
    return df.persist(level)


def get_spark(
    app_name: str = "webloghunter_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 4)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("WLH_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Parquet TIMESTAMP(NANOS) (e.g. pandas-written event tables) is
        # unreadable as a timestamp; read as long and convert explicitly.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
