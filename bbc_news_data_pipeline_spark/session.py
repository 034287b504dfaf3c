"""SparkSession factory.

Centralizes the configs every entry point (tests, bench, driver harness)
needs so plans behave identically everywhere:

  * UTC session timezone — required for DuckDB-oracle comparison (DuckDB
    timestamps are UTC-naive).
  * AQE on (runtime coalesce, skew-join splitting) — at 100 TB the static
    plan is always wrong somewhere; AQE re-plans from actual map output
    sizes.
  * shuffle.partitions sized to cores for local runs; on a real cluster
    AQE's coalescing makes the initial number mostly a ceiling.
  * Arrow enabled so pandas interchange and Pandas UDFs are vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def cluster_conf(
    executors: int = 1000,
    cores_per_executor: int = 4,
    target_partition_mb: int = 256,
    arrow_batch_rows: int | None = None,
) -> dict[str, str]:
    """The recommended conf for the 100 TB / multi-executor deployment —
    the production counterpart of get_spark's local[] defaults (SCALE.md
    records the rationale; this makes it executable).

    Local tests cannot exercise a real cluster, but every plan in this
    repo is written against these assumptions: AQE re-plans from actual
    map sizes, shuffle partitions start at 2×total-cores and coalesce
    down, scan splits target ``target_partition_mb``, skew joins split
    oversized partitions, and speculation covers stragglers.
    """
    total_cores = executors * cores_per_executor
    conf = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": f"{target_partition_mb}m",
        "spark.sql.shuffle.partitions": str(2 * total_cores),
        "spark.sql.files.maxPartitionBytes": f"{target_partition_mb}m",
        "spark.sql.autoBroadcastJoinThreshold": "64m",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.speculation": "true",
        "spark.sql.parquet.compression.codec": "zstd",
    }
    # Arrow batch ROW cap — the memory bound the multimodal mapInPandas
    # contract relies on (operators/multimodal.py): the 10k default means
    # ~100 GB per batch for 10 MB media payloads; pass ~512 for jobs that
    # read payload-bearing tables. Deliberately NOT set by default: a
    # session-wide cap would also chop every text pandas-UDF batch
    # (VADER/HF/POS paths) into ~20x more Arrow round-trips for a bound
    # only media jobs need — set it per job, not per cluster.
    if arrow_batch_rows is not None:
        conf["spark.sql.execution.arrow.maxRecordsPerBatch"] = str(arrow_batch_rows)
    return conf


def get_spark(
    app_name: str = "bbc-news-data-pipeline-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the configured SparkSession.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS, else all cores.
    """
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)
    driver_memory = driver_memory or os.environ.get("SPARK_DRIVER_MEMORY", "8g")

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
