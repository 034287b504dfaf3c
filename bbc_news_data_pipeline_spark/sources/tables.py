"""Parquet table sources for the driver's synthetic star schema.

Equivalent of the reference's MongoDB collection scans
(``airflow/plugins/nlp_tasks/topic_modeling.py:122``,
``sentiment_analysis.py:17`` — find() with projection): here a plain
``spark.read.parquet`` whose column pruning / predicate pushdown Catalyst
performs automatically (SURVEY.md S4–S6).

At 100 TB each of these would be a partitioned directory (or an
Iceberg/Delta table); the single-file layout is a test-scale detail —
every downstream plan only assumes "a DataFrame with this schema".
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Catalyst prunes columns / pushes filters.

    `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark 4
    refuses by default; we read it as raw nanos (legacy conf) and truncate
    to microseconds in-plan — the same truncation DuckDB applies, so the
    oracle agrees. `div` keeps the arithmetic in exact 64-bit integers.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Event-time semantics must not depend on the host/driver session TZ:
    # date_trunc / window() interpret timestamps in the session zone, so a
    # non-UTC caller session would shift every daily/hourly aggregate.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
