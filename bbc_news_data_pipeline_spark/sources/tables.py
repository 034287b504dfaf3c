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


def _ensure_utc_session(spark: SparkSession) -> None:
    # Event-time semantics must not depend on the host/driver session TZ:
    # date_trunc / window() / NTZ->LTZ casts interpret timestamps in the
    # session zone, so a non-UTC caller session would shift every
    # daily/hourly aggregate away from the (UTC-naive) DuckDB oracle.
    # get_spark() already sets this at build time; this guard exists for
    # externally-built sessions (the driver harness) and only mutates when
    # the zone is actually wrong, so repeated load() calls are no-ops.
    from pyspark.errors import PySparkException

    try:
        current = spark.conf.get("spark.sql.session.timeZone", "")
    except PySparkException:
        # Spark 4 VALIDATES the fallback value when the key is unset in
        # the session conf — conf.get(key, "") throws INVALID_CONF_VALUE
        # (an IllegalArgumentException, a PySparkException subclass) on a
        # session that never set a zone — the exact case this guard
        # exists for. Treat "unset" as "not UTC". Deliberately NARROW:
        # an unrelated failure (e.g. stopped SparkContext raises a py4j
        # error, not a PySparkException) propagates from the read itself
        # rather than resurfacing as a confusing conf.set failure.
        current = ""
    if current != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one table. Catalyst prunes columns / pushes filters.

    `events.ts` has shipped in two physical formats: TIMESTAMP(MICROS)
    (current testdata; Spark reads TIMESTAMP_NTZ) and TIMESTAMP(NANOS)
    (older data; readable only as raw BIGINT nanos under
    ``spark.sql.legacy.parquet.nanosAsLong``). Normalize both to
    session-TZ TIMESTAMP under a UTC session so every downstream plan and
    the DuckDB oracle (UTC-naive) agree on wall-clock values. The
    conversion is conditional on the *read* dtype — never assume the
    physical format.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _ensure_utc_session(spark)
    if name == "events":
        try:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
            df.schema  # force schema resolution so a NANOS refusal surfaces here
        except Exception:
            # Legacy TIMESTAMP(NANOS) layout: retry reading nanos as BIGINT.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # nanos -> micros; `div` keeps the arithmetic in exact int64,
            # matching DuckDB's truncation of the same column.
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            # UTC session (ensured above) makes this cast value-preserving.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
