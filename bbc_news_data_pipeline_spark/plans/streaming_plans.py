"""Streaming-shaped plans (SURVEY §2.10), expressed as their batch twins.

The reference approximates streaming with a 30-min cron + idempotent
writes (bbc_news_dag.py:253). Our real incremental path lives in
`streaming/ingest.py` (Structured Streaming, watermarks, availableNow);
these batch twins verify the window semantics against the DuckDB oracle —
the streaming tests then assert stream-equals-batch on the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load
from .registry import Query


# ---------------------------------------------------------------------------
# q50 — tumbling 1h event-time windows (ST4): window().start ≡ epoch-aligned
# date_trunc('hour') in UTC.
# ---------------------------------------------------------------------------
def q50_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


Q50_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""


# ---------------------------------------------------------------------------
# q51 — sliding windows, 2h length / 1h slide (ST4): each event lands in two
# windows; oracle materializes the two starts with UNION ALL.
# ---------------------------------------------------------------------------
def q51_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


Q51_SQL = """
WITH contrib AS (
    SELECT date_trunc('hour', ts) AS window_start, value FROM events
    UNION ALL
    SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS window_start, value FROM events
)
SELECT window_start, count(*) AS n, round(sum(value), 2) AS total_value
FROM contrib
GROUP BY 1
ORDER BY window_start
"""


QUERIES = [
    Query("q50_hourly_windows", q50_hourly_windows, Q50_SQL, survey="ST4,A2"),
    Query("q51_sliding_windows", q51_sliding_windows, Q51_SQL, survey="ST4"),
]
