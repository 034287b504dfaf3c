"""Relational operator inventory (SURVEY.md §2.2–§2.8) as verifiable plans.

Each query certifies specific SURVEY operator rows against the DuckDB
oracle. Plans are written DataFrame-first so Catalyst gets full freedom:
filters/projections push to the parquet scan, small dims broadcast, AQE
re-plans shuffles at runtime. Scale notes are on each query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.tables import load
from .dedup_plans import _hex2int_sql
from .registry import Query


# ---------------------------------------------------------------------------
# q01 — flagship: pricing summary (TPC-H Q1 shape).
# SURVEY A2/A3 (group aggregates), P6/P9 (predicates), F22 (round).
# Scale: single shuffle with map-side partial aggregation; 6 groups →
# final agg is trivially small. Filter pushes to parquet row-group stats.
# ---------------------------------------------------------------------------
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q01_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                          AS sum_qty,
       round(sum(l_extendedprice), 2)                     AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)  AS sum_disc_price,
       round(avg(l_quantity), 4)                          AS avg_qty,
       round(avg(l_extendedprice), 4)                     AS avg_price,
       round(avg(l_discount), 6)                          AS avg_disc,
       count(*)                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# q02 — top revenue orders for one segment (TPC-H Q3 shape).
# SURVEY J1 (dim join), A2, T1-T3 (top-K). customer is NOT hint-broadcast
# (round 4): it grows O(SF) — at 100 TB a forced broadcast of a fifth of
# the customer table OOMs the driver. The size-stats planner/AQE still
# picks a broadcast join whenever the filtered segment fits (it does at
# every local SF — asserted in tests/test_plans.py) and degrades to a
# shuffle join at scale. Hints are reserved for sides bounded by
# CONSTRUCTION (region/nation, scalar aggregates, probe sets).
# Total order (rounded revenue desc, o_orderkey) before LIMIT.
# ---------------------------------------------------------------------------
def q02_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


Q02_SQL = """
SELECT o_orderkey, o_orderdate,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q03 — newest-N scan (reference start-URL query: sort lastmod desc + limit,
# ArticlesSpider.py:27-33). SURVEY S5/T1/T2. Spark plans TakeOrderedAndProject
# (per-partition top-K + driver merge — no full sort at any scale).
# ---------------------------------------------------------------------------
def q03_topk_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
        .limit(100)
    )


Q03_SQL = """
SELECT o_orderkey, o_orderdate, o_totalprice
FROM orders
ORDER BY o_orderdate DESC, o_orderkey DESC
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q04 — regex + contains predicates (reference URL filters, SURVEY P7/P8/F29).
# Both predicates push into the scan; rlike runs JVM-side (codegen).
# ---------------------------------------------------------------------------
def q04_regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").rlike(r"^(small|large) ") & F.col("p_type").contains("O"))
        .select("p_partkey", "p_name", "p_type", "p_brand")
        .orderBy("p_partkey")
    )


Q04_SQL = """
SELECT p_partkey, p_name, p_type, p_brand
FROM part
WHERE regexp_matches(p_name, '^(small|large) ') AND contains(p_type, 'O')
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# q05 — left-anti existence join (reference incremental-scrape dedup,
# middlewares.py:16-20; SURVEY J2/J3/P11/S9). At scale: anti join shuffles
# on the key; with AQE the small filtered side flips to broadcast.
# ---------------------------------------------------------------------------
def q05_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


Q05_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# q06 — dim join + agg (reference topic-words map-join,
# topic_modeling.py:261-267; SURVEY J1/A2). part is O(SF·200k) rows — the
# stats planner broadcasts it at every SF where it fits, WITHOUT a hint
# (round 4: forced hints on O(SF) tables are the q93 antipattern); at
# 100 TB the join degrades gracefully to shuffle instead of OOMing.
# ---------------------------------------------------------------------------
def q06_brand_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("total_qty"),
            F.count("*").alias("n_lines"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        )
        .orderBy("p_brand")
    )


Q06_SQL = """
SELECT p_brand,
       round(sum(l_quantity), 2)    AS total_qty,
       count(*)                     AS n_lines,
       round(avg(l_extendedprice), 4) AS avg_price
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


# ---------------------------------------------------------------------------
# q07 — outer join vs generated domain (reference reindex(range(k), fill=0),
# stats_visualization.py:378-380; SURVEY J4). Zero-count keys must appear.
# ---------------------------------------------------------------------------
def q07_customers_per_nation_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    domain = spark.range(0, 25).select(F.col("id").alias("n_nationkey"))
    counts = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").cast("long").alias("n_nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    return (
        domain.join(counts, "n_nationkey", "left")
        .na.fill({"n_customers": 0})
        .orderBy("n_nationkey")
    )


Q07_SQL = """
SELECT d.n_nationkey, coalesce(c.n_customers, 0) AS n_customers
FROM (SELECT CAST(range AS BIGINT) AS n_nationkey FROM range(0, 25)) d
LEFT JOIN (
    SELECT CAST(c_nationkey AS BIGINT) AS n_nationkey, count(*) AS n_customers
    FROM customer GROUP BY 1
) c USING (n_nationkey)
ORDER BY d.n_nationkey
"""


# ---------------------------------------------------------------------------
# q08 — first-wins dedup via row_number (reference Mongo $group dedup,
# bbc_news_dag.py:27-43; SURVEY A1/W1). Keeps the latest shipment per part.
# Scale: one shuffle on the partition key; no global sort.
# ---------------------------------------------------------------------------
def q08_latest_shipment_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    w = W.partitionBy("l_partkey").orderBy(
        F.desc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_partkey", "l_orderkey", "l_linenumber", "l_shipdate")
    )  # no cosmetic sort: oracle hash is order-insensitive


Q08_SQL = """
SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate
FROM (
    SELECT l_partkey, l_orderkey, l_linenumber, l_shipdate,
           row_number() OVER (
               PARTITION BY l_partkey
               ORDER BY l_shipdate DESC, l_orderkey ASC, l_linenumber ASC
           ) AS rn
    FROM lineitem
) t
WHERE rn = 1
ORDER BY l_partkey
"""


# ---------------------------------------------------------------------------
# q09 — top-N per group (reference per-topic word rank, topic_modeling.py:35-37;
# SURVEY W3/T4).
# ---------------------------------------------------------------------------
def q09_top3_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    w = W.partitionBy("p_brand").orderBy(F.desc("p_retailprice"), F.asc("p_partkey"))
    return (
        part.withColumn("rank_in_brand", F.row_number().over(w))
        .filter(F.col("rank_in_brand") <= 3)
        .select("p_brand", "rank_in_brand", "p_partkey", "p_retailprice")
        .orderBy("p_brand", "rank_in_brand")
    )


Q09_SQL = """
SELECT p_brand, rank_in_brand, p_partkey, p_retailprice
FROM (
    SELECT p_brand, p_partkey, p_retailprice,
           row_number() OVER (
               PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey ASC
           ) AS rank_in_brand
    FROM part
) t
WHERE rank_in_brand <= 3
ORDER BY p_brand, rank_in_brand
"""


# ---------------------------------------------------------------------------
# q10 — within-group share (reference daily sentiment proportions,
# stats_visualization.py:83-84; SURVEY A4/A5/W2). Long-form percentages via
# a window-sum denominator — no pivot needed, stays fully parallel.
# ---------------------------------------------------------------------------
def q10_daily_event_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    counts = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("day")
    return (
        counts.withColumn("pct", F.round(100.0 * F.col("n") / F.sum("n").over(w), 4))
        .orderBy("day", "event_type")
    )


Q10_SQL = """
SELECT date_trunc('day', ts) AS day, event_type, count(*) AS n,
       round(100.0 * count(*) / sum(count(*)) OVER (PARTITION BY date_trunc('day', ts)), 4) AS pct
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
"""


# ---------------------------------------------------------------------------
# q11 — pivot to wide counts (reference groupby().size().unstack(fill=0),
# stats_visualization.py:83 and date×topic pivot_table :392-398; SURVEY A4/A6).
# Explicit value list → no extra distinct-values job at scale.
# ---------------------------------------------------------------------------
EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q11_daily_event_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0)
        .orderBy("day")
    )


Q11_SQL = """
SELECT date_trunc('day', ts) AS day,
       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events
GROUP BY 1
ORDER BY day
"""


# ---------------------------------------------------------------------------
# q12 — daily mean (reference daily avg sentiment, stats_visualization.py:294;
# SURVEY A3/F19).
# ---------------------------------------------------------------------------
def q12_daily_avg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.round(F.avg("value"), 4).alias("avg_value"), F.count("*").alias("n_events"))
        .orderBy("day")
    )


Q12_SQL = """
SELECT date_trunc('day', ts) AS day, round(avg(value), 4) AS avg_value, count(*) AS n_events
FROM events GROUP BY 1 ORDER BY day
"""


# ---------------------------------------------------------------------------
# q13 — fixed-bin histogram (reference 30-bin score histogram,
# stats_visualization.py:103; SURVEY A7). Bucket arithmetic is identical on
# both sides (DuckDB 1.0 lacks width_bucket).
# ---------------------------------------------------------------------------
def q13_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 10.0), F.lit(29)).cast("long")
    return (
        ev.withColumn("bucket", F.greatest(bucket, F.lit(0).cast("long")))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .orderBy("bucket")
    )


Q13_SQL = """
SELECT greatest(CAST(least(floor(value / 10.0), 29) AS BIGINT), 0) AS bucket,
       count(*) AS n
FROM events
GROUP BY 1
ORDER BY bucket
"""


# ---------------------------------------------------------------------------
# q14 — trailing 48h slice anchored at max(ts) (reference trending window,
# stats_visualization.py:221-222; SURVEY P9/F20/W4). Wall-clock is replaced by
# a data-derived anchor for determinism (SURVEY §7.4.3).
# ---------------------------------------------------------------------------
def q14_trailing_48h_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    anchor = ev.agg(F.max("ts").alias("anchor"))
    return (
        ev.crossJoin(F.broadcast(anchor))
        .filter(F.col("ts") >= F.col("anchor") - F.expr("INTERVAL 48 HOURS"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy("event_type")
    )


Q14_SQL = """
SELECT event_type, count(*) AS n, round(sum(value), 2) AS total_value
FROM events
WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 48 HOUR
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q15 — distinct aggregates per segment (SURVEY A13/E3 + countDistinct).
# ---------------------------------------------------------------------------
def q15_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        # no hint: customer is O(SF); the stats planner broadcasts it
        # while it fits and shuffle-joins past that (see q02 note)
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_custkey").alias("n_customers"),
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
        .orderBy("c_mktsegment")
    )


Q15_SQL = """
SELECT c_mktsegment,
       count(DISTINCT c_custkey)     AS n_customers,
       count(*)                      AS n_orders,
       round(sum(o_totalprice), 2)   AS total_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# q16 — value_counts (reference stats.py:16,24; SURVEY A2/T7): frequency
# table ordered by count desc with a key tiebreak.
# ---------------------------------------------------------------------------
def q16_status_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "o_orderstatus")
    )


Q16_SQL = """
SELECT o_orderstatus, count(*) AS n
FROM orders GROUP BY 1 ORDER BY n DESC, o_orderstatus
"""


# ---------------------------------------------------------------------------
# q17 — monthly rollup of orders (SURVEY F19/F21 date truncation).
# ---------------------------------------------------------------------------
def q17_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
        .orderBy("month")
    )


Q17_SQL = """
SELECT date_trunc('month', o_orderdate) AS month,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY 1 ORDER BY month
"""


# ---------------------------------------------------------------------------
# q18 — ROLLUP grouping sets (Spark-free extension beyond the reference,
# SURVEY §2.4 note): subtotal + grand-total rows.
# ---------------------------------------------------------------------------
def q18_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


Q18_SQL = """
SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# q19 — threshold labeling (reference VADER label(), sentiment_analysis.py:48-53;
# SURVEY F26/U4): pure when/otherwise, codegen'd, no UDF.
# ---------------------------------------------------------------------------
def q19_value_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    label = (
        F.when(F.col("value") >= 100.0, "high")
        .when(F.col("value") >= 50.0, "mid")
        .otherwise("low")
    )
    return (
        ev.withColumn("label", label)
        .groupBy("label")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
        .orderBy("label")
    )


Q19_SQL = """
SELECT CASE WHEN value >= 100.0 THEN 'high'
            WHEN value >= 50.0  THEN 'mid'
            ELSE 'low' END AS label,
       count(*) AS n, round(avg(value), 4) AS avg_value
FROM events
GROUP BY 1
ORDER BY label
"""


# ---------------------------------------------------------------------------
# q20 — set operations over keyed sets (SURVEY §2.7): EXCEPT ∪ INTERSECT.
# ---------------------------------------------------------------------------
def q20_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    by_status = lambda s: orders.filter(F.col("o_orderstatus") == s).select("o_custkey").distinct()
    o_only = by_status("O").exceptAll(by_status("F")).distinct()
    p_and_f = by_status("P").intersect(by_status("F"))
    return o_only.union(p_and_f).distinct()


Q20_SQL = """
(SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
 EXCEPT
 SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
UNION
(SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'P'
 INTERSECT
 SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F')
ORDER BY o_custkey
"""


# ---------------------------------------------------------------------------
# q21 — sessionization via gap counting (SURVEY §2.10 streaming-shaped; the
# batch twin of session_window). Gap threshold 30 min. Second-granularity
# diff on both sides (unix seconds ≡ date_diff('second')). Uses the
# skew-bounded two-level operator: a naive `lag over (partition by user)`
# serializes a hot user into one task; bounded_sessionize partitions by
# (user, day) and merges across midnight with identical semantics.
# ---------------------------------------------------------------------------
def q21_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import bounded_sessionize

    ev = load(spark, sf_dir, "events")
    return bounded_sessionize(ev, gap_s=1800).orderBy("user_id")


Q21_SQL = """
SELECT user_id,
       CAST(sum(is_new) + 1 AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM (
    SELECT user_id, event_id,
           CASE WHEN date_diff('second',
                               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                               ts) > 1800
                THEN 1 ELSE 0 END AS is_new
    FROM events
) t
GROUP BY user_id
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# q22 — semi-join EXISTS (SURVEY J2 family): priority counts for orders having
# at least one heavy line.
# ---------------------------------------------------------------------------
def q22_priority_with_heavy_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    heavy = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        orders.join(heavy, orders.o_orderkey == heavy.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


Q22_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_quantity > 45
)
GROUP BY 1
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q23 — CUBE over events (extension; SURVEY §2.4 note).
# ---------------------------------------------------------------------------
def q23_cube_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").withColumn("day", F.date_trunc("day", "ts"))
    return (
        ev.cube("event_type", "day")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .orderBy(
            F.col("event_type").asc_nulls_first(), F.col("day").asc_nulls_first()
        )
    )


Q23_SQL = """
SELECT event_type, date_trunc('day', ts) AS day,
       count(*) AS n, round(sum(value), 2) AS total_value
FROM events
GROUP BY CUBE (event_type, date_trunc('day', ts))
ORDER BY event_type ASC NULLS FIRST, day ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# q24 — JSON field extraction (reference JSON-encoded column F24/F25):
# props is a JSON string '{"k": 87}'.
# ---------------------------------------------------------------------------
def q24_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.withColumn("k_bucket", (k % 10))
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n"), F.round(F.avg("value"), 4).alias("avg_value"))
        .orderBy("k_bucket")
    )


Q24_SQL = """
SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
       count(*) AS n, round(avg(value), 4) AS avg_value
FROM events
GROUP BY 1
ORDER BY k_bucket
"""


# ---------------------------------------------------------------------------
# q25 — approximate distinct counting (the 100 TB form of A13/S8 counts:
# HLL sketches are mergeable, so the combine is map-side and tiny).
# HLL implementations differ across engines, so the oracle checks the
# EXACT counts plus the CONTRACT — approx within 5% of exact. The sketch
# runs at rsd=0.01 so the ±5% claim is a 5-sigma bound, not the 1-sigma
# coin-flip the original rsd=0.05 made of it (which duly failed at
# sf0.1: all five groups drifted 5.3-6.1%). rsd=0.01 is ~16 KB of HLL
# registers per group — still trivially mergeable at 100 TB.
# ---------------------------------------------------------------------------
def q25_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # Two single-purpose aggregations joined on the tiny group key instead
    # of one mixed distinct+approx agg: Spark plans the mixed form by
    # pre-grouping on (event_type, user_id) and shuffling one ~13 KB HLL
    # buffer (rsd=0.01 → 2^14 registers) PER DISTINCT PAIR — sketch bytes
    # × pair cardinality on the wire. Split, the approx agg merges its 5
    # sketches map-side (one sketch per map task reaches the exchange) and
    # the exact distinct shuffles bare (event_type, user_id) pairs. Same
    # aggregates over the same rows — identical output.
    ex = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_exact")
    )
    ap = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("_n_approx")
    )
    return (
        ex.join(ap, "event_type")
        .select(
            "event_type",
            "n_exact",
            (
                (F.abs(F.col("_n_approx") - F.col("n_exact")) / F.col("n_exact"))
                <= 0.05
            ).alias("approx_within_5pct"),
        )
        .orderBy("event_type")
    )


Q25_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_exact,
       TRUE AS approx_within_5pct
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q26 — per-region top-3 suppliers by account balance: a two-hop snowflake
# lookup (supplier→nation→region, both dims broadcast) + ranked window
# (W3). Scale: the fact side shuffles ONCE on the window key; dims are
# broadcast literals; WindowGroupLimit prunes to top-3 map-side.
# ---------------------------------------------------------------------------
def q26_top_suppliers_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region")
    w = W.partitionBy("r_name").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("r_name").alias("region"),
            "rank",
            "s_name",
            F.round("s_acctbal", 2).alias("acctbal"),
        )
        .orderBy("region", "rank")
    )


Q26_SQL = """
SELECT r_name AS region,
       row_number() OVER (PARTITION BY r_name
                          ORDER BY s_acctbal DESC, s_suppkey ASC) AS rank,
       s_name, round(s_acctbal, 2) AS acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
QUALIFY rank <= 3
ORDER BY region, rank
"""


# ---------------------------------------------------------------------------
# q86 — full star join (TPC-H Q5 shape): local-supplier revenue per
# nation of one region for one order year. The join-planning showcase:
# two big fact tables (lineitem ⋈ orders) sort-merge/shuffle-hash on
# orderkey with the year filter PUSHED to the orders scan (cuts the
# probe side ~85% before the join); customer/supplier shuffle on their
# keys; nation ⋈ region collapse to broadcast literals; the
# same-nation (s_nationkey = c_nationkey) predicate rides the supplier
# join, not a separate filter pass. AQE reorders/re-sizes at runtime —
# exactly the plan a 1000-executor cluster wants at 100 TB.
# ---------------------------------------------------------------------------
_Q86_REGION = "ASIA"
_Q86_Y0, _Q86_Y1 = "1996-01-01", "1997-01-01"


def q86_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q86_Y0))
        & (F.col("o_orderdate") < F.lit(_Q86_Y1))
    )
    cust = load(spark, sf_dir, "customer")
    sup = load(spark, sf_dir, "supplier")
    nat = load(spark, sf_dir, "nation")
    reg = load(spark, sf_dir, "region").filter(F.col("r_name") == _Q86_REGION)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            sup,
            (li.l_suppkey == sup.s_suppkey)
            & (sup.s_nationkey == cust.c_nationkey),
        )
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


Q86_SQL = f"""
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = '{_Q86_REGION}'
  AND o_orderdate >= DATE '{_Q86_Y0}' AND o_orderdate < DATE '{_Q86_Y1}'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------------
# q136 — keyed MERGE/upsert snapshot-diff classification (ext; SURVEY ST5's
# "allow updates via Delta MERGE" design decision, the UPDATE half that S9's
# insert-if-absent — reference pipelines.py:38-44, re-crawl SKIPS changed
# articles — deliberately lacks). This query certifies the RELATIONAL
# semantics of sources/sinks.py:merge_upsert: the merged snapshot is
# anti-join survivors ∪ incoming batch (exactly the operator's plan), and
# every key classifies as
#   insert       — in the batch, absent from the base snapshot
#   update       — in both, value changed (batch wins)
#   noop_update  — in both, value identical (MERGE rewrote it, content same)
#   carry        — base only, survives untouched.
# Base = orders keys ∉ 7ℤ (value o_custkey); batch = keys ∈ 3ℤ with value
# perturbed (+17) on odd keys only, so all four classes are populated at
# every SF. Output is the per-class count / value-sum / key-range — the
# audit row a production MERGE job emits per run. The disk-level operator
# (partition-scoped dynamic-overwrite rewrite, crash-safe swap, duplicate-
# key refusal) is exercised in tests/test_sinks.py.
#
# Shape at scale: one broadcast-able anti join + one left join on the key
# (both shuffle-on-key if the batch outgrows broadcast; AQE decides), one
# 4-group aggregate. All-integer values — no float hazard.
# ---------------------------------------------------------------------------
def q136_merge_upsert_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    k = F.col("o_orderkey").cast("long")
    base = orders.filter(k % 7 != 0).select(
        k.alias("k"), F.col("o_custkey").cast("long").alias("v")
    )
    delta = orders.filter(k % 3 == 0).select(
        k.alias("k"),
        F.when(k % 2 == 0, F.col("o_custkey").cast("long"))
        .otherwise(F.col("o_custkey").cast("long") + 17)
        .alias("v"),
    )
    survivors = base.join(delta.select("k"), "k", "left_anti")
    merged = survivors.withColumn("src", F.lit("base")).unionByName(
        delta.withColumn("src", F.lit("delta"))
    )
    bvals = base.select("k", F.col("v").alias("v_base"))
    status = (
        F.when(F.col("src") == "base", F.lit("carry"))
        .when(F.col("v_base").isNull(), F.lit("insert"))
        .when(F.col("v") == F.col("v_base"), F.lit("noop_update"))
        .otherwise(F.lit("update"))
    )
    return (
        merged.join(bvals, "k", "left")
        .select("k", "v", status.alias("status"))
        .groupBy("status")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum("v").cast("long").alias("sum_val"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
        )
        .orderBy("status")
    )


Q136_SQL = """
WITH base AS (
    SELECT CAST(o_orderkey AS BIGINT) AS k, CAST(o_custkey AS BIGINT) AS v
    FROM orders WHERE o_orderkey % 7 <> 0
),
delta AS (
    SELECT CAST(o_orderkey AS BIGINT) AS k,
           CASE WHEN o_orderkey % 2 = 0 THEN CAST(o_custkey AS BIGINT)
                ELSE CAST(o_custkey AS BIGINT) + 17 END AS v
    FROM orders WHERE o_orderkey % 3 = 0
),
merged AS (
    SELECT b.k, b.v, 'base' AS src FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.k = b.k)
    UNION ALL
    SELECT k, v, 'delta' AS src FROM delta
),
cls AS (
    SELECT m.k, m.v,
           CASE WHEN m.src = 'base' THEN 'carry'
                WHEN b.v IS NULL THEN 'insert'
                WHEN m.v = b.v THEN 'noop_update'
                ELSE 'update' END AS status
    FROM merged m LEFT JOIN base b ON b.k = m.k
)
SELECT status,
       count(*) AS n_keys,
       CAST(sum(v) AS BIGINT) AS sum_val,
       min(k) AS min_key,
       max(k) AS max_key
FROM cls GROUP BY status ORDER BY status
"""


# ---------------------------------------------------------------------------
# q160 — incremental view maintenance for a JOIN view (the bilinear
# delta rule: (B_o∪Δo)⋈(B_c∪Δc) = B⋈B ∪ B⋈Δc ∪ Δo⋈B ∪ Δo⋈Δc): the
# per-nation revenue view is maintained from FOUR quadrant partials —
# both relations split into base/delta by a deterministic md5 parity —
# and the partials merge by algebraic aggregation (counts add, sums
# add), the join twin of the q119/q131 mergeable manifests. The ORACLE
# recomputes the view directly from the full tables, so the green row
# proves maintenance ≡ recompute. In production the B⋈B term IS the
# stored view — an ingest batch costs only the three delta quadrants,
# each bounded by |Δ|, never a full re-join; all four quadrants reuse
# one co-partitioning on the customer key.
# ---------------------------------------------------------------------------
def q160_delta_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.curation import sample_key_expr

    orders = load(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o_par = F.pmod(sample_key_expr("o_orderkey", salt="ivm"), F.lit(2))
    c_par = F.pmod(sample_key_expr("c_custkey", salt="ivm"), F.lit(2))
    ob, od = orders.filter(o_par == 0), orders.filter(o_par == 1)
    cb, cd = cust.filter(c_par == 0), cust.filter(c_par == 1)

    def quadrant(o: DataFrame, c: DataFrame) -> DataFrame:
        return (
            o.join(c, o.o_custkey == c.c_custkey)
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("n"), F.sum("o_totalprice").alias("rev"))
        )

    partials = (
        quadrant(ob, cb)
        .unionByName(quadrant(ob, cd))
        .unionByName(quadrant(od, cb))
        .unionByName(quadrant(od, cd))
    )
    merged = partials.groupBy("c_nationkey").agg(
        F.sum("n").cast("long").alias("n_orders"),
        F.round(F.sum("rev"), 2).alias("revenue"),
    )
    return (
        merged.join(
            F.broadcast(nation), merged.c_nationkey == nation.n_nationkey
        )
        .select(F.col("n_name").alias("nation"), "n_orders", "revenue")
        .orderBy("nation")
    )


Q160_SQL = """
SELECT n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o.o_totalprice), 2) AS revenue
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
GROUP BY n.n_name
ORDER BY nation
"""


# ---------------------------------------------------------------------------
# q161 — Pareto frontier / 2D skyline (Börzsönyi, Kossmann & Stocker,
# ICDE'01): suppliers not dominated on (volume MAX, unit cost MIN).
# Naive skyline is O(n²) NOT EXISTS; the scalable shape here is the
# sort-scan theorem made distributed: over DISTINCT points ordered by
# (x, y), a point is dominated iff the running min of y over its strict
# predecessors is <= its y. That prefix scan decomposes into (a) a
# 64-bucket range grid on x (bounds from one broadcast agg, q148
# pattern), (b) per-bucket running mins (windows PARTITIONED by bucket),
# and (c) a cross-bucket prefix-min over the <=64-row bucket-min table
# (bounded by construction) — no global sort, no corpus-scale window.
# Both measures are exact integers (quantities are integral; unit cost
# is integer-cents DIV volume), duplicates collapse to DISTINCT points
# first (equal points never dominate each other), and the ORACLE runs
# the un-decomposed brute-force NOT EXISTS — a green row proves the
# decomposition finds exactly the frontier (q153/q155 proof pattern).
# ---------------------------------------------------------------------------
_Q161_BUCKETS = 64


def q161_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_quantity", "l_extendedprice"
    )
    pts = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum("l_quantity").cast("long").alias("vol"),
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long"))
            .alias("rev_c"),
        )
        .withColumn("unit_c", F.expr("rev_c div vol"))
        # ox: minimize-orientation of the maximized axis
        .withColumn("ox", -F.col("vol"))
        .localCheckpoint(eager=False)  # feeds distinct pts + the final semi-join
    )
    dpts = pts.select("ox", F.col("unit_c").alias("y")).distinct()
    bounds = dpts.agg(F.min("ox").alias("mn"), F.max("ox").alias("mx"))
    bucketed = dpts.crossJoin(F.broadcast(bounds)).withColumn(
        "b",
        F.expr(f"((ox - mn) * {_Q161_BUCKETS - 1}) div greatest(mx - mn, 1)"),
    )
    bmins = bucketed.groupBy("b").agg(F.min("y").alias("bmin"))
    wpre = W.orderBy("b").rowsBetween(W.unboundedPreceding, -1)  # <=64 rows
    pmin = bmins.withColumn("pmin", F.min("bmin").over(wpre)).select("b", "pmin")
    win = W.partitionBy("b").orderBy("ox", "y").rowsBetween(
        W.unboundedPreceding, -1
    )
    sky = (
        bucketed.join(F.broadcast(pmin), "b")
        .withColumn("rmin", F.min("y").over(win))
        .filter(
            (F.col("pmin").isNull() | (F.col("pmin") > F.col("y")))
            & (F.col("rmin").isNull() | (F.col("rmin") > F.col("y")))
        )
        .select("ox", "y")
    )
    return (
        pts.join(
            F.broadcast(sky),
            (pts.ox == sky.ox) & (pts.unit_c == sky.y),
            "left_semi",
        )
        .select(
            F.col("l_suppkey").alias("suppkey"),
            "vol",
            "unit_c",
        )
        .orderBy(F.desc("vol"), "unit_c", "suppkey")
    )


Q161_SQL = """
WITH pts AS (
    SELECT l_suppkey AS suppkey,
           CAST(sum(l_quantity) AS BIGINT) AS vol,
           SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS rev_c
    FROM lineitem GROUP BY 1
),
up AS (SELECT suppkey, vol, rev_c // vol AS unit_c FROM pts)
SELECT suppkey, vol, CAST(unit_c AS BIGINT) AS unit_c
FROM up p
WHERE NOT EXISTS (
    SELECT 1 FROM up q
    WHERE q.vol >= p.vol AND q.unit_c <= p.unit_c
      AND (q.vol > p.vol OR q.unit_c < p.unit_c)
)
ORDER BY vol DESC, unit_c, suppkey
"""


# ---------------------------------------------------------------------------
# q157 — association rules / market-basket mining (Agrawal & Srikant,
# VLDB'94 measures: support, confidence, lift): which part BRANDS
# co-occur in an order more often than independence predicts. The 100 TB
# shape: broadcast dim join lifts items to a bounded category domain
# (|brands| = 25, so the rule space is ≤ 25·24 ordered pairs — bounded
# by construction, the same role as the a-priori support prune), and
# every measure derives from three integer counts (supp_ab, supp_a, N)
# joined broadcast — no row ever carries a float until the final rounded
# division. Top-20 by lift with full (a,b) tiebreak.
#
# r10 shape (same rework as q219): ONE basket-grouping exchange
# (collect_set folds the DISTINCT), then the ordered-pair stream is a
# row-local nested transform over each order's distinct item array —
# no l_orderkey self-join shuffle; the pair groupBy ships map-side-
# combined (pair, partial-count) rows bounded by the 25·24 rule space.
# ---------------------------------------------------------------------------
_Q157_TOPN = 20

# all ordered (x, y), x != y, over the per-order distinct item array
_Q157_PAIRS = """
flatten(transform(items, x ->
    transform(filter(items, y -> y != x),
              y -> struct(x AS antecedent, y AS consequent))))
"""


def q157_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("items"))
        # feeds totals, per-item supports and the pair stream — pin so
        # the basket build runs once (q144 pattern)
        .localCheckpoint(eager=False)
    )
    totals = baskets.agg(F.count("*").alias("n_orders"))
    item = (
        baskets.select(F.explode("items").alias("p_brand"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("supp_i"))
    )
    pair = (
        baskets.select(F.explode(F.expr(_Q157_PAIRS)).alias("pr"))
        .select("pr.antecedent", "pr.consequent")
        .groupBy("antecedent", "consequent")
        .agg(F.count("*").alias("supp_ab"))
    )
    rules = (
        pair.join(
            F.broadcast(
                item.select(
                    F.col("p_brand").alias("antecedent"),
                    F.col("supp_i").alias("supp_a"),
                )
            ),
            "antecedent",
        )
        .join(
            F.broadcast(
                item.select(
                    F.col("p_brand").alias("consequent"),
                    F.col("supp_i").alias("supp_b"),
                )
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "antecedent",
            "consequent",
            F.col("supp_ab").cast("long").alias("supp_ab"),
            F.round(F.col("supp_ab") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("supp_ab") / F.col("supp_a"), 6).alias("confidence"),
            F.round(
                (F.col("supp_ab") * F.col("n_orders"))
                / (F.col("supp_a") * F.col("supp_b")),
                6,
            ).alias("lift"),
        )
    )
    return rules.orderBy(
        F.desc("lift"), F.desc("confidence"), "antecedent", "consequent"
    ).limit(_Q157_TOPN)


Q157_SQL = f"""
WITH baskets AS (
    SELECT DISTINCT l.l_orderkey, p.p_brand
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
totals AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM baskets),
item AS (SELECT p_brand, count(*) AS supp_i FROM baskets GROUP BY p_brand),
pair AS (
    SELECT a.p_brand AS antecedent, b.p_brand AS consequent,
           count(*) AS supp_ab
    FROM baskets a JOIN baskets b
      ON a.l_orderkey = b.l_orderkey AND a.p_brand <> b.p_brand
    GROUP BY 1, 2
)
SELECT p.antecedent, p.consequent,
       CAST(p.supp_ab AS BIGINT) AS supp_ab,
       round(p.supp_ab / CAST(t.n_orders AS DOUBLE), 6) AS support,
       round(p.supp_ab / CAST(ia.supp_i AS DOUBLE), 6) AS confidence,
       round((p.supp_ab * t.n_orders)
             / CAST(ia.supp_i * ib.supp_i AS DOUBLE), 6) AS lift
FROM pair p
JOIN item ia ON ia.p_brand = p.antecedent
JOIN item ib ON ib.p_brand = p.consequent
CROSS JOIN totals t
ORDER BY lift DESC, confidence DESC, p.antecedent, p.consequent
LIMIT {_Q157_TOPN}
"""


# ---------------------------------------------------------------------------
# q184 — cardinality-CAPPED group-by: top-K per group + OTHER rollup
# (ext): the reporting contract every BI/dashboard layer imposes on a
# 100 TB fact table — per group emit at most K member rows plus ONE
# "OTHER" row folding the tail (count + how many members folded), so
# result size is bounded by groups × (K+1) REGARDLESS of member
# cardinality. An uncapped per-group breakdown is an unbounded result
# set; a global top-K silently drops whole groups — this is the shape
# that does neither. Rank is a per-group window with a deterministic
# (count DESC, member ASC) tiebreak; shares are computed against the
# group total so the OTHER row closes the distribution to 1.
# Scale: one groupBy for counts, one bounded window over the (group,
# member) AGGREGATE (cardinality = distinct members per group, never
# rows), one groupBy for the fold. No global sort.
# ---------------------------------------------------------------------------
_Q184_K = 2


def q184_topk_other_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    counts = (
        docs.groupBy("source", "lang")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)  # feeds rank, fold, and totals
    )
    wr = W.partitionBy("source").orderBy(F.desc("n"), F.asc("lang"))
    ranked = counts.withColumn("rk", F.row_number().over(wr))
    top = ranked.filter(F.col("rk") <= _Q184_K).select(
        "source",
        F.col("lang").alias("member"),
        "n",
        F.lit(0).cast("long").alias("n_folded"),
    )
    other = (
        ranked.filter(F.col("rk") > _Q184_K)
        .groupBy("source")
        .agg(
            F.sum("n").alias("n"),
            F.count("*").cast("long").alias("n_folded"),
        )
        .select("source", F.lit("OTHER").alias("member"), "n", "n_folded")
    )
    totals = counts.groupBy("source").agg(F.sum("n").alias("tot"))
    return (
        top.unionByName(other)
        .join(totals, "source")
        .select(
            "source",
            "member",
            F.col("n").cast("long").alias("n_docs"),
            "n_folded",
            F.round(F.col("n") / F.col("tot"), 4).alias("share"),
        )
        .orderBy("source", F.desc("n_docs"), "member")
    )


Q184_SQL = f"""
WITH counts AS (
    SELECT source, lang, count(*) AS n FROM documents GROUP BY 1, 2
),
ranked AS (
    SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY n DESC, lang
    ) AS rk
    FROM counts
),
capped AS (
    SELECT source, lang AS member, n, CAST(0 AS BIGINT) AS n_folded
    FROM ranked WHERE rk <= {_Q184_K}
    UNION ALL
    SELECT source, 'OTHER', sum(n), CAST(count(*) AS BIGINT)
    FROM ranked WHERE rk > {_Q184_K} GROUP BY source
),
totals AS (SELECT source, sum(n) AS tot FROM counts GROUP BY source)
SELECT c.source, c.member,
       CAST(c.n AS BIGINT) AS n_docs,
       c.n_folded,
       round(c.n / CAST(t.tot AS DOUBLE), 4) AS share
FROM capped c JOIN totals t USING (source)
ORDER BY c.source, n_docs DESC, c.member
"""


# ---------------------------------------------------------------------------
# q179 — BLOOM semi-join reduction (runtime-filter join pruning, ext):
# the single most important 100 TB join optimization — when the dim side
# of a fact⋈dim join is selectively filtered, build a constant-size
# Bloom filter over the surviving dim keys and prune the FACT stream
# BEFORE its shuffle (Spark's own runtime row-level filtering does this
# under AQE; here the filter is built relationally so the oracle can
# rebuild it bit-for-bit — operators/dedup.py:bloom_build/bloom_probe,
# the q105 machinery pointed at join pruning instead of dedup).
# Certification is in-query and two-sided:
#   * per-priority revenue computed THROUGH the pruned fact must equal
#     the direct unpruned join (no-false-negatives ⇒ lossless pruning);
#   * global stats quantify the filter: distinct fact keys, keys passing
#     the bloom, true matches, false-positive rate among true negatives,
#     and the fraction of fact keys pruned before the join shuffle.
# Scale: the filter is ≤WORDS rows at ANY dim cardinality (broadcast by
# construction); probing is a broadcast join on the word index — the
# fact stream is never shuffled until after pruning. FP rate only costs
# wasted shuffle rows, never correctness.
# ---------------------------------------------------------------------------
_Q179_PRICE = 450000.0
_Q179_WORDS = 2048
_Q179_K = 4


def q179_bloom_join_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import bloom_build, bloom_probe

    def keyed(df, col):
        return df.withColumn(
            "kh", F.md5(F.concat(F.lit("bjp:"), F.col(col).cast("string")))
        )

    dim = keyed(
        load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > _Q179_PRICE),
        "o_orderkey",
    ).localCheckpoint(eager=False)  # feeds bloom build AND both joins
    fact = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    ).localCheckpoint(eager=False)
    bloom = bloom_build(dim.select("kh"), "kh", words=_Q179_WORDS, k=_Q179_K)
    fkeys = keyed(
        fact.select("l_orderkey").distinct(), "l_orderkey"
    ).localCheckpoint(eager=False)
    probed = bloom_probe(
        fkeys, bloom, "l_orderkey", "kh", words=_Q179_WORDS, k=_Q179_K
    ).localCheckpoint(eager=False)  # feeds stats AND the pruned join
    pass_keys = probed.filter(F.col("bloom_hit") == 1).select("l_orderkey")
    pruned_rev = (
        fact.join(pass_keys, "l_orderkey")
        .join(dim, fact["l_orderkey"] == dim["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue_pruned"))
    )
    direct_rev = (
        fact.join(dim, fact["l_orderkey"] == dim["o_orderkey"])
        .groupBy("o_orderpriority")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("revenue_direct"))
    )
    truth = fkeys.join(
        dim.select(F.col("o_orderkey").alias("l_orderkey")), "l_orderkey", "left_semi"
    )
    stats = (
        probed.agg(
            F.count("*").cast("long").alias("n_fact_keys"),
            F.sum("bloom_hit").cast("long").alias("n_pass"),
        )
        .crossJoin(
            F.broadcast(truth.agg(F.count("*").cast("long").alias("n_true")))
        )
        .select(
            "n_fact_keys",
            "n_pass",
            "n_true",
            F.round(
                (F.col("n_pass") - F.col("n_true"))
                / (F.col("n_fact_keys") - F.col("n_true")),
                4,
            ).alias("fp_rate"),
            F.round(1 - F.col("n_pass") / F.col("n_fact_keys"), 4).alias(
                "pruned_frac"
            ),
        )
    )
    return (
        pruned_rev.join(direct_rev, "o_orderpriority")
        .withColumn(
            "lossless", F.col("revenue_pruned") == F.col("revenue_direct")
        )
        .crossJoin(F.broadcast(stats))
        .orderBy("o_orderpriority")
    )


_Q179_KH = "md5('bjp:' || CAST({col} AS VARCHAR))"
_Q179_POS = ", ".join(
    f"({_hex2int_sql('kh', 1, 8)} + {j} * {_hex2int_sql('kh', 9, 8)}) "
    f"% {_Q179_WORDS * 32}"
    for j in range(_Q179_K)
)

Q179_SQL = f"""
WITH dim AS (
    SELECT o_orderkey, o_orderpriority,
           {_Q179_KH.format(col='o_orderkey')} AS kh
    FROM orders WHERE o_totalprice > {_Q179_PRICE!r}
),
fact AS (SELECT l_orderkey, l_extendedprice FROM lineitem),
bloom AS (
    SELECT p // 32 AS word, bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS mask
    FROM (SELECT unnest([{_Q179_POS}]) AS p FROM dim)
    GROUP BY 1
),
fkeys AS (
    SELECT l_orderkey, {_Q179_KH.format(col='l_orderkey')} AS kh
    FROM (SELECT DISTINCT l_orderkey FROM fact) t
),
probes AS (SELECT l_orderkey, unnest([{_Q179_POS}]) AS p FROM fkeys),
probed AS (
    SELECT pr.l_orderkey,
           CAST(count(*) FILTER (
               WHERE (b.mask >> CAST(pr.p % 32 AS INT)) % 2 = 1
           ) = {_Q179_K} AS INTEGER) AS bloom_hit
    FROM probes pr LEFT JOIN bloom b ON b.word = pr.p // 32
    GROUP BY pr.l_orderkey
),
pruned_rev AS (
    SELECT d.o_orderpriority,
           round(sum(f.l_extendedprice), 2) AS revenue_pruned
    FROM fact f
    JOIN probed p ON p.l_orderkey = f.l_orderkey AND p.bloom_hit = 1
    JOIN dim d ON d.o_orderkey = f.l_orderkey
    GROUP BY 1
),
direct_rev AS (
    SELECT d.o_orderpriority,
           round(sum(f.l_extendedprice), 2) AS revenue_direct
    FROM fact f JOIN dim d ON d.o_orderkey = f.l_orderkey
    GROUP BY 1
),
stats AS (
    SELECT CAST(count(*) AS BIGINT) AS n_fact_keys,
           CAST(sum(bloom_hit) AS BIGINT) AS n_pass,
           CAST(count(*) FILTER (
               WHERE l_orderkey IN (SELECT o_orderkey FROM dim)
           ) AS BIGINT) AS n_true
    FROM probed
)
SELECT p.o_orderpriority,
       p.revenue_pruned,
       d.revenue_direct,
       p.revenue_pruned = d.revenue_direct AS lossless,
       s.n_fact_keys, s.n_pass, s.n_true,
       round((s.n_pass - s.n_true)
             / CAST(s.n_fact_keys - s.n_true AS DOUBLE), 4) AS fp_rate,
       round(1 - s.n_pass / CAST(s.n_fact_keys AS DOUBLE), 4) AS pruned_frac
FROM pruned_rev p
JOIN direct_rev d USING (o_orderpriority)
CROSS JOIN stats s
ORDER BY p.o_orderpriority
"""


# ---------------------------------------------------------------------------
# q221 — three-dimension GROUPING SETS with grouping_id (ext): q18/q23
# cover rollup/cube at two dims; the BI layer's actual contract is an
# arbitrary grouping-sets lattice with a grouping_id that downstream
# code switches on. Four sets in one pass — (seg, prio, status),
# (seg, prio), (seg), () — exact cent sums, NULL-filled grouping keys
# disambiguated by the id (the reason grouping_id exists: a real NULL
# key vs a rolled-up one are different rows).
# Scale: ONE scan, one Expand×4 shuffle with map-side partial agg —
# the same plan shape Spark gives CUBE, pruned to the sets asked for.
# ---------------------------------------------------------------------------
def q221_grouping_sets3(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    j = orders.join(
        cust.select("c_custkey", "c_mktsegment"),
        orders.o_custkey == F.col("c_custkey"),
    ).select(
        F.col("c_mktsegment").alias("seg"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderstatus").alias("status"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("cents"),
    )
    j.createOrReplaceTempView("q221_base")
    return spark.sql(
        """
        SELECT seg, prio, status,
               CAST(grouping_id(seg, prio, status) AS INTEGER) AS gid,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(cents) AS DOUBLE) / 100.0 AS revenue
        FROM q221_base
        GROUP BY GROUPING SETS ((seg, prio, status), (seg, prio), (seg), ())
        ORDER BY gid, seg, prio, status
        """
    )


Q221_SQL = """
SELECT seg, prio, status,
       CAST(grouping(seg) * 4 + grouping(prio) * 2 + grouping(status)
            AS INTEGER) AS gid,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS DOUBLE) / 100.0 AS revenue
FROM (
    SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio,
           o.o_orderstatus AS status,
           CAST(floor(o.o_totalprice * 100 + 0.5) AS HUGEINT) AS cents
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
)
GROUP BY GROUPING SETS ((seg, prio, status), (seg, prio), (seg), ())
ORDER BY gid, seg, prio, status
"""


# ---------------------------------------------------------------------------
# q220 — hierarchical share-of-parent rollup (ext): the classic OLAP
# drill path — revenue per nation with its share of the region, the
# region subtotal with its share of the grand total, all in one result
# (the percent-of-parent column every BI layer recomputes). Revenue
# sums are exact cents in DECIMAL(38,0)/HUGEINT; every share is one
# floor-rounded division of exact integers; money renders as one IEEE
# division of the exact cent sum — no float touches an accumulator.
# Scale: orders⋈customer is the only corpus join (hint-free; AQE sizes
# the dim side); nation/region are fixed 25/5-row tables (broadcast by
# the _DIM_TABLES rule); the share joins run on the 25-row rollup.
# ---------------------------------------------------------------------------
def q220_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
        "decimal(38,0)"
    )
    nat = (
        orders.join(
            cust.select("c_custkey", "c_nationkey"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy("r_name", "n_name")
        .agg(F.sum(cents).alias("nc"), F.count("*").alias("n_orders"))
        .localCheckpoint(eager=False)  # feeds region + total rollups
    )
    reg = nat.groupBy("r_name").agg(F.sum("nc").cast("decimal(38,0)").alias("rc"))
    tot = nat.agg(F.sum("nc").cast("decimal(38,0)").alias("tc"))
    # cents are exact integers; dollars = cents/100.0 is one IEEE division
    money = lambda c: F.col(c).cast("double") / F.lit(100.0)
    share = lambda num, den: (
        F.floor(
            F.col(num).cast("double") / F.col(den).cast("double") * 1000000
            + F.lit(0.5)
        )
        / F.lit(1000000.0)
    )
    return (
        nat.join(reg, "r_name")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("r_name").alias("region"),
            F.col("n_name").alias("nation"),
            F.col("n_orders").cast("long").alias("n_orders"),
            money("nc").alias("nation_revenue"),
            share("nc", "rc").alias("share_of_region"),
            money("rc").alias("region_revenue"),
            share("rc", "tc").alias("share_of_total"),
        )
        .orderBy("region", "nation")
    )


Q220_SQL = """
WITH nat AS (
    SELECT r.r_name AS region, n.n_name AS nation,
           count(*) AS n_orders,
           sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS HUGEINT)) AS nc
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    GROUP BY 1, 2
),
reg AS (SELECT region, sum(nc) AS rc FROM nat GROUP BY 1),
tot AS (SELECT sum(nc) AS tc FROM nat)
SELECT n.region, n.nation,
       CAST(n.n_orders AS BIGINT) AS n_orders,
       CAST(n.nc AS DOUBLE) / 100.0 AS nation_revenue,
       floor(CAST(n.nc AS DOUBLE) / CAST(r.rc AS DOUBLE) * 1000000 + 0.5)
           / 1000000.0 AS share_of_region,
       CAST(r.rc AS DOUBLE) / 100.0 AS region_revenue,
       floor(CAST(r.rc AS DOUBLE) / CAST(t.tc AS DOUBLE) * 1000000 + 0.5)
           / 1000000.0 AS share_of_total
FROM nat n JOIN reg r USING (region) CROSS JOIN tot t
ORDER BY region, nation
"""


# ---------------------------------------------------------------------------
# q219 — Apriori level-3 frequent itemsets (ext): q157 stops at pairs;
# the level-wise Apriori step is the scale story — size-3 CANDIDATES
# are generated only from frequent pairs sharing a prefix item
# (P2(a,b) ⋈ P2(a,c), b < c) and pruned by the third sub-pair BEFORE
# any counting, so the count pass streams per-order triples against a
# broadcast candidate set (filter-early semi-join). Triple expansion
# per order is bounded by the basket size (≤ C(7,3) = 35 for TPC-H-ish
# ≤7-line orders), never by the item domain. On THIS uniform synthetic
# basket mix every pair clears any triple-keeping minsup (so P2 passes
# all pairs — the prune is structural here; on skewed real baskets it
# bites); minsup is a 0.4% rate so all SFs emit. Supports, 3-way lift
# (supp·n² / (sa·sb·sc)) and the minsup line ship per surviving triple.
# All-integer until the two display ratios.
#
# r10 shape: baskets are grouped ONCE into a sorted per-order item array
# (collect_set folds the DISTINCT into the same exchange), and the pair
# and triple streams are row-local array combinatorics (nested
# transform/slice — i<j<k by construction over the sorted array) instead
# of shuffled l_orderkey self-joins. The per-order frequent-item filter
# is a broadcast 1-row array_intersect (F1 is bounded by the brand
# domain — the Apriori premise). The corpus shuffles ONCE (the basket
# grouping); the pair/triple groupBys ship only map-side-combined
# (candidate, partial-count) rows, bounded by the F1 combination space,
# never by corpus row count.
# ---------------------------------------------------------------------------
_Q219_MINSUP_NUM, _Q219_MINSUP_DEN = 4, 1000  # minsup = ⌈n·0.4%⌉
_Q219_TOPN = 20

# all (i, j) / (i, j, k) combinations, i<j(<k), of the sorted distinct
# per-order frequent-item array — row-local, bounded by basket size
_Q219_PAIRS = """
flatten(transform(fitems, (x, i) ->
    transform(slice(fitems, i + 2, size(fitems)),
              y -> struct(x AS b1, y AS b2))))
"""
_Q219_TRIPLES = """
flatten(transform(fitems, (x, i) ->
    flatten(transform(slice(fitems, i + 2, size(fitems)), (y, j) ->
        transform(slice(fitems, i + j + 3, size(fitems)),
                  z -> struct(x AS b1, y AS b2, z AS b3))))))
"""


def q219_apriori_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("p_brand")).alias("items"))
        .localCheckpoint(eager=False)  # ONE basket pass: totals, F1, P2, triples
    )
    tot = baskets.agg(
        F.count("*").alias("n_orders"),
        F.expr(
            f"(count(*) * {_Q219_MINSUP_NUM}"
            f" + {_Q219_MINSUP_DEN - 1}) div {_Q219_MINSUP_DEN}"
        ).alias("minsup"),
    )
    item = (
        baskets.select(F.explode("items").alias("p_brand"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("supp_i"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("supp_i") >= F.col("minsup"))
        .select("p_brand", "supp_i")
        .localCheckpoint(eager=False)  # F1: ≤ |brands| rows
    )
    # hint-free joins below: item/p2/c3 are brand-domain-bounded but sit
    # behind lazy checkpoints (opaque to the static walker) — AQE picks
    # broadcast from their observed few-hundred-byte sizes at runtime.
    # The F1 filter itself is a broadcast 1-row sorted array: intersect
    # keeps fitems sorted/distinct, so i<j<k combinations ARE b1<b2<b3.
    fset = item.agg(F.sort_array(F.collect_set("p_brand")).alias("fi"))
    fb = (
        baskets.crossJoin(F.broadcast(fset))
        .select(F.array_intersect("items", "fi").alias("fitems"))
        .filter(F.size("fitems") >= 2)
    )
    p2 = (
        fb.select(F.explode(F.expr(_Q219_PAIRS)).alias("pr"))
        .select("pr.b1", "pr.b2")
        .groupBy("b1", "b2")
        .agg(F.count("*").alias("supp_p"))
        .crossJoin(F.broadcast(tot.select("minsup")))
        .filter(F.col("supp_p") >= F.col("minsup"))
        .select("b1", "b2")
        .localCheckpoint(eager=False)  # P2: ≤ C(|F1|, 2) rows
    )
    c3 = (
        p2.alias("u")
        .join(
            p2.select(F.col("b1").alias("b1"), F.col("b2").alias("b3")).alias("v"),
            "b1",
        )
        .filter(F.col("b2") < F.col("b3"))
        # full Apriori prune: the third sub-pair (b2, b3) must be frequent
        .join(
            p2.select(F.col("b1").alias("b2"), F.col("b2").alias("b3")),
            ["b2", "b3"],
            "left_semi",
        )
        .select("b1", "b2", "b3")
    )
    triples = (
        fb.select(F.explode(F.expr(_Q219_TRIPLES)).alias("tr"))
        .select("tr.b1", "tr.b2", "tr.b3")
        .join(c3, ["b1", "b2", "b3"], "left_semi")
        .groupBy("b1", "b2", "b3")
        .agg(F.count("*").alias("supp_abc"))
    )
    si = lambda n: item.select(
        F.col("p_brand").alias(n), F.col("supp_i").alias(f"s_{n}")
    )
    out = (
        triples.join(si("b1"), "b1")
        .join(si("b2"), "b2")
        .join(si("b3"), "b3")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("supp_abc") >= F.col("minsup"))
        .select(
            "b1", "b2", "b3",
            F.col("supp_abc").cast("long").alias("supp_abc"),
            F.col("minsup").cast("long").alias("minsup"),
            (
                F.floor(
                    F.col("supp_abc").cast("double") / F.col("n_orders")
                    * 1000000
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("support"),
            (
                F.floor(
                    F.col("supp_abc").cast("double")
                    * F.col("n_orders").cast("double")
                    * F.col("n_orders").cast("double")
                    / (
                        F.col("s_b1").cast("double")
                        * F.col("s_b2").cast("double")
                        * F.col("s_b3").cast("double")
                    )
                    * 1000000
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("lift3"),
        )
    )
    return out.orderBy(
        F.desc("lift3"), F.desc("supp_abc"), "b1", "b2", "b3"
    ).limit(_Q219_TOPN)


Q219_SQL = f"""
WITH baskets AS (
    SELECT DISTINCT l.l_orderkey, p.p_brand
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
tot AS (
    SELECT count(DISTINCT l_orderkey) AS n_orders,
           (count(DISTINCT l_orderkey) * {_Q219_MINSUP_NUM}
            + {_Q219_MINSUP_DEN - 1}) // {_Q219_MINSUP_DEN} AS minsup
    FROM baskets
),
item AS (
    SELECT b.p_brand, count(*) AS supp_i
    FROM baskets b GROUP BY 1
    HAVING count(*) >= (SELECT minsup FROM tot)
),
fb AS (
    SELECT b.* FROM baskets b JOIN item i ON i.p_brand = b.p_brand
),
p2 AS (
    SELECT a.p_brand AS b1, b.p_brand AS b2
    FROM fb a JOIN fb b ON b.l_orderkey = a.l_orderkey
                        AND a.p_brand < b.p_brand
    GROUP BY 1, 2
    HAVING count(*) >= (SELECT minsup FROM tot)
),
c3 AS (
    SELECT u.b1, u.b2, v.b2 AS b3
    FROM p2 u
    JOIN p2 v ON v.b1 = u.b1 AND u.b2 < v.b2
    WHERE EXISTS (SELECT 1 FROM p2 w WHERE w.b1 = u.b2 AND w.b2 = v.b2)
),
triples AS (
    SELECT a.p_brand AS b1, b.p_brand AS b2, c.p_brand AS b3,
           count(*) AS supp_abc
    FROM fb a
    JOIN fb b ON b.l_orderkey = a.l_orderkey AND a.p_brand < b.p_brand
    JOIN fb c ON c.l_orderkey = a.l_orderkey AND b.p_brand < c.p_brand
    JOIN c3 ON c3.b1 = a.p_brand AND c3.b2 = b.p_brand AND c3.b3 = c.p_brand
    GROUP BY 1, 2, 3
)
SELECT t.b1, t.b2, t.b3,
       CAST(t.supp_abc AS BIGINT) AS supp_abc,
       CAST(tt.minsup AS BIGINT) AS minsup,
       floor(CAST(t.supp_abc AS DOUBLE) / tt.n_orders * 1000000 + 0.5)
           / 1000000.0 AS support,
       floor(CAST(t.supp_abc AS DOUBLE)
             * tt.n_orders * tt.n_orders
             / (i1.supp_i * CAST(i2.supp_i AS DOUBLE) * i3.supp_i)
             * 1000000 + 0.5) / 1000000.0 AS lift3
FROM triples t
JOIN item i1 ON i1.p_brand = t.b1
JOIN item i2 ON i2.p_brand = t.b2
JOIN item i3 ON i3.p_brand = t.b3
CROSS JOIN tot tt
WHERE t.supp_abc >= tt.minsup
ORDER BY lift3 DESC, supp_abc DESC, b1, b2, b3
LIMIT {_Q219_TOPN}
"""


# ---------------------------------------------------------------------------
# q208 — RFM customer segmentation with data-derived quintile ladders
# (ext): the classic warehouse scoring pass — per customer Recency
# (days since last order, anchored at max(o_orderdate) in the DATA, no
# wall clock), Frequency (order count), Monetary (cent-quantized spend)
# — each scored 1..5 against quintile thresholds read from per-dimension
# bucket digests with the exact ceil-rank rule (q138); R is inverted so
# 5 = most recent. Output is the segment rollup (code, population, avg
# spend), the table a CRM/curation pipeline actually persists.
# Exactness: cents sum in DECIMAL(38,0)/HUGEINT; thresholds are VALUES
# picked from data; scores are integer comparisons; avg spend uses the
# exact half-up integer rounding (q198's r-trick). Determinism needs no
# float anywhere.
# Scale: ONE orders scan to the per-customer rollup (natural key), three
# bounded digests (days / order-count / $1000-bucket domains), each
# cumulated over its own domain (pinned windows), thresholds collected
# into a 1-row array frame (4 values per dim) broadcast back — scoring
# is a row-local array filter, never a re-shuffle.
# ---------------------------------------------------------------------------
_Q208_MBUCKET = 100_000  # monetary digest bucket: $1000 in cents
_Q208_QS = (20, 40, 60, 80)


def q208_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("mx"))
    cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("last"),
            F.count("*").cast("long").alias("f"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "decimal(38,0)"
                )
            ).alias("m_cents"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff(F.col("mx"), F.col("last")).cast("long").alias("r_days"),
            "f",
            "m_cents",
            F.expr(f"CAST(m_cents div {_Q208_MBUCKET} AS BIGINT)").alias("m_b"),
        )
        .localCheckpoint(eager=False)  # feeds 3 digests + scoring scan
    )

    def thresholds(col: str) -> DataFrame:
        """4 quintile threshold values of `col` as ONE sorted-array row,
        via digest + exact ceil-rank (value-domain-bounded cum window)."""
        dig = cust.groupBy(F.col(col).alias("b")).agg(F.count("*").alias("c"))
        wc = W.orderBy("b").rowsBetween(W.unboundedPreceding, 0)
        cum = dig.withColumn("cum", F.sum("c").over(wc))
        tot = dig.agg(F.sum("c").alias("n"))
        tgt = tot.select(
            "n",
            F.explode(F.array(*[F.lit(q) for q in _Q208_QS])).alias("pct"),
        ).withColumn("r", F.expr("(n * pct + 99) div 100"))
        return (
            tgt.join(cum, F.col("cum") >= F.col("r"))
            .groupBy("pct")
            .agg(F.min("b").alias("thr"))
            .agg(F.array_sort(F.collect_list("thr")).alias(f"{col}_thr"))
        )

    thr = (
        thresholds("r_days")
        .crossJoin(thresholds("f"))
        .crossJoin(thresholds("m_b"))
    )
    nabove = lambda c, a: F.size(
        F.filter(F.col(a), lambda t: F.col(c) > t)
    )
    scored = cust.crossJoin(F.broadcast(thr)).select(
        "m_cents",
        (F.lit(5) - nabove("r_days", "r_days_thr")).alias("r_score"),
        (F.lit(1) + nabove("f", "f_thr")).alias("f_score"),
        (F.lit(1) + nabove("m_b", "m_b_thr")).alias("m_score"),
    )
    seg = scored.groupBy(
        F.concat_ws(
            "", F.col("r_score"), F.col("f_score"), F.col("m_score")
        ).alias("segment")
    ).agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("m_cents").alias("s_cents"),
    )
    return seg.select(
        "segment",
        "n_customers",
        (
            F.expr(
                "CAST((s_cents * 200 + n_customers * 100)"
                " div (2 * n_customers * 100) AS BIGINT)"
            ).cast("double")
            / F.lit(100.0)
        ).alias("avg_spend"),
    ).orderBy("segment")


def _q208_thr_sql(col: str) -> str:
    return f"""dig_{col} AS (
    SELECT {col} AS b, count(*) AS c FROM cust GROUP BY 1
),
cum_{col} AS (
    SELECT b, sum(c) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cum
    FROM dig_{col}
),
thr_{col} AS (
    SELECT list_sort(list(thr)) AS {col}_thr FROM (
        SELECT t.pct, min(c.b) AS thr
        FROM (SELECT n, p.pct, (n * p.pct + 99) // 100 AS r
              FROM (SELECT sum(c) AS n FROM dig_{col}) tt,
                   unnest([{", ".join(str(q) for q in _Q208_QS)}]) AS p(pct)) t
        JOIN cum_{col} c ON c.cum >= t.r
        GROUP BY t.pct
    ) q
)"""


Q208_SQL = f"""
WITH anchor AS (SELECT max(o_orderdate) AS mx FROM orders),
cust AS (
    SELECT o.o_custkey,
           CAST(date_diff('day', max(o.o_orderdate), a.mx) AS BIGINT)
               AS r_days,
           CAST(count(*) AS BIGINT) AS f,
           sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS HUGEINT)) AS m_cents,
           CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS HUGEINT))
                // {_Q208_MBUCKET} AS BIGINT) AS m_b
    FROM orders o CROSS JOIN anchor a
    GROUP BY o.o_custkey, a.mx
),
{_q208_thr_sql("r_days")},
{_q208_thr_sql("f")},
{_q208_thr_sql("m_b")},
scored AS (
    SELECT c.m_cents,
           5 - len(list_filter(t1.r_days_thr, t -> c.r_days > t)) AS r_score,
           1 + len(list_filter(t2.f_thr, t -> c.f > t)) AS f_score,
           1 + len(list_filter(t3.m_b_thr, t -> c.m_b > t)) AS m_score
    FROM cust c
    CROSS JOIN thr_r_days t1 CROSS JOIN thr_f t2 CROSS JOIN thr_m_b t3
),
seg AS (
    SELECT CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
               || CAST(m_score AS VARCHAR) AS segment,
           CAST(count(*) AS BIGINT) AS n_customers,
           sum(m_cents) AS s_cents
    FROM scored GROUP BY 1
)
SELECT segment, n_customers,
       CAST(CAST((s_cents * 200 + n_customers * 100)
                 // (2 * CAST(n_customers AS HUGEINT) * 100) AS BIGINT)
            AS DOUBLE) / 100.0 AS avg_spend
FROM seg
ORDER BY segment
"""


QUERIES = [
    Query("q208_rfm_segments", q208_rfm_segments, Q208_SQL,
          survey="ext:rfm-segmentation,ext:quantile-digest,ext:percentiles,A3,F19",
          tags=("bench",)),
    Query("q219_apriori_triples", q219_apriori_triples, Q219_SQL,
          survey="ext:association-rules,ext:apriori-levelwise,A1",
          tags=("bench",)),
    Query("q220_share_of_parent", q220_share_of_parent, Q220_SQL,
          survey="ext:share-of-parent,A4,J1,W2"),
    Query("q221_grouping_sets3", q221_grouping_sets3, Q221_SQL,
          survey="ext:grouping-sets,A4,A6,F22"),
    Query("q01_pricing_summary", q01_pricing_summary, Q01_SQL, survey="A2,A3,P6,P9,F22", tags=("flagship", "bench")),
    Query("q02_top_revenue_orders", q02_top_revenue_orders, Q02_SQL, survey="J1,A2,T1", tags=("bench",)),
    Query("q03_topk_recent_orders", q03_topk_recent_orders, Q03_SQL, survey="S5,T1,T2"),
    Query("q04_regex_filter", q04_regex_filter, Q04_SQL, survey="P7,P8,F29,F15"),
    Query("q05_customers_without_orders", q05_customers_without_orders, Q05_SQL, survey="J2,J3,P11,S9"),
    Query("q06_brand_volume", q06_brand_volume, Q06_SQL, survey="J1,A2", tags=("bench",)),
    Query("q07_customers_per_nation_domain", q07_customers_per_nation_domain, Q07_SQL, survey="J4"),
    Query("q08_latest_shipment_per_part", q08_latest_shipment_per_part, Q08_SQL, survey="A1,W1", tags=("bench",)),
    Query("q09_top3_parts_per_brand", q09_top3_parts_per_brand, Q09_SQL, survey="W3,T4"),
    Query("q10_daily_event_share", q10_daily_event_share, Q10_SQL, survey="A4,A5,W2"),
    Query("q11_daily_event_pivot", q11_daily_event_pivot, Q11_SQL, survey="A4,A6"),
    Query("q12_daily_avg_value", q12_daily_avg_value, Q12_SQL, survey="A3,F19"),
    Query("q13_value_histogram", q13_value_histogram, Q13_SQL, survey="A7"),
    Query("q14_trailing_48h_counts", q14_trailing_48h_counts, Q14_SQL, survey="P9,F20,W4"),
    Query("q15_segment_stats", q15_segment_stats, Q15_SQL, survey="A13,E3"),
    Query("q16_status_value_counts", q16_status_value_counts, Q16_SQL, survey="A2,T7"),
    Query("q17_monthly_orders", q17_monthly_orders, Q17_SQL, survey="F19,F21"),
    Query("q18_rollup_revenue", q18_rollup_revenue, Q18_SQL, survey="A2+rollup"),
    Query("q19_value_labels", q19_value_labels, Q19_SQL, survey="F26,U4"),
    Query("q20_set_ops", q20_set_ops, Q20_SQL, survey="E1,E2,E3"),
    Query("q21_user_sessions", q21_user_sessions, Q21_SQL, survey="ST4,W-family", tags=("bench",)),
    Query("q22_priority_with_heavy_lines", q22_priority_with_heavy_lines, Q22_SQL, survey="J2"),
    Query("q23_cube_events", q23_cube_events, Q23_SQL, survey="A2+cube"),
    Query("q24_json_extract", q24_json_extract, Q24_SQL, survey="F24,F25"),
    Query("q25_approx_distinct", q25_approx_distinct, Q25_SQL, survey="A13+approx-sketch", tags=("bench",)),
    Query("q26_top_suppliers_per_region", q26_top_suppliers_per_region, Q26_SQL, survey="J1,W3,T4"),
    Query("q86_regional_revenue", q86_regional_revenue, Q86_SQL,
          survey="J1,A3,P9,ext:star-join", tags=("bench",)),
    Query("q136_merge_upsert_classify", q136_merge_upsert_classify, Q136_SQL,
          survey="ext:merge-upsert,ST5,S9,J2", tags=("bench",)),
    Query("q157_association_rules", q157_association_rules, Q157_SQL,
          survey="ext:association-rules,J1,A2,T1", tags=("bench",)),
    Query("q160_delta_join_maintenance", q160_delta_join_maintenance, Q160_SQL,
          survey="ext:incremental-view-maintenance,ext:incremental-stats,J1,A3",
          tags=("bench",)),
    Query("q161_pareto_frontier", q161_pareto_frontier, Q161_SQL,
          survey="ext:skyline-pareto,A3,T1", tags=("bench",)),
    Query("q184_topk_other_rollup", q184_topk_other_rollup, Q184_SQL,
          survey="ext:topk-other-rollup,W3,T4,A2"),
    Query("q179_bloom_join_pruning", q179_bloom_join_pruning, Q179_SQL,
          survey="ext:bloom-prefilter,ext:join-size-estimation,J1,"
                 "ext:star-join",
          tags=("bench",)),
]
