"""Time-series plans (q60–q62, q69) over the `events` table: hypertable-
style multi-grain rollup, exact distribution percentiles, a binned range
join, and top-k time-series similarity search — the time-series
custom-operator family (as-of join is q59).

Cross-engine determinism: date_trunc on a UTC-pinned session matches
DuckDB's naive timestamps (same pattern as q17/q50); percentiles use
EXACT linear interpolation on both engines (Spark ``percentile`` ↔
DuckDB ``quantile_cont``), rounded to 4dp; the range join's gap is exact
integer microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.timeseries import binned_range_join, multi_grain_rollup
from ..sources.tables import load
from .registry import Query


# ---------------------------------------------------------------------------
# q60 — hypertable rollup (ext): day + hour grains in ONE pass via grouping
# sets (one scan, one shuffle; partial agg collapses map-side). The
# continuous-aggregate pattern of a time-series store, Spark-first.
# ---------------------------------------------------------------------------
def q60_multi_grain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return multi_grain_rollup(ev, "ts", "value", grains=("day", "hour"))


Q60_SQL = """
SELECT date_trunc('day', ts)  AS day_ts,
       CASE WHEN GROUPING(date_trunc('hour', ts)) = 0
            THEN date_trunc('hour', ts) END AS hour_ts,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       CAST(1 - GROUPING(date_trunc('hour', ts)) AS INTEGER) AS grain
FROM events
GROUP BY GROUPING SETS ((date_trunc('day', ts)),
                        (date_trunc('day', ts), date_trunc('hour', ts)))
ORDER BY grain, day_ts, hour_ts
"""


# ---------------------------------------------------------------------------
# q61 — exact distribution percentiles per event type (ext). Spark's
# ``percentile`` is the exact interpolated quantile (the approx sketch
# variant is q25's approx_count_distinct territory); DuckDB's
# ``quantile_cont`` implements the same definition.
# ---------------------------------------------------------------------------
_PCTS = (0.5, 0.9, 0.99)


def q61_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    aggs = [
        F.round(F.percentile("value", F.lit(p)), 4).alias(f"p{int(p * 100)}")
        for p in _PCTS
    ] + [F.count("*").alias("n")]
    return ev.groupBy("event_type").agg(*aggs).orderBy("event_type")


Q61_SQL = f"""
SELECT event_type,
       {", ".join(f"round(quantile_cont(value, {p}), 4) AS p{int(p * 100)}" for p in _PCTS)},
       count(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q62 — range join (ext): every (error, click) pair of the same user with
# the click in the 6 hours before the error. The naive inequality join is
# a nested-loop O(n·m); binned_range_join makes it an equi-join on
# (user, time_bin) with an exact residual filter — cluster-safe at 100 TB.
# The oracle runs the naive inequality join: independent derivations.
# ---------------------------------------------------------------------------
_WINDOW_S = 6 * 3600


def q62_error_click_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    joined = binned_range_join(
        errors, clicks, on="user_id", left_ts="ts", right_ts="click_ts",
        window_s=_WINDOW_S,
    )
    return joined.select(
        "event_id",
        "click_id",
        "user_id",
        (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("gap_us"),
    )


Q62_SQL = f"""
WITH clk AS (
    SELECT user_id, event_id AS click_id, ts AS click_ts
    FROM events WHERE event_type = 'click'
),
err AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
)
SELECT e.event_id, c.click_id, e.user_id,
       epoch_us(e.ts) - epoch_us(c.click_ts) AS gap_us
FROM err e
JOIN clk c
  ON e.user_id = c.user_id
 AND epoch_us(e.ts) - epoch_us(c.click_ts) > 0
 AND epoch_us(e.ts) - epoch_us(c.click_ts) <= {_WINDOW_S * 1_000_000}
ORDER BY e.event_id, c.click_id
"""


# ---------------------------------------------------------------------------
# q69 — time-series similarity search (ext): top-10 users whose daily
# activity series is closest (Euclidean) to user 0's. The distributed
# top-k time-series similarity shape (cf. PAPERS.md: EDBT'19 streaming
# similarity, ICDE'21 REPOSE): dense per-user series via the
# join-vs-generated-domain pattern (J4), one groupBy shuffle to build
# series, broadcast query vector, row-local zip_with distance,
# TakeOrdered top-k. No pairwise blow-up: distance is vs ONE query
# series; all-pairs variants would bucket first (q44 pattern).
# ---------------------------------------------------------------------------
_Q69_DAYS = 30
_Q69_QUERY_USER = 0


def q69_similar_activity_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    cnts = (
        ev.select("user_id", F.dayofmonth("ts").alias("d"))
        .groupBy("user_id", "d")
        .agg(F.count("*").alias("c"))
    )
    # Dense per-user series WITHOUT the day-grid join (which consumed the
    # cnts branch twice — distinct users + left join — recomputing it):
    # one groupBy(user) collects the sparse (day, count) map and the
    # fixed-length series materializes row-locally via sequence + lookup
    # (try_element_at: null-safe under ANSI; missing days → 0).
    # (lazy localCheckpoint: series feeds both the probe row and the
    # corpus side of the distance scan — materialize once.)
    series = (
        cnts.groupBy("user_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("d", "c"))).alias("m"))
        .select(
            "user_id",
            F.transform(
                F.sequence(F.lit(1), F.lit(_Q69_DAYS)),
                lambda d: F.coalesce(F.try_element_at("m", d), F.lit(0).cast("long")),
            ).alias("s"),
        )
        .localCheckpoint(eager=False)
    )
    q = series.filter(F.col("user_id") == _Q69_QUERY_USER).select(
        F.col("s").alias("qs")
    )
    sq_diff = F.zip_with("s", "qs", lambda a, b: (a - b) * (a - b))
    dist = F.round(
        F.sqrt(F.aggregate(sq_diff, F.lit(0).cast("long"), lambda acc, x: acc + x)), 4
    )
    return (
        series.crossJoin(F.broadcast(q))
        .filter(F.col("user_id") != _Q69_QUERY_USER)
        .select("user_id", dist.alias("dist"))
        .orderBy("dist", "user_id")
        .limit(10)
    )


Q69_SQL = f"""
WITH days AS (SELECT unnest(generate_series(1, {_Q69_DAYS})) AS d),
cnts AS (
    SELECT user_id, CAST(date_part('day', ts) AS INT) AS d, count(*) AS c
    FROM events GROUP BY 1, 2
),
grid AS (
    SELECT u.user_id, days.d
    FROM (SELECT DISTINCT user_id FROM cnts) u CROSS JOIN days
),
filled AS (
    SELECT g.user_id, g.d, coalesce(c.c, 0) AS c
    FROM grid g LEFT JOIN cnts c ON g.user_id = c.user_id AND g.d = c.d
),
series AS (
    SELECT user_id, list(c ORDER BY d) AS s FROM filled GROUP BY user_id
),
q AS (SELECT s AS qs FROM series WHERE user_id = {_Q69_QUERY_USER})
SELECT user_id,
       round(sqrt(list_sum(list_transform(generate_series(1, {_Q69_DAYS}),
             i -> CAST((s[i] - qs[i]) * (s[i] - qs[i]) AS BIGINT)))), 4) AS dist
FROM series CROSS JOIN q
WHERE user_id <> {_Q69_QUERY_USER}
ORDER BY dist, user_id
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q70 — ordered funnel (ext): signup → click → purchase, each stage's
# event strictly after the previous stage's FIRST event, per user. Three
# conditional min-aggregations over one scan (one shuffle on user_id),
# then a tiny stage-count union — no self-joins of the event table.
# ---------------------------------------------------------------------------
def q70_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load(spark, sf_dir, "events")
    # ONE pass over events: only funnel-relevant types survive the scan
    # filter (pushed to parquet), then THREE CHAINED full-partition
    # window minima on one user_id exchange — stage N's conditional min
    # references stage N−1's anchor (a per-partition constant), and a
    # null anchor nulls every later stage via the > null comparison.
    # Round 4 replaced the collect_list(struct(ts, type)) formulation:
    # a hot user's funnel events all landed in ONE agg buffer (the
    # unbounded-collect class VERDICT r3 flagged for dedup), while
    # WindowExec buffers spill to disk — same single shuffle, same
    # answer, O(row) memory. The per-user anchor dedup rides the same
    # partitioning (no second exchange).
    w = W.partitionBy("user_id")
    staged = (
        ev.filter(F.col("event_type").isin("signup", "click", "purchase"))
        .select("user_id", "ts", "event_type")
        .withColumn(
            "s_ts",
            F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
        )
        .withColumn(
            "c_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("s_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "p_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") > F.col("c_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    anchors = staged.groupBy("user_id").agg(
        F.min("s_ts").alias("s_ts"), F.min("c_ts").alias("c_ts"), F.min("p_ts").alias("p_ts")
    )
    counts = anchors.agg(
        F.count("s_ts").alias("n1"), F.count("c_ts").alias("n2"), F.count("p_ts").alias("n3")
    )
    return counts.select(
        F.expr(
            "stack(3, '1_signup', n1, '2_click_after_signup', n2,"
            " '3_purchase_after_click', n3) AS (stage, n_users)"
        )
    ).orderBy("stage")


Q70_SQL = """
WITH s AS (
    SELECT user_id, min(ts) AS s_ts FROM events WHERE event_type = 'signup' GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(e.ts) AS c_ts
    FROM events e JOIN s ON e.user_id = s.user_id
    WHERE e.event_type = 'click' AND e.ts > s.s_ts
    GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, min(e.ts) AS p_ts
    FROM events e JOIN c ON e.user_id = c.user_id
    WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
    GROUP BY e.user_id
)
SELECT * FROM (
    SELECT '1_signup' AS stage, (SELECT count(*) FROM s) AS n_users
    UNION ALL
    SELECT '2_click_after_signup', (SELECT count(*) FROM c)
    UNION ALL
    SELECT '3_purchase_after_click', (SELECT count(*) FROM p)
) t
ORDER BY stage
"""


# ---------------------------------------------------------------------------
# q71 — retention cohorts (ext): users grouped by first-activity day,
# counted per day-offset of return activity — the classic triangle
# matrix. Two shuffles: first-day per user, then (cohort, offset) counts.
# ---------------------------------------------------------------------------
def q71_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    # date_trunc (timestamp-typed) rather than to_date: DATE columns land
    # in pandas as python objects and hash-mismatch DuckDB's datetime64 —
    # same convention as q12/q17.
    # ONE pass per user: collect_set(day) subsumes both the DISTINCT
    # (user, day) dedup and the min-day cohort in a single groupBy — no
    # second events scan, no user_id join (was 4 shuffles, now 2). The
    # per-user array is bounded by distinct ACTIVE DAYS, not events.
    per_user = (
        ev.select("user_id", F.date_trunc("DAY", F.col("ts")).alias("day"))
        .groupBy("user_id")
        .agg(F.collect_set("day").alias("days"))
    )
    return (
        per_user.withColumn("cohort_day", F.array_min("days"))
        .select("cohort_day", F.explode("days").alias("day"))
        .groupBy("cohort_day", F.datediff("day", "cohort_day").alias("day_offset"))
        .agg(F.count("*").alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


Q71_SQL = """
WITH first AS (
    SELECT user_id, min(date_trunc('day', ts)) AS cohort_day FROM events GROUP BY user_id
),
active AS (
    SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
)
SELECT f.cohort_day,
       CAST(datediff('day', f.cohort_day, a.day) AS INTEGER) AS day_offset,
       count(*) AS n_users
FROM active a JOIN first f ON a.user_id = f.user_id
GROUP BY f.cohort_day, datediff('day', f.cohort_day, a.day)
ORDER BY cohort_day, day_offset
"""


# ---------------------------------------------------------------------------
# q78 — rolling-window anomaly detection (ext): per event-type daily value
# totals, trailing-7-day mean/std (RANGE window, current day excluded),
# z-score flags at |z| > 2 — the metrics-drift alarm over a pipeline's own
# telemetry. Day index is epoch-day (TZ-free on NTZ timestamps); one
# shuffle to daily grain, one bounded window sort per event_type. The
# RANGE frame (not ROWS) keeps the statistics correct when days are
# missing — a trailing week is a time span, not "last 7 rows".
# ---------------------------------------------------------------------------
def q78_rolling_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("DAY", F.col("ts")).alias("day_ts"),
        F.unix_date(F.to_date("ts")).alias("day_num"),
    ).agg(F.round(F.sum("value"), 4).alias("v"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_num")
        .rangeBetween(-7, -1)
    )
    mean = F.avg("v").over(w)
    std = F.stddev_samp("v").over(w)
    z = F.round((F.col("v") - mean) / std, 4) + F.lit(0.0)
    return (
        daily.select(
            "event_type",
            "day_ts",
            "v",
            F.round(mean, 4).alias("trailing_mean"),
            z.alias("z"),
            (F.abs((F.col("v") - mean) / std) > 2).alias("is_anomaly"),
        )
        .orderBy("event_type", "day_ts")
    )


Q78_SQL = """
WITH daily AS (
    SELECT event_type,
           date_trunc('day', ts) AS day_ts,
           datediff('day', DATE '1970-01-01', ts) AS day_num,
           round(sum(value), 4) AS v
    FROM events GROUP BY 1, 2, 3
),
stats AS (
    SELECT event_type, day_ts, v,
           avg(v) OVER w AS m,
           stddev_samp(v) OVER w AS s
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day_num
                 RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, day_ts, v,
       round(m, 4) AS trailing_mean,
       round((v - m) / s, 4) + 0.0 AS z,
       abs((v - m) / s) > 2 AS is_anomaly
FROM stats
ORDER BY event_type, day_ts
"""


# ---------------------------------------------------------------------------
# q87 — per-group linear trend (ext): least-squares slope / intercept /
# R² of each event type's daily value total, via the NATIVE regression
# aggregates (regr_slope/regr_intercept/regr_r2 — identical definitions
# in Spark and DuckDB). The trend-detection step of a metrics pipeline,
# and the closed-form alternative to a per-group UDF model fit: two
# shuffles total (daily grain, then per-type regression over ≤31 rows
# per group — the regression inputs are the ROLLUP, never raw events).
# x is centred on day-of-month (small intercepts → 4dp rounding is
# stable; raw epoch-day x would put the intercept at ~1e5 where
# engine-order float noise can flip the 4th decimal).
# ---------------------------------------------------------------------------
def q87_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", (F.dayofmonth("ts") - 1).alias("d")
    ).agg(F.sum("value").alias("v"))
    return (
        daily.groupBy("event_type")
        .agg(
            (F.round(F.regr_slope("v", "d"), 6) + F.lit(0.0)).alias("slope"),
            (F.round(F.regr_intercept("v", "d"), 4) + F.lit(0.0)).alias("intercept"),
            F.round(F.regr_r2("v", "d"), 4).alias("r2"),
            F.count("*").alias("n_days"),
        )
        .orderBy("event_type")
    )


Q87_SQL = """
WITH daily AS (
    SELECT event_type, date_part('day', ts) - 1 AS d, sum(value) AS v
    FROM events GROUP BY 1, 2
)
SELECT event_type,
       round(regr_slope(v, d), 6) + 0.0 AS slope,
       round(regr_intercept(v, d), 4) + 0.0 AS intercept,
       round(regr_r2(v, d), 4) AS r2,
       count(*) AS n_days
FROM daily
GROUP BY event_type
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q88 — equi-depth histogram (ext): 10 equal-population value buckets
# per event type via ntile (identical floor-division bucket assignment
# in both engines; ties broken by event_id for a total order), each
# bucket reporting population and [lo, hi) bounds. The quantile-sketch
# companion to q13's equi-WIDTH histogram — equi-depth is what query
# optimizers and drift monitors actually want (every bucket carries
# equal evidence). One window sort per event_type, then a tiny
# (type, bucket) aggregation.
# ---------------------------------------------------------------------------
_Q88_BUCKETS = 10


def q88_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select(
            "event_type", "value", F.ntile(_Q88_BUCKETS).over(w).alias("bucket")
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
        .orderBy("event_type", "bucket")
    )


Q88_SQL = f"""
WITH bucketed AS (
    SELECT event_type, value,
           ntile({_Q88_BUCKETS}) OVER (
               PARTITION BY event_type ORDER BY value, event_id) AS bucket
    FROM events
)
SELECT event_type, bucket, count(*) AS n,
       round(min(value), 4) AS lo, round(max(value), 4) AS hi
FROM bucketed
GROUP BY event_type, bucket
ORDER BY event_type, bucket
"""


# ---------------------------------------------------------------------------
# q89 — per-type EWMA smoothing (ext): s_t = α·v_t + (1−α)·s_{t−1} over
# each event type's daily series via the batch applyInPandas operator
# (operators/timeseries.py:ewma_by_key) — the recursion built-in window
# algebra can't express stably. The oracle replays the SAME recursion
# as a DuckDB RECURSIVE CTE: two fully independent derivations. α and
# 1−α are written as the same literals on both sides so the float
# arithmetic is bit-identical before the 4dp rounding.
# ---------------------------------------------------------------------------
_EWMA_ALPHA = 0.3


def q89_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import ewma_by_key

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("DAY", F.col("ts")).alias("day_ts")
    ).agg(F.sum("value").alias("v"))
    smoothed = ewma_by_key(
        daily, ["event_type"], "day_ts", "v", alpha=_EWMA_ALPHA
    )
    return smoothed.select(
        "event_type",
        "day_ts",
        F.round("v", 4).alias("v"),
        F.round("ewma", 4).alias("ewma"),
    ).orderBy("event_type", "day_ts")


Q89_SQL = f"""
WITH RECURSIVE daily AS (
    SELECT event_type, date_trunc('day', ts) AS day_ts, sum(value) AS v
    FROM events GROUP BY 1, 2
),
numbered AS (
    SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day_ts) AS rn
    FROM daily
),
ew AS (
    SELECT event_type, day_ts, v, rn, v AS s FROM numbered WHERE rn = 1
    UNION ALL
    SELECT n.event_type, n.day_ts, n.v, n.rn,
           {_EWMA_ALPHA} * n.v + (1.0 - {_EWMA_ALPHA}) * e.s
    FROM numbered n JOIN ew e ON n.event_type = e.event_type AND n.rn = e.rn + 1
)
SELECT event_type, day_ts, round(v, 4) AS v, round(s, 4) AS ewma
FROM ew
ORDER BY event_type, day_ts
"""


# ---------------------------------------------------------------------------
# q130 — EXACT median by two-pass SELECTION (ext): the exact counterpart
# to q123's sampled quantiles, and the at-scale alternative to q61's
# sort-based percentile. The classic distributed selection algorithm
# (Blum et al.'s selection idea in histogram form): pass 1 builds a
# 64-bucket equi-width histogram per group (one map-side-combinable
# aggregation — NO sort); the cumulative bucket counts (≤64 rows per
# group) locate the bucket containing the k-th order statistic; pass 2
# sorts ONLY that bucket's rows — expected n/64 of the group — and
# picks the k-th element exactly. At 100 TB the full-group sort that
# `percentile` implies never happens; recursing one more level bounds
# the sorted slice at n/64², the same levels knob as the prefix sum.
#
# Determinism: bucket arithmetic is shared-form IEEE (step computed
# once, floor, clamp) so both engines bin identically; the median
# itself is a VALUE picked from the data (no float arithmetic at all),
# and the oracle re-derives it with an independent row_number scan —
# only n_bucket_rows mirrors the histogram construction.
# ---------------------------------------------------------------------------
_Q130_B = 64


def q130_selection_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"), F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    step = (F.col("mx") - F.col("mn")) / F.lit(float(_Q130_B))
    binned = ev.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "value",
        "n",
        F.when(F.col("mx") == F.col("mn"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(_Q130_B - 1),
                F.floor((F.col("value") - F.col("mn")) / step).cast("int"),
            )
        )
        .alias("b"),
    )
    hist = binned.groupBy("event_type", "n", "b").agg(F.count("*").alias("c"))
    w = Window.partitionBy("event_type").orderBy("b")
    k = (F.col("n") + 1) / 2  # lower median: k = floor((n+1)/2)
    cum = hist.select(
        "event_type", "n", "b", "c",
        F.coalesce(F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                   F.lit(0)).alias("before"),
    )
    target = cum.filter(
        (F.col("before") < F.floor(k)) & (F.col("before") + F.col("c") >= F.floor(k))
    ).select(
        "event_type",
        F.col("b").alias("tb"),
        F.col("c").alias("n_bucket_rows"),
        (F.floor(k) - F.col("before")).alias("off"),
    )
    t2 = target.select(
        F.col("event_type").alias("et"), "tb", "n_bucket_rows", "off"
    )
    inb = (
        binned.join(
            F.broadcast(t2),
            (F.col("event_type") == F.col("et")) & (F.col("b") == F.col("tb")),
        )
        .select("event_type", "value", "n", "n_bucket_rows", "off")
    )
    wv = Window.partitionBy("event_type").orderBy("value")
    return (
        inb.withColumn("rn", F.row_number().over(wv))
        .filter(F.col("rn") == F.col("off"))
        .select(
            "event_type",
            F.col("n").cast("long").alias("n"),
            F.col("n_bucket_rows").cast("long").alias("n_bucket_rows"),
            F.col("value").alias("median_value"),
        )
        .orderBy("event_type")
    )


Q130_SQL = f"""
WITH stats AS (
    SELECT event_type, count(*) AS n, min(value) AS mn, max(value) AS mx
    FROM events GROUP BY event_type
),
binned AS (
    SELECT e.event_type, e.value, s.n,
           CASE WHEN s.mx = s.mn THEN 0
                ELSE least({_Q130_B - 1},
                           CAST(floor((e.value - s.mn)
                                / ((s.mx - s.mn) / {float(_Q130_B)!r})) AS INTEGER))
           END AS b
    FROM events e JOIN stats s USING (event_type)
),
hist AS (
    SELECT event_type, n, b, count(*) AS c
    FROM binned GROUP BY event_type, n, b
),
cum AS (
    SELECT event_type, n, b, c,
           COALESCE(sum(c) OVER (PARTITION BY event_type ORDER BY b
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
    FROM hist
),
target AS (
    SELECT event_type, c AS n_bucket_rows
    FROM cum
    WHERE before < floor((n + 1) / 2.0) AND before + c >= floor((n + 1) / 2.0)
),
-- independent median derivation: a straight order-statistic scan
ranked AS (
    SELECT event_type, value, n,
           row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn
    FROM binned
)
SELECT r.event_type,
       CAST(r.n AS BIGINT) AS n,
       CAST(t.n_bucket_rows AS BIGINT) AS n_bucket_rows,
       r.value AS median_value
FROM ranked r
JOIN target t USING (event_type)
WHERE r.rn = CAST(floor((r.n + 1) / 2.0) AS BIGINT)
ORDER BY r.event_type
"""


# ---------------------------------------------------------------------------
# q155 — KEYLESS interval-overlap join via grid cells: user sessions
# (gaps-and-islands intervals, q154's algebra over q21's gap rule) ×
# global incident windows (high-value error events ± 15 min), with NO
# shared equi-key — the case q62's per-user binned range join cannot
# cover and where naive Spark degenerates to a cartesian product.
# Each interval emits its covered 1-hour grid cells; the join is a plain
# equi-join on cell; a pair is counted EXACTLY ONCE — no distinct — by
# keeping it only in the cell containing max(starts) (the first cell the
# two intervals share). The overlap predicate and seconds are exact
# integer arithmetic, and the DuckDB oracle runs the UN-gridded
# brute-force overlap join, so a green row proves the grid decomposition
# is complete and duplicate-free (q153's recall-proof pattern).
#
# Scale: cell emission is bounded by interval_length/cell (sessions are
# gap-bounded; incidents are fixed 30 min); the join shuffles on cell —
# time-local, so load spreads across the timeline rather than piling on
# a hot user key. Per-user session windows bound partitions at one
# user's history (q75's documented shape).
# ---------------------------------------------------------------------------
_Q155_GAP_S = 1800
_Q155_CELL_S = 3600
_Q155_HALF_WIN_S = 900
_Q155_VAL = 195.0


def q155_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("ep"),
        "event_type",
        "value",
    )
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    lag_ep = F.lag("ep").over(w)
    sess = (
        ev.withColumn(
            "chg",
            F.when(
                lag_ep.isNull() | (F.col("ep") - lag_ep > _Q155_GAP_S), 1
            ).otherwise(0),
        )
        .withColumn(
            "sid", F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .groupBy("user_id", "sid")
        .agg(
            F.min("ep").alias("s_start"),
            (F.max("ep") + 1).alias("s_end"),  # half-open
        )
    )
    inc = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") >= _Q155_VAL)
    ).select(
        F.col("event_id").alias("inc_id"),
        (F.col("ep") - _Q155_HALF_WIN_S).alias("i_start"),
        (F.col("ep") + _Q155_HALF_WIN_S).alias("i_end"),
    )
    cell = _Q155_CELL_S
    s_cells = sess.withColumn(
        "cell",
        F.explode(
            F.sequence(
                F.floor(F.col("s_start") / cell), F.floor((F.col("s_end") - 1) / cell)
            )
        ),
    )
    i_cells = inc.withColumn(
        "cell",
        F.explode(
            F.sequence(
                F.floor(F.col("i_start") / cell), F.floor((F.col("i_end") - 1) / cell)
            )
        ),
    )
    pairs = (
        s_cells.join(i_cells, "cell")
        .filter(
            (F.col("s_start") < F.col("i_end")) & (F.col("i_start") < F.col("s_end"))
        )
        # count-once cell: the first cell both intervals cover
        .filter(F.col("cell") == F.floor(F.greatest("s_start", "i_start") / cell))
        .withColumn(
            "ov", F.least("s_end", "i_end") - F.greatest("s_start", "i_start")
        )
    )
    return (
        pairs.groupBy("inc_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("ov").cast("long").alias("overlap_seconds"),
        )
        .orderBy("inc_id")
    )


Q155_SQL = f"""
WITH ev AS (
    SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS ep,
           event_type, value
    FROM events
),
flagged AS (
    SELECT *,
           CASE WHEN lag(ep) OVER w IS NULL
                  OR ep - lag(ep) OVER w > {_Q155_GAP_S}
                THEN 1 ELSE 0 END AS chg
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY ep, event_id)
),
sess AS (
    SELECT user_id, sid, min(ep) AS s_start, max(ep) + 1 AS s_end
    FROM (
        SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ep, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    GROUP BY user_id, sid
),
inc AS (
    SELECT event_id AS inc_id,
           ep - {_Q155_HALF_WIN_S} AS i_start,
           ep + {_Q155_HALF_WIN_S} AS i_end
    FROM ev
    WHERE event_type = 'error' AND value >= CAST({_Q155_VAL!r} AS DOUBLE)
),
pairs AS (
    SELECT i.inc_id, s.user_id,
           least(s.s_end, i.i_end) - greatest(s.s_start, i.i_start) AS ov
    FROM sess s JOIN inc i
      ON s.s_start < i.i_end AND i.i_start < s.s_end
)
SELECT inc_id,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(ov) AS BIGINT) AS overlap_seconds
FROM pairs GROUP BY inc_id ORDER BY inc_id
"""


# ---------------------------------------------------------------------------
# q192 — seasonal-naive forecast BACKTEST with MASE (ext): the
# forecasting-evaluation primitive (Hyndman & Koehler 2006, "Another
# look at measures of forecast accuracy") a metrics pipeline runs to
# decide whether a model beats the no-model baseline: per event_type,
# the last 7 days are forecast by the value 7 days earlier (seasonal
# naive, m=7), the error is scaled by the TRAINING period's in-sample
# seasonal MAE — MASE < 1 means beating the naive baseline is even
# possible to measure. Everything derives from integer daily counts
# (exact), the origin anchors to max(day) in the DATA (no wall clock),
# and the only floats are the two final ratios at 4dp.
# Scale: one groupBy to daily grain (the only corpus-wide op), then a
# lag window over ≤ n_days rows per type — bounded partitions; at
# 100 TB the daily table is the stored rollup (q60), not a rescan.
# ---------------------------------------------------------------------------
_Q192_SEASON = 7


def q192_seasonal_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .agg(F.count("*").cast("long").alias("n"))
        .localCheckpoint(eager=False)  # feeds lag window AND the anchor
    )
    mx = daily.agg(F.max("day").alias("mx"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = (
        daily.withColumn("base", F.lag("n", _Q192_SEASON).over(w))
        .filter(F.col("base").isNotNull())
        .crossJoin(F.broadcast(mx))
        .withColumn(
            "is_test",
            F.col("day") > F.col("mx") - F.expr(f"interval {_Q192_SEASON} days"),
        )
        .withColumn("ae", F.abs(F.col("n") - F.col("base")))
    )
    agg = lagged.groupBy("event_type").agg(
        F.sum(F.when(F.col("is_test"), F.col("ae"))).alias("s_fc"),
        F.sum(F.when(F.col("is_test"), 1).otherwise(0)).alias("c_fc"),
        F.sum(F.when(~F.col("is_test"), F.col("ae"))).alias("s_in"),
        F.sum(F.when(~F.col("is_test"), 1).otherwise(0)).alias("c_in"),
    )
    mae_fc = F.col("s_fc").cast("double") / F.col("c_fc")
    mae_in = F.col("s_in").cast("double") / F.col("c_in")
    return agg.select(
        "event_type",
        F.col("c_fc").cast("long").alias("n_test_days"),
        F.col("c_in").cast("long").alias("n_train_days"),
        F.round(mae_fc, 4).alias("mae_forecast"),
        F.round(mae_in, 4).alias("mae_insample"),
        F.round(mae_fc / mae_in, 4).alias("mase"),
    ).orderBy("event_type")


Q192_SQL = f"""
WITH daily AS (
    SELECT event_type, date_trunc('day', ts) AS day,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
),
mx AS (SELECT max(day) AS mx FROM daily),
lagged AS (
    SELECT d.event_type, d.day, d.n,
           lag(d.n, {_Q192_SEASON}) OVER (
               PARTITION BY d.event_type ORDER BY d.day
           ) AS base,
           d.day > m.mx - INTERVAL {_Q192_SEASON} DAY AS is_test
    FROM daily d CROSS JOIN mx m
),
agg AS (
    SELECT event_type,
           sum(CASE WHEN is_test THEN abs(n - base) END) AS s_fc,
           sum(CASE WHEN is_test THEN 1 ELSE 0 END) AS c_fc,
           sum(CASE WHEN NOT is_test THEN abs(n - base) END) AS s_in,
           sum(CASE WHEN NOT is_test THEN 1 ELSE 0 END) AS c_in
    FROM lagged WHERE base IS NOT NULL
    GROUP BY event_type
)
SELECT event_type,
       CAST(c_fc AS BIGINT) AS n_test_days,
       CAST(c_in AS BIGINT) AS n_train_days,
       round(CAST(s_fc AS DOUBLE) / c_fc, 4) AS mae_forecast,
       round(CAST(s_in AS DOUBLE) / c_in, 4) AS mae_insample,
       round((CAST(s_fc AS DOUBLE) / c_fc)
             / (CAST(s_in AS DOUBLE) / c_in), 4) AS mase
FROM agg
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q195 — activity streaks via gaps-and-islands (ext): the consecutive-
# active-day detection every engagement/retention pipeline runs (and the
# classic SQL island pattern Spark expresses natively): a user's purchase
# days form an island when day_number − row_number() is constant. Output
# is the streak-length distribution (how many runs of exactly k
# consecutive purchase days exist, across how many users) — the compact,
# order-free rollup a 100 TB engagement job would actually persist.
# All-integer arithmetic; the anchor date is a fixed literal (calendar
# epoch for day numbering), not wall-clock.
# Scale: the DISTINCT (user, day) rollup is the only corpus-wide op (one
# shuffle, partial-agg collapses map-side); the row_number window is
# partitioned by user over ≤ n_days rows per user — bounded partitions,
# never a global sort.
# ---------------------------------------------------------------------------
_Q195_TYPE = "purchase"


def q195_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    days = (
        ev.filter(F.col("event_type") == _Q195_TYPE)
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.withColumn(
        "island",
        F.datediff(F.col("day"), F.lit("1970-01-01").cast("date"))
        - F.row_number().over(w),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count("*").alias("streak_len")
    )
    return (
        streaks.groupBy("streak_len")
        .agg(
            F.count("*").cast("long").alias("n_streaks"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
        .orderBy("streak_len")
    )


Q195_SQL = f"""
WITH days AS (
    SELECT DISTINCT user_id, date_trunc('day', ts) AS day
    FROM events WHERE event_type = '{_Q195_TYPE}'
),
isl AS (
    SELECT user_id,
           date_diff('day', DATE '1970-01-01', day)
           - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island
    FROM days
),
streaks AS (
    SELECT user_id, island, count(*) AS streak_len
    FROM isl GROUP BY 1, 2
)
SELECT streak_len,
       CAST(count(*) AS BIGINT) AS n_streaks,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM streaks
GROUP BY 1
ORDER BY streak_len
"""


# ---------------------------------------------------------------------------
# q230 — cross-correlation lag finder (ext): "does the error series
# LEAD the click series, and by how many hours?" — the causal-direction
# probe q222 (autocorrelation) can't answer. For every ordered type
# pair and every lag in ±3 h, the raw cross-product Σ a_t·b_{t+lag} is
# an exact integer (hourly-count equi-join per lag, all lags in one
# exploded pass), normalized by the exact energies √(Σa²·Σb²); the
# best lag is the floor-scaled-integer argmax (q226's determinism
# trick) with the smallest-|lag|, then negative-first tie-break.
# Scale: one corpus groupBy to (type, hour); the lag join is
# |lags|×hourly-rollup rows — time-domain-bounded, never corpus-wide.
# ---------------------------------------------------------------------------
_Q230_MAXLAG = 3
_Q230_SCALE = 10**12


def q230_xcorr_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.col("event_type").alias("t"), F.date_trunc("hour", "ts").alias("h")
        )
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)  # feeds energies + both join sides
    )
    energy = hourly.groupBy("t").agg(
        F.sum(F.col("c") * F.col("c")).cast("long").alias("e")
    )
    lags = F.explode(
        F.array(*[F.lit(l) for l in range(-_Q230_MAXLAG, _Q230_MAXLAG + 1)])
    )
    a = hourly.select(
        F.col("t").alias("ta"), F.col("h").alias("h"), F.col("c").alias("ca")
    ).select("ta", "h", "ca", lags.alias("lag"))
    b = hourly.select(
        F.col("t").alias("tb"),
        F.col("h").alias("hb"),
        F.col("c").alias("cb"),
    )
    prods = (
        a.join(
            b,
            (F.col("hb") == F.expr("h + make_interval(0, 0, 0, 0, lag)"))
            & (F.col("ta") < F.col("tb")),
        )
        .groupBy("ta", "tb", "lag")
        .agg(
            F.sum(F.col("ca") * F.col("cb")).cast("long").alias("sp"),
            F.count("*").cast("long").alias("n_overlap"),
        )
    )
    ea = energy.select(F.col("t").alias("ta"), F.col("e").alias("e_a"))
    eb = energy.select(F.col("t").alias("tb"), F.col("e").alias("e_b"))
    scored = (
        prods.join(ea, "ta")
        .join(eb, "tb")
        .withColumn(
            "key",
            F.expr(
                f"(CAST(sp AS DECIMAL(38,0)) * sp * {_Q230_SCALE})"
                " div (CAST(e_a AS DECIMAL(38,0)) * e_b)"
            ).cast("decimal(38,0)"),
        )
    )
    best = (
        scored.select(
            "ta",
            "tb",
            F.struct(
                F.col("key"),
                (-F.abs("lag")).alias("nal"),
                (-F.col("lag")).alias("nl"),
                F.col("lag").alias("lag"),
                F.col("sp").alias("sp"),
                F.col("n_overlap").alias("n_overlap"),
                F.col("e_a").alias("e_a"),
                F.col("e_b").alias("e_b"),
            ).alias("s"),
        )
        .groupBy("ta", "tb")
        .agg(F.max("s").alias("b"))
    )
    r6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / F.lit(1000000.0)
    return best.select(
        F.col("ta").alias("type_a"),
        F.col("tb").alias("type_b"),
        F.col("b.lag").cast("int").alias("best_lag_h"),
        F.col("b.n_overlap").alias("n_overlap_hours"),
        F.col("b.sp").alias("cross_product"),
        r6(
            F.col("b.sp").cast("double")
            / F.sqrt(F.col("b.e_a").cast("double") * F.col("b.e_b").cast("double"))
        ).alias("xcorr"),
    ).orderBy("type_a", "type_b")


Q230_SQL = f"""
WITH hourly AS (
    SELECT event_type AS t, date_trunc('hour', ts) AS h, count(*) AS c
    FROM events GROUP BY 1, 2
),
energy AS (SELECT t, CAST(sum(c * c) AS BIGINT) AS e FROM hourly GROUP BY 1),
prods AS (
    SELECT a.t AS ta, b.t AS tb, l.lag,
           CAST(sum(a.c * b.c) AS BIGINT) AS sp,
           CAST(count(*) AS BIGINT) AS n_overlap
    FROM hourly a
    CROSS JOIN unnest(range(-{_Q230_MAXLAG}, {_Q230_MAXLAG + 1})) AS l(lag)
    JOIN hourly b ON b.h = a.h + to_hours(l.lag) AND a.t < b.t
    GROUP BY 1, 2, 3
),
scored AS (
    SELECT p.*, ea.e AS e_a, eb.e AS e_b,
           (CAST(p.sp AS HUGEINT) * p.sp * {_Q230_SCALE})
               // (CAST(ea.e AS HUGEINT) * eb.e) AS key
    FROM prods p
    JOIN energy ea ON ea.t = p.ta
    JOIN energy eb ON eb.t = p.tb
),
best AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (
                      PARTITION BY ta, tb
                      ORDER BY key DESC, abs(lag), -lag DESC, lag
                  ) AS rn
        FROM scored
    ) x WHERE rn = 1
)
SELECT ta AS type_a, tb AS type_b,
       CAST(lag AS INTEGER) AS best_lag_h,
       n_overlap AS n_overlap_hours,
       sp AS cross_product,
       floor(CAST(sp AS DOUBLE) / sqrt(CAST(e_a AS DOUBLE) * e_b)
             * 1000000 + 0.5) / 1000000.0 AS xcorr
FROM best
ORDER BY type_a, type_b
"""


# ---------------------------------------------------------------------------
# q229 — concurrent-sessions gauge (ext): the capacity question every
# serving/ops dashboard asks — how many sessions were OPEN at once, per
# hour — answered with the classic ±1 boundary sweep made distributed:
# q21's sessions become (start, +1) / (end+gap, −1) boundary events,
# the running concurrency at every boundary is an EXCLUSIVE PREFIX SUM
# over global time order (the q116/q214 parallel-scan machinery — time-
# range blocks, recursive carry, NO corpus-wide window sort), and each
# hour reports its peak. Boundary ties break (ts, +1 before −1, sid) so
# a session ending exactly when another starts counts both — the
# convention is pinned in the oracle too.
# All-integer: µs timestamps, ±1 deltas, exact session ids.
# Scale: sessionization is per-user windows; the sweep's blocks are
# time ranges (row count per block bounded by arrival rate); the
# per-hour peak is one bounded groupBy.
# ---------------------------------------------------------------------------
_Q229_GAP_S = 1800


def q229_concurrency_gauge(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import exclusive_prefix_sum

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = (
        ev.select("user_id", "event_id", "ts")
        .withColumn("t_us", F.unix_micros("ts"))
        .withColumn(
            "is_new",
            F.when(
                F.lag("t_us").over(w).isNull()
                | (F.col("t_us") - F.lag("t_us").over(w) > _Q229_GAP_S * 1_000_000),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "sess",
            F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    sessions = marked.groupBy("user_id", "sess").agg(
        F.min("t_us").alias("s_us"),
        (F.max("t_us") + F.lit(_Q229_GAP_S * 1_000_000)).alias("e_us"),
    )
    # boundary stream: one +1 at start, one −1 at session end (+gap).
    # Order key packs (µs, start-before-end, session) into one integer
    # so the scan's order column is numeric and globally unique:
    # key = t_us·4 + (0 start | 1 end), tie-broken inside a block by
    # the window's (key, sid) order via a composite fractional id.
    bounds = sessions.select(
        F.col("s_us").alias("t_us"),
        F.lit(1).alias("delta"),
        (F.col("s_us") * 2).alias("ok"),
    ).unionByName(
        sessions.select(
            F.col("e_us").alias("t_us"),
            F.lit(-1).alias("delta"),
            (F.col("e_us") * 2 + 1).alias("ok"),
        )
    ).withColumn("_g", F.lit(0))
    pre = exclusive_prefix_sum(
        bounds, "_g", "ok", "delta", block_size=1 << 22
    )
    running = pre.withColumn("conc", F.col("_prefix") + F.col("delta"))
    return (
        running.filter(F.col("delta") == 1)
        .groupBy(
            F.expr("timestamp_micros(CAST(t_us div 3600000000 AS BIGINT)"
                   " * 3600000000)").alias("hour")
        )
        .agg(
            F.count("*").cast("long").alias("n_session_starts"),
            F.max("conc").cast("long").alias("peak_concurrency"),
        )
        .orderBy("hour")
    )


Q229_SQL = f"""
WITH marked AS (
    SELECT user_id, event_id, epoch_us(ts) AS t_us,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                     OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                        > {_Q229_GAP_S} * 1000000
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, t_us,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY t_us, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess
    FROM marked
),
sessions AS (
    SELECT user_id, sess, min(t_us) AS s_us,
           max(t_us) + {_Q229_GAP_S} * 1000000 AS e_us
    FROM sess GROUP BY 1, 2
),
bounds AS (
    SELECT s_us AS t_us, 1 AS delta, s_us * 2 AS ok FROM sessions
    UNION ALL
    SELECT e_us, -1, e_us * 2 + 1 FROM sessions
),
running AS (
    SELECT t_us, delta,
           sum(delta) OVER (ORDER BY ok ROWS UNBOUNDED PRECEDING) AS conc
    FROM bounds
)
SELECT make_timestamp((t_us // 3600000000) * 3600000000) AS hour,
       CAST(count(*) AS BIGINT) AS n_session_starts,
       CAST(max(conc) AS BIGINT) AS peak_concurrency
FROM running
WHERE delta = 1
GROUP BY 1
ORDER BY hour
"""


# ---------------------------------------------------------------------------
# q226 — single changepoint detection via binary segmentation (ext):
# for every event_type's daily-count series, the split t that maximizes
# the between-segment SSE reduction (the first step of binary
# segmentation / CUSUM-style monitoring — "did this metric's level
# shift, and when?"). The argmax is DETERMINISTIC: the objective
# SL²/nL + SR²/nR is evaluated as floor((SL²·nR + SR²·nL)·10¹² /
# (nL·nR)) in DECIMAL(38,0)/HUGEINT — identical integers on both
# engines — with earlier-day tie-break; only the display columns
# (segment means, SSE reduction) are floor-rounded doubles of exact
# integer sums.
# Scale: one corpus groupBy to daily grain; prefix sums are per-type
# windows over ≤ n_days rows; the candidate scan is the same bounded
# frame. Nothing rescans the corpus.
# ---------------------------------------------------------------------------
_Q226_SCALE = 10**12


def q226_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("t"), F.date_trunc("day", "ts").alias("day")
    ).agg(F.count("*").cast("long").alias("n"))
    w = (
        Window.partitionBy("t")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pre = daily.select(
        "t",
        "day",
        F.sum("n").over(w).alias("sl"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("ql"),
        F.row_number().over(Window.partitionBy("t").orderBy("day")).alias("rn"),
    )
    tot = daily.groupBy("t").agg(
        F.count("*").alias("d"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("q"),
    )
    cand = (
        pre.join(tot, "t")
        .filter(F.col("rn") < F.col("d"))
        .withColumn("nl", F.col("rn"))
        .withColumn("nr", F.col("d") - F.col("rn"))
        .withColumn("sr", F.col("s") - F.col("sl"))
        .withColumn(
            "h",
            F.expr(
                f"(CAST(sl AS DECIMAL(38,0)) * sl * nr"
                f" + CAST(sr AS DECIMAL(38,0)) * sr * nl)"
                f" * {_Q226_SCALE} div (nl * nr)"
            ),
        )
    )
    best = (
        cand.select(
            "t",
            "d",
            "s",
            "q",
            F.struct(
                F.col("h").alias("h"),
                (-F.unix_micros(F.col("day"))).alias("nd"),
                F.col("day").alias("day"),
                F.col("nl").alias("nl"),
                F.col("nr").alias("nr"),
                F.col("sl").alias("sl"),
                F.col("sr").alias("sr"),
                F.col("ql").alias("ql"),
            ).alias("c"),
        )
        .groupBy("t", "d", "s", "q")
        .agg(F.max("c").alias("b"))
    )
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)
    sse_tot = F.col("q").cast("double") - F.col("s").cast("double") * F.col(
        "s"
    ) / F.col("d")
    sse_split = (
        F.col("q").cast("double")
        - F.col("b.sl").cast("double") * F.col("b.sl") / F.col("b.nl")
        - F.col("b.sr").cast("double") * F.col("b.sr") / F.col("b.nr")
    )
    return best.select(
        F.col("t").alias("event_type"),
        F.col("b.day").alias("split_after_day"),
        F.col("b.nl").cast("long").alias("n_days_left"),
        F.col("b.nr").cast("long").alias("n_days_right"),
        r4(F.col("b.sl").cast("double") / F.col("b.nl")).alias("mean_left"),
        r4(F.col("b.sr").cast("double") / F.col("b.nr")).alias("mean_right"),
        (F.floor((sse_tot - sse_split) * 100 + F.lit(0.5)) / F.lit(100.0)).alias(
            "sse_reduction"
        ),
    ).orderBy("event_type")


Q226_SQL = f"""
WITH daily AS (
    SELECT event_type AS t, date_trunc('day', ts) AS day,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
),
pre AS (
    SELECT t, day,
           sum(n) OVER (PARTITION BY t ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS sl,
           sum(n * n) OVER (PARTITION BY t ORDER BY day
                            ROWS UNBOUNDED PRECEDING) AS ql,
           row_number() OVER (PARTITION BY t ORDER BY day) AS rn
    FROM daily
),
tot AS (SELECT t, count(*) AS d, sum(n) AS s, sum(n * n) AS q
        FROM daily GROUP BY 1),
cand AS (
    SELECT p.t, p.day, p.sl, p.ql, p.rn AS nl, tot.d - p.rn AS nr,
           tot.s - p.sl AS sr, tot.d, tot.s, tot.q,
           (CAST(p.sl AS HUGEINT) * p.sl * (tot.d - p.rn)
            + CAST(tot.s - p.sl AS HUGEINT) * (tot.s - p.sl) * p.rn)
           * {_Q226_SCALE} // (p.rn * (tot.d - p.rn)) AS h
    FROM pre p JOIN tot ON tot.t = p.t
    WHERE p.rn < tot.d
),
best AS (
    SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY t ORDER BY h DESC, day)
                      AS brk
        FROM cand
    ) x WHERE brk = 1
)
SELECT t AS event_type,
       day AS split_after_day,
       CAST(nl AS BIGINT) AS n_days_left,
       CAST(nr AS BIGINT) AS n_days_right,
       floor(CAST(sl AS DOUBLE) / nl * 10000 + 0.5) / 10000.0 AS mean_left,
       floor(CAST(sr AS DOUBLE) / nr * 10000 + 0.5) / 10000.0 AS mean_right,
       floor(((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * s / d)
              - (CAST(q AS DOUBLE)
                 - CAST(sl AS DOUBLE) * sl / nl
                 - CAST(sr AS DOUBLE) * sr / nr)) * 100 + 0.5) / 100.0
           AS sse_reduction
FROM best
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q228 — partition backfill planner (ext): the coverage audit an ingest
# operator actually pages on — which (event_type, hour) partitions are
# MISSING between the corpus's first and last hour, collapsed into
# contiguous backfill ranges (gaps-and-islands on the expected grid:
# generated hour sequence × types, anti-joined against presence, island
# key = hour# − row_number). Emits per-range rows (start/end/width) —
# the exact arguments a backfill job takes.
# Scale: presence is one corpus groupBy; the grid is |types|×|hours|
# (generated, bounded by the time span); islands windows run per type
# over ≤ |hours| rows.
# ---------------------------------------------------------------------------
def q228_backfill_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    present = ev.select(
        F.col("event_type").alias("t"), F.date_trunc("hour", "ts").alias("h")
    ).distinct().localCheckpoint(eager=False)  # feeds span + anti-join
    span = present.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = (
        present.select("t").distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "t",
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 hour"))
            ).alias("h"),
        )
    )
    missing = grid.join(present, ["t", "h"], "left_anti")
    w = Window.partitionBy("t").orderBy("h")
    isl = missing.withColumn(
        "island",
        F.expr("unix_micros(h) div 3600000000") - F.row_number().over(w),
    )
    return (
        isl.groupBy("t", "island")
        .agg(
            F.min("h").alias("gap_start"),
            F.max("h").alias("gap_end"),
            F.count("*").cast("long").alias("n_missing_hours"),
        )
        .select(
            F.col("t").alias("event_type"),
            "gap_start",
            "gap_end",
            "n_missing_hours",
        )
        .orderBy("event_type", "gap_start")
    )


Q228_SQL = """
WITH present AS (
    SELECT DISTINCT event_type AS t, date_trunc('hour', ts) AS h FROM events
),
span AS (SELECT min(h) AS lo, max(h) AS hi FROM present),
grid AS (
    SELECT ty.t, g.h
    FROM (SELECT DISTINCT t FROM present) ty
    CROSS JOIN span
    CROSS JOIN LATERAL unnest(generate_series(span.lo, span.hi,
                                              INTERVAL 1 HOUR)) AS g(h)
),
missing AS (
    SELECT g.t, g.h FROM grid g
    ANTI JOIN present p ON p.t = g.t AND p.h = g.h
),
isl AS (
    SELECT t, h,
           epoch_us(h) // 3600000000
           - row_number() OVER (PARTITION BY t ORDER BY h) AS island
    FROM missing
)
SELECT t AS event_type,
       min(h) AS gap_start,
       max(h) AS gap_end,
       CAST(count(*) AS BIGINT) AS n_missing_hours
FROM isl
GROUP BY t, island
ORDER BY event_type, gap_start
"""


# ---------------------------------------------------------------------------
# q222 — daily-periodicity score via lag-24h autocorrelation (ext): the
# temporal-pattern probe a behavioral pipeline runs per entity — does
# this user's hourly activity repeat on a 24h cycle? Scored as the raw
# (uncentered) autocorrelation Σ c_t·c_{t−24} / Σ c_t² over the user's
# hourly counts: exact integer dot products (a per-user self-join on
# hour+24h, both sides from ONE hourly rollup), one floor-rounded
# division at the end. Emits n_hours/n_lag_pairs so sparse users are
# interpretable; users with zero 24h-aligned pairs score 0 by
# definition (LEFT join keeps them — absence of evidence is a row, not
# a dropped entity).
# Scale: one corpus groupBy to (user, hour); the lag join is per-user
# on an equi-key (user, hour) — no window, no corpus re-scan.
# ---------------------------------------------------------------------------
_Q222_LAG_H = 24


def q222_periodicity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(
            F.col("user_id").alias("u"),
            F.date_trunc("hour", "ts").alias("h"),
        )
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=False)  # feeds both sides of the lag join
    )
    base = hourly.groupBy("u").agg(
        F.count("*").cast("long").alias("n_hours"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    lagged = hourly.select(
        "u",
        (F.col("h") + F.expr(f"make_interval(0, 0, 0, 0, {_Q222_LAG_H})")).alias(
            "h"
        ),
        F.col("c").alias("c_prev"),
    )
    cross = (
        hourly.join(lagged, ["u", "h"])
        .groupBy("u")
        .agg(
            F.count("*").cast("long").alias("n_lag_pairs"),
            F.sum(F.col("c") * F.col("c_prev")).cast("long").alias("sp"),
        )
    )
    return (
        base.join(cross, "u", "left")
        .select(
            F.col("u").cast("long").alias("user_id"),
            "n_hours",
            F.coalesce("n_lag_pairs", F.lit(0)).cast("long").alias("n_lag_pairs"),
            (
                F.floor(
                    F.coalesce("sp", F.lit(0)).cast("double")
                    / F.col("ss")
                    * 1000000
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("periodicity"),
        )
        .orderBy("user_id")
    )


Q222_SQL = f"""
WITH hourly AS (
    SELECT user_id AS u, date_trunc('hour', ts) AS h, count(*) AS c
    FROM events GROUP BY 1, 2
),
base AS (
    SELECT u, CAST(count(*) AS BIGINT) AS n_hours,
           CAST(sum(c * c) AS BIGINT) AS ss
    FROM hourly GROUP BY 1
),
crossed AS (
    SELECT a.u, CAST(count(*) AS BIGINT) AS n_lag_pairs,
           CAST(sum(a.c * b.c) AS BIGINT) AS sp
    FROM hourly a
    JOIN hourly b ON b.u = a.u
                 AND b.h + INTERVAL {_Q222_LAG_H} HOUR = a.h
    GROUP BY 1
)
SELECT CAST(base.u AS BIGINT) AS user_id,
       base.n_hours,
       coalesce(c.n_lag_pairs, 0) AS n_lag_pairs,
       floor(CAST(coalesce(c.sp, 0) AS DOUBLE) / base.ss * 1000000 + 0.5)
           / 1000000.0 AS periodicity
FROM base LEFT JOIN crossed c ON c.u = base.u
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# q223 — cohort LTV curves (ext): q71 counts retention; revenue teams
# need the MONEY version — per signup cohort (first-activity week),
# cumulative purchase value by cohort age in weeks, per-user LTV, and
# the completeness caveat a real dashboard carries (younger cohorts
# have fewer observable weeks — emitted as max_age so no one reads a
# short curve as churn). Cent-exact DECIMAL/HUGEINT sums; the
# cumulative runs over ≤ n_weeks rows per cohort (bounded partitions).
# Scale: one corpus groupBy to (cohort, age) cells after a per-user
# min-ts rollup + join on user — the funnel-family shuffle shape.
# ---------------------------------------------------------------------------
def q223_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    cells = (
        ev.filter(F.col("event_type") == "purchase")
        .join(first, "user_id")
        .select(
            "cohort",
            F.floor(
                F.datediff(F.date_trunc("week", "ts"), F.col("cohort")) / 7
            )
            .cast("long")
            .alias("age_w"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("decimal(38,0)")
            .alias("cents"),
        )
        .groupBy("cohort", "age_w")
        .agg(F.sum("cents").alias("wc"), F.count("*").alias("n_purchases"))
    )
    sizes = first.groupBy("cohort").agg(
        F.count("*").cast("long").alias("cohort_users")
    )
    wcum = (
        Window.partitionBy("cohort")
        .orderBy("age_w")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cells.withColumn("cum_cents", F.sum("wc").over(wcum)).withColumn(
        "max_age", F.max("age_w").over(Window.partitionBy("cohort"))
    )
    return (
        cum.join(sizes, "cohort")
        .select(
            "cohort",
            F.col("age_w").cast("long").alias("age_w"),
            F.col("max_age").cast("long").alias("max_age"),
            "cohort_users",
            F.col("n_purchases").cast("long").alias("n_purchases"),
            (F.col("cum_cents").cast("double") / F.lit(100.0)).alias(
                "cum_revenue"
            ),
            (
                F.floor(
                    F.col("cum_cents").cast("double")
                    / F.col("cohort_users")
                    / F.lit(100.0)
                    * 10000
                    + F.lit(0.5)
                )
                / F.lit(10000.0)
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort", "age_w")
    )


Q223_SQL = """
WITH first_ AS (
    SELECT user_id, date_trunc('week', min(ts)) AS cohort
    FROM events GROUP BY 1
),
cells AS (
    SELECT f.cohort,
           CAST(floor(date_diff('day', f.cohort,
                                date_trunc('week', e.ts)) / 7.0) AS BIGINT)
               AS age_w,
           sum(CAST(floor(e.value * 100 + 0.5) AS HUGEINT)) AS wc,
           count(*) AS n_purchases
    FROM events e JOIN first_ f ON f.user_id = e.user_id
    WHERE e.event_type = 'purchase'
    GROUP BY 1, 2
),
sizes AS (
    SELECT cohort, CAST(count(*) AS BIGINT) AS cohort_users
    FROM first_ GROUP BY 1
),
cum AS (
    SELECT cohort, age_w, n_purchases,
           sum(wc) OVER (PARTITION BY cohort ORDER BY age_w
                         ROWS UNBOUNDED PRECEDING) AS cum_cents,
           max(age_w) OVER (PARTITION BY cohort) AS max_age
    FROM cells
)
SELECT c.cohort,
       c.age_w,
       CAST(c.max_age AS BIGINT) AS max_age,
       s.cohort_users,
       CAST(c.n_purchases AS BIGINT) AS n_purchases,
       CAST(c.cum_cents AS DOUBLE) / 100.0 AS cum_revenue,
       floor(CAST(c.cum_cents AS DOUBLE) / s.cohort_users / 100.0 * 10000
             + 0.5) / 10000.0 AS ltv_per_user
FROM cum c JOIN sizes s USING (cohort)
ORDER BY cohort, age_w
"""


# ---------------------------------------------------------------------------
# q218 — time-weighted average over irregular samples (ext): the
# hypertable aggregate plain AVG gets WRONG on unevenly-sampled series
# (TimescaleDB's time_weight, LOCF semantics): each observation holds
# its value until the next one, so its weight is the gap to the next
# sample — the last sample runs to the corpus-wide horizon max(ts)
# (data-derived, no wall clock). twa = Σ(value_cents · gap_µs) /
# Σ(gap_µs), both sums exact in DECIMAL(38,0)/HUGEINT (cents × µs
# products reach ~10²³ at sf0.1 — far past int64, exactly why the
# 128-bit lane exists). The plain mean ships alongside so the
# irregular-sampling bias is a visible column.
# Scale: one lead() window per user (the series' natural key, bounded
# partitions), one corpus-wide 1-row horizon agg broadcast back.
# ---------------------------------------------------------------------------
def q218_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    horizon = ev.agg(F.max(F.unix_micros("ts")).alias("h_us"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    obs = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.unix_micros("ts").alias("t_us"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
        )
        .withColumn("nxt", F.lead("t_us").over(w))
        .crossJoin(F.broadcast(horizon))
        .withColumn("gap", F.coalesce("nxt", "h_us") - F.col("t_us"))
    )
    agg = obs.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_obs"),
        F.sum(F.col("cents").cast("decimal(38,0)") * F.col("gap")).alias("swv"),
        F.sum(F.col("gap").cast("decimal(38,0)")).alias("sw"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("sc"),
    )
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)
    return agg.select(
        F.col("user_id").cast("long").alias("user_id"),
        "n_obs",
        F.col("sw").cast("double").alias("span_us"),
        r4(
            F.col("swv").cast("double") / F.col("sw").cast("double") / F.lit(100.0)
        ).alias("time_weighted_avg"),
        r4(
            F.col("sc").cast("double") / F.col("n_obs") / F.lit(100.0)
        ).alias("plain_avg"),
    ).orderBy("user_id")


Q218_SQL = """
WITH horizon AS (SELECT max(epoch_us(ts)) AS h_us FROM events),
obs AS (
    SELECT user_id,
           epoch_us(ts) AS t_us,
           CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS nxt
    FROM events
),
agg AS (
    SELECT o.user_id,
           count(*) AS n_obs,
           sum(CAST(o.cents AS HUGEINT) * (coalesce(o.nxt, h.h_us) - o.t_us))
               AS swv,
           sum(CAST(coalesce(o.nxt, h.h_us) - o.t_us AS HUGEINT)) AS sw,
           sum(CAST(o.cents AS HUGEINT)) AS sc
    FROM obs o CROSS JOIN horizon h
    GROUP BY o.user_id
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(n_obs AS BIGINT) AS n_obs,
       CAST(sw AS DOUBLE) AS span_us,
       floor(CAST(swv AS DOUBLE) / CAST(sw AS DOUBLE) / 100.0 * 10000 + 0.5)
           / 10000.0 AS time_weighted_avg,
       floor(CAST(sc AS DOUBLE) / n_obs / 100.0 * 10000 + 0.5) / 10000.0
           AS plain_avg
FROM agg
ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# q217 — as-of join MODE bake-off: backward / forward / nearest with
# tolerance (ext): q59 certifies the backward as-of; real time-series
# stores (and pandas merge_asof) expose direction and tolerance as
# knobs. One ±tolerance candidate build (the q62 bin trick, extended to
# THREE bins so both directions land in one equi-join — never a range
# scan), then each mode is a deterministic argmin over the same
# candidates: backward = min (gap, click_id) among gap ≥ 0; forward =
# min (−gap, click_id) among gap ≤ 0; nearest = min (|gap|,
# backward-preference, click_id). Output is the per-mode audit row
# (match counts/rate, exact Σ|gap| in ms, and a matched-click-id
# checksum that pins the exact assignment), not corpus-sized pairs.
# All-integer microseconds; ties break on event ids.
# Scale: one exploded equi-join on (user, bin) — candidates bounded by
# ±1 bin; three map-side-combinable argmin aggregations; no windows.
# ---------------------------------------------------------------------------
_Q217_TOL_S = 600  # ± tolerance, seconds


def q217_asof_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w_us = _Q217_TOL_S * 1_000_000
    err = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("event_id").alias("err_id"),
        F.unix_micros("ts").alias("e_us"),
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("clk_id"),
        F.unix_micros("ts").alias("c_us"),
    ).withColumn("_bin", F.expr(f"c_us div {w_us}"))
    e3 = err.withColumn("_eb", F.expr(f"e_us div {w_us}")).withColumn(
        "_bin",
        F.explode(F.array(F.col("_eb") - 1, F.col("_eb"), F.col("_eb") + 1)),
    ).drop("_eb")
    cands = (
        e3.join(clk, ["user_id", "_bin"])
        .withColumn("gap", F.col("e_us") - F.col("c_us"))
        .filter(F.abs("gap") <= w_us)
        .select("err_id", "clk_id", "gap")
        .localCheckpoint(eager=False)  # three mode argmins rescan this
    )
    n_err = err.agg(F.count("*").alias("n_errors"))

    def mode_row(name: str, picked: DataFrame) -> DataFrame:
        return (
            picked.agg(
                F.count("*").cast("long").alias("n_matched"),
                F.sum(F.expr("abs(gap) div 1000"))
                .cast("long")
                .alias("sum_abs_gap_ms"),
                F.sum(F.col("clk_id").cast("decimal(38,0)"))
                .cast("double")
                .alias("clk_id_checksum"),
            )
            .crossJoin(F.broadcast(n_err))
            .select(
                F.lit(name).alias("mode"),
                F.col("n_errors").cast("long").alias("n_errors"),
                "n_matched",
                (
                    F.floor(
                        F.col("n_matched").cast("double") / F.col("n_errors")
                        * 1000000
                        + F.lit(0.5)
                    )
                    / F.lit(1000000.0)
                ).alias("match_rate"),
                "sum_abs_gap_ms",
                "clk_id_checksum",
            )
        )

    def argmin(df: DataFrame, key) -> DataFrame:
        return (
            df.select("err_id", key.alias("ky"), "gap", "clk_id")
            .groupBy("err_id")
            .agg(F.min(F.struct("ky", "gap", "clk_id")).alias("b"))
            .select("err_id", F.col("b.gap").alias("gap"), F.col("b.clk_id").alias("clk_id"))
        )

    back = argmin(
        cands.filter(F.col("gap") >= 0), F.struct(F.col("gap"), F.col("clk_id"))
    )
    fwd = argmin(
        cands.filter(F.col("gap") <= 0),
        F.struct((-F.col("gap")).alias("ng"), F.col("clk_id")),
    )
    near = argmin(
        cands,
        F.struct(
            F.abs("gap").alias("ag"),
            F.when(F.col("gap") >= 0, 0).otherwise(1).alias("pref"),
            F.col("clk_id"),
        ),
    )
    return (
        mode_row("backward", back)
        .unionByName(mode_row("forward", fwd))
        .unionByName(mode_row("nearest", near))
        .orderBy("mode")
    )


Q217_SQL = f"""
WITH err AS (
    SELECT user_id, event_id AS err_id, epoch_us(ts) AS e_us
    FROM events WHERE event_type = 'error'
),
clk AS (
    SELECT user_id, event_id AS clk_id, epoch_us(ts) AS c_us
    FROM events WHERE event_type = 'click'
),
cands AS (
    SELECT e.err_id, c.clk_id, e.e_us - c.c_us AS gap
    FROM err e JOIN clk c
      ON c.user_id = e.user_id
     AND abs(e.e_us - c.c_us) <= {_Q217_TOL_S * 1_000_000}
),
n_err AS (SELECT count(*) AS n_errors FROM err),
back AS (
    SELECT err_id, gap, clk_id FROM (
        SELECT err_id, gap, clk_id,
               row_number() OVER (PARTITION BY err_id
                                  ORDER BY gap, clk_id) AS rn
        FROM cands WHERE gap >= 0
    ) t WHERE rn = 1
),
fwd AS (
    SELECT err_id, gap, clk_id FROM (
        SELECT err_id, gap, clk_id,
               row_number() OVER (PARTITION BY err_id
                                  ORDER BY -gap, clk_id) AS rn
        FROM cands WHERE gap <= 0
    ) t WHERE rn = 1
),
near AS (
    SELECT err_id, gap, clk_id FROM (
        SELECT err_id, gap, clk_id,
               row_number() OVER (PARTITION BY err_id
                                  ORDER BY abs(gap),
                                           CASE WHEN gap >= 0 THEN 0 ELSE 1 END,
                                           clk_id) AS rn
        FROM cands
    ) t WHERE rn = 1
)
{" UNION ALL ".join(
    f'''SELECT '{m}' AS mode,
       CAST(n.n_errors AS BIGINT) AS n_errors,
       CAST(count(p.err_id) AS BIGINT) AS n_matched,
       floor(CAST(count(p.err_id) AS DOUBLE) / n.n_errors * 1000000 + 0.5)
           / 1000000.0 AS match_rate,
       CAST(sum(abs(p.gap) // 1000) AS BIGINT) AS sum_abs_gap_ms,
       CAST(sum(CAST(p.clk_id AS HUGEINT)) AS DOUBLE) AS clk_id_checksum
FROM {cte} p CROSS JOIN n_err n
GROUP BY n.n_errors'''
    for m, cte in (("backward", "back"), ("forward", "fwd"), ("nearest", "near"))
)}
ORDER BY mode
"""


# ---------------------------------------------------------------------------
# q214 — event-time disorder profile (ext): the measurement that SETS a
# streaming watermark instead of guessing it — for every event, its
# lateness relative to the max event-time already seen in arrival order
# (event_id is the arrival proxy in this synthetic feed; a real ingest
# would use the log offset), i.e. an exclusive running MAX over the
# whole corpus. The scan that makes this scale is the point:
# `exclusive_prefix_max` (operators/skew.py) — per-block maxima, a
# recursive carry over block maxima, in-block prefixes — so NO
# corpus-wide window sort ever runs (the q116 parallel-scan discipline
# applied to the max monoid). Lateness lands in minute buckets
# (time-range-bounded domain) read back at p50/p95/p99 by the exact
# ceil-rank rule, with the on-time share alongside — the row a platform
# turns into `withWatermark(ts, <p99>)`.
# All-integer: microsecond arithmetic, floor division to seconds and
# minute buckets, one floor-rounded share.
# ---------------------------------------------------------------------------
_Q214_PCTS = (50, 95, 99)


def q214_disorder_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import exclusive_prefix_max

    ev = load(spark, sf_dir, "events").select(
        "event_id", F.unix_micros("ts").alias("ts_us")
    ).withColumn("_g", F.lit(0))
    pm = exclusive_prefix_max(ev, "_g", "event_id", "ts_us")
    late = pm.select(
        (
            F.expr("greatest(coalesce(_pmax - ts_us, 0), 0) div 1000000")
        ).alias("late_s")
    )
    digest = late.groupBy(
        F.expr("late_s div 60").alias("bucket")
    ).agg(
        F.count("*").alias("c"),
        F.sum(F.when(F.col("late_s") == 0, 1).otherwise(0)).alias("c_ontime"),
    ).localCheckpoint(eager=False)  # feeds cum + totals
    wcum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = digest.withColumn("cum", F.sum("c").over(wcum))
    tot = digest.agg(
        F.sum("c").alias("n_events"), F.sum("c_ontime").alias("n_ontime")
    )
    tgt = tot.select(
        "n_events",
        "n_ontime",
        F.explode(F.array(*[F.lit(p) for p in _Q214_PCTS])).alias("pct"),
    ).withColumn("r", F.expr("(n_events * pct + 99) div 100"))
    return (
        tgt.join(cum, F.col("cum") >= F.col("r"))
        .groupBy("pct", "n_events", "n_ontime")
        .agg(F.min("bucket").alias("b"))
        .select(
            F.col("pct").cast("int").alias("pct"),
            (F.col("b") * 60).cast("long").alias("late_sec_lo"),
            ((F.col("b") + 1) * 60).cast("long").alias("late_sec_hi"),
            F.col("n_events").cast("long").alias("n_events"),
            F.col("n_ontime").cast("long").alias("n_ontime"),
            (
                F.floor(
                    F.col("n_ontime").cast("double") / F.col("n_events")
                    * 1000000
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("share_ontime"),
        )
        .orderBy("pct")
    )


Q214_SQL = f"""
WITH pm AS (
    SELECT epoch_us(ts) AS ts_us,
           max(epoch_us(ts)) OVER (ORDER BY event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS pmax
    FROM events
),
late AS (
    SELECT greatest(coalesce(pmax - ts_us, 0), 0) // 1000000 AS late_s
    FROM pm
),
digest AS (
    SELECT late_s // 60 AS bucket, count(*) AS c,
           sum(CASE WHEN late_s = 0 THEN 1 ELSE 0 END) AS c_ontime
    FROM late GROUP BY 1
),
cum AS (
    SELECT bucket, sum(c) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
               AS cum
    FROM digest
),
tot AS (SELECT sum(c) AS n_events, sum(c_ontime) AS n_ontime FROM digest),
tgt AS (
    SELECT n_events, n_ontime, p.pct,
           (n_events * p.pct + 99) // 100 AS r
    FROM tot, unnest([{", ".join(str(p) for p in _Q214_PCTS)}]) AS p(pct)
)
SELECT CAST(t.pct AS INTEGER) AS pct,
       CAST(min(c.bucket) * 60 AS BIGINT) AS late_sec_lo,
       CAST((min(c.bucket) + 1) * 60 AS BIGINT) AS late_sec_hi,
       CAST(t.n_events AS BIGINT) AS n_events,
       CAST(t.n_ontime AS BIGINT) AS n_ontime,
       floor(CAST(t.n_ontime AS DOUBLE) / t.n_events * 1000000 + 0.5)
           / 1000000.0 AS share_ontime
FROM tgt t JOIN cum c ON c.cum >= t.r
GROUP BY t.pct, t.n_events, t.n_ontime
ORDER BY pct
"""


# ---------------------------------------------------------------------------
# q206 — session path mining (ext): the top navigation paths a product
# analytics pipeline extracts from raw events — q21's sessionization
# rule (30-min inactivity gap, (ts, event_id) total order) followed by
# each session's first-5 event-type sequence, rolled up to the top-10
# paths with their session share. The collect step is ordering-proof:
# (rank, type) structs are array_sort-ed before joining, so the path
# string never depends on aggregation order (the Spark twin of
# string_agg ... ORDER BY).
# Scale: sessionization is per-user windows (the key the data is
# naturally about); the path rollup is one groupBy over one row per
# session; top-10 is TakeOrdered with a path tie-break. Nothing
# re-scans the corpus.
# ---------------------------------------------------------------------------
_Q206_GAP_S = 1800
_Q206_PLEN = 5
_Q206_TOPK = 10


def q206_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        ev.select("user_id", "event_id", "ts", "event_type")
        .withColumn(
            "is_new",
            F.when(
                F.lag("ts").over(w).isNull()
                | (
                    F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
                    > _Q206_GAP_S * 1_000_000
                ),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "sess",
            F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    ws = Window.partitionBy("user_id", "sess").orderBy("ts", "event_id")
    paths = (
        sess.withColumn("rn", F.row_number().over(ws))
        .filter(F.col("rn") <= _Q206_PLEN)
        .groupBy("user_id", "sess")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    counts = paths.groupBy("path").agg(F.count("*").alias("n_sessions"))
    tot = counts.agg(F.sum("n_sessions").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(_Q206_TOPK)
        .select(
            "path",
            F.col("n_sessions").cast("long").alias("n_sessions"),
            (
                F.floor(
                    F.col("n_sessions").cast("double") / F.col("n_total")
                    * 1000000
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("share"),
        )
    )


Q206_SQL = f"""
WITH marked AS (
    SELECT user_id, event_id, ts, event_type,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                        > {_Q206_GAP_S} * 1000000
                THEN 1 ELSE 0 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
    SELECT user_id, event_id, ts, event_type,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess
    FROM marked
),
numbered AS (
    SELECT user_id, sess, event_type,
           row_number() OVER (PARTITION BY user_id, sess
                              ORDER BY ts, event_id) AS rn
    FROM sess
),
paths AS (
    SELECT user_id, sess,
           string_agg(event_type, '>' ORDER BY rn) AS path
    FROM numbered WHERE rn <= {_Q206_PLEN}
    GROUP BY user_id, sess
),
counts AS (SELECT path, count(*) AS n_sessions FROM paths GROUP BY 1),
tot AS (SELECT sum(n_sessions) AS n_total FROM counts)
SELECT c.path,
       CAST(c.n_sessions AS BIGINT) AS n_sessions,
       floor(CAST(c.n_sessions AS DOUBLE) / t.n_total * 1000000 + 0.5)
           / 1000000.0 AS share
FROM counts c CROSS JOIN tot t
ORDER BY c.n_sessions DESC, c.path
LIMIT {_Q206_TOPK}
"""


# ---------------------------------------------------------------------------
# q203 — funnel time-to-convert percentiles via mergeable grid digest
# (ext): q70 answers WHO converts; this answers HOW FAST — per user the
# first signup→first subsequent purchase latency, rolled into the q138
# fixed-grid digest (hour-wide buckets) and read back at p50/p90/p99
# with the exact integer rank rule r = ⌈n·pct/100⌉. The digest shape is
# the point: per-shard hourly histograms MERGE by addition, so at
# 100 TB the latency profile accumulates incrementally instead of
# re-sorting every conversion ever seen. Latency is exact integer
# microseconds (unix_micros/epoch_us on both engines) floored to
# seconds — no float time math; conversion rate is one floor-rounded
# division.
# Scale: two type-filtered corpus groupBys on user_id + one join on
# user_id (the funnel's natural key), then a ≤ (max-latency/3600)-row
# digest; the cumulative window is over that value-domain-bounded frame
# (pinned in tests/test_plan_budget.py), percentile probes are a 3-row
# literal frame joined against it.
# ---------------------------------------------------------------------------
_Q203_W = 3600                 # digest bucket width, seconds
_Q203_PCTS = (50, 90, 99)


def q203_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("s_us"))
        .localCheckpoint(eager=False)  # feeds conversion join + n_signups
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", F.unix_micros("ts").alias("p_us"))
        .join(s, "user_id")
        .filter(F.col("p_us") >= F.col("s_us"))
        .groupBy("user_id")
        .agg(F.min("p_us").alias("first_p"), F.min("s_us").alias("s_us"))
        .select(
            F.expr(f"((first_p - s_us) div 1000000) div {_Q203_W}").alias(
                "bucket"
            )
        )
    )
    digest = conv.groupBy("bucket").agg(F.count("*").alias("cnt"))
    wcum = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = digest.withColumn("cum", F.sum("cnt").over(wcum))
    counts = (
        s.agg(F.count("*").alias("n_signups"))
        .crossJoin(digest.agg(F.sum("cnt").cast("long").alias("n_converted")))
    )
    tgt = (
        counts.select(
            "n_signups",
            "n_converted",
            F.explode(
                F.array(*[F.lit(p) for p in _Q203_PCTS])
            ).alias("pct"),
        )
        .withColumn("r", F.expr("(n_converted * pct + 99) div 100"))
    )
    return (
        tgt.join(cum, F.col("cum") >= F.col("r"))
        .groupBy("pct", "n_signups", "n_converted")
        .agg(F.min("bucket").alias("b"))
        .select(
            F.col("pct").cast("int").alias("pct"),
            F.col("n_signups").cast("long").alias("n_signups"),
            "n_converted",
            (
                F.floor(
                    F.col("n_converted").cast("double")
                    / F.col("n_signups")
                    * 1000000
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("conv_rate"),
            (F.col("b") * _Q203_W).cast("long").alias("sec_lo"),
            ((F.col("b") + 1) * _Q203_W).cast("long").alias("sec_hi"),
        )
        .orderBy("pct")
    )


Q203_SQL = f"""
WITH s AS (
    SELECT user_id, min(epoch_us(ts)) AS s_us
    FROM events WHERE event_type = 'signup' GROUP BY 1
),
conv AS (
    SELECT ((min(p.p_us) - min(s.s_us)) // 1000000) // {_Q203_W} AS bucket
    FROM (SELECT user_id, epoch_us(ts) AS p_us
          FROM events WHERE event_type = 'purchase') p
    JOIN s ON s.user_id = p.user_id
    WHERE p.p_us >= s.s_us
    GROUP BY p.user_id
),
digest AS (SELECT bucket, count(*) AS cnt FROM conv GROUP BY 1),
cum AS (
    SELECT bucket, sum(cnt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
               AS cum
    FROM digest
),
counts AS (
    SELECT (SELECT count(*) FROM s) AS n_signups,
           (SELECT CAST(sum(cnt) AS BIGINT) FROM digest) AS n_converted
),
tgt AS (
    SELECT n_signups, n_converted, t.pct,
           (n_converted * t.pct + 99) // 100 AS r
    FROM counts, unnest([{", ".join(str(p) for p in _Q203_PCTS)}]) AS t(pct)
)
SELECT CAST(t.pct AS INTEGER) AS pct,
       CAST(t.n_signups AS BIGINT) AS n_signups,
       t.n_converted,
       floor(CAST(t.n_converted AS DOUBLE) / t.n_signups * 1000000 + 0.5)
           / 1000000.0 AS conv_rate,
       CAST(min(c.bucket) * {_Q203_W} AS BIGINT) AS sec_lo,
       CAST((min(c.bucket) + 1) * {_Q203_W} AS BIGINT) AS sec_hi
FROM tgt t JOIN cum c ON c.cum >= t.r
GROUP BY t.pct, t.n_signups, t.n_converted
ORDER BY pct
"""


# ---------------------------------------------------------------------------
# q234 — Kaplan–Meier survival + Nelson–Aalen hazard (ext): the
# right-censoring-aware lifetime readout the retention family
# (q71/q223/q232) approximates away — "what share of customers is
# still ordering after t days" is BIASED if customers active at the
# observation edge are counted as churned. Per customer: customers
# whose last order falls within the final CENS_DAYS of the data are
# CENSORED (still alive at cut), not churned; a churned customer's
# lifetime t = days between first and last order, while a censored
# customer is at risk until the OBSERVATION CUT, t = days between
# first order and dmax (the textbook right-censoring convention —
# censoring at last activity would understate time-at-risk and bias
# the curve low in the tail; round-8 ADVICE fix). Classic KM:
# at each distinct lifetime, risk set n_t = N − (churned+censored
# earlier), S(t) = Π(1 − d/n) over event times ≤ t (censored rows are
# at risk for same-day deaths, the standard convention), Nelson–Aalen
# H(t) = Σ d/n. Scale: the corpus collapses to one per-user rollup,
# then to a lifetime-domain rollup BOUNDED by the observation window's
# day count — the two ORDER-BY-only windows below run over that
# domain-bounded frame (pinned in tests/test_plan_budget.py). The
# Π is exp(Σ ln·) over an ordered frame (deterministic sequential
# accumulation on both engines, q102's float caveat), with the
# everyone-dead prefix flagged exactly so ln(0) never evaluates.
# ---------------------------------------------------------------------------
_Q234_CENS_DAYS = 365  # last order within the final year => censored


def q234_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    span = orders.agg(F.date_trunc("day", F.max("o_orderdate")).alias("dmax"))
    users = orders.groupBy("o_custkey").agg(
        F.date_trunc("day", F.min("o_orderdate")).alias("d0"),
        F.date_trunc("day", F.max("o_orderdate")).alias("d1"),
    )
    is_cens = F.datediff("dmax", "d1") < _Q234_CENS_DAYS
    lives = users.crossJoin(F.broadcast(span)).select(
        F.when(is_cens, F.datediff("dmax", "d0"))
        .otherwise(F.datediff("d1", "d0"))
        .alias("t"),
        is_cens.cast("int").alias("cens"),
    )
    cells = (
        lives.groupBy("t")
        .agg(
            F.sum(1 - F.col("cens")).cast("long").alias("d"),
            F.sum("cens").cast("long").alias("c"),
        )
        .localCheckpoint(eager=False)  # feeds risk-set scan + totals
    )
    tot = cells.agg(F.sum(F.col("d") + F.col("c")).cast("long").alias("n_users"))
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_incl = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risked = cells.crossJoin(F.broadcast(tot)).withColumn(
        "n_risk",
        F.col("n_users")
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    )
    scanned = risked.select(
        "t",
        "n_risk",
        "d",
        "c",
        F.max((F.col("d") == F.col("n_risk")).cast("int")).over(w_incl).alias("dead"),
        F.sum(
            F.when(
                F.col("d") < F.col("n_risk"),
                F.log(
                    (F.col("n_risk") - F.col("d")).cast("double")
                    / F.col("n_risk").cast("double")
                ),
            ).otherwise(F.lit(0.0))
        )
        .over(w_incl)
        .alias("s_ln"),
        F.sum(F.col("d").cast("double") / F.col("n_risk").cast("double"))
        .over(w_incl)
        .alias("haz"),
    )
    r6 = lambda col: F.floor(col * 1000000 + F.lit(0.5)) / F.lit(1000000.0)
    return scanned.select(
        F.col("t").cast("int").alias("t_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").alias("d_churned"),
        F.col("c").alias("c_censored"),
        F.when(F.col("dead") == 1, F.lit(0.0))
        .otherwise(r6(F.exp("s_ln")))
        .alias("survival"),
        r6(F.col("haz")).alias("cum_hazard"),
    ).orderBy("t_days")


Q234_SQL = f"""
WITH span AS (
    SELECT date_trunc('day', max(o_orderdate)) AS dmax FROM orders
),
users AS (
    SELECT o_custkey, date_trunc('day', min(o_orderdate)) AS d0,
           date_trunc('day', max(o_orderdate)) AS d1
    FROM orders GROUP BY 1
),
lives AS (
    SELECT CASE WHEN date_diff('day', u.d1, s.dmax) < {_Q234_CENS_DAYS}
                THEN date_diff('day', u.d0, s.dmax)
                ELSE date_diff('day', u.d0, u.d1) END AS t,
           CASE WHEN date_diff('day', u.d1, s.dmax) < {_Q234_CENS_DAYS}
                THEN 1 ELSE 0 END AS cens
    FROM users u CROSS JOIN span s
),
cells AS (
    SELECT t, CAST(sum(1 - cens) AS BIGINT) AS d,
           CAST(sum(cens) AS BIGINT) AS c
    FROM lives GROUP BY 1
),
tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n_users FROM cells),
risked AS (
    SELECT cells.t, cells.d, cells.c,
           tot.n_users
           - coalesce(sum(cells.d + cells.c) OVER (ORDER BY cells.t
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
    FROM cells CROSS JOIN tot
),
scanned AS (
    SELECT t, n_risk, d, c,
           max(CASE WHEN d = n_risk THEN 1 ELSE 0 END)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS dead,
           sum(CASE WHEN d < n_risk
                    THEN ln(CAST(n_risk - d AS DOUBLE)
                            / CAST(n_risk AS DOUBLE))
                    ELSE 0.0 END)
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS s_ln,
           sum(CAST(d AS DOUBLE) / CAST(n_risk AS DOUBLE))
               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS haz
    FROM risked
)
SELECT CAST(t AS INTEGER) AS t_days,
       CAST(n_risk AS BIGINT) AS n_risk,
       d AS d_churned,
       c AS c_censored,
       CASE WHEN dead = 1 THEN 0.0
            ELSE floor(exp(s_ln) * 1000000 + 0.5) / 1000000.0 END
           AS survival,
       floor(haz * 1000000 + 0.5) / 1000000.0 AS cum_hazard
FROM scanned
ORDER BY t_days
"""


# ---------------------------------------------------------------------------
# q238 — Theil–Sen robust slope vs OLS (ext): the robust-regression
# member the trend family lacks — q87's daily trend and q183's OLS
# slopes are L2 (one outlier day drags the fit); Theil–Sen (median of
# all pairwise slopes) has a 29% breakdown point and is the standard
# robust daily-trend readout. Scale shape: the corpus collapses to a
# per-(type, day) rollup FIRST — the all-pairs step runs on ≤
# observation-window-days rows per type (≤465 pairs for a month),
# bounded by construction, never on raw events. Slopes are exact
# count/day-delta ratios (each engine computes the identical double
# set); the median is Spark's exact `percentile` ↔ DuckDB's
# `quantile_cont` (selection + one interpolation, no accumulation).
# OLS slope ships alongside from exact integer sums — the robust-vs-L2
# gap IS the readout.
# ---------------------------------------------------------------------------
def q238_theilsen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    anchor = ev.agg(F.date_trunc("day", F.min("ts")).alias("d0"))
    daily = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(F.date_trunc("day", "ts"), F.col("d0")).alias("x"),
        )
        .agg(F.count("*").alias("y"))
        .localCheckpoint(eager=False)  # feeds pair join + OLS moments
    )
    pairs = daily.alias("a").join(
        daily.alias("b"),
        (F.col("a.t") == F.col("b.t")) & (F.col("b.x") > F.col("a.x")),
    ).select(
        F.col("a.t").alias("t"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x")).cast("double")
        ).alias("slope"),
    )
    ts = pairs.groupBy("t").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.expr("percentile(slope, 0.5)").alias("ts_slope"),
    )
    ols = daily.groupBy("t").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    r6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / F.lit(1000000.0)
    return (
        ts.join(ols, "t")
        .select(
            F.col("t").alias("event_type"),
            "n_days",
            "n_pairs",
            r6(F.col("ts_slope")).alias("ts_slope"),
            r6(
                (F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy"))
                .cast("double")
                / (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx"))
                .cast("double")
            ).alias("ols_slope"),
        )
        .orderBy("event_type")
    )


Q238_SQL = """
WITH anchor AS (SELECT date_trunc('day', min(ts)) AS d0 FROM events),
daily AS (
    SELECT e.event_type AS t,
           date_diff('day', a.d0, date_trunc('day', e.ts)) AS x,
           count(*) AS y
    FROM events e CROSS JOIN anchor a
    GROUP BY 1, 2
),
pairs AS (
    SELECT a.t,
           CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS slope
    FROM daily a JOIN daily b ON b.t = a.t AND b.x > a.x
),
ts AS (
    SELECT t, CAST(count(*) AS BIGINT) AS n_pairs,
           quantile_cont(slope, 0.5) AS ts_slope
    FROM pairs GROUP BY 1
),
ols AS (
    SELECT t, CAST(count(*) AS BIGINT) AS n_days,
           sum(x) AS sx, sum(y) AS sy,
           sum(x * y) AS sxy, sum(x * x) AS sxx
    FROM daily GROUP BY 1
)
SELECT ts.t AS event_type,
       ols.n_days,
       ts.n_pairs,
       floor(ts.ts_slope * 1000000 + 0.5) / 1000000.0 AS ts_slope,
       floor(CAST(ols.n_days * ols.sxy - ols.sx * ols.sy AS DOUBLE)
             / CAST(ols.n_days * ols.sxx - ols.sx * ols.sx AS DOUBLE)
             * 1000000 + 0.5) / 1000000.0 AS ols_slope
FROM ts JOIN ols ON ols.t = ts.t
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q239 — multi-touch attribution (ext): the marketing-warehouse
# workhorse — each purchase's value is credited back to the user's
# touch channels (prior non-purchase events) within a 7-day lookback,
# under the three standard models AT ONCE: first-touch, last-touch,
# linear. Purchases with no prior touch credit a literal 'direct'
# channel. Shape: one equi-join on user_id with a bounded time
# predicate (the lookback caps fan-out per conversion; AQE's skew
# split handles hot users), one per-conversion window for the
# deterministic first/last pick ((ts, event_id) total order — never
# arg_min on ties), then a channel rollup. Value sums fold on an exact
# integer cents grid (per-credit floor(x*100+0.5) summed as BIGINT —
# the q236 discipline): the linear model's fractional cv/nt credits
# would otherwise accumulate raw doubles in shuffle order, where a
# last-ulp difference can flip the 2dp rounding (round-8 ADVICE fix).
# ---------------------------------------------------------------------------
_Q239_LOOKBACK_DAYS = 7


def q239_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
        F.col("value").alias("cv"),
    )
    touch = ev.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("tu"),
        F.col("ts").alias("tts"),
        F.col("event_id").alias("tid"),
        F.col("event_type").alias("channel"),
    )
    joined = conv.join(
        touch,
        (F.col("cu") == F.col("tu"))
        & (F.col("tts") <= F.col("cts"))
        & (
            F.col("tts")
            > F.col("cts") - F.expr(f"INTERVAL {_Q239_LOOKBACK_DAYS} DAYS")
        ),
        "left",
    ).withColumn("channel", F.coalesce("channel", F.lit("direct")))
    wasc = Window.partitionBy("cid").orderBy("tts", "tid")
    wdesc = Window.partitionBy("cid").orderBy(F.desc("tts"), F.desc("tid"))
    marked = joined.select(
        "cid",
        "cv",
        "channel",
        F.row_number().over(wasc).alias("rf"),
        F.row_number().over(wdesc).alias("rl"),
        F.count("*").over(Window.partitionBy("cid")).alias("nt"),
    )
    cents = lambda c: F.floor(c * 100 + F.lit(0.5)).cast("long")
    return (
        marked.groupBy("channel")
        .agg(
            F.sum(F.when(F.col("rf") == 1, 1).otherwise(0))
            .cast("long")
            .alias("ft_convs"),
            (
                F.sum(F.when(F.col("rf") == 1, cents(F.col("cv"))).otherwise(0))
                / F.lit(100.0)
            ).alias("ft_value"),
            (
                F.sum(F.when(F.col("rl") == 1, cents(F.col("cv"))).otherwise(0))
                / F.lit(100.0)
            ).alias("lt_value"),
            (F.sum(cents(F.col("cv") / F.col("nt"))) / F.lit(100.0)).alias(
                "lin_value"
            ),
        )
        .orderBy("channel")
    )


Q239_SQL = f"""
WITH conv AS (
    SELECT event_id AS cid, user_id AS cu, ts AS cts, value AS cv
    FROM events WHERE event_type = 'purchase'
),
touch AS (
    SELECT user_id AS tu, ts AS tts, event_id AS tid, event_type AS channel
    FROM events WHERE event_type <> 'purchase'
),
joined AS (
    SELECT c.cid, c.cv, coalesce(t.channel, 'direct') AS channel,
           t.tts, t.tid
    FROM conv c
    LEFT JOIN touch t
           ON t.tu = c.cu
          AND t.tts <= c.cts
          AND t.tts > c.cts - INTERVAL {_Q239_LOOKBACK_DAYS} DAYS
),
marked AS (
    SELECT cid, cv, channel,
           row_number() OVER (PARTITION BY cid ORDER BY tts, tid) AS rf,
           row_number() OVER (PARTITION BY cid
                              ORDER BY tts DESC, tid DESC) AS rl,
           count(*) OVER (PARTITION BY cid) AS nt
    FROM joined
)
SELECT channel,
       CAST(sum(CASE WHEN rf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ft_convs,
       sum(CASE WHEN rf = 1
                THEN CAST(floor(cv * 100 + 0.5) AS BIGINT)
                ELSE 0 END) / 100.0 AS ft_value,
       sum(CASE WHEN rl = 1
                THEN CAST(floor(cv * 100 + 0.5) AS BIGINT)
                ELSE 0 END) / 100.0 AS lt_value,
       sum(CAST(floor(cv / nt * 100 + 0.5) AS BIGINT)) / 100.0 AS lin_value
FROM marked
GROUP BY channel
ORDER BY channel
"""


# ---------------------------------------------------------------------------
# q272 — Markov-chain attribution with removal effects (ext): the
# DATA-DRIVEN attribution model that replaces q239's positional
# heuristics (first/last/linear are conventions; the removal effect is
# a causal-ish readout — "how much conversion probability disappears
# if channel c is deleted from every journey?", Anderl et al. 2014).
# Chain construction: per user, events in (ts, event_id) order split
# into journeys at each purchase (journey = count of prior CONVs, a
# user-PARTITIONED window); states = channels + START/CONV/NULL with
# absorbing self-loops; transitions counted exactly. Absorption is K=8
# unrolled propagation steps of a probability vector kept on an exact
# 1e-9 INTEGER lattice — per-edge mass floor(v·n/ns) (double-exact:
# v·n < 2^53) summed as BIGINT, so shuffle order can't perturb a bit
# (the q270 discipline); removals run as ONE extra key column
# (removed ∈ channels ∪ '__none__'), not a per-channel re-plan.
# Attribution: conversion cents × normalized removal effects on a 4dp
# integer grid. Scale: the corpus is touched by exactly two
# partitioned-window passes and one purchase rollup; everything after
# the transition groupBy is metadata-sized (|states|² × |channels|).
# ---------------------------------------------------------------------------
_Q272_K = 8
_Q272_SCALE = 1_000_000_000


def q272_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seq = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.lit("CONV"))
        .otherwise(F.col("event_type"))
        .alias("state"),
    ).withColumn(
        "journey",
        F.coalesce(
            F.sum(F.when(F.col("state") == "CONV", 1).otherwise(0)).over(w_prev),
            F.lit(0),
        ),
    )
    wj = Window.partitionBy("user_id", "journey").orderBy("ts", "event_id")
    wj_desc = Window.partitionBy("user_id", "journey").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    stepped = seq.select(
        "state",
        F.lag("state", 1, "START").over(wj).alias("prev"),
        F.row_number().over(wj_desc).alias("rn"),
    )
    edges = (
        stepped.select(F.col("prev").alias("s"), F.col("state").alias("t"))
        .unionByName(
            stepped.filter((F.col("rn") == 1) & (F.col("state") != "CONV")).select(
                F.col("state").alias("s"), F.lit("NULL").alias("t")
            )
        )
        .unionByName(
            spark.createDataFrame(
                [("CONV", "CONV"), ("NULL", "NULL")], "s string, t string"
            )
        )
    )
    tr = edges.groupBy("s", "t").agg(F.count("*").cast("long").alias("n"))
    ns = tr.groupBy("s").agg(F.sum("n").alias("ns"))
    # lazy: trn still compiles to ONE shared RDD for its K+1 readers, but
    # materialization happens inside the query's single final action —
    # the eager form cost 38 construction jobs (~15 s at sf0.1 of pure
    # scheduler fixed cost, re-paid on every bench run because bench
    # re-calls the plan builder)
    trn = tr.join(ns, "s").localCheckpoint(eager=False)
    rem = (
        trn.select(F.col("t").alias("removed"))
        .filter(~F.col("removed").isin("CONV", "NULL", "START"))
        .distinct()
        .unionByName(spark.createDataFrame([("__none__",)], "removed string"))
        .localCheckpoint(eager=False)
    )
    p = rem.select(
        "removed",
        F.lit("START").alias("state"),
        F.lit(_Q272_SCALE).cast("long").alias("v"),
    )
    for _ in range(_Q272_K):
        p = (
            p.join(trn, F.col("state") == F.col("s"))
            .filter(F.col("t") != F.col("removed"))
            .select(
                "removed",
                "t",
                F.floor(F.col("v").cast("double") * F.col("n") / F.col("ns"))
                .cast("long")
                .alias("dv"),
            )
            .groupBy("removed", "t")
            .agg(F.sum("dv").cast("long").alias("v"))
            .withColumnRenamed("t", "state")
            # lazy checkpoint ≠ no checkpoint: each step still compiles to
            # one RDD, so the K-step chain stays linear (each p{k} is read
            # once by p{k+1} and the chain shares the single trn RDD) while
            # the per-step materialization jobs collapse into the final
            # action (the q270 discipline)
            .localCheckpoint(eager=False)
        )
    pconv = p.filter(F.col("state") == "CONV").select("removed", F.col("v").alias("pc"))
    base = pconv.filter(F.col("removed") == "__none__").select(
        F.col("pc").alias("bp")
    )
    cents = ev.filter(F.col("event_type") == "purchase").agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "total_cents"
        )
    )
    re = (
        pconv.filter(F.col("removed") != "__none__")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("removed").alias("channel"),
            "pc",
            "bp",
            F.floor(
                F.greatest(
                    F.lit(0.0),
                    F.lit(1.0) - F.col("pc").cast("double") / F.col("bp"),
                )
                * 10000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("re4"),
        )
    )
    rs = re.agg(F.sum("re4").cast("long").alias("re4_sum"))
    return (
        re.crossJoin(F.broadcast(rs))
        .crossJoin(F.broadcast(cents))
        .select(
            "channel",
            F.round(F.col("pc") / F.lit(float(_Q272_SCALE)), 6).alias(
                "pconv_removed"
            ),
            (F.col("re4") / F.lit(10000.0)).alias("removal_effect"),
            F.round(F.col("bp") / F.lit(float(_Q272_SCALE)), 6).alias("base_pconv"),
            F.when(
                F.col("re4_sum") > 0,
                F.floor(
                    F.col("total_cents").cast("double")
                    * F.col("re4")
                    / F.col("re4_sum")
                )
                / F.lit(100.0),
            ).alias("attributed_value"),
        )
        .orderBy("channel")
    )


def _q272_step_sql(k: int) -> str:
    return f""",
p{k} AS MATERIALIZED (
    SELECT p.removed, trn.t AS state,
           CAST(sum(CAST(floor(CAST(p.v AS DOUBLE) * trn.n / trn.ns)
                         AS BIGINT)) AS BIGINT) AS v
    FROM p{k - 1} p JOIN trn ON trn.s = p.state
    WHERE trn.t <> p.removed
    GROUP BY p.removed, trn.t
)"""


_Q272_STEPS = "".join(_q272_step_sql(k) for k in range(1, _Q272_K + 1))

Q272_SQL = f"""
WITH seq AS (
    SELECT user_id, ts, event_id,
           CASE WHEN event_type = 'purchase' THEN 'CONV'
                ELSE event_type END AS state,
           coalesce(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS journey
    FROM events
),
stepped AS (
    SELECT state,
           lag(state, 1, 'START') OVER (
               PARTITION BY user_id, journey ORDER BY ts, event_id) AS prev,
           row_number() OVER (
               PARTITION BY user_id, journey
               ORDER BY ts DESC, event_id DESC) AS rn
    FROM seq
),
edges AS (
    SELECT prev AS s, state AS t FROM stepped
    UNION ALL
    SELECT state AS s, 'NULL' AS t FROM stepped WHERE rn = 1 AND state <> 'CONV'
    UNION ALL SELECT 'CONV', 'CONV'
    UNION ALL SELECT 'NULL', 'NULL'
),
tr AS (SELECT s, t, CAST(count(*) AS BIGINT) AS n FROM edges GROUP BY s, t),
ns AS (SELECT s, CAST(sum(n) AS BIGINT) AS ns FROM tr GROUP BY s),
trn AS MATERIALIZED (
    SELECT tr.s, tr.t, tr.n, ns.ns FROM tr JOIN ns USING (s)
),
rem AS MATERIALIZED (
    SELECT DISTINCT t AS removed FROM trn
    WHERE t NOT IN ('CONV', 'NULL', 'START')
    UNION ALL SELECT '__none__'
),
p0 AS (
    SELECT removed, 'START' AS state,
           CAST({_Q272_SCALE} AS BIGINT) AS v
    FROM rem
){_Q272_STEPS},
pconv AS (SELECT removed, v AS pc FROM p{_Q272_K} WHERE state = 'CONV'),
base AS (SELECT pc AS bp FROM pconv WHERE removed = '__none__'),
cents AS (
    SELECT CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM events WHERE event_type = 'purchase'
),
re AS (
    SELECT p.removed AS channel, p.pc, b.bp,
           CAST(floor(greatest(0.0, 1.0 - CAST(p.pc AS DOUBLE) / b.bp)
                      * 10000 + 0.5) AS BIGINT) AS re4
    FROM pconv p CROSS JOIN base b
    WHERE p.removed <> '__none__'
),
rs AS (SELECT CAST(sum(re4) AS BIGINT) AS re4_sum FROM re)
SELECT channel,
       round(pc / {_Q272_SCALE}.0, 6) AS pconv_removed,
       re4 / 10000.0 AS removal_effect,
       round(bp / {_Q272_SCALE}.0, 6) AS base_pconv,
       CASE WHEN rs.re4_sum > 0
            THEN floor(CAST(c.total_cents AS DOUBLE) * re4 / rs.re4_sum) / 100.0
            END AS attributed_value
FROM re CROSS JOIN rs CROSS JOIN cents c
ORDER BY channel
"""


# ---------------------------------------------------------------------------
# q240 — log-rank test between survival cohorts (ext): q234 DRAWS the
# lifetime curve; the log-rank test answers the question a curve can't
# — "do BUILDING-segment customers churn on a different schedule than
# the rest?" with censoring handled correctly (a t-test on lifetimes
# would treat censored customers as churned). Standard Mantel–Cox: at
# each pooled distinct lifetime t, expected group-1 deaths under H0
# are E₁ₜ = dₜ·n₁ₜ/nₜ and the hypergeometric variance is
# Vₜ = dₜ·(n₁ₜ/nₜ)·(n₂ₜ/nₜ)·(nₜ−dₜ)/(nₜ−1);
# χ² = (ΣO₁−ΣE₁)²/ΣV. Scale: same two-rollup collapse as q234, then a
# DENSE (lifetime × group) grid over the DOMAIN-bounded lifetime axis;
# per-group risk sets via a window PARTITIONED by group. ΣE and ΣV are
# per-term doubles from exact integers, floor-scaled to a 1e9 integer
# grid before the (order-free) sum — the q236 determinism pattern.
# ---------------------------------------------------------------------------
_Q240_SEG = "BUILDING"
_Q240_SCALE = 1_000_000_000


def q240_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    span = orders.agg(F.date_trunc("day", F.max("o_orderdate")).alias("dmax"))
    users = orders.groupBy("o_custkey").agg(
        F.date_trunc("day", F.min("o_orderdate")).alias("d0"),
        F.date_trunc("day", F.max("o_orderdate")).alias("d1"),
    )
    lives = (
        users.join(
            cust.select("c_custkey", "c_mktsegment"),
            users.o_custkey == F.col("c_custkey"),
        )
        .crossJoin(F.broadcast(span))
        .select(
            # Censored customers are at risk until the observation cut
            # (t = dmax - d0), churned ones until last order — the same
            # textbook right-censoring convention as q234.
            F.when(
                F.datediff("dmax", "d1") < _Q234_CENS_DAYS,
                F.datediff("dmax", "d0"),
            )
            .otherwise(F.datediff("d1", "d0"))
            .alias("t"),
            (F.col("c_mktsegment") == _Q240_SEG).cast("int").alias("g"),
            (F.datediff("dmax", "d1") < _Q234_CENS_DAYS).cast("int").alias("cens"),
        )
    )
    cells = lives.groupBy("t", "g").agg(
        F.sum(1 - F.col("cens")).cast("long").alias("d"),
        F.sum("cens").cast("long").alias("c"),
    ).localCheckpoint(eager=False)  # feeds dense grid + totals
    dense = (
        cells.select("t").distinct()
        .crossJoin(spark.range(2).select(F.col("id").cast("int").alias("g")))
        .join(cells, ["t", "g"], "left")
        .fillna(0, subset=["d", "c"])
    )
    ntot = cells.groupBy("g").agg(F.sum(F.col("d") + F.col("c")).alias("ng"))
    wg = (
        Window.partitionBy("g")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    risk = (
        dense.join(ntot, "g")
        .withColumn(
            "nr",
            F.col("ng") - F.coalesce(F.sum(F.col("d") + F.col("c")).over(wg), F.lit(0)),
        )
    )
    pooled = risk.groupBy("t").agg(
        F.sum("d").alias("dt"),
        F.sum("nr").alias("nt"),
        F.sum(F.when(F.col("g") == 1, F.col("d")).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("g") == 1, F.col("nr")).otherwise(0)).alias("n1"),
    ).filter(F.col("dt") > 0)
    terms = pooled.select(
        "d1",
        F.floor(
            F.col("dt").cast("double")
            * F.col("n1").cast("double")
            / F.col("nt").cast("double")
            * F.lit(float(_Q240_SCALE))
        )
        .cast("long")
        .alias("e1s"),
        F.floor(
            F.when(
                F.col("nt") > 1,
                F.col("dt").cast("double")
                * (F.col("n1").cast("double") / F.col("nt").cast("double"))
                * ((F.col("nt") - F.col("n1")).cast("double") / F.col("nt").cast("double"))
                * ((F.col("nt") - F.col("dt")).cast("double")
                   / (F.col("nt") - 1).cast("double")),
            ).otherwise(F.lit(0.0))
            * F.lit(float(_Q240_SCALE))
        )
        .cast("long")
        .alias("vs"),
    )
    agg = terms.agg(
        F.sum("d1").cast("long").alias("o1"),
        F.sum("e1s").alias("e1s"),
        F.sum("vs").alias("vs"),
    )
    counts = ntot.agg(
        F.sum(F.when(F.col("g") == 1, F.col("ng")).otherwise(0)).cast("long").alias("n_seg"),
        F.sum(F.when(F.col("g") == 0, F.col("ng")).otherwise(0)).cast("long").alias("n_rest"),
    )
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)
    e1 = F.col("e1s").cast("double") / F.lit(float(_Q240_SCALE))
    v = F.col("vs").cast("double") / F.lit(float(_Q240_SCALE))
    chi = (F.col("o1").cast("double") - e1) * (F.col("o1").cast("double") - e1) / v
    return (
        agg.crossJoin(F.broadcast(counts))
        .select(
            "n_seg",
            "n_rest",
            F.col("o1").alias("observed_seg"),
            r4(e1).alias("expected_seg"),
            r4(chi).alias("chi2"),
            (chi > F.lit(3.841459)).cast("int").alias("reject_5pct"),
        )
    )


Q240_SQL = f"""
WITH span AS (
    SELECT date_trunc('day', max(o_orderdate)) AS dmax FROM orders
),
users AS (
    SELECT o_custkey, date_trunc('day', min(o_orderdate)) AS d0,
           date_trunc('day', max(o_orderdate)) AS d1
    FROM orders GROUP BY 1
),
lives AS (
    SELECT CASE WHEN date_diff('day', u.d1, s.dmax) < {_Q234_CENS_DAYS}
                THEN date_diff('day', u.d0, s.dmax)
                ELSE date_diff('day', u.d0, u.d1) END AS t,
           CASE WHEN c.c_mktsegment = '{_Q240_SEG}' THEN 1 ELSE 0 END AS g,
           CASE WHEN date_diff('day', u.d1, s.dmax) < {_Q234_CENS_DAYS}
                THEN 1 ELSE 0 END AS cens
    FROM users u
    JOIN customer c ON c.c_custkey = u.o_custkey
    CROSS JOIN span s
),
cells AS (
    SELECT t, g, CAST(sum(1 - cens) AS BIGINT) AS d,
           CAST(sum(cens) AS BIGINT) AS c
    FROM lives GROUP BY 1, 2
),
dense AS (
    SELECT ts.t, gs.g, coalesce(ce.d, 0) AS d, coalesce(ce.c, 0) AS c
    FROM (SELECT DISTINCT t FROM cells) ts
    CROSS JOIN (SELECT unnest([0, 1]) AS g) gs
    LEFT JOIN cells ce ON ce.t = ts.t AND ce.g = gs.g
),
ntot AS (SELECT g, sum(d + c) AS ng FROM cells GROUP BY 1),
risk AS (
    SELECT de.t, de.g, de.d,
           nt.ng - coalesce(sum(de.d + de.c) OVER (PARTITION BY de.g
               ORDER BY de.t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nr
    FROM dense de JOIN ntot nt ON nt.g = de.g
),
pooled AS (
    SELECT t, sum(d) AS dt, sum(nr) AS nt,
           sum(CASE WHEN g = 1 THEN d ELSE 0 END) AS d1,
           sum(CASE WHEN g = 1 THEN nr ELSE 0 END) AS n1
    FROM risk GROUP BY 1
    HAVING sum(d) > 0
),
terms AS (
    SELECT d1,
           CAST(floor(CAST(dt AS DOUBLE) * CAST(n1 AS DOUBLE)
                      / CAST(nt AS DOUBLE) * {_Q240_SCALE}) AS BIGINT) AS e1s,
           CAST(floor(CASE WHEN nt > 1
                THEN CAST(dt AS DOUBLE)
                     * (CAST(n1 AS DOUBLE) / CAST(nt AS DOUBLE))
                     * (CAST(nt - n1 AS DOUBLE) / CAST(nt AS DOUBLE))
                     * (CAST(nt - dt AS DOUBLE) / CAST(nt - 1 AS DOUBLE))
                ELSE 0.0 END * {_Q240_SCALE}) AS BIGINT) AS vs
    FROM pooled
),
agg AS (
    SELECT CAST(sum(d1) AS BIGINT) AS o1,
           CAST(sum(e1s) AS BIGINT) AS e1s,
           CAST(sum(vs) AS BIGINT) AS vs
    FROM terms
),
counts AS (
    SELECT CAST(sum(CASE WHEN g = 1 THEN ng ELSE 0 END) AS BIGINT) AS n_seg,
           CAST(sum(CASE WHEN g = 0 THEN ng ELSE 0 END) AS BIGINT) AS n_rest
    FROM ntot
)
SELECT c.n_seg, c.n_rest,
       a.o1 AS observed_seg,
       floor(CAST(a.e1s AS DOUBLE) / {_Q240_SCALE} * 10000 + 0.5) / 10000.0
           AS expected_seg,
       floor((CAST(a.o1 AS DOUBLE) - CAST(a.e1s AS DOUBLE) / {_Q240_SCALE})
             * (CAST(a.o1 AS DOUBLE) - CAST(a.e1s AS DOUBLE) / {_Q240_SCALE})
             / (CAST(a.vs AS DOUBLE) / {_Q240_SCALE}) * 10000 + 0.5)
           / 10000.0 AS chi2,
       CAST(CASE WHEN (CAST(a.o1 AS DOUBLE)
                       - CAST(a.e1s AS DOUBLE) / {_Q240_SCALE})
                      * (CAST(a.o1 AS DOUBLE)
                         - CAST(a.e1s AS DOUBLE) / {_Q240_SCALE})
                      / (CAST(a.vs AS DOUBLE) / {_Q240_SCALE}) > 3.841459
                 THEN 1 ELSE 0 END AS INTEGER) AS reject_5pct
FROM agg a CROSS JOIN counts c
"""


# ---------------------------------------------------------------------------
# q241 — Mann–Kendall trend test (ext): Theil–Sen (q238) gives the
# robust slope MAGNITUDE; Mann–Kendall decides whether a monotone
# trend exists AT ALL — the standard nonparametric pair: S = Σ
# sign(y_j − y_i) over day pairs, tie-corrected variance
# Var = [n(n−1)(2n+5) − Σ tₖ(tₖ−1)(2tₖ+5)]/18, continuity-corrected
# z = (S∓1)/√Var. EVERYTHING here is exact integer algebra until the
# final division — no float-scale grid needed at all. Scale: identical
# per-(type, day) collapse as q238; the pair join runs on the
# observation-window-bounded rollup.
# ---------------------------------------------------------------------------
def q241_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    anchor = ev.agg(F.date_trunc("day", F.min("ts")).alias("d0"))
    daily = (
        ev.crossJoin(F.broadcast(anchor))
        .groupBy(
            F.col("event_type").alias("t"),
            F.datediff(F.date_trunc("day", "ts"), F.col("d0")).alias("x"),
        )
        .agg(F.count("*").alias("y"))
        .localCheckpoint(eager=False)  # feeds pair join + tie rollup
    )
    s = (
        daily.alias("a")
        .join(
            daily.alias("b"),
            (F.col("a.t") == F.col("b.t")) & (F.col("b.x") > F.col("a.x")),
        )
        .groupBy(F.col("a.t").alias("t"))
        .agg(
            F.sum(F.signum((F.col("b.y") - F.col("a.y")).cast("double")).cast("long"))
            .cast("long")
            .alias("s")
        )
    )
    ties = (
        daily.groupBy("t", "y")
        .agg(F.count("*").alias("tk"))
        .groupBy("t")
        .agg(
            F.sum("tk").cast("long").alias("n"),
            F.sum(F.col("tk") * (F.col("tk") - 1) * (2 * F.col("tk") + 5))
            .cast("long")
            .alias("tie_term"),
        )
    )
    nd = F.col("n")
    var18 = nd * (nd - 1) * (2 * nd + 5) - F.col("tie_term")  # 18·Var, exact
    zc = F.when(F.col("s") > 0, F.col("s") - 1).otherwise(
        F.when(F.col("s") < 0, F.col("s") + 1).otherwise(F.lit(0))
    )
    z = zc.cast("double") / F.sqrt(var18.cast("double") / F.lit(18.0))
    r4 = lambda c: F.floor(c * 10000 + F.lit(0.5)) / F.lit(10000.0)
    return (
        s.join(ties, "t")
        .select(
            F.col("t").alias("event_type"),
            F.col("n").alias("n_days"),
            F.col("s").alias("s_stat"),
            var18.cast("long").alias("var18"),
            r4(z).alias("z_score"),
            (F.abs(z) > F.lit(1.959964)).cast("int").alias("significant"),
        )
        .orderBy("event_type")
    )


Q241_SQL = """
WITH anchor AS (SELECT date_trunc('day', min(ts)) AS d0 FROM events),
daily AS (
    SELECT e.event_type AS t,
           date_diff('day', a.d0, date_trunc('day', e.ts)) AS x,
           count(*) AS y
    FROM events e CROSS JOIN anchor a
    GROUP BY 1, 2
),
s AS (
    SELECT a.t,
           CAST(sum(CASE WHEN b.y > a.y THEN 1
                         WHEN b.y < a.y THEN -1 ELSE 0 END) AS BIGINT) AS s
    FROM daily a JOIN daily b ON b.t = a.t AND b.x > a.x
    GROUP BY 1
),
ties AS (
    SELECT t, CAST(sum(tk) AS BIGINT) AS n,
           CAST(sum(tk * (tk - 1) * (2 * tk + 5)) AS BIGINT) AS tie_term
    FROM (SELECT t, y, count(*) AS tk FROM daily GROUP BY 1, 2)
    GROUP BY 1
),
scored AS (
    SELECT s.t, ties.n, s.s,
           ties.n * (ties.n - 1) * (2 * ties.n + 5) - ties.tie_term AS var18,
           CAST(CASE WHEN s.s > 0 THEN s.s - 1
                     WHEN s.s < 0 THEN s.s + 1 ELSE 0 END AS DOUBLE)
           / sqrt((ties.n * (ties.n - 1) * (2 * ties.n + 5) - ties.tie_term)
                  / 18.0) AS z
    FROM s JOIN ties ON ties.t = s.t
)
SELECT t AS event_type,
       n AS n_days,
       s AS s_stat,
       CAST(var18 AS BIGINT) AS var18,
       floor(z * 10000 + 0.5) / 10000.0 AS z_score,
       CAST(CASE WHEN abs(z) > 1.959964 THEN 1 ELSE 0 END AS INTEGER)
           AS significant
FROM scored
ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# q257 — robust day-of-week seasonal decomposition (ext): the
# seasonal-adjustment step q192's seasonal-naive backtest presumes and
# q78's rolling z-scores ignore — volumes have a weekly shape, so an
# unadjusted anomaly detector fires every weekend. Median-based
# (STL-flavored, robust to the q238 outlier argument): per
# (event_type, dow) the MEDIAN daily count is the seasonal component;
# seasonal index = med_dow / med_all; residual = count − med_dow; a
# day is anomalous when |residual| > 3·MAD(residuals of its type).
# Medians/MAD are exact `percentile` ↔ `quantile_cont` selections on
# DOMAIN-bounded daily rollups (the q61 determinism precedent); no
# float accumulates. Output: one row per (type, dow) with the index
# and that slice's anomaly count.
# ---------------------------------------------------------------------------
def q257_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.col("event_type").alias("t"),
            F.date_trunc("day", "ts").alias("day"),
        )
        .agg(F.count("*").alias("y"))
        .withColumn("dow", F.dayofweek("day").cast("int"))
        .localCheckpoint(eager=False)  # feeds 3 median rollups + residuals
    )
    med_dow = daily.groupBy("t", "dow").agg(
        F.expr("percentile(y, 0.5)").alias("med_dow"),
        F.count("*").cast("long").alias("n_days"),
    )
    med_all = daily.groupBy("t").agg(F.expr("percentile(y, 0.5)").alias("med_all"))
    resid = daily.join(med_dow, ["t", "dow"]).select(
        "t", "dow", (F.col("y") - F.col("med_dow")).alias("r")
    )
    mad = resid.groupBy("t").agg(F.expr("percentile(abs(r), 0.5)").alias("mad"))
    anom = (
        resid.join(mad, "t")
        .groupBy("t", "dow")
        .agg(
            F.sum(
                (F.abs(F.col("r")) > 3 * F.col("mad")).cast("long")
            ).alias("n_anom")
        )
    )
    r6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / F.lit(1000000.0)
    return (
        med_dow.join(med_all, "t")
        .join(anom, ["t", "dow"])
        .select(
            F.col("t").alias("event_type"),
            "dow",
            "n_days",
            r6(F.col("med_dow")).alias("med_dow"),
            r6(F.col("med_all")).alias("med_all"),
            r6(F.col("med_dow") / F.col("med_all")).alias("seasonal_idx"),
            F.col("n_anom").cast("long").alias("n_anom"),
        )
        .orderBy("event_type", "dow")
    )


Q257_SQL = """
WITH daily AS (
    SELECT event_type AS t, date_trunc('day', ts) AS day, count(*) AS y,
           CAST(dayofweek(date_trunc('day', ts)) + 1 AS INTEGER) AS dow
    FROM events GROUP BY 1, 2
),
med_dow AS (
    SELECT t, dow, quantile_cont(y, 0.5) AS med_dow,
           CAST(count(*) AS BIGINT) AS n_days
    FROM daily GROUP BY 1, 2
),
med_all AS (SELECT t, quantile_cont(y, 0.5) AS med_all FROM daily GROUP BY 1),
resid AS (
    SELECT d.t, d.dow, d.y - m.med_dow AS r
    FROM daily d JOIN med_dow m ON m.t = d.t AND m.dow = d.dow
),
mad AS (SELECT t, quantile_cont(abs(r), 0.5) AS mad FROM resid GROUP BY 1),
anom AS (
    SELECT r.t, r.dow,
           CAST(sum(CASE WHEN abs(r.r) > 3 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_anom
    FROM resid r JOIN mad m ON m.t = r.t
    GROUP BY 1, 2
)
SELECT md.t AS event_type, md.dow AS dow, md.n_days,
       floor(md.med_dow * 1000000 + 0.5) / 1000000.0 AS med_dow,
       floor(ma.med_all * 1000000 + 0.5) / 1000000.0 AS med_all,
       floor(md.med_dow / ma.med_all * 1000000 + 0.5) / 1000000.0
           AS seasonal_idx,
       an.n_anom
FROM med_dow md
JOIN med_all ma ON ma.t = md.t
JOIN anom an ON an.t = md.t AND an.dow = md.dow
ORDER BY event_type, md.dow
"""


QUERIES = [
    Query("q234_kaplan_meier", q234_kaplan_meier, Q234_SQL,
          survey="ext:kaplan-meier,ext:retention,ext:prefix-scan,F19",
          tags=("bench",)),
    Query("q238_theilsen_slope", q238_theilsen_slope, Q238_SQL,
          survey="ext:theilsen-slope,ext:trend-regression,ext:robust-outlier-qa"),
    Query("q239_attribution", q239_attribution, Q239_SQL,
          survey="ext:attribution,ext:funnel,ext:range-join,W3",
          tags=("bench",)),
    Query("q272_markov_attribution", q272_markov_attribution, Q272_SQL,
          survey="ext:attribution,ext:markov-attribution,"
                 "ext:removal-effect,ext:iterate-to-convergence",
          tags=("bench",)),
    Query("q240_logrank_test", q240_logrank_test, Q240_SQL,
          survey="ext:logrank-test,ext:kaplan-meier,ext:ab-experiment"),
    Query("q241_mann_kendall", q241_mann_kendall, Q241_SQL,
          survey="ext:mann-kendall,ext:theilsen-slope,ext:trend-regression"),
    Query("q257_seasonal_decompose", q257_seasonal_decompose, Q257_SQL,
          survey="ext:seasonal-decompose,ext:periodicity-score,"
                 "ext:robust-outlier-qa,ext:forecast-backtest"),
    Query("q203_funnel_latency", q203_funnel_latency, Q203_SQL,
          survey="ext:funnel,ext:quantile-digest,ext:percentiles,ST4",
          tags=("bench",)),
    Query("q206_session_paths", q206_session_paths, Q206_SQL,
          survey="ext:session-paths,ext:sessionization,ext:transition-matrix,W3",
          tags=("bench",)),
    Query("q214_disorder_profile", q214_disorder_profile, Q214_SQL,
          survey="ext:disorder-profile,ext:prefix-scan,ext:quantile-digest,ST5",
          tags=("bench",)),
    Query("q217_asof_modes", q217_asof_modes, Q217_SQL,
          survey="ext:asof-join,ext:range-join,ext:asof-directions",
          tags=("bench",)),
    Query("q218_time_weighted_avg", q218_time_weighted_avg, Q218_SQL,
          survey="ext:time-weighted-avg,ext:gap-fill-locf,ext:hypertable-rollup"),
    Query("q222_periodicity_score", q222_periodicity_score, Q222_SQL,
          survey="ext:periodicity-score,ext:timeseries-similarity,ext:hypertable-rollup"),
    Query("q226_changepoint", q226_changepoint, Q226_SQL,
          survey="ext:changepoint,ext:trend-detection,ext:rolling-anomaly"),
    Query("q229_concurrency_gauge", q229_concurrency_gauge, Q229_SQL,
          survey="ext:concurrency-gauge,ext:prefix-scan,ext:sessionization",
          tags=("bench",)),
    Query("q230_xcorr_lag", q230_xcorr_lag, Q230_SQL,
          survey="ext:xcorr-lag,ext:periodicity-score,ext:timeseries-similarity"),
    Query("q228_backfill_ranges", q228_backfill_ranges, Q228_SQL,
          survey="ext:backfill-planner,ext:gaps-and-islands,ext:data-profiling"),
    Query("q223_cohort_ltv", q223_cohort_ltv, Q223_SQL,
          survey="ext:cohort-ltv,ext:retention,F19,W2", tags=("bench",)),
    Query("q192_seasonal_mase", q192_seasonal_mase, Q192_SQL,
          survey="ext:forecast-backtest,ext:trend-regression,"
                 "ext:hypertable-rollup",
          tags=("bench",)),
    Query("q195_activity_streaks", q195_activity_streaks, Q195_SQL,
          survey="ext:gaps-and-islands,ext:retention,W3,F19"),
    Query("q60_multi_grain_rollup", q60_multi_grain_rollup, Q60_SQL,
          survey="ext:hypertable-rollup,A4,F19", tags=("bench",)),
    Query("q61_value_percentiles", q61_value_percentiles, Q61_SQL,
          survey="ext:percentiles,A2"),
    Query("q62_error_click_range_join", q62_error_click_range_join, Q62_SQL,
          survey="ext:range-join,P9", tags=("bench",)),
    Query("q69_similar_activity_users", q69_similar_activity_users, Q69_SQL,
          survey="ext:timeseries-similarity"),
    Query("q70_funnel", q70_funnel, Q70_SQL, survey="ext:funnel,A12"),
    Query("q71_retention_cohorts", q71_retention_cohorts, Q71_SQL,
          survey="ext:retention,F19"),
    Query("q78_rolling_anomalies", q78_rolling_anomalies, Q78_SQL,
          survey="ext:rolling-anomaly,W2,W4"),
    Query("q87_daily_trend", q87_daily_trend, Q87_SQL,
          survey="ext:trend-regression,A3"),
    Query("q88_equidepth_histogram", q88_equidepth_histogram, Q88_SQL,
          survey="ext:equidepth-histogram,A7"),
    Query("q130_selection_median", q130_selection_median, Q130_SQL,
          survey="ext:selection-median,ext:percentiles,A3", tags=("bench",)),
    Query("q89_ewma_daily", q89_ewma_daily, Q89_SQL,
          survey="ext:ewma,U8,ST2"),
    Query("q155_interval_overlap_join", q155_interval_overlap_join, Q155_SQL,
          survey="ext:interval-overlap-join,ext:range-join,W1",
          tags=("bench",)),
]
