"""Time-series operators Spark lacks as primitives, composed Spark-first.

Together with :func:`..operators.curation.asof_join` this covers the
time-series custom-operator family (as-of join / range join / hypertable
rollup). The reference's only time-series work is daily grouping and a
48-hour trailing filter (``stats_visualization.py:193,221-222`` — SURVEY
F19/F20/P9/W4); these operators generalize that to the shapes a
large-scale event pipeline needs.

Scale notes: a naive interval join (``l.ts BETWEEN r.ts AND r.ts + w``)
plans as a broadcast-nested-loop or cartesian product — O(n·m) and a
cluster-killer at 100 TB. :func:`binned_range_join` turns it into an
EQUI-join on (key, time_bin) — one hash shuffle each side, with the
left side exploded into exactly two bin keys — then an exact residual
filter. Output cardinality equals the true interval-join result; the
2× explode is the only overhead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

MICROS = 1_000_000


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_s: int,
) -> DataFrame:
    """All (left, right) pairs with the same ``on`` key where
    ``0 < left_ts - right_ts <= window_s`` (right strictly precedes left
    within the window).

    Implementation: bin both sides at ``window_s`` granularity; a
    qualifying right row's bin is either the left row's bin or the one
    before it, so exploding the left row into those two bin keys and
    equi-joining on (key, bin) finds every candidate exactly once (the
    two exploded keys are distinct → no dedup needed). The residual
    range predicate then filters exactly.

    Returns left columns + right columns (callers project/alias; the two
    ts column names must differ).
    """
    w_us = window_s * MICROS
    l2 = (
        left.withColumn("_lb", F.floor(F.unix_micros(F.col(left_ts)) / w_us))
        .withColumn("_bin", F.explode(F.array(F.col("_lb") - 1, F.col("_lb"))))
        .drop("_lb")
    )
    r2 = right.withColumn("_bin", F.floor(F.unix_micros(F.col(right_ts)) / w_us))
    gap = F.unix_micros(F.col(left_ts)) - F.unix_micros(F.col(right_ts))
    return (
        l2.join(r2, [on, "_bin"])
        .filter((gap > 0) & (gap <= F.lit(w_us)))
        .drop("_bin")
    )


def multi_grain_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    grains: tuple[str, ...] = ("day", "hour"),
) -> DataFrame:
    """Hypertable-style continuous aggregate: every time grain computed in
    ONE pass / one shuffle via grouping sets, coarser grains with NULL
    fine-bucket columns and a ``grain`` discriminator column.

    ``grains`` must be ordered coarse→fine; each grouping set keeps the
    buckets down to its grain. At 100 TB this beats per-grain jobs by
    reusing the scan and letting partial aggregation collapse rows
    map-side before the single shuffle.
    """
    bucket_cols = [f"{g}_ts" for g in grains]
    staged = events.select(
        *[F.date_trunc(g.upper(), F.col(ts_col)).alias(c) for g, c in zip(grains, bucket_cols)],
        F.col(value_col).alias("_v"),
    )
    sets = [bucket_cols[: i + 1] for i in range(len(bucket_cols))]
    # grouping() is only valid inside the aggregate list; grain = number of
    # fine buckets kept = index into `grains`.
    grain_expr = F.lit(len(bucket_cols) - 1).cast("int")
    for c in bucket_cols[1:]:
        grain_expr = grain_expr - F.grouping(c).cast("int")
    return staged.groupingSets(sets, *[F.col(c) for c in bucket_cols]).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("_v"), 2).alias("sum_value"),
        grain_expr.alias("grain"),
    )


def bounded_sessionize(
    events: DataFrame,
    gap_s: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-user session counting with BOUNDED per-task work: two-level
    sessionization that splits each user's history by calendar day before
    the order-dependent window, then merges sessions across midnight.

    Semantics are identical to ``lag() over (partition by user order by
    ts)`` gap-counting: consecutive events of one user are either within
    the same day (gap seen by the day-local lag) or span a day boundary
    (gap = this day's first ts − previous event-day's last ts, seen by the
    merge window). Every inter-event gap is examined exactly once.

    Why: an order-dependent window over the full per-user history
    serializes a hot user (one key owning 50% of events) into ONE task,
    and AQE cannot split it — sorting is not mergeable across splits.
    Partitioning by (user, day) bounds any task at one user-DAY of
    events; the merge level then handles at most one row per user-day
    (≤365/user/year), which no key can skew meaningfully.

    The day level is a hash aggregate folding each user-day's sorted
    second-stamps row-locally — NOT a (user, day) WindowExec: the
    window needs a full partition sort of all events and buffers rows
    per frame, while the fold collects only one user-day of int64
    seconds (the same bound the window had) and counts gap breaks with
    array ops. Measured at sf0.1: 0.74 s vs 0.88 s warm, identical
    output — recovering most of the bounded-rewrite's cost over the
    skew-unsafe single-window original. Second-granularity diffs mean
    sub-second reorderings inside the sort are harmless (equal seconds
    give gap 0 either way). ``tiebreak_col`` is kept for signature
    stability; gap counting is order-insensitive within equal seconds.

    Returns one row per user: (user_col, n_sessions, n_events).
    """
    n_gaps = F.greatest(F.size("_ts") - 1, F.lit(0))
    # count(*) counts NULL-timestamp rows into n_events exactly as the
    # window formulation did (collect_list skips nulls, so _ts alone
    # would silently drop them); the size() guards keep element_at off
    # empty arrays (an all-null group), which ANSI mode rejects. Null
    # timestamps produce no gaps and null first/last — identical to the
    # null-safe lag arithmetic they replace.
    per_day = (
        events.withColumn("_day", F.to_date(ts_col))
        .groupBy(user_col, "_day")
        .agg(
            F.array_sort(F.collect_list(F.unix_timestamp(ts_col))).alias("_ts"),
            F.count("*").alias("_n_events"),
        )
        .select(
            user_col,
            "_day",
            F.size(
                F.filter(
                    F.zip_with(
                        F.slice("_ts", 2, n_gaps),
                        F.slice("_ts", 1, n_gaps),
                        lambda a, b: a - b > gap_s,
                    ),
                    lambda x: x,
                )
            ).alias("_day_breaks"),
            F.when(F.size("_ts") > 0, F.element_at("_ts", 1)).alias("_first_s"),
            F.when(F.size("_ts") > 0, F.element_at("_ts", -1)).alias("_last_s"),
            "_n_events",
        )
    )
    wu = W.partitionBy(user_col).orderBy("_day")
    cross_gap = F.col("_first_s") - F.lag("_last_s").over(wu)
    # First real event-day (NULL gap) starts a session; a later day starts
    # one only if the midnight-spanning gap exceeds the threshold. The
    # NULL-day group (null timestamps; sorts first, so its null _last_s
    # feeds the first real day's lag exactly like "no previous day")
    # contributes ZERO starts — in the naive lag ordering nulls sort
    # before everything and every gap touching them is null, so they
    # never open a session; greatest(.., 1) covers the all-null user,
    # whose naive count is still 1 (sum(is_new) + 1 over null gaps).
    day_starts = F.when(F.col("_day").isNull(), F.lit(0)).otherwise(
        F.col("_day_breaks")
        + F.when(cross_gap.isNull() | (cross_gap > gap_s), 1).otherwise(0)
    )
    return (
        per_day.withColumn("_starts", day_starts)
        .groupBy(user_col)
        .agg(
            F.greatest(F.sum("_starts"), F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("_n_events").alias("n_events"),
        )
    )


def ewma_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    val_col: str,
    alpha: float,
    out_col: str = "ewma",
    max_group_size: int | None = 100_000,
) -> DataFrame:
    """Per-key exponentially-weighted moving average,
    s_t = alpha·v_t + (1−alpha)·s_{t−1}, s_1 = v_1.

    The recursion is genuinely outside built-in window algebra (a
    weighted-sum reformulation needs pow((1−alpha), t) terms that
    under/overflow for long series), but it IS a left fold — so it runs
    entirely JVM-side as ``aggregate()`` over a per-key
    ``collect_list``: one shuffle on the keys, each group's series
    sorted and folded row-locally, then re-exploded. Measured vs the
    ``applyInPandas`` alternative at sf0.1: 0.39 s vs 0.50 s, identical
    output to 4dp (the Arrow round-trip is pure overhead here; see
    SCALE.md "EWMA A/B"). Feed it GROUPED series (daily/hourly
    rollups) — per-group row counts are bounded by the time span, not
    raw event volume, so the collected arrays stay small.

    ``max_group_size`` makes that contract LOUD: a key whose series
    exceeds it (someone fed raw events instead of rollups) fails the job
    with a descriptive error instead of silently OOMing an executor on
    the collected array. A century of hourly points is ~877k rows;
    the 100k default flags misuse well before memory pressure while
    clearing any sane rollup cadence. ``None`` disables the guard.

    Output schema: ``df``'s columns + ``out_col``. Rows within a key are
    ordered by ``order_col`` (ties broken by the remaining columns via
    struct comparison).
    """
    beta = 1.0 - alpha
    others = [c for c in df.columns if c not in key_cols and c != order_col]
    arr = df.groupBy(*key_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(order_col), *[F.col(c) for c in others]))
        ).alias("_xs")
    )
    if max_group_size is not None:
        # raise_error inside CASE WHEN: evaluated only for offending
        # groups, so compliant runs pay one size() per group.
        arr = arr.withColumn(
            "_xs",
            F.when(F.size("_xs") <= max_group_size, F.col("_xs")).otherwise(
                F.raise_error(
                    F.format_string(
                        "ewma_by_key: a key's series has %s rows, over "
                        f"max_group_size={max_group_size}. Feed grouped "
                        "rollups (daily/hourly), or raise/disable the guard.",
                        F.size("_xs"),
                    )
                ).cast(arr.schema["_xs"].dataType)
            ),
        )
    folded = arr.withColumn(
        "_sm",
        F.aggregate(
            "_xs",
            F.expr("CAST(array() AS ARRAY<DOUBLE>)"),
            lambda acc, x: F.concat(
                acc,
                F.array(
                    F.when(F.size(acc) == 0, x[val_col].cast("double")).otherwise(
                        F.lit(alpha) * x[val_col] + F.lit(beta) * F.element_at(acc, -1)
                    )
                ),
            ),
        ),
    )
    exploded = folded.select(
        *key_cols, F.posexplode(F.arrays_zip("_xs", "_sm")).alias("_i", "_z")
    ).select(
        *key_cols,
        F.col(f"_z._xs.{order_col}").alias(order_col),
        *[F.col(f"_z._xs.{c}").alias(c) for c in others],
        F.col("_z._sm").alias(out_col),
    )
    return exploded.select(*df.columns, out_col)
