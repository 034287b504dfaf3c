"""Skew mitigation for hot keys — the manual counterpart to AQE's
skew-join splitting (session.py enables that; this module is for the
cases AQE cannot fix: skewed AGGREGATIONS, and joins where one key
dominates so badly that even a split partition re-skews).

At 100 TB a zipfian key (one URL, one shingle, one user) can put half the
shuffle on one reducer. Salting splits each hot key into ``n_salts``
sub-keys for a partial aggregate, then merges the partials — two small
shuffles instead of one skewed one. Correct only for ALGEBRAIC aggregates
(sum/count/min/max and anything expressible as a merge of partials).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "_salt") -> DataFrame:
    """Deterministic per-row salt in [0, n_salts): hash of the whole row's
    monotonically-unique id — NOT rand(), so retried tasks produce
    identical output (Spark recomputes lost partitions; a nondeterministic
    salt would double-count rows under retry)."""
    return df.withColumn(
        col_name,
        (F.abs(F.xxhash64(F.monotonically_increasing_id())) % n_salts).cast("int"),
    )


def salted_count(df: DataFrame, key_cols: list[str], n_salts: int = 16) -> DataFrame:
    """groupBy(key).count() for skewed keys: partial count per (key, salt),
    then merge partials per key. Both shuffles are ~uniform: the first by
    (key, salt), the second over at most n_salts rows per key."""
    partial = (
        with_salt(df, n_salts)
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_partial_n"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial_n").alias("n"))


def salted_sum(
    df: DataFrame, key_cols: list[str], value_col: str | Column, n_salts: int = 16
) -> DataFrame:
    """groupBy(key).sum(value) with the same two-phase salted shape."""
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    partial = (
        with_salt(df, n_salts)
        .groupBy(*key_cols, "_salt")
        .agg(F.sum(v).alias("_partial_s"))
    )
    return partial.groupBy(*key_cols).agg(F.sum("_partial_s").alias("total"))


def exclusive_prefix_sum(
    df: DataFrame,
    part_col: str,
    order_col: str,
    value_col: str,
    block_size: int = 256,
    out_col: str = "_prefix",
    levels: int = 2,
) -> DataFrame:
    """Exclusive running sum of ``value_col`` per ``part_col`` in
    ``order_col`` order, WITHOUT a full-partition window sort — the
    multi-level parallel prefix sum.

    The naive ``sum over (partition by part order by ord)`` serializes a
    hot partition into ONE task's sort that AQE cannot split — the same
    scale-killer bounded_sessionize (q21) and the q77 pair extraction
    eliminated. Here the classic fix:

      1. block ``ord`` into ranges of ``block_size`` and partial-sum each
         (part, block) — one uniform hash shuffle, map-side combinable;
      2. compute each block's exclusive offset over the per-block totals
         — RECURSIVELY with ``levels-1`` further blockings, so the only
         true window ever run sits at the top of the hierarchy over
         ≤ rows/block_size^(levels-1) rows per part (levels=2 bounds a
         65k-row window at 16M rows/part with the default block; raise
         to 3 for 4G rows/part);
      3. join offsets back (equi-join on (part, block)) and add the
         in-block exclusive prefix — a window whose partitions are
         bounded by one block's row count.

    Every window is bounded, every shuffle uniform, semantics identical
    to the naive window for any unique ``order_col`` within a partition
    at every ``levels`` (property-tested). Requires numeric
    ``order_col``; blocks are value ranges, so row count per block is
    bounded when ids are ~dense (doc ids, event ids). Returns ``df`` +
    ``out_col``.
    """
    from pyspark.sql import Window as W

    reserved = {"_blk", "_po", "_bsum"}
    if out_col in reserved:
        raise ValueError(f"out_col must not be one of the internal names {reserved}")
    staged = df.withColumn("_blk", F.floor(F.col(order_col) / F.lit(block_size)))
    totals = staged.groupBy(part_col, "_blk").agg(F.sum(value_col).alias("_bsum"))
    if levels > 1:
        # rename before recursing: the inner level derives its own _blk
        # from ITS order column, which must not collide with ours
        inner = totals.select(
            part_col,
            F.col("_blk").alias("_ord_up"),
            F.col("_bsum").alias("_val_up"),
        )
        offsets = exclusive_prefix_sum(
            inner, part_col, "_ord_up", "_val_up",
            # out_col must differ from this level's internal "_po": the
            # implementation drops its internal names on exit
            block_size=block_size, out_col="_off_up", levels=levels - 1,
        ).select(part_col, F.col("_ord_up").alias("_blk"), F.col("_off_up").alias("_po"))
    else:
        wb = (
            W.partitionBy(part_col)
            .orderBy("_blk")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        offsets = totals.withColumn(
            "_po", F.coalesce(F.sum("_bsum").over(wb), F.lit(0))
        ).select(part_col, "_blk", "_po")
    wi = (
        W.partitionBy(part_col, "_blk")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        staged.join(offsets, [part_col, "_blk"])
        .withColumn(
            out_col,
            (F.col("_po") + F.coalesce(F.sum(value_col).over(wi), F.lit(0))).cast(
                "long"
            ),
        )
        .drop("_blk", "_po")
    )


def exclusive_prefix_max(
    df: DataFrame,
    part_col: str,
    order_col: str,
    value_col: str,
    block_size: int = 256,
    out_col: str = "_pmax",
    levels: int = 2,
) -> DataFrame:
    """Exclusive running MAX of ``value_col`` per ``part_col`` in
    ``order_col`` order — :func:`exclusive_prefix_sum`'s twin for the
    other classic scan monoid (max is associative, so the same
    block/offset/in-block decomposition applies verbatim; see that
    function for the scale rationale). The exclusive max of a
    partition's FIRST row is NULL (no predecessor) — callers decide the
    identity (disorder profiling treats it as "on time")."""
    from pyspark.sql import Window as W

    reserved = {"_blk", "_pm", "_bmax"}
    if out_col in reserved:
        raise ValueError(f"out_col must not be one of the internal names {reserved}")
    staged = df.withColumn("_blk", F.floor(F.col(order_col) / F.lit(block_size)))
    totals = staged.groupBy(part_col, "_blk").agg(F.max(value_col).alias("_bmax"))
    if levels > 1:
        inner = totals.select(
            part_col,
            F.col("_blk").alias("_ord_up"),
            F.col("_bmax").alias("_val_up"),
        )
        offsets = exclusive_prefix_max(
            inner, part_col, "_ord_up", "_val_up",
            block_size=block_size, out_col="_off_up", levels=levels - 1,
        ).select(part_col, F.col("_ord_up").alias("_blk"), F.col("_off_up").alias("_pm"))
    else:
        wb = (
            W.partitionBy(part_col)
            .orderBy("_blk")
            .rowsBetween(W.unboundedPreceding, -1)
        )
        offsets = totals.withColumn("_pm", F.max("_bmax").over(wb)).select(
            part_col, "_blk", "_pm"
        )
    wi = (
        W.partitionBy(part_col, "_blk")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        staged.join(offsets, [part_col, "_blk"])
        .withColumn(
            out_col,
            # greatest() skips NULLs, so a missing carry (first block) or
            # an empty in-block prefix (first row of a block) falls back
            # to the other side; both NULL → NULL (true first row)
            F.greatest(F.col("_pm"), F.max(value_col).over(wi)),
        )
        .drop("_blk", "_pm")
    )


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed big-side join where the small side still fits in memory
    after replication: salt the big side, explode the small side across
    all salts, join on (key, salt). Each reducer gets 1/n_salts of every
    hot key. (When the small side is genuinely small, plain broadcast()
    is simpler — this shape is for the mid-size dim that AQE demoted from
    broadcast but whose key histogram is zipfian.)"""
    salted_big = with_salt(big, n_salts)
    replicated_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted_big.join(replicated_small, [on, "_salt"], how)
    return out.drop("_salt")
