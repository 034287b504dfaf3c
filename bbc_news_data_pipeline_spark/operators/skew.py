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
