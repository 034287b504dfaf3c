"""Salting operators: two-phase skewed aggregation and salted join must
equal their plain equivalents (operators/skew.py)."""

import pytest
from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.operators.skew import (
    salted_broadcast_join,
    salted_count,
    salted_sum,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # zipfian: one hot key with 5000 rows, a cold tail of 50 keys
    hot = spark.range(5000).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    tail = spark.range(50).select(
        F.concat(F.lit("cold"), F.col("id")).alias("k"), F.lit(1.0).alias("v")
    )
    return hot.unionAll(tail)


def test_salted_count_equals_plain(spark, skewed):
    plain = {r.k: r.n for r in skewed.groupBy("k").agg(F.count("*").alias("n")).collect()}
    salted = {r.k: r.n for r in salted_count(skewed, ["k"]).collect()}
    assert salted == plain
    assert salted["hot"] == 5000


def test_salted_sum_equals_plain(spark, skewed):
    plain = {r.k: r.s for r in skewed.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {r.k: r.total for r in salted_sum(skewed, ["k"], "v").collect()}
    assert set(salted) == set(plain)
    assert all(abs(salted[k] - plain[k]) < 1e-9 for k in plain)


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold0", "C0"), ("cold1", "C1")], "k string, label string"
    )
    plain = (
        skewed.join(dim, "k").groupBy("k", "label").agg(F.count("*").alias("n"))
    )
    salted = (
        salted_broadcast_join(skewed, dim, on="k", n_salts=8)
        .groupBy("k", "label")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_is_deterministic_under_recompute(spark, skewed):
    from bbc_news_data_pipeline_spark.operators.skew import with_salt

    s = with_salt(skewed, n_salts=8)
    a = s.groupBy("_salt").count().collect()
    b = s.groupBy("_salt").count().collect()  # forces full recompute
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0 <= r._salt < 8 for r in a)
