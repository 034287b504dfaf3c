"""Bucketed-table co-located joins (sinks.write_bucketed_table): two
tables bucketed on the join key must join WITHOUT any shuffle exchange,
and bucket-key aggregation must also be exchange-free — the physical
plans prove the 100 TB co-location strategy, not just the API."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    from bbc_news_data_pipeline_spark.sources.sinks import write_bucketed_table

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    write_bucketed_table(orders, "b_orders", str(tmp_path / "o"), "o_orderkey", 8)
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", str(tmp_path / "l"), "o_orderkey", 8,
    )
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_is_shuffle_free(spark, bucketed_pair):
    orders, lineitem = bucketed_pair
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = lineitem.join(orders, "o_orderkey").groupBy("o_orderstatus").agg(
            F.round(F.sum("l_extendedprice"), 2).alias("rev")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # join itself consumes the bucket layout: the ONLY exchange allowed
        # is the one for the final (non-bucket-key) groupBy
        assert plan.count("Exchange") == 1, plan
        assert "SortMergeJoin" in plan
        assert joined.count() > 0  # plan executes, not just explains
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_agg_on_bucket_key_is_exchange_free(spark, bucketed_pair):
    _, lineitem = bucketed_pair
    agg = lineitem.groupBy("o_orderkey").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_pair):
    orders, lineitem = bucketed_pair
    got = (
        lineitem.join(orders, "o_orderkey")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
        .collect()[0]
    )
    po = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pl = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exp = (
        pl.join(po, pl.l_orderkey == po.o_orderkey)
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 2).alias("q"))
        .collect()[0]
    )
    assert (got.n, got.q) == (exp.n, exp.q)
