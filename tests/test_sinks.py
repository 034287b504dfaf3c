"""Write-path semantics: S9 keyed append (insert-if-absent), S10
overwrite, S11/S12 CSV; idempotency properties (SURVEY §5.2.5)."""

import pytest

from bbc_news_data_pipeline_spark.sources import sinks


@pytest.fixture()
def links(spark):
    return spark.createDataFrame(
        [("u1", "2024-01-01"), ("u2", "2024-01-02"), ("u2", "2024-01-03")],
        "url string, lastmod string",
    )


def test_keyed_append_insert_if_absent(spark, links, tmp_path):
    path = str(tmp_path / "links")
    n1 = sinks.keyed_append(spark, links, path, key="url")
    assert n1 == 2  # within-batch dup on u2 collapsed
    n2 = sinks.keyed_append(spark, links, path, key="url")
    assert n2 == 0  # replay is a no-op (DuplicateKeyError-swallow semantics)
    assert spark.read.parquet(path).count() == 2

    more = spark.createDataFrame([("u3", None)], "url string, lastmod string")
    assert sinks.keyed_append(spark, more, path, key="url") == 1
    assert spark.read.parquet(path).count() == 3


def test_overwrite_table(spark, links, tmp_path):
    path = str(tmp_path / "t")
    sinks.overwrite_table(links, path)
    sinks.overwrite_table(links.limit(1), path)
    assert spark.read.parquet(path).count() == 1  # truncate-and-load


def test_partitioned_csv(spark, tmp_path):
    df = spark.createDataFrame(
        [(0, "alpha"), (0, "beta"), (1, "gamma")], "topic_id int, word string"
    )
    out = str(tmp_path / "csv")
    sinks.write_csv(df, out, partition_by="topic_id")
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 3
    assert sorted(back.columns) == ["topic_id", "word"]


def test_table_exists(spark, links, tmp_path):
    path = str(tmp_path / "x")
    assert not sinks.table_exists(spark, path)
    sinks.overwrite_table(links, path)
    assert sinks.table_exists(spark, path)
