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


def test_run_metadata_table(spark, tmp_path):
    """M10/O6: append-only run registry replacing the reference's
    mtime-glob model discovery (topic_modeling.py:57-79)."""
    from bbc_news_data_pipeline_spark.sources import sinks

    path = str(tmp_path / "runs")
    sinks.run_metadata_table(spark, path, {"run_id": "r1", "k": "12", "coherence": "-1.5"})
    sinks.run_metadata_table(spark, path, {"run_id": "r2", "k": "32", "coherence": "-1.2"})
    reg = spark.read.parquet(path)
    assert reg.count() == 2
    latest = reg.orderBy(reg.run_id.desc()).first()
    assert latest.run_id == "r2" and latest.k == "32"
