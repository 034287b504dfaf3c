"""streaming/upsert.py: versioned keyed upsert via foreachBatch —
final-table-is-a-pure-function-of-the-data under micro-batch slicing,
out-of-order arrival, redelivery, and checkpointed replay."""

import os

from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.streaming.upsert import (
    resolve_latest,
    run_stream_upsert,
    upsert_batch,
)

SCHEMA = "k long, v long, payload string"


def _stream(spark, src):
    return (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _table(spark, path):
    return {
        (r.k): (r.v, r.payload) for r in spark.read.parquet(path).collect()
    }


def test_resolve_latest_deterministic_on_ties(spark):
    df = spark.createDataFrame(
        [(1, 5, "a"), (1, 5, "b"), (1, 4, "z"), (2, 1, "x")], SCHEMA
    )
    got = {(r.k): (r.v, r.payload) for r in resolve_latest(df, "k", "v").collect()}
    # version tie (1,5): struct tiebreak picks the max payload — stable
    assert got == {1: (5, "b"), 2: (1, "x")}


def test_stream_upsert_last_version_wins(spark, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    os.makedirs(src)
    # three files = three micro-batches; versions deliberately OUT of
    # file order for k=1 (newer version arrives first)
    b1 = spark.createDataFrame([(1, 3, "one-v3"), (2, 1, "two-v1")], SCHEMA)
    b2 = spark.createDataFrame([(1, 2, "one-v2-late"), (3, 1, "three-v1")], SCHEMA)
    b3 = spark.createDataFrame([(2, 2, "two-v2"), (2, 2, "two-v2-dup")], SCHEMA)
    for i, b in enumerate((b1, b2, b3)):
        b.coalesce(1).write.parquet(f"{src}/f{i}", mode="overwrite")
        # register as files under one stream dir
    # flatten: move part files into src root with ordered names
    import glob
    import shutil

    for i in range(3):
        part = glob.glob(f"{src}/f{i}/part-*.parquet")[0]
        shutil.copy(part, f"{src}/batch_{i}.parquet")
        shutil.rmtree(f"{src}/f{i}")

    run_stream_upsert(
        _stream(spark, src), table, str(tmp_path / "ckpt"), "k", "v"
    )
    got = _table(spark, table)
    assert got == {
        1: (3, "one-v3"),        # late v2 must NOT downgrade v3
        2: (2, "two-v2-dup"),    # within-batch tie → struct tiebreak
        3: (1, "three-v1"),
    }

    # checkpointed replay: nothing new → no-op
    run_stream_upsert(
        _stream(spark, src), table, str(tmp_path / "ckpt"), "k", "v"
    )
    assert _table(spark, table) == got

    # FRESH checkpoint = full redelivery of every row: version guard
    # filters all of it — effective exactly-once without a transaction log
    run_stream_upsert(
        _stream(spark, src), table, str(tmp_path / "ckpt2"), "k", "v"
    )
    assert _table(spark, table) == got


def test_upsert_batch_rejects_null_version(spark, tmp_path):
    """NULL versions fail fast: under the strict > guard they would
    silently lose every comparison (and every struct-max tie) — an
    unorderable version is an upstream bug, not a resolvable conflict."""
    import pytest

    table = str(tmp_path / "table")
    bad = spark.createDataFrame([(1, None, "x")], SCHEMA)
    with pytest.raises(ValueError, match="NULL 'v'"):
        upsert_batch(bad, table, "k", "v")
    assert not os.path.exists(table)  # nothing written


def test_upsert_batch_self_heals_stranded_swap(spark, tmp_path):
    """A crash-stranded swap makes the table read as absent; upsert_batch
    must repair it BEFORE the existence probe, or the cross-batch version
    guard is skipped and a replayed OLD version becomes the new table."""
    table = str(tmp_path / "table")
    base = spark.createDataFrame([(1, 5, "v5")], SCHEMA)
    upsert_batch(base, table, "k", "v")
    # strand the table mid-swap (tmp complete, path renamed away)
    cur = spark.read.parquet(table)
    cur.write.mode("overwrite").parquet(f"{table}.merge.tmp")
    os.rename(table, f"{table}.merge.bak")
    # replay an OLD version: guard must hold — table stays at v5
    old = spark.createDataFrame([(1, 3, "v3-replay")], SCHEMA)
    stats = upsert_batch(old, table, "k", "v")
    assert stats == {"inserted": 0, "updated": 0, "partitions_rewritten": None}
    assert _table(spark, table) == {1: (5, "v5")}


def test_upsert_batch_partition_scoped(spark, tmp_path):
    table = str(tmp_path / "table")
    base = spark.createDataFrame(
        [(1, 1, "a"), (12, 1, "b")], SCHEMA
    ).withColumn("p", F.col("k") % 10)
    stats = upsert_batch(base, table, "k", "v", partition_col="p")
    assert stats["inserted"] == 2 and stats["partitions_rewritten"] == 2

    delta = spark.createDataFrame([(12, 2, "b2"), (22, 1, "c")], SCHEMA).withColumn(
        "p", F.col("k") % 10
    )
    stats = upsert_batch(delta, table, "k", "v", partition_col="p")
    assert stats == {"inserted": 1, "updated": 1, "partitions_rewritten": 1}
    got = {r.k: (r.v, r.payload) for r in spark.read.parquet(table).collect()}
    assert got == {1: (1, "a"), 12: (2, "b2"), 22: (1, "c")}

    # redelivery of the CURRENT version for k=12: the strict > guard
    # filters it, the merge sees an empty batch, zero partitions rewritten
    stats = upsert_batch(delta.filter(F.col("k") == 12).withColumn("v", F.lit(2)),
                         table, "k", "v", partition_col="p")
    assert stats == {"inserted": 0, "updated": 0, "partitions_rewritten": 0}
    assert {r.k: (r.v, r.payload) for r in spark.read.parquet(table).collect()} == got
