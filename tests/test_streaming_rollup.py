"""Streaming rollup maintenance (streaming/rollup.py): draining events
as micro-batches through foreachBatch + incremental_update must equal
one batch rollup over all events, and a re-drain with no new files must
be a checkpoint no-op."""

import glob
import shutil

from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.operators.incremental import rollup_events
from bbc_news_data_pipeline_spark.sources.tables import load
from bbc_news_data_pipeline_spark.streaming.rollup import run_streaming_rollup


def _write_batch(df, tmp_path, src, name):
    stage = tmp_path / f"stage_{name}"
    df.coalesce(1).write.parquet(str(stage))
    shutil.move(glob.glob(str(stage / "part-*.parquet"))[0], str(src / name))


def _state(df):
    return sorted(
        map(
            tuple,
            df.select(
                "day", "event_type", "n",
                F.round("sum_value", 4), F.round("sum_sq", 4),
            ).collect(),
        )
    )


def test_streaming_rollup_equals_batch(spark, sf_dir, tmp_path):
    ev = load(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"),
        "user_id", "event_type", "value",
    )
    src = tmp_path / "src"
    src.mkdir()
    # three micro-batches split by day ranges — batch 2 and 3 share day
    # boundaries with their neighbors, exercising the partition merge
    _write_batch(ev.filter(F.dayofmonth("ts") <= 12), tmp_path, src, "b1.parquet")
    _write_batch(
        ev.filter((F.dayofmonth("ts") > 12) & (F.dayofmonth("ts") <= 22)),
        tmp_path, src, "b2.parquet",
    )
    _write_batch(ev.filter(F.dayofmonth("ts") > 22), tmp_path, src, "b3.parquet")

    rollup_dir, ckpt = str(tmp_path / "rollup"), str(tmp_path / "ckpt")
    run_streaming_rollup(spark, str(src), rollup_dir, ckpt)

    got = _state(spark.read.parquet(rollup_dir))
    expect = _state(rollup_events(ev))
    assert got == expect and len(got) > 0

    # checkpointed re-drain with no new files: state unchanged
    run_streaming_rollup(spark, str(src), rollup_dir, ckpt)
    assert _state(spark.read.parquet(rollup_dir)) == expect
