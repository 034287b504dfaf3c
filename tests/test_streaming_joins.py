"""Stream-stream interval join (streaming/joins.py): a full availableNow
drain must equal the batch range join over the same events — including
pairs whose click and error arrive in DIFFERENT micro-batches (the case
a per-batch join would miss), and re-draining with no new files must be
a checkpoint no-op."""

import glob
import shutil

from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.operators.timeseries import binned_range_join
from bbc_news_data_pipeline_spark.sources.tables import load
from bbc_news_data_pipeline_spark.streaming.joins import run_error_click_join

WINDOW_S = 6 * 3600


def _write_batch(df, tmp_path, src, name):
    """One micro-batch = one parquet FILE in src (the file stream source
    does not recurse); write via Spark so timestamp columns carry the
    UTC-adjusted parquet annotation TimestampType expects."""
    stage = tmp_path / f"stage_{name}"
    df.coalesce(1).write.parquet(str(stage))
    shutil.move(glob.glob(str(stage / "part-*.parquet"))[0], str(src / name))


def _batch_expected(ev):
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    return binned_range_join(
        errors, clicks, on="user_id", left_ts="ts", right_ts="click_ts",
        window_s=WINDOW_S,
    ).select(
        "event_id",
        "click_id",
        "user_id",
        (F.unix_micros("ts") - F.unix_micros("click_ts")).alias("gap_us"),
    )


def test_stream_join_equals_batch_across_batches(spark, sf_dir, tmp_path):
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "error"))
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"),
                "user_id", "event_type")
    )
    # split by TIME so a cross-batch pair is GUARANTEED: cut at the ts of
    # a matched error — its click (strictly earlier) lands in batch 1,
    # the error itself in batch 2
    expect_rows = sorted(map(tuple, _batch_expected(ev).collect()))
    assert expect_rows, "no matched pairs in fixture data"
    target_error = expect_rows[len(expect_rows) // 2][0]
    cut = ev.filter(F.col("event_id") == target_error).first().ts
    early = ev.filter(F.col("ts") < F.lit(cut))
    late = ev.filter(F.col("ts") >= F.lit(cut))

    src = tmp_path / "src"
    src.mkdir()
    _write_batch(early, tmp_path, src, "b1.parquet")
    _write_batch(late, tmp_path, src, "b2.parquet")

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_error_click_join(spark, str(src), out, ckpt, window_s=WINDOW_S)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    assert got == expect_rows and len(got) > 0

    # sanity: at least one joined pair straddles the batch boundary
    early_clicks = {r.event_id for r in early.filter(
        F.col("event_type") == "click").collect()}
    late_errors = {r.event_id for r in late.filter(
        F.col("event_type") == "error").collect()}
    assert any(c in early_clicks and e in late_errors for e, c, _, _ in got)


def test_stream_join_redrain_is_noop(spark, sf_dir, tmp_path):
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "error"))
        .filter(F.col("user_id") < 20)
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"),
                "user_id", "event_type")
    )
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(ev, tmp_path, src, "b1.parquet")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_error_click_join(spark, str(src), out, ckpt, window_s=WINDOW_S)
    n1 = spark.read.parquet(out).count()
    run_error_click_join(spark, str(src), out, ckpt, window_s=WINDOW_S)
    assert spark.read.parquet(out).count() == n1 and n1 > 0
