"""Custom stateful streaming sessionization (applyInPandasWithState) —
closed sessions from the stream must equal the batch gap-sessionizer's
(q21 semantics) on the same events."""

from datetime import datetime, timedelta

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.streaming.sessions import sessionize_stream

BASE = datetime(2024, 3, 1, 12, 0, 0)
GAP_S = 1800


@pytest.fixture(scope="module")
def events(spark):
    rows = []
    # user 1: two sessions (3 events, 40-min gap, 2 events), then sentinel
    for m in (0, 5, 10):
        rows.append((1, BASE + timedelta(minutes=m)))
    for m in (50, 55):
        rows.append((1, BASE + timedelta(minutes=m)))
    # user 2: one session of 4 events
    for m in (0, 10, 20, 29):
        rows.append((2, BASE + timedelta(minutes=m)))
    # sentinels far in the future close every prior session intra-batch
    for u in (1, 2):
        rows.append((u, BASE + timedelta(days=30)))
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_stateful_sessionize_matches_batch(spark, events, tmp_path):
    src = str(tmp_path / "ev_src")
    events.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)

    q = (
        sessionize_stream(stream, gap_s=GAP_S)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }

    expect = {
        (1, BASE, BASE + timedelta(minutes=10), 3),
        (1, BASE + timedelta(minutes=50), BASE + timedelta(minutes=55), 2),
        (2, BASE, BASE + timedelta(minutes=29), 4),
    }
    assert got == expect  # sentinel-opened sessions stay open → not emitted


def test_stateful_sessionize_state_survives_batches(spark, tmp_path):
    """Events of ONE session split across two micro-batch files must not
    split the session: state carries the open session across batches."""
    src = str(tmp_path / "ev_src2")
    ckpt = str(tmp_path / "ckpt2")
    out_rows = []

    b1 = [(7, BASE), (7, BASE + timedelta(minutes=10))]
    b2 = [(7, BASE + timedelta(minutes=20)), (7, BASE + timedelta(hours=5))]
    spark.createDataFrame(b1, "user_id long, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def drain():
        stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
        q = (
            sessionize_stream(stream, gap_s=GAP_S)
            .writeStream.format("parquet")
            .option("path", str(tmp_path / "sess_out"))
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()  # batch 1: session still open, nothing emitted
    spark.createDataFrame(b2, "user_id long, ts timestamp").coalesce(1).write.mode(
        "append"
    ).parquet(src)
    drain()  # batch 2: 20-min event extends; 5h event closes it

    got = [
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.read.parquet(str(tmp_path / "sess_out")).collect()
    ]
    assert got == [(7, BASE, BASE + timedelta(minutes=20), 3)]
