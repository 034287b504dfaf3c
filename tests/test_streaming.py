"""Structured Streaming semantics (SURVEY §2.10): availableNow drains,
exactly-once url dedup across micro-batches, stream==batch equivalence
for windowed aggregation."""

import pytest
from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.sources.tables import load
from bbc_news_data_pipeline_spark.streaming.ingest import (
    LINK_SCHEMA,
    run_links_ingest,
    windowed_event_counts,
)


def _write_batch(spark, rows, path):
    spark.createDataFrame(rows, LINK_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_streaming_link_dedup_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # duplicates split ACROSS micro-batch files (FIXTURES.md §7)
    _write_batch(spark, [("u1", "2024-01-01"), ("u2", "2024-01-02")], src)
    _write_batch(spark, [("u2", "2024-01-03"), ("u3", None)], src)

    run_links_ingest(spark, src, out, ckpt)
    got = {r.url for r in spark.read.parquet(out).collect()}
    assert got == {"u1", "u2", "u3"}
    assert spark.read.parquet(out).count() == 3  # exactly-once per url

    # incremental restart: a third batch with one old + one new url
    _write_batch(spark, [("u1", "2024-01-09"), ("u4", "2024-01-10")], src)
    run_links_ingest(spark, src, out, ckpt)
    assert spark.read.parquet(out).count() == 4  # state survived the restart


def test_stream_static_anti_join(spark, tmp_path):
    src = str(tmp_path / "src2")
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    _write_batch(spark, [("u1", "2024-01-01"), ("u2", "2024-01-02")], src)
    scraped = spark.createDataFrame([("u1",)], "url string")
    run_links_ingest(spark, src, out, ckpt, already_scraped=scraped)
    assert {r.url for r in spark.read.parquet(out).collect()} == {"u2"}


def test_windowed_counts_stream_equals_batch(spark, sf_dir, tmp_path):
    """availableNow over the events table == the q50 batch twin."""
    events = load(spark, sf_dir, "events")
    # stream source: re-write events as parquet micro-batch input
    src = str(tmp_path / "ev")
    events.write.parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)

    agg = windowed_event_counts(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.sql("SELECT * FROM win_counts").toPandas()

    from bbc_news_data_pipeline_spark.plans.streaming_plans import q50_hourly_windows

    batch = q50_hourly_windows(spark, sf_dir).toPandas()
    key = ["window_start", "event_type"]
    s = streamed.sort_values(key).reset_index(drop=True)
    b = batch.sort_values(key).reset_index(drop=True)
    assert len(s) == len(b)
    assert (s["n"].values == b["n"].values).all()
    assert (abs(s["total_value"].values - b["total_value"].values) < 1e-9).all()


def test_bounded_watermark_dedup(spark, tmp_path):
    """ST5: dropDuplicatesWithinWatermark keyed on lastmod event time —
    bounded state, duplicates within the watermark removed."""
    from bbc_news_data_pipeline_spark.streaming.ingest import (
        dedup_links_stream_bounded,
        read_links_stream,
    )

    src = str(tmp_path / "src3")
    out = str(tmp_path / "out3")
    ckpt = str(tmp_path / "ckpt3")
    _write_batch(
        spark,
        [
            ("u1", "2024-01-01T10:00:00"),
            ("u1", "2024-01-01T10:30:00"),  # dup within watermark
            ("u2", "2024-01-01T11:00:00"),
            ("u3", None),  # unparseable lastmod → dropped (quarantine path)
        ],
        src,
    )
    stream = dedup_links_stream_bounded(read_links_stream(spark, src), watermark="2 hours")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert got.count() == 2
    assert {r.url for r in got.collect()} == {"u1", "u2"}
    assert set(got.columns) == {"url", "lastmod"}


def test_stream_dedup_ttl_collapses_redelivery(spark, sf_dir):
    """q212: a doubled feed must collapse to exactly one surviving row
    per event_id through the NATIVE dropDuplicatesWithinWatermark drain
    — counts, exact id/cent sums, and ts extrema equal the plain
    distinct table's."""
    from pyspark.sql import functions as F

    from bbc_news_data_pipeline_spark.plans.streaming_plans import (
        q212_stream_dedup_ttl,
    )

    r = q212_stream_dedup_ttl(spark, sf_dir).collect()[0]
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    want = ev.agg(
        F.count("*").alias("n"),
        F.sum(F.col("event_id").cast("decimal(38,0)")).cast("double").alias("si"),
        F.sum(
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("decimal(38,0)")
        ).cast("double").alias("sc"),
        F.min("ts").alias("mn"),
        F.max("ts").alias("mx"),
    ).collect()[0]
    assert r.n_rows == r.n_ids == want.n
    assert r.sum_ids == want.si and r.sum_cents == want.sc
    assert (r.min_ts, r.max_ts) == (want.mn, want.mx)


def test_drain_state_partitions_scoped_and_restored(spark):
    """_drain_to_memory(state_partitions=N) must (a) run the stateful
    stream at N shuffle/state partitions, (b) restore the session conf
    afterwards — including on failure — and (c) not change results
    (r10: bounded-key state drains at the key-domain partition count)."""
    from bbc_news_data_pipeline_spark.plans.streaming_plans import (
        _drain_to_memory,
    )

    before = spark.conf.get("spark.sql.shuffle.partitions")
    src = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3)], "k string, v long"
    )

    seen = {}

    def agg_stream(st):
        seen["parts"] = st.sparkSession.conf.get("spark.sql.shuffle.partitions")
        return st.groupBy("k").agg(F.sum("v").alias("s"))

    out = _drain_to_memory(
        src, agg_stream, "tdrainsp", output_mode="complete",
        state_partitions=3,
    )
    assert seen["parts"] == "3"
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
    assert {(r.k, r.s) for r in out.collect()} == {("a", 3), ("b", 3)}

    # restore-on-failure: a transform that raises must not leak the conf
    def boom(st):
        raise RuntimeError("boom")

    with pytest.raises(RuntimeError):
        _drain_to_memory(src, boom, "tdrainsp2", state_partitions=5)
    assert spark.conf.get("spark.sql.shuffle.partitions") == before
