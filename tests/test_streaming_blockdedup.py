"""Streaming block dedup (streaming/blockdedup.py): the seen-block index
as applyInPandasWithState state. Covers (1) cross-batch stripping — a
later batch's copy of an earlier block is dropped while fresh blocks
survive, (2) owner re-delivery idempotence, and (3) single-batch
equivalence to the batch block_dedup operator on the same input."""

from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.operators.dedup import block_dedup, reassemble_blocks
from bbc_news_data_pipeline_spark.streaming.blockdedup import block_flags_stream

BLK_A = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"  # one exact 10-token block
BLK_B = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
BLK_C = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"


def _drain(spark, src, ckpt, out_dir):
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        block_flags_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        r.doc_id: (r.n_blocks, r.n_kept, r.new_text)
        for r in reassemble_blocks(spark.read.parquet(out_dir), "doc_id").collect()
    }


def test_cross_batch_block_stripping(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(0, BLK_A + " " + BLK_B)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    got1 = _drain(spark, src, ckpt, str(tmp_path / "out"))
    assert got1[0] == (2, 2, BLK_A + " " + BLK_B)

    # batch 2: doc 10 repeats BLK_A (must be stripped), brings fresh BLK_C
    spark.createDataFrame(
        [(10, BLK_A + " " + BLK_C)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    got2 = _drain(spark, src, ckpt, str(tmp_path / "out"))
    assert got2[10] == (2, 1, BLK_C)

    # RE-DELIVERY idempotence: the owner arriving again keeps its blocks
    spark.createDataFrame(
        [(0, BLK_A + " " + BLK_B)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    got3 = _drain(spark, src, ckpt, str(tmp_path / "out"))
    # accumulated output now holds TWO emissions for doc 0's blocks (one
    # per delivery), both keep=1 — dedupe by (doc_id, bidx) before the
    # fold, as a real sink consumer would
    flags = (
        spark.read.parquet(str(tmp_path / "out"))
        .groupBy("doc_id", "bidx", "block")
        .agg(F.max("keep").alias("keep"))
    )
    got3 = {
        r.doc_id: (r.n_blocks, r.n_kept, r.new_text)
        for r in reassemble_blocks(flags, "doc_id").collect()
    }
    assert got3[0] == (2, 2, BLK_A + " " + BLK_B)


def test_single_batch_equals_batch_operator(spark, tmp_path):
    """One micro-batch drain must reproduce the batch operator's output
    exactly — including in-doc repeats and cross-doc ties broken by
    (doc_id, bidx)."""
    rows = [
        (0, BLK_A + " " + BLK_A),              # in-doc repeat
        (1, BLK_B + " " + BLK_A),              # cross-doc repeat
        (2, "short tail words"),               # single partial block
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    df.coalesce(1).write.parquet(src)
    got = _drain(spark, src, ckpt, str(tmp_path / "out"))
    expect = {
        r.doc_id: (r.n_blocks, r.n_kept, r.new_text)
        for r in block_dedup(df, "doc_id", "text").collect()
    }
    assert got == expect
