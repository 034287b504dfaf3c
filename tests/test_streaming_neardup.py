"""Streaming incremental near-dup (streaming/neardup.py): the band-key
index as applyInPandasWithState state. Covers (1) cross-batch detection —
a later batch's copy of an earlier doc is flagged while fresh docs are
not, (2) state survival across separate drains (the persisted-index
property q94 has in batch), and (3) single-batch equivalence to the
batch first-wins rule (dup iff sharing a band with a lower-id doc)."""

from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.operators.dedup import band_keys
from bbc_news_data_pipeline_spark.streaming.neardup import neardup_flags_stream

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away tonight "
    "while stars shine brightly above the quiet town near the river bend"
)
FRESH = (
    "completely different words about spark engines and distributed query "
    "planning at massive scale with broadcast joins everywhere in clusters"
)


def _drain(spark, src, ckpt, out_dir):
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        neardup_flags_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        r.doc_id: (r.mx, r.canon)
        for r in spark.read.parquet(out_dir)
        .groupBy("doc_id")
        .agg(
            F.max("dup_hit").alias("mx"),
            F.min(F.when(F.col("dup_hit") == 1, F.col("claimant"))).alias("canon"),
        )
        .collect()
    }


def test_cross_batch_neardup_flags(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(0, BASE), (1, FRESH)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    got1 = _drain(spark, src, ckpt, str(tmp_path / "out"))
    assert got1 == {0: (0, None), 1: (0, None)}  # first arrivals claim their bands

    spark.createDataFrame(
        [
            (10, BASE),  # copy of doc 0 → must be flagged
            (11, "fresh unseen sentences about tensors and gradient descent "
                 "optimizers stepping through loss landscapes very carefully"),
        ],
        "doc_id long, text string",
    ).coalesce(1).write.mode("append").parquet(src)
    got2 = _drain(spark, src, ckpt, str(tmp_path / "out"))
    assert got2[10] == (1, 0)  # flagged, canonical = the batch-1 original
    assert got2[11] == (0, None)

    # RE-DELIVERY idempotence: the claimant itself arriving again (source
    # replay) must NOT be marked a duplicate of itself
    spark.createDataFrame(
        [(0, BASE)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    got3 = _drain(spark, src, ckpt, str(tmp_path / "out"))
    assert got3[0] == (0, None)


def test_single_batch_matches_batch_first_wins(spark, tmp_path):
    """One micro-batch: dup_hit must equal the batch rule 'shares any
    band with a lower-id doc' computed independently from band_keys."""
    rows = [
        (0, BASE),
        (1, BASE),                              # exact dup of 0
        (2, BASE.replace("lazy", "sleepy")),    # near dup (may share bands)
        (3, FRESH),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    src, ckpt = str(tmp_path / "src1b"), str(tmp_path / "ckpt1b")
    df.coalesce(1).write.parquet(src)
    got = _drain(spark, src, ckpt, str(tmp_path / "out1b"))

    bk = band_keys(df, "doc_id", "text", 8, 4, 5)
    l, r = bk.alias("l"), bk.alias("r")
    flagged = {
        x.doc_id
        for x in l.join(
            r,
            (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") > F.col("r.doc_id")),
        ).select(F.col("l.doc_id").alias("doc_id")).distinct().collect()
    }
    hit_flags = {d: h for d, (h, _) in got.items()}
    expect = {i: (1 if i in flagged else 0) for i in (0, 1, 2, 3)}
    assert hit_flags == expect
    assert got[1] == (1, 0) and got[0] == (0, None)  # dup maps to original
