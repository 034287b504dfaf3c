"""Streaming incremental near-dup (streaming/neardup.py): the band-key
index as applyInPandasWithState state. Covers (1) cross-batch detection —
a later batch's copy of an earlier doc is flagged while fresh docs are
not, (2) state survival across separate drains (the persisted-index
property q94 has in batch), and (3) single-batch equivalence to the
batch first-wins rule (dup iff sharing a band with a lower-id doc)."""

from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.operators.dedup import band_keys
from bbc_news_data_pipeline_spark.streaming.neardup import (
    canonicalize_flags,
    neardup_flags_stream,
)

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


def _chain_texts():
    """A text triple whose band sets form a CHAIN: B shares bands with A,
    C shares bands with B, but C shares NONE with A (searched offline over
    1- and 2-word substitutions of BASE; re-validated in the test itself,
    so a change to the MinHash parameters fails loudly, not silently)."""
    words = BASE.split()
    b = list(words)
    b[2] = "alpha"
    c = list(b)
    c[19] = "omega"
    return BASE, " ".join(b), " ".join(c)


def test_transitive_canonical_across_batches(spark, tmp_path):
    """The r4 verdict's A←B←C case: B duplicates A via one band, C
    duplicates B via a DIFFERENT band claimed by B. C's direct claimant
    is the dropped doc B; canonicalize_flags must resolve the chain to
    the SURVIVING ancestor A."""
    a_text, b_text, c_text = _chain_texts()

    # self-validate the fixture triple against the current LSH parameters
    trio = spark.createDataFrame(
        [(0, a_text), (1, b_text), (2, c_text)], "doc_id long, text string"
    )
    bands: dict[int, set] = {}
    for r in band_keys(trio, "doc_id", "text", 8, 4, 5).collect():
        bands.setdefault(r.doc_id, set()).add(r.band_key)
    assert bands[0] & bands[1], "fixture drift: B no longer shares a band with A"
    assert bands[1] & bands[2], "fixture drift: C no longer shares a band with B"
    assert not (bands[0] & bands[2]), "fixture drift: C shares a band with A"

    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    for doc_id, text in ((0, a_text), (10, b_text), (20, c_text)):
        spark.createDataFrame(
            [(doc_id, text)], "doc_id long, text string"
        ).coalesce(1).write.mode("append").parquet(src)
        _drain(spark, src, ckpt, out)

    flags = spark.read.parquet(out)
    # the chain is genuinely two-deep: C's DIRECT claimant is dropped B
    direct = flags.filter((F.col("doc_id") == 20) & (F.col("dup_hit") == 1))
    assert direct.agg(F.min("claimant")).collect()[0][0] == 10

    verdict = {
        r.doc_id: (r.is_neardup, r.canonical_id)
        for r in canonicalize_flags(flags).collect()
    }
    assert verdict[0] == (0, None)
    assert verdict[10] == (1, 0)
    assert verdict[20] == (1, 0)  # transitive: C -> B -> A resolves to A


def test_checkpoint_recovery_state_survives(spark, tmp_path):
    """Restarting the stream over the SAME checkpoint (each _drain call
    builds a fresh availableNow query object — a restart) with a grown
    source dir must recover band-ownership state: claimants stay stable,
    already-emitted docs are not re-flagged, and a post-restart duplicate
    is attributed to the ORIGINAL pre-restart claimant."""
    src, ckpt, out = (str(tmp_path / d) for d in ("src", "ckpt", "out"))
    spark.createDataFrame(
        [(0, BASE), (1, FRESH)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    got1 = _drain(spark, src, ckpt, out)
    assert got1 == {0: (0, None), 1: (0, None)}

    # restart #1: grown source — copy of doc 0 plus a re-delivery of doc 1
    spark.createDataFrame(
        [(10, BASE), (1, FRESH)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    got2 = _drain(spark, src, ckpt, out)
    assert got2[10] == (1, 0)  # claimant recovered from checkpointed state
    assert got2[1] == (0, None)  # re-delivered claimant not re-flagged

    # restart #2: another copy — state written AFTER the first restart
    # must persist too, and the claimant must still be the original
    spark.createDataFrame(
        [(30, BASE)], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(src)
    got3 = _drain(spark, src, ckpt, out)
    assert got3[30] == (1, 0)
    assert got3[0] == (0, None) and got3[10] == (1, 0)
