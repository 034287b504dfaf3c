"""Streaming curation (streaming/curation.py): an availableNow drain over
micro-batched documents must equal the batch curation of the distinct
input — including duplicates that arrive in DIFFERENT batches (state-
backed fingerprint dedup), the case per-batch dedup would miss."""

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.streaming.curation import (
    curate_docs_stream,
    run_docs_curation,
)


def _write_batch(df, path):
    """One micro-batch must be a single parquet FILE (the file stream
    source does not recurse into subdirectories)."""
    pq.write_table(pa.Table.from_pandas(df.toPandas()), str(path))


def test_stream_curation_equals_batch_with_cross_batch_dups(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = docs.filter(F.col("doc_id") < 60)
    b = docs.filter(F.col("doc_id") >= 60)
    dup_again = docs.filter(F.col("doc_id") < 15)  # re-sent in batch 2

    src = tmp_path / "src"
    src.mkdir()
    # one file per micro-batch; duplicates of batch-1 rows ride in batch 2
    _write_batch(a, src / "b1.parquet")
    _write_batch(b.unionByName(dup_again), src / "b2.parquet")

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_docs_curation(spark, str(src), out, ckpt)
    got = spark.read.parquet(out)

    # batch twin over the distinct input (exact rows re-sent → first-seen
    # winner is the same row, so results must match exactly)
    expect = curate_docs_stream(docs)
    g = sorted(map(tuple, got.select("doc_id", "lang", "n_tokens").collect()))
    e = sorted(map(tuple, expect.select("doc_id", "lang", "n_tokens").collect()))
    assert g == e and len(g) > 0
    # no duplicate docs survived, despite cross-batch duplicates
    assert got.count() == got.select("doc_id").distinct().count()


def test_stream_curation_rerun_is_incremental(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(docs.filter(F.col("doc_id") < 80), src / "b1.parquet")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_docs_curation(spark, str(src), out, ckpt)
    n1 = spark.read.parquet(out).count()

    # second drain with no new files: checkpoint makes it a no-op
    run_docs_curation(spark, str(src), out, ckpt)
    assert spark.read.parquet(out).count() == n1

    # new batch appends only its own (deduped) contribution
    _write_batch(docs.filter((F.col("doc_id") >= 80) & (F.col("doc_id") < 160)), src / "b2.parquet")
    run_docs_curation(spark, str(src), out, ckpt)
    n2 = spark.read.parquet(out).count()
    assert n2 > n1
    # exactly-once: union of both drains has no fingerprint collisions
    final = spark.read.parquet(out)
    assert final.count() == final.select("doc_id").distinct().count()


# --- streaming corpus build (q277's operator core) ---------------------------


def test_stream_corpus_build_equals_batch_delta(spark, sf_dir, tmp_path):
    """Two micro-batches folded through apply_corpus_batch must leave a
    manifest BIT-identical to the batch delta build (q267's operator)
    over the same epoch tagging and salts — the ST6 contract for the
    whole flagship chain, plus the dedup-probe check: a second-batch doc
    duplicating a first-batch text never reaches the corpus."""
    from pyspark.sql import functions as F

    from bbc_news_data_pipeline_spark.operators.curation import (
        delta_corpus_build,
    )
    from bbc_news_data_pipeline_spark.streaming.corpusbuild import (
        apply_corpus_batch,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "text")
        .withColumn("e", (F.col("doc_id") % 2).cast("int"))
    )
    state = str(tmp_path / "state")
    for ep in (0, 1):
        apply_corpus_batch(
            spark,
            docs.filter(F.col("e") == ep).drop("e"),
            state,
            salt_mix="scbmix", salt_shuf="scbshuf", salt_sum="scbsum",
        )
    got = {
        r.shard_id: (r.n_docs, r.n_tokens, r.n_spanning, r.checksum)
        for r in spark.read.parquet(f"{state}/manifest").collect()
    }
    want = {
        r.shard_id: (r.n_docs, r.n_tokens, r.n_spanning, r.checksum)
        for r in delta_corpus_build(
            docs,
            salt_mix="scbmix", salt_shuf="scbshuf", salt_sum="scbsum",
        ).collect()
    }
    assert got == want

    # dedup probe across batches: replaying batch-0 documents as a third
    # batch must change NOTHING (all fingerprints already indexed)
    apply_corpus_batch(
        spark,
        docs.filter(F.col("e") == 0).drop("e"),
        state,
        salt_mix="scbmix", salt_shuf="scbshuf", salt_sum="scbsum",
    )
    after = {
        r.shard_id: (r.n_docs, r.n_tokens, r.n_spanning, r.checksum)
        for r in spark.read.parquet(f"{state}/manifest").collect()
    }
    assert after == got
