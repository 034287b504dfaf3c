"""Streaming IVF postings maintenance — the ANN-index twin of
corpusbuild.py's dedup-state fold (round-8 verdict task #7).

A production IVF deployment trains its coarse quantizer OFFLINE (the
q268 Lloyd pass) and then maintains the index ONLINE: every ingest batch
assigns new vectors to the existing centroids, appends postings, and
tracks per-cell residual energy so the operator knows when the frozen
centroids have drifted far enough from the data to warrant a re-train
(FAISS's `add` vs `train` split; Jégou et al. 2011 §IV assume exactly
this regime). This module is that maintenance job as a foreachBatch
fold over three stored state tables:

  centroids/  — the frozen coarse quantizer (written once, pre-stream);
  postings/   — append-only (vec_id, cell, r2) inverted-list entries;
  cellstats/  — per-cell (n, sum_r2) folds PLUS the frozen baseline
                (base_n, base_sum_r2) captured from the FIRST batch —
                the residual-energy reference the drift test compares
                against.

Invariants (mirrored by q282's full-rebuild oracle and pinned in
tests/test_streaming_annindex.py):
  * replay-idempotent: re-delivering a batch is a no-op (vec_id
    anti-join against stored postings);
  * incremental ≡ batch: after any prefix of batches, (n, sum_r2) per
    cell equal a from-scratch rebuild over the union of those batches —
    all folds are exact int64 sums;
  * baseline frozen: cells first seen AFTER batch 0 carry base_n = 0
    (the baseline epoch has passed), and stored baselines never change.

Int64 headroom (the block_size-style bound): r2 ≤ dim·(Δmax)² in
QUANT_SCALE² units — ≈6.4e13 on this fixture's ×16-anchored geometry —
so a cell's sum_r2 stays exact below ~1.4e5 vectors/cell here (~9e6 at
unit-norm geometry, r2 ≈ 1e12). Shard cells or widen to decimal(38,0)
past that.

State writes are per-batch non-atomic exactly as corpusbuild.py
documents; the availableNow drains are single-threaded and re-runnable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .corpusbuild import _exists


def apply_postings_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
) -> dict:
    """Fold one micro-batch of (vec_id, embedding) into the stored
    postings + cellstats, assigning against the frozen centroids."""
    from ..operators.similarity import _qint, sq_l2_q

    cents_p, post_p, stats_p = (
        os.path.join(state_dir, t) for t in ("centroids", "postings", "cellstats")
    )
    cents = spark.read.parquet(cents_p)  # frozen; missing = config error → loud
    ncell = cents.count()

    # clustered-corpus derivation shared with q268/q281: anchor + own vec
    vecs = (
        batch_df.filter(F.col("vec_id") >= ncell)
        .select("vec_id", _qint(F.col("embedding")).alias("v"))
        .withColumn("_ac", F.col("vec_id") % ncell)
        .join(F.broadcast(cents.withColumnRenamed("cell", "_ac")), "_ac")
        .select(
            "vec_id", F.zip_with("cvec", "v", lambda a, b: a + b).alias("v")
        )
    )
    # replay idempotence: drop vectors the index already holds
    if _exists(spark, post_p):
        vecs = vecs.join(
            spark.read.parquet(post_p).select("vec_id"), "vec_id", "left_anti"
        )
    new_post = (
        vecs.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            F.struct(
                sq_l2_q(F.col("v"), F.col("cvec")).alias("d"),
                F.col("cell").alias("cell"),
            ).alias("dc"),
        )
        .groupBy("vec_id")
        .agg(F.min("dc").alias("b"))
        .select(
            "vec_id",
            F.col("b.cell").alias("cell"),
            F.col("b.d").cast("long").alias("r2"),
        )
        .localCheckpoint()  # EAGER: feeds stats fold + postings append
    )
    bstats = new_post.groupBy("cell").agg(
        F.count("*").cast("long").alias("n1"),
        F.sum("r2").cast("long").alias("s1"),
    )
    z = F.lit(0).cast("long")
    if _exists(spark, stats_p):
        stored = spark.read.parquet(stats_p)
        merged = (
            stored.join(bstats, "cell", "full")
            .select(
                "cell",
                (F.coalesce("n", z) + F.coalesce("n1", z)).alias("n"),
                (F.coalesce("sum_r2", z) + F.coalesce("s1", z)).alias("sum_r2"),
                # baseline frozen: cells first seen after batch 0 get 0
                F.coalesce("base_n", z).alias("base_n"),
                F.coalesce("base_sum_r2", z).alias("base_sum_r2"),
            )
        )
    else:
        # FIRST batch: its stats ARE the baseline
        merged = bstats.select(
            "cell",
            F.col("n1").alias("n"),
            F.col("s1").alias("sum_r2"),
            F.col("n1").alias("base_n"),
            F.col("s1").alias("base_sum_r2"),
        )
    merged = merged.localCheckpoint()  # safe to overwrite the source below
    merged.write.mode("overwrite").parquet(stats_p)
    new_post.write.mode("append").parquet(post_p)
    return {"batch_vecs": new_post.count()}


def run_stream_postings(
    stream_df: DataFrame, state_dir: str, ckpt_dir: str
) -> None:
    """Drain every available micro-batch of vectors into the index state."""
    (
        stream_df.writeStream.foreachBatch(
            lambda bdf, _id: apply_postings_batch(bdf.sparkSession, bdf, state_dir)
        )
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
