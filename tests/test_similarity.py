"""Similarity-search operators vs numpy ground truth."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.operators import similarity


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(42)
    base = rng.normal(size=8).astype("float32")
    rows = []
    for i in range(50):
        if i < 25:  # cluster around base
            v = base + rng.normal(scale=0.1, size=8).astype("float32")
        else:  # scattered
            v = rng.normal(size=8).astype("float32")
        rows.append((i, [float(x) for x in v]))
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_matches_numpy(spark, vectors):
    rows, df = vectors
    qv = df.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    got = {
        r.vec_id: r.cos_sim
        for r in similarity.cosine_topk(df.filter("vec_id != 0"), qv, k=49).collect()
    }
    q = np.array(rows[0][1], dtype="float64")
    for vid, vec in rows[1:]:
        ref = float(np.dot(q, vec) / (np.linalg.norm(q) * np.linalg.norm(vec)))
        assert got[vid] == pytest.approx(round(ref, 4), abs=2e-4)


def test_topk_order(spark, vectors):
    rows, df = vectors
    qv = df.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    top = similarity.cosine_topk(df.filter("vec_id != 0"), qv, k=10).collect()
    sims = [r.cos_sim for r in top]
    assert sims == sorted(sims, reverse=True)
    assert all(r.vec_id < 25 for r in top)  # top-k all from the planted cluster


def test_lsh_bucket_ann_finds_cluster(spark, vectors):
    rows, df = vectors
    rng = np.random.default_rng(7)
    planes = [[float(x) for x in rng.normal(size=8)] for _ in range(6)]
    pairs = similarity.lsh_bucket_ann(df, planes, min_cos=0.95).collect()
    assert len(pairs) > 0
    # high-cosine pairs can only come from the planted cluster
    assert all(r.id_a < 25 and r.id_b < 25 for r in pairs)
    assert all(r.cos_sim >= 0.95 for r in pairs)


def test_embedding_neardup_survivors(spark, vectors):
    """Greedy first-wins dedup over LSH candidate edges: a vector survives
    iff no lower-id vector shares its bucket with cosine >= threshold."""
    rows, df = vectors
    rng = np.random.default_rng(7)
    planes = [[float(x) for x in rng.normal(size=8)] for _ in range(6)]
    pairs = similarity.lsh_bucket_ann(df, planes, min_cos=0.95)
    dropped = {r.id_b for r in pairs.select("id_b").distinct().collect()}
    survivors = {
        r.vec_id
        for r in df.join(
            F.broadcast(pairs.select(F.col("id_b").alias("vec_id")).distinct()),
            "vec_id",
            "left_anti",
        ).collect()
    }
    assert survivors == {i for i, _ in rows} - dropped
    # scattered vectors (no near neighbors at 0.95) all survive
    assert {i for i in range(25, 50)} <= survivors
    # the planted cluster collapses: at least one member dropped
    assert dropped and dropped <= set(range(25))
