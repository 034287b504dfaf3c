"""Sentiment scoring: threshold totality/exactness (reference
sentiment_analysis.py:48-53) and lexicon scorer behavior."""

import pytest
from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.nlp.sentiment import (
    sentiment_label_expr,
    with_sentiment,
)

BOUNDARY_SCORES = [-1.0, -0.05, -0.049, 0.0, 0.049, 0.05, 1.0]


def test_threshold_boundaries(spark):
    df = spark.createDataFrame([(s,) for s in BOUNDARY_SCORES], "score double")
    rows = df.select("score", sentiment_label_expr("score").alias("label")).collect()
    got = {r.score: r.label for r in rows}
    assert got == {
        -1.0: "negative",
        -0.05: "negative",  # <= -0.05 inclusive
        -0.049: "neutral",
        0.0: "neutral",
        0.049: "neutral",
        0.05: "positive",  # >= 0.05 inclusive
        1.0: "positive",
    }


def test_label_partition_totality(spark):
    """Every score gets exactly one label (SURVEY §5.2.5)."""
    df = spark.range(-100, 101).select((F.col("id") / 100.0).alias("score"))
    n_null = df.select(sentiment_label_expr("score").alias("l")).filter(
        F.col("l").isNull()
    ).count()
    assert n_null == 0


def test_lexicon_scoring_direction(spark):
    rows = [
        (0, "this is a wonderful amazing great success story full of joy"),
        (1, "terrible awful disaster with death and failure everywhere"),
        (2, "the cat sat on the mat"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    out = {r.id: r for r in with_sentiment(df).collect()}
    assert out[0].sentiment_label == "positive" and out[0].sentiment_score > 0.5
    assert out[1].sentiment_label == "negative" and out[1].sentiment_score < -0.5
    assert out[2].sentiment_label == "neutral" and abs(out[2].sentiment_score) < 0.05
    for r in out.values():  # compound normalization bounds
        assert -1.0 < r.sentiment_score < 1.0


def test_hf_stub_runs_as_pandas_udf(spark):
    from bbc_news_data_pipeline_spark.nlp.sentiment import hf_sentiment_udf

    df = spark.createDataFrame([("great success",), ("horrible disaster",)], "text string")
    out = df.select(hf_sentiment_udf()(F.col("text")).alias("r")).select("r.*").collect()
    assert [r.label for r in out] == ["positive", "negative"]
    assert all(0.0 <= r.confidence <= 1.0 for r in out)


def test_emotion_udf_stub(spark):
    """M8: 7-class emotion argmax via the iterator pandas_udf (stub path:
    cue-lexicon vote, neutral default)."""
    from bbc_news_data_pipeline_spark.nlp.sentiment import EMOTION_CLASSES, with_emotion

    df = spark.createDataFrame(
        [
            (1, "war attack violence in the region sparks outrage"),
            (2, "team celebrates historic win with joy and hope"),
            (3, "quarterly report shows flat figures"),
            (4, "sudden unexpected shock announcement"),
        ],
        "id long, text string",
    )
    rows = {r.id: r for r in with_emotion(df).collect()}
    assert rows[1].emotion_label == "anger"
    assert rows[2].emotion_label == "joy"
    assert rows[3].emotion_label == "neutral" and rows[3].emotion_score == 0.5
    assert rows[4].emotion_label == "surprise"
    assert all(r.emotion_label in EMOTION_CLASSES for r in rows.values())
    assert all(0.0 <= r.emotion_score <= 1.0 for r in rows.values())
