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


def test_engine_dispatch(spark):
    """engine='auto' must resolve to vader only when a VADER package is
    importable; engine='vader' must raise cleanly when it is not; the
    default stays the deterministic lexicon path either way."""
    from bbc_news_data_pipeline_spark.nlp import sentiment as S

    df = spark.createDataFrame([(1, "great success")], "id long, text string")
    auto = with_sentiment(df, engine="auto").collect()[0]
    assert auto.sentiment_label == "positive"
    if not S.vader_available():
        with pytest.raises(ImportError):
            with_sentiment(df, engine="vader").collect()
    with pytest.raises(ValueError):
        with_sentiment(df, engine="nope")


def test_vader_parity_when_present(spark):
    """Skipif-guarded reference parity (sentiment_analysis.py:42-53):
    with the real VADER package installed, engine='vader' scores must
    equal driver-side polarity_scores()['compound'] to 6dp and labels
    must follow the exact thresholds."""
    from bbc_news_data_pipeline_spark.nlp import sentiment as S

    analyzer = S.load_vader_analyzer()
    if analyzer is None:
        pytest.skip("no vaderSentiment/nltk VADER in this environment")
    texts = [
        "This is an absolutely wonderful, amazing breakthrough!!!",
        "A terrible, horrible disaster — everyone is devastated.",
        "The committee met on Tuesday to review the schedule.",
        "not good at all",  # negation — the lexicon stub can't see this
        "VERY GOOD!!!",  # caps + booster + punctuation emphasis
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = {r.id: r for r in with_sentiment(df, engine="vader").collect()}
    for i, t in enumerate(texts):
        expected = round(float(analyzer.polarity_scores(t)["compound"]), 6)
        assert abs(got[i].sentiment_score - expected) < 1e-9, (t, got[i])
        exp_label = (
            "positive" if expected >= 0.05 else "negative" if expected <= -0.05 else "neutral"
        )
        assert got[i].sentiment_label == exp_label


def test_hf_real_model_parity_when_present(spark):
    """Opt-in real-transformers parity (reference
    sentiment_analysis.py:76-112): runs only when transformers is
    importable AND RUN_HF_TESTS=1 (model weights download). The UDF's
    labels/confidences must match a driver-side pipeline() call."""
    import os

    pytest.importorskip("transformers")
    if os.environ.get("RUN_HF_TESTS") != "1":
        pytest.skip("set RUN_HF_TESTS=1 to run real-model inference")
    from transformers import pipeline

    from bbc_news_data_pipeline_spark.nlp.sentiment import hf_sentiment_udf

    texts = ["I love this movie", "This was a waste of time"]
    clf = pipeline(
        "sentiment-analysis",
        model="distilbert-base-uncased-finetuned-sst-2-english",
        truncation=True,
    )
    expected = clf(texts)
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = df.select(hf_sentiment_udf()(F.col("text")).alias("r")).select("r.*").collect()
    for row, exp in zip(out, expected):
        assert row.label == exp["label"].lower()
        assert abs(row.confidence - float(exp["score"])) < 1e-4


def test_hf_wire_format_parity_with_reference_loop(spark):
    """WIRE-FORMAT parity for the real-HF branch — explicitly NOT
    model-output parity: the committed fixture is HAND-AUTHORED to mimic
    transformers output shapes, its scores are invented (see
    tests/fixtures/HF_FIXTURE_PROVENANCE.md; tools/record_hf_fixture.py
    upgrades it to recorded real outputs wherever transformers is
    importable, and this test consumes either variant). What it proves:
    the Spark iterator-UDF path produces exactly what the reference's
    driver-side pandas loop (_run_transformer,
    sentiment_analysis.py:76-112) produces given the SAME classifier
    callable — dict results, 1-element list results, top_k=None full
    class lists, uppercase labels — with the REAL branch (normalization,
    isinstance argmax dispatch, lowercase mapping, float coercion)
    running inside actual Spark python workers via pipeline_factory
    injection, not the lexicon stub."""
    import json
    import pathlib

    from bbc_news_data_pipeline_spark.nlp.sentiment import (
        hf_emotion_udf,
        hf_sentiment_udf,
    )

    fix = json.loads(
        (pathlib.Path(__file__).parent / "fixtures" / "hf_pipeline_wire_fixture.json")
        .read_text()
    )
    texts = [t for t in fix["sentiment"]]

    def reference_loop(results):
        # verbatim logic of sentiment_analysis.py:96-104
        clean_labels, clean_scores = [], []
        for r in results:
            if isinstance(r, list):
                top = max(r, key=lambda x: x["score"])
                clean_labels.append(top["label"].lower())
                clean_scores.append(float(top["score"]))
            else:
                clean_labels.append(r["label"].lower())
                clean_scores.append(float(r["score"]))
        return clean_labels, clean_scores

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    for task, udf_fn, label_col, score_col in [
        ("sentiment", hf_sentiment_udf, "label", "confidence"),
        ("emotion", hf_emotion_udf, "emotion_label", "emotion_score"),
    ]:
        wire = fix[task]

        def factory(wire=wire):
            return lambda batch_texts: [wire[t] for t in batch_texts]

        out = (
            df.select("text", udf_fn(pipeline_factory=factory)(F.col("text")).alias("r"))
            .select("text", f"r.{label_col}", f"r.{score_col}")
            .collect()
        )
        got = {r.text: (r[label_col], r[score_col]) for r in out}
        want_labels, want_scores = reference_loop([wire[t] for t in texts])
        for t, wl, ws in zip(texts, want_labels, want_scores):
            assert got[t] == (wl, ws), (task, t, got[t], (wl, ws))
    # For the HAND-AUTHORED fixture, check its deliberate shape coverage
    # actually engaged: argmax on lists, passthrough on dicts,
    # uppercase→lowercase. A RECORDED fixture (tools/record_hf_fixture.py)
    # carries whatever shapes the real pipelines emitted — skip the
    # authored-shape asserts but keep the parity above.
    if fix["_provenance"].startswith("Hand-authored"):
        assert isinstance(fix["sentiment"][texts[1]], list)
        assert fix["emotion"][texts[2]][0]["label"] == "NEUTRAL"


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
