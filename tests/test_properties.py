"""Property-based tests (SURVEY §5.2.5): dedup idempotency, label
totality, cleaning-chain equivalence to a pure-Python reimplementation
of the reference's regex sequence, count preservation through
annotate-joins. Hypothesis generates the data; Spark evaluates in ONE
batched pass per property (row-per-example, not session-per-example)."""

import re

from hypothesis import given, settings, strategies as st

from bbc_news_data_pipeline_spark.functions.cleaning import CLEAN_STEPS
from bbc_news_data_pipeline_spark.nlp.sentiment import (
    NEGATIVE_THRESHOLD,
    POSITIVE_THRESHOLD,
)

# --- pure-python twin of the reference chain (data_preparation.py:61-96) ---


def _clean_py(s: str) -> str:
    out = s.strip().lower()
    for pattern, repl in CLEAN_STEPS:
        out = re.sub(pattern, repl, out)
    return out.strip()


TEXTS = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Po", "Zs"), max_codepoint=0x2FF
    ),
    max_size=80,
)


@settings(max_examples=25, deadline=None)
@given(st.lists(TEXTS, min_size=1, max_size=30, unique=True))
def test_clean_chain_matches_python_twin(spark, texts):
    from bbc_news_data_pipeline_spark.functions.cleaning import clean_text_expr

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
    got = {r.id: r.c for r in df.select("id", clean_text_expr("t").alias("c")).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _clean_py(t), f"input {t!r}"


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 9), st.sampled_from(["aa bb", "cc dd", "ee ff"])),
        min_size=1,
        max_size=40,
    )
)
def test_exact_dedup_idempotent_and_minimal(spark, rows):
    """f(f(x)) == f(x); output has one row per distinct text, min id wins."""
    from bbc_news_data_pipeline_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(rows)], "doc_id long, text string"
    )
    once = exact_dedup(df, "text", "doc_id")
    twice = exact_dedup(once, "text", "doc_id")
    got_once = sorted(map(tuple, once.collect()))
    assert got_once == sorted(map(tuple, twice.collect()))
    expect = {}
    for i, (_, t) in enumerate(rows):
        expect.setdefault(t, i)
    assert got_once == sorted((i, t) for t, i in expect.items())


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=-1.0, max_value=1.0, allow_nan=False))
def test_sentiment_label_total_partition(score):
    """Every score maps to exactly one label (F26 totality) — evaluated on
    the plain-python twin of the when/otherwise chain."""
    labels = [
        "positive" if score >= POSITIVE_THRESHOLD else None,
        "negative" if score <= NEGATIVE_THRESHOLD else None,
        "neutral" if NEGATIVE_THRESHOLD < score < POSITIVE_THRESHOLD else None,
    ]
    assert sum(x is not None for x in labels) == 1


def test_annotate_join_preserves_counts(spark):
    """J1 contract: attaching topic words via a left join must not drop or
    duplicate article rows, even with missing and duplicate dim keys."""
    from pyspark.sql import functions as F

    articles = spark.createDataFrame(
        [(i, i % 4) for i in range(100)], "doc_id long, topic_id int"
    )
    dim = spark.createDataFrame(
        [(0, "a b"), (1, "c d"), (2, "e f")], "topic_id int, words string"
    )  # topic 3 missing → null words, fillna("") reference semantics
    out = articles.join(F.broadcast(dim), "topic_id", "left").na.fill({"words": ""})
    assert out.count() == 100
    assert out.select("doc_id").distinct().count() == 100
    assert out.filter((F.col("topic_id") == 3) & (F.col("words") == "")).count() == 25
