"""Golden tests for the reference clean_text chain, including the §2.13
quirks (single digits survive; ≥2-digit tokens removed; literal
http/www substrings removed after URL regex; single letters removed)."""

import pytest
from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.functions.cleaning import clean_text_expr, tokens_expr

CASES = [
    # (raw, expected clean) — goldens derived from the documented chain
    ("Hello, World!", "hello world"),
    ("Visit http://example.com/page now", "visit now"),
    ("<b>Bold</b> move", "bold move"),
    ("token with 42 numbers and 7 single", "token with numbers and 7 single"),
    ("the www prefix stays gone", "the prefix stays gone"),
    ("A single b char x drops", "single char drops"),
    ("  spaced   out  text ", "spaced out text"),
    ("MiXeD CaSe", "mixed case"),
    ("price $5,300 today", "price 5 300 today"),  # punctuation→space, 300 is ≥2 digits? no: "5,300"→"5 300"; 300 removed
]


@pytest.fixture(scope="module")
def cleaned(spark):
    df = spark.createDataFrame([(i, raw) for i, (raw, _) in enumerate(CASES)], "id long, text string")
    rows = df.select("id", clean_text_expr("text").alias("clean")).collect()
    return {r.id: r.clean for r in rows}


def test_golden_chain(cleaned):
    # recompute expectations honoring the exact quirk semantics
    expected = {
        0: "hello world",
        1: "visit now",
        2: "bold move",
        3: "token with numbers and 7 single",  # 42 removed (≥2 digits), 7 kept
        4: "the prefix stays gone",  # www removed as literal substring
        5: "single char drops",  # a/b/x single letters removed
        6: "spaced out text",
        7: "mixed case",
        8: "price 5 today",  # "$5,300" → "5 300"; "300" (≥2 digits) removed, "5" kept
    }
    for i, want in expected.items():
        assert cleaned[i] == want, f"case {i}: {cleaned[i]!r} != {want!r}"


def test_token_min_length(spark):
    df = spark.createDataFrame([("a bb ccc dddd",)], "text string")
    toks = df.select(tokens_expr("text", min_len=2).alias("t")).collect()[0].t
    assert toks == ["ccc", "dddd"]


def test_idempotent(spark):
    """Cleaning an already-clean text is a no-op (fixpoint property)."""
    df = spark.createDataFrame([("some clean text with 7 words",)], "text string")
    once = df.select(clean_text_expr("text").alias("c1"))
    twice = once.select("c1", clean_text_expr("c1").alias("c2")).collect()[0]
    assert twice.c1 == twice.c2
