"""POS-filter/lemmatize UDFs (SURVEY F13/F14, U1/U2) and the throttled
fetch stage (O5) — the two non-Catalyst-expressible reference operators."""

import time

from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.nlp.pos_lemma import (
    _rule_lemma,
    _rule_pos,
    lemmatize_tokens,
)
from bbc_news_data_pipeline_spark.sources.fetch import RETRY_STATUSES, fetch_pages


def test_rule_pos_classes():
    assert _rule_pos("government") == "n"
    assert _rule_pos("quickly") == "r"
    assert _rule_pos("beautiful") == "a"
    assert _rule_pos("running") == "v"
    assert _rule_pos("went") == "v"  # irregular common verb


def test_rule_lemma_inflections():
    assert _rule_lemma("cities", "n") == "city"
    assert _rule_lemma("boxes", "n") == "box"
    assert _rule_lemma("cats", "n") == "cat"
    assert _rule_lemma("glass", "n") == "glass"  # -ss kept
    assert _rule_lemma("running", "v") == "run"  # doubled consonant
    assert _rule_lemma("walked", "v") == "walk"
    assert _rule_lemma("studied", "v") == "study"


def test_lemmatize_udf_filters_verbs_and_lemmatizes(spark):
    df = spark.createDataFrame(
        [(1, ["ministers", "said", "quickly", "running", "beautiful", "cities"])],
        "id long, tokens array<string>",
    )
    out = df.select("id", lemmatize_tokens("tokens").alias("kept")).collect()[0]
    # verbs ('said' common-verb, 'running' -ing) dropped; N/J/R kept + lemmatized
    assert out.kept == ["minister", "quickly", "beautiful", "city"]


def test_lemmatize_udf_empty_and_null_safe(spark):
    df = spark.createDataFrame([(1, []), (2, ["news"])], "id long, tokens array<string>")
    rows = {r.id: r.kept for r in df.select("id", lemmatize_tokens("tokens").alias("kept")).collect()}
    assert rows[1] == [] and rows[2] == ["news"]


def _make_fake_fetcher():
    # defined inside a factory so cloudpickle ships it by value (the tests
    # module itself is not importable on executor workers)
    def fake(url: str, timeout_s: float) -> tuple[int, str]:
        if "flaky" in url:
            return 503, ""  # stateless: always 503 → exhausts retries
        return 200, f"<html>{url}</html>"

    return fake


def test_fetch_pages_bodies_and_retries(spark):
    urls = spark.createDataFrame(
        [("https://x.test/ok1",), ("https://x.test/flaky",), ("https://x.test/ok2",)],
        "url string",
    ).coalesce(1)
    rows = {
        r.url: r
        for r in fetch_pages(urls, delay_s=0.0, retries=2, fetcher=_make_fake_fetcher()).collect()
    }
    assert rows["https://x.test/ok1"].status == 200
    assert rows["https://x.test/ok1"].body.startswith("<html>")
    assert rows["https://x.test/ok1"].fetch_attempts == 1
    assert rows["https://x.test/flaky"].status == 503
    assert rows["https://x.test/flaky"].fetch_attempts == 3  # 1 + RETRY_TIMES=2
    assert 503 in RETRY_STATUSES


def test_fetch_pages_throttles(spark):
    urls = spark.createDataFrame([(f"https://x.test/{i}",) for i in range(4)], "url string").coalesce(1)
    t0 = time.monotonic()
    out = fetch_pages(urls, delay_s=0.1, retries=0, fetcher=_make_fake_fetcher()).collect()
    elapsed = time.monotonic() - t0
    assert len(out) == 4
    assert elapsed >= 0.3  # 4 calls, ≥3 inter-call delays of 0.1s
