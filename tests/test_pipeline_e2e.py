"""End-to-end BBC pipeline on fixtures: sitemap → crawl → prep →
topics ∥ sentiment → stats (the reference DAG bbc_news_dag.py:360-362),
plus runner control-flow semantics (retries, ALL_DONE, skip-downstream)."""

import random

import pytest
from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.pipeline.bbc_news import build_pipeline
from bbc_news_data_pipeline_spark.pipeline.runner import Pipeline, Stage

POS_WORDS = ["wonderful", "great", "success", "hope", "progress", "win"]
NEG_WORDS = ["crisis", "war", "terrible", "failure", "threat", "disaster"]
FILLER = ["community", "report", "city", "people", "meeting", "plan", "event",
          "update", "council", "project", "program", "service", "group"]


def _article_html(title, date, words):
    body = " ".join(f"<p>{w}</p>" for w in [" ".join(words[i:i+12]) for i in range(0, len(words), 12)])
    return (
        f'<html><body><h1 data-testid="headline">{title}</h1>'
        f'<time datetime="{date}">x</time>{body}</body></html>'
    )


@pytest.fixture(scope="module")
def fixtures(spark):
    rng = random.Random(42)
    urls, pages, xml_entries = [], [], []
    for i in range(20):
        url = f"https://www.bbc.com/news/articles/doc{i:08d}aaaa"
        date = f"2024-03-{(i % 9) + 1:02d}T10:00:00.000Z"
        sentiment_words = POS_WORDS if i % 2 == 0 else NEG_WORDS
        words = [rng.choice(FILLER) for _ in range(70)] + sentiment_words * 3
        rng.shuffle(words)
        pages.append((url, _article_html(f"Title {i}", date, words)))
        xml_entries.append(f"<url><loc>{url}</loc><lastmod>{date}</lastmod></url>")
    xml = f"<urlset>{''.join(xml_entries)}</urlset>"
    sitemap_df = spark.createDataFrame([(xml,)], "xml string")
    pages_df = spark.createDataFrame(pages, "url string, html string")
    return sitemap_df, pages_df


def test_full_pipeline(spark, fixtures, tmp_path):
    sitemap_df, pages_df = fixtures
    wd = str(tmp_path / "wd")
    pipe = build_pipeline(spark, sitemap_df, pages_df, wd, lda_k=2)
    report = pipe.run()
    assert not report.failed, report.failed
    assert report.results["discover_links"] == 20
    assert report.results["crawl_articles"] == 20
    assert report.results["prepare"] == 20
    assert report.results["sentiment"] == 20
    assert report.results["emotion"] == 20
    assert report.results["topics"]["n_topics"] == 2

    emo = spark.read.parquet(f"{wd}/articles_emotion")
    assert {"emotion_label", "emotion_score"} <= set(emo.columns)

    scored = spark.read.parquet(f"{wd}/articles_sentiment")
    labels = {r.url: r.sentiment_label for r in scored.collect()}
    pos = [u for u, l in labels.items() if l == "positive"]
    neg = [u for u, l in labels.items() if l == "negative"]
    assert len(pos) == 10 and len(neg) == 10  # planted sentiment recovered

    share = spark.read.parquet(f"{wd}/stats_daily_share")
    # shares within a day sum to ~100
    total = share.groupBy("day").agg(F.round(F.sum("pct"), 1).alias("s")).collect()
    assert all(abs(r.s - 100.0) < 0.5 for r in total)

    # re-run is incremental: no new links/articles appended
    report2 = build_pipeline(spark, sitemap_df, pages_df, wd, lda_k=2).run()
    assert report2.results["discover_links"] == 0
    assert report2.results["crawl_articles"] == 0


def test_runner_retry_and_all_done():
    calls = {"flaky": 0}

    def flaky(_):
        calls["flaky"] += 1
        if calls["flaky"] < 2:
            raise RuntimeError("transient")
        return "ok"

    def boom(_):
        raise RuntimeError("permanent")

    pipe = Pipeline(
        [
            Stage("flaky", flaky, retries=1),
            Stage("optional_fail", boom, deps=("flaky",), optional=True),
            Stage("publish", lambda r: f"published after {r['flaky']}", deps=("flaky",)),
            Stage("needs_optional", lambda r: "ran", deps=("optional_fail",)),
        ]
    )
    report = pipe.run()
    assert report.results["flaky"] == "ok" and calls["flaky"] == 2  # O2 retry
    assert "optional_fail" in report.failed  # recorded
    assert report.results["publish"] == "published after ok"
    assert report.results.get("needs_optional") == "ran"  # ALL_DONE semantics (O3)


def test_runner_skips_downstream_of_required_failure():
    pipe = Pipeline(
        [
            Stage("a", lambda r: 1),
            Stage("b", lambda r: 1 / 0, retries=0),
            Stage("c", lambda r: "never", deps=("b",)),
        ]
    )
    report = pipe.run()
    assert "b" in report.failed
    assert "c" in report.failed and "skipped" in report.failed["c"]
    assert "c" not in report.results
