"""Ingestion parsing fixtures: sitemap XML (S1/S2) and article HTML
(S3/U7) including selector fallbacks (F17) and validation drops (P10).

All XML/HTML strings here are HAND-AUTHORED synthetic fixtures shaped
after the public sitemap/article layouts the reference's spider targets —
nothing is captured from a live site."""

import pytest
from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.sources import sitemap
from bbc_news_data_pipeline_spark.sources.html_articles import extract_articles, prepare_articles

ROOT_XML = """<?xml version="1.0"?>
<sitemapindex>
  <sitemap><loc>https://www.bbc.com/sitemaps/news-1.xml</loc></sitemap>
  <sitemap><loc>https://www.bbc.com/sitemaps/news-2.xml</loc></sitemap>
</sitemapindex>"""

CHILD_XML = """<?xml version="1.0"?>
<urlset>
  <url><loc>https://www.bbc.com/news/articles/abc123def456</loc>
       <lastmod>2024-03-01T10:00:00Z</lastmod></url>
  <url><loc>https://www.bbc.com/news/articles/xyz789ghi012</loc>
       <lastmod>2024-03-02T11:00:00Z</lastmod></url>
  <url><loc>https://www.bbc.com/news/videos/vvv111</loc>
       <lastmod>2024-03-03T09:00:00Z</lastmod></url>
  <url><loc>https://www.bbc.com/sport/football/555</loc></url>
  <url><loc>https://www.bbc.com/news/articles/nolastmod01</loc></url>
</urlset>"""

GOOD_HTML = """<html><body>
<h1 data-testid="headline">Big Story Headline</h1>
<p class="sub-headline">A short subtitle here</p>
<time datetime="2024-03-01T10:00:00.000Z">1 March</time>
<span class="byline name">Jane Reporter</span>
<p>First paragraph of body text.</p><p>Second paragraph continues.</p>
<a class="topic-link" href="/topics/politics">Politics</a>
<img src="https://ichef.bbci.co.uk/pic1.jpg"/>
</body></html>"""

FALLBACK_HTML = """<html><body>
<h1 id="main-heading">Fallback Title</h1>
<time datetime="2024-03-02T12:00:00.000Z">2 March</time>
<p>Only paragraph.</p>
</body></html>"""

NO_TITLE_HTML = """<html><body>
<time datetime="2024-03-03T12:00:00.000Z">3 March</time>
<p>Body without a headline.</p>
</body></html>"""


def test_child_sitemap_discovery(spark):
    df = spark.createDataFrame([(ROOT_XML,)], "xml string")
    urls = [r.sitemap_url for r in sitemap.child_sitemaps(df).collect()]
    assert urls == [
        "https://www.bbc.com/sitemaps/news-1.xml",
        "https://www.bbc.com/sitemaps/news-2.xml",
    ]


def test_parse_links_and_filters(spark):
    df = spark.createDataFrame([(CHILD_XML,)], "xml string")
    links = sitemap.parse_links(df)
    assert links.count() == 5
    assert links.filter(F.col("lastmod").isNull()).count() == 2  # sport + nolastmod

    news = sitemap.news_links(links)
    assert news.count() == 4  # sport filtered by contains

    top = sitemap.newest_article_links(news, 2).collect()
    assert [r.url for r in top] == [
        "https://www.bbc.com/news/articles/xyz789ghi012",
        "https://www.bbc.com/news/articles/abc123def456",
    ]  # videos/ excluded by regex, sorted lastmod desc


def test_article_extraction_and_validation(spark):
    pages = spark.createDataFrame(
        [("u1", GOOD_HTML), ("u2", FALLBACK_HTML), ("u3", NO_TITLE_HTML)],
        "url string, html string",
    )
    out = {r.url: r for r in extract_articles(pages).collect()}
    assert set(out) == {"u1", "u2"}  # u3 dropped: no title (P10)

    a = out["u1"]
    assert a.title == "Big Story Headline"
    assert a.subtitle == "A short subtitle here"
    assert a.date == "2024-03-01T10:00:00.000Z"
    assert a.authors == ["Jane Reporter"]
    assert "First paragraph" in a.text and "Second paragraph" in a.text
    assert a.subtitle not in a.text  # subtitle <p> excluded from body
    assert a.topic_name == ["Politics"]
    assert a.images == ["https://ichef.bbci.co.uk/pic1.jpg"]

    b = out["u2"]
    assert b.title == "Fallback Title"  # main-heading fallback fired
    assert b.subtitle is None and b.authors == []


def test_prepare_articles(spark):
    long_text = " ".join(f"word{i}" for i in range(60))
    rows = [
        ("u1", "2024-03-01T10:00:00.000Z", "T1", long_text),
        ("u2", "not-a-date", "T2", long_text),  # unparseable date → null (F18)
        ("u3", "2024-03-01T10:00:00.000Z", "T3", "too short"),  # < 50 words dropped
    ]
    df = spark.createDataFrame(rows, "url string, date string, title string, text string")
    out = prepare_articles(df)
    got = {r.url: r for r in out.collect()}
    assert set(got) == {"u1", "u2"}
    assert got["u1"].n_words == 60
    assert got["u2"].date is None  # coerced, not crashed (ANSI-safe)
    assert got["u1"].date is not None
