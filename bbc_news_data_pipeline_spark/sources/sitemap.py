"""Sitemap XML parsing — SURVEY S1/S2 (bbc_news_dag.py:51-82,
archive_scraper.py:25-67) re-expressed as native column regex algebra.

The reference fetches XML over HTTP and walks it with ElementTree on the
driver. Here the fetch is decoupled (tests feed fixture XML strings; a
production fetch stage would be a rate-limited mapInPandas — SURVEY O5);
the PARSE is pure ``regexp_extract_all`` → explode → ``regexp_extract``,
which runs JVM-side and scales to any number of sitemap documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

NEWS_CONTAINS = "www.bbc.com/news/"  # bbc_news_dag.py:70-71
ARTICLE_REGEX = r"^https://www\.bbc\.com/news/articles/"  # ArticlesSpider.py:29


def child_sitemaps(root_xml_df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Root sitemap → child sitemap URLs (<sitemap><loc> entries;
    bbc_news_dag.py:100-106)."""
    locs = F.expr(f"regexp_extract_all({xml_col}, '(?s)<sitemap>(.*?)</sitemap>', 1)")
    return (
        root_xml_df.select(F.explode(locs).alias("block"))
        .select(F.regexp_extract("block", r"<loc>\s*(.*?)\s*</loc>", 1).alias("sitemap_url"))
        .filter(F.col("sitemap_url") != "")
    )


def parse_links(sitemap_xml_df: DataFrame, xml_col: str = "xml") -> DataFrame:
    """Child sitemap XML → (url, lastmod) rows (bbc_news_dag.py:64-77).

    lastmod is nullable (entries without <lastmod> → null, matching the
    reference's ``.get('lastmod')`` → None).
    """
    blocks = F.expr(f"regexp_extract_all({xml_col}, '(?s)<url>(.*?)</url>', 1)")
    exploded = sitemap_xml_df.select(F.explode(blocks).alias("block"))
    return exploded.select(
        F.regexp_extract("block", r"<loc>\s*(.*?)\s*</loc>", 1).alias("url"),
        F.nullif(
            F.regexp_extract("block", r"<lastmod>\s*(.*?)\s*</lastmod>", 1), F.lit("")
        ).alias("lastmod"),
    ).filter(F.col("url") != "")


def news_links(links: DataFrame) -> DataFrame:
    """Keep news URLs (contains filter, P7) — the sitemap-side gate."""
    return links.filter(F.col("url").contains(NEWS_CONTAINS))


def newest_article_links(links: DataFrame, n: int) -> DataFrame:
    """The spider's start-URL query (ArticlesSpider.py:27-33): regex
    article filter + sort lastmod desc + limit n. Spark plans
    TakeOrderedAndProject — per-partition top-K, no global sort."""
    return (
        links.filter(F.col("url").rlike(ARTICLE_REGEX))
        .orderBy(F.desc("lastmod"), F.asc("url"))
        .limit(n)
    )
