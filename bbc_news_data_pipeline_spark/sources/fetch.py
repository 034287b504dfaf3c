"""Throttled page-fetch stage — the engine-side replacement for the
reference's Scrapy politeness settings (SURVEY O5/S3: ``DOWNLOAD_DELAY=
2.0``, ``CONCURRENT_REQUESTS=1``, retry on {429,500,502,503,504},
``settings.py:15-34``).

Spark sources don't rate-limit HTTP, so this is a ``mapInPandas`` stage
with a per-partition token bucket: each python worker independently
enforces ``delay_s`` between requests, so cluster-wide politeness is
``delay_s / num_partitions`` — callers targeting one origin should
``coalesce(1)`` the url frame first (the reference's concurrency=1), or
partition by host when fetching many origins.

The HTTP call itself is injectable (tests pass a fake; the default uses
stdlib urllib) — keeping the stage thin and hermetic, as SURVEY §7.2.8
prescribes.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

FETCH_SCHEMA = "url string, status int, body string, fetch_attempts int"
RETRY_STATUSES = frozenset({429, 500, 502, 503, 504})  # settings.py:34


def _default_fetch(url: str, timeout_s: float) -> tuple[int, str]:
    """GET via stdlib urllib (no third-party deps)."""
    import urllib.error
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=timeout_s) as resp:  # noqa: S310
            return resp.status, resp.read().decode("utf-8", errors="replace")
    except urllib.error.HTTPError as e:
        return e.code, ""
    except Exception:
        return -1, ""


def fetch_pages(
    urls: DataFrame,
    *,
    url_col: str = "url",
    delay_s: float = 2.0,
    retries: int = 2,
    timeout_s: float = 30.0,
    fetcher: Callable[[str, float], tuple[int, str]] | None = None,
) -> DataFrame:
    """urls → (url, status, body, fetch_attempts), throttled per partition.

    Failed statuses in RETRY_STATUSES are retried up to ``retries`` times
    (reference ``RETRY_TIMES=2``), each attempt paying the politeness
    delay.
    """
    fetch = fetcher or _default_fetch

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        next_ok = 0.0  # token-bucket: monotonic timestamp of next allowed call

        def throttled(url: str) -> tuple[int, str, int]:
            nonlocal next_ok
            status, body, attempts = -1, "", 0
            for _ in range(retries + 1):
                wait = next_ok - time.monotonic()
                if wait > 0:
                    time.sleep(wait)
                next_ok = time.monotonic() + delay_s
                status, body = fetch(url, timeout_s)
                attempts += 1
                if status not in RETRY_STATUSES:
                    break
            return status, body, attempts

        for pdf in batches:
            results = [throttled(u) for u in pdf[url_col]]
            yield pd.DataFrame(
                {
                    "url": pdf[url_col].values,
                    "status": pd.Series([r[0] for r in results], dtype="int32"),
                    "body": [r[1] for r in results],
                    "fetch_attempts": pd.Series([r[2] for r in results], dtype="int32"),
                }
            )

    return urls.mapInPandas(run, schema=FETCH_SCHEMA)
