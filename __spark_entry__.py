"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``bbc_news_data_pipeline_spark/``; this module is
just the registry adapter.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bbc_news_data_pipeline_spark.plans import all_queries

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _correctness_history(repo: str) -> tuple[dict[str, int], dict[str, int]]:
    """Scan CORRECTNESS_r*.json → (last fully-green round, last attempt
    round) per query name. Fully green requires every match field
    EXPLICITLY True AND a null err — a record missing a field
    (skipped/partial row) or carrying an error alongside true flags is
    not green."""
    import json
    import re

    last_green: dict[str, int] = {}
    last_attempt: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else 0
        try:
            with open(path) as f:
                results = json.load(f)
        except (OSError, ValueError):
            continue
        for name, res in results.items():
            last_attempt[name] = max(last_attempt.get(name, 0), rnd)
            ok = (
                isinstance(res, dict)
                and res.get("err") is None
                and all(
                    res.get(k) is True
                    for k in ("rows_match", "schema_match", "hash_match")
                )
            )
            if ok:
                last_green[name] = max(last_green.get(name, 0), rnd)
    return last_green, last_attempt


def _driver_window_order(queries_list, history=None, snapshots=None, current=None):
    """Order the registry so the driver's 50-entry verification window
    stamps the queries that need it most (full-registry verification
    stays authoritative locally via tools/check_parity.py — this only
    decides which slice gets the external stamp this round).

    Priority is "least-recently driver-green first", in three strata
    (round-9 refinement, verdict task #4): (−2) never green under the
    driver — never attempted, red at last attempt, or a
    partially-recorded row — sorts before (−1) green-but-reworked (or
    unknown-provenance) stamps, which sort before (≥0) intact green
    stamps oldest-first. The strict never-green ≺ reworked ordering
    guarantees a round's own rework wave can never crowd the
    never-externally-verified tail out of the 50-slot window again (it
    did in round 8). Ties keep canonical registry order. The registry
    itself keeps a canonical order (see plans/registry.py); this
    presentation-only reorder lives here, at the driver boundary, by
    design.

    Rework-awareness (round-6 fix, judge task #1): a green stamp only
    attests to the code AS OF that round. Each query's plan source is
    fingerprinted (tools/query_hashes.py: md5 of the Query.spark
    function source + oracle SQL) and compared against the snapshot in
    QUERY_HASHES.json nearest at-or-after its last green round — "green
    but source changed since the stamp" demotes to priority −1, same as
    red, so a reworked query re-verifies on the NEXT round instead of
    waiting out blind rotation. No snapshot covering the stamp → also
    −1 (unknown provenance is not evidence).

    ``history``/``snapshots``/``current`` are injectable for unit tests
    (synthetic CORRECTNESS history + hash snapshots); None → load from
    the repo directory.
    """
    import sys

    repo = os.path.dirname(os.path.abspath(__file__))
    sys_tools = os.path.join(repo, "tools")
    if sys_tools not in sys.path:
        sys.path.insert(0, sys_tools)
    last_green, last_attempt = (
        history if history is not None else _correctness_history(repo)
    )

    try:
        from query_hashes import hash_at_or_after

        if snapshots is None or current is None:
            from query_hashes import current_hashes, load_snapshots

            snapshots = load_snapshots(os.path.join(repo, "QUERY_HASHES.json"))
            current = current_hashes()
    except Exception:
        # Fingerprinting is a prioritization aid, never a correctness
        # dependency: if it breaks, fall back to stamp-age-only ordering
        # rather than failing the driver's queries() call.
        snapshots, current = {}, {}

        def hash_at_or_after(_s, _n, _r):
            return None

    def priority(name: str) -> int:
        g = last_green.get(name, -1)
        # Never green (incl. never attempted) or a red/partial attempt
        # NEWER than the last green: most urgent — the driver has never
        # certified this source, or actively found it wrong.
        if g < 0 or last_attempt.get(name, -1) > g:
            return -2
        # Source reworked since the stamp (or provenance unknown): the
        # stamp is stale evidence — re-verify next, after the never-green
        # stratum.
        if current:
            attested = hash_at_or_after(snapshots, name, g)
            if attested is None or attested != current.get(name):
                return -1
        return g

    canonical = {q.name: i for i, q in enumerate(queries_list)}
    return sorted(queries_list, key=lambda q: (priority(q.name), canonical[q.name]))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (pricing summary, TPC-H Q1 shape) on sf0.001."""
    from bbc_news_data_pipeline_spark.plans.relational import q01_pricing_summary

    return q01_pricing_summary(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {q.name: q.spark for q in _driver_window_order(all_queries())}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for every SQL-expressible query."""
    return {
        q.name: q.oracle
        for q in _driver_window_order(all_queries())
        if q.oracle is not None
    }
