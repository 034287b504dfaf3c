"""Query registry: every operator from SURVEY.md §2 that we claim as done
gets one :class:`Query` here — a Spark plan builder plus (where the
semantics are SQL-expressible) a DuckDB oracle SQL string the driver runs
side-by-side at sf=0.01.

Determinism contract (hash-match requires it):
  * every float aggregate is ``round()``-ed identically on both sides
    (double accumulation order differs between engines — see SURVEY §4);
  * every LIMIT is preceded by a total order (unique-key tiebreak);
  * no wall-clock — "now" is always an anchor derived from the data
    (e.g. ``max(ts)``), mirroring the reference-quirk fix in SURVEY §7.4.3.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    """One verifiable unit of the operator inventory."""

    name: str
    spark: SparkQuery
    oracle: str | None  # DuckDB SQL over pre-registered views; None → rows-only check
    survey: str = ""  # SURVEY.md §2 operator ids this query certifies
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


def all_queries() -> list[Query]:
    """Assemble the full registry (import here to avoid cycles)."""
    from . import (
        curation_plans,
        dedup_plans,
        embeddings_plans,
        multimodal_plans,
        quality_plans,
        relational,
        retrieval_plans,
        sketch_plans,
        streaming_plans,
        subquery_plans,
        text_plans,
        timeseries_plans,
    )

    # Canonical, stable module order (oldest surface first). Consumers that
    # need a different presentation order (e.g. the external driver's
    # 50-entry verification window) reorder at THEIR boundary —
    # __spark_entry__.py — not here, so catalog output, bench execution
    # order, and round-to-round diffs stay comparable.
    out: list[Query] = []
    for mod in (relational, text_plans, dedup_plans, embeddings_plans,
                multimodal_plans, streaming_plans, curation_plans,
                timeseries_plans, subquery_plans, quality_plans,
                retrieval_plans, sketch_plans):
        out.extend(mod.QUERIES)
    names = [q.name for q in out]
    if len(names) != len(set(names)):
        dupes = {n for n in names if names.count(n) > 1}
        raise ValueError(f"duplicate query names: {dupes}")
    return out
