"""Streaming incremental near-dup detection — the stream twin of q94's
batch-vs-corpus band-key check (plans/dedup_plans.py:q94, SURVEY ST-family
+ ext:incremental-dedup).

Batch q94 joins a new batch's MinHash band keys against a PERSISTED
(doc_id, band_key) corpus index. Here the index lives as STREAMING STATE:
``applyInPandasWithState`` keyed on ``band_key`` holds the first claimant
doc per band, so every micro-batch is checked against the full history
without re-reading any corpus table. Semantics are FIRST-WINS in arrival
order: a document is a near-dup iff some band of its signature was
already claimed by a document seen strictly before it (an earlier
micro-batch, or a smaller doc_id within the same batch) — the streaming
generalization of the reference's insert-if-absent keyed sink
(bbc_news_dag.py:39-43) from exact keys to LSH bands.

Scale notes: band-key computation is row-local (operators/dedup.py:
band_keys — no shuffle before the state stage); the only wide op is the
grouping shuffle on ``band_key`` (md5-uniform, skew-proof). State is ONE
long per DISTINCT band key — the same cardinality the batch pipeline
persists as its dedup index, stored in the state backend (RocksDB in
production) rather than a parquet table, and never timed out by design:
the index IS the corpus memory. Emission is append-mode (doc_id,
band_key, dup_hit) rows — one per document band, so a downstream
``groupBy(doc_id).agg(max(dup_hit))`` (or the foreachBatch sink of the
caller's choice) yields the per-document verdict; the fan-in is
bands-per-doc (4), constant.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

from ..operators.dedup import band_keys

FLAG_SCHEMA = StructType(
    [
        StructField("band_key", StringType()),
        StructField("doc_id", LongType()),
        StructField("dup_hit", IntegerType()),
        StructField("claimant", LongType()),
    ]
)

_STATE_SCHEMA = StructType([StructField("first_doc", LongType())])


def _flag_group(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold one band key's micro-batch: the earliest-seen doc claims the
    band; every other doc carrying it is a near-dup hit. ``claimant``
    carries the band's owner so downstream can map each duplicate to a
    canonical document (min over its hit bands' claimants)."""
    (band_key,) = key
    ids = sorted(
        {int(x) for pdf in pdfs for x in pdf["doc_id"].tolist()}
    )
    if not ids:
        return
    if state.exists:
        (first,) = state.get
    else:
        first = ids[0]
        state.update((first,))
    # the claimant itself is never a hit — including on RE-DELIVERY of
    # the same doc in a later batch (source replay / reprocessing must
    # be idempotent, not mark a document as a duplicate of itself)
    hit_set = {i for i in ids if i != first}
    yield pd.DataFrame(
        {
            "band_key": [band_key] * len(ids),
            "doc_id": ids,
            "dup_hit": [1 if i in hit_set else 0 for i in ids],
            "claimant": [first] * len(ids),
        }
    )


def neardup_flags_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
    bands: int = 4,
    k: int = 5,
) -> DataFrame:
    """(band_key, doc_id, dup_hit, claimant) append stream: dup_hit=1 iff
    the band was claimed by a strictly-earlier document, ``claimant``
    being that owner. Aggregate per doc downstream with
    :func:`canonicalize_flags` — max(dup_hit) for the verdict plus
    TRANSITIVE resolution of the claimant chain to the surviving
    ancestor (a direct claimant may itself be a duplicate dropped in an
    earlier batch). Docs shorter than ``k`` tokens carry no bands and
    never appear — same drop rule as the batch operator."""
    keys = band_keys(docs, id_col, text_col, n_hashes, bands, k).select(
        F.col(id_col).alias("doc_id"), "band_key"
    )
    return keys.groupBy("band_key").applyInPandasWithState(
        _flag_group,
        outputStructType=FLAG_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def canonicalize_flags(flags: DataFrame) -> DataFrame:
    """Per-document verdict over accumulated ``neardup_flags_stream``
    output, with TRANSITIVE canonical resolution: (doc_id, is_neardup,
    canonical_id) where canonical_id is the SURVIVING ancestor, not
    merely the direct claimant.

    A duplicate's direct claimant may itself have been flagged via a
    different band in an earlier micro-batch (A←B on band 1, then B←C on
    band 2 would leave C pointing at dropped B) — a corpus-dedup consumer
    wants C mapped to A, the document actually kept. Each doc's direct
    parent is the min over its hit bands' claimants (deterministic when
    several earlier docs claimed different bands); parent chains always
    point strictly backwards in arrival order, so
    :func:`~..operators.curation.resolve_ancestors` (pointer doubling)
    follows them to the surviving terminal in O(log depth) shuffles.
    Run this as the batch post-pass over the drained/accumulated flag
    rows (foreachBatch sink or periodic compaction), not inside the
    stateful stage — resolution needs the cross-band global view.
    """
    from ..operators.curation import resolve_ancestors

    per_doc = flags.groupBy("doc_id").agg(
        F.max("dup_hit").alias("is_neardup"),
        F.min(F.when(F.col("dup_hit") == 1, F.col("claimant"))).alias("_parent"),
    )
    mapping = per_doc.filter(F.col("is_neardup") == 1).select("doc_id", "_parent")
    resolved = resolve_ancestors(mapping, "doc_id", "_parent").select(
        "doc_id", F.col("_parent").alias("canonical_id")
    )
    return per_doc.select("doc_id", "is_neardup").join(resolved, "doc_id", "left")
