"""Streaming block-level dedup — the stream twin of the batch
block-dedup pass (operators/dedup.py:block_dedup; RefinedWeb/FineWeb
line-dedup shape, arXiv:2306.01116 §3.3) and the second member of the
stateful-dedup family alongside streaming/neardup.py (SURVEY ST-family +
ext:block-dedup).

Batch block_dedup keeps each block value's globally-first (doc_id, bidx)
occurrence. Here "first" means FIRST IN ARRIVAL ORDER: the seen-block
index lives as ``applyInPandasWithState`` state keyed on the block
value, so every micro-batch is checked against the full history without
re-reading a corpus table — the ingest-time "strip boilerplate we have
already seen" pass of a continuously-fed training pipeline. Within one
micro-batch, ties break by (doc_id, bidx) — identical to the batch rule,
so a single-batch drain reproduces batch output exactly (tested).

Scale notes: blockization is row-local (shared operators/dedup.py:
blockize — no shuffle before the state stage); the only wide op is the
grouping shuffle on the block value (at production scale key it by
xxhash64(block) to shrink shuffle payload — same note as the batch
operator). State is one (doc_id, bidx) pair per DISTINCT block —
the streaming equivalent of the batch pass's winners table, held in the
state backend (RocksDB in production) and never timed out: the index IS
the corpus memory. Re-delivery of a block's owner (source replay) is
idempotent: the owner re-emits keep=1, never gets stripped by its own
earlier arrival.

Emission is append-mode (doc_id, bidx, block, keep) rows; reassemble
documents downstream with operators/dedup.py:reassemble_blocks — the
same fold the batch operator uses.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

from ..operators.dedup import blockize

BLOCK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("bidx", IntegerType()),
        StructField("block", StringType()),
        StructField("keep", IntegerType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("first_doc", LongType()), StructField("first_bidx", IntegerType())]
)


def _fold_block(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold one block value's micro-batch: the earliest-seen
    (doc_id, bidx) occurrence owns the block; every other occurrence is
    stripped (keep=0). Owner re-delivery stays keep=1 (idempotent)."""
    (block,) = key
    pairs = sorted(
        {
            (int(d), int(b))
            for pdf in pdfs
            for d, b in zip(pdf["doc_id"].tolist(), pdf["bidx"].tolist())
        }
    )
    if not pairs:
        return
    if state.exists:
        first = tuple(state.get)
    else:
        first = pairs[0]
        state.update(first)
    yield pd.DataFrame(
        {
            "doc_id": [d for d, _ in pairs],
            "bidx": [b for _, b in pairs],
            "block": [block] * len(pairs),
            "keep": [1 if (d, b) == first else 0 for d, b in pairs],
        }
    )


def block_flags_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_w: int = 10,
) -> DataFrame:
    """(doc_id, bidx, block, keep) append stream: keep=0 iff the block
    value was claimed by a strictly-earlier occurrence (an earlier
    micro-batch, or a smaller (doc_id, bidx) within the same batch).
    Feed the accumulated output to
    operators/dedup.py:reassemble_blocks for rewritten documents."""
    blocks = blockize(docs, id_col, text_col, block_w).select(
        F.col(id_col).alias("doc_id"), "bidx", "block"
    )
    return blocks.groupBy("block").applyInPandasWithState(
        _fold_block,
        outputStructType=BLOCK_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
