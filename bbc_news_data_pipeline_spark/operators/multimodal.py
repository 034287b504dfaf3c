"""Multimodal column operators — image/audio/video payloads as opaque
``binary`` columns with typed metadata.

The reference stores only image *URLs* (``ArticlesSpider.py:96-105``,
``items.py:13``) and never decodes media. A 100 TB training-data pipeline
must carry the payloads themselves, so this module defines the Spark-side
contract for media columns:

  schema       — ``media struct<bytes: binary, mime: string>`` + typed
                 metadata columns produced by decode
  partitioning — payloads stay with their row; decode is a narrow
                 mapInPandas (zero shuffle), so media tables partition by
                 whatever key the pipeline already uses
  UDF shape    — Arrow-batched ``mapInPandas``: one pandas DataFrame per
                 batch, payload bytes arrive as Python ``bytes`` objects.
                 Media JOBS must bound the batch themselves — pass
                 ``cluster_conf(arrow_batch_rows=512)`` (or set
                 spark.sql.execution.arrow.maxRecordsPerBatch on the
                 session running the decode): Spark's 10k-row default is
                 ~100 GB per batch at 10 MB payloads. The bound is
                 deliberately per-job, not a repo-wide default, because
                 it would chop every text pandas-UDF batch ~20x.

Real codecs (PIL / librosa / av) are NOT in this container, so the
byte-level decoders are STUBS: ``_real_decode_meta`` raises
``NotImplementedError`` and the pipeline falls back to
``_fake_decode_meta``, a deterministic md5-derived metadata synthesizer.
The fake keeps every piece of Spark plumbing real (schema, Arrow batch
iteration, null handling, per-mime dispatch) and is reproducible in SQL,
which is what lets the DuckDB oracle check the whole mapInPandas path
(plans/multimodal_plans.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Decoded-metadata schema — the output contract of decode_media_meta.
MEDIA_META_SCHEMA = (
    "doc_id bigint, mime string, n_bytes bigint, "
    "width int, height int, n_frames int, sample_rate int"
)

_MIMES = ["image/jpeg", "audio/wav", "video/mp4"]


def attach_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Attach a synthetic media payload column to a text table.

    Payload bytes are the utf-8 encoding of the text (deterministic, so
    the oracle can recompute sizes/hashes); mime rotates by id. At 100 TB
    the payload column would come straight from parquet ``binary`` — this
    helper only exists because the synthetic testdata has no media.
    """
    mime = F.element_at(
        F.array(*[F.lit(m) for m in _MIMES]), (F.col(id_col) % 3 + 1).cast("int")
    )
    return df.select(
        F.col(id_col),
        F.struct(
            F.encode(F.col(text_col), "utf-8").alias("bytes"),
            mime.alias("mime"),
        ).alias("media"),
    )


def _parse_jpeg_dims(b: bytes) -> tuple[int, int]:
    """(width, height) from a JPEG byte stream by walking the marker
    segments to the first SOF frame header — pure-python, no PIL.

    JPEG layout: SOI (FFD8), then FF-prefixed segments with big-endian
    2-byte lengths; SOFn (FFC0-FFCF except C4/C8/CC) carries
    precision(1) height(2) width(2). Raises NotImplementedError when
    the bytes are not a parseable JPEG.
    """
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG stream (no SOI marker)")
    i = 2
    while i + 1 < len(b):
        if b[i] != 0xFF:
            raise NotImplementedError("corrupt JPEG marker stream")
        # the spec allows any number of 0xFF FILL bytes before a marker:
        # the marker code is the first non-FF byte after the FF run
        while i + 1 < len(b) and b[i + 1] == 0xFF:
            i += 1
        if i + 1 >= len(b):
            raise NotImplementedError("truncated JPEG (stream ends in fill bytes)")
        marker = b[i + 1]
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2  # standalone markers carry no length
            continue
        if i + 4 > len(b):
            raise NotImplementedError("truncated JPEG segment header")
        seglen = int.from_bytes(b[i + 2 : i + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > len(b):
                raise NotImplementedError("truncated SOF header")
            height = int.from_bytes(b[i + 5 : i + 7], "big")
            width = int.from_bytes(b[i + 7 : i + 9], "big")
            return width, height
        i += 2 + seglen
    raise NotImplementedError("no SOF frame header found")


def _parse_wav_rate(b: bytes) -> int:
    """Sample rate from a RIFF/WAVE byte stream by walking chunks to
    ``fmt `` — pure-python, no librosa. Raises NotImplementedError when
    the bytes are not a parseable WAV."""
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE stream")
    i = 12
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        clen = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt " and i + 16 <= len(b):
            return int.from_bytes(b[i + 12 : i + 16], "little")
        i += 8 + clen + (clen % 2)  # chunks are word-aligned
    raise NotImplementedError("no fmt chunk found")


def _real_decode_meta(payload: bytes, mime: str) -> dict:
    """Decode actual media bytes.

    JPEG and WAV are parsed with pure-python header walks (no codec
    libraries needed): real dimensions for ``image/jpeg``, real sample
    rate for ``audio/wav``. Video containers (and any byte stream that
    does not parse as its declared mime — e.g. the synthetic utf-8
    payloads in the test fixtures) raise ``NotImplementedError``, and
    the caller falls back to the deterministic fake; a production
    deployment would instead route unparseable rows to a quarantine
    column and plug PIL/librosa/av in here for full decode.
    """
    meta = {"n_bytes": len(payload), "width": None, "height": None,
            "n_frames": None, "sample_rate": None}
    if mime == "image/jpeg":
        meta["width"], meta["height"] = _parse_jpeg_dims(payload)
        return meta
    if mime == "audio/wav":
        meta["sample_rate"] = _parse_wav_rate(payload)
        return meta
    raise NotImplementedError(
        f"no pure-python parser for {mime!r} (video needs a real codec); "
        "using deterministic fake decode"
    )


def _fake_decode_meta(payload: bytes, mime: str) -> dict:
    """Deterministic stand-in for decode: metadata derived from md5 of the
    payload. Mirrored exactly by the DuckDB oracle SQL so the mapInPandas
    plumbing is correctness-checked end-to-end."""
    h = hashlib.md5(payload).hexdigest()
    meta = {"n_bytes": len(payload), "width": None, "height": None,
            "n_frames": None, "sample_rate": None}
    if mime.startswith(("image/", "video/")):
        meta["width"] = 64 + int(h[0:7], 16) % 960
        meta["height"] = 64 + int(h[7:14], 16) % 576
    if mime.startswith("video/"):
        meta["n_frames"] = 1 + int(h[14:18], 16) % 120
    if mime.startswith("audio/"):
        meta["sample_rate"] = 8000 + (int(h[14:18], 16) % 8) * 4000
    return meta


def decode_media_meta(media_df: DataFrame) -> DataFrame:
    """Extract typed metadata from the payload column.

    Arrow-batched ``mapInPandas`` — the canonical shape for byte-level
    media work on Spark: narrow (no shuffle), codec state initialized
    once per python worker, memory bounded per batch.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                payload, mime = media["bytes"], media["mime"]
                try:
                    meta = _real_decode_meta(payload, mime)
                except NotImplementedError:
                    meta = _fake_decode_meta(payload, mime)
                rows.append({"doc_id": doc_id, "mime": mime, **meta})
            out = pd.DataFrame(rows)
            # pandas turns int columns with NULLs into float; restore
            # nullable ints so Arrow hands Spark the declared schema.
            for c in ("width", "height", "n_frames", "sample_rate"):
                out[c] = out[c].astype("Int32")
            yield out

    return media_df.mapInPandas(decode, schema=MEDIA_META_SCHEMA)


def resize_images(meta_df: DataFrame, max_w: int = 256, max_h: int = 256) -> DataFrame:
    """Plan a bounded-box resize: compute target dims for every image row.

    The byte-level re-encode is stubbed with the codecs; the *planning*
    math (aspect-preserving clamp) is native column algebra and runs at
    full scale today.
    """
    scale = F.least(
        F.lit(1.0), F.least(F.lit(max_w) / F.col("width"), F.lit(max_h) / F.col("height"))
    )
    return meta_df.filter(F.col("mime").startswith("image/")).select(
        "doc_id",
        "width",
        "height",
        F.ceil(F.col("width") * scale).cast("int").alias("target_w"),
        F.ceil(F.col("height") * scale).cast("int").alias("target_h"),
    )


def sample_frames(meta_df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Plan frame sampling for video rows: one output row per kept frame
    index (``posexplode``-style fan-out). Downstream frame decode is the
    stubbed codec step; the fan-out shape (row-per-frame, partitioned by
    doc) is the real 100 TB design."""
    idxs = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
    # explode_outer: non-empty for every video row (n_frames >= 1), and it
    # avoids the inferred size>0 filter materializing the index sequence
    # twice per row (SCALE.md generator pitfall).
    return (
        meta_df.filter(F.col("mime").startswith("video/"))
        .select("doc_id", "n_frames", F.explode_outer(idxs).alias("frame_idx"))
    )
