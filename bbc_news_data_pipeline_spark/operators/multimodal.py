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

Header-level metadata is parsed FOR REAL with pure-python walks — JPEG
marker segments (SOF dims), RIFF/WAVE chunks (sample rate), and the ISO
BMFF box tree (``moov``→``mvhd`` duration, ``tkhd`` dims, ``stts``
frame count) — no codec library needed. Pixel/sample-level decode (PIL /
librosa / av) is NOT in this container: byte streams that don't parse as
their declared mime fall back to ``_fake_decode_meta``, a deterministic
md5-derived metadata synthesizer. The fake keeps every piece of Spark
plumbing real (schema, Arrow batch iteration, null handling, per-mime
dispatch) and is reproducible in SQL, which is what lets the DuckDB
oracle check the whole mapInPandas path (plans/multimodal_plans.py).
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


#: ISO BMFF container boxes whose payload is itself a box sequence.
_MP4_CONTAINERS = frozenset((b"moov", b"trak", b"mdia", b"minf", b"stbl"))
#: Box types legal at the top level of a file we accept as MP4.
_MP4_TOP_LEVEL = frozenset((b"ftyp", b"styp", b"moov", b"mdat", b"free", b"skip", b"wide"))


def _mp4_boxes(b: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for each ISO BMFF box in
    ``b[start:end]``: 4-byte big-endian size + 4-byte type, size==1 →
    64-bit largesize follows, size==0 → box extends to the end."""
    i = start
    while i + 8 <= end:
        size = int.from_bytes(b[i : i + 4], "big")
        btype = b[i + 4 : i + 8]
        hdr = 8
        if size == 1:
            if i + 16 > end:
                raise NotImplementedError("truncated MP4 largesize header")
            size = int.from_bytes(b[i + 8 : i + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - i
        if size < hdr or i + size > end:
            raise NotImplementedError("corrupt MP4 box size")
        yield btype, i + hdr, i + size
        i += size
    if i != end:
        raise NotImplementedError("trailing garbage after last MP4 box")


def _parse_mp4_meta(b: bytes) -> dict:
    """Video metadata from an ISO BMFF (MP4) byte stream by walking the
    box tree — pure-python, no av/ffmpeg: ``moov``→``mvhd`` gives
    timescale + duration (→ ``duration_s``), the first ``trak``'s
    ``tkhd`` gives presentation ``width``/``height`` (16.16 fixed
    point), and the first ``stbl``→``stts`` sample table gives
    ``n_frames`` (sum of its entry counts). Single-video-track files
    (the overwhelming training-corpus case) are exact; for muxed
    audio+video the first track wins — a production decoder would
    select the trak whose ``minf`` carries ``vmhd``. Raises
    NotImplementedError when the bytes are not a parseable MP4.
    """
    if len(b) < 8 or b[4:8] not in _MP4_TOP_LEVEL:
        raise NotImplementedError("not an ISO BMFF stream (no known top-level box)")
    meta = {"width": None, "height": None, "n_frames": None, "duration_s": None}
    stack = [(b"", 0, len(b))]
    while stack:
        _, s, e = stack.pop()
        for btype, ps, pe in _mp4_boxes(b, s, e):
            if btype in _MP4_CONTAINERS:
                stack.append((btype, ps, pe))
            elif btype == b"mvhd" and meta["duration_s"] is None:
                if pe - ps < 20:
                    raise NotImplementedError("truncated mvhd box")
                version = b[ps]
                if version == 1:
                    if pe - ps < 32:
                        raise NotImplementedError("truncated mvhd v1 box")
                    timescale = int.from_bytes(b[ps + 20 : ps + 24], "big")
                    duration = int.from_bytes(b[ps + 24 : ps + 32], "big")
                else:
                    timescale = int.from_bytes(b[ps + 12 : ps + 16], "big")
                    duration = int.from_bytes(b[ps + 16 : ps + 20], "big")
                if timescale == 0:
                    raise NotImplementedError("mvhd timescale is zero")
                meta["duration_s"] = duration / timescale
            elif btype == b"tkhd" and meta["width"] is None:
                version = b[ps] if pe > ps else 0
                off = ps + (88 if version == 1 else 76)
                if off + 8 > pe:
                    raise NotImplementedError("truncated tkhd box")
                meta["width"] = int.from_bytes(b[off : off + 4], "big") >> 16
                meta["height"] = int.from_bytes(b[off + 4 : off + 8], "big") >> 16
            elif btype == b"stts" and meta["n_frames"] is None:
                if pe - ps < 8:
                    raise NotImplementedError("truncated stts box")
                n_entries = int.from_bytes(b[ps + 4 : ps + 8], "big")
                if ps + 8 + 8 * n_entries > pe:
                    raise NotImplementedError("truncated stts entry table")
                meta["n_frames"] = sum(
                    int.from_bytes(b[ps + 8 + 8 * k : ps + 12 + 8 * k], "big")
                    for k in range(n_entries)
                )
    if meta["duration_s"] is None or meta["n_frames"] is None:
        raise NotImplementedError("no moov/mvhd + stts boxes found")
    return meta


def _real_decode_meta(payload: bytes, mime: str) -> dict:
    """Decode actual media bytes.

    JPEG, WAV and MP4 are parsed with pure-python header walks (no codec
    libraries needed): real dimensions for ``image/jpeg``, real sample
    rate for ``audio/wav``, real track dims + frame count from the
    ``moov`` box tree for ``video/mp4``. Any byte stream that does not
    parse as its declared mime — e.g. the synthetic utf-8 payloads in
    the test fixtures — raises ``NotImplementedError``, and the caller
    falls back to the deterministic fake; a production deployment would
    instead route unparseable rows to a quarantine column and plug
    PIL/librosa/av in here for full pixel/sample decode.
    """
    meta = {"n_bytes": len(payload), "width": None, "height": None,
            "n_frames": None, "sample_rate": None}
    if mime == "image/jpeg":
        meta["width"], meta["height"] = _parse_jpeg_dims(payload)
        return meta
    if mime == "audio/wav":
        meta["sample_rate"] = _parse_wav_rate(payload)
        return meta
    if mime == "video/mp4":
        m = _parse_mp4_meta(payload)
        meta["width"], meta["height"] = m["width"], m["height"]
        meta["n_frames"] = m["n_frames"]
        return meta
    raise NotImplementedError(
        f"no pure-python parser for {mime!r}; using deterministic fake decode"
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


# --- perceptual-hash image near-dup (r7 verdict task #5) --------------------

#: Fixed synthetic-bitmap geometry: 16x16 gray pixels -> 2x2 block
#: averages -> 8x8 aHash grid -> 8 row-bands of 8 bits.
PGM_W = PGM_H = 16
AHASH_GRID = 8
AHASH_BANDS_SCHEMA = "doc_id bigint, band_idx int, band bigint"


def _pgm_pixels(g: int, odd: int) -> bytes:
    """Deterministic 16x16 gray bitmap for pair-group ``g``: row y's
    pixels are md5("pgm:g:y") digest bytes, and the odd pair member gets
    a +2 bump on the (x+y)%5==0 diagonal stripe — a NEAR-duplicate of
    its even sibling (same content, tiny perturbation), which is the
    shape a perceptual hash must band together. md5-derived so the
    DuckDB oracle recomputes identical pixels with hex slicing."""
    out = bytearray()
    for y in range(PGM_H):
        dig = hashlib.md5(f"pgm:{g}:{y}".encode()).digest()
        for x in range(PGM_W):
            p = dig[x]
            if odd and (x + y) % 5 == 0:
                p = min(255, p + 2)
            out.append(p)
    return bytes(out)


def encode_pgm_images(df: DataFrame) -> DataFrame:
    """(doc_id, g, odd) -> (doc_id, pgm binary): a REAL P5 PGM byte
    stream (magic, dims, maxval, raw gray bytes) built in an
    Arrow-batched mapInPandas — the wire format the decode side parses
    back, so a bug in either codec breaks oracle parity."""

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                f"P5\n{PGM_W} {PGM_H}\n255\n".encode()
                + _pgm_pixels(int(g), int(odd))
                for g, odd in zip(pdf["g"], pdf["odd"])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "pgm": payloads})

    return df.mapInPandas(enc, schema="doc_id bigint, pgm binary")


def _parse_pgm(b: bytes) -> tuple[int, int, bytes]:
    """(width, height, pixels) from a binary P5 PGM stream — pure-python
    header walk (magic, whitespace/comment-tolerant dims and maxval,
    then exactly w*h raw bytes). Raises NotImplementedError on anything
    that is not a parseable 8-bit P5 (the module's parse-error-signal
    convention, not a stub)."""
    if b[:2] != b"P5":
        raise NotImplementedError("not a P5 PGM stream")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if b[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(b) and b[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(b[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only 8-bit PGM supported")
    px = b[pos : pos + w * h]
    if len(px) != w * h:
        raise NotImplementedError("truncated PGM pixel payload")
    return w, h, px


def _ahash_bands(px: bytes, w: int, h: int) -> list[int]:
    """8 row-bands (8 bits each) of the 64-bit average hash: 2x2 block
    means (integer floor), global mean (integer floor), bit = block >
    mean. Exact integer algebra end to end — engine-portable."""
    gw = w // 2
    grid = [
        (
            px[2 * r * w + 2 * c]
            + px[2 * r * w + 2 * c + 1]
            + px[(2 * r + 1) * w + 2 * c]
            + px[(2 * r + 1) * w + 2 * c + 1]
        )
        // 4
        for r in range(h // 2)
        for c in range(gw)
    ]
    mu = sum(grid) // len(grid)
    return [
        sum((1 << c) for c in range(gw) if grid[r * gw + c] > mu)
        for r in range(h // 2)
    ]


def ahash_bands(pgm_df: DataFrame) -> DataFrame:
    """(doc_id, pgm) -> (doc_id, band_idx, band): decode the PGM, compute
    the aHash, emit one row per 8-bit band — the LSH-ready layout (band
    equality = candidate bucket, exactly q43's SimHash banding shape)."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, vals = [], [], []
            for doc_id, pgm in zip(pdf["doc_id"], pdf["pgm"]):
                w, h, px = _parse_pgm(bytes(pgm))
                for i, band in enumerate(_ahash_bands(px, w, h)):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    vals.append(band)
            yield pd.DataFrame(
                {"doc_id": ids, "band_idx": idxs, "band": vals}
            ).astype({"doc_id": "int64", "band_idx": "int32", "band": "int64"})

    return pgm_df.mapInPandas(dec, schema=AHASH_BANDS_SCHEMA)


# --- audio energy-fingerprint near-dup (q271) -------------------------------

#: Fixed synthetic-audio geometry: 256 samples of 8-bit mono PCM at
#: 8 kHz -> 64 frames of 4 samples -> 64 energy bits -> 8 bands of 8.
WAV_NSAMPLES = 256
WAV_RATE = 8000


def _wav_samples(g: int, odd: int) -> bytes:
    """Deterministic 256-sample 8-bit PCM clip for pair-group ``g``
    (md5 blocks, 16 samples each); the odd member gets a +2 bump every
    5th sample — a near-duplicate of its even sibling. md5-derived so
    the oracle recomputes identical samples with hex slicing."""
    out = bytearray()
    blk = 0
    while len(out) < WAV_NSAMPLES:
        out += hashlib.md5(f"wav:{g}:{blk}".encode()).digest()
        blk += 1
    s = bytearray(out[:WAV_NSAMPLES])
    if odd:
        for i in range(0, WAV_NSAMPLES, 5):
            s[i] = min(255, s[i] + 2)
    return bytes(s)


def encode_wav_audio(df: DataFrame) -> DataFrame:
    """(doc_id, g, odd) -> (doc_id, wav binary): a REAL RIFF/WAVE stream
    (fmt chunk: PCM, mono, 8 kHz, 8-bit; data chunk: raw samples) built
    in an Arrow-batched mapInPandas — the decode side re-parses it, so
    either codec breaking shows up as an oracle hash mismatch."""

    def _wav_bytes(g: int, odd: int) -> bytes:
        pcm = _wav_samples(g, odd)
        fmt = (
            b"fmt "
            + (16).to_bytes(4, "little")
            + (1).to_bytes(2, "little")  # PCM
            + (1).to_bytes(2, "little")  # mono
            + WAV_RATE.to_bytes(4, "little")
            + WAV_RATE.to_bytes(4, "little")  # byte rate (8-bit mono)
            + (1).to_bytes(2, "little")  # block align
            + (8).to_bytes(2, "little")  # bits per sample
        )
        data = b"data" + len(pcm).to_bytes(4, "little") + pcm
        body = b"WAVE" + fmt + data
        return b"RIFF" + len(body).to_bytes(4, "little") + body

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "wav": [
                        _wav_bytes(int(g), int(odd))
                        for g, odd in zip(pdf["g"], pdf["odd"])
                    ],
                }
            )

    return df.mapInPandas(enc, schema="doc_id bigint, wav binary")


def _parse_wav_pcm(b: bytes) -> tuple[int, bytes]:
    """(sample_rate, raw samples) from a RIFF/WAVE stream — the
    full-payload extension of :func:`_parse_wav_rate`: walks chunks,
    validates the fmt chunk is 8-bit mono PCM, returns the data chunk.
    Raises NotImplementedError on anything else (parse-error signal)."""
    if len(b) < 12 or b[0:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE stream")
    i, rate, data = 12, None, None
    while i + 8 <= len(b):
        cid = b[i : i + 4]
        clen = int.from_bytes(b[i + 4 : i + 8], "little")
        if cid == b"fmt ":
            if clen < 16:
                raise NotImplementedError("truncated fmt chunk")
            audio_fmt = int.from_bytes(b[i + 8 : i + 10], "little")
            channels = int.from_bytes(b[i + 10 : i + 12], "little")
            bits = int.from_bytes(b[i + 22 : i + 24], "little")
            if (audio_fmt, channels, bits) != (1, 1, 8):
                raise NotImplementedError("only 8-bit mono PCM supported")
            rate = int.from_bytes(b[i + 12 : i + 16], "little")
        elif cid == b"data":
            data = b[i + 8 : i + 8 + clen]
            if len(data) != clen:
                raise NotImplementedError("truncated data chunk")
        i += 8 + clen + (clen % 2)
    if rate is None or data is None:
        raise NotImplementedError("missing fmt or data chunk")
    return rate, data


def _energy_bands(samples: bytes) -> list[int]:
    """8 row-bands of the 64-bit frame-energy fingerprint: 4-sample
    frame energies sum((s-128)^2), global integer mean, bit = energy >
    mean. Exact integer algebra — engine-portable, q269's aHash shape
    transposed to the time axis."""
    nf = len(samples) // 4
    en = [
        sum((s - 128) * (s - 128) for s in samples[4 * f : 4 * f + 4])
        for f in range(nf)
    ]
    mu = sum(en) // nf
    bits = [1 if e > mu else 0 for e in en]
    return [
        sum(bits[8 * b + c] << c for c in range(8)) for b in range(nf // 8)
    ]


def wav_fingerprint_bands(wav_df: DataFrame) -> DataFrame:
    """(doc_id, wav) -> (doc_id, band_idx, band): decode the WAV, emit
    the LSH-ready banded energy fingerprint (q269's layout)."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, vals = [], [], []
            for doc_id, wav in zip(pdf["doc_id"], pdf["wav"]):
                _, pcm = _parse_wav_pcm(bytes(wav))
                for i, band in enumerate(_energy_bands(pcm)):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    vals.append(band)
            yield pd.DataFrame(
                {"doc_id": ids, "band_idx": idxs, "band": vals}
            ).astype({"doc_id": "int64", "band_idx": "int32", "band": "int64"})

    return wav_df.mapInPandas(dec, schema=AHASH_BANDS_SCHEMA)
