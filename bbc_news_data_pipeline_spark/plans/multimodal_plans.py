"""Multimodal-column plans — certify the Spark plumbing for binary media
payloads (operators/multimodal.py) against a DuckDB oracle.

The payloads are synthesized deterministically from `documents.text`
(utf-8 bytes), so the oracle can recompute EVERYTHING the mapInPandas
decoder produces — byte lengths and the md5-derived fake metadata —
purely in SQL. That makes q45 a genuine end-to-end check of the Arrow
batch path: schema, struct access, null handling, Int32 restoration.

q47/q48 then run native column-algebra planning steps (resize clamp,
frame-index fan-out) on top of the decoded metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    attach_media,
    decode_media_meta,
    resize_images,
    sample_frames,
)
from ..sources.tables import load
from .dedup_plans import _hex2int_sql
from .registry import Query


def _media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return decode_media_meta(attach_media(docs))


# DuckDB twin of multimodal._fake_decode_meta: md5 of the payload == md5 of
# the text (utf-8 both sides); hex slices h[0:7]/h[7:14]/h[14:18].
_W = f"CAST(64 + {_hex2int_sql('md5(text)', 1, 7)} % 960 AS INTEGER)"
_H = f"CAST(64 + {_hex2int_sql('md5(text)', 8, 7)} % 576 AS INTEGER)"
_FR = f"CAST(1 + {_hex2int_sql('md5(text)', 15, 4)} % 120 AS INTEGER)"
_SR = f"CAST(8000 + ({_hex2int_sql('md5(text)', 15, 4)} % 8) * 4000 AS INTEGER)"
_MIME = ("CASE doc_id % 3 WHEN 0 THEN 'image/jpeg' "
         "WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END")

_META_CTE = f"""
meta AS (
    SELECT doc_id,
           {_MIME} AS mime,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CASE WHEN doc_id % 3 IN (0, 2) THEN {_W} END AS width,
           CASE WHEN doc_id % 3 IN (0, 2) THEN {_H} END AS height,
           CASE WHEN doc_id % 3 = 2 THEN {_FR} END AS n_frames,
           CASE WHEN doc_id % 3 = 1 THEN {_SR} END AS sample_rate
    FROM documents
)
"""


# ---------------------------------------------------------------------------
# q45 — decode media metadata via Arrow-batched mapInPandas.
# ---------------------------------------------------------------------------
def q45_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _media_meta(spark, sf_dir)


Q45_SQL = f"""
WITH {_META_CTE}
SELECT * FROM meta ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q47 — aspect-preserving resize planning for image rows (native algebra
# on decoded metadata; the byte-level re-encode is the stubbed codec step).
# ---------------------------------------------------------------------------
def q47_image_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return resize_images(_media_meta(spark, sf_dir), max_w=256, max_h=256)


Q47_SQL = f"""
WITH {_META_CTE}
SELECT doc_id, width, height,
       CAST(ceil(width * least(1.0, least(256.0 / width, 256.0 / height))) AS INTEGER)
           AS target_w,
       CAST(ceil(height * least(1.0, least(256.0 / width, 256.0 / height))) AS INTEGER)
           AS target_h
FROM meta
WHERE mime LIKE 'image/%'
ORDER BY doc_id
"""


# ---------------------------------------------------------------------------
# q48 — frame-sampling fan-out for video rows: one row per kept frame index
# (every 10th). The row-per-frame shape is the scale design; frame decode
# itself is the stubbed codec step.
# ---------------------------------------------------------------------------
def q48_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sample_frames(_media_meta(spark, sf_dir), every_nth=10)


Q48_SQL = f"""
WITH {_META_CTE}
SELECT doc_id, n_frames, CAST(unnest(generate_series(0, n_frames - 1, 10)) AS INTEGER)
           AS frame_idx
FROM meta
WHERE mime LIKE 'video/%'
ORDER BY doc_id, frame_idx
"""

# ---------------------------------------------------------------------------
# q269 — perceptual-hash image near-dup (ext, r7 verdict task #5): the
# multimodal surface's first CONTENT-level operator — q45/q47/q48 stop
# at header metadata; image dedup needs pixels. The chain: synthesize a
# deterministic 16x16 gray bitmap per doc (pair-groups g = doc_id div 2;
# the odd member is a NEAR-duplicate — +2 on a diagonal stripe), encode
# it as a REAL binary P5 PGM in one mapInPandas, parse it back with the
# pure-python PGM decoder in a second mapInPandas (the codec round-trip
# is part of what parity checks), compute the 64-bit aHash (2x2 integer
# block means, global integer mean, bit = block > mean), emit 8 row-
# bands of 8 bits, then exactly q43's SimHash shape: band-equality
# self-join for candidates, exact Hamming verify (bit_count over XOR),
# threshold filter. On the fixture all 250 constructed pairs band
# together and survive (hamming <= 3) with zero false extras. The
# oracle recomputes pixels/hash/bands/join from the md5 formula in SQL
# — no binary columns, so a bug in either PGM codec breaks the hash
# match. Scale: per-doc work is row-local Arrow-batched Python (pixel
# decode is the genuinely non-relational step); the only shuffles are
# the band-bucket join (uniform 8-bit keys x band_idx) and the bounded
# candidate rollup — no all-pairs stage anywhere.
# ---------------------------------------------------------------------------
_Q269_HAM_T = 8


def _band_hamming_pairs(bands: DataFrame, ham_t: int) -> DataFrame:
    """Shared LSH tail for the perceptual fingerprints (q269 image aHash,
    q271 audio energy hash): band-equality self-join for candidates,
    exact Hamming verify via bit_count(xor), threshold gate. Input:
    (doc_id, band_idx, band); the caller localCheckpoints it (three
    consumers below)."""
    a = bands.select(F.col("doc_id").alias("doc_a"), "band_idx", "band")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band_idx", "band")
    cand = (
        a.join(b, ["band_idx", "band"])
        .filter(F.col("doc_b") > F.col("doc_a"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("long").alias("n_shared_bands"))
    )
    ba = bands.select(
        F.col("doc_id").alias("doc_a"), "band_idx", F.col("band").alias("band_a")
    )
    bb = bands.select(
        F.col("doc_id").alias("doc_b"), "band_idx", F.col("band").alias("band_b")
    )
    ham = (
        cand.join(ba, "doc_a")
        .join(bb, ["doc_b", "band_idx"])
        .groupBy("doc_a", "doc_b", "n_shared_bands")
        .agg(
            F.sum(F.bit_count(F.col("band_a").bitwiseXOR(F.col("band_b"))))
            .cast("long")
            .alias("hamming")
        )
    )
    return (
        ham.filter(F.col("hamming") <= ham_t)
        .select("doc_a", "doc_b", "n_shared_bands", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def q269_image_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import ahash_bands, encode_pgm_images

    docs = load(spark, sf_dir, "documents")
    imgs = docs.select(
        "doc_id",
        F.expr("doc_id div 2").alias("g"),
        (F.col("doc_id") % 2).alias("odd"),
    )
    bands = ahash_bands(encode_pgm_images(imgs)).localCheckpoint(
        eager=False
    )  # feeds the bucket self-join + both hamming sides
    return _band_hamming_pairs(bands, _Q269_HAM_T)


_Q269_PXL = _hex2int_sql(
    "md5('pgm:' || CAST(i.g AS VARCHAR) || ':' || CAST(co.y AS VARCHAR))",
    "(2 * co.x + 1)",  # digest byte x = hex chars 2x+1..2x+2
    2,
)

Q269_SQL = f"""
WITH imgs AS (
    SELECT doc_id, doc_id // 2 AS g, doc_id % 2 AS odd FROM documents
),
coords AS (
    SELECT gx.x, gy.y
    FROM (SELECT unnest(generate_series(0, 15)) AS x) gx
    CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS y) gy
),
pix AS (
    SELECT i.doc_id, co.x, co.y,
           least(255, {_Q269_PXL}
                 + CASE WHEN i.odd = 1 AND (co.x + co.y) % 5 = 0
                        THEN 2 ELSE 0 END) AS p
    FROM imgs i CROSS JOIN coords co
),
grid AS (
    SELECT doc_id, y // 2 AS r, x // 2 AS c, CAST(sum(p) // 4 AS BIGINT) AS a
    FROM pix GROUP BY doc_id, y // 2, x // 2
),
mu AS (SELECT doc_id, sum(a) // 64 AS mu FROM grid GROUP BY doc_id),
bands AS (
    SELECT g.doc_id, CAST(g.r AS INTEGER) AS band_idx,
           CAST(sum(CASE WHEN g.a > m.mu
                         THEN (CAST(1 AS BIGINT) << CAST(g.c AS INTEGER))
                         ELSE 0 END) AS BIGINT) AS band
    FROM grid g JOIN mu m USING (doc_id)
    GROUP BY g.doc_id, g.r
),
cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
    FROM bands a
    JOIN bands b ON b.band_idx = a.band_idx AND b.band = a.band
                AND b.doc_id > a.doc_id
    GROUP BY 1, 2
),
ham AS (
    SELECT c.doc_a, c.doc_b, c.shared,
           CAST(sum(bit_count(xor(ba.band, bb.band))) AS BIGINT) AS hamming
    FROM cand c
    JOIN bands ba ON ba.doc_id = c.doc_a
    JOIN bands bb ON bb.doc_id = c.doc_b AND bb.band_idx = ba.band_idx
    GROUP BY 1, 2, 3
)
SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS n_shared_bands, hamming
FROM ham
WHERE hamming <= {_Q269_HAM_T}
ORDER BY doc_a, doc_b
"""


# ---------------------------------------------------------------------------
# q271 — audio energy-fingerprint near-dup (ext): q269's shape
# transposed to the time axis, completing the content-level multimodal
# trio (image aHash q269, audio here, video frame plan q48). A REAL
# RIFF/WAVE round-trip: deterministic 256-sample 8-bit mono PCM clips
# (pair-groups, +2 bump every 5th sample on the odd member) are encoded
# with fmt/data chunks in one mapInPandas and re-parsed by the
# full-payload WAV decoder (validates PCM/mono/8-bit, loud refusal
# otherwise); the fingerprint is 64 four-sample frame energies
# sum((s-128)^2) -> bit = energy > integer mean -> 8 row-bands, then
# the shared _band_hamming_pairs LSH tail. All 250 constructed pairs
# recovered, zero false extras (prototyped; pinned by test). Oracle
# recomputes samples/energies/bands from the md5 formula in SQL — the
# WAV codec is inside the parity loop. Scale: identical to q269 —
# row-local Arrow decode, uniform band-bucket join, bounded rollup.
# ---------------------------------------------------------------------------
_Q271_HAM_T = 8


def q271_audio_fingerprint_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import encode_wav_audio, wav_fingerprint_bands

    docs = load(spark, sf_dir, "documents")
    auds = docs.select(
        "doc_id",
        F.expr("doc_id div 2").alias("g"),
        (F.col("doc_id") % 2).alias("odd"),
    )
    bands = wav_fingerprint_bands(encode_wav_audio(auds)).localCheckpoint(
        eager=False
    )  # feeds the bucket self-join + both hamming sides
    return _band_hamming_pairs(bands, _Q271_HAM_T)


_Q271_SMP = _hex2int_sql(
    "md5('wav:' || CAST(a.g AS VARCHAR) || ':' || CAST(ix.i // 16 AS VARCHAR))",
    "(2 * (ix.i % 16) + 1)",  # digest byte (i mod 16) = hex chars 2k+1..2k+2
    2,
)

Q271_SQL = f"""
WITH auds AS (
    SELECT doc_id, doc_id // 2 AS g, doc_id % 2 AS odd FROM documents
),
idx AS (SELECT unnest(generate_series(0, 255)) AS i),
smp AS (
    SELECT a.doc_id, ix.i,
           least(255, {_Q271_SMP}
                 + CASE WHEN a.odd = 1 AND ix.i % 5 = 0 THEN 2 ELSE 0 END) AS s
    FROM auds a CROSS JOIN idx ix
),
en AS (
    SELECT doc_id, i // 4 AS f,
           CAST(sum((s - 128) * (s - 128)) AS BIGINT) AS e
    FROM smp GROUP BY doc_id, i // 4
),
mu AS (SELECT doc_id, sum(e) // 64 AS mu FROM en GROUP BY doc_id),
bands AS (
    SELECT e.doc_id, CAST(e.f // 8 AS INTEGER) AS band_idx,
           CAST(sum(CASE WHEN e.e > m.mu
                         THEN (CAST(1 AS BIGINT) << CAST(e.f % 8 AS INTEGER))
                         ELSE 0 END) AS BIGINT) AS band
    FROM en e JOIN mu m USING (doc_id)
    GROUP BY e.doc_id, e.f // 8
),
cand AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
    FROM bands a
    JOIN bands b ON b.band_idx = a.band_idx AND b.band = a.band
                AND b.doc_id > a.doc_id
    GROUP BY 1, 2
),
ham AS (
    SELECT c.doc_a, c.doc_b, c.shared,
           CAST(sum(bit_count(xor(ba.band, bb.band))) AS BIGINT) AS hamming
    FROM cand c
    JOIN bands ba ON ba.doc_id = c.doc_a
    JOIN bands bb ON bb.doc_id = c.doc_b AND bb.band_idx = ba.band_idx
    GROUP BY 1, 2, 3
)
SELECT doc_a, doc_b, CAST(shared AS BIGINT) AS n_shared_bands, hamming
FROM ham
WHERE hamming <= {_Q271_HAM_T}
ORDER BY doc_a, doc_b
"""


QUERIES = [
    Query("q45_media_meta", q45_media_meta, Q45_SQL, survey="ext:multimodal-decode", tags=("bench",)),
    Query("q269_image_phash_neardup", q269_image_phash_neardup, Q269_SQL,
          survey="ext:multimodal-phash,ext:multimodal-decode,"
                 "ext:image-neardup,ext:banding-lsh",
          tags=("bench",)),
    Query("q271_audio_fingerprint_neardup", q271_audio_fingerprint_neardup,
          Q271_SQL,
          survey="ext:multimodal-audiohash,ext:multimodal-decode,"
                 "ext:audio-neardup,ext:banding-lsh",
          tags=("bench",)),
    Query("q47_image_resize_plan", q47_image_resize_plan, Q47_SQL,
          survey="ext:multimodal-resize"),
    Query("q48_video_frame_sample", q48_video_frame_sample, Q48_SQL,
          survey="ext:multimodal-frames"),
]
