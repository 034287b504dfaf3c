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

QUERIES = [
    Query("q45_media_meta", q45_media_meta, Q45_SQL, survey="ext:multimodal-decode", tags=("bench",)),
    Query("q47_image_resize_plan", q47_image_resize_plan, Q47_SQL,
          survey="ext:multimodal-resize"),
    Query("q48_video_frame_sample", q48_video_frame_sample, Q48_SQL,
          survey="ext:multimodal-frames"),
]
