"""JSONL source with corrupt-record quarantine.

The reference validates scraped items by silently DROPPING invalid rows
(``pipelines.py:5-16`` — SURVEY P10). At training-data scale, dropped
rows must be observable: this source parses JSON-lines with an explicit
schema in PERMISSIVE mode and splits the result into (valid, quarantine)
— the quarantine side carrying the raw offending line for debugging /
reprocessing, which is the P10 "quarantine variant" SURVEY calls for.

Scale notes: one parse pass over the files (the permissive parser tags
corrupt rows inline); the valid/quarantine split shares that scan via a
persist — at cluster scale the same split runs as two sinks off one
cached pass, or a single ``foreachBatch`` fan-out in streaming. Schema
is declared, never inferred: inference would read the data twice and
bind whatever the sample happened to contain (the dynamic-schema trap
the reference lives in — SURVEY §1.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType
) -> tuple[DataFrame, DataFrame]:
    """Parse JSON-lines at ``path`` against ``schema``.

    Returns ``(valid, quarantine)``:
      * ``valid`` — rows matching the schema, schema's columns only;
      * ``quarantine`` — one ``raw`` string column per malformed line
        (bad JSON or type mismatch).

    The frame is persisted before the split — Spark disallows filtering
    on the corrupt-record column of an un-materialized permissive parse
    (and the persist also makes the two branches share one parse).
    """
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not declare {CORRUPT_COL!r}")
    # StructType.add mutates in place — copy so the caller's schema (and
    # our later select of its fields) stays clean.
    full_schema = StructType(
        list(schema.fields) + [StructField(CORRUPT_COL, StringType())]
    )
    parsed = (
        spark.read.schema(full_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .persist()
    )
    valid = parsed.filter(F.col(CORRUPT_COL).isNull()).select(
        *[F.col(f.name) for f in schema.fields]
    )
    quarantine = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    return valid, quarantine
