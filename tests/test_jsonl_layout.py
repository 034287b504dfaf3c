"""Tests for the JSONL quarantine source (sources/jsonl.py) and the
layout-aware parquet writer (sinks.write_parquet_layout): valid/corrupt
splitting, schema rejection, one-file-per-partition-dir layout, and
within-file sort clustering."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from bbc_news_data_pipeline_spark.sources.jsonl import CORRUPT_COL, read_jsonl
from bbc_news_data_pipeline_spark.sources.sinks import write_parquet_layout

DOC_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def _write_jsonl(tmp_path, lines):
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_read_jsonl_splits_valid_and_quarantine(spark, tmp_path):
    good = [json.dumps({"doc_id": i, "text": f"t{i}", "lang": "en"}) for i in range(5)]
    bad = ['{"doc_id": "not-a-number", "text": 1}', "{broken json", '["array","row"]']
    path = _write_jsonl(tmp_path, good[:3] + bad + good[3:])
    valid, quarantine = read_jsonl(spark, path, DOC_SCHEMA)
    assert valid.columns == ["doc_id", "text", "lang"]
    assert sorted(r.doc_id for r in valid.collect()) == [0, 1, 2, 3, 4]
    q = [r.raw for r in quarantine.collect()]
    assert len(q) == 3
    assert any("broken json" in r for r in q)  # raw line preserved for debugging


def test_read_jsonl_rejects_reserved_column(spark, tmp_path):
    schema = StructType([StructField(CORRUPT_COL, StringType())])
    with pytest.raises(ValueError):
        read_jsonl(spark, str(tmp_path / "x.jsonl"), schema)


def test_read_jsonl_all_valid_empty_quarantine(spark, tmp_path):
    path = _write_jsonl(
        tmp_path, [json.dumps({"doc_id": i, "text": "x", "lang": "de"}) for i in range(4)]
    )
    valid, quarantine = read_jsonl(spark, path, DOC_SCHEMA)
    assert valid.count() == 4
    assert quarantine.count() == 0


def test_write_parquet_layout_one_file_per_partition(spark, tmp_path, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "lake")
    write_parquet_layout(docs, out, partition_by=("lang",), sort_by=("doc_id",))
    for d in glob.glob(os.path.join(out, "lang=*")):
        files = glob.glob(os.path.join(d, "*.parquet"))
        assert len(files) == 1, f"small-file spray in {d}"
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns)


def test_write_parquet_layout_sorted_within_files(spark, tmp_path, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "lake")
    write_parquet_layout(docs, out, partition_by=("lang",), sort_by=("doc_id",))
    f = glob.glob(os.path.join(out, "lang=*", "*.parquet"))[0]
    ids = pq.read_table(f, columns=["doc_id"])["doc_id"].to_pylist()
    assert ids == sorted(ids)  # clustered → row-group min/max are selective


def test_write_parquet_layout_unpartitioned_file_count(spark, tmp_path):
    df = spark.range(1000).withColumn("v", F.col("id") * 2)
    out = str(tmp_path / "flat")
    write_parquet_layout(df, out, num_files=3, sort_by=("id",))
    assert len(glob.glob(os.path.join(out, "*.parquet"))) == 3


def test_layout_audit_detects_sort_clustering(spark, sf_dir, tmp_path):
    from bbc_news_data_pipeline_spark.sources.sinks import layout_audit
    from bbc_news_data_pipeline_spark.sources.tables import load

    ev = load(spark, sf_dir, "events").select("event_id", "value")
    sorted_dir = str(tmp_path / "sorted")
    spray_dir = str(tmp_path / "spray")
    # clustered: global range-partition + sort → disjoint per-file slices
    ev.repartitionByRange(8, "value").sortWithinPartitions("value") \
        .write.parquet(sorted_dir)
    # spray: hash-random distribution — every file spans the full range
    ev.repartition(8, "event_id").write.parquet(spray_dir)

    rf_sorted = layout_audit(spark, sorted_dir, "value").first().read_fraction
    rf_spray = layout_audit(spark, spray_dir, "value").first().read_fraction
    assert rf_sorted < 0.25  # ~1/8 + boundary slack
    # unclustered layout can't skip: every file spans (almost) the whole
    # value range (heavy-tailed values keep this below 1.0)
    assert rf_spray > 0.5 and rf_spray > 3 * rf_sorted
    # per-file rows sum to the table
    audit = layout_audit(spark, sorted_dir, "value")
    assert audit.agg(F.sum("n_rows")).first()[0] == ev.count()
