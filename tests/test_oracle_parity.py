"""The correctness gate, as pytest: every registered query's Spark plan
must exactly match its DuckDB oracle at sf0.001 (the driver runs the same
comparison at sf0.01 — see tools/check_parity.py for the standalone CLI).
"""

import duckdb
import pytest

from bbc_news_data_pipeline_spark.plans import all_queries
from bbc_news_data_pipeline_spark.sources.tables import TABLES

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from check_parity import compare  # noqa: E402

QUERIES = all_queries()


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def test_registry_complete():
    assert len(QUERIES) >= 38
    assert all(q.oracle for q in QUERIES), "every query currently ships an oracle"


@pytest.mark.parametrize("q", QUERIES, ids=[q.name for q in QUERIES])
def test_query_matches_oracle(q, spark, sf_dir, oracle):
    spark_pdf = q.spark(spark, sf_dir).toPandas()
    oracle_pdf = oracle.execute(q.oracle).df()
    errs = compare(spark_pdf, oracle_pdf)
    assert not errs, f"{q.name}: {errs}"
