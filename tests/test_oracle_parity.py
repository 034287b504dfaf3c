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


# Round-9 sweep (verdict task #3): queries that emit floats derived from
# engine transcendentals, distributed double sums, or fine floor grids —
# the q276/q279 failure classes. Each runs TWICE under different
# spark.sql.shuffle.partitions and the two results must be identical:
# any aggregation-order sensitivity that survived the per-query
# discipline (integer-grid terms, det_ln/det_exp surrogates, bounded
# ordered windows) shows up here as a value flip.
FLOAT_EMITTING = [
    "q279_rbo_rankings", "q276_feature_mi", "q73_event_type_drift",
    "q90_quantile_drift", "q117_hashed_classifier", "q159_calibration_ece",
    "q103_temperature_mix", "q109_dsir_weights", "q102_unigram_logprob",
    "q118_bigram_logprob", "q273_kneser_ney_bigram", "q234_kaplan_meier",
    "q261_doremi_weights", "q254_zipf_fit", "q260_heaps_law",
    "q256_column_entropy", "q246_hill_tail_index", "q236_js_divergence",
    "q270_classifier_training", "q284_lsh_param_tune",
    # r10 additions: q183/q276 now emit pure BIGINT grids, but the grid
    # values still derive from double arithmetic — keep them swept.
    "q183_correlation_matrix", "q185_cuped_ab_test",
]
_BY_NAME = {q.name: q for q in QUERIES}


@pytest.mark.parametrize("name", FLOAT_EMITTING)
def test_float_emission_order_independent(name, spark, sf_dir):
    q = _BY_NAME[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = q.spark(spark, sf_dir).toPandas()
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = q.spark(spark, sf_dir).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    errs = compare(a, b)
    assert not errs, f"{name} is shuffle-order sensitive: {errs}"


def test_compare_is_bitwise_on_floats():
    """r10 (verdict task #2): the local comparator must distinguish
    float REPRESENTATIONS exactly as the driver's value hash does —
    -0.0 vs +0.0 and last-ulp neighbors are mismatches (the q183 r9
    signed-zero red slipped through the old `==`); only NaN==NaN is
    equal, regardless of payload."""
    import numpy as np
    import pandas as pd

    same = pd.DataFrame({"x": [1.5, -0.0, float("nan")]})
    assert compare(same, same.copy()) == []

    signed_zero = pd.DataFrame({"x": [0.0]})
    neg_zero = pd.DataFrame({"x": [-0.0]})
    assert np.signbit(neg_zero["x"].to_numpy()[0])  # fixture is real -0.0
    assert compare(signed_zero, neg_zero), "-0.0 vs +0.0 must mismatch"

    one = pd.DataFrame({"x": [1.0]})
    ulp = pd.DataFrame({"x": [np.nextafter(1.0, 2.0)]})
    assert compare(one, ulp), "one-ulp difference must mismatch"

    nan_a = pd.DataFrame({"x": [float("nan")]})
    payload = np.array([np.int64(0x7FF8000000000001)]).view("float64")
    nan_b = pd.DataFrame({"x": payload})
    assert compare(nan_a, nan_b) == [], "NaN==NaN regardless of payload"
