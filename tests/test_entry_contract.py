"""Driver-contract integrity: __spark_entry__ exposes entry/queries/
oracle_sql coherently, every oracle parses in DuckDB, and entry() is
re-entrant on one session."""

import duckdb
import pytest

import __spark_entry__ as E
from bbc_news_data_pipeline_spark.sources.tables import TABLES


def test_registry_shape():
    qs, os_ = E.queries(), E.oracle_sql()
    assert len(qs) >= 50
    assert set(os_) <= set(qs)  # every oracle key is a real query
    missing = set(qs) - set(os_)
    assert missing == set(), f"queries without oracle (driver runs weaker check): {missing}"


def test_driver_window_rotation_is_permutation():
    """The driver-boundary rotation must present every registered query
    exactly once (a pure rotation of the canonical order), and advance by
    one 50-slot window per recorded round."""
    from bbc_news_data_pipeline_spark.plans import all_queries

    canonical = [q.name for q in all_queries()]
    rotated = list(E.queries())
    assert sorted(rotated) == sorted(canonical)
    offset = canonical.index(rotated[0])
    assert rotated == canonical[offset:] + canonical[:offset]
    import glob as g
    import os as o

    n_rounds = len(g.glob(o.path.join(o.path.dirname(E.__file__), "CORRECTNESS_r*.json")))
    assert offset == (n_rounds * 50) % len(canonical)


def test_every_oracle_parses_in_duckdb(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    for name, sql in E.oracle_sql().items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as e:  # pragma: no cover - failure path
            pytest.fail(f"oracle for {name} does not parse: {e}")


def test_entry_reentrant(spark):
    a = E.entry(spark)
    b = E.entry(spark)
    assert a.schema == b.schema
    assert a.count() == b.count() > 0


def test_every_query_analyzes(spark, sf_dir):
    """Registry-wide analysis smoke gate: build EVERY registered plan and
    force Catalyst analysis (schema resolution) without executing it.

    This is the cheap tripwire the round-2 regression showed we need: a
    single loader/type change (e.g. the events `ts` physical-format switch)
    must fail HERE, loudly, for all affected queries — not silently take
    out half the driver's correctness window."""
    failures = []
    for name, fn in E.queries().items():
        try:
            fn(spark, sf_dir).schema  # .schema triggers analysis only
        except Exception as e:
            failures.append(f"{name}: {type(e).__name__}: {str(e)[:160]}")
    assert not failures, "queries failing analysis:\n" + "\n".join(failures)


def test_query_callables_accept_sf_dir(spark, sf_dir):
    """Spot-check the (spark, sf_dir) calling convention across surfaces."""
    qs = E.queries()
    for name in ("q01_pricing_summary", "q30_doc_stats", "q40_cosine_top10"):
        df = qs[name](spark, sf_dir)
        assert df.count() > 0


def test_cluster_conf_shape():
    from bbc_news_data_pipeline_spark.session import cluster_conf

    conf = cluster_conf(executors=1000, cores_per_executor=4)
    assert conf["spark.sql.shuffle.partitions"] == str(2 * 1000 * 4)
    assert conf["spark.sql.adaptive.enabled"] == "true"
    # every value must be a string (SparkConf contract)
    assert all(isinstance(v, str) for v in conf.values())


def test_operator_facade_imports():
    from bbc_news_data_pipeline_spark import operators

    for mod in operators.__all__:
        assert hasattr(operators, mod)
