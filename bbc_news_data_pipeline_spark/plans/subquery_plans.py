"""Correlated-subquery plans (q64–q66) — the SQL-API surface of the
engine, exercising Catalyst's subquery decorrelation (TPC-H Q4 / Q17 /
Q22 shapes re-cut to the synthetic schema).

Each query is ONE ANSI-SQL string executed verbatim by BOTH engines:
``spark.sql`` over the registered table views and DuckDB as the oracle.
Catalyst rewrites EXISTS → left-semi join, NOT EXISTS → left-anti join,
and the correlated scalar aggregate → an aggregate + equi-join
(RewriteCorrelatedScalarSubquery) — i.e. the decorrelated plans a user
would otherwise hand-write with the DataFrame API, derived by the
optimizer. `tests/test_plans.py` pins those physical shapes.

Scale: all three decorrelate to hash joins on the correlation key — no
per-row re-execution of the subquery (the disaster a naive interpreter
would produce), no nested loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views
from .registry import Query

Q64_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_discount > 0.08
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

Q65_SQL = """
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_weekly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
      SELECT 0.5 * avg(l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = p_partkey
  )
"""

Q66_SQL = """
SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
FROM customer c
WHERE c_acctbal > (
        SELECT avg(c_acctbal) FROM customer c2
        WHERE c2.c_nationkey = c.c_nationkey
      )
  AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
      )
ORDER BY c_custkey
"""


def _sql_query(sql: str):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(sql)

    return run


QUERIES = [
    Query("q64_exists_priority_counts", _sql_query(Q64_SQL), Q64_SQL,
          survey="ext:subquery-exists,J2"),
    Query("q65_correlated_scalar_avg", _sql_query(Q65_SQL), Q65_SQL,
          survey="ext:subquery-scalar,A3"),
    Query("q66_antijoin_above_nation_avg", _sql_query(Q66_SQL), Q66_SQL,
          survey="ext:subquery-antijoin,J2,A3"),
]
