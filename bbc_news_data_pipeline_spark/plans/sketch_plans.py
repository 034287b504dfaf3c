"""Sketch plans (q121–q122) — verifiable approximate structures over the
corpus, built on operators/sketches.py: a count–min frequency sketch and
a HyperLogLog cardinality estimate.

The verification trick is the q105-Bloom pattern: every hash in a sketch
is md5-derived, so the DuckDB oracle rebuilds the SAME sketch bit-for-bit
and the parity gate proves not "the estimate is close" but "the sketch
itself — every counter, every register — is reproduced exactly". The
accuracy claims (CMS never underestimates; HLL within a few % at this
register count) are asserted as invariants in tests, not left to prose.

Scale shape: both sketches reduce to map-side-combinable groupBys over
hash-derived cells. CMS builds from the DISTINCT-word rollup (Zipf-
bounded input) into a depth×width grid; HLL registers build straight
from the token stream (max absorbs duplicates — no distinct pass) into
≤ m rows per group. Both outputs are few-KB broadcastable tables,
mergeable across ingest shards (counters add, registers max) — the
sketch twin of q119's stats manifests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketches import (
    CM_DEPTH,
    CM_WIDTH,
    HLL_AM2,
    HLL_M,
    cm_build,
    cm_estimate,
    hll_estimate_cols,
    hll_registers,
)
from ..sources.tables import load
from .dedup_plans import _hex2int_sql
from .registry import Query


# ---------------------------------------------------------------------------
# q121 — count–min frequency sketch + point queries (Cormode &
# Muthukrishnan 2005): build the depth×width counter grid over the full
# token stream, then point-query the 20 true-heaviest words and report
# estimate next to truth. The estimate ≥ truth invariant (one-sided
# error) is what makes CMS usable as a pre-filter for heavy-hitter
# detection at 100 TB: the grid is ~16 KB regardless of vocabulary size.
# ---------------------------------------------------------------------------
_Q121_TOPK = 20


def q121_countmin_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("true_count"))
    )
    counters = cm_build(vocab, "w", "true_count")
    top = vocab.orderBy(F.desc("true_count"), F.asc("w")).limit(_Q121_TOPK)
    return (
        cm_estimate(top, counters, "w")
        .select("w", F.col("true_count").cast("long").alias("true_count"), "cms_estimate")
        .orderBy(F.desc("true_count"), F.asc("w"))
    )


_CM_COL = (
    _hex2int_sql("md5('cm' || CAST(d AS VARCHAR) || ':' || w)", 1, 8)
    + f" % {CM_WIDTH}"
)

Q121_SQL = f"""
WITH tok AS (SELECT unnest(str_split(lower(text), ' ')) AS w FROM documents),
vocab AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
lanes AS (SELECT unnest(generate_series(0, {CM_DEPTH - 1})) AS d),
cells AS (
    SELECT d, {_CM_COL} AS col, c
    FROM vocab CROSS JOIN lanes
),
counters AS (SELECT d, col, sum(c) AS cnt FROM cells GROUP BY d, col),
top AS (SELECT w, c FROM vocab ORDER BY c DESC, w LIMIT {_Q121_TOPK}),
probe AS (
    SELECT t.w, t.c, d, {_CM_COL} AS col
    FROM top t CROSS JOIN lanes
),
est AS (
    SELECT p.w, p.c, min(counters.cnt) AS e
    FROM probe p JOIN counters USING (d, col)
    GROUP BY p.w, p.c
)
SELECT w, CAST(c AS BIGINT) AS true_count, CAST(e AS BIGINT) AS cms_estimate
FROM est
ORDER BY true_count DESC, w
"""


# ---------------------------------------------------------------------------
# q122 — HyperLogLog distinct-vocabulary estimate per language (Flajolet
# et al. 2007), next to the exact distinct count for audit. The exact
# count exists here FOR the comparison — at 100 TB it is precisely the
# aggregation one avoids (every distinct key shuffles); the register
# table is ≤ m rows per language and merges across shards by max. rho is
# integer/string algebra end-to-end (operators/sketches.py) and the
# harmonic denominator is a sum of exact dyadic doubles — the only
# rounding-sensitive op is the final α·m²/denom (and ln in the
# small-range branch), absorbed by round(,2).
# ---------------------------------------------------------------------------
def q122_hll_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select("lang", F.explode(F.split(F.lower("text"), " ")).alias("w"))
    regs = hll_registers(tok, "w", ["lang"])
    agg = regs.groupBy("lang").agg(
        F.count("*").alias("occupied"),
        F.sum(
            F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), CAST(r AS INT))")
        ).alias("sum_pow"),
    )
    raw, corrected = hll_estimate_cols()
    est = agg.select("lang", corrected.alias("_est"))
    exact = tok.groupBy("lang").agg(F.count_distinct("w").alias("exact_distinct"))
    return (
        exact.join(est, "lang")
        .select(
            "lang",
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            F.round("_est", 2).alias("hll_estimate"),
            F.round(
                (F.col("_est") - F.col("exact_distinct"))
                / F.col("exact_distinct")
                * 100,
                2,
            ).alias("rel_err_pct"),
        )
        .orderBy("lang")
    )


_HLL_BUCKET = _hex2int_sql("md5('hll:' || w)", 1, 2)

Q122_SQL = f"""
WITH tok AS (
    SELECT lang, unnest(str_split(lower(text), ' ')) AS w FROM documents
),
h AS (
    SELECT lang,
           {_HLL_BUCKET} AS bucket,
           substring(md5('hll:' || w), 3, 8) AS hs
    FROM tok
),
rho AS (
    SELECT lang, bucket,
           CASE WHEN z = 8 THEN 33
                ELSE 4 * z + CASE WHEN dv >= 8 THEN 0
                                  WHEN dv >= 4 THEN 1
                                  WHEN dv >= 2 THEN 2
                                  ELSE 3 END + 1
           END AS rho
    FROM (
        SELECT lang, bucket, z,
               CAST(strpos('0123456789abcdef',
                           substring(hs, z + 1, 1)) - 1 AS BIGINT) AS dv
        FROM (SELECT lang, bucket, hs,
                     length(regexp_extract(hs, '^0*')) AS z FROM h) t0
    ) t1
),
regs AS (SELECT lang, bucket, max(rho) AS r FROM rho GROUP BY lang, bucket),
agg AS (
    -- every literal is CAST to DOUBLE: DuckDB parses bare decimal
    -- literals as DECIMAL and its decimal division would NOT reproduce
    -- Spark's exact-dyadic double arithmetic
    SELECT lang, count(*) AS occupied,
           sum(CAST(1.0 AS DOUBLE) / (1::BIGINT << r)) AS sum_pow
    FROM regs GROUP BY lang
),
est AS (
    SELECT lang,
           CASE WHEN raw <= CAST({2.5 * HLL_M!r} AS DOUBLE) AND zb > 0
                THEN CAST({float(HLL_M)!r} AS DOUBLE)
                     * ln(CAST({float(HLL_M)!r} AS DOUBLE) / zb)
                ELSE raw
           END AS e
    FROM (
        SELECT lang,
               CAST({HLL_AM2!r} AS DOUBLE)
                   / (sum_pow + ({HLL_M} - occupied)) AS raw,
               {HLL_M} - occupied AS zb
        FROM agg
    ) t
),
exact AS (SELECT lang, count(DISTINCT w) AS x FROM tok GROUP BY lang)
SELECT exact.lang,
       CAST(x AS BIGINT) AS exact_distinct,
       round(e, 2) AS hll_estimate,
       round((e - x) / x * 100, 2) AS rel_err_pct
FROM exact JOIN est USING (lang)
ORDER BY lang
"""


QUERIES = [
    Query("q121_countmin_heavy", q121_countmin_heavy, Q121_SQL,
          survey="ext:countmin-sketch,A11"),
    Query("q122_hll_vocab", q122_hll_vocab, Q122_SQL,
          survey="ext:hll-cardinality,A13"),
]
