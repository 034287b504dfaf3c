"""Mergeable frequency/cardinality sketches, built RELATIONALLY.

At 100 TB the exact answers these approximate — per-key counts, distinct
cardinality — are the queries whose state explodes: an exact distinct
count shuffles every key; an exact frequency table materializes the full
vocabulary. The sketches here reduce both to CONSTANT-size tables
(a depth×width counter grid, an m-register vector) with two properties
the rest of this repo's incremental design leans on:

  * **relational construction** — each sketch is an ordinary DataFrame
    aggregation (map-side combinable groupBy over hash-derived cells),
    so Catalyst plans it like any other rollup and the result is a
    broadcastable few-KB table;
  * **mergeability** — counters add and registers max, so per-shard
    sketches combine into corpus sketches exactly like the q119 stats
    manifests; and because every hash is md5-derived (never engine
    ``hash()``), an oracle engine reproduces the sketch BIT-FOR-BIT,
    which is what makes the approximation itself verifiable.

Count–min sketch: Cormode & Muthukrishnan 2005 (J. Algorithms 55) —
point estimate = min over depth rows, never underestimates.
HyperLogLog: Flajolet et al. 2007 — stochastic averaging over m
first-byte buckets of the rank of the first 1-bit; the rank is computed
with INTEGER/string algebra (hex-digit inspection), not floor(log2()),
because log2 is the one place a 1-ulp libm difference could flip an
integer and silently desynchronize engines.

The reference has no sketch surface (its scale ceiling is ~1,000 docs,
``data_preparation.py:38-40``); this is part of the LLM-pipeline
extension family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CM_DEPTH = 4
CM_WIDTH = 512
HLL_M = 256  # 2^8 buckets: bucket = first md5 byte


def _md5_int(prefix: str, col: Column, start: int, length: int) -> Column:
    hx = F.substring(F.md5(F.concat(F.lit(prefix), col)), start, length)
    return F.conv(hx, 16, 10).cast("long")


def cm_cell(col: Column, d: int, width: int = CM_WIDTH) -> Column:
    """Row-``d`` column index for a key: md5-derived, engine-portable."""
    return _md5_int(f"cm{d}:", col, 1, 8) % width


def cm_build(
    weighted_keys: DataFrame,
    key_col: str,
    count_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
) -> DataFrame:
    """(d, col, cnt): count–min counter grid over a pre-rolled-up
    (key, count) table. Feeding the DISTINCT-key rollup instead of the
    raw stream keeps the build shuffle vocab-bounded (Zipf-bounded for
    text) — the raw stream is only touched by the first map-side
    combine. depth×width rows out: broadcastable, and mergeable across
    shards by summing cnt cell-wise."""
    k = F.col(key_col)
    cells = F.array(
        *[
            F.struct(F.lit(d).alias("d"), cm_cell(k, d, width).alias("col"))
            for d in range(depth)
        ]
    )
    return (
        weighted_keys.select(F.col(count_col).alias("_c"), F.explode(cells).alias("u"))
        .select("u.d", "u.col", "_c")
        .groupBy("d", "col")
        .agg(F.sum("_c").alias("cnt"))
    )


def cm_estimate(
    keys: DataFrame,
    counters: DataFrame,
    key_col: str,
    depth: int = CM_DEPTH,
    width: int = CM_WIDTH,
    out_col: str = "cms_estimate",
) -> DataFrame:
    """Point-query each key against a :func:`cm_build` grid: estimate =
    min over the depth cells. The grid is broadcast — probing never
    shuffles the probe side. The join is LEFT with empty cells read as
    0: a sparse grid omits untouched (d, col) rows, and CMS semantics
    require the min to SEE those zeros — an inner join would both
    overestimate keys that share only some cells with built keys and
    silently drop keys touching no built cell (an unseen key's correct
    estimate is 0, not absence)."""
    k = F.col(key_col)
    cells = F.array(
        *[
            F.struct(F.lit(d).alias("d"), cm_cell(k, d, width).alias("col"))
            for d in range(depth)
        ]
    )
    probes = keys.withColumn("_u", F.explode(cells)).select(
        *keys.columns, F.col("_u.d").alias("d"), F.col("_u.col").alias("col")
    )
    return (
        probes.join(F.broadcast(counters), ["d", "col"], "left")
        .groupBy(*keys.columns)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias(out_col))
    )


def hll_bucket_rho(col: Column, salt: str = "hll:") -> tuple[Column, Column]:
    """(bucket, rho) for one key: bucket = first md5 byte (0..255); rho =
    1 + number of leading zero BITS of the next 32 hash bits (33 if all
    zero). rho is derived by hex-digit inspection — count leading '0'
    hex digits, then the leading-zero bits inside the first non-zero
    nibble via exact integer comparisons — so both engines compute the
    identical integer with no floating log anywhere."""
    md5 = F.md5(F.concat(F.lit(salt), col))
    bucket = F.conv(F.substring(md5, 1, 2), 16, 10).cast("long")
    hs = F.substring(md5, 3, 8)
    z = F.length(F.regexp_extract(hs, "^0*", 0))
    d = F.conv(hs.substr(z + F.lit(1), F.lit(1)), 16, 10).cast("long")
    lzn = (
        F.when(d >= 8, 0).when(d >= 4, 1).when(d >= 2, 2).otherwise(3)
    )
    rho = F.when(z == 8, F.lit(33)).otherwise(z * 4 + lzn + 1).cast("long")
    return bucket, rho


def hll_harmonic_agg(regs: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """(group..., occupied, sum_pow): the harmonic aggregation every HLL
    estimate consumes, over a :func:`hll_registers` table (or any table
    with a ``r`` rank column). 2^-r is computed as 1.0 / (1 << r) —
    exact dyadic doubles whose sum is order-independent — shared by
    q122/q124/q126 so the arithmetic cannot drift between them."""
    group_cols = group_cols or []
    return regs.groupBy(*group_cols).agg(
        F.count("*").alias("occupied"),
        F.sum(
            F.lit(1.0) / F.expr("shiftleft(CAST(1 AS BIGINT), CAST(r AS INT))")
        ).alias("sum_pow"),
    )


def hll_registers(
    keys: DataFrame, key_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """(group..., bucket, r): HLL register table — max rho per bucket
    (optionally per group). ≤ HLL_M rows per group, mergeable across
    shards by bucket-wise max. Duplicate keys hash identically, so the
    input needs NO distinct pass — max absorbs repeats."""
    group_cols = group_cols or []
    bucket, rho = hll_bucket_rho(F.col(key_col))
    return (
        keys.select(*group_cols, bucket.alias("bucket"), rho.alias("_rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("_rho").alias("r"))
    )


# alpha_m for m = 256 (Flajolet et al. 2007, fig. 3), and the
# alpha_m * m^2 product PRE-MULTIPLIED in Python so both engines consume
# one identical double literal instead of each multiplying two
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_AM2 = HLL_ALPHA * float(HLL_M * HLL_M)


def hll_estimate_cols(m: int = HLL_M) -> tuple[Column, Column]:
    """Given an aggregated row with ``sum_pow`` = Σ 2^-r over OCCUPIED
    buckets, ``occupied`` = their count, and ``zero_buckets`` implied,
    returns (raw, corrected) estimate columns. Empty buckets contribute
    2^0 = 1 each; all 2^-r terms are exact dyadic doubles whose sum is
    exact (≤ m terms of ≥ 2^-33), so the harmonic denominator is
    order-independent. Small-range (linear counting) correction applies
    below 2.5·m when empty buckets exist — same branch, same literals,
    both engines."""
    denom = F.col("sum_pow") + (F.lit(m) - F.col("occupied"))
    raw = F.lit(HLL_AM2) / denom
    v = F.lit(m) - F.col("occupied")
    corrected = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    return raw, corrected


# --- count-sketch / AMS second frequency moment ---------------------------

CS_DEPTH = 5  # odd, so the median row is unique
CS_WIDTH = 512


def cs_cell(col: Column, d: int, width: int = CS_WIDTH) -> Column:
    """Row-``d`` column index for a key (count-sketch grid)."""
    return _md5_int(f"cs{d}:", col, 1, 8) % width


def cs_sign(col: Column, d: int) -> Column:
    """Row-``d`` ±1 sign for a key: an independent md5 bit, so the oracle
    reproduces every sign exactly (never engine hash())."""
    return F.lit(1) - F.lit(2) * (_md5_int(f"sg{d}:", col, 9, 1) % 2)


def cs_build(
    weighted_keys: DataFrame,
    key_col: str,
    count_col: str,
    depth: int = CS_DEPTH,
    width: int = CS_WIDTH,
) -> DataFrame:
    """(d, col, cnt): count-sketch counter grid (Charikar et al. 2002) —
    the CMS grid with ±1 signs, Σ s_d(k)·f(k) per cell. Like cm_build it
    feeds off the DISTINCT-key rollup (vocab-bounded shuffle) and merges
    across shards by summing cells; unlike CMS its cell squares estimate
    the SECOND frequency moment F2 = Σf² — the self-join size — per
    depth, with the median over depths as the robust estimate."""
    k = F.col(key_col)
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                cs_cell(k, d, width).alias("col"),
                cs_sign(k, d).alias("s"),
            )
            for d in range(depth)
        ]
    )
    return (
        weighted_keys.select(F.col(count_col).alias("_c"), F.explode(cells).alias("u"))
        .select("u.d", "u.col", (F.col("u.s") * F.col("_c")).alias("_sc"))
        .groupBy("d", "col")
        .agg(F.sum("_sc").alias("cnt"))
    )


# --- fixed-grid mergeable quantile digest ---------------------------------

GRID_W = 16  # bucket width in value units; max interpolation error = GRID_W


def grid_digest(
    df: DataFrame, value_col: str, width: int = GRID_W, group_cols: list[str] | None = None
) -> DataFrame:
    """(group..., bucket, cnt): fixed-grid histogram digest of an integer
    value column — the mergeable quantile synopsis (the deterministic
    cousin of t-digest/KLL: a FIXED bucketing agreed a priori, so
    per-shard digests are compatible by construction and an oracle
    engine reproduces every bucket exactly). bucket = value div width
    (exact integer division, engine-portable — never floor(x/w) on
    doubles). Size is domain/width rows regardless of input cardinality;
    rank-r quantiles interpolate off the merged cumulative with
    within-bucket error < width. One map-side-combinable groupBy."""
    group_cols = group_cols or []
    b = F.expr(f"CAST({value_col} AS BIGINT) div {width}")
    return (
        df.select(*group_cols, b.alias("bucket"))
        .groupBy(*group_cols, "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def merge_grid_digests(
    *digests: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge digests cell-wise (counts add — same contract as cm_build
    grids and q119 manifests): digest(A ∪ B) ≡ merge(digest(A),
    digest(B)) because the bucketing is a pure row-local function.

    Per-group digests (``grid_digest(..., group_cols=...)``) merge by
    passing the SAME ``group_cols`` here — merging groups by (*group,
    bucket). Inputs carrying columns beyond the declared keys + (bucket,
    cnt) RAISE: silently summing across an undeclared group column would
    collapse distinct digests into one wrong histogram."""
    group_cols = group_cols or []
    expected = {*group_cols, "bucket", "cnt"}
    for d in digests:
        extra = set(d.columns) - expected
        if extra or not {"bucket", "cnt"} <= set(d.columns):
            raise ValueError(
                f"digest columns {sorted(d.columns)} do not match the "
                f"declared shape {sorted(expected)} — pass group_cols= for "
                "per-group digests (undeclared groups would be summed away)"
            )
    out = digests[0]
    for d in digests[1:]:
        out = out.unionByName(d)
    return out.groupBy(*group_cols, "bucket").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )
