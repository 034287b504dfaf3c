"""Similarity search over embedding columns (array<float>).

Extension surface for the LLM-data pipeline (BASELINE.json north star):
brute-force cosine top-k as the exactness baseline, plus an LSH-bucketed
variant as the scale path.

Determinism (round 5): similarity arithmetic is QUANTIZED-EXACT. Float
components are quantized to 1e-6 resolution int64s and dot/norm² are
integer sums — exactly associative, so ANY evaluation order on ANY
engine produces the same value (the r4 float-fold version relied on
DuckDB's list_sum matching Spark's sequential double fold bit-for-bit,
which held at sf0.01 and broke by 1 ulp on 4 pairs at sf0.1 — rank
boundaries then flipped). The final sqrt/divide operate on exactly
int64-representable doubles (bounds: |x|≤1, dim≤4096 → norm² ≤ 4e15 <
2^53), so they are IEEE-deterministic too. Quantization perturbs cosine
by ~1e-6 relative — far below the 4dp output rounding — and the DuckDB
oracles apply the identical quantization, making parity hold BY
CONSTRUCTION at every scale.

Scale notes: brute-force against ONE query vector is a broadcast map —
embarrassingly parallel, no shuffle, and TakeOrderedAndProject handles the
top-k merge. For all-pairs workloads use `lsh_bucket_ann` (random
hyperplane signs → bucket join), which turns O(n²) into a per-bucket
product like MinHash banding does for text.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: Quantization scale: 1e-6 component resolution. Scales cancel in
#: cosine (dot is scale², each norm is scale¹), so no rescaling needed.
QUANT_SCALE = 1_000_000


def _qint(arr: Column) -> Column:
    """Components quantized to int64 at 1e-6 resolution via
    floor(x·scale + 0.5) — pure IEEE ops, so identical in Spark and
    DuckDB for identical input doubles (native round() implementations
    diverge at decimal-representation boundaries; see :func:`qround`)."""
    return F.transform(
        arr,
        lambda x: F.floor(x.cast("double") * QUANT_SCALE + F.lit(0.5)).cast("long"),
    )


def dot_q(aq: Column, bq: Column) -> Column:
    """Dot product over PRE-QUANTIZED int64 arrays (see :func:`_qint`) —
    the hot-path form: stage the quantized array once per vector and
    score many pairs against it, instead of re-quantizing both sides per
    pair. Returns double in QUANT_SCALE² units."""
    return F.aggregate(
        F.zip_with(aq, bq, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).cast("double")


def dot(a: Column, b: Column) -> Column:
    """Quantized-exact dot product: int64 sum of quantized component
    products (exactly associative — engine/order independent), returned
    as double in QUANT_SCALE² units."""
    return dot_q(_qint(a), _qint(b))


def norm_q(aq: Column) -> Column:
    """L2 norm over a PRE-QUANTIZED int64 array, in QUANT_SCALE units."""
    return F.sqrt(
        F.aggregate(
            aq, F.lit(0).cast("long"), lambda acc, x: acc + x * x
        ).cast("double")
    )


def norm(a: Column) -> Column:
    """Quantized-exact L2 norm in QUANT_SCALE units: sqrt of the exact
    int64 sum of squares (sqrt input is int64-exact → IEEE-deterministic)."""
    return norm_q(_qint(a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine over quantized-exact dot/norms — unitless (scales cancel),
    deterministic across engines and evaluation orders."""
    return dot(a, b) / (norm(a) * norm(b))


def sq_l2_q(aq: Column, bq: Column) -> Column:
    """Squared L2 over PRE-QUANTIZED int64 arrays (hot-path form of
    :func:`sq_l2` — stage :func:`_qint` once per vector when scoring
    many pairs)."""
    return F.aggregate(
        F.zip_with(aq, bq, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def sq_l2(a: Column, b: Column) -> Column:
    """Quantized-exact squared L2 distance: int64 sum of squared
    quantized component differences (QUANT_SCALE² units). Being an exact
    integer, it ranks without ANY rounding — the k-means assignment
    argmin needs no 6dp tiebreak epsilon at all."""
    return sq_l2_q(_qint(a), _qint(b))


def qround(c: Column, d: int) -> Column:
    """Engine-deterministic fixed-point rounding: floor(x·10^d + 0.5)/10^d.

    Native round() differs between engines on identical input doubles —
    Spark rounds the exact decimal expansion (BigDecimal HALF_UP) while
    DuckDB rounds in float arithmetic — and the similarity family ranks
    on rounded scores, so a boundary value flips top-k membership (seen
    at sf0.1: one 6dp boundary among 16k scores). This form is pure
    IEEE multiply/floor/divide: identical doubles in → identical doubles
    out on both engines. (Half-ties round toward +inf rather than away
    from zero — applied identically on both sides, so parity is by
    construction.) SQL twin: plans/embeddings_plans.py:_round_sql."""
    s = float(10**d)
    return F.floor(c * F.lit(s) + F.lit(0.5)) / F.lit(s)


def cosine_topk(
    emb: DataFrame,
    query_vec: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a 1-row query DataFrame (col `qv`).

    The query side is broadcast; each partition scores its rows and the
    rounded score + id tiebreak gives a total order for the limit.
    """
    # Query-side quantized array + norm precompute into the 1-row
    # broadcast — an inline cosine would re-quantize and re-fold them
    # once per corpus row. Same division grouping as cosine() ->
    # identical doubles.
    q2 = query_vec.select(
        _qint(F.col("qv")).alias("_qqv"), norm(F.col("qv")).alias("_qn")
    )
    scored = (
        emb.crossJoin(F.broadcast(q2))
        .withColumn(
            "cos_sim",
            qround(
                dot_q(_qint(F.col(vec_col)), F.col("_qqv"))
                / (norm(F.col(vec_col)) * F.col("_qn")),
                4,
            ),
        )
        .select(id_col, "cos_sim")
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def hyperplane_sign_bucket(qvec_col: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: sign bit per plane, packed to a long.

    Takes a PRE-QUANTIZED vector column (:func:`_qint` staged once per
    row — the signs cost |planes| dots per row, so inline quantization
    would multiply that work). `planes` are fixed (seeded) driver-side
    constants, quantized HERE in python with the same floor(x·scale+0.5)
    the engines use (python floats are the same IEEE doubles, so the
    literal ints match the SQL twin exactly) — tiny int literals in the
    plan, no join and no per-row plane quantization. Cosine-similar
    vectors collide with probability 1 - theta/pi per bit.
    """
    import math

    bits = []
    for i, p in enumerate(planes):
        qlit = F.array(
            *[F.lit(int(math.floor(float(x) * QUANT_SCALE + 0.5))) for x in p]
        )
        bits.append(
            F.when(dot_q(qvec_col, qlit) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def ivf_topk(
    emb: DataFrame,
    centroids: DataFrame,
    query_vec: DataFrame,
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage IVF search: (1) assign every vector to its nearest
    centroid (the inverted file); (2) score the query ONLY against
    vectors in the ``nprobe`` cells nearest to the query.

    Scale: stage 1 is a broadcast map over the corpus (computed once,
    reusable across queries — at 100 TB it would be a materialized
    column + partition key). Stage 2 prunes the scan to nprobe/ncells of
    the corpus; Catalyst turns the cell filter into a semi-join on the
    tiny probed-cell list. Recall < 1 by design — q40's brute force is
    the exactness baseline.
    """
    from pyspark.sql import Window as W

    cent = centroids.select(
        F.col(id_col).alias("cell_id"),
        F.col(vec_col).alias("cell_vec"),
        _qint(F.col(vec_col)).alias("cell_qv"),
        norm(F.col(vec_col)).alias("cell_nrm"),
    )
    # stage 1: inverted file — nearest centroid per corpus vector. The
    # corpus vector's quantized array + norm are staged ONCE per row
    # (not once per centroid — the assignment scores |cells| pairs per
    # vector), and centroid quantizations/norms precompute into the tiny
    # broadcast. Same division grouping as cosine() -> identical doubles.
    # Argmax is a SORT-FREE hash aggregate over SLIM columns only:
    # max_by on the composite (c_cos, -cell_id) reproduces the (score
    # desc, cell_id asc) window tiebreak, stays primitive-typed (so
    # Spark picks HashAggregate with map-side partials — the exchange
    # moves one (id, cell) row per vector, not |cells| payload rows),
    # and the embedding column rejoins afterwards instead of riding the
    # aggregation buffer (an array-typed first() demotes the whole agg
    # to SortAggregate).
    cell_map = (
        emb.withColumn("_qv", _qint(F.col(vec_col)))
        .withColumn("_nrm", norm_q(F.col("_qv")))
        .crossJoin(F.broadcast(cent))
        .select(
            id_col,
            "cell_id",
            qround(
                dot_q(F.col("_qv"), F.col("cell_qv"))
                / (F.col("_nrm") * F.col("cell_nrm")),
                6,
            ).alias("c_cos"),
        )
        .groupBy(id_col)
        .agg(
            F.max_by(
                F.col("cell_id"), F.struct(F.col("c_cos"), (-F.col("cell_id")).alias("_t"))
            ).alias("cell_id")
        )
    )
    # probed cells: nprobe centroids nearest to the query
    probed = (
        cent.crossJoin(F.broadcast(query_vec))
        .withColumn("q_cos", qround(cosine(F.col("cell_vec"), F.col("qv")), 6))
        .orderBy(F.desc("q_cos"), F.asc("cell_id"))
        .limit(nprobe)
        .select("cell_id")
    )
    # stage 2: score only vectors living in probed cells. The probed-cell
    # filter lands on the SLIM (id, cell) mapping FIRST — the embedding
    # payload rejoins only for the nprobe/ncells survivors, so the big
    # join's build side shrinks before any vector bytes move (query-side
    # quantization + norm staged in the 1-row broadcast, one fold each
    # instead of one per row)
    q2 = query_vec.select(
        _qint(F.col("qv")).alias("_qqv"), norm(F.col("qv")).alias("_qn")
    )
    candidates = emb.select(id_col, vec_col).join(
        cell_map.join(F.broadcast(probed), "cell_id"), id_col
    )
    scored = (
        candidates.crossJoin(F.broadcast(q2))
        .withColumn(
            "cos_sim",
            qround(
                dot_q(_qint(F.col(vec_col)), F.col("_qqv"))
                / (norm(F.col(vec_col)) * F.col("_qn")),
                4,
            ),
        )
        .select(id_col, "cell_id", "cos_sim")
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def lsh_bucket_ann(
    emb: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cos: float = 0.8,
    max_bucket: int | None = None,
) -> DataFrame:
    """Approximate near-neighbor pairs: bucket by hyperplane signs, score
    only within buckets. Returns (id_a, id_b, cos_sim >= min_cos).

    Shape: ONE bucketing pass (the 2^|planes| sign computation is |planes|
    dot products per row), groupBy bucket collecting (id, vector), then
    row-local pair generation + cosine inside each bucket — a single
    shuffle, no self-join, so the bucketing branch isn't computed twice.
    1.7× faster than the bucket self-join at sf0.1, identical output.

    Bucket occupancy is the memory knob: expected size = n / 2^|planes|,
    so SIZE BUCKETS BY ADDING PLANES as the corpus grows (each plane
    halves occupancy and sharpens the candidate filter). ``max_bucket``
    additionally drops over-full buckets outright for adversarial inputs
    (a degenerate bucket of near-identical vectors adds no recall worth
    its d² cost); None = keep all, the oracle-exact setting.
    """
    # The per-vector QUANTIZED array and norm ride along in the bucket
    # payload: computed ONCE per vector at bucketing time instead of
    # once/twice per candidate pair (pair count >> vector count is
    # exactly when LSH matters). The quantization itself is STAGED
    # through a select so the 6 sign dots + norm + payload share one
    # _qint evaluation (CollapseProject keeps a non-cheap expr staged
    # when it is referenced more than once). Identical ints -> identical
    # cosines; id stays the leading struct field so array_sort still
    # orders pairs by id.
    staged = emb.select(F.col(id_col), _qint(F.col(vec_col)).alias("_qv"))
    bucketed = staged.select(
        F.struct(
            F.col(id_col),
            F.col("_qv"),
            norm_q(F.col("_qv")).alias("_nrm"),
        ).alias("d"),
        hyperplane_sign_bucket(F.col("_qv"), planes).alias("bucket"),
    )
    return pairs_within_buckets(
        bucketed, id_col=id_col, min_cos=min_cos, max_bucket=max_bucket
    )


def pairs_within_buckets(
    bucketed: DataFrame,
    id_col: str = "vec_id",
    min_cos: float = 0.8,
    max_bucket: int | None = None,
) -> DataFrame:
    """Row-local pair generation + cosine inside pre-assigned buckets —
    the shared core of :func:`lsh_bucket_ann` (hyperplane buckets) and
    :func:`semantic_dedup` (centroid-cluster buckets). ``bucketed`` must
    have a ``bucket`` column and a ``d`` struct of
    (``id_col``, ``_qv`` quantized int64 array, ``_nrm`` quantized norm).

    One shuffle (groupBy bucket), collect-sorted payloads, pair transform
    scoring each pair exactly once; ``max_bucket`` drops over-full buckets
    via a pre-collect window count so the oversized bucket's array is
    never materialized in an agg buffer.
    """
    if max_bucket is not None:
        # Pre-collect cap: filter hot buckets via a window count BEFORE
        # the collect_list, so the oversized bucket's array is never
        # materialized in an agg buffer (same output as a post-collect
        # size filter; the groupBy reuses the window's exchange).
        from pyspark.sql import Window as W

        bucketed = bucketed.withColumn(
            "_bc", F.count("*").over(W.partitionBy("bucket"))
        ).filter(F.col("_bc") <= max_bucket).drop("_bc")
    grouped = (
        bucketed.groupBy("bucket")
        .agg(F.array_sort(F.collect_list("d")).alias("ds"))
        .filter(F.size("ds") >= 2)
    )
    # Cosine is computed INSIDE the pair transform so each pair scores
    # exactly once: a post-projection .filter(cos_sim >= t) would be
    # pushed below the Project, substituting the whole fold expression
    # into a second per-row evaluation (SCALE.md pushdown pathology).
    # Filtering on the generator's output field cannot sink below the
    # Generate. explode_outer: non-empty by the size>=2 filter; avoids
    # the inferred size>0 filter re-evaluating the pair transform.
    pairs = grouped.select(
        F.explode_outer(
            F.flatten(
                F.transform(
                    "ds",
                    lambda x, i: F.transform(
                        F.slice(F.col("ds"), i + F.lit(2), F.size("ds")),
                        lambda y: F.struct(
                            x[id_col].alias("id_a"),
                            y[id_col].alias("id_b"),
                            qround(
                                dot_q(x["_qv"], y["_qv"])
                                / (x["_nrm"] * y["_nrm"]),
                                4,
                            ).alias("cos_sim"),
                        ),
                    ),
                )
            )
        ).alias("p")
    )
    return pairs.filter(F.col("p.cos_sim") >= min_cos).select(
        F.col("p.id_a").alias("id_a"),
        F.col("p.id_b").alias("id_b"),
        F.col("p.cos_sim").alias("cos_sim"),
    )


def semantic_dedup(
    emb: DataFrame,
    seeds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cos: float = 0.8,
    max_cluster: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): partition the corpus into clusters around seed
    centroids, then drop every vector that has a LOWER-ID cluster-mate
    with cosine >= ``min_cos``. Returns survivors (``id_col``,
    ``cluster_id``) — the canonical "remove semantically redundant
    training documents" operator, completing the dedup family's scale
    ladder (exact / MinHash / SimHash / Jaccard / LSH-cosine /
    centroid-cluster cosine).

    ``seeds`` is (seed_id, seed_qv) with PRE-QUANTIZED vectors (see
    :func:`_qint`) and must be bounded by construction — the caller picks
    k (fixed count or a fixed-rate sample), which is what bounds the
    broadcast below; at 100 TB k is a parameter (e.g. 65k centroids ·
    64 dims · 8 B ≈ 33 MB), never O(corpus). Assignment reproduces
    q83's shape: staged quantization, exact int64 squared-L2 scores, a
    sort-free ``min_by`` hash-aggregate argmin with (distance, seed_id)
    tiebreak. A corpus row whose id IS a seed id clusters to itself
    without scoring (distance 0 is the unique minimum, so this is an
    identity, not a special case — it just skips k wasted scores).

    Shape at scale: one bounded broadcast (seeds), one shuffle on
    ``id_col`` (the argmin aggregate), one shuffle on ``cluster_id``
    (the pair generation of :func:`pairs_within_buckets`), one
    distinct + left_anti on the dropped-id set — deliberately NOT
    hint-broadcast (the dropped set is O(corpus) in a redundant corpus;
    AQE still broadcasts it when it is actually small). ``max_cluster``
    caps degenerate clusters exactly like ``max_bucket`` in
    :func:`lsh_bucket_ann`; mirror it in any oracle.
    """
    staged = emb.select(F.col(id_col), _qint(F.col(vec_col)).alias("_qv"))
    seed_ids = seeds.select(F.col("seed_id").alias(id_col))
    corpus = staged.join(F.broadcast(seed_ids), id_col, "left_anti")
    assign = (
        corpus.crossJoin(F.broadcast(seeds))
        .select(
            id_col,
            "seed_id",
            sq_l2_q(F.col("_qv"), F.col("seed_qv")).alias("_d"),
        )
        .groupBy(id_col)
        .agg(
            F.min_by(
                F.col("seed_id"), F.struct(F.col("_d"), F.col("seed_id"))
            ).alias("cluster_id")
        )
    )
    # The assignment subtree feeds THREE consumers (pair generation, the
    # dropped-id derivation, and the survivor anti-join) and Catalyst
    # plans each as an independent copy — 3 BroadcastNestedLoopJoins and
    # ~3× the argmin work, with no ReusedExchange (the consumers sit in
    # different subtree shapes). localCheckpoint materializes the slim
    # (id, _qv, cluster_id) table ONCE and truncates the lineage, the
    # same treatment q57's connected-components gives its per-round
    # labels (operators/curation.py). Measured at sf0.1: 11.1 s → 3.4 s.
    members = (
        corpus.join(assign, id_col)
        .unionByName(
            staged.join(F.broadcast(seed_ids), id_col).withColumn(
                "cluster_id", F.col(id_col)
            )
        )
        .localCheckpoint(eager=False)
    )
    bucketed = members.select(
        F.struct(
            F.col(id_col), F.col("_qv"), norm_q(F.col("_qv")).alias("_nrm")
        ).alias("d"),
        F.col("cluster_id").alias("bucket"),
    )
    pairs = pairs_within_buckets(
        bucketed, id_col=id_col, min_cos=min_cos, max_bucket=max_cluster
    )
    dropped = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return members.select(id_col, "cluster_id").join(dropped, id_col, "left_anti")
