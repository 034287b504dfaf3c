"""operators/sketches.py unit tests: python-twin reproduction of the
md5-derived cells/registers, the CMS one-sided-error invariant under
forced collisions, and the shard-mergeability contracts (counters add,
registers max) that make both sketches manifest-compatible.

All inputs here are synthetic in-memory key sets (larger than the
sf0.001 vocab, so CMS actually collides at width 512)."""

import hashlib
import math

from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.operators.sketches import (
    CS_DEPTH,
    CS_WIDTH,
    cs_build,
    CM_DEPTH,
    CM_WIDTH,
    HLL_AM2,
    HLL_M,
    cm_build,
    cm_estimate,
    hll_bucket_rho,
    hll_registers,
)


def _keys_df(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"), F.lit(1).alias("c")
    )


def _py_cell(key: str, d: int) -> int:
    return int(hashlib.md5(f"cm{d}:{key}".encode()).hexdigest()[:8], 16) % CM_WIDTH


def test_cm_grid_matches_python_twin(spark):
    grid = {
        (r.d, r.col): r.cnt
        for r in cm_build(_keys_df(spark, 300), "k", "c").collect()
    }
    expected: dict = {}
    for i in range(300):
        for d in range(CM_DEPTH):
            cell = (d, _py_cell(f"k{i}", d))
            expected[cell] = expected.get(cell, 0) + 1
    assert grid == expected


def test_cm_never_underestimates_under_collisions(spark):
    # 5000 distinct keys into 512 columns: every column collides ~10x
    keys = _keys_df(spark, 5000)
    counters = cm_build(keys, "k", "c")
    sample = keys.limit(200)
    est = cm_estimate(sample, counters, "k").collect()
    assert len(est) == 200
    assert all(r.cms_estimate >= 1 for r in est)
    # collisions actually happened (the invariant is non-vacuous)
    assert any(r.cms_estimate > 1 for r in est)


def test_cm_estimate_sees_zero_cells_for_unseen_keys(spark):
    """The point-query contract for keys NOT in the build set: an unseen
    key must still produce a row, and its estimate must be the min over
    ALL depth cells including untouched (zero) ones — never the min over
    only the cells it happens to share with built keys."""
    built = _keys_df(spark, 20)  # sparse grid: most (d, col) cells empty
    counters = cm_build(built, "k", "c")
    unseen = _keys_df(spark, 50, start=10_000).select("k")
    est = cm_estimate(unseen, counters, "k").collect()
    assert len(est) == 50  # nobody vanished
    # with 20 keys in 4x512 cells, an unseen key colliding on ALL 4
    # rows is (~20/512)^4 — none of these 50 should, so all must be 0
    assert all(r.cms_estimate == 0 for r in est)


def test_cm_shards_merge_to_whole(spark):
    whole = cm_build(_keys_df(spark, 2000), "k", "c")
    a = cm_build(_keys_df(spark, 1000), "k", "c")
    b = cm_build(_keys_df(spark, 1000, start=1000), "k", "c")
    merged = (
        a.unionByName(b).groupBy("d", "col").agg(F.sum("cnt").alias("cnt"))
    )
    w = {(r.d, r.col): r.cnt for r in whole.collect()}
    m = {(r.d, r.col): r.cnt for r in merged.collect()}
    assert w == m


def _py_bucket_rho(key: str) -> tuple[int, int]:
    hx = hashlib.md5(f"hll:{key}".encode()).hexdigest()
    bucket = int(hx[:2], 16)
    v = int(hx[2:10], 16)
    rho = 33 if v == 0 else 32 - v.bit_length() + 1
    return bucket, rho


def test_hll_bucket_rho_matches_python_twin(spark):
    df = _keys_df(spark, 500)
    bucket, rho = hll_bucket_rho(F.col("k"))
    rows = df.select("k", bucket.alias("b"), rho.alias("r")).collect()
    for r in rows:
        eb, er = _py_bucket_rho(r.k)
        assert (r.b, r.r) == (eb, er), r.k


def test_hll_estimate_within_tolerance_and_duplicate_blind(spark):
    n = 5000
    keys = _keys_df(spark, n)
    # duplicate every key 3x: registers must not move (max absorbs)
    tripled = keys.unionByName(keys).unionByName(keys)
    regs1 = {(r.bucket): r.r for r in hll_registers(keys, "k").collect()}
    regs3 = {(r.bucket): r.r for r in hll_registers(tripled, "k").collect()}
    assert regs1 == regs3
    sum_pow = sum(2.0 ** -r for r in regs1.values())
    occupied = len(regs1)
    est = HLL_AM2 / (sum_pow + (HLL_M - occupied))
    if est <= 2.5 * HLL_M and occupied < HLL_M:
        est = HLL_M * math.log(HLL_M / (HLL_M - occupied))
    # standard error ~ 1.04/sqrt(256) = 6.5%; allow 3 sigma
    assert abs(est - n) / n < 0.2


def test_hll_stream_state_accumulates_across_microbatches(spark, tmp_path):
    """q124's contract at the seam the drain can hide: with
    maxFilesPerTrigger=1 the register aggregation sees the corpus over
    SEVERAL micro-batches, and the final complete-mode state must equal
    the batch-built registers over the union."""
    a, b = _keys_df(spark, 400), _keys_df(spark, 400, start=400)
    src = str(tmp_path / "src")
    a.coalesce(1).write.mode("overwrite").parquet(src)
    b.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(a.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        hll_registers(stream, "k")
        .writeStream.format("memory")
        .queryName("hll_mb")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {r.bucket: r.r for r in spark.table("hll_mb").collect()}
    assert streamed, "drain produced no registers"
    spark.catalog.dropTempView("hll_mb")
    batch = {
        r.bucket: r.r
        for r in hll_registers(a.unionByName(b), "k").collect()
    }
    assert streamed == batch


def test_cms_heavy_verify_has_no_false_negatives(spark):
    """q125: every TRUE heavy hitter must appear in the sketch shortlist
    (one-sided error), with is_true_heavy=1."""
    import pyarrow.parquet as pq

    from bbc_news_data_pipeline_spark.plans.sketch_plans import (
        _Q125_PHI,
        q125_cms_heavy_verify,
    )

    sf = "/root/testdata/sf0.001"
    out = q125_cms_heavy_verify(spark, sf).toPandas()
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    counts: dict = {}
    for t in docs.text:
        for w in t.lower().split(" "):
            counts[w] = counts.get(w, 0) + 1
    n = sum(counts.values())
    truly_heavy = {w for w, c in counts.items() if c * 100 >= n * int(_Q125_PHI * 100)}
    listed = set(out.w)
    assert truly_heavy <= listed
    flagged = set(out[out.is_true_heavy == 1].w)
    assert flagged == truly_heavy
    for r in out.itertuples():
        assert r.cms_estimate >= r.exact_count


def test_hll_source_overlap_union_tracks_exact(spark):
    """q126: every source pair present; union estimate within HLL
    tolerance of the exact distinct union."""
    import pyarrow.parquet as pq

    from bbc_news_data_pipeline_spark.plans.sketch_plans import (
        q126_hll_source_overlap,
    )

    sf = "/root/testdata/sf0.001"
    out = q126_hll_source_overlap(spark, sf).toPandas()
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    words: dict = {}
    for r in docs.itertuples():
        words.setdefault(r.source, set()).update(r.text.lower().split(" "))
    k = len(words)
    assert len(out) == k * (k - 1) // 2
    for r in out.itertuples():
        exact_union = len(words[r.src_a] | words[r.src_b])
        assert abs(r.est_union - exact_union) / exact_union < 0.25
        assert r.exact_inter == len(words[r.src_a] & words[r.src_b])


def test_hll_shards_merge_to_whole(spark):
    whole = {(r.bucket): r.r for r in hll_registers(_keys_df(spark, 2000), "k").collect()}
    a = hll_registers(_keys_df(spark, 1000), "k")
    b = hll_registers(_keys_df(spark, 1000, start=1000), "k")
    merged = {
        (r.bucket): r.r
        for r in a.unionByName(b).groupBy("bucket").agg(F.max("r").alias("r")).collect()
    }
    assert whole == merged


def test_kmv_manifest_matches_python_twin(spark):
    """q132 full twin at sf0.001: rebuild every per-source bottom-k manifest
    and the merged corpus row with hashlib md5 + exact python ints; the
    sketch (kth hash, manifest size) and the truth column must reproduce
    bit-for-bit, and the exact-path/estimator-path split must match."""
    import pyarrow.parquet as pq

    from bbc_news_data_pipeline_spark.plans.sketch_plans import (
        _Q132_K,
        _Q132_NUMER,
        q132_kmv_distinct,
    )

    sf = "/root/testdata/sf0.001"
    out = {r.source: r for r in q132_kmv_distinct(spark, sf).collect()}
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    per_src: dict = {}
    for r in docs.itertuples():
        ws = r.text.split(" ")
        per_src.setdefault(r.source, set()).update(
            f"{ws[i]} {ws[i + 1]}" for i in range(len(ws) - 1)
        )

    def hv(b):
        return int(hashlib.md5(f"kmv:{b}".encode()).hexdigest()[:15], 16)

    g_hashes: set = set()
    for src, bigrams in per_src.items():
        hs = sorted(hv(b) for b in bigrams)
        man = hs[: _Q132_K]
        g_hashes.update(man)
        row = out[src]
        assert row.n_true == len(bigrams)
        assert row.kth_hash == man[-1]
        if len(man) >= _Q132_K:
            assert abs(row.est_distinct - round(_Q132_NUMER / man[-1], 2)) < 1e-9
        else:
            assert row.est_distinct == float(len(man))
    # merged corpus row: bottom-k over the UNION of manifests
    g_man = sorted(g_hashes)[: _Q132_K]
    g_true = len(set().union(*per_src.values()))
    assert out["ALL"].n_true == g_true
    assert out["ALL"].kth_hash == g_man[-1]


def test_kmv_exact_path_below_k(spark, tmp_path):
    """A corpus with fewer distinct bigrams than k stores ALL of them:
    the sketch degrades to an exact distinct count (est == truth, 0 err)."""
    from bbc_news_data_pipeline_spark.plans.sketch_plans import q132_kmv_distinct

    df = spark.createDataFrame(
        [(0, "a b c a b", "en", "srcA", 9), (1, "c d e", "en", "srcB", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(f"{tmp_path}/documents.parquet")
    out = {r.source: r for r in q132_kmv_distinct(spark, str(tmp_path)).collect()}
    # srcA: {a b, b c, c a, a b} -> 3 distinct; srcB: {c d, d e} -> 2
    assert out["srcA"].n_true == 3 and out["srcA"].est_distinct == 3.0
    assert out["srcB"].n_true == 2 and out["srcB"].est_distinct == 2.0
    assert out["ALL"].n_true == 5 and out["ALL"].est_distinct == 5.0
    assert out["ALL"].err_pct == 0.0


def test_kmv_estimates_within_tolerance(spark):
    """At sf0.001 every source has >600 distinct bigrams (estimator path
    engages everywhere); KMV with k=64 has sigma ~= 1/sqrt(k-2) ~= 12.7%,
    so 4-sigma = 51% bounds all 21 rows without flakiness."""
    from bbc_news_data_pipeline_spark.plans.sketch_plans import q132_kmv_distinct

    rows = q132_kmv_distinct(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 21
    for r in rows:
        assert abs(r.err_pct) < 51.0, (r.source, r.err_pct)


def test_kmv_overlap_matches_python_twin(spark):
    """q133 twin at sf0.001: rebuild each pair's union sketch from the
    FULL distinct sets with hashlib (the oracle's direct path) and check
    the sketch columns bit-for-bit — proving merge-of-manifests ≡ direct
    — plus the exact intersection/Jaccard columns."""
    import pyarrow.parquet as pq

    from bbc_news_data_pipeline_spark.plans.sketch_plans import (
        _Q132_K,
        _Q132_NUMER,
        q133_kmv_overlap,
    )

    sf = "/root/testdata/sf0.001"
    out = {(r.src_a, r.src_b): r for r in q133_kmv_overlap(spark, sf).collect()}
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    per_src: dict = {}
    for r in docs.itertuples():
        ws = r.text.split(" ")
        per_src.setdefault(r.source, set()).update(
            f"{ws[i]} {ws[i + 1]}" for i in range(len(ws) - 1)
        )

    def hv(b):
        return int(hashlib.md5(f"kmv:{b}".encode()).hexdigest()[:15], 16)

    def r_up(x, n):
        # engines round HALF_UP; python round() is banker's (42/64 =
        # 0.65625 ties at 4dp) — emulate the engine rule
        return math.floor(x * 10**n + 0.5) / 10**n

    srcs = sorted(per_src)
    assert len(out) == len(srcs) * (len(srcs) - 1) // 2
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            ha = {hv(x) for x in per_src[a]}
            hb = {hv(x) for x in per_src[b]}
            union = sorted(ha | hb)[: _Q132_K]
            n_man = len(union)
            n_both = sum(1 for h in union if h in ha and h in hb)
            est_u = _Q132_NUMER / union[-1] if n_man >= _Q132_K else float(n_man)
            row = out[(a, b)]
            assert abs(row.est_union - r_up(est_u, 2)) < 1e-9
            assert abs(row.est_jaccard - r_up(n_both / n_man, 4)) < 1e-9
            inter = len(per_src[a] & per_src[b])
            assert row.exact_inter == inter
            exact_j = inter / (len(per_src[a]) + len(per_src[b]) - inter)
            assert abs(row.exact_jaccard - r_up(exact_j, 4)) < 1e-9
            # the estimator tracks truth: 4-sigma band for k=64
            assert abs(row.est_jaccard - exact_j) < 0.51


def _py_cs_cell(key: str, d: int) -> int:
    return int(hashlib.md5(f"cs{d}:{key}".encode()).hexdigest()[:8], 16) % CS_WIDTH


def _py_cs_sign(key: str, d: int) -> int:
    return 1 - 2 * (int(hashlib.md5(f"sg{d}:{key}".encode()).hexdigest()[8], 16) % 2)


def test_cs_grid_matches_python_twin(spark):
    grid = {
        (r.d, r.col): r.cnt
        for r in cs_build(_keys_df(spark, 300), "k", "c").collect()
    }
    expected: dict = {}
    for i in range(300):
        for d in range(CS_DEPTH):
            cell = (d, _py_cs_cell(f"k{i}", d))
            expected[cell] = expected.get(cell, 0) + _py_cs_sign(f"k{i}", d)
    expected = {c: v for c, v in expected.items() if v != 0 or c in grid}
    # cells whose signs fully cancel may legitimately hold 0
    for cell, v in grid.items():
        assert expected.get(cell, 0) == v
    # signs actually vary (the grid is not CMS in disguise)
    assert any(v < 0 for v in grid.values())


def test_cs_shards_merge_to_whole(spark):
    whole = {
        (r.d, r.col): r.cnt for r in cs_build(_keys_df(spark, 2000), "k", "c").collect()
    }
    a = cs_build(_keys_df(spark, 1000), "k", "c")
    b = cs_build(_keys_df(spark, 1000, start=1000), "k", "c")
    merged = {
        (r.d, r.col): r.cnt
        for r in a.unionByName(b)
        .groupBy("d", "col")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    merged = {c: v for c, v in merged.items() if v != 0}
    whole = {c: v for c, v in whole.items() if v != 0}
    assert whole == merged


def test_cs_f2_median_tracks_exact(spark):
    """q134 at sf0.001: per-depth relative stddev is ~sqrt(2/512) = 6.3%,
    so a 30% band on the median row is 4-sigma-safe; the exact column
    must equal the python-computed sum of squared counts."""
    import pyarrow.parquet as pq

    from bbc_news_data_pipeline_spark.plans.sketch_plans import q134_countsketch_f2

    sf = "/root/testdata/sf0.001"
    out = {r.depth: r for r in q134_countsketch_f2(spark, sf).collect()}
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    freq: dict = {}
    for t in docs.text:
        for w in t.lower().split(" "):
            freq[w] = freq.get(w, 0) + 1
    f2 = sum(c * c for c in freq.values())
    assert all(r.f2_exact == f2 for r in out.values())
    assert len(out) == CS_DEPTH + 1
    med = out[-1]
    assert abs(med.err_pct) < 30.0, med.err_pct
    # the median row really is the median of the depth rows
    depth_ests = sorted(out[d].f2_est for d in range(CS_DEPTH))
    assert med.f2_est == depth_ests[CS_DEPTH // 2]


def test_kmv_stream_state_accumulates_across_microbatches(spark, tmp_path):
    """q135's contract at the seam the single-batch drain can hide: with
    maxFilesPerTrigger=1 the state stage sees the corpus over several
    micro-batches — with deliberately OVERLAPPING bigrams across batches
    (cross-batch set-union dedup must hold) — and the min(kth)/max(n_man)
    reduction of the append emissions must equal the batch-built
    manifests over the union."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from bbc_news_data_pipeline_spark.plans.sketch_plans import (
        _KMV_OUT_SCHEMA,
        _KMV_STATE_SCHEMA,
        _kmv_bigrams,
        _kmv_manifests,
        _kmv_state_group,
    )

    rows_a = [(0, "a b c d e f g", "en", "s0", 13), (1, "q r s t u v", "en", "s1", 11)]
    rows_b = [(2, "c d e x y z", "en", "s0", 11), (3, "q r s w", "en", "s1", 7)]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    src = str(tmp_path / "src")
    spark.createDataFrame(rows_a, schema).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(rows_b, schema).coalesce(1).write.mode("append").parquet(src)
    batch_all = spark.createDataFrame(rows_a + rows_b, schema)

    stream = (
        spark.readStream.schema(batch_all.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        _kmv_bigrams(stream)
        .select("source", "hv")
        .groupBy("source")
        .applyInPandasWithState(
            _kmv_state_group,
            outputStructType=_KMV_OUT_SCHEMA,
            stateStructType=_KMV_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .writeStream.format("memory")
        .queryName("kmv_mb")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table("kmv_mb").toPandas()
    spark.catalog.dropTempView("kmv_mb")
    # several emissions per source prove multi-batch state updates ran
    assert len(drained) > drained.source.nunique()
    # final state = kth AT the maximal n_man (kth grows while the
    # manifest fills; it only decreases once full) — q135's reduction
    final = {}
    for s, g in drained.groupby("source"):
        at_max = g[g.n_man == g.n_man.max()]
        final[s] = (at_max.kth.min(), int(g.n_man.max()))
    man = (
        _kmv_manifests(_kmv_bigrams(batch_all).distinct())
        .groupBy("source")
        .agg(F.max("hv").alias("kth"), F.count("*").alias("n_man"))
        .collect()
    )
    expected = {r.source: (r.kth, r.n_man) for r in man}
    assert final == expected


def test_grid_digest_shard_merge(spark):
    """digest(A ∪ B) ≡ merge(digest(A), digest(B)) — the mergeability
    contract q138 rests on — and interpolated quantiles off the merged
    digest sit within one bucket width of the exact rank-r value."""
    from bbc_news_data_pipeline_spark.operators.sketches import (
        GRID_W,
        grid_digest,
        merge_grid_digests,
    )

    df = spark.range(0, 2000).select(
        "id", ((F.col("id") * 7919) % 997).alias("v")
    )
    whole = grid_digest(df, "v", GRID_W)
    a = grid_digest(df.filter(F.col("id") % 2 == 0), "v", GRID_W)
    b = grid_digest(df.filter(F.col("id") % 2 == 1), "v", GRID_W)
    merged = merge_grid_digests(a, b)
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))

    # interpolation error bound: est within GRID_W of the exact rank value
    rows = sorted((r.bucket, r.cnt) for r in merged.collect())
    vals = sorted(r.v for r in df.collect())
    n = len(vals)
    for pct in (50, 90, 99):
        r_target = -(-n * pct // 100)  # ceil
        cum = 0
        for bucket, cnt in rows:
            if cum + cnt >= r_target:
                est = GRID_W * (bucket + (r_target - cum) / cnt)
                break
            cum += cnt
        exact = vals[r_target - 1]
        assert abs(est - exact) <= GRID_W


def test_grid_digest_grouped_partials(spark):
    """Per-shard partials with group_cols merge to the global digest —
    the exact plan shape q138 runs."""
    from bbc_news_data_pipeline_spark.operators.sketches import (
        grid_digest,
        merge_grid_digests,
    )

    df = spark.range(0, 500).select(
        (F.col("id") % 4).alias("shard"), ((F.col("id") * 31) % 211).alias("v")
    )
    partials = grid_digest(df, "v", 8, group_cols=["shard"])
    merged = merge_grid_digests(partials.drop("shard"))
    whole = grid_digest(df, "v", 8)
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_merge_grid_digests_group_cols_and_shape_guard(spark):
    """Per-GROUP digests merge by declaring the same group_cols; an input
    carrying an UNDECLARED group column raises instead of silently
    summing distinct digests into one wrong histogram."""
    import pytest

    from bbc_news_data_pipeline_spark.operators.sketches import (
        grid_digest,
        merge_grid_digests,
    )

    df = spark.range(0, 400).select(
        (F.col("id") % 2).alias("g"), ((F.col("id") * 17) % 97).alias("v")
    )
    a = grid_digest(df.filter(F.col("id") < 200), "v", 8, group_cols=["g"])
    b = grid_digest(df.filter(F.col("id") >= 200), "v", 8, group_cols=["g"])
    merged = merge_grid_digests(a, b, group_cols=["g"])
    whole = grid_digest(df, "v", 8, group_cols=["g"])
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))

    with pytest.raises(ValueError, match="group_cols"):
        merge_grid_digests(a, b)  # undeclared group column 'g'


def test_stream_grid_digest_multibatch_equals_batch(spark, sf_dir, tmp_path):
    """q140's contract under FORCED multi-micro-batch arrival
    (maxFilesPerTrigger=1 — the q135 lesson: a single-batch drain hides
    state-reduction bugs): the complete-mode streaming digest state
    after draining N batches must equal the batch digest of the same
    rows."""
    from bbc_news_data_pipeline_spark.operators.sketches import grid_digest
    from bbc_news_data_pipeline_spark.sources.tables import load

    nt = (
        load(spark, sf_dir, "documents")
        .select(F.size(F.split("text", " ")).cast("long").alias("nt"))
    )
    src = str(tmp_path / "src")
    nt.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(nt.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        grid_digest(stream, "nt", 16)
        .writeStream.format("memory")
        .queryName("gd_mb")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted((r.bucket, r.cnt) for r in spark.table("gd_mb").collect())
    spark.catalog.dropTempView("gd_mb")
    exp = sorted(
        (r.bucket, r.cnt)
        for r in grid_digest(spark.read.parquet(src), "nt", 16).collect()
    )
    assert got == exp


def test_kmv_difference_partitions_union(spark, sf_dir):
    """q141's difference estimators and q133's intersection estimator
    partition the union estimate: est_a_only + est_b_only + est_inter =
    est_union (exact identity before rounding — the three counts sum to
    n_man), and containment stays a valid fraction. The parity oracle
    separately proves merge-of-manifests ≡ direct full-set computation;
    this pins the in-engine algebra."""
    from bbc_news_data_pipeline_spark.plans.sketch_plans import (
        q133_kmv_overlap,
        q141_kmv_difference,
    )

    ov = {(r.src_a, r.src_b): r for r in q133_kmv_overlap(spark, sf_dir).collect()}
    for r in q141_kmv_difference(spark, sf_dir).collect():
        o = ov[(r.src_a, r.src_b)]
        assert abs(r.est_a_only + r.est_b_only + o.est_inter - o.est_union) <= 0.03
        assert r.est_cov_b_in_a is None or 0.0 <= r.est_cov_b_in_a <= 1.0
        assert 0.0 <= r.exact_cov_b_in_a <= 1.0
        assert r.exact_a_only >= 0 and r.exact_b_only >= 0


def test_priority_sample_stream_state_multibatch(spark, tmp_path):
    """q150's contract at the multi-batch seam: with maxFilesPerTrigger=1
    and OVERLAPPING doc_ids across batches (exact-replay dedup must
    hold), the max(n_man, tau, -b_doc) reduction of the append emissions
    must equal the top-(k+1) priority state built over the union — tau
    path exercised (>k rows in one source)."""
    import hashlib
    from decimal import ROUND_HALF_UP, Decimal

    from pyspark.sql.streaming.state import GroupStateTimeout

    from bbc_news_data_pipeline_spark.plans.sketch_plans import (
        _Q142_K,
        _Q142_U_DEN,
        _Q150_OUT_SCHEMA,
        _Q150_STATE_SCHEMA,
        _psmp_state_group,
    )

    def mk(i):
        return (i, "t", "en", "s0" if i % 29 else "s1", 100 + (i * 37) % 500)

    rows_a = [mk(i) for i in range(70)]
    rows_b = [mk(i) for i in range(60, 130)]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    src = str(tmp_path / "src")
    spark.createDataFrame(rows_a, schema).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(rows_b, schema).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(spark.createDataFrame(rows_a, schema).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("psmp:"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (hv.cast("double") + F.lit(0.5)) / F.lit(_Q142_U_DEN)
    q = (
        stream.select(
            "source",
            "doc_id",
            F.col("n_chars").cast("long").alias("w"),
            (F.col("n_chars").cast("double") / u).alias("pri"),
        )
        .groupBy("source")
        .applyInPandasWithState(
            _psmp_state_group,
            outputStructType=_Q150_OUT_SCHEMA,
            stateStructType=_Q150_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .writeStream.format("memory")
        .queryName("psmp_mb")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table("psmp_mb").toPandas()
    spark.catalog.dropTempView("psmp_mb")
    assert len(drained) > drained.source.nunique()

    final = {}
    for s, grp in drained.groupby("source"):
        best = max(grp.itertuples(), key=lambda r: (r.n_man, r.tau, -r.b_doc))
        final[s] = (int(best.n_man), int(best.est_fp))

    def twin(rows):
        def pri(d, w):
            h = int(hashlib.md5(f"psmp:{d}".encode()).hexdigest()[:8], 16)
            return w / ((h + 0.5) / 2**32)

        top = sorted(
            ((pri(d, w), d, w) for d, w in rows), key=lambda r: (-r[0], r[1])
        )[: _Q142_K + 1]
        if len(top) > _Q142_K:
            tau_fp = int(
                Decimal(top[_Q142_K][0] * 10000.0).quantize(
                    Decimal(1), rounding=ROUND_HALF_UP
                )
            )
        else:
            tau_fp = 0
        return (
            len(top),
            sum(max(w * 10000, tau_fp) for _, _, w in top[: _Q142_K]),
        )

    union = {r[0]: r for r in rows_a + rows_b}
    by_src: dict = {}
    for doc_id, _, _, source, n_chars in union.values():
        by_src.setdefault(source, []).append((doc_id, n_chars))
    expected = {s: twin(rows) for s, rows in by_src.items()}
    assert final == expected
    # tau path actually exercised: the big source exceeds k
    assert expected["s0"][0] == _Q142_K + 1


def _boot_w(b: int, key: str, cdf) -> int:
    u = (int(hashlib.md5(f"boot:{b}:{key}".encode()).hexdigest()[:8], 16) + 0.5) / 2**32
    return sum(1 for t in cdf if u >= t)


def test_poisson_bootstrap_weights_and_coverage():
    """Twin of q156's algebra: the md5 inverse-CDF weights follow
    Poisson(1) empirically (mean ~1, pmf within 2% absolute on 20k
    deterministic draws), and the 2.5/97.5 percentile interval over B=64
    deterministic resample means covers the true mean of a synthetic
    population — the `covered` column's contract."""
    from bbc_news_data_pipeline_spark.plans.sketch_plans import _q156_cdf

    cdf = _q156_cdf()
    draws = [_boot_w(b, str(i), cdf) for b in range(4) for i in range(5000)]
    n = len(draws)
    assert abs(sum(draws) / n - 1.0) < 0.02
    pmf = [math.exp(-1.0)]
    for k in range(1, 4):
        pmf.append(pmf[-1] / k)
    for k in range(4):
        assert abs(draws.count(k) / n - pmf[k]) < 0.02, k
    # coverage on a deterministic skewed population
    xs = [((i * 37) % 100) + 1 for i in range(400)]
    true_mean = sum(xs) / len(xs)
    means = []
    for b in range(64):
        ws = [_boot_w(b, str(i), cdf) for i in range(len(xs))]
        sw = sum(ws)
        means.append(sum(w * x for w, x in zip(ws, xs)) / sw)
    means.sort()
    # exact-interpolation percentiles, q61 definition (type-7)
    def pct(p):
        h = p * (len(means) - 1)
        lo = int(h)
        return means[lo] + (h - lo) * (means[min(lo + 1, len(means) - 1)] - means[lo])
    assert pct(0.025) <= true_mean <= pct(0.975)


def test_hyperball_tracks_exact_balls_and_is_monotone(spark, sf_dir):
    """q172 invariants: per-t node count is constant (every node keeps a
    register set), occupied/ball estimates are nondecreasing in t
    (register max-union only grows), and the HLL ball-size sum tracks
    the EXACT ball-size sum from a python BFS twin on the same
    deterministically-constructed graph (balls are tiny vs m=256, so
    linear counting should land within 5%)."""
    from collections import defaultdict

    from bbc_news_data_pipeline_spark.plans.sketch_plans import (
        _Q172_K,
        _Q172_SKIP_MOD,
        q172_neighborhood_function,
    )

    rows = q172_neighborhood_function(spark, sf_dir).collect()
    assert [r.t for r in rows] == list(range(_Q172_K + 1))
    n = rows[0].n_nodes
    assert all(r.n_nodes == n for r in rows)
    occ = [r.occupied_total for r in rows]
    est = [r.ball_est_sum for r in rows]
    assert occ == sorted(occ) and est == sorted(est)
    assert occ[0] == n  # t=0: exactly one register per node (itself)

    # python BFS twin over the same path+skip construction
    docs = sorted(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "source").collect(),
        key=lambda r: (r.source, r.doc_id),
    )
    adj = defaultdict(set)
    by_src = defaultdict(list)
    for r in docs:
        by_src[r.source].append(r.doc_id)
    for ids in by_src.values():
        for i, a in enumerate(ids):
            if i + 1 < len(ids):
                adj[a].add(ids[i + 1]); adj[ids[i + 1]].add(a)
            if i + 2 < len(ids):
                h = int(hashlib.md5(f"nfskip:{a}".encode()).hexdigest()[:8], 16)
                if h % _Q172_SKIP_MOD == 0:
                    adj[a].add(ids[i + 2]); adj[ids[i + 2]].add(a)
    exact = []
    for t in range(_Q172_K + 1):
        tot = 0
        for r in docs:
            ball = {r.doc_id}
            frontier = {r.doc_id}
            for _ in range(t):
                frontier = {w for u in frontier for w in adj[u]} - ball
                ball |= frontier
            tot += len(ball)
        exact.append(tot)
    for e, x in zip(est, exact):
        assert abs(e - x) / x < 0.05, (e, x)


def test_mg_stream_state_accumulates_across_microbatches(spark, tmp_path):
    """q174's contract at the seam the single-batch drain hides: with
    maxFilesPerTrigger=1 the MG state folds the corpus over TWO
    micro-batches, and the final state must equal a python twin that
    replays the same merge-reduce over the same batch boundaries
    (counts-sum then subtract the (K+1)-th largest, drop non-positives).
    Also pins the one-sided error contract: est <= true <= est + sum(lam)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    from bbc_news_data_pipeline_spark.plans.sketch_plans import (
        _Q174_K,
        _Q174_OUT_SCHEMA,
        _Q174_STATE_SCHEMA,
        _mg_state_group,
    )

    b1 = [("s", w) for w in "a a a b b c d e f g h i j k l m".split()]
    b2 = [("s", w) for w in "a b b b c c n o p q r s t u v w".split()]
    df1 = spark.createDataFrame(b1, "source string, w string")
    df2 = spark.createDataFrame(b2, "source string, w string")
    src = str(tmp_path / "src")
    df1.coalesce(1).write.mode("overwrite").parquet(src)
    df2.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(df1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.groupBy("source")
        .applyInPandasWithState(
            _mg_state_group,
            outputStructType=_Q174_OUT_SCHEMA,
            stateStructType=_Q174_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .writeStream.format("memory")
        .queryName("mg_mb")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    drained = spark.table("mg_mb").collect()
    spark.catalog.dropTempView("mg_mb")
    assert drained
    last_seen = max(r.n_seen for r in drained)
    final = {r.w: (r.est, r.lam_sum) for r in drained if r.n_seen == last_seen}

    # python twin over the SAME two batch boundaries (file order = write order)
    def reduce_batch(counts, state, lam_sum):
        for w, c in state.items():
            counts[w] = counts.get(w, 0) + c
        ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        lam = ranked[_Q174_K][1] if len(ranked) > _Q174_K else 0
        return {w: c - lam for w, c in ranked if c > lam}, lam_sum + lam

    c1 = {}
    for _, w in b1:
        c1[w] = c1.get(w, 0) + 1
    s1, ls1 = reduce_batch(c1, {}, 0)
    c2 = {}
    for _, w in b2:
        c2[w] = c2.get(w, 0) + 1
    s2, ls2 = reduce_batch(c2, s1, ls1)
    assert final == {w: (c, ls2) for w, c in s2.items()}
    assert last_seen == len(b1) + len(b2)

    # one-sided error vs the true counts over both batches
    true = {}
    for _, w in b1 + b2:
        true[w] = true.get(w, 0) + 1
    for w, (est, lam_sum) in final.items():
        assert est <= true[w] <= est + lam_sum


def test_trailing_distinct_window_algebra_and_accuracy(spark, sf_dir, tmp_path):
    """q178: (a) on an engineered event log the exact trailing-24h
    distinct counts and window sizes match a hand-computed twin, and the
    HLL estimate sits within linear-counting accuracy of tiny truths;
    (b) on real testdata every window estimate lands within 15% of its
    exact count (m=256 registers vs <= 1.5k users)."""
    from datetime import datetime

    from bbc_news_data_pipeline_spark.plans.sketch_plans import (
        _Q178_W_HOURS,
        q178_trailing_distinct,
    )

    def ts(d, h):
        return datetime(2024, 3, d, h, 30, 0)

    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, ts(1, 0), 10, "c", 1.0, "{}"),
        (2, ts(1, 0), 11, "c", 1.0, "{}"),
        (3, ts(1, 5), 10, "c", 1.0, "{}"),
        (4, ts(1, 5), 12, "c", 1.0, "{}"),
        (5, ts(2, 1), 13, "c", 1.0, "{}"),  # >24h after day-1 00:xx
        (6, ts(2, 1), 10, "c", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.window_end_hour: r for r in q178_trailing_distinct(spark, str(tmp_path)).collect()}
    # report hours = hours with events: d1h0, d1h5, d2h1
    assert set(out) == {ts(1, 0).replace(minute=0), ts(1, 5).replace(minute=0),
                       ts(2, 1).replace(minute=0)}
    h0, h5, h25 = (out[k] for k in sorted(out))
    assert (h0.exact_distinct, h0.n_hours) == (2, 1)   # {10,11}
    assert (h5.exact_distinct, h5.n_hours) == (3, 2)   # {10,11,12}
    # d2h1 window covers [d1h2 .. d2h1]: d1h5 {10,12} + d2h1 {13,10}
    assert (h25.exact_distinct, h25.n_hours) == (3, 2)  # {10,12,13}
    for r in out.values():
        assert abs(r.hll_estimate - r.exact_distinct) <= 1.0

    got = q178_trailing_distinct(spark, sf_dir).collect()
    assert got
    for r in got:
        assert 1 <= r.n_hours <= _Q178_W_HOURS
        assert abs(r.rel_err_pct) < 15.0


def test_weighted_quantile_digest_weighted_semantics(spark, tmp_path, sf_dir):
    """q181: on an engineered corpus where ONE long doc carries ~90% of
    the bytes, the byte-weighted median must sit at that doc's token
    count (far above the unweighted median), within one bucket width;
    real-testdata run stays within_width at every pct."""
    from bbc_news_data_pipeline_spark.plans.sketch_plans import (
        _Q181_W,
        q181_weighted_quantile_digest,
    )

    rows = [(i, "a b c d", "en", "s", 10) for i in range(50)]  # 4 tokens, w=10
    rows.append((99, " ".join(["t"] * 400), "en", "s", 4500))  # 400 tokens, 90% of bytes
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.pct: r for r in q181_weighted_quantile_digest(spark, str(tmp_path)).collect()}
    assert out[50].total_weight == 50 * 10 + 4500
    # weighted median = the long doc's 400 tokens (it owns ranks > 500)
    assert out[50].exact == 400
    assert abs(out[50].est - 400) < _Q181_W
    for r in out.values():
        assert r.within_width

    real = q181_weighted_quantile_digest(spark, sf_dir).collect()
    assert real and all(r.within_width for r in real)


def test_range_partitioner_order_balance_conservation(spark, sf_dir):
    """q188: shard ranges strictly ascending (order_ok everywhere), row
    counts conserve the corpus exactly, and digest-driven boundaries
    land every shard within 15% of the 1/S target on real testdata."""
    from bbc_news_data_pipeline_spark.plans.sketch_plans import (
        _Q188_SHARDS,
        q188_range_partitioner,
    )

    rows = q188_range_partitioner(spark, sf_dir).collect()
    assert [r.shard for r in rows] == list(range(_Q188_SHARDS))
    assert all(r.order_ok for r in rows)
    n_corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_rows for r in rows) == n_corpus
    for prev, cur in zip(rows, rows[1:]):
        assert prev.max_v < cur.min_v
    assert all(abs(r.balance_x - 1.0) < 0.15 for r in rows)


def test_trending_terms_zero_false_positives_and_proof_asymmetry(spark, sf_dir):
    """q190's contract: every reported term is CERTIFIED (true increase
    — zero false positives by the MG bound algebra), the engineered
    'spike' marker is reported, and the engineered 'blip' marker —
    genuinely trending but below the proof bar — is deliberately
    absent, as is every near-uniform base word."""
    from bbc_news_data_pipeline_spark.plans.sketch_plans import q190_trending_terms

    rows = q190_trending_terms(spark, sf_dir).collect()
    assert rows, "the engineered spike must be provable"
    assert all(r.certified for r in rows)
    assert all(r.true_after > r.true_before for r in rows)
    assert all(r.lower_after > r.upper_before for r in rows)
    words = {r.w for r in rows}
    assert "spike" in words
    assert "blip" not in words
    assert not words & {"join", "hash", "row", "the", "a"}


def test_cardinality_bakeoff_estimators_sane(spark, sf_dir):
    """q194: both estimators produce the same truth, stay within a sane
    band on the uniform-key testdata (|err| < 50%), and at least one of
    the two lands within 25% — the property that makes the bake-off
    table usable for planner calibration."""
    from bbc_news_data_pipeline_spark.plans.sketch_plans import (
        q194_cardinality_bakeoff,
    )

    rows = {r.estimator: r for r in q194_cardinality_bakeoff(spark, sf_dir).collect()}
    assert set(rows) == {"histogram", "kmv"}
    truths = {r.true_rows for r in rows.values()}
    assert len(truths) == 1 and truths.pop() > 0
    for r in rows.values():
        assert abs(r.rel_err_pct) < 50.0
    assert min(abs(r.rel_err_pct) for r in rows.values()) < 25.0


def test_retractable_digest_ivm_equivalence(spark, sf_dir):
    """q207: maintained (base ⊎ negated deletes, zero-compacted) must
    equal the rebuild on EVERY bucket (match=1 everywhere), reproduce a
    hashlib twin's bucket counts, and the p50/p90 readout must follow
    the exact ceil-rank rule on the maintained digest."""
    import hashlib
    from collections import Counter
    from math import floor

    from bbc_news_data_pipeline_spark.plans.sketch_plans import (
        _Q207_MOD,
        _Q207_W,
        q207_retractable_digest,
    )

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()

    def is_del(eid):
        return int(hashlib.md5(f"del:{eid}".encode()).hexdigest()[:8], 16) % _Q207_MOD == 0

    kept = Counter(
        int(floor(v / _Q207_W))
        for eid, v in zip(pdf.event_id, pdf.value)
        if not is_del(eid)
    )
    out = q207_retractable_digest(spark, sf_dir).collect()
    assert all(r.match == 1 for r in out)
    assert {r.bucket: r.cnt_maintained for r in out} == dict(kept)
    n = sum(kept.values())
    buckets = sorted(kept)
    for pct, col in ((50, "p50_bucket"), (90, "p90_bucket")):
        r_rank = -((-n * pct) // 100)
        cum = 0
        for b in buckets:
            cum += kept[b]
            if cum >= r_rank:
                assert all(getattr(row, col) == b for row in out)
                break


def test_stream_ks_drift_equals_batch(spark, sf_dir):
    """q209: the drained streaming cell state must reproduce q196's
    batch KS table EXACTLY (incremental ≡ batch as a cell identity)."""
    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        q196_ks_drift,
        q209_stream_ks_drift,
    )

    batch = sorted(map(tuple, q196_ks_drift(spark, sf_dir).collect()))
    stream = sorted(map(tuple, q209_stream_ks_drift(spark, sf_dir).collect()))
    assert stream == batch


def test_digest_accuracy_python_twin_and_bounds(spark, sf_dir):
    """q210 vs a Counter twin: every width's ceil-rank bucket must match,
    and the midpoint estimate must sit within one bucket width of the
    true percentile (W/2 midpoint slack + ≤1 rank-vs-interpolation
    position)."""
    from collections import Counter
    from math import floor

    from bbc_news_data_pipeline_spark.plans.sketch_plans import (
        _Q210_PCTS,
        _Q210_WIDTHS,
        q210_digest_accuracy,
    )

    vals = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas().value
    out = {(r.width, r.pct): r for r in q210_digest_accuracy(spark, sf_dir).collect()}
    assert set(out) == {(w, p) for w in _Q210_WIDTHS for p in _Q210_PCTS}
    n = len(vals)
    for w in _Q210_WIDTHS:
        dig = Counter(int(floor(v / w)) for v in vals)
        for p in _Q210_PCTS:
            rk = (n * p + 99) // 100
            cum = 0
            for b in sorted(dig):
                cum += dig[b]
                if cum >= rk:
                    break
            r = out[(w, p)]
            assert r.n == n
            assert r.est_value == round((b + 0.5) * w, 4)
            assert abs(r.signed_err) <= w + 1e-9


def test_trailing_heavy_hitters_bound_holds(spark, sf_dir):
    """q215: the merged MG one-sided bound must hold on EVERY emitted
    row (est ≤ true ≤ est + Σλ + λ'), ranks are 1..3 per report hour,
    and a python twin reproduces one mid-series report hour end-to-end
    (per-hour MG summaries → PODS'12 merge → top-3)."""
    from collections import Counter, defaultdict

    from bbc_news_data_pipeline_spark.plans.sketch_plans import (
        _Q215_K,
        _Q215_TOP,
        _Q215_WIN,
        q215_trailing_heavy_hitters,
    )

    out = q215_trailing_heavy_hitters(spark, sf_dir).collect()
    assert out and all(r.within_bound == 1 for r in out)
    byhour = defaultdict(list)
    for r in out:
        byhour[r.report_hour].append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1)) and len(v) <= _Q215_TOP
               for v in byhour.values())

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    pdf["h"] = pdf.ts.dt.floor("h")
    hours = sorted(pdf.h.unique())
    rh = hours[len(hours) // 2]
    window = [h for h in hours if 0 <= (rh - h).total_seconds() // 3600 < _Q215_WIN]
    summaries, lams = {}, {}
    for h in window:
        cnt = Counter(pdf[pdf.h == h].user_id)
        ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        lam = ranked[_Q215_K][1] if len(ranked) > _Q215_K else 0
        summaries[h] = {u: c - lam for u, c in ranked[:_Q215_K] if c - lam > 0}
        lams[h] = lam
    m = Counter()
    for s in summaries.values():
        m.update(s)
    ranked = sorted(m.items(), key=lambda kv: (-kv[1], kv[0]))
    lamp = ranked[_Q215_K][1] if len(ranked) > _Q215_K else 0
    est = {u: v - lamp for u, v in ranked if v - lamp > 0}
    top = sorted(est.items(), key=lambda kv: (-kv[1], kv[0]))[:_Q215_TOP]
    got = sorted(
        ((r.user_id, r.mg_estimate) for r in out if r.report_hour == rh),
        key=lambda kv: (-kv[1], kv[0]),
    )
    assert got == top
    bound = sum(lams.values()) + lamp
    assert all(r.err_bound == bound for r in out if r.report_hour == rh)


def test_voptimal_python_twin(spark, sf_dir):
    """q249 vs a classic O(B·D²) python DP over the identical cell
    rollup: same boundaries, same SSE, and the partition is optimal
    (no better B-split exists by exhaustive check)."""
    from itertools import combinations
    from math import floor

    from bbc_news_data_pipeline_spark.plans.sketch_plans import (
        _Q249_B,
        _Q249_CELL_W,
        q249_voptimal_histogram,
    )

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    cells = {}
    for v in pdf.value:
        c = floor(v / _Q249_CELL_W)
        x = floor(v * 100 + 0.5)
        n, sx, sxx = cells.get(c, (0, 0, 0))
        cells[c] = (n + 1, sx + x, sxx + x * x)
    order = sorted(cells)
    D = len(order)

    def sse(j, i):  # positions 1-based inclusive
        n = sum(cells[order[p]][0] for p in range(j - 1, i))
        sx = sum(cells[order[p]][1] for p in range(j - 1, i))
        sxx = sum(cells[order[p]][2] for p in range(j - 1, i))
        return sxx - sx * sx / n

    best = None
    for bnds in combinations(range(2, D + 1), _Q249_B - 1):
        cuts = [1] + list(bnds) + [D + 1]
        cost = sum(sse(cuts[k], cuts[k + 1] - 1) for k in range(_Q249_B))
        cand = (cost, bnds)
        if best is None or cand < best:
            best = cand
    rows = q249_voptimal_histogram(spark, sf_dir).collect()
    assert len(rows) == _Q249_B
    got_cuts = [1] + [None] * (_Q249_B - 1)
    lo_positions = []
    for r in rows:
        lo_positions.append(order.index(r.lo_cell) + 1)
        want_n = sum(
            cells[order[p]][0]
            for p in range(order.index(r.lo_cell), order.index(r.hi_cell) + 1)
        )
        assert r.n == want_n
        want_sse = sse(order.index(r.lo_cell) + 1, order.index(r.hi_cell) + 1)
        assert r.sse == floor(want_sse * 100 + 0.5) / 100
    assert tuple(lo_positions[1:]) == best[1]
    assert rows[0].total_sse == floor(best[0] * 100 + 0.5) / 100
