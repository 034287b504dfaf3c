"""Tests for the dataset-quality (q72–q78) and retrieval (q79–q81)
plan families: physical-plan scale properties (single scan, broadcast
joins, top-K without total sort, row-local chunking) plus behavioral
invariants the DuckDB oracle can't express (LOCF leading-null shape,
checksum recomputation against hashlib, probability normalization)."""

import hashlib

from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.plans.quality_plans import (
    q72_profile_documents,
    q74_snapshot_diff,
    q75_hourly_locf,
    q76_weighted_sample,
    q77_transition_matrix,
)
from bbc_news_data_pipeline_spark.plans.retrieval_plans import (
    _Q80_TERMS,
    _S,
    _W,
    q79_decontamination,
    q80_bm25_search,
    q81_chunk_documents,
)
from bbc_news_data_pipeline_spark.plans.timeseries_plans import (
    q78_rolling_anomalies,
)
from bbc_news_data_pipeline_spark.sources.tables import load


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- plan shapes


def test_q72_profile_is_single_scan(spark, sf_dir):
    plan = _physical(q72_profile_documents(spark, sf_dir))
    assert plan.count("FileScan") == 1  # every metric from ONE pass


def test_q79_benchmark_set_is_broadcast(spark, sf_dir):
    plan = _physical(q79_decontamination(spark, sf_dir))
    assert "BroadcastHashJoin" in plan  # corpus side never shuffles pre-agg
    assert "SortMergeJoin" not in plan


def test_q80_topk_no_total_sort(spark, sf_dir):
    plan = _physical(q80_bm25_search(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan  # df via window, consts broadcast


def test_q81_chunking_has_no_join_or_agg(spark, sf_dir):
    plan = _physical(q81_chunk_documents(spark, sf_dir))
    assert "Join" not in plan  # row-local explode: no join, no aggregation
    assert "HashAggregate" not in plan


# ------------------------------------------------------------------ behavior


def test_q74_classification_is_a_partition(spark, sf_dir):
    out = q74_snapshot_diff(spark, sf_dir).collect()
    n_classified = sum(r.n_customers for r in out)
    n_cust = load(spark, sf_dir, "orders").select("o_custkey").distinct().count()
    assert n_classified == n_cust  # every customer lands in exactly one class


def test_q75_locf_shape_and_leading_nulls(spark, sf_dir):
    out = q75_hourly_locf(spark, sf_dir).toPandas()
    n_users = out["user_id"].nunique()
    n_hours = out["hr"].nunique()
    assert len(out) == n_users * n_hours  # dense grid
    # per user: nulls only before the first fill, never after (LOCF)
    for _, g in out.sort_values(["user_id", "hr"]).groupby("user_id"):
        filled = g["v_filled"].notna().tolist()
        first = filled.index(True)
        assert all(filled[first:]), "gap after first observation not carried"


def test_q76_weighted_sample_is_deterministic(spark, sf_dir):
    a = q76_weighted_sample(spark, sf_dir).collect()
    b = q76_weighted_sample(spark, sf_dir).collect()
    assert a == b
    per_lang: dict[str, list[int]] = {}
    for r in a:
        per_lang.setdefault(r.lang, []).append(r.rank)
    for lang, ranks in per_lang.items():
        assert ranks == list(range(1, len(ranks) + 1)), lang


def test_q77_probabilities_normalize(spark, sf_dir):
    out = q77_transition_matrix(spark, sf_dir).toPandas()
    sums = out.groupby("from_type")["p"].sum()
    assert ((sums - 1.0).abs() < 0.01).all()  # rows of the matrix sum to 1


def test_q78_anomaly_flag_consistent_with_z(spark, sf_dir):
    out = q78_rolling_anomalies(spark, sf_dir).toPandas()
    has_z = out["z"].notna()
    assert (out.loc[has_z, "is_anomaly"] == (out.loc[has_z, "z"].abs() > 2)).all()
    # first day of each event_type has no trailing window → no z
    first_days = out.sort_values("day_ts").groupby("event_type").head(1)
    assert first_days["z"].isna().all()


def test_q79_fractions_bounded_and_benchmark_excluded(spark, sf_dir):
    out = q79_decontamination(spark, sf_dir).toPandas()
    if len(out):
        assert (out["contamination_frac"] <= 1.0).all()
        assert (out["contamination_frac"] > 0.0).all()
        assert (out["doc_id"] % 37 != 0).all()


def test_q80_top_doc_contains_a_query_term(spark, sf_dir):
    top = q80_bm25_search(spark, sf_dir).limit(1).collect()
    assert top, "no hits for query terms"
    doc = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == top[0].doc_id)
        .select("text")
        .first()
        .text
    )
    assert any(t in doc.lower().split() for t in _Q80_TERMS)


def test_q81_checksums_match_hashlib(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").orderBy("doc_id").limit(3).collect()
    chunks = (
        q81_chunk_documents(spark, sf_dir)
        .filter(F.col("doc_id").isin([d.doc_id for d in docs]))
        .collect()
    )
    by_doc = {d.doc_id: d.text.lower().split(" ") for d in docs}
    assert chunks
    for c in chunks:
        toks = by_doc[c.doc_id]
        expect = " ".join(toks[c.start : c.start + _W])
        assert c.checksum == hashlib.md5(expect.encode()).hexdigest()
        assert c.n_tok == min(_W, len(toks) - c.start)


def test_stream_decon_has_no_false_negatives_vs_exact(spark):
    """q128's Bloom gate may over-flag (FPs) but must NEVER miss a doc
    that q79's exact intersection reports as contaminated."""
    from bbc_news_data_pipeline_spark.plans.retrieval_plans import (
        q79_decontamination,
        q128_stream_decon,
    )

    sf = "/root/testdata/sf0.001"
    exact = {r.doc_id for r in q79_decontamination(spark, sf).collect()}
    flagged = {r.doc_id for r in q128_stream_decon(spark, sf).collect()}
    assert exact, "exact check found no contamination — test is vacuous"
    assert exact <= flagged


def test_cdc_chunks_match_python_twin(spark):
    """q129 boundaries and checksums recomputed in pure python."""
    import hashlib

    import pyarrow.parquet as pq

    from bbc_news_data_pipeline_spark.plans.retrieval_plans import (
        _CDC_D,
        _CDC_K,
        _CDC_M,
        q129_cdc_chunks,
    )

    sf = "/root/testdata/sf0.001"
    out = q129_cdc_chunks(spark, sf).toPandas()
    docs = pq.read_table(f"{sf}/documents.parquet").to_pandas()
    expected = []
    for r in docs.itertuples():
        toks = r.text.lower().split(" ")
        n = len(toks)
        if n < _CDC_K + 1:
            bs = [0, n]
        else:
            cuts = [
                p
                for p in range(_CDC_K, n)
                if int(
                    hashlib.md5(" ".join(toks[p - _CDC_K:p]).encode()).hexdigest()[:8],
                    16,
                ) % _CDC_D == 0
                or p % _CDC_M == 0
            ]
            bs = [0] + cuts + [n]
        for ci, (a, b) in enumerate(zip(bs, bs[1:])):
            expected.append(
                (r.doc_id, ci, a, b, b - a,
                 hashlib.md5(" ".join(toks[a:b]).encode()).hexdigest())
            )
    got = list(
        out.sort_values(["doc_id", "chunk_idx"]).itertuples(index=False, name=None)
    )
    assert got == expected


def test_cdc_chunks_realign_after_edit(spark):
    """The CDC property: inserting tokens near the start shifts only the
    chunks overlapping the edit; once boundaries re-sync, every later
    chunk checksum is identical (fixed-stride q81 would shift ALL)."""
    from bbc_news_data_pipeline_spark.plans.retrieval_plans import cdc_chunk_frame

    base = " ".join(f"tok{(i * 7) % 43}x{i % 11}" for i in range(120))
    toks = base.split(" ")
    edited = " ".join(toks[:5] + ["INSERTED", "NOISE"] + toks[5:])
    df = spark.createDataFrame(
        [(0, base), (1, edited)], "doc_id long, text string"
    )
    out = cdc_chunk_frame(df).toPandas()
    sums_base = list(out[out.doc_id == 0].sort_values("chunk_idx").chunk_md5)
    sums_edit = list(out[out.doc_id == 1].sort_values("chunk_idx").chunk_md5)
    # suffix re-alignment: a substantial common tail of chunk checksums
    tail = 0
    while (
        tail < min(len(sums_base), len(sums_edit))
        and sums_base[-1 - tail] == sums_edit[-1 - tail]
    ):
        tail += 1
    assert tail >= len(sums_base) // 2, (tail, len(sums_base))
    # and the head (pre-edit prefix region) differs somewhere
    assert sums_base != sums_edit


def test_q131_moments_match_exact_python_twin(spark, sf_dir):
    """q131 twin: recompute all four moments with arbitrary-precision
    python ints (the sums are < 2^53, so the engine's decimal->double
    conversion is exact and the rounded outputs must match EXACTLY)."""
    import math

    import pyarrow.parquet as pq

    from bbc_news_data_pipeline_spark.plans.quality_plans import q131_moments_merge

    out = {r.lang: r for r in q131_moments_merge(spark, sf_dir).collect()}
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    for lang, grp in docs.groupby("lang"):
        xs = [int(v) for v in grp.n_chars]
        n = float(len(xs))
        s1, s2 = float(sum(xs)), float(sum(x * x for x in xs))
        s3 = float(sum(x * x * x for x in xs))
        s4 = float(sum(x * x * x * x for x in xs))
        m1, r2, r3, r4 = s1 / n, s2 / n, s3 / n, s4 / n
        m2 = r2 - m1 * m1
        row = out[lang]
        assert row.n_docs == len(xs)
        assert row.mean_chars == round(m1, 4)
        assert row.std_chars == round(math.sqrt(m2), 4)
        skew = (r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1) / (m2 * math.sqrt(m2))
        kurt = (
            r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2 - 3.0 * m1 * m1 * m1 * m1
        ) / (m2 * m2) - 3.0
        assert abs(row.skewness - skew) < 1e-3
        assert abs(row.excess_kurtosis - kurt) < 1e-3


def test_q131_zero_variance_group_is_null_not_nan(spark, tmp_path):
    """A degenerate group (all lengths equal -> m2 == 0) must emit NULL
    shape moments on the engine side, mirroring the oracle's CASE guard —
    never NaN/Inf from a 0/0."""
    from bbc_news_data_pipeline_spark.plans.quality_plans import q131_moments_merge

    df = spark.createDataFrame(
        [(0, "x", "aa", "s0", 7), (1, "y", "aa", "s0", 7), (2, "z", "bb", "s0", 3),
         (3, "w", "bb", "s0", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.write.parquet(f"{tmp_path}/documents.parquet")
    out = {r.lang: r for r in q131_moments_merge(spark, str(tmp_path)).collect()}
    assert out["aa"].std_chars == 0.0
    assert out["aa"].skewness is None and out["aa"].excess_kurtosis is None
    assert out["bb"].skewness is not None


def test_phrase_search_counts_overlapping_occurrences(spark, tmp_path):
    """q175 position algebra on an engineered corpus: 'x x x x' contains
    the bigram 'x x' THREE times (overlapping positions count — the
    positional-index contract), phrase selection picks the top-3 corpus
    bigrams deterministically, and the index path must agree with the
    row-local truth path on every (phrase, source)."""
    from bbc_news_data_pipeline_spark.plans.retrieval_plans import q175_phrase_search

    rows = [
        (1, "x x x x", "en", "sA", 7),
        (2, "x x y z", "en", "sA", 7),
        (3, "p q p q p", "en", "sB", 9),
        (4, "y z y z", "en", "sB", 7),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {(r.phrase, r.source): r for r in q175_phrase_search(spark, str(tmp_path)).collect()}
    # corpus bigram counts: 'x x'=4, 'p q'=2, 'q p'=2, 'y z'=3, 'z y'=1
    # top-3 by (count desc, phrase asc): 'x x', 'y z', 'p q'
    assert {p for p, _ in out} == {"x x", "y z", "p q"}
    assert out[("x x", "sA")].n_occurrences == 4  # 3 overlapping + 1
    assert out[("x x", "sA")].n_docs == 2
    assert out[("y z", "sA")].n_occurrences == 1
    assert out[("y z", "sB")].n_occurrences == 2
    assert out[("p q", "sB")].n_occurrences == 2
    assert all(r.matches for r in out.values())
    assert all(
        r.n_occurrences == r.truth_occurrences and r.n_docs == r.truth_docs
        for r in out.values()
    )


def test_quantile_normalize_maps_sources_onto_pooled_distribution(spark, tmp_path):
    """q177 contract on an engineered two-source corpus with disjoint
    value ranges: quantile normalization maps BOTH sources' percentile
    points onto the same pooled quantile (within one digest bucket
    width), the map is monotone in pct, and shifts pull the low source
    up and the high source down."""
    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        _Q177_W,
        q177_quantile_normalize,
    )

    rows = [(i, "w", "en", "lo", i) for i in range(100)] + [
        (100 + i, "w", "en", "hi", 1000 + i) for i in range(100)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {(r.source, r.pct): r for r in q177_quantile_normalize(spark, str(tmp_path)).collect()}
    pooled = sorted([v for *_, v in rows])
    for pct in (25, 50, 75, 90, 99):
        lo, hi = out[("lo", pct)], out[("hi", pct)]
        # both sources normalize to the same pooled quantile point
        assert abs(lo.normalized_value - hi.normalized_value) < 1e-9
        # tracks the exact pooled quantile within one bucket width
        r = (200 * pct + 99) // 100
        assert abs(lo.normalized_value - pooled[r - 1]) <= _Q177_W
        # normalization can only pull the low source UP and the high
        # source DOWN (modulo one bucket width of interpolation slack)
        assert lo.shift >= -_Q177_W
        assert hi.shift <= _Q177_W
        # shift is exactly the normalized-vs-own-value gap
        assert abs(lo.shift - (lo.normalized_value - lo.source_value)) < 1e-9
    lo_vals = [out[("lo", p)].normalized_value for p in (25, 50, 75, 90, 99)]
    assert lo_vals == sorted(lo_vals)
    # the upper half of lo's points cross into the high source's range:
    # the whole point of cross-source calibration
    assert out[("lo", 75)].shift > 800 and out[("hi", 25)].shift < -800


def test_signtest_bh_python_twin(spark, sf_dir):
    """q201 vs math.comb: exact binomial tails, rank order, and the BH
    step-up rejection set must all reproduce."""
    from math import comb

    import pandas as pd

    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        _Q201_LAG,
        _Q201_QDEN,
        _Q201_QNUM,
        q201_signtest_bh,
    )

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "ts"
    ).toPandas()
    pdf["day"] = pdf.ts.dt.floor("D")
    daily = pdf.groupby(["event_type", "day"]).size().reset_index(name="n")
    stats = {}
    for et, g in daily.groupby("event_type"):
        g = g.sort_values("day").reset_index(drop=True)
        g["base"] = g.n.shift(_Q201_LAG)
        g = g.dropna(subset=["base"])
        g = g[g.n != g.base]
        if len(g):
            stats[et] = (len(g), int((g.n > g.base).sum()))
    tails = {
        et: sum(comb(n, i) for i in range(k, n + 1)) for et, (n, k) in stats.items()
    }
    m = len(stats)
    nmax = max(n for n, _ in stats.values())
    order = sorted(stats, key=lambda et: (tails[et] << (nmax - stats[et][0]), et))
    ranks = {et: j + 1 for j, et in enumerate(order)}
    flags = {
        et: tails[et] * m * _Q201_QDEN
        <= ranks[et] * _Q201_QNUM * (1 << nmax)
        for et in stats
    }
    jstar = max((ranks[et] for et in stats if flags[et]), default=0)

    out = {r.event_type: r for r in q201_signtest_bh(spark, sf_dir).collect()}
    assert set(out) == set(stats)
    for et, r in out.items():
        n, k = stats[et]
        assert (r.n_pairs, r.k_pos, r.p_num) == (n, k, tails[et])
        assert r.rank == ranks[et]
        assert r.reject == (1 if ranks[et] <= jstar else 0)
        import math
        assert r.p_value == math.floor(tails[et] / 2**n * 1e6 + 0.5) / 1e6


def test_skew_profiler_python_twin_and_engineered_hot_key(spark, sf_dir, tmp_path):
    """q202 vs a Counter twin on real data; then an engineered 90%-hot
    key must dominate top1_share and drive the salt factor to ~P."""
    from collections import Counter
    from datetime import datetime
    from math import floor

    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        _Q202_P,
        q202_skew_profiler,
    )

    users = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id"
    ).toPandas().user_id
    c = Counter(users)
    n_total, n_distinct = len(users), len(c)
    c_max = max(c.values())
    top_key = min(k for k, v in c.items() if v == c_max)
    hist = Counter(v.bit_length() - 1 for v in c.values())
    out = q202_skew_profiler(spark, sf_dir).collect()
    assert {r.bucket: r.n_keys for r in out} == dict(hist)
    for r in out:
        assert (r.n_total, r.n_distinct, r.c_max, r.top_key) == (
            n_total, n_distinct, c_max, top_key
        )
        assert r.top1_share == floor(c_max / n_total * 1e6 + 0.5) / 1e6
        assert r.salt_factor == -((-c_max * _Q202_P) // n_total)

    rows = [
        (i, datetime(2024, 1, 1 + i % 28), 7 if i < 90 else i, "view", 1.0, "{}")
        for i in range(100)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    hot = q202_skew_profiler(spark, str(tmp_path)).collect()
    r0 = hot[0]
    assert r0.top_key == 7 and r0.c_max == 90 and r0.top1_share == 0.9
    assert r0.salt_factor == -((-90 * _Q202_P) // 100)  # ceil(28.8) = 29


def test_conformal_intervals_python_twin(spark, sf_dir):
    """q204 vs a hashlib/python twin: same folds, exact scaled residuals,
    the ⌈(n+1)(1−α)⌉-th smallest as q̂, and the held-out coverage."""
    import hashlib
    from math import floor

    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        _Q204_ALPHA_DEN,
        _Q204_ALPHA_NUM,
        q204_conformal_intervals,
    )

    pdf = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()

    def fold(i):
        return int(hashlib.md5(f"conf:{i}".encode()).hexdigest()[:8], 16) % 3

    pdf["fold"] = pdf.doc_id.map(fold)
    pdf["x"] = pdf.text.str.split(" ").str.len()
    tr = pdf[pdf.fold == 0]
    sxx = int((tr.x.astype(object) * tr.x).sum())
    sxy = int((tr.x.astype(object) * tr.n_chars).sum())
    cal = pdf[pdf.fold == 1]
    scores = sorted(
        abs(int(y) * sxx - sxy * int(x)) for x, y in zip(cal.x, cal.n_chars)
    )
    n_cal = len(scores)
    keep = _Q204_ALPHA_DEN - _Q204_ALPHA_NUM
    k = (keep * (n_cal + 1) + _Q204_ALPHA_DEN - 1) // _Q204_ALPHA_DEN
    qhat = scores[k - 1]
    te = pdf[pdf.fold == 2]
    cov = sum(
        1
        for x, y in zip(te.x, te.n_chars)
        if abs(int(y) * sxx - sxy * int(x)) <= qhat
    )
    r = q204_conformal_intervals(spark, sf_dir).collect()[0]
    assert (r.n_train, r.n_cal, r.n_test) == (len(tr), n_cal, len(te))
    assert r.k_rank == k and r.n_covered == cov
    assert r.slope == floor(sxy / sxx * 1e6 + 0.5) / 1e6
    assert r.qhat_y == floor(qhat / sxx * 1e4 + 0.5) / 1e4
    assert r.coverage == floor(cov / len(te) * 1e6 + 0.5) / 1e6
    assert 0.0 <= r.coverage <= 1.0


def test_hll_venn3_exact_masks_and_sketch_consistency(spark, sf_dir):
    """q205: the exact region counts must match a python bitmask twin
    over the top-3 sources' vocabularies; all 7 regions are present; and
    the sketch estimate tracks the exact count on the largest region."""
    from collections import Counter, defaultdict

    from bbc_news_data_pipeline_spark.plans.sketch_plans import q205_hll_venn3

    pdf = spark.read.parquet(f"{sf_dir}/documents.parquet").toPandas()
    top3 = sorted(
        Counter(pdf.source).items(), key=lambda kv: (-kv[1], kv[0])
    )[:3]
    bits = {s: 1 << i for i, (s, _) in enumerate(top3)}
    masks = defaultdict(int)
    for src, txt in zip(pdf.source, pdf.text):
        if src in bits:
            for w in txt.lower().split(" "):
                masks[w] |= bits[src]
    exact = Counter(masks.values())
    out = {r.mask: r for r in q205_hll_venn3(spark, sf_dir).collect()}
    assert set(out) == set(range(1, 8))
    for m, r in out.items():
        assert r.exact_words == exact.get(m, 0)
    big = max(out.values(), key=lambda r: r.exact_words)
    assert abs(big.est_words - big.exact_words) / big.exact_words < 0.3


def test_welch_ttest_python_twin(spark, sf_dir):
    """q213 vs a python twin: md5 arms, quantized exact moments, Welch t
    and Satterthwaite dof at the query's 4dp."""
    import hashlib
    from math import floor, sqrt

    from bbc_news_data_pipeline_spark.plans.quality_plans import q213_welch_ttest

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()

    def arm(u):
        return int(hashlib.md5(f"welch:{u}".encode()).hexdigest()[:8], 16) % 2

    qs = {0: [], 1: []}
    for u, v in zip(pdf.user_id, pdf.value):
        qs[arm(u)].append(int(floor(v * 1_000_000 + 0.5)))
    st = {}
    for a, vals in qs.items():
        n = len(vals)
        s, ss = sum(vals), sum(x * x for x in vals)
        m = float(s) / n / 1e6
        var = (n * float(ss) - float(s) * float(s)) / (n * (n - 1.0)) / 1e12
        st[a] = (n, m, var)
    (na, ma, va), (nb, mb, vb) = st[0], st[1]
    se2 = va / na + vb / nb
    t = (ma - mb) / sqrt(se2)
    dof = se2 * se2 / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    r = q213_welch_ttest(spark, sf_dir).collect()[0]
    r4 = lambda x: floor(x * 1e4 + 0.5) / 1e4
    assert (r.n_a, r.n_b) == (na, nb)
    assert (r.mean_a, r.mean_b) == (r4(ma), r4(mb))
    assert abs(r.var_a - r4(va)) <= 1e-4 and abs(r.var_b - r4(vb)) <= 1e-4
    assert abs(r.t_stat - r4(t)) <= 1e-4 and abs(r.dof - r4(dof)) <= 1.0
    assert r.significant_95 == (1 if abs(t) > 1.96 else 0)


def test_ldiversity_python_twin(spark, sf_dir):
    """q227 vs a Counter twin: class sizes, distinct sensitive values,
    top-value share, and the table-level summary."""
    from collections import Counter, defaultdict
    from math import floor

    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        _Q227_L,
        q227_ldiversity_audit,
    )

    pdf = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    cells = Counter(
        (n, s, int(floor(b / 1000)))
        for n, s, b in zip(pdf.c_nationkey, pdf.c_mktsegment, pdf.c_acctbal)
    )
    classes = defaultdict(Counter)
    for (n, s, v), c in cells.items():
        classes[(n, s)][v] = c
    out = {(r.nat, r.seg): r for r in q227_ldiversity_audit(spark, sf_dir).collect()}
    assert set(out) == set(classes)
    below = sum(1 for c in classes.values() if len(c) < _Q227_L)
    mind = min(len(c) for c in classes.values())
    for k, c in classes.items():
        r = out[k]
        assert r.class_size == sum(c.values())
        assert r.n_sensitive == len(c)
        assert r.ldiv_ok == (1 if len(c) >= _Q227_L else 0)
        assert r.top_value_share == floor(
            max(c.values()) / sum(c.values()) * 1e6 + 0.5
        ) / 1e6
        assert (r.n_classes_below_l, r.min_diversity) == (below, mind)


def test_retention_odds_python_twin(spark, sf_dir):
    """q232 vs a set-algebra twin: cohort, week-4 retention, per-type
    2x2 cells, Haldane-corrected odds ratios."""
    from collections import defaultdict
    from math import floor

    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        _Q232_W1_DAYS,
        _Q232_W4_HI,
        _Q232_W4_LO,
        q232_retention_odds,
    )

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    d0 = pdf.ts.dt.floor("D").min()
    pdf["age"] = (pdf.ts.dt.floor("D") - d0).dt.days
    w1 = pdf[pdf.age < _Q232_W1_DAYS]
    cohort = set(w1.user_id)
    ret = set(pdf[(pdf.age >= _Q232_W4_LO) & (pdf.age < _Q232_W4_HI)].user_id)
    did = defaultdict(set)
    for u, t in zip(w1.user_id, w1.event_type):
        did[t].add(u)
    out = {r.event_type: r for r in q232_retention_odds(spark, sf_dir).collect()}
    assert set(out) == set(pdf.event_type.unique())
    for t, r in out.items():
        a = sum(1 for u in cohort if u in did[t] and u in ret)
        b = sum(1 for u in cohort if u in did[t] and u not in ret)
        c = sum(1 for u in cohort if u not in did[t] and u in ret)
        d = sum(1 for u in cohort if u not in did[t] and u not in ret)
        assert (r.n_did, r.n_not) == (a + b, c + d)
        orr = (2 * a + 1) * (2 * d + 1) / ((2 * b + 1) * (2 * c + 1))
        assert r.odds_ratio == floor(orr * 1e4 + 0.5) / 1e4
        assert r.positive_signal == (1 if orr > 1 else 0)


def test_mannwhitney_auc_python_twin(spark, sf_dir):
    """q233 vs a rank-based twin: average-rank U statistic, tie-corrected
    variance, AUC = U / (n1*n2) — the classic formulation, against the
    engine's prefix-sum formulation."""
    from math import floor, sqrt

    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        q233_mannwhitney_auc,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["cents"] = (df.o_totalprice * 100 + 0.5).apply(floor).astype(int)
    df["rank"] = df.cents.rank(method="average")
    n = len(df)
    from collections import Counter

    tie3 = sum(t**3 - t for t in Counter(df.cents).values())
    out = {r.seg: r for r in q233_mannwhitney_auc(spark, sf_dir).collect()}
    assert set(out) == set(df.c_mktsegment.unique())
    for seg, r in out.items():
        a = df[df.c_mktsegment == seg]
        n1 = len(a)
        n2 = n - n1
        u = a["rank"].sum() - n1 * (n1 + 1) / 2
        assert (r.n1, r.n2) == (n1, n2)
        assert r.u2_stat == round(2 * u)
        assert r.auc == floor(u / (n1 * n2) * 1e6 + 0.5) / 1e6
        var = n1 * n2 / 12 * ((n + 1) - tie3 / (n * (n - 1)))
        z = (u - n1 * n2 / 2) / sqrt(var)
        assert abs(r.z_score - z) < 1e-3
        assert r.significant == (1 if abs(z) > 1.959964 else 0)


def test_tcloseness_python_twin(spark, sf_dir):
    """q235 vs a direct ordered-EMD twin over normalized distributions."""
    from math import floor

    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        _Q235_BAND,
        q235_tcloseness_audit,
    )

    c = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    c["band"] = (c.c_acctbal / _Q235_BAND).apply(floor).astype(int)
    bands = sorted(c.band.unique())
    m = len(bands)
    n_total = len(c)
    glob = c.band.value_counts().to_dict()
    out = {
        (r.nat, r.seg): r for r in q235_tcloseness_audit(spark, sf_dir).collect()
    }
    groups = c.groupby(["c_nationkey", "c_mktsegment"])
    assert len(out) == len(groups)
    for (nat, seg), grp in groups:
        r = out[(nat, seg)]
        nc = len(grp)
        cls = grp.band.value_counts().to_dict()
        cq = cp = 0
        dev = 0
        for b in bands:
            cq += cls.get(b, 0)
            cp += glob.get(b, 0)
            dev += abs(cq * n_total - cp * nc)  # exact integers, engine's algebra
        den = nc * n_total * (m - 1)
        assert r.n_class == nc
        assert r.emd_t == floor(dev / den * 1e6 + 0.5) / 1e6
        assert r.violates_t == (1 if dev * 5 > den else 0)


def test_benford_python_twin(spark, sf_dir):
    """q242 vs a Counter twin with the identical cents-string digit
    extraction and floor-scaled chi2/MAD grid."""
    from collections import Counter
    from math import floor

    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        _Q242_MAD_NIGRINI,
        _Q242_P,
        _Q242_SCALE,
        q242_benford_audit,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    digits = Counter(
        int(str(floor(p * 100 + 0.5))[0]) for p in o.o_totalprice
    )
    n = sum(digits.values())
    chi_sum = sum(
        floor(
            (digits.get(d, 0) - n * p) ** 2 / (n * p) * _Q242_SCALE
        )
        for d, p in _Q242_P.items()
    )
    mad_sum = sum(
        floor(abs(digits.get(d, 0) / n - p) * _Q242_SCALE)
        for d, p in _Q242_P.items()
    )
    rows = q242_benford_audit(spark, sf_dir).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    mad = mad_sum / _Q242_SCALE / 9
    for r in rows:
        assert r.observed == digits.get(r.digit, 0)
        assert r.expected == floor(n * _Q242_P[r.digit] * 1e4 + 0.5) / 1e4
        assert r.chi2 == floor(chi_sum / _Q242_SCALE * 1e4 + 0.5) / 1e4
        assert r.mad == floor(mad * 1e6 + 0.5) / 1e6
        assert r.conforms == (1 if mad <= _Q242_MAD_NIGRINI else 0)


def test_gini_python_twin(spark, sf_dir):
    """q243 vs the textbook sorted-list Gini (2*sum(i*x)/(n*sum(x)) -
    (n+1)/n) per nation, plus bounds and an all-equal zero check."""
    from math import floor

    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        q243_gini_concentration,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    o["cents"] = (o.o_totalprice * 100 + 0.5).apply(floor).astype(int)
    rev = o.groupby("o_custkey").cents.sum().reset_index()
    rev = rev.merge(c[["c_custkey", "c_nationkey"]],
                    left_on="o_custkey", right_on="c_custkey")
    out = {r.nat: r for r in q243_gini_concentration(spark, sf_dir).collect()}
    for nat, grp in rev.groupby("c_nationkey"):
        xs = sorted(grp.cents)
        n, sx = len(xs), sum(xs)
        s2 = 2 * sum((i + 1) * x for i, x in enumerate(xs))
        g = s2 / (n * sx) - (n + 1) / n
        r = out[nat]
        assert (r.n_custs, r.total_cents) == (n, sx)
        assert r.gini == floor(g * 1e6 + 0.5) / 1e6
        assert 0.0 <= r.gini < 1.0


def test_eb_shrinkage_python_twin(spark, sf_dir):
    """q245 vs a method-of-moments twin on the identical floor-scaled
    grid; shrinkage must pull low-evidence rates toward the prior mean
    harder than high-evidence ones."""
    from math import floor

    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        _Q245_MIN_N,
        _Q245_SCALE,
        _Q245_TOPK,
        q245_eb_shrinkage,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    g = li.groupby("l_partkey")
    stats = {
        pk: (len(grp), int((grp.l_returnflag == "R").sum()))
        for pk, grp in g
    }
    well = [(y / n) for n, y in stats.values() if n >= _Q245_MIN_N]
    s1 = sum(floor(r * _Q245_SCALE) for r in well)
    s2 = sum(floor(r * r * _Q245_SCALE) for r in well)
    m = len(well)
    mean = s1 / _Q245_SCALE / m
    var = s2 / _Q245_SCALE / m - mean * mean
    ab = mean * (1 - mean) / var - 1
    alpha, beta = mean * ab, (1 - mean) * ab
    scored = sorted(
        (
            (-floor((y + alpha) / (n + alpha + beta) * 1e6 + 0.5) / 1e6, pk, n, y)
            for pk, (n, y) in stats.items()
        )
    )[:_Q245_TOPK]
    rows = q245_eb_shrinkage(spark, sf_dir).collect()
    assert len(rows) == _Q245_TOPK
    for r, (neg_eb, pk, n, y) in zip(rows, scored):
        assert (r.partkey, r.n, r.y) == (pk, n, y)
        assert r.eb_rate == -neg_eb
        assert r.alpha == floor(alpha * 1e4 + 0.5) / 1e4
        assert r.beta == floor(beta * 1e4 + 0.5) / 1e4
        # shrinkage property: eb sits between raw and the prior mean
        prior = alpha / (alpha + beta)
        lo, hi = min(r.raw_rate, prior), max(r.raw_rate, prior)
        assert lo - 1e-6 <= r.eb_rate <= hi + 1e-6


def test_hill_tail_index_python_twin(spark, sf_dir):
    """q246 vs a sorted-list Hill twin with identical tiebreaks and
    floor-scaled log grid."""
    from math import floor, log

    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        _Q246_K,
        _Q246_SCALE,
        q246_hill_tail_index,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    cents = sorted(
        (floor(p * 100 + 0.5) for p in o.o_totalprice), reverse=True
    )[: _Q246_K + 1]
    xk = cents[-1]
    ls = sum(floor(log(c / xk) * _Q246_SCALE) for c in cents if c > xk)
    k_used = sum(1 for c in cents if c > xk)
    h = ls / _Q246_SCALE / k_used
    r = q246_hill_tail_index(spark, sf_dir).collect()[0]
    assert (r.k_used, r.threshold_cents) == (k_used, xk)
    assert k_used >= 1  # pins the non-degenerate assumption on testdata
    assert r.hill_alpha == floor(1 / h * 1e4 + 0.5) / 1e4
    assert r.finite_variance == (1 if 1 / h > 2.0 else 0)


def test_hill_all_ties_degenerate_guard(spark, tmp_path):
    """Every top-(k+1) value tied at the threshold: the estimator is
    undefined, but the query must still emit ONE row with k_used=0 and
    NULL alpha/finite_variance rather than silently returning nothing
    (round-8 ADVICE fix)."""
    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        q246_hill_tail_index,
    )

    spark.range(500).select(
        F.col("id").alias("o_orderkey"),
        F.lit(1).alias("o_custkey"),
        F.lit("O").alias("o_orderstatus"),
        F.lit(42.0).alias("o_totalprice"),
        F.lit("2024-01-01").cast("timestamp").alias("o_orderdate"),
        F.lit("1-URGENT").alias("o_orderpriority"),
    ).write.parquet(str(tmp_path / "orders.parquet"))
    out = q246_hill_tail_index(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.k_used == 0 and r.threshold_cents == 4200
    assert r.hill_alpha is None and r.finite_variance is None


def test_spearman_python_twin(spark, sf_dir):
    """q252 vs scipy-free python Spearman (average ranks via doubled
    integers, Pearson on ranks), plus a perfect-monotone pin."""
    from collections import Counter
    from math import floor, sqrt

    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        q252_spearman_matrix,
    )

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    pdf["day"] = pdf.ts.dt.floor("D")
    days = sorted(pdf.day.unique())
    types = sorted(pdf.event_type.unique())
    series = {
        t: [int(((pdf.event_type == t) & (pdf.day == d)).sum()) for d in days]
        for t in types
    }

    def rank2(ys):
        cnt = Counter(ys)
        out = []
        for y in ys:
            below = sum(c for v, c in cnt.items() if v < y)
            out.append(2 * below + cnt[y] + 1)
        return out

    out = {
        (r.type_a, r.type_b): r for r in q252_spearman_matrix(spark, sf_dir).collect()
    }
    assert len(out) == len(types) * (len(types) - 1) // 2
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            ra, rb = rank2(series[ta]), rank2(series[tb])
            n = len(days)
            sx, sy = sum(ra), sum(rb)
            sxy = sum(a * b for a, b in zip(ra, rb))
            sxx = sum(a * a for a in ra)
            syy = sum(b * b for b in rb)
            rho = (n * sxy - sx * sy) / sqrt(
                (n * sxx - sx * sx) * (n * syy - sy * sy)
            )
            r = out[(ta, tb)]
            assert r.n_days == n
            assert r.spearman_rho == floor(rho * 1e6 + 0.5) / 1e6
            assert -1.0 <= r.spearman_rho <= 1.0


def test_fd_audit_python_twin(spark, sf_dir):
    """q255 vs pandas nunique checks; the known-true and known-false
    dependencies must land on the right verdicts."""
    from bbc_news_data_pipeline_spark.plans.quality_plans import q255_fd_audit

    tables = {
        t: spark.read.parquet(f"{sf_dir}/{t}.parquet").toPandas()
        for t in ("orders", "customer", "lineitem", "events")
    }
    specs = {
        "orders: o_orderkey -> o_custkey": ("orders", ["o_orderkey"], "o_custkey"),
        "orders: o_custkey -> o_orderpriority":
            ("orders", ["o_custkey"], "o_orderpriority"),
        "customer: c_custkey -> c_nationkey":
            ("customer", ["c_custkey"], "c_nationkey"),
        "lineitem: (l_orderkey,l_linenumber) -> l_partkey":
            ("lineitem", ["l_orderkey", "l_linenumber"], "l_partkey"),
        "lineitem: l_orderkey -> l_suppkey":
            ("lineitem", ["l_orderkey"], "l_suppkey"),
        "events: user_id -> event_type": ("events", ["user_id"], "event_type"),
    }
    out = {r.fd: r for r in q255_fd_audit(spark, sf_dir).collect()}
    assert set(out) == set(specs)
    for fd, (t, lhs, rhs) in specs.items():
        d = tables[t].groupby(lhs)[rhs].nunique()
        r = out[fd]
        assert (r.n_groups, r.n_violating, r.max_fanout) == (
            len(d), int((d > 1).sum()), int(d.max())
        )
        assert r.holds == (1 if (d > 1).sum() == 0 else 0)
    # the PK-derived FDs must hold; the behavioral ones must not
    # (note: (l_orderkey, l_linenumber) is NOT a key in the synthetic
    # lineitem — linenumbers repeat within an order — so that FD is a
    # genuine negative here, caught by the generic loop above)
    assert out["orders: o_orderkey -> o_custkey"].holds == 1
    assert out["customer: c_custkey -> c_nationkey"].holds == 1
    assert out["events: user_id -> event_type"].holds == 0


def test_column_entropy_python_twin(spark, sf_dir):
    """q256 vs Counter entropy on the identical floor-scaled grid;
    uniform-ish columns read norm_entropy near 1, skewed ones below."""
    from collections import Counter
    from math import floor, log

    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        _Q256_SCALE,
        q256_column_entropy,
    )

    specs = [
        ("orders", "o_orderpriority"), ("orders", "o_orderstatus"),
        ("customer", "c_mktsegment"), ("customer", "c_nationkey"),
        ("lineitem", "l_returnflag"), ("events", "event_type"),
        ("documents", "lang"), ("documents", "source"),
    ]
    out = {r.column_name: r for r in q256_column_entropy(spark, sf_dir).collect()}
    assert set(out) == {f"{t}.{c}" for t, c in specs}
    for t, c in specs:
        pdf = spark.read.parquet(f"{sf_dir}/{t}.parquet").toPandas()
        cnt = Counter(str(v) for v in pdf[c])
        n, k = sum(cnt.values()), len(cnt)
        h_sum = sum(
            floor(-(ci / n) * log(ci / n) * _Q256_SCALE) for ci in cnt.values()
        )
        h = h_sum / _Q256_SCALE
        r = out[f"{t}.{c}"]
        assert (r.n_rows, r.n_distinct) == (n, k)
        assert r.top_share == floor(max(cnt.values()) / n * 1e6 + 0.5) / 1e6
        assert r.entropy_bits == floor(h / log(2) * 1e6 + 0.5) / 1e6
        want_norm = floor(h / log(k) * 1e6 + 0.5) / 1e6 if k > 1 else 0.0
        assert r.norm_entropy == want_norm
        assert 0.0 <= r.norm_entropy <= 1.0 + 1e-9


def test_quantile_effects_python_twin(spark, sf_dir):
    """q258 vs a sorted-list type-1 quantile twin per arm."""
    from math import ceil, floor

    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        _Q258_PCTS,
        _Q258_SEG,
        q258_quantile_effects,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["cents"] = (df.o_totalprice * 100 + 0.5).apply(floor).astype(int)
    arms = {
        1: sorted(df[df.c_mktsegment == _Q258_SEG].cents),
        0: sorted(df[df.c_mktsegment != _Q258_SEG].cents),
    }
    out = {r.pct: r for r in q258_quantile_effects(spark, sf_dir).collect()}
    assert set(out) == set(_Q258_PCTS)
    for p in _Q258_PCTS:
        qs = arms[1][ceil(len(arms[1]) * p / 100) - 1]
        qr = arms[0][ceil(len(arms[0]) * p / 100) - 1]
        r = out[p]
        assert (r.q_seg_cents, r.q_rest_cents, r.diff_cents) == (qs, qr, qs - qr)
        assert r.rel_gap == floor((qs - qr) / qr * 1e6 + 0.5) / 1e6


def test_dispersion_index_python_twin(spark, sf_dir, tmp_path):
    """q259 vs exact-rational dispersion; a constant-rate authored
    stream must NOT flag bursty, a clumped one must."""
    from collections import Counter
    from datetime import datetime, timedelta
    from math import floor, sqrt

    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        q259_dispersion_index,
    )

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    pdf["day"] = pdf.ts.dt.floor("D")
    out = {r.event_type: r for r in q259_dispersion_index(spark, sf_dir).collect()}
    for t, grp in pdf.groupby("event_type"):
        ys = list(Counter(grp.day).values())
        n, s1, s2 = len(ys), sum(ys), sum(y * y for y in ys)
        disp = (n * s2 - s1 * s1) / ((n - 1) * s1)
        chi = disp * (n - 1)
        r = out[t]
        assert (r.n_days, r.total_events) == (n, s1)
        assert r.dispersion == floor(disp * 1e4 + 0.5) / 1e4
        assert r.chi2 == floor(chi * 1e4 + 0.5) / 1e4
        assert r.bursty == (1 if chi > (n - 1) + 2 * sqrt(2 * (n - 1)) else 0)

    t0 = datetime(2024, 10, 1)
    rows, eid = [], 0
    for d in range(20):
        for _ in range(10):  # steady
            rows.append((eid, t0 + timedelta(days=d), 1, "steady", 1.0, "{}"))
            eid += 1
        n = 100 if d % 5 == 0 else 1  # clumped
        for _ in range(n):
            rows.append((eid, t0 + timedelta(days=d), 1, "bursty", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {r.event_type: r for r in
           q259_dispersion_index(spark, str(tmp_path)).collect()}
    assert got["steady"].bursty == 0 and got["steady"].dispersion == 0.0
    assert got["bursty"].bursty == 1 and got["bursty"].dispersion > 10


def test_aa_calibration_python_twin(spark, sf_dir):
    """q262: recompute two seeds' null splits in python (md5 arms, Welch
    t); fp_rate must equal n_fp/S and sit well below 50%."""
    import hashlib
    from math import floor, sqrt

    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        _Q262_SEEDS,
        _Q262_TCRIT,
        q262_aa_calibration,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    o["q"] = (o.o_totalprice * 100 + 0.5).apply(floor).astype(int)
    rows = {r.seed: r for r in q262_aa_calibration(spark, sf_dir).collect()}
    assert set(rows) == set(range(_Q262_SEEDS))
    for s in (0, 7):
        arms = {0: [], 1: []}
        for k, q in zip(o.o_orderkey, o.q):
            a = int(hashlib.md5(f"aa{s}:{k}".encode()).hexdigest()[:8], 16) % 2
            arms[a].append(q)
        n1, n0 = len(arms[1]), len(arms[0])
        s1, s0 = sum(arms[1]), sum(arms[0])
        ss1 = sum(x * x for x in arms[1])
        ss0 = sum(x * x for x in arms[0])
        v1 = (n1 * ss1 - s1 * s1) / (n1 * (n1 - 1))
        v0 = (n0 * ss0 - s0 * s0) / (n0 * (n0 - 1))
        t = (s1 / n1 - s0 / n0) / sqrt(v1 / n1 + v0 / n0)
        r = rows[s]
        assert (r.n1, r.n0) == (n1, n0)
        assert r.t_stat == floor(t * 1e4 + 0.5) / 1e4
        assert r.false_positive == (1 if abs(t) > _Q262_TCRIT else 0)
    n_fp = sum(r.false_positive for r in rows.values())
    for r in rows.values():
        assert r.fp_rate == floor(n_fp / _Q262_SEEDS * 1e4 + 0.5) / 1e4
    assert n_fp <= _Q262_SEEDS // 2  # a sane platform: nowhere near coin-flip


def test_fairness_audit_python_twin(spark, sf_dir):
    """q264 vs a pandas twin of every rate/gap; verdict fields are
    consistent with the dp_ratio arithmetic."""
    from math import floor

    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        q264_fairness_audit,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    ret = set(li[li.l_returnflag == "R"].l_orderkey)
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["yh"] = df.o_orderpriority.isin(["1-URGENT", "2-HIGH"]).astype(int)
    df["y"] = df.o_orderkey.isin(ret).astype(int)
    out = {r.seg: r for r in q264_fairness_audit(spark, sf_dir).collect()}
    n_t, sel_t = len(df), df.yh.sum()
    pos_t, tp_t = df.y.sum(), (df.yh * df.y).sum()
    fp_t = (df.yh * (1 - df.y)).sum()
    for seg, grp in df.groupby("c_mktsegment"):
        n, sel, pos = len(grp), grp.yh.sum(), grp.y.sum()
        tp, fp = (grp.yh * grp.y).sum(), (grp.yh * (1 - grp.y)).sum()
        r = out[seg]
        assert (r.n, r.sel, r.pos) == (n, sel, pos)
        assert r.sel_rate == floor(sel / n * 1e6 + 0.5) / 1e6
        assert r.tpr == floor(tp / pos * 1e6 + 0.5) / 1e6
        assert r.fpr == floor(fp / (n - pos) * 1e6 + 0.5) / 1e6
        dp = (sel / n) / (sel_t / n_t)
        assert r.dp_ratio == floor(dp * 1e4 + 0.5) / 1e4
        assert r.fails_80pct_rule == (1 if dp < 0.8 else 0)
        assert r.eo_tpr_gap == floor((tp / pos - tp_t / pos_t) * 1e4 + 0.5) / 1e4
        assert r.eo_fpr_gap == floor(
            (fp / (n - pos) - fp_t / (n_t - pos_t)) * 1e4 + 0.5
        ) / 1e4


def test_lmoments_python_twin(spark, sf_dir):
    """q266 vs direct sorted-order-statistics probability-weighted
    moments (the definition, not the hockey-stick algebra); ratio
    bounds hold."""
    from math import comb, floor

    from bbc_news_data_pipeline_spark.plans.quality_plans import q266_lmoments

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    df = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    df["v"] = (df.o_totalprice * 100 + 0.5).apply(floor).astype(int)
    out = {r.nat: r for r in q266_lmoments(spark, sf_dir).collect()}
    for nat, grp in df.groupby("c_nationkey"):
        xs = sorted(grp.v)
        n = len(xs)
        b = [
            sum(comb(i, r) * x for i, x in enumerate(xs)) / (n * comb(n - 1, r))
            for r in range(4)
        ]
        l1 = b[0]
        l2 = 2 * b[1] - b[0]
        l3 = 6 * b[2] - 6 * b[1] + b[0]
        l4 = 20 * b[3] - 30 * b[2] + 12 * b[1] - b[0]
        r = out[nat]
        assert r.n == n
        assert abs(r.l1_cents - l1) < 0.01
        assert abs(r.l2_cents - l2) < 0.01
        assert abs(r.l_cv - l2 / l1) < 1e-5
        assert abs(r.l_skew - l3 / l2) < 1e-5
        assert abs(r.l_kurt - l4 / l2) < 1e-5
        # theoretical bounds for any distribution
        assert 0 < r.l_cv < 1 and abs(r.l_skew) < 1 and -0.25 <= r.l_kurt < 1
