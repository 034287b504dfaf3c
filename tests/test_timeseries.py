"""Unit tests for operators/timeseries.py: binned range join boundary
semantics (strict lower / inclusive upper, bin-edge pairs) and the
multi-grain rollup's internal consistency (hour rows reaggregate to the
day rows; grain discriminator)."""

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.operators.timeseries import (
    binned_range_join,
    multi_grain_rollup,
)

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_range_join_boundaries(spark):
    # window 60s: gap must satisfy 0 < gap <= 60s
    left = _mk(
        spark,
        [(1, T0 + timedelta(seconds=100), "L")],
        "k long, ts timestamp, tag string",
    )
    right = _mk(
        spark,
        [
            (1, T0 + timedelta(seconds=100), 0),   # gap 0 → excluded (strict)
            (1, T0 + timedelta(seconds=40), 1),    # gap 60 → included (inclusive)
            (1, T0 + timedelta(seconds=39), 2),    # gap 61 → excluded
            (1, T0 + timedelta(seconds=99), 3),    # gap 1 → included
            (2, T0 + timedelta(seconds=99), 4),    # wrong key
        ],
        "k long, rts timestamp, rid int",
    )
    got = sorted(
        r.rid
        for r in binned_range_join(left, right, "k", "ts", "rts", 60).collect()
    )
    assert got == [1, 3]


def test_range_join_crosses_bin_edge(spark):
    # left at 12:00:10, right at 11:59:50 — different 60s bins, gap 20s
    left = _mk(spark, [(1, T0 + timedelta(hours=12, seconds=10), "L")],
               "k long, ts timestamp, tag string")
    right = _mk(spark, [(1, T0 + timedelta(hours=11, minutes=59, seconds=50), 9)],
                "k long, rts timestamp, rid int")
    got = binned_range_join(left, right, "k", "ts", "rts", 60).collect()
    assert [r.rid for r in got] == [9]


def test_range_join_no_duplicate_pairs(spark):
    # many rights inside one window must each appear exactly once
    left = _mk(spark, [(1, T0 + timedelta(seconds=500), "L")],
               "k long, ts timestamp, tag string")
    right = _mk(
        spark,
        [(1, T0 + timedelta(seconds=500 - g), i) for i, g in enumerate(range(1, 300, 7))],
        "k long, rts timestamp, rid int",
    )
    out = binned_range_join(left, right, "k", "ts", "rts", 300)
    assert out.count() == out.select("rid").distinct().count() == len(range(1, 300, 7))


def test_multi_grain_rollup_consistency(spark):
    rows = [
        (T0 + timedelta(hours=h, minutes=m), float(h * 10 + m))
        for h in range(3)
        for m in (0, 30)
    ] + [(T0 + timedelta(days=1, hours=5), 7.5)]
    ev = _mk(spark, rows, "ts timestamp, value double")
    out = multi_grain_rollup(ev, "ts", "value", grains=("day", "hour")).collect()
    day = {r.day_ts: r for r in out if r.grain == 0}
    hour = [r for r in out if r.grain == 1]
    # day-grain rows have NULL hour bucket; hour rows don't
    assert all(r.hour_ts is None for r in day.values())
    assert all(r.hour_ts is not None for r in hour)
    assert len(day) == 2 and len(hour) == 4
    # hour rows reaggregate exactly to their day row
    for d, drow in day.items():
        hs = [r for r in hour if r.day_ts == d]
        assert sum(r.n_events for r in hs) == drow.n_events
        assert abs(sum(r.sum_value for r in hs) - drow.sum_value) < 1e-9


def test_ewma_group_size_guard_fails_loudly(spark):
    """VERDICT r3 minor #3: feeding raw events (an unbounded per-key
    series) must fail with a descriptive error, not OOM an executor on
    the collected array; compliant series are untouched."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    from bbc_news_data_pipeline_spark.operators.timeseries import ewma_by_key

    df = spark.range(50).select(
        F.lit("k").alias("k"), F.col("id").alias("t"), F.col("id").cast("double").alias("v")
    )
    with pytest.raises(SparkRuntimeException, match="max_group_size"):
        ewma_by_key(df, ["k"], "t", "v", alpha=0.5, max_group_size=10).collect()
    ok = ewma_by_key(df, ["k"], "t", "v", alpha=0.5, max_group_size=50).collect()
    assert len(ok) == 50


def test_sessionize_counts_null_timestamps(spark):
    """Null-timestamp rows must count toward n_events (the pre-round-4
    window formulation's count(*) semantics) and must not crash the
    ANSI element_at path; a user with ONLY null timestamps still gets a
    row."""
    from bbc_news_data_pipeline_spark.operators.timeseries import bounded_sessionize

    rows = [
        (0, 1_700_000_000, 1),   # u1: two real events, one gap < 30min
        (1, 1_700_000_600, 1),
        (2, None, 1),            # u1: null ts rides along
        (3, None, 2),            # u2: nothing but nulls
    ]
    ev = spark.createDataFrame(rows, "event_id long, sec long, user_id long").select(
        "event_id", F.timestamp_seconds("sec").alias("ts"), "user_id"
    )
    got = {r.user_id: (r.n_sessions, r.n_events) for r in bounded_sessionize(ev).collect()}
    # naive-lag semantics: nulls sort first, every gap touching them is
    # null (no break), so the mixed user has ONE session, not a phantom
    # extra from the null block
    assert got[1] == (1, 3)
    assert got[2] == (1, 1)  # all-null user: one row, one session


def test_selection_median_matches_python_twin(spark):
    """q130: the two-pass selection must return the exact k-th order
    statistic (lower median), and the target bucket must be a small
    slice of each group (the point of the algorithm)."""
    import pyarrow.parquet as pq

    from bbc_news_data_pipeline_spark.plans.timeseries_plans import (
        q130_selection_median,
    )

    sf = "/root/testdata/sf0.001"
    out = q130_selection_median(spark, sf).toPandas().set_index("event_type")
    ev = pq.read_table(f"{sf}/events.parquet").to_pandas()
    for et, grp in ev.groupby("event_type"):
        vals = sorted(grp.value)
        k = (len(vals) + 1) // 2
        row = out.loc[et]
        assert row.n == len(vals)
        assert row.median_value == vals[k - 1]
        assert row.n_bucket_rows < max(8, len(vals) // 4)


def test_funnel_latency_python_twin_and_engineered(spark, sf_dir, tmp_path):
    """q203 vs a python twin (first signup → first subsequent purchase,
    hour buckets, exact ceil-rank percentile rule); then an engineered
    corpus with hand-computable latencies of 0h/1h/10h across three
    converting users (p50 → 1h bucket, p99 → 10h bucket) and one
    never-converting signup."""
    from datetime import datetime, timedelta
    from math import floor

    from bbc_news_data_pipeline_spark.plans.timeseries_plans import (
        _Q203_PCTS,
        _Q203_W,
        q203_funnel_latency,
    )

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    s = pdf[pdf.event_type == "signup"].groupby("user_id").ts.min()
    p = pdf[pdf.event_type == "purchase"].merge(
        s.rename("s_ts"), left_on="user_id", right_index=True
    )
    p = p[p.ts >= p.s_ts]
    first = p.groupby("user_id").agg(p_ts=("ts", "min"), s_ts=("s_ts", "min"))
    lat = [
        ((pt.value // 1000) - (st.value // 1000)) // 1_000_000 // _Q203_W
        for pt, st in zip(first.p_ts, first.s_ts)
    ]  # pandas .value is ns; → us → sec → bucket
    lat.sort()
    n_conv, n_sign = len(lat), len(s)
    out = {r.pct: r for r in q203_funnel_latency(spark, sf_dir).collect()}
    assert set(out) == set(_Q203_PCTS)
    for pct, r in out.items():
        rk = -((-n_conv * pct) // 100)  # ceil
        b = lat[rk - 1]
        assert (r.n_signups, r.n_converted) == (n_sign, n_conv)
        assert (r.sec_lo, r.sec_hi) == (b * _Q203_W, (b + 1) * _Q203_W)
        assert r.conv_rate == floor(n_conv / n_sign * 1e6 + 0.5) / 1e6

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "signup", 1.0, "{}"),
        (2, t0 + timedelta(minutes=30), 1, "purchase", 1.0, "{}"),   # 0h
        (3, t0, 2, "signup", 1.0, "{}"),
        (4, t0 + timedelta(hours=1, minutes=5), 2, "purchase", 1.0, "{}"),  # 1h
        (5, t0, 3, "signup", 1.0, "{}"),
        (6, t0 - timedelta(hours=2), 3, "purchase", 1.0, "{}"),  # before signup
        (7, t0 + timedelta(hours=10, minutes=1), 3, "purchase", 1.0, "{}"),  # 10h
        (8, t0, 4, "signup", 1.0, "{}"),  # never converts
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    eng = {r.pct: r for r in q203_funnel_latency(spark, str(tmp_path)).collect()}
    assert all(r.n_signups == 4 and r.n_converted == 3 for r in eng.values())
    assert eng[50].sec_lo == 1 * 3600 and eng[99].sec_lo == 10 * 3600
    assert eng[50].conv_rate == 0.75


def test_session_paths_python_twin(spark, sf_dir):
    """q206 vs a python sessionizer twin: same 30-min gap rule, same
    (ts, event_id) total order, first-5 path strings, top-10 by
    (count desc, path asc)."""
    from collections import Counter, defaultdict
    from math import floor

    from bbc_news_data_pipeline_spark.plans.timeseries_plans import (
        _Q206_GAP_S,
        _Q206_PLEN,
        _Q206_TOPK,
        q206_session_paths,
    )

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    by_user = defaultdict(list)
    for r in pdf.itertuples():
        by_user[r.user_id].append((r.ts.value // 1000, r.event_id, r.event_type))
    paths = Counter()
    for evs in by_user.values():
        evs.sort()
        cur, last_us = [], None
        for us, _eid, et in evs:
            if last_us is not None and us - last_us > _Q206_GAP_S * 1_000_000:
                paths[">".join(cur[:_Q206_PLEN])] += 1
                cur = []
            cur.append(et)
            last_us = us
        if cur:
            paths[">".join(cur[:_Q206_PLEN])] += 1
    total = sum(paths.values())
    top = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:_Q206_TOPK]
    out = q206_session_paths(spark, sf_dir).collect()
    assert [(r.path, r.n_sessions) for r in out] == top
    for r in out:
        assert r.share == floor(r.n_sessions / total * 1e6 + 0.5) / 1e6


def test_disorder_profile_python_twin(spark, sf_dir):
    """q214 vs python: arrival-order prefix max, minute buckets,
    ceil-rank percentiles, on-time share."""
    from collections import Counter
    from math import floor

    from bbc_news_data_pipeline_spark.plans.timeseries_plans import (
        _Q214_PCTS,
        q214_disorder_profile,
    )

    pdf = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .toPandas()
        .sort_values("event_id")
    )
    mx, lates = None, []
    for ts in pdf.ts:
        us = ts.value // 1000
        lates.append(max(mx - us, 0) // 1_000_000 if mx is not None else 0)
        mx = us if mx is None else max(mx, us)
    dig = Counter(s // 60 for s in lates)
    n = len(lates)
    n_ontime = sum(1 for s in lates if s == 0)
    out = {r.pct: r for r in q214_disorder_profile(spark, sf_dir).collect()}
    assert set(out) == set(_Q214_PCTS)
    for p, r in out.items():
        rk = (n * p + 99) // 100
        cum = 0
        for b in sorted(dig):
            cum += dig[b]
            if cum >= rk:
                break
        assert (r.late_sec_lo, r.late_sec_hi) == (b * 60, (b + 1) * 60)
        assert (r.n_events, r.n_ontime) == (n, n_ontime)
        assert r.share_ontime == floor(n_ontime / n * 1e6 + 0.5) / 1e6


def test_asof_modes_python_twin_and_engineered(spark, sf_dir, tmp_path):
    """q217 vs a python twin on real data (per-mode match counts, exact
    gap sums, click-id checksums), plus an engineered layout where the
    three modes provably pick DIFFERENT clicks (backward 3 min before,
    forward 2 min after → nearest = forward)."""
    from collections import defaultdict
    from datetime import datetime, timedelta
    from math import floor

    from bbc_news_data_pipeline_spark.plans.timeseries_plans import (
        _Q217_TOL_S,
        q217_asof_modes,
    )

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    err = pdf[pdf.event_type == "error"]
    clk = pdf[pdf.event_type == "click"]
    by_user = defaultdict(list)
    for r in clk.itertuples():
        by_user[r.user_id].append((r.ts.value // 1000, r.event_id))
    tol = _Q217_TOL_S * 1_000_000
    picks = {"backward": [], "forward": [], "nearest": []}
    for r in err.itertuples():
        e = r.ts.value // 1000
        cands = [(e - c, cid) for c, cid in by_user.get(r.user_id, [])
                 if abs(e - c) <= tol]
        back = sorted([(g, cid) for g, cid in cands if g >= 0])
        fwd = sorted([(-g, cid) for g, cid in cands if g <= 0])
        near = sorted([(abs(g), 0 if g >= 0 else 1, cid, g) for g, cid in cands])
        if back:
            picks["backward"].append((back[0][0], back[0][1]))
        if fwd:
            picks["forward"].append((fwd[0][0], fwd[0][1]))
        if near:
            picks["nearest"].append((near[0][0], near[0][2]))
    out = {r.mode: r for r in q217_asof_modes(spark, sf_dir).collect()}
    for mode, sel in picks.items():
        r = out[mode]
        assert r.n_errors == len(err)
        assert r.n_matched == len(sel)
        assert r.sum_abs_gap_ms == sum(g // 1000 for g, _ in sel)
        assert r.clk_id_checksum == float(sum(cid for _, cid in sel))
        assert r.match_rate == floor(len(sel) / len(err) * 1e6 + 0.5) / 1e6

    t0 = datetime(2024, 1, 10, 12, 0, 0)
    rows = [
        (1, t0 - timedelta(minutes=3), 1, "click", 1.0, "{}"),
        (2, t0 + timedelta(minutes=2), 1, "click", 1.0, "{}"),
        (3, t0, 1, "error", 1.0, "{}"),
        (4, t0 - timedelta(hours=5), 2, "click", 1.0, "{}"),  # out of tolerance
        (5, t0, 2, "error", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    eng = {r.mode: r for r in q217_asof_modes(spark, str(tmp_path)).collect()}
    assert eng["backward"].clk_id_checksum == 1.0   # 3 min before
    assert eng["forward"].clk_id_checksum == 2.0    # 2 min after
    assert eng["nearest"].clk_id_checksum == 2.0    # forward is closer
    assert all(r.n_matched == 1 and r.n_errors == 2 for r in eng.values())


def test_time_weighted_avg_python_twin_and_bias_case(spark, sf_dir, tmp_path):
    """q218 vs an exact python twin on real data; engineered series
    (value 100 held 9 min, value 0 held 1 min) → twa 90.0 vs plain 50.0."""
    from datetime import datetime, timedelta
    from math import floor

    from bbc_news_data_pipeline_spark.plans.timeseries_plans import (
        q218_time_weighted_avg,
    )

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    h = max(t.value // 1000 for t in pdf.ts)
    out = {r.user_id: r for r in q218_time_weighted_avg(spark, sf_dir).collect()}
    for uid, g in pdf.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        ts = [t.value // 1000 for t in g.ts]
        cents = [int(floor(v * 100 + 0.5)) for v in g.value]
        gaps = [ts[i + 1] - ts[i] for i in range(len(ts) - 1)] + [h - ts[-1]]
        swv = sum(c * w for c, w in zip(cents, gaps))
        sw = sum(gaps)
        r = out[uid]
        assert r.n_obs == len(ts) and r.span_us == float(sw)
        assert r.time_weighted_avg == floor(swv / sw / 100 * 1e4 + 0.5) / 1e4
        assert r.plain_avg == floor(sum(cents) / len(cents) / 100 * 1e4 + 0.5) / 1e4

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, 9, "view", 100.0, "{}"),
        (2, t0 + timedelta(minutes=9), 9, "view", 0.0, "{}"),
        (3, t0 + timedelta(minutes=10), 9, "view", 0.0, "{}"),  # horizon anchor
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    eng = q218_time_weighted_avg(spark, str(tmp_path)).collect()[0]
    assert eng.time_weighted_avg == 90.0
    assert round(eng.plain_avg, 4) == round(100.0 / 3, 4)


def test_periodicity_and_cohort_ltv_twins(spark, sf_dir):
    """q222 and q223 vs python twins: exact lag-24h dot products and
    cent-exact cumulative cohort revenue."""
    from collections import Counter, defaultdict
    from math import floor

    import pandas as pd

    from bbc_news_data_pipeline_spark.plans.timeseries_plans import (
        _Q222_LAG_H,
        q222_periodicity_score,
        q223_cohort_ltv,
    )

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    pdf["h"] = pdf.ts.dt.floor("h")
    out = {r.user_id: r for r in q222_periodicity_score(spark, sf_dir).collect()}
    for uid, g in pdf.groupby("user_id"):
        c = Counter(g.h)
        ss = sum(v * v for v in c.values())
        sp = sum(
            c[h] * c[h - pd.Timedelta(hours=_Q222_LAG_H)]
            for h in c
            if h - pd.Timedelta(hours=_Q222_LAG_H) in c
        )
        n_pairs = sum(
            1 for h in c if h - pd.Timedelta(hours=_Q222_LAG_H) in c
        )
        r = out[uid]
        assert (r.n_hours, r.n_lag_pairs) == (len(c), n_pairs)
        assert r.periodicity == floor(sp / ss * 1e6 + 0.5) / 1e6

    first = pdf.groupby("user_id").ts.min().dt.to_period("W").dt.start_time
    pur = pdf[pdf.event_type == "purchase"].copy()
    pur["cohort"] = pur.user_id.map(first)
    pur["age_w"] = (
        (pur.ts.dt.to_period("W").dt.start_time - pur.cohort).dt.days // 7
    )
    pur["cents"] = (pur.value * 100 + 0.5).apply(int)
    sizes = Counter(first)
    cells = pur.groupby(["cohort", "age_w"]).cents.sum()
    got = {(r.cohort, r.age_w): r for r in q223_cohort_ltv(spark, sf_dir).collect()}
    cum = defaultdict(int)
    for (coh, age), s in sorted(cells.items()):
        cum[coh] += int(s)
        r = got[(coh.to_pydatetime(), age)]
        assert r.cohort_users == sizes[coh]
        assert round(r.cum_revenue * 100) == cum[coh]
        assert r.ltv_per_user == floor(cum[coh] / sizes[coh] / 100 * 1e4 + 0.5) / 1e4


def test_changepoint_python_twin_and_engineered_shift(spark, sf_dir, tmp_path):
    """q226 vs a python twin on real data, plus an engineered level
    shift (10/day for 10 days → 100/day for 5 days) that must split
    exactly at the shift boundary with means 10 and 100."""
    from collections import Counter, defaultdict
    from datetime import datetime, timedelta
    from math import floor

    from bbc_news_data_pipeline_spark.plans.timeseries_plans import (
        _Q226_SCALE,
        q226_changepoint,
    )

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    pdf["day"] = pdf.ts.dt.floor("D")
    out = {r.event_type: r for r in q226_changepoint(spark, sf_dir).collect()}
    for et, g in pdf.groupby("event_type"):
        days = sorted(Counter(g.day).items())
        ns = [n for _, n in days]
        d, s = len(ns), sum(ns)
        best = None
        for t in range(1, d):
            sl, sr = sum(ns[:t]), s - sum(ns[:t])
            h = (sl * sl * (d - t) + sr * sr * t) * _Q226_SCALE // (t * (d - t))
            key = (-h, days[t - 1][0])
            if best is None or key < best[0]:
                best = (key, t, sl, sr)
        _, t, sl, sr = best
        r = out[et]
        assert r.split_after_day == days[t - 1][0].to_pydatetime()
        assert (r.n_days_left, r.n_days_right) == (t, d - t)
        assert r.mean_left == floor(sl / t * 1e4 + 0.5) / 1e4
        assert r.mean_right == floor(sr / (d - t) * 1e4 + 0.5) / 1e4

    rows, eid = [], 0
    for day in range(15):
        per = 10 if day < 10 else 100
        for k in range(per):
            rows.append(
                (eid, datetime(2024, 3, 1 + day, 1 + k % 20), 1, "view",
                 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    eng = q226_changepoint(spark, str(tmp_path)).collect()[0]
    assert eng.split_after_day == datetime(2024, 3, 10)
    assert (eng.mean_left, eng.mean_right) == (10.0, 100.0)
    assert (eng.n_days_left, eng.n_days_right) == (10, 5)


def test_backfill_ranges_cover_exactly_the_missing_hours(spark, sf_dir):
    """q228: ranges are disjoint per type, cover exactly the grid hours
    with no events, and never touch a present hour."""
    from collections import defaultdict

    import pandas as pd

    from bbc_news_data_pipeline_spark.plans.timeseries_plans import (
        q228_backfill_ranges,
    )

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    pdf["h"] = pdf.ts.dt.floor("h")
    present = defaultdict(set)
    for t, h in zip(pdf.event_type, pdf.h):
        present[t].add(h)
    lo, hi = pdf.h.min(), pdf.h.max()
    grid = pd.date_range(lo, hi, freq="h")
    out = q228_backfill_ranges(spark, sf_dir).collect()
    covered = defaultdict(set)
    for r in out:
        hrs = pd.date_range(r.gap_start, r.gap_end, freq="h")
        assert len(hrs) == r.n_missing_hours
        assert not (set(hrs) & present[r.event_type])  # never a present hour
        assert not (set(hrs) & covered[r.event_type])  # disjoint ranges
        covered[r.event_type].update(hrs)
    for t, hs in present.items():
        assert covered[t] == set(grid) - hs


def test_concurrency_gauge_python_twin(spark, sf_dir):
    """q229 vs a single-machine ±1 sweep twin: identical per-hour peaks
    and session-start counts."""
    from collections import defaultdict

    from bbc_news_data_pipeline_spark.plans.timeseries_plans import (
        _Q229_GAP_S,
        q229_concurrency_gauge,
    )

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    by_user = defaultdict(list)
    for r in pdf.itertuples():
        by_user[r.user_id].append((r.ts.value // 1000, r.event_id))
    gap = _Q229_GAP_S * 1_000_000
    bounds = []
    for evs in by_user.values():
        evs.sort()
        s = e = None
        for us, _ in evs:
            if s is None:
                s, e = us, us
            elif us - e > gap:
                bounds.append((s * 2, 1))
                bounds.append(((e + gap) * 2 + 1, -1))
                s, e = us, us
            else:
                e = us
        bounds.append((s * 2, 1))
        bounds.append(((e + gap) * 2 + 1, -1))
    bounds.sort()
    conc = 0
    peaks = defaultdict(lambda: [0, 0])
    for ok, d in bounds:
        conc += d
        if d == 1:
            t_us = ok // 2
            hour = (t_us // 3_600_000_000) * 3_600_000_000
            peaks[hour][0] += 1
            peaks[hour][1] = max(peaks[hour][1], conc)
    out = q229_concurrency_gauge(spark, sf_dir).collect()
    assert len(out) == len(peaks)
    for r in out:
        hour_us = int(r.hour.timestamp() * 1_000_000)
        n, p = peaks[hour_us]
        assert (r.n_session_starts, r.peak_concurrency) == (n, p)


def test_xcorr_lag_python_twin_and_engineered_lead(spark, sf_dir, tmp_path):
    """q230 vs a Counter twin on real data; then an engineered pair
    where type 'aa' strictly leads type 'bb' by 2 hours → best lag +2
    with xcorr 1.0."""
    from collections import Counter
    from datetime import datetime, timedelta
    from math import floor, sqrt

    import pandas as pd

    from bbc_news_data_pipeline_spark.plans.timeseries_plans import (
        _Q230_MAXLAG,
        _Q230_SCALE,
        q230_xcorr_lag,
    )

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    pdf["h"] = pdf.ts.dt.floor("h")
    series = {
        t: Counter(g.h) for t, g in pdf.groupby("event_type")
    }
    out = {(r.type_a, r.type_b): r for r in q230_xcorr_lag(spark, sf_dir).collect()}
    types = sorted(series)
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            ea = sum(v * v for v in series[ta].values())
            eb = sum(v * v for v in series[tb].values())
            best = None
            for lag in range(-_Q230_MAXLAG, _Q230_MAXLAG + 1):
                sp = sum(
                    ca * series[tb].get(h + pd.Timedelta(hours=lag), 0)
                    for h, ca in series[ta].items()
                )
                key = (sp * sp * _Q230_SCALE) // (ea * eb)
                cand = (-key, abs(lag), lag, sp)
                if best is None or cand < best:
                    best = cand
            r = out[(ta, tb)]
            assert r.best_lag_h == best[2] and r.cross_product == best[3]
            assert r.xcorr == floor(best[3] / sqrt(ea * eb) * 1e6 + 0.5) / 1e6

    t0 = datetime(2024, 5, 1)
    rows, eid = [], 0
    for k in range(48):
        for _ in range(1 + k % 3):
            rows.append((eid, t0 + timedelta(hours=k), 1, "aa", 1.0, "{}")); eid += 1
            rows.append((eid, t0 + timedelta(hours=k + 2), 1, "bb", 1.0, "{}")); eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    eng = q230_xcorr_lag(spark, str(tmp_path)).collect()[0]
    assert (eng.type_a, eng.type_b) == ("aa", "bb")
    assert eng.best_lag_h == 2 and eng.xcorr > 0.95


def test_kaplan_meier_python_twin(spark, sf_dir, tmp_path):
    """q234 vs a from-first-principles KM/Nelson-Aalen twin, plus a
    hand-built table where the censoring and everyone-dead branches are
    forced."""
    from datetime import datetime
    from math import floor

    from bbc_news_data_pipeline_spark.plans.timeseries_plans import (
        _Q234_CENS_DAYS,
        q234_kaplan_meier,
    )

    pdf = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    per = pdf.groupby("o_custkey").o_orderdate.agg(["min", "max"])
    dmax = pdf.o_orderdate.dt.floor("D").max()
    lives = [
        (
            # censored customers are at risk until the observation cut
            (dmax - row["min"].floor("D")).days
            if (dmax - row["max"].floor("D")).days < _Q234_CENS_DAYS
            else (row["max"].floor("D") - row["min"].floor("D")).days,
            int((dmax - row["max"].floor("D")).days < _Q234_CENS_DAYS),
        )
        for _, row in per.iterrows()
    ]
    n_at_risk = len(lives)
    out = q234_kaplan_meier(spark, sf_dir).collect()
    ts = sorted({t for t, _ in lives})
    assert [r.t_days for r in out] == ts
    s_ln, haz = 0.0, 0.0
    dead_seen = False
    for r, t in zip(out, ts):
        d = sum(1 for tt, c in lives if tt == t and c == 0)
        c = sum(1 for tt, c_ in lives if tt == t and c_ == 1)
        assert (r.n_risk, r.d_churned, r.c_censored) == (n_at_risk, d, c)
        if d == n_at_risk:
            dead_seen = True
        if d < n_at_risk:
            from math import log

            s_ln += log((n_at_risk - d) / n_at_risk)
        haz += d / n_at_risk
        from math import exp

        want_s = 0.0 if dead_seen else floor(exp(s_ln) * 1e6 + 0.5) / 1e6
        assert r.survival == want_s
        assert r.cum_hazard == floor(haz * 1e6 + 0.5) / 1e6
        n_at_risk -= d + c
    # survival is monotone non-increasing and starts <= 1
    sv = [r.survival for r in out]
    assert all(a >= b for a, b in zip(sv, sv[1:])) and sv[0] <= 1.0

    # forced branches: 4 customers — two churn at t=1 (one day apart
    # pair), one churns at t=3 taking the risk set to zero mid-table
    # (dead flag), one censored at t=0 on the final day
    rows = [
        (1, 10, "O", 1.0, datetime(2020, 1, 1), "x"),
        (2, 10, "O", 1.0, datetime(2020, 1, 2), "x"),
        (3, 11, "O", 1.0, datetime(2020, 1, 1), "x"),
        (4, 11, "O", 1.0, datetime(2020, 1, 2), "x"),
        (5, 12, "O", 1.0, datetime(2020, 1, 1), "x"),
        (6, 12, "O", 1.0, datetime(2020, 1, 4), "x"),
        (7, 13, "O", 1.0, datetime(2022, 1, 1), "x"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))
    got = {r.t_days: r for r in q234_kaplan_meier(spark, str(tmp_path)).collect()}
    # t=0: customer 13 censored (last order on dmax); risk set 4
    assert (got[0].n_risk, got[0].d_churned, got[0].c_censored) == (4, 0, 1)
    # t=1: customers 10, 11 churned out of remaining 3
    assert (got[1].n_risk, got[1].d_churned) == (3, 2)
    assert got[1].survival == floor((1 / 3) * 1e6 + 0.5) / 1e6
    # t=3: customer 12 churns, d == n_risk -> survival exactly 0
    assert (got[3].n_risk, got[3].d_churned, got[3].survival) == (1, 1, 0.0)


def test_theilsen_python_twin(spark, sf_dir, tmp_path):
    """q238 vs brute-force pairwise slopes + statistics.median (same
    linear interpolation as quantile_cont), plus an outlier-robustness
    check on an authored series where OLS is dragged and Theil-Sen holds."""
    from collections import Counter
    from datetime import datetime, timedelta
    from math import floor
    from statistics import median

    from bbc_news_data_pipeline_spark.plans.timeseries_plans import (
        q238_theilsen_slope,
    )

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    d0 = pdf.ts.dt.floor("D").min()
    pdf["x"] = (pdf.ts.dt.floor("D") - d0).dt.days
    out = {r.event_type: r for r in q238_theilsen_slope(spark, sf_dir).collect()}
    for t, grp in pdf.groupby("event_type"):
        daily = sorted(Counter(grp.x).items())
        slopes = [
            (y2 - y1) / (x2 - x1)
            for i, (x1, y1) in enumerate(daily)
            for (x2, y2) in daily[i + 1:]
        ]
        n = len(daily)
        sx = sum(x for x, _ in daily)
        sy = sum(y for _, y in daily)
        sxy = sum(x * y for x, y in daily)
        sxx = sum(x * x for x, y in daily)
        r = out[t]
        assert (r.n_days, r.n_pairs) == (n, len(slopes))
        assert r.ts_slope == floor(median(slopes) * 1e6 + 0.5) / 1e6
        ols = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert r.ols_slope == floor(ols * 1e6 + 0.5) / 1e6

    # authored: flat series with one massive outlier day — Theil-Sen
    # stays ~0, OLS is dragged positive
    t0 = datetime(2024, 4, 1)
    rows, eid = [], 0
    counts = [10, 10, 10, 10, 10, 10, 1000, 10, 10]  # outlier at day 6
    for d, c in enumerate(counts):
        for _ in range(c):
            rows.append((eid, t0 + timedelta(days=d), 1, "aa", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    r = q238_theilsen_slope(spark, str(tmp_path)).collect()[0]
    assert r.ts_slope == 0.0
    assert abs(r.ols_slope) > 1.0


def test_attribution_python_twin(spark, sf_dir, tmp_path):
    """q239 vs a dict twin (first/last/linear credit, direct fallback),
    plus an authored scenario pinning each model's allocation."""
    from datetime import datetime, timedelta
    from math import floor

    from bbc_news_data_pipeline_spark.plans.timeseries_plans import (
        _Q239_LOOKBACK_DAYS,
        q239_attribution,
    )

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    convs = pdf[pdf.event_type == "purchase"]
    touches = pdf[pdf.event_type != "purchase"]
    credit = {}

    def add(ch, ft_c, ft_cents, lt_cents, lin_cents):
        # integer-cents credit grid, mirroring the plan's q236-style fold
        c = credit.setdefault(ch, [0, 0, 0, 0])
        c[0] += ft_c
        c[1] += ft_cents
        c[2] += lt_cents
        c[3] += lin_cents

    for _, cv in convs.iterrows():
        cv_cents = floor(cv.value * 100 + 0.5)
        win = touches[
            (touches.user_id == cv.user_id)
            & (touches.ts <= cv.ts)
            & (touches.ts > cv.ts - timedelta(days=_Q239_LOOKBACK_DAYS))
        ].sort_values(["ts", "event_id"])
        if len(win) == 0:
            add("direct", 1, cv_cents, cv_cents, cv_cents)
            continue
        first, last = win.iloc[0], win.iloc[-1]
        add(first.event_type, 1, cv_cents, 0, 0)
        add(last.event_type, 0, 0, cv_cents, 0)
        for _, t in win.iterrows():
            add(t.event_type, 0, 0, 0, floor(cv.value / len(win) * 100 + 0.5))
    out = {r.channel: r for r in q239_attribution(spark, sf_dir).collect()}
    assert set(out) == set(credit)
    for ch, (fc, fv, lv, nv) in credit.items():
        r = out[ch]
        assert r.ft_convs == fc
        assert r.ft_value == fv / 100
        assert r.lt_value == lv / 100
        assert r.lin_value == nv / 100

    # authored: view -> click -> purchase(90) within lookback; a second
    # purchase(30) with no touches -> direct
    t0 = datetime(2024, 6, 1)
    rows = [
        (0, t0, 5, "view", 1.0, "{}"),
        (1, t0 + timedelta(hours=1), 5, "click", 1.0, "{}"),
        (2, t0 + timedelta(hours=2), 5, "purchase", 90.0, "{}"),
        (3, t0 + timedelta(days=20), 5, "purchase", 30.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "ev2" / "events.parquet"))
    got = {r.channel: r for r in q239_attribution(spark, str(tmp_path / "ev2")).collect()}
    assert got["view"].ft_value == 90.0 and got["view"].lt_value == 0.0
    assert got["click"].lt_value == 90.0 and got["click"].ft_value == 0.0
    assert got["view"].lin_value == 45.0 and got["click"].lin_value == 45.0
    assert got["direct"].ft_value == 30.0 and got["direct"].lin_value == 30.0


def test_logrank_python_twin(spark, sf_dir):
    """q240 vs a from-first-principles Mantel-Cox twin over the same
    lives (pooled event times, per-group risk sets, hypergeometric
    variance, identical floor-scaled grid)."""
    from math import floor

    from bbc_news_data_pipeline_spark.plans.timeseries_plans import (
        _Q234_CENS_DAYS,
        _Q240_SCALE,
        _Q240_SEG,
        q240_logrank_test,
    )

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").toPandas()
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    seg = dict(zip(c.c_custkey, c.c_mktsegment))
    per = o.groupby("o_custkey").o_orderdate.agg(["min", "max"])
    dmax = o.o_orderdate.dt.floor("D").max()
    lives = [
        (
            (dmax - row["min"].floor("D")).days
            if (dmax - row["max"].floor("D")).days < _Q234_CENS_DAYS
            else (row["max"].floor("D") - row["min"].floor("D")).days,
            1 if seg[k] == _Q240_SEG else 0,
            int((dmax - row["max"].floor("D")).days < _Q234_CENS_DAYS),
        )
        for k, row in per.iterrows()
    ]
    n = {g: sum(1 for _, gg, _ in lives if gg == g) for g in (0, 1)}
    nr = dict(n)
    o1 = e1s = vs = 0
    for t in sorted({t for t, _, _ in lives}):
        d = {g: sum(1 for tt, gg, cc in lives if tt == t and gg == g and not cc)
             for g in (0, 1)}
        cc = {g: sum(1 for tt, gg, c_ in lives if tt == t and gg == g and c_)
              for g in (0, 1)}
        dt, nt = d[0] + d[1], nr[0] + nr[1]
        if dt > 0:
            o1 += d[1]
            e1s += floor(dt * nr[1] / nt * _Q240_SCALE)
            if nt > 1:
                vs += floor(
                    dt * (nr[1] / nt) * ((nt - nr[1]) / nt)
                    * ((nt - dt) / (nt - 1)) * _Q240_SCALE
                )
        for g in (0, 1):
            nr[g] -= d[g] + cc[g]
    r = q240_logrank_test(spark, sf_dir).collect()[0]
    assert (r.n_seg, r.n_rest) == (n[1], n[0])
    assert r.observed_seg == o1
    assert r.expected_seg == floor(e1s / _Q240_SCALE * 1e4 + 0.5) / 1e4
    e1, v = e1s / _Q240_SCALE, vs / _Q240_SCALE
    chi = (o1 - e1) ** 2 / v
    assert r.chi2 == floor(chi * 1e4 + 0.5) / 1e4
    assert r.reject_5pct == (1 if chi > 3.841459 else 0)


def test_mann_kendall_python_twin(spark, sf_dir, tmp_path):
    """q241 vs brute pairwise signs + tie-corrected variance; plus an
    authored strictly-increasing series that must be significant."""
    from collections import Counter
    from datetime import datetime, timedelta
    from math import floor, sqrt

    from bbc_news_data_pipeline_spark.plans.timeseries_plans import (
        q241_mann_kendall,
    )

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    d0 = pdf.ts.dt.floor("D").min()
    pdf["x"] = (pdf.ts.dt.floor("D") - d0).dt.days
    out = {r.event_type: r for r in q241_mann_kendall(spark, sf_dir).collect()}
    for t, grp in pdf.groupby("event_type"):
        daily = sorted(Counter(grp.x).items())
        ys = [y for _, y in daily]
        s = sum(
            (1 if y2 > y1 else -1 if y2 < y1 else 0)
            for i, y1 in enumerate(ys)
            for y2 in ys[i + 1:]
        )
        n = len(ys)
        ties = Counter(ys)
        var18 = n * (n - 1) * (2 * n + 5) - sum(
            tk * (tk - 1) * (2 * tk + 5) for tk in ties.values()
        )
        r = out[t]
        assert (r.n_days, r.s_stat, r.var18) == (n, s, var18)
        zc = s - 1 if s > 0 else s + 1 if s < 0 else 0
        z = zc / sqrt(var18 / 18)
        assert r.z_score == floor(z * 1e4 + 0.5) / 1e4
        assert r.significant == (1 if abs(z) > 1.959964 else 0)

    t0 = datetime(2024, 7, 1)
    rows, eid = [], 0
    for d in range(12):
        for _ in range(5 + 3 * d):  # strictly increasing
            rows.append((eid, t0 + timedelta(days=d), 1, "up", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    r = q241_mann_kendall(spark, str(tmp_path)).collect()[0]
    assert r.s_stat == 12 * 11 // 2 and r.significant == 1


def test_seasonal_decompose_python_twin(spark, sf_dir, tmp_path):
    """q257 vs statistics.median twins, plus an authored weekly pattern
    where the weekend index and a spike anomaly are forced."""
    from datetime import datetime, timedelta
    from math import floor
    from statistics import median

    from bbc_news_data_pipeline_spark.plans.timeseries_plans import (
        q257_seasonal_decompose,
    )

    pdf = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    pdf["day"] = pdf.ts.dt.floor("D")
    daily = pdf.groupby(["event_type", "day"]).size().reset_index(name="y")
    daily["dow"] = daily.day.dt.dayofweek  # Mon=0
    daily["dow"] = ((daily["dow"] + 1) % 7) + 1  # -> Sun=1..Sat=7 (Spark)
    out = {
        (r.event_type, r.dow): r
        for r in q257_seasonal_decompose(spark, sf_dir).collect()
    }
    for t, grp in daily.groupby("event_type"):
        med_all = median(grp.y)
        resid = {
            dow: [y - median(g.y) for y in g.y]
            for dow, g in grp.groupby("dow")
        }
        mad = median(abs(r) for rs in resid.values() for r in rs)
        for dow, g in grp.groupby("dow"):
            r = out[(t, dow)]
            md = median(g.y)
            assert r.n_days == len(g)
            assert r.med_dow == floor(md * 1e6 + 0.5) / 1e6
            assert r.med_all == floor(med_all * 1e6 + 0.5) / 1e6
            assert r.seasonal_idx == floor(md / med_all * 1e6 + 0.5) / 1e6
            assert r.n_anom == sum(1 for x in resid[dow] if abs(x) > 3 * mad)

    # authored: 4 weeks, weekdays 10/day, sundays 30/day, one 200-spike
    t0 = datetime(2024, 9, 2)  # a Monday
    rows, eid = [], 0
    for d in range(28):
        day = t0 + timedelta(days=d)
        n = 30 if day.weekday() == 6 else 10
        if d == 10:
            n = 200  # spike on a weekday
        for _ in range(n):
            rows.append((eid, day, 1, "aa", 1.0, "{}"))
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    got = {r.dow: r for r in q257_seasonal_decompose(spark, str(tmp_path)).collect()}
    assert got[1].seasonal_idx == 3.0  # Sunday: 30 vs overall median 10
    assert sum(r.n_anom for r in got.values()) == 1  # exactly the spike


def test_markov_attribution_python_twin(spark, sf_dir):
    """q272 vs a from-first-principles removal-effect twin: journeys
    split at purchases, exact transition counts with absorbing
    self-loops, K propagation steps on the 1e-9 integer lattice, 4dp
    removal effects and cents-grid attribution — bit-for-bit."""
    import math
    from collections import defaultdict

    from bbc_news_data_pipeline_spark.plans.timeseries_plans import (
        _Q272_K,
        _Q272_SCALE,
        q272_markov_attribution,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )
    by_user = defaultdict(list)
    for r in rows:
        by_user[r.user_id].append((r.ts, r.event_id, r.event_type, r.value))
    trans = defaultdict(int)
    total_cents = 0
    for _, evs in by_user.items():
        evs.sort(key=lambda t: (t[0], t[1]))
        prev = "START"
        for _, _, et, v in evs:
            s = "CONV" if et == "purchase" else et
            if et == "purchase":
                total_cents += math.floor(v * 100 + 0.5)
            trans[(prev, s)] += 1
            prev = "START" if s == "CONV" else s
        if prev != "START":
            trans[(prev, "NULL")] += 1
    trans[("CONV", "CONV")] += 1
    trans[("NULL", "NULL")] += 1
    ns = defaultdict(int)
    for (s, _), n in trans.items():
        ns[s] += n
    channels = sorted(
        {t for (_, t) in trans if t not in ("CONV", "NULL", "START")}
    )

    def pconv(removed):
        p = {"START": _Q272_SCALE}
        for _ in range(_Q272_K):
            p2 = defaultdict(int)
            for (s, t), n in trans.items():
                if t == removed or s not in p:
                    continue
                p2[t] += math.floor(p[s] * n / ns[s])
            p = dict(p2)
        return p.get("CONV", 0)

    bp = pconv(None)
    re4 = {
        c: math.floor(max(0.0, 1.0 - pconv(c) / bp) * 10000 + 0.5)
        for c in channels
    }
    ssum = sum(re4.values())
    out = {r.channel: r for r in q272_markov_attribution(spark, sf_dir).collect()}
    assert sorted(out) == channels
    for c in channels:
        r = out[c]
        assert r.pconv_removed == round(pconv(c) / _Q272_SCALE, 6)
        assert r.removal_effect == re4[c] / 10000.0
        assert r.base_pconv == round(bp / _Q272_SCALE, 6)
        assert r.attributed_value == math.floor(total_cents * re4[c] / ssum) / 100
    # the removal effects are substantial (every channel gates some
    # journeys) and the base chain converts most journeys within K steps
    assert all(out[c].removal_effect > 0 for c in channels)
    assert 0 < out[channels[0]].base_pconv <= 1
