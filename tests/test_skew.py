"""Salting operators: two-phase skewed aggregation and salted join must
equal their plain equivalents (operators/skew.py)."""

import pytest
from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.operators.skew import (
    salted_broadcast_join,
    salted_count,
    salted_sum,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # zipfian: one hot key with 5000 rows, a cold tail of 50 keys
    hot = spark.range(5000).select(
        F.lit("hot").alias("k"), (F.col("id") % 7).cast("double").alias("v")
    )
    tail = spark.range(50).select(
        F.concat(F.lit("cold"), F.col("id")).alias("k"), F.lit(1.0).alias("v")
    )
    return hot.unionAll(tail)


def test_salted_count_equals_plain(spark, skewed):
    plain = {r.k: r.n for r in skewed.groupBy("k").agg(F.count("*").alias("n")).collect()}
    salted = {r.k: r.n for r in salted_count(skewed, ["k"]).collect()}
    assert salted == plain
    assert salted["hot"] == 5000


def test_salted_sum_equals_plain(spark, skewed):
    plain = {r.k: r.s for r in skewed.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    salted = {r.k: r.total for r in salted_sum(skewed, ["k"], "v").collect()}
    assert set(salted) == set(plain)
    assert all(abs(salted[k] - plain[k]) < 1e-9 for k in plain)


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold0", "C0"), ("cold1", "C1")], "k string, label string"
    )
    plain = (
        skewed.join(dim, "k").groupBy("k", "label").agg(F.count("*").alias("n"))
    )
    salted = (
        salted_broadcast_join(skewed, dim, on="k", n_salts=8)
        .groupBy("k", "label")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bounded_sessionize_equals_naive_on_hot_user(spark):
    """One user owns 50% of events (the AQE-unfixable window-skew case):
    the two-level (user, day)-bounded operator must produce exactly the
    naive full-history lag sessionization — including sessions that span
    midnight, back-to-back days, and multi-day absences."""
    from pyspark.sql import Window as W

    from bbc_news_data_pipeline_spark.operators.timeseries import bounded_sessionize

    rows = []
    eid = 0
    # hot user 1: an event every 20 min for 5 days straight (sessions chain
    # across midnight → exactly 1 session), then a 3-day gap, then a burst.
    t0 = 1_700_000_000  # epoch seconds anchor
    for i in range(5 * 72):  # 72 events/day, 20-min spacing
        rows.append((eid, t0 + i * 1200, 1)); eid += 1
    burst0 = t0 + 8 * 86400
    for i in range(180):  # second burst: gaps alternate 10 min / 40 min
        step = 600 if i % 2 == 0 else 2400
        burst0 += step
        rows.append((eid, burst0, 1)); eid += 1
    # cold tail: 50 users, a few events each, some exactly at midnight ± gap
    for u in range(2, 52):
        base = t0 + (u * 3571) % 86400
        for j in range(7):
            rows.append((eid, base + j * 1799, u)); eid += 1  # just under gap
        rows.append((eid, base + 7 * 1799 + 1801, u)); eid += 1  # just over
    ev = spark.createDataFrame(
        [(e, t, u) for e, t, u in rows], "event_id long, sec long, user_id long"
    ).select("event_id", F.timestamp_seconds("sec").alias("ts"), "user_id")

    naive_w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(naive_w))
    naive = (
        ev.withColumn("is_new", F.when(gap > 1800, 1).otherwise(0))
        .groupBy("user_id")
        .agg(
            (F.sum("is_new") + 1).cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )
    bounded = bounded_sessionize(ev, gap_s=1800)
    n = {r.user_id: (r.n_sessions, r.n_events) for r in naive.collect()}
    b = {r.user_id: (r.n_sessions, r.n_events) for r in bounded.collect()}
    assert b == n
    # chain = 1 session; burst = 1 (new after 3-day gap) + 90 (the 2400 s
    # gaps at odd i, each > 1800) = 91; total 92.
    assert b[1][0] == 92


def test_salt_is_deterministic_under_recompute(spark, skewed):
    from bbc_news_data_pipeline_spark.operators.skew import with_salt

    s = with_salt(skewed, n_salts=8)
    a = s.groupBy("_salt").count().collect()
    b = s.groupBy("_salt").count().collect()  # forces full recompute
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert all(0 <= r._salt < 8 for r in a)


def test_bounded_transition_pairs_equal_naive_lead(spark):
    """q77's two-level consecutive-pair extraction (user-day fold +
    day-boundary lag) must reproduce the naive full-history lead window
    exactly — including midnight-spanning transitions and a hot user."""
    from datetime import datetime, timedelta

    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rng = random.Random(7)
    t0 = datetime(2024, 3, 1)
    rows, eid = [], 0
    for i in range(400):  # hot user 1: spans several days incl. 23:59->00:01
        rows.append((eid, 1, t0 + timedelta(minutes=17 * i), rng.choice("abc")))
        eid += 1
    for u in range(2, 12):
        for j in range(rng.randint(1, 6)):
            rows.append((eid, u, t0 + timedelta(hours=u, minutes=29 * j), rng.choice("abc")))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, event_type string")

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    naive = (
        ev.select("event_type", F.lead("event_type").over(w).alias("to_type"))
        .filter(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count("*").alias("n"))
    )
    want = {(r.from_type, r.to_type): r.n for r in naive.collect()}

    import tempfile

    from bbc_news_data_pipeline_spark.plans.quality_plans import q77_transition_matrix

    with tempfile.TemporaryDirectory() as tmp:
        ev.write.parquet(f"{tmp}/events.parquet")
        got = {
            (r.from_type, r.to_type): r.n
            for r in q77_transition_matrix(spark, tmp).collect()
        }
    assert got == want


def test_exclusive_prefix_sum_equals_naive_window(spark):
    """The two-phase parallel prefix sum (q68's round-5 shape) must equal
    the naive full-partition running-sum window exactly — including a hot
    partition holding ~90% of rows, sparse/non-contiguous ids, and a
    partition smaller than one block."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from bbc_news_data_pipeline_spark.operators.skew import exclusive_prefix_sum

    rng = random.Random(11)
    rows = []
    # hot partition "en": 2000 rows, ids sparse with gaps
    next_id = 0
    for _ in range(2000):
        next_id += rng.randint(1, 7)
        rows.append(("en", next_id, rng.randint(0, 500)))
    # small partitions, one below block size
    for part, n in (("fr", 150), ("de", 40), ("xx", 3)):
        for _ in range(n):
            next_id += rng.randint(1, 9)
            rows.append((part, next_id, rng.randint(0, 500)))
    df = spark.createDataFrame(rows, "lang string, doc_id long, v long")

    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    naive = df.select(
        "lang", "doc_id", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("want")
    )
    # equivalence must hold at every recursion depth: 1 (single offset
    # window), 2 (default), 3 (block-of-blocks — with block 8 over
    # ~14k id range all three levels genuinely engage)
    for levels, blk in ((1, 64), (2, 64), (3, 8)):
        got = exclusive_prefix_sum(
            df, "lang", "doc_id", "v", block_size=blk, levels=levels
        )
        joined = got.join(naive, ["lang", "doc_id"])
        assert joined.count() == len(rows), (levels, blk)
        bad = joined.filter(F.col("_prefix") != F.col("want")).count()
        assert bad == 0, (levels, blk, bad)


def test_transition_pairs_null_event_type_at_day_boundary(spark):
    """A NULL-typed event ENDING a day must still contribute its
    (null -> first-of-next-day) boundary pair, exactly as the naive lead
    window does — the r4 ADVICE case: filtering the boundary branch on
    _prev_last's nullness conflated 'no previous day' with 'previous day
    ended in a null-typed event'. Null predecessors in-day are kept too;
    null SUCCESSORS drop the pair on both paths."""
    from datetime import datetime

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    d = datetime
    rows = [
        # user 1: day1 = [a, NULL] (null last-of-day), day2 = [b, c]
        (0, 1, d(2024, 3, 1, 10), "a"),
        (1, 1, d(2024, 3, 1, 23), None),
        (2, 1, d(2024, 3, 2, 1), "b"),
        (3, 1, d(2024, 3, 2, 2), "c"),
        # user 2: in-day null in the middle, and a null FIRST-of-day
        (4, 2, d(2024, 3, 1, 9), "x"),
        (5, 2, d(2024, 3, 1, 10), None),
        (6, 2, d(2024, 3, 1, 11), "y"),
        (7, 2, d(2024, 3, 2, 9), None),
        (8, 2, d(2024, 3, 2, 10), "x"),
        # user 3: every event null-typed across two days
        (9, 3, d(2024, 3, 1, 5), None),
        (10, 3, d(2024, 3, 2, 5), None),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    naive = (
        ev.select("event_type", F.lead("event_type").over(w).alias("to_type"))
        .filter(F.col("to_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"), "to_type")
        .agg(F.count("*").alias("n"))
    )
    want = {(r.from_type, r.to_type): r.n for r in naive.collect()}
    assert (None, "b") in want  # the day-boundary null-predecessor pair

    import tempfile

    from bbc_news_data_pipeline_spark.plans.quality_plans import q77_transition_matrix

    with tempfile.TemporaryDirectory() as tmp:
        ev.write.parquet(f"{tmp}/events.parquet")
        got = {
            (r.from_type, r.to_type): r.n
            for r in q77_transition_matrix(spark, tmp).collect()
        }
    assert got == want


def test_q182_equality_flags_hold_on_real_data(spark, sf_dir):
    """q182's in-output certification: every equality flag must be True
    on real testdata (the salted rewrite is invisible in results), and
    the physical plan of the salted path must carry the two-phase shape
    (a (key, salt) partial exchange before the per-key merge)."""
    from bbc_news_data_pipeline_spark.plans.quality_plans import (
        q182_salted_aggregation,
    )
    from bbc_news_data_pipeline_spark.operators.skew import salted_count

    rows = q182_salted_aggregation(spark, sf_dir).collect()
    assert rows and all(r.count_equal and r.sum_equal for r in rows)
    assert all(r.n_salted == r.n_direct for r in rows)

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_type")
    plan = salted_count(ev, ["event_type"])._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan  # partial phase genuinely keys on (key, salt)


def test_exclusive_prefix_max_equals_naive_window(spark):
    """exclusive_prefix_max must equal the naive running-max window at
    every recursion depth — same adversarial layout as the sum twin
    (hot partition, sparse ids, sub-block partition), plus NULL
    semantics: the first row of each partition has no predecessor."""
    import random

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from bbc_news_data_pipeline_spark.operators.skew import exclusive_prefix_max

    rng = random.Random(17)
    rows = []
    next_id = 0
    for _ in range(2000):
        next_id += rng.randint(1, 7)
        rows.append(("en", next_id, rng.randint(0, 10_000)))
    for part, n in (("fr", 150), ("de", 40), ("xx", 3)):
        for _ in range(n):
            next_id += rng.randint(1, 9)
            rows.append((part, next_id, rng.randint(0, 10_000)))
    df = spark.createDataFrame(rows, "lang string, doc_id long, v long")

    w = W.partitionBy("lang").orderBy("doc_id").rowsBetween(W.unboundedPreceding, -1)
    naive = df.select("lang", "doc_id", F.max("v").over(w).alias("want"))
    for levels, blk in ((1, 64), (2, 64), (3, 8)):
        got = exclusive_prefix_max(
            df, "lang", "doc_id", "v", block_size=blk, levels=levels
        )
        joined = got.join(naive, ["lang", "doc_id"])
        assert joined.count() == len(rows), (levels, blk)
        bad = joined.filter(
            ~(
                (F.col("_pmax") == F.col("want"))
                | (F.col("_pmax").isNull() & F.col("want").isNull())
            )
        ).count()
        assert bad == 0, (levels, blk, bad)
