"""operators/scd2.py: SCD2 snapshot-apply maintenance — chained applies
equal a rebuild-from-union, idempotent re-apply, the merge_upsert-backed
disk path, deletion/re-appearance, and the same-date-flip refusal."""


import pytest
from pyspark.sql import functions as F

from bbc_news_data_pipeline_spark.operators.scd2 import (
    scd2_apply,
    scd2_apply_table,
    scd2_init_table,
)

SNAP_SCHEMA = "k long, attr string"


def _snap(spark, rows):
    return spark.createDataFrame(rows, SNAP_SCHEMA)


def _none_safe(rows):
    return sorted(rows, key=lambda t: tuple("" if x is None else str(x) for x in t))


def _hist_rows(df):
    return _none_safe(
        (r.k, r.attr, str(r.valid_from), str(r.valid_to) if r.valid_to else None)
        for r in df.collect()
    )


def _rebuild_from_union(snapshots):
    """Independent reference: per-key timeline over ALL snapshots →
    half-open intervals (close on change or disappearance, reopen on
    re-appearance)."""
    keys = {k for _, snap in snapshots for k in snap}
    out = []
    for k in sorted(keys):
        open_row = None  # (attr, from)
        for date, snap in snapshots:
            if k in snap:
                if open_row is None:
                    open_row = (snap[k], date)
                elif snap[k] != open_row[0]:
                    out.append((k, open_row[0], open_row[1], date))
                    open_row = (snap[k], date)
            elif open_row is not None:
                out.append((k, open_row[0], open_row[1], date))
                open_row = None
        if open_row is not None:
            out.append((k, open_row[0], open_row[1], None))
    return _none_safe(out)


SNAPSHOTS = [
    ("2024-01-01", {1: "A", 2: "B", 3: "C", 5: "E"}),
    # 1 carries, 2 changes, 3 disappears, 4 is new
    ("2024-02-01", {1: "A", 2: "B2", 4: "D", 5: "E"}),
    # 3 re-appears (with a new value), 5 disappears, 2 changes again
    ("2024-03-01", {1: "A", 2: "B3", 3: "C2", 4: "D"}),
]


def _apply_chain(spark, snapshots):
    d0, s0 = snapshots[0]
    hist = _snap(spark, sorted(s0.items())).select(
        "k",
        "attr",
        F.lit(d0).cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    for date, snap in snapshots[1:]:
        hist = scd2_apply(hist, _snap(spark, sorted(snap.items())), "k", "attr", date)
    return hist


def test_chained_applies_equal_rebuild_from_union(spark):
    hist = _apply_chain(spark, SNAPSHOTS)
    assert _hist_rows(hist) == _rebuild_from_union(SNAPSHOTS)


def test_apply_is_idempotent(spark):
    hist = _apply_chain(spark, SNAPSHOTS)
    date, snap = SNAPSHOTS[-1]
    again = scd2_apply(hist, _snap(spark, sorted(snap.items())), "k", "attr", date)
    assert _hist_rows(again) == _hist_rows(hist)


def test_reappearing_key_gets_fresh_interval(spark):
    rows = _rebuild_from_union(SNAPSHOTS)
    k3 = [r for r in rows if r[0] == 3]
    assert k3 == [
        (3, "C", "2024-01-01", "2024-02-01"),
        (3, "C2", "2024-03-01", None),
    ]
    hist = _apply_chain(spark, SNAPSHOTS)
    assert [r for r in _hist_rows(hist) if r[0] == 3] == k3


def test_table_path_matches_pure_algebra(spark, tmp_path):
    path = str(tmp_path / "dim")
    d0, s0 = SNAPSHOTS[0]
    stats = scd2_init_table(spark, _snap(spark, sorted(s0.items())), path,
                            "k", "attr", d0, n_buckets=4)
    assert stats["inserted"] == len(s0)
    for date, snap in SNAPSHOTS[1:]:
        scd2_apply_table(spark, _snap(spark, sorted(snap.items())), path,
                         "k", "attr", date, n_buckets=4)
    got = _hist_rows(spark.read.parquet(path).drop("row_key", "p"))
    assert got == _rebuild_from_union(SNAPSHOTS)

    # idempotent re-apply on disk: empty change set, content identical
    date, snap = SNAPSHOTS[-1]
    stats = scd2_apply_table(spark, _snap(spark, sorted(snap.items())), path,
                             "k", "attr", date, n_buckets=4)
    assert stats == {"inserted": 0, "updated": 0, "partitions_rewritten": 0}
    assert _hist_rows(spark.read.parquet(path).drop("row_key", "p")) == got


def test_same_date_flip_refused(spark, tmp_path):
    """A second DIFFERENT value for a key at the SAME snap_date would
    need a zero-length interval + a row_key collision — merge_upsert's
    duplicate-key refusal must surface it, not silently pick a winner."""
    path = str(tmp_path / "dim")
    scd2_init_table(spark, _snap(spark, [(1, "A")]), path, "k", "attr",
                    "2024-01-01", n_buckets=2)
    scd2_apply_table(spark, _snap(spark, [(1, "B")]), path, "k", "attr",
                     "2024-02-01", n_buckets=2)
    with pytest.raises(ValueError, match="duplicate"):
        scd2_apply_table(spark, _snap(spark, [(1, "C")]), path, "k", "attr",
                         "2024-02-01", n_buckets=2)


def test_apply_table_refuses_out_of_order_snapshot(spark, tmp_path):
    """Snapshots must apply in date order: an older snapshot arriving
    after a newer one would close intervals backwards in time."""
    path = str(tmp_path / "dim")
    scd2_init_table(spark, _snap(spark, [(1, "A")]), path, "k", "attr",
                    "2024-02-01", n_buckets=2)
    with pytest.raises(ValueError, match="date order"):
        scd2_apply_table(spark, _snap(spark, [(1, "B")]), path, "k", "attr",
                         "2024-01-01", n_buckets=2)


def test_stream_scd2_drain_and_history_replay_refused(spark, tmp_path):
    """Three snapshot micro-batches drain to the rebuild-from-union
    history; replaying HISTORY from scratch (fresh checkpoint) into the
    non-empty table hits the monotonicity guard on the first, oldest
    snapshot — refused loudly, table untouched. (Batch replay within a
    checkpoint is deduped by Spark; re-applying the LATEST snapshot is
    the idempotent no-op tested in test_table_path_matches_pure_algebra.)"""
    import os

    from pyspark.sql import functions as F  # noqa: F811

    from bbc_news_data_pipeline_spark.streaming.scd2 import run_stream_scd2

    src = str(tmp_path / "src")
    table = str(tmp_path / "dim")
    os.makedirs(src)
    for i, (date, snap) in enumerate(SNAPSHOTS):
        rows = [(k, v, date) for k, v in sorted(snap.items())]
        df = spark.createDataFrame(rows, "k long, attr string, snap_date string")
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/stage_{i}")
        import glob
        import shutil

        part = glob.glob(f"{src}/stage_{i}/part-*.parquet")[0]
        shutil.copy(part, f"{src}/snap_{i}.parquet")
        shutil.rmtree(f"{src}/stage_{i}")
        t = os.path.getmtime(f"{src}/snap_{i}.parquet")
        os.utime(f"{src}/snap_{i}.parquet", (t + i, t + i))

    def _stream():
        return (
            spark.readStream.schema("k long, attr string, snap_date string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

    run_stream_scd2(_stream(), table, str(tmp_path / "ckpt"), "k", "attr",
                    "snap_date", n_buckets=4)
    got = _hist_rows(spark.read.parquet(table).drop("row_key", "p"))
    assert got == _rebuild_from_union(SNAPSHOTS)
    # fresh checkpoint = replaying history from scratch: the first batch
    # carries the OLDEST snapshot, older than the newest stored interval
    # — the monotonicity guard refuses before any write
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="date order"):
        run_stream_scd2(_stream(), table, str(tmp_path / "ckpt2"), "k",
                        "attr", "snap_date", n_buckets=4)
    assert _hist_rows(spark.read.parquet(table).drop("row_key", "p")) == got


def test_null_attr_classifies_with_eqnullsafe(spark):
    """NULL attrs: NULL→NULL carries; NULL→value and value→NULL are
    changes (close + open), never silent drops."""
    snaps = [
        ("2024-01-01", {1: None, 2: "X"}),
        ("2024-02-01", {1: None, 2: None}),
    ]
    hist = _apply_chain(spark, snaps)
    assert _hist_rows(hist) == [
        (1, None, "2024-01-01", None),
        (2, None, "2024-02-01", None),
        (2, "X", "2024-01-01", "2024-02-01"),
    ]


def test_unbatched_backfill_replay_refused(spark, tmp_path):
    """A micro-batch carrying thousands of distinct snapshot dates (an
    unbatched backfill replay) must fail loudly with re-ingestion
    guidance — the driver-side date list is LIMIT-bounded, so even the
    probe never materializes the full 10k dates."""
    from bbc_news_data_pipeline_spark.streaming.scd2 import (
        MAX_SNAPSHOTS_PER_BATCH,
        apply_snapshot_batch,
    )

    big = spark.range(10_000).select(
        F.col("id").alias("k"),
        F.lit("A").alias("attr"),
        F.date_format(
            F.date_add(F.lit("2000-01-01").cast("date"), F.col("id").cast("int")),
            "yyyy-MM-dd",
        ).alias("snap_date"),
    )
    assert big.select("snap_date").distinct().count() > MAX_SNAPSHOTS_PER_BATCH
    with pytest.raises(ValueError, match="backfill replay"):
        apply_snapshot_batch(
            big, str(tmp_path / "scd2"), "k", "attr", "snap_date"
        )


def test_bounded_batch_still_applies(spark, tmp_path):
    """Below the cap the batch applies normally (two dates, in order)."""
    from bbc_news_data_pipeline_spark.streaming.scd2 import apply_snapshot_batch

    path = str(tmp_path / "scd2b")
    scd2_init_table(spark, _snap(spark, [(1, "A")]), path, "k", "attr",
                    "2024-01-01", n_buckets=2)
    batch = spark.createDataFrame(
        [(1, "B", "2024-01-02"), (1, "C", "2024-01-03")],
        "k long, attr string, snap_date string",
    )
    stats = apply_snapshot_batch(batch, path, "k", "attr", "snap_date",
                                 n_buckets=2)
    assert len(stats) == 2
    hist = spark.read.parquet(path)
    assert hist.filter(F.col("valid_to").isNull()).select("attr").first()[0] == "C"
