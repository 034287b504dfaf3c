"""events loader format drift: the physical type of events.ts has changed
between testdata generations (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)), and
assuming either one silently broke 32 queries in round 2. load() must
detect the READ dtype and normalize every format to session-TZ TIMESTAMP
with identical wall-clock values."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bbc_news_data_pipeline_spark.sources.tables import load

TS_US = [
    datetime.datetime(2024, 3, 1, 12, 0, 0, 123456),
    datetime.datetime(2024, 3, 2, 23, 59, 59, 999999),
    datetime.datetime(2024, 7, 15, 0, 0, 0, 1),
]


def _events_table(unit: str) -> pa.Table:
    return pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(TS_US, pa.timestamp(unit)),
            "user_id": pa.array([10, 11, 12], pa.int64()),
            "event_type": pa.array(["click", "view", "error"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )


@pytest.mark.parametrize("unit", ["us", "ns", "ms"])
def test_load_normalizes_every_ts_physical_format(spark, tmp_path, unit):
    d = tmp_path / unit
    d.mkdir()
    pq.write_table(_events_table(unit), d / "events.parquet")
    df = load(spark, str(d), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(r.ts for r in df.select("ts").collect())
    # wall-clock values identical under the UTC session (ms data has its
    # sub-millisecond digits truncated at WRITE time by pyarrow)
    expected = sorted(
        t.replace(microsecond=(t.microsecond // 1000) * 1000) if unit == "ms" else t
        for t in TS_US
    )
    assert got == expected


def test_load_rejects_unknown_table(spark, sf_dir):
    with pytest.raises(KeyError):
        load(spark, sf_dir, "nope")


def test_ensure_utc_survives_unset_session_zone(spark):
    """Spark 4 validates the FALLBACK value of conf.get when the key is
    unset — so on a truly plain session (driver harness, no zone ever
    set) a bare conf.get(key, "") throws INVALID_CONF_VALUE. The guard
    must treat that as "not UTC" and pin the zone, not crash."""
    from bbc_news_data_pipeline_spark.sources.tables import _ensure_utc_session

    before = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.unset("spark.sql.session.timeZone")
        _ensure_utc_session(spark)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    finally:
        spark.conf.set("spark.sql.session.timeZone", before)
