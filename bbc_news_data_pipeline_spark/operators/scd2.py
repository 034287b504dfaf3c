"""SCD2 (slowly-changing-dimension type 2) snapshot maintenance.

q154 BUILDS an SCD2 history from an event stream and q162 joins a fact
table against it as-of; this module adds the third leg of the warehouse
family — the nightly MAINTENANCE op: apply a new full snapshot of a
dimension to an existing SCD2 history, closing the intervals of keys
whose tracked attribute changed or disappeared and opening new current
intervals for changed/new keys (the Kimball type-2 "close and open"
rule).

Semantics (full-snapshot, half-open [valid_from, valid_to) DATE
intervals, valid_to NULL = current):

  * key in history-current and snapshot, attr EQUAL   → carry (no-op)
  * key in both, attr CHANGED                          → close @ snap_date
                                                         + open @ snap_date
  * key current in history, ABSENT from snapshot       → close @ snap_date
  * key in snapshot only (new, or re-appearing after a
    deletion — no current row either way)              → open @ snap_date
  * already-closed history rows                        → untouched

Two forms:

  * :func:`scd2_apply` — pure DataFrame algebra (history' from history +
    snapshot); ONE full outer join on the key + unions, no window. This
    is what the q168 oracle certifies against a rebuild-from-union.
  * :func:`scd2_apply_table` — the disk path: the CHANGE SET (closes +
    opens only — carries and closed rows are never rewritten) is upserted
    through ``sources/sinks.py:merge_upsert``'s partition-scoped
    machinery, keyed by the surrogate ``row_key = key:valid_from`` and
    partitioned by a stable md5 bucket of the key (which satisfies
    merge_upsert's ENFORCED partition-stability contract: a dimension
    key's close and open rows land in the same partition forever).

Scale shape: the apply is one shuffle (outer join current-vs-snapshot on
the key; both sides are |dimension|, not |facts|); the table write is
O(affected partitions) via dynamic partition overwrite. Applying the
same snapshot twice is a no-op (idempotent): after the first apply every
snapshot key's current attr equals the snapshot attr, so the change set
is empty.

Refusal: two DIFFERENT attrs for one key at the SAME snap_date (a
same-day flip after an apply already opened that key at snap_date) would
need a zero-length interval plus a row_key collision — merge_upsert's
duplicate-key refusal surfaces it loudly; one apply per key per date.

Reference lineage: the reference's closest shape is the re-crawl
snapshot skip (pipelines.py:38-44) — SURVEY ST5's MERGE design decision;
SCD2 is the warehouse-grade version that keeps the superseded values
queryable (q162's as-of join consumes exactly this layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .curation import sample_key_expr
from ..sources.sinks import merge_upsert, recover_merge, table_exists

HISTORY_COLS = ("valid_from", "valid_to")


def _change_sets(
    current: DataFrame, snapshot: DataFrame, key: str, attr: str, snap_date: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(carries, closes, opens) from the current intervals vs the
    snapshot. Presence is tracked with marker columns so NULL attrs
    classify correctly (eqNullSafe)."""
    d = F.lit(snap_date).cast("date")
    cur = current.withColumn("_in_cur", F.lit(1))
    snap = snapshot.select(
        F.col(key), F.col(attr).alias("_snap_attr")
    ).withColumn("_in_snap", F.lit(1))
    j = cur.join(snap, key, "full")
    in_cur = F.col("_in_cur").isNotNull()
    in_snap = F.col("_in_snap").isNotNull()
    same = F.col(attr).eqNullSafe(F.col("_snap_attr"))
    carries = j.filter(in_cur & in_snap & same).select(
        key, attr, "valid_from", "valid_to"
    )
    closes = j.filter(in_cur & (~in_snap | ~same)).select(
        key, attr, "valid_from", d.alias("valid_to")
    )
    opens = j.filter(in_snap & (~in_cur | ~same)).select(
        key,
        F.col("_snap_attr").alias(attr),
        d.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    return carries, closes, opens


def scd2_apply(
    history: DataFrame, snapshot: DataFrame, key: str, attr: str, snap_date: str
) -> DataFrame:
    """Pure-algebra snapshot apply: returns the full updated history
    (columns ``key, attr, valid_from, valid_to``). ``history`` must
    carry exactly those columns; ``snapshot`` carries (key, attr)."""
    closed = history.filter(F.col("valid_to").isNotNull()).select(
        key, attr, "valid_from", "valid_to"
    )
    current = history.filter(F.col("valid_to").isNull())
    carries, closes, opens = _change_sets(current, snapshot, key, attr, snap_date)
    return closed.unionByName(carries).unionByName(closes).unionByName(opens)


def _with_table_cols(df: DataFrame, key: str, n_buckets: int) -> DataFrame:
    """Surrogate row key + stable partition bucket for the disk layout."""
    return df.withColumn(
        "row_key",
        F.concat(F.col(key).cast("string"), F.lit(":"), F.col("valid_from").cast("string")),
    ).withColumn("p", (sample_key_expr(F.col(key), salt="scd2p") % n_buckets))


def scd2_init_table(
    spark: SparkSession,
    snapshot: DataFrame,
    path: str,
    key: str,
    attr: str,
    snap_date: str,
    n_buckets: int = 16,
) -> dict:
    """Materialize the initial history (every snapshot row open at
    ``snap_date``) through merge_upsert's create branch."""
    d = F.lit(snap_date).cast("date")
    hist = snapshot.select(
        key,
        F.col(attr),
        d.alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    return merge_upsert(
        spark, _with_table_cols(hist, key, n_buckets), path, "row_key",
        partition_col="p",
    )


def scd2_apply_table(
    spark: SparkSession,
    snapshot: DataFrame,
    path: str,
    key: str,
    attr: str,
    snap_date: str,
    n_buckets: int = 16,
) -> dict:
    """Disk-path snapshot apply: upsert ONLY the change set (closes
    update their stored row in place — same ``row_key``; opens insert)
    through the partition-scoped merge. Carries and closed history are
    never rewritten, so a snapshot touching k keys costs O(k's
    partitions), not O(history). Returns merge_upsert's stats dict.

    Uniform entry point for a streaming ``foreachBatch`` sink: repairs
    any crash-stranded swap BEFORE probing existence (the merge_upsert
    ordering lesson), self-initializes when the table does not exist
    yet, and REFUSES a snapshot older than the newest stored interval —
    snapshots must apply in date order; an out-of-order apply would
    close intervals backwards in time. Equality is allowed (re-applying
    the current snapshot is the idempotent no-op replay takes)."""
    recover_merge(path)
    if not table_exists(spark, path):
        return scd2_init_table(spark, snapshot, path, key, attr, snap_date,
                               n_buckets=n_buckets)
    hist = spark.read.parquet(path)
    newest = hist.agg(F.max("valid_from")).first()[0]
    if newest is not None and str(newest) > snap_date:
        raise ValueError(
            f"snapshot {snap_date} is older than the newest stored "
            f"interval ({newest}) — SCD2 snapshots must apply in date order"
        )
    current = hist.filter(F.col("valid_to").isNull()).select(
        key, attr, "valid_from", "valid_to"
    )
    _, closes, opens = _change_sets(current, snapshot, key, attr, snap_date)
    batch = closes.unionByName(opens)
    return merge_upsert(
        spark, _with_table_cols(batch, key, n_buckets), path, "row_key",
        partition_col="p",
    )
