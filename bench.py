"""Benchmark harness — the driver runs this per-round and records
BENCH_r{N}.json; we run it at sf0.01/sf0.1 while iterating.

Runs the headline ("bench"-tagged) queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing uses the `noop` sink so the FULL plan executes (a bare .count()
would let Catalyst prune expensive projections like the cleaning chain)
without driver-side collection cost dominating.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bbc_news_data_pipeline_spark import get_spark
from bbc_news_data_pipeline_spark.plans import all_queries

# Quiet-machine reference value for the calibration probe (the round-5
# committed baseline run, see SCALE.md): each BENCH artifact rescales its
# own timings by (REF / this run's calibration) into `queries_norm` /
# `value_norm`, so artifacts from different rounds/machines compare
# DIRECTLY — no re-deriving the calibration ratio (the r5 lesson: the
# same code read 1.20x on the driver box and 0.91x on a quiet rerun;
# both were ~1.0x normalized). The constant's absolute value is
# arbitrary (it only anchors the unit); never change it once artifacts
# exist, or cross-round normalized comparisons silently re-scale.
CALIBRATION_REF_SEC = 0.182


def _calibration_sec(spark, sf_dir: str) -> float:
    """Fixed machine-speed probe: full lineitem scan + row-local arithmetic
    + one global sum. Deliberately shuffle-free and plan-trivial, so its
    round-over-round ratio measures AMBIENT HOST SPEED (co-tenant load,
    CPU throttling), not any code in this repo — tools/bench_compare.py
    divides per-query ratios by it to separate real plan regressions from
    machine noise (the r4 lesson: a 1.27x apparent regression was
    co-tenant load). MEDIAN of 5 (not min of 3): the probe is a
    denominator, and a one-off lucky 0.2s sample against a typical 0.3s
    would skew every normalized ratio by 1.5x — robustness beats
    best-case here."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    samples = []
    for _ in range(5):
        t0 = time.perf_counter()
        df.select(
            F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")))
        ).collect()
        samples.append(time.perf_counter() - t0)
    return round(sorted(samples)[2], 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench", driver_memory=os.environ.get("SPARK_DRIVER_MEMORY", "32g"))

    bench_queries = [q for q in all_queries() if "bench" in q.tags]

    # JVM/codegen warmup on a trivial action so q1 isn't charged for startup.
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    calibration = _calibration_sec(spark, sf_dir)

    # Three timed runs per query, report the min: run 1 pays one-time JVM
    # codegen/JIT compilation for that plan shape; the min of the rest is
    # the steady state a long-lived cluster session delivers, and a third
    # sample halves the odds a co-tenant CPU burst (see loadavg_1m)
    # pollutes every sample of a query.
    timings: dict[str, float] = {}
    for q in bench_queries:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[q.name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    scale = CALIBRATION_REF_SEC / calibration if calibration > 0 else 1.0
    queries_norm = {k: round(v * scale, 3) for k, v in timings.items()}
    value_norm = round(sum(queries_norm.values()), 3)
    # Ambient load on the shared host — context for round-over-round
    # comparisons (a loadavg of 2+ from co-tenants inflates every number
    # ~20-40%; per-query times at sf0.1 are dominated by fixed local-mode
    # overhead, not data volume).
    try:
        loadavg = round(os.getloadavg()[0], 2)
    except OSError:
        loadavg = None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "runs_per_query": 3,
                "agg": "min",
                "loadavg_1m": loadavg,
                "calibration_sec": calibration,
                "calibration_ref_sec": CALIBRATION_REF_SEC,
                "value_norm": value_norm,
                "queries_norm": queries_norm,
            }
        )
    )
    # Compact summary AFTER the full record: a bounded tail capture of this
    # output (the r6 artifact sliced mid-JSON and lost calibration_sec /
    # value_norm, which print before the big per-query dicts) always
    # retains the fields cross-round comparison needs.
    top10 = dict(
        sorted(queries_norm.items(), key=lambda kv: kv[1], reverse=True)[:10]
    )
    print(
        json.dumps(
            {
                "metric": "headline_summary_compact",
                "sf": sf,
                "n_queries": len(timings),
                "value": total,
                "value_norm": value_norm,
                "calibration_sec": calibration,
                "calibration_ref_sec": CALIBRATION_REF_SEC,
                "loadavg_1m": loadavg,
                "top10_slowest_norm": top10,
            }
        )
    )


if __name__ == "__main__":
    main()
