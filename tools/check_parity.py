"""Local mirror of the driver's DuckDB-oracle correctness gate.

Runs every registered query's Spark plan and oracle SQL side-by-side and
compares row count, column names, and exact values (order-insensitive).
Usage:  python tools/check_parity.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            s = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            s = s.astype("Int64")
        elif s.dtype == object:
            s = s.map(lambda v: str(v) if v is not None and v == v else None)
        out[c] = s
    norm = pd.DataFrame(out)
    return norm.sort_values(by=list(norm.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    errs = []
    if len(spark_pdf) != len(oracle_pdf):
        errs.append(f"row count: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        errs.append(f"columns: spark={s_cols} oracle={o_cols}")
        return errs
    if errs:
        return errs
    a, b = normalize(spark_pdf), normalize(oracle_pdf)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) and pd.api.types.is_float_dtype(bv):
            # Bit-for-bit, exactly as sensitive as the driver's value
            # hash: ±0.0 and last-ulp representations differ even though
            # `==` calls them equal (the confirmed q183 r9 signed-zero
            # red slipped through the old `av == bv`). Only NaN==NaN is
            # collapsed (any payload).
            a_bits = av.to_numpy(dtype="float64").view("int64")
            b_bits = bv.to_numpy(dtype="float64").view("int64")
            eq = pd.Series(a_bits == b_bits, index=av.index) | (
                av.isna() & bv.isna()
            )
        else:
            eq = (av.isna() & bv.isna()) | (av.astype(object) == bv.astype(object))
        bad = int((~eq).sum())
        if bad:
            idx = (~eq).idxmax()
            errs.append(f"col {c}: {bad} mismatched values; first at row {idx}: "
                        f"spark={av[idx]!r} oracle={bv[idx]!r}")
    return errs


def main() -> int:
    args = sys.argv[1:]
    # --bare: simulate the external driver — a PLAIN SparkSession with none
    # of get_spark's configs and a hostile non-UTC timezone, consuming the
    # registry through __spark_entry__. Catches session-config assumptions
    # the get_spark path would mask.
    bare = "--bare" in args
    args = [a for a in args if a != "--bare"]
    # --json PATH: also write a per-query machine-readable artifact
    # (PARITY_r{N}.json — the committed full-registry parity record the
    # round-3 verdict asked for, refreshed every round).
    json_path = None
    if "--json" in args:
        i = args.index("--json")
        if i + 1 >= len(args) or args[i + 1].startswith("--"):
            print("usage: --json PATH", file=sys.stderr)
            return 2
        json_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    from bbc_news_data_pipeline_spark.plans import all_queries
    from bbc_news_data_pipeline_spark.sources.tables import TABLES

    if bare:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("parity-check-bare")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
    else:
        from bbc_news_data_pipeline_spark import get_spark

        spark = get_spark("parity-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    records: dict[str, dict] = {}
    for q in all_queries():
        if only and q.name not in only:
            continue
        t0 = time.time()
        rec = records[q.name] = {"status": None, "rows": None, "secs": None, "errs": []}
        try:
            spark_pdf = q.spark(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {q.name}: spark error: {type(e).__name__}: {str(e)[:400]}")
            failures += 1
            rec.update(status="fail", secs=round(time.time() - t0, 1),
                       errs=[f"spark error: {type(e).__name__}: {str(e)[:400]}"])
            continue
        rec["rows"] = len(spark_pdf)
        if q.oracle is None:
            print(f"SKIP-ORACLE {q.name}: rows={len(spark_pdf)} ({time.time()-t0:.1f}s)")
            rec.update(status="skip-oracle", secs=round(time.time() - t0, 1))
            continue
        try:
            oracle_pdf = con.execute(q.oracle).df()
        except Exception as e:
            print(f"FAIL {q.name}: oracle error: {type(e).__name__}: {str(e)[:400]}")
            failures += 1
            rec.update(status="fail", secs=round(time.time() - t0, 1),
                       errs=[f"oracle error: {type(e).__name__}: {str(e)[:400]}"])
            continue
        errs = compare(spark_pdf, oracle_pdf)
        rec["secs"] = round(time.time() - t0, 1)
        if errs:
            failures += 1
            rec.update(status="fail", errs=errs[:6])
            print(f"FAIL {q.name} ({rec['secs']}s)")
            for e in errs[:6]:
                print(f"     {e}")
        else:
            rec["status"] = "ok"
            print(f"OK   {q.name}: rows={len(spark_pdf)} ({rec['secs']}s)")
    print(f"\n{failures} failure(s)")
    if json_path:
        import datetime
        import json as _json
        import subprocess

        try:
            commit = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, cwd=os.path.dirname(__file__),
            ).stdout.strip()
        except OSError:
            commit = None
        ok = sum(1 for r in records.values() if r["status"] == "ok")
        with open(json_path, "w") as f:
            _json.dump(
                {
                    "sf_dir": sf_dir,
                    "bare": bare,
                    "generated_utc": datetime.datetime.now(
                        datetime.timezone.utc
                    ).isoformat(timespec="seconds"),
                    "commit": commit,
                    "n_queries": len(records),
                    "n_ok": ok,
                    "n_fail": failures,
                    "queries": records,
                },
                f,
                indent=1,
            )
        print(f"wrote {json_path}: {ok}/{len(records)} ok")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
