"""Compare two bench JSON records per query, load-aware and
calibration-normalized.

Usage:
  python tools/bench_compare.py BENCH_r03.json BENCH_r04.json
  python tools/bench_compare.py BENCH_r03.json '{"queries": {...}}'

Accepts either the driver's wrapper shape ({"parsed": {...}}) or bench.py's
raw line. Prints per-query ratios (new/old), the comparable-subset totals
(queries present in BOTH runs), and each run's loadavg — ambient co-tenant
load swings sub-second local-mode queries 20-40%, so read ratios against
the loadavg delta before calling anything a regression (see SCALE.md).

When BOTH records carry "calibration_sec" (bench.py r5+: a fixed
shuffle-free lineitem scan+sum timed with the same protocol), ratios are
ALSO reported normalized by the calibration ratio — the calibration query
never changes, so its drift is pure machine speed and dividing it out
isolates real plan movement. A normalized ratio near 1.0 under a hot
loadavg is noise, not regression.
"""

from __future__ import annotations

import json
import sys


def _load(arg: str) -> dict:
    try:
        rec = json.loads(arg)
    except ValueError:
        with open(arg) as f:
            text = f.read()
        try:
            rec = json.loads(text)
        except ValueError:
            # bench.py r7+ prints TWO lines (full record, then a compact
            # summary so tail captures keep the headline numbers): prefer
            # the line carrying per-query timings, else the last parsable.
            rec = _best_json_line(text)
            if rec is None:
                raise
    if rec.get("parsed") is not None:
        rec = rec["parsed"]
    elif "tail" in rec and "queries" not in rec:
        # driver wrapper whose full-record parse was truncated: the compact
        # summary line (bench.py r7+) prints LAST, so the tail retains it.
        salvaged = _best_json_line(rec["tail"])
        if salvaged is not None:
            rec = salvaged
    return rec


def _best_json_line(text: str) -> dict | None:
    """Last parsable JSON object line, preferring one with per-query
    timings (bench.py prints the full record, then the compact summary)."""
    rec = None
    for line in text.splitlines():
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            cand = json.loads(line)
        except ValueError:
            continue
        if "queries" in cand:
            rec = cand
            break
        rec = cand
    return rec


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    print(f"old: total={old.get('value')}s loadavg={old.get('loadavg_1m')}  "
          f"new: total={new.get('value')}s loadavg={new.get('loadavg_1m')}")

    cal_o, cal_n = old.get("calibration_sec"), new.get("calibration_sec")
    cal_ratio = None
    if cal_o and cal_n:
        cal_ratio = cal_n / cal_o
        print(f"calibration: {cal_o:.3f}s -> {cal_n:.3f}s  x{cal_ratio:.2f} "
              f"(machine-speed drift; normalized ratios divide this out)")
    else:
        missing = [lbl for lbl, c in (("old", cal_o), ("new", cal_n)) if not c]
        print(f"calibration: absent in {'/'.join(missing)} record(s) — "
              f"raw ratios only")

    # Prefer pre-normalized values (bench.py r6+: each artifact rescales
    # itself to the fixed CALIBRATION_REF_SEC machine speed) — then the
    # ratios below are directly machine-independent and no further
    # per-ratio correction applies.
    if (
        "queries_norm" in old
        and "queries_norm" in new
        and old.get("calibration_ref_sec") == new.get("calibration_ref_sec")
    ):
        oq, nq = old["queries_norm"], new["queries_norm"]
        cal_ratio = None
        print(f"comparing PRE-NORMALIZED values (ref "
              f"{new.get('calibration_ref_sec')}s probe): "
              f"norm totals {old.get('value_norm')}s -> {new.get('value_norm')}s")
    else:
        oq, nq = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(oq) & set(nq))

    hdr = f"  {'query':40s} {'old':>7s}    {'new':>7s}   ratio"
    print(hdr + ("   norm" if cal_ratio else ""))
    tot_o = tot_n = 0.0
    for q in shared:
        a, b = oq[q], nq[q]
        tot_o += a
        tot_n += b
        ratio = b / a if a > 0 else float("inf")
        line = f"  {q:40s} {a:7.3f} -> {b:7.3f}  x{ratio:5.2f}"
        if cal_ratio:
            norm = ratio / cal_ratio
            flag = "  <<<" if norm > 1.3 else ("  >>>" if norm < 0.77 else "")
            line += f"  x{norm:5.2f}{flag}"
        else:
            flag = "  <<<" if ratio > 1.3 else ("  >>>" if ratio < 0.77 else "")
            line += flag
        print(line)
    if shared and tot_o > 0:
        tot_ratio = tot_n / tot_o
        msg = (f"comparable subset ({len(shared)} queries): "
               f"{tot_o:.3f}s -> {tot_n:.3f}s  x{tot_ratio:.2f}")
        if cal_ratio:
            msg += f"  (normalized x{tot_ratio / cal_ratio:.2f})"
        print(msg)
    for label, only in (("only-old", set(oq) - set(nq)), ("only-new", set(nq) - set(oq))):
        if only:
            secs = sum((oq if label == "only-old" else nq)[q] for q in only)
            print(f"{label}: {sorted(only)} ({secs:.3f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
