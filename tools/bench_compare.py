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

Round-8 (r7 verdict task #1): bench.py now carries THREE probes — scan
(legacy unit anchor), shuffle (one fixed hash exchange), and drain (one
fixed availableNow checkpointed micro-stream) — because contention lands
differently per cost class: BENCH_r07 at loadavg 7 read 1.70x on common
queries while identical code read 0.69x quiet, and the scan probe could
not see it (scans barely degrade; shuffles and checkpoint fsyncs degrade
3-8x). This tool therefore (a) prefers the family-normalized values
("queries_norm_family") when both records have them, (b) otherwise
divides each query's raw ratio by ITS family probe ratio when both
records carry the probes, and (c) always prints per-family subtotals
(core vs drain, classified by the 'stream' name contract pinned in
tests/test_plans.py) so a load-skewed artifact shows up as "the gap
concentrates in drains" with numbers instead of prose.
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
    tail = rec.get("tail") if isinstance(rec, dict) else None
    if rec.get("parsed") is not None:
        rec = rec["parsed"]
    elif "tail" in rec and "queries" not in rec:
        # driver wrapper whose full-record parse was truncated: the compact
        # summary line (bench.py r7+) prints LAST, so the tail retains it.
        salvaged = _best_json_line(rec["tail"])
        if salvaged is not None:
            rec = salvaged
    if "queries" not in rec and "queries_norm" not in rec and tail:
        # Last resort (r8): the wrapper's bounded tail capture sliced
        # mid-record (BENCH_r06: no parsed record, no compact line, the
        # tail is a fragment of the queries_norm dict that prints LAST in
        # the full record). Regex-salvage the per-query pairs; last
        # occurrence wins, so if the capture boundary happened to span
        # two dicts the normalized copy (printed later) prevails. Every
        # r5+ artifact shares the 0.182 scan-probe anchor, so the
        # fragment compares on the PRE-NORMALIZED path.
        import re as _re

        pairs = _re.findall(r'"(q\w+)"\s*:\s*([0-9][0-9.]*)', tail)
        if pairs:
            rec = dict(rec)
            rec["queries_norm"] = {k: float(v) for k, v in pairs}
            rec.setdefault("calibration_ref_sec", 0.182)
            rec["fragment_salvage"] = True
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


def _family(name: str) -> str:
    """Cost-class of a query — mirrors bench.py: every availableNow drain
    query carries 'stream' in its registry name (pinned by test)."""
    return "drain" if "stream" in name else "core"


def _probe_ratios(old: dict, new: dict) -> dict[str, float] | None:
    """Per-family probe ratios (new/old) when BOTH records carry the r8
    probes: 'core' uses the shuffle probe, 'drain' the drain probe."""
    keys = {"core": "calibration_shuffle_sec", "drain": "calibration_drain_sec"}
    out = {}
    for fam, k in keys.items():
        o, n = old.get(k), new.get(k)
        if not o or not n:
            return None
        out[fam] = n / o
    return out


def main() -> int:
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    old, new = _load(sys.argv[1]), _load(sys.argv[2])
    print(f"old: total={old.get('value')}s loadavg={old.get('loadavg_1m')}  "
          f"new: total={new.get('value')}s loadavg={new.get('loadavg_1m')}")
    for lbl, rec in (("old", old), ("new", new)):
        if rec.get("fragment_salvage"):
            print(f"NOTE: {lbl} record is a truncated-tail FRAGMENT "
                  f"({len(rec.get('queries_norm', {}))} queries salvaged; "
                  f"subset comparison only)")

    cal_o, cal_n = old.get("calibration_sec"), new.get("calibration_sec")
    cal_ratio = None
    if cal_o and cal_n:
        cal_ratio = cal_n / cal_o
        print(f"calibration (scan): {cal_o:.3f}s -> {cal_n:.3f}s  x{cal_ratio:.2f} "
              f"(machine-speed drift; normalized ratios divide this out)")
    else:
        missing = [lbl for lbl, c in (("old", cal_o), ("new", cal_n)) if not c]
        print(f"calibration: absent in {'/'.join(missing)} record(s) — "
              f"raw ratios only")
    for lbl, key in (("shuffle", "calibration_shuffle_sec"),
                     ("drain", "calibration_drain_sec")):
        o, n = old.get(key), new.get(key)
        if o and n:
            print(f"calibration ({lbl}): {o:.3f}s -> {n:.3f}s  x{n / o:.2f}")
        elif o or n:
            print(f"calibration ({lbl}): only one record carries it "
                  f"(old={o} new={n})")

    fam_ratio = _probe_ratios(old, new)

    # Prefer pre-normalized values: family-normalized (r8+) beats
    # scan-normalized (r6+) beats raw. Each artifact rescales itself to
    # the fixed REF anchors, so these compare machine-independently with
    # no further per-ratio correction.
    per_ratio_fam = None  # divide each query's raw ratio by its family probe
    if (
        "queries_norm_family" in old
        and "queries_norm_family" in new
        and old.get("calibration_shuffle_ref_sec")
        == new.get("calibration_shuffle_ref_sec")
        and old.get("calibration_drain_ref_sec")
        == new.get("calibration_drain_ref_sec")
    ):
        oq, nq = old["queries_norm_family"], new["queries_norm_family"]
        cal_ratio = None
        print(f"comparing FAMILY-NORMALIZED values: norm totals "
              f"{old.get('value_norm_family')}s -> {new.get('value_norm_family')}s")
    elif (
        "queries_norm" in old
        and "queries_norm" in new
        and old.get("calibration_ref_sec") == new.get("calibration_ref_sec")
    ):
        oq, nq = old["queries_norm"], new["queries_norm"]
        cal_ratio = None
        print(f"comparing PRE-NORMALIZED values (ref "
              f"{new.get('calibration_ref_sec')}s scan probe): "
              f"norm totals {old.get('value_norm')}s -> {new.get('value_norm')}s")
    else:
        oq, nq = old.get("queries", {}), new.get("queries", {})
        if fam_ratio:
            per_ratio_fam = fam_ratio
            cal_ratio = None
            print("per-query ratios divided by each query's FAMILY probe "
                  f"ratio (core x{fam_ratio['core']:.2f}, "
                  f"drain x{fam_ratio['drain']:.2f})")
    shared = sorted(set(oq) & set(nq))

    hdr = f"  {'query':40s} {'old':>7s}    {'new':>7s}   ratio"
    print(hdr + ("   norm" if (cal_ratio or per_ratio_fam) else ""))
    tot_o = tot_n = 0.0
    fam_tot: dict[str, list[float]] = {"core": [0.0, 0.0], "drain": [0.0, 0.0]}
    for q in shared:
        a, b = oq[q], nq[q]
        tot_o += a
        tot_n += b
        ft = fam_tot[_family(q)]
        ft[0] += a
        ft[1] += b
        ratio = b / a if a > 0 else float("inf")
        line = f"  {q:40s} {a:7.3f} -> {b:7.3f}  x{ratio:5.2f}"
        denom = (per_ratio_fam or {}).get(_family(q)) if per_ratio_fam else cal_ratio
        if denom:
            norm = ratio / denom
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
        # Per-family subtotals: the attribution readout — a load-skewed
        # artifact shows its gap concentrated in the drain family while
        # core stays flat (or vice versa), with probe ratios alongside.
        for fam in ("core", "drain"):
            fo, fn = fam_tot[fam]
            if fo > 0:
                fmsg = (f"  family {fam:5s}: {fo:8.3f}s -> {fn:8.3f}s  "
                        f"x{fn / fo:.2f}")
                if per_ratio_fam:
                    fmsg += (f"  (/probe x{per_ratio_fam[fam]:.2f} -> "
                             f"x{fn / fo / per_ratio_fam[fam]:.2f})")
                elif fam_ratio:
                    fmsg += f"  (probe moved x{fam_ratio[fam]:.2f})"
                print(fmsg)
    for label, only in (("only-old", set(oq) - set(nq)), ("only-new", set(nq) - set(oq))):
        if only:
            secs = sum((oq if label == "only-old" else nq)[q] for q in only)
            print(f"{label}: {sorted(only)} ({secs:.3f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
