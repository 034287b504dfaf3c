"""tools/bench_compare._load: record salvage across the shapes a BENCH
artifact can take — raw single-line, r7+ two-line (full + compact tail
summary), driver wrapper with a parsed record, and the truncated-wrapper
case the compact line exists to survive (BENCH_r06's parsed:null)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from bench_compare import _load

FULL = {
    "metric": "headline_queries_total",
    "value": 10.0,
    "queries": {"q1": 4.0, "q2": 6.0},
    "calibration_sec": 0.2,
    "calibration_ref_sec": 0.182,
    "value_norm": 9.1,
    "queries_norm": {"q1": 3.64, "q2": 5.46},
}
COMPACT = {
    "metric": "headline_summary_compact",
    "value": 10.0,
    "value_norm": 9.1,
    "calibration_sec": 0.2,
    "calibration_ref_sec": 0.182,
    "top10_slowest_norm": {"q2": 5.46, "q1": 3.64},
}


def test_load_two_line_output_prefers_full_record(tmp_path):
    p = tmp_path / "bench.out"
    p.write_text(json.dumps(FULL) + "\n" + json.dumps(COMPACT) + "\n")
    rec = _load(str(p))
    assert rec["queries"] == FULL["queries"]


def test_load_wrapper_with_parsed_record(tmp_path):
    p = tmp_path / "BENCH.json"
    p.write_text(json.dumps({"n": 7, "parsed": FULL, "tail": "..."}))
    assert _load(str(p))["value_norm"] == 9.1


def test_load_truncated_wrapper_salvages_compact_tail(tmp_path):
    """The r6 failure mode: the driver's tail capture sliced the full
    record mid-JSON (parsed null), but the compact line prints LAST so
    the tail retains it — _load must recover the headline numbers."""
    tail = json.dumps(FULL)[:50] + "\n" + json.dumps(COMPACT)
    p = tmp_path / "BENCH.json"
    p.write_text(json.dumps({"n": 6, "parsed": None, "tail": tail}))
    rec = _load(str(p))
    assert rec["value_norm"] == 9.1 and rec["calibration_sec"] == 0.2


def test_load_raw_single_line(tmp_path):
    p = tmp_path / "bench.json"
    p.write_text(json.dumps(FULL))
    assert _load(str(p))["value"] == 10.0
