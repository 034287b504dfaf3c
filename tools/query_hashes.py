"""Per-query plan-source fingerprints for the rework-aware driver window.

The external driver verifies a 50-entry slice of the registry per round
(``__spark_entry__.py``). Window priority used to be "least-recently
driver-green first" — but a green stamp only attests to the code AS OF
that round: a query REWORKED after its stamp (round 5: q40/q41/q44/q53/
q82/q83/q93, stamped r3–r4, reworked r5) is stale evidence, not
evidence. This module gives every query a content fingerprint so the
window can treat "green but source changed since the stamp" exactly
like "red": priority −1, re-verify next round.

Fingerprint = md5 of the ``Query.spark`` function's source text (via
``inspect.getsource``) + the oracle SQL string. Known seam: a change
confined to a shared helper the function CALLS (without touching the
function body or any constant embedded in the oracle) is invisible to
the fingerprint. In practice every semantic rework so far has touched
the oracle too (cross-engine parity forces it — constants are
interpolated into the SQL), so the fingerprint over-approximates
"unchanged" only for pure-refactor helper edits, which parity at both
SFs (tools/check_parity.py) still covers locally.

Snapshot protocol (part of the per-round artifact refresh, alongside
PARITY_r{N}.json): before the round ends, run

    python tools/query_hashes.py --write <round>

which records {name: hash} under that round number in QUERY_HASHES.json
at the repo root. ``__spark_entry__`` compares each query's CURRENT
hash against the snapshot nearest-at-or-after its last green round; a
mismatch (or an unhashable query) demotes it to priority −1.
"""

from __future__ import annotations

import hashlib
import inspect
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SNAPSHOT_PATH = os.path.join(REPO, "QUERY_HASHES.json")


def query_hash(spark_fn, oracle: str | None) -> str:
    """Fingerprint one query: plan-function source + oracle SQL."""
    try:
        src = inspect.getsource(spark_fn)
    except (OSError, TypeError):
        # No retrievable source (REPL-defined, builtin): fall back to the
        # qualified name so the hash is at least stable per function
        # identity. Callers treat a CHANGED hash as rework; an unstable
        # repr here would cause spurious re-verification, never a miss.
        src = getattr(spark_fn, "__qualname__", repr(spark_fn))
    payload = src + "\n\x00ORACLE\x00\n" + (oracle or "")
    return hashlib.md5(payload.encode("utf-8")).hexdigest()


def current_hashes() -> dict[str, str]:
    """{query name: fingerprint} for the registry at HEAD."""
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    from bbc_news_data_pipeline_spark.plans import all_queries

    return {q.name: query_hash(q.spark, q.oracle) for q in all_queries()}


def load_snapshots(path: str = SNAPSHOT_PATH) -> dict[int, dict[str, str]]:
    """{round: {name: hash}} from QUERY_HASHES.json ({} if absent/bad)."""
    try:
        with open(path) as f:
            raw = json.load(f)
    except (OSError, ValueError):
        return {}
    out: dict[int, dict[str, str]] = {}
    for k, v in raw.items():
        try:
            out[int(k)] = dict(v)
        except (TypeError, ValueError):
            continue
    return out


def hash_at_or_after(
    snapshots: dict[int, dict[str, str]], name: str, rnd: int
) -> str | None:
    """The earliest attested hash at-or-after ``rnd`` for ``name``.

    A green stamp at round g is trusted iff the query's source is
    unchanged since g. Without a snapshot AT g, the earliest snapshot
    AFTER g is the closest attestable state: if current == that, the
    code is unchanged since that snapshot (the g→snapshot gap is the
    documented seam for pre-snapshot rounds, closed from round 5 on).
    Returns None when no snapshot at-or-after ``rnd`` mentions the query.
    """
    for r in sorted(snapshots):
        if r >= rnd and name in snapshots[r]:
            return snapshots[r][name]
    return None


def write_snapshot(rnd: int, path: str = SNAPSHOT_PATH) -> dict[str, str]:
    snaps = load_snapshots(path)
    hashes = current_hashes()
    snaps[rnd] = hashes
    with open(path, "w") as f:
        json.dump(
            {str(r): snaps[r] for r in sorted(snaps)}, f, indent=1, sort_keys=True
        )
        f.write("\n")
    return hashes


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--write":
        h = write_snapshot(int(sys.argv[2]))
        print(f"wrote {len(h)} hashes for round {sys.argv[2]} -> {SNAPSHOT_PATH}")
    else:
        print(json.dumps(current_hashes(), indent=1, sort_keys=True))
