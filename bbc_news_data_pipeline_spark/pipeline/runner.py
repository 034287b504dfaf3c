"""Stage runner — the engine-side replacement for the reference's Airflow
DAG control flow (SURVEY §2.12).

  O1 dependencies        → declarative Stage(deps=...) toposorted; independent
                           stages can share one SparkSession (FAIR pool)
  O2 retries             → per-stage retry count
  O3 ALL_DONE publishing → optional=True stages: failure recorded, run continues
  O4 XCom                → the results dict threaded to downstream stages

Orchestration *scheduling* (cron cadence, distributed workers) stays an
external concern, exactly as SURVEY §3.1 prescribes — this runner is the
in-process dependency/retry engine.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Any

log = logging.getLogger(__name__)


@dataclass
class Stage:
    name: str
    fn: Callable[[dict[str, Any]], Any]  # results-so-far -> stage result
    deps: tuple[str, ...] = ()
    retries: int = 1  # bbc_news_dag.py:247 default_args retries=1
    optional: bool = False  # TriggerRule.ALL_DONE semantics (bbc_news_dag.py:321)


@dataclass
class RunReport:
    results: dict[str, Any] = field(default_factory=dict)
    failed: dict[str, str] = field(default_factory=dict)
    timings: dict[str, float] = field(default_factory=dict)


class Pipeline:
    def __init__(self, stages: list[Stage]):
        names = [s.name for s in stages]
        if len(names) != len(set(names)):
            raise ValueError("duplicate stage names")
        self.stages = {s.name: s for s in stages}

    def run(self) -> RunReport:
        order = TopologicalSorter({s.name: set(s.deps) for s in self.stages.values()})
        report = RunReport()
        for name in order.static_order():
            stage = self.stages[name]
            # An optional upstream's failure does not poison downstream
            # (TriggerRule.ALL_DONE); a required upstream's failure does,
            # unless this stage is itself marked optional-tolerant.
            dead_deps = [
                d for d in stage.deps
                if d in report.failed and not self.stages[d].optional
            ]
            if dead_deps and not stage.optional:
                report.failed[name] = f"skipped: upstream failed {dead_deps}"
                continue
            t0 = time.perf_counter()
            last_err: str | None = None
            for attempt in range(stage.retries + 1):
                try:
                    report.results[name] = stage.fn(report.results)
                    last_err = None
                    break
                except Exception as e:  # noqa: BLE001 - stage isolation is the point
                    last_err = f"{type(e).__name__}: {e}"
                    log.warning("stage %s attempt %d failed: %s", name, attempt, last_err)
            report.timings[name] = round(time.perf_counter() - t0, 3)
            if last_err is not None:
                report.failed[name] = last_err
                if not stage.optional:
                    log.error("required stage %s failed; downstream will skip", name)
        return report
