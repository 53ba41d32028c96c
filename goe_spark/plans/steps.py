"""Offload step runner (O1 — command_steps.py:29-67 and
OffloadMessages.offload_step in the reference).

Named steps with timing, optional skip, and error injection for
failure-path testing. Each step tags the Spark job group so the UI /
event log attributes every job to its orchestration step — the
Spark-native replacement for the reference's step-name log lines and
Redis progress publishing.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field


class StepError(RuntimeError):
    def __init__(self, step: str, cause: Exception):
        super().__init__(f"step {step!r} failed: {cause}")
        self.step = step
        self.cause = cause


@dataclass
class StepResult:
    name: str
    status: str  # "ok" | "skipped" | "error"
    seconds: float = 0.0
    detail: object = None


@dataclass
class StepRunner:
    """Run named steps in order, recording timing and status.

    ``skip`` names steps to bypass (reference: --skip); ``error_at``
    injects a failure before the named step runs (reference:
    error_before_step), which is how chunk-restart semantics get
    tested without a real outage.

    ``history``/``execution`` persist every step outcome to an
    ExecutionHistoryStore as it happens (reference
    start_command_step/end_command_step), so a crash leaves a durable
    record of what completed. ``resume_done`` names steps recorded ok
    by a prior failed execution (history.completed_steps) — they are
    skipped with a "resumed" marker instead of re-running.
    """

    spark: object | None = None
    skip: set[str] = field(default_factory=set)
    error_at: str | None = None
    results: list[StepResult] = field(default_factory=list)
    log: object = print
    history: object | None = None  # ExecutionHistoryStore
    execution: object | None = None  # ExecutionRecord
    resume_done: set[str] = field(default_factory=set)

    def _record(self, result: StepResult) -> None:
        self.results.append(result)
        if self.history is not None and self.execution is not None:
            # A RESUMED step is skipped for display but recorded "ok"
            # in THIS execution's history: it is genuinely complete,
            # and a later crash-resume reads completed_steps of the
            # latest execution — recording "skipped" would make the
            # resume chain survive exactly one crash before
            # recomputing everything.
            status = (
                "ok" if result.detail == "resumed" else result.status
            )
            self.history.record_step(
                self.execution,
                result.name,
                status,
                result.seconds,
                str(result.detail) if result.detail is not None else None,
            )

    def run(self, name: str, fn, *args, **kwargs):
        if name in self.resume_done:
            self._record(StepResult(name, "skipped", detail="resumed"))
            self.log(f"step {name}: skipped (completed by prior execution)")
            return None
        if name in self.skip:
            self._record(StepResult(name, "skipped"))
            self.log(f"step {name}: skipped")
            return None
        if self.error_at == name:
            err = RuntimeError(f"injected error before step {name}")
            self._record(StepResult(name, "error", detail=str(err)))
            raise StepError(name, err)
        if self.spark is not None:
            self.spark.sparkContext.setJobGroup(name, f"goe_spark step: {name}")
        t0 = time.perf_counter()
        try:
            out = fn(*args, **kwargs)
        except Exception as e:
            dt = time.perf_counter() - t0
            self._record(StepResult(name, "error", dt, str(e)))
            self.log(f"step {name}: ERROR after {dt:.2f}s: {e}")
            raise StepError(name, e) from e
        finally:
            if self.spark is not None:
                self.spark.sparkContext.setJobGroup("", "")
        dt = time.perf_counter() - t0
        self._record(StepResult(name, "ok", dt))
        self.log(f"step {name}: ok ({dt:.2f}s)")
        return out

    def summary(self) -> dict[str, str]:
        return {r.name: r.status for r in self.results}
