"""Persisted command-execution history (reference: the GOE repo's
command-execution/command-step tables driven by
orchestration_runner.py:139-227 via start_command/end_command and
start_command_step/end_command_step in
persistence/orchestration_repo_client.py:306-352).

One JSON document per execution under <metadata_dir>/history/, updated
atomically after every step, so the record of what completed survives
a crashed process — that is what makes resume-after-crash and the
status report's execution view possible. The Spark rebuild keeps the
same three statuses (EXECUTING/SUCCESS/ERROR) and the same
step-grained timing the reference records.
"""

from __future__ import annotations

import datetime as _dt
import json
import os
import uuid
from dataclasses import asdict, dataclass, field

COMMAND_EXECUTING = "EXECUTING"
COMMAND_SUCCESS = "SUCCESS"
COMMAND_ERROR = "ERROR"

STEP_OK = "ok"
STEP_SKIPPED = "skipped"
STEP_ERROR = "error"


def _utcnow() -> str:
    return _dt.datetime.now(_dt.timezone.utc).isoformat()


@dataclass
class StepRecord:
    name: str
    status: str  # ok | skipped | error
    seconds: float = 0.0
    detail: str | None = None
    recorded_utc: str = ""


@dataclass
class ExecutionRecord:
    execution_id: str
    command_type: str  # OFFLOAD | SCHEMA_SYNC | ...
    owner: str
    table_name: str
    status: str = COMMAND_EXECUTING
    command_input: object = None
    started_utc: str = ""
    ended_utc: str | None = None
    steps: list = field(default_factory=list)  # [StepRecord as dict]

    def step_names(self, status: str | None = None) -> list[str]:
        return [
            s["name"]
            for s in self.steps
            if status is None or s["status"] == status
        ]


class ExecutionHistoryStore:
    """Append-and-rewrite store: each execution is one JSON file,
    rewritten atomically (tmp + rename) on every state change, so a
    torn write can never corrupt the history of earlier executions."""

    def __init__(self, metadata_dir: str):
        self.root = os.path.join(metadata_dir, "history")
        os.makedirs(self.root, exist_ok=True)

    def _path(self, execution_id: str) -> str:
        return os.path.join(self.root, f"{execution_id}.json")

    def _save(self, rec: ExecutionRecord) -> None:
        from goe_spark.plans.metadata import atomic_write_json

        atomic_write_json(self._path(rec.execution_id), asdict(rec))

    # -- lifecycle (reference start_command/end_command) ----------------

    def begin(
        self,
        command_type: str,
        owner: str,
        table_name: str,
        command_input: object = None,
    ) -> ExecutionRecord:
        rec = ExecutionRecord(
            execution_id=uuid.uuid4().hex,
            command_type=command_type,
            owner=owner,
            table_name=table_name,
            command_input=command_input,
            started_utc=_utcnow(),
        )
        self._save(rec)
        return rec

    def record_step(
        self,
        rec: ExecutionRecord,
        name: str,
        status: str,
        seconds: float = 0.0,
        detail: str | None = None,
    ) -> None:
        rec.steps.append(
            asdict(
                StepRecord(
                    name=name,
                    status=status,
                    seconds=round(seconds, 4),
                    detail=detail,
                    recorded_utc=_utcnow(),
                )
            )
        )
        self._save(rec)

    def end(self, rec: ExecutionRecord, status: str) -> None:
        rec.status = status
        rec.ended_utc = _utcnow()
        self._save(rec)

    # -- queries ---------------------------------------------------------

    def get(self, execution_id: str) -> ExecutionRecord | None:
        path = self._path(execution_id)
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return ExecutionRecord(**json.load(fh))

    def list_executions(
        self, owner: str | None = None, table_name: str | None = None
    ) -> list[ExecutionRecord]:
        out = []
        for name in os.listdir(self.root):
            if not name.endswith(".json"):
                continue
            rec = self.get(name[: -len(".json")])
            if rec is None:
                continue
            if owner is not None and rec.owner != owner:
                continue
            if table_name is not None and rec.table_name != table_name:
                continue
            out.append(rec)
        return sorted(out, key=lambda r: (r.started_utc, r.execution_id))

    def latest(
        self, owner: str, table_name: str
    ) -> ExecutionRecord | None:
        execs = self.list_executions(owner, table_name)
        return execs[-1] if execs else None

    def completed_steps(self, rec: ExecutionRecord | None) -> set[str]:
        """Steps a resumed run may skip: those that finished ok in the
        given (usually failed) execution."""
        if rec is None:
            return set()
        return set(rec.step_names(STEP_OK))
