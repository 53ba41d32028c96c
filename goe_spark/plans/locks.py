"""Per-table orchestration locks (O6 — orchestration_lock.py in the
reference, which takes an Oracle DBMS_LOCK per (owner, table)).

Spark-rebuild shape: an exclusive lock file next to the metadata
store. O_CREAT|O_EXCL is atomic on POSIX and on the cloud-storage
FUSE mounts a driver node would use; the payload records holder pid +
timestamp for post-mortem. Locks are advisory — they serialize
orchestration (two concurrent offloads of one table), not Spark jobs.
"""

from __future__ import annotations

import json
import os
import time


class LockTakenError(RuntimeError):
    pass


class TableLock:
    def __init__(self, root: str, owner: str, table_name: str):
        os.makedirs(root, exist_ok=True)
        self.path = os.path.join(
            root, f"{owner.lower()}.{table_name.lower()}.lock"
        )
        self._fd: int | None = None

    def acquire(self) -> "TableLock":
        try:
            self._fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            holder = "<unreadable>"
            try:
                with open(self.path) as f:
                    holder = f.read()
            except OSError:
                pass
            raise LockTakenError(
                f"{self.path} is held: {holder}"
            ) from None
        os.write(
            self._fd,
            json.dumps({"pid": os.getpid(), "ts": time.time()}).encode(),
        )
        return self

    def release(self) -> None:
        if self._fd is not None:
            os.close(self._fd)
            self._fd = None
        if os.path.exists(self.path):
            os.remove(self.path)

    def __enter__(self) -> "TableLock":
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()
