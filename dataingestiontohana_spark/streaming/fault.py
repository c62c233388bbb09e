"""Fault injector: the Spark analogue of the reference's "Simulate
Error" operator (`/root/reference/README.md:45-63` — a stateful JS
script whose `terminate` flag, armed via a Terminal message, kills the
graph on the next data message via `$.fail(...)`).

Here the flag is a file (the control channel a Terminal provides in the
reference); the ingestion pipeline checks it at a configurable point in
`foreachBatch` and raises, killing the streaming query. `once=True`
mimics the reference protocol: the human restarts the graph and the
fault does not re-fire (`README.md:90`).
"""

from __future__ import annotations

import os


class InjectedFault(RuntimeError):
    """Raised by the pipeline when the armed fault fires."""


class FaultInjector:
    # where in the foreachBatch lifecycle the fault fires:
    BEFORE_WRITE = "before_write"  # kill before the DB write
    AFTER_WRITE = "after_write"  # kill after DB write, before offset commit
    FAIL_WRITE = "fail_write"  # make the DB write itself raise

    def __init__(self, flag_path: str, point: str = AFTER_WRITE, at_batch: int = 1):
        self.flag_path = flag_path
        self.point = point
        self.at_batch = at_batch  # fire at the Nth processed batch (0-based)
        self._seen = 0

    def arm(self) -> None:
        with open(self.flag_path, "w") as f:
            f.write(self.point)

    def disarm(self) -> None:
        if os.path.exists(self.flag_path):
            os.remove(self.flag_path)

    def armed(self) -> bool:
        return os.path.exists(self.flag_path)

    def check(self, point: str) -> None:
        """Called by the pipeline once per batch at each lifecycle point;
        fires (once) when armed, the point matches, and `at_batch`
        matching checks have already passed."""
        if point != self.point:
            return
        cur = self._seen
        self._seen += 1
        if self.armed() and cur >= self.at_batch:
            self.disarm()  # one-shot: restart survives (README.md:90)
            raise InjectedFault(f"unexpected value received (injected at {point})")
