"""Graceful-shutdown wrapper (G6).

Mirrors the reference's ``GracefulKiller`` (/root/reference/app/
main.py:391-399), which traps SIGINT/SIGTERM and runs a cleanup
callback before exiting. Spark-side the invariant is stronger and
simpler than the reference's: because every period commits through the
TableStore's stage-then-flip pointer protocol, stopping *between*
periods always leaves the store consistent — so the handler only
requests a stop and lets the in-flight period finish, rather than
killing mid-write.

For Structured Streaming, pass ``query.stop`` (or several) as
callbacks: ``StreamingQuery.stop()`` is Spark's sanctioned graceful
stop — the current micro-batch's foreachBatch commit completes or is
replayed from the checkpoint on restart, never half-applied.
"""

from __future__ import annotations

import signal
from typing import Callable


class GracefulShutdown:
    """Trap SIGINT/SIGTERM; set a flag and run optional callbacks.

    Use as a context manager so previous handlers are restored (and
    test runners / REPLs keep their own Ctrl-C behavior afterwards):

        with GracefulShutdown() as stop:
            engine.run_sync(shutdown=stop)
    """

    SIGNALS = (signal.SIGINT, signal.SIGTERM)

    def __init__(self, *callbacks: Callable[[], None]) -> None:
        self.callbacks = list(callbacks)
        self._stop_requested = False
        self._previous: dict[int, object] = {}

    @property
    def stop_requested(self) -> bool:
        return self._stop_requested

    def request_stop(self, *_args) -> None:
        """Idempotent; also the signal handler."""
        first = not self._stop_requested
        self._stop_requested = True
        if first:
            for cb in self.callbacks:
                cb()

    def __enter__(self) -> "GracefulShutdown":
        for sig in self.SIGNALS:
            self._previous[sig] = signal.signal(sig, self.request_stop)
        return self

    def __exit__(self, *exc) -> None:
        for sig, prev in self._previous.items():
            signal.signal(sig, prev)
        self._previous.clear()
