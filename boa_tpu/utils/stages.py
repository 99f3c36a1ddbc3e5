"""Background host-stage worker for the study orchestrator.

Parity note: the reference runs every stage serially on the worker
process (`body_organ_analysis/commands.py:41-288`); its GPU host has
many cores so save/preview/postprocess glue hides behind the next
model's run only by accident of the process pool. Here overlap is
explicit: ONE background thread executes pure-host stages (gzip saves,
cv2/native postprocess, matplotlib renders) while the calling thread
keeps dispatching device work. Even on a single-core host this wins,
because the main thread spends most of its wall time blocked on
device/tunnel I/O with the GIL released.

Rules enforced by convention (not the class): never submit work that
dispatches to the JAX device — device order must stay deterministic on
the main thread; submitted callables touch only host memory and disk.

`BOA_SERIAL_STAGES=1` disables the thread (submit runs inline), which
restores the reference's serial execution for debugging/timing.
"""

from __future__ import annotations

import logging
import os
from concurrent.futures import Future, ThreadPoolExecutor
from time import perf_counter
from typing import Any, Callable

logger = logging.getLogger(__name__)


class HostWorker:
    """Single-thread executor for deferred host stages.

    - ``submit(name, fn, *args)`` returns a Future; stages run FIFO.
    - ``barrier()`` waits for everything submitted so far and re-raises
      the first stage exception (unless the stage was submitted with
      ``suppress=True``, matching the orchestrator's existing
      best-effort semantics for preview rendering).
    - With ``serial=True`` (or BOA_SERIAL_STAGES=1) ``submit`` executes
      inline — the exact pre-worker behavior.
    """

    def __init__(self, serial: bool | None = None) -> None:
        if serial is None:
            serial = os.environ.get("BOA_SERIAL_STAGES", "") == "1"
        self.serial = serial
        self._pool: ThreadPoolExecutor | None = None
        self._pending: list[tuple[str, Future]] = []

    def _run(self, name: str, suppress: bool, fn: Callable[..., Any],
             args: tuple, kwargs: dict) -> Any:
        t0 = perf_counter()
        try:
            return fn(*args, **kwargs)
        except Exception:
            if not suppress:
                raise
            logger.warning("Deferred stage %s failed", name, exc_info=True)
            return None
        finally:
            logger.info("Stage %s: DONE in %0.5fs%s", name,
                        perf_counter() - t0,
                        "" if self.serial else " (overlapped)")

    def submit(self, name: str, fn: Callable[..., Any], *args: Any,
               suppress: bool = False, **kwargs: Any) -> Future:
        if self.serial:
            # exact pre-worker behavior: run now, raise at the call site
            fut: Future = Future()
            fut.set_result(self._run(name, suppress, fn, args, kwargs))
            return fut
        if self._pool is None:
            self._pool = ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="boa-host-stage")
        # prune completed-successful stages: a long-lived shared worker
        # (study streams) must not retain every stage's result (a
        # finished bca postprocess future pins a ~78 MB volume)
        self._pending = [(n, f) for n, f in self._pending
                         if not f.done() or f.exception() is not None]
        fut = self._pool.submit(self._run, name, suppress, fn, args, kwargs)
        self._pending.append((name, fut))
        return fut

    def barrier(self) -> None:
        """Wait for all submitted stages; raise the first failure (later
        failures are logged so they aren't silently dropped)."""
        pending, self._pending = self._pending, []
        first_exc: BaseException | None = None
        for name, fut in pending:
            exc = fut.exception()
            if exc is None:
                continue
            if first_exc is None:
                first_exc = exc
            else:
                logger.error("Deferred stage %s also failed: %s", name, exc)
        if first_exc is not None:
            raise first_exc

    def close(self) -> None:
        try:
            self.barrier()
        finally:
            if self._pool is not None:
                self._pool.shutdown(wait=True)
                self._pool = None

    def abort(self) -> None:
        """Tear down without raising (for error paths: don't mask the
        primary exception with a deferred-stage failure)."""
        for _, fut in self._pending:
            fut.cancel()
        self._pending = []
        if self._pool is not None:
            self._pool.shutdown(wait=True)
            self._pool = None

    def __enter__(self) -> "HostWorker":
        return self

    def __exit__(self, exc_type, exc, tb) -> None:
        if exc_type is None:
            self.close()
        else:
            self.abort()
