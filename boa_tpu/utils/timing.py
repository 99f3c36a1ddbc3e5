"""Per-stage wall-clock accounting.

Parity: the `stats` dict threaded through `body_organ_analysis/commands.py:
121-287` (inference_time, bca_metrics_time, totalsegmentator_metrics_time,
excel_time, total_time) and persisted to the `boa_entries` monitoring table
(`init.sql:17-28`). Also hosts the optional jax.profiler trace context the
reference never had.
"""

from __future__ import annotations

import contextlib
import logging
import time

logger = logging.getLogger(__name__)


class StageTimer:
    """Collects named wall-clock spans into a stats dict."""

    def __init__(self) -> None:
        self.stats: dict[str, float] = {}
        self._t0 = time.monotonic()

    @contextlib.contextmanager
    def stage(self, name: str):
        start = time.monotonic()
        try:
            yield
        finally:
            elapsed = time.monotonic() - start
            self.stats[f"{name}_time"] = self.stats.get(f"{name}_time", 0.0) + elapsed
            logger.info("stage %s: %.3fs", name, elapsed)

    def finish(self) -> dict[str, float]:
        self.stats["total_time"] = time.monotonic() - self._t0
        return dict(self.stats)


class Spans:
    """BOA_PIPELINE_TIMING=1: fine-grained wall spans inside a stage.

    Same contract as the predict_image spans (inference/pipeline.py):
    `sync=<device array>` forces a strided scalar readback first because
    `block_until_ready` can return early on the tunneled backend; syncing
    serializes the dispatch pipeline, so this is diagnostic-only.
    """

    def __init__(self, prefix: str) -> None:
        import os

        self.enabled = os.environ.get("BOA_PIPELINE_TIMING", "") not in ("", "0")
        self.prefix = prefix
        self.t = time.perf_counter()

    def mark(self, label: str, sync=None) -> None:
        if not self.enabled:
            return
        if sync is not None:
            import jax.numpy as jnp

            float(jnp.sum(sync.astype(jnp.float32).ravel()[::4096]))
        logger.info("%s[%s]: %.3fs", self.prefix, label,
                    time.perf_counter() - self.t)
        self.t = time.perf_counter()


@contextlib.contextmanager
def maybe_profile(trace_dir: str | None):
    """jax.profiler trace wrapper (enabled with BOA_PROFILE_DIR)."""
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
