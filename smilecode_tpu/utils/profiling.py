"""Profiling/tracing hooks (the observability the reference lacks,
SURVEY.md section 5): jax.profiler trace capture + step timing with honest
synchronization for this platform's async dispatch."""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with tensorboard-plugin-profile)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer that forces device synchronization by
    materializing a scalar from the step outputs (block_until_ready alone can
    return before execution completes on tunneled platforms)."""

    def __init__(self):
        self.times_ms: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, outputs=None) -> float:
        if outputs is not None:
            leaves = jax.tree.leaves(outputs)
            if leaves:
                jnp.asarray(leaves[0]).block_until_ready()
                float(jnp.ravel(jnp.asarray(leaves[0]))[0])
        dt = (time.perf_counter() - self._t0) * 1000
        self.times_ms.append(dt)
        return dt

    @property
    def median_ms(self) -> float:
        import numpy as np

        return float(np.median(self.times_ms)) if self.times_ms else 0.0


def memory_stats() -> dict:
    """Device memory stats when the backend exposes them."""
    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return stats or {}
