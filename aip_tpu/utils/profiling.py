"""Tracing / profiling utilities (SURVEY.md §5: the rebuild's analog of the
reference's CUDA-event iteration timing, `train.py:117-118,158,225`).

``trace(dir)`` wraps a block in a jax.profiler trace (viewable in
TensorBoard / Perfetto); ``StepTimer`` measures per-step wall time with the
relay-safe synchronization this environment needs.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np
import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace for the enclosed block."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_sync(x) -> None:
    """Block until ``x`` is computed. Uses a tiny host read because
    ``block_until_ready`` is a no-op over some remote backends."""
    arr = x
    if isinstance(x, (list, tuple)):
        arr = x[0]
    np.asarray(jax.lax.slice(jnp_flat(arr), (0,), (1,)))


def jnp_flat(x):
    import jax.numpy as jnp

    return jnp.ravel(x)


class StepTimer:
    """Rolling per-step timing with EMA (the reference's iter_time scalar)."""

    def __init__(self, ema: float = 0.6):
        self.ema = ema
        self.value = None
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            device_sync(sync_on)
        dt = time.perf_counter() - self._t0
        self.value = dt if self.value is None else (
            self.ema * self.value + (1 - self.ema) * dt)
        return dt
