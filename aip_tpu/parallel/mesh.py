"""Device mesh construction helpers."""

from __future__ import annotations

import math

import jax
import numpy as np
from jax.sharding import Mesh


def best_grid(n: int, n_axes: int = 2) -> tuple[int, ...]:
    """Factor ``n`` devices into a near-square grid (dp-major)."""
    if n_axes == 1:
        return (n,)
    a = int(math.sqrt(n))
    while n % a:
        a -= 1
    return (n // a, a)


def make_mesh(devices=None, axis_names=("dp", "tp"), shape=None) -> Mesh:
    """Build a Mesh over the given (or all) devices.

    With the default two axes, devices factor into a near-square (dp, tp)
    grid; pass ``shape`` to override (e.g. ``(n, 1)`` for pure data
    parallelism).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = best_grid(n, len(axis_names))
    if math.prod(shape) != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def make_dp_mesh(n: int) -> "Mesh | None":
    """(dp,) mesh over the first ``n`` devices, or None for n <= 1 — the
    shared constructor behind every --mesh_dp CLI flag."""
    if not n or n <= 1:
        return None
    return make_mesh(jax.devices()[:n], axis_names=("dp",), shape=(n,))
