"""Sharding rules for model params and activations.

Conventions:
* activations are NHWC: batch over ``dp``, channels over ``tp``;
* conv kernels are HWIO: output channels over ``tp`` (column-parallel) — the
  input-channel dim stays replicated so XLA lowers each conv to a local
  matmul followed by no communication, and inserts an all-gather only where
  a channel-replicated consumer (stats, decoder head) needs full channels;
* tiny tensors (biases of 3-channel layers, scalars) are replicated.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, dp_axis: str = "dp") -> NamedSharding:
    """NHWC activation: batch sharded over dp, rest replicated."""
    return NamedSharding(mesh, P(dp_axis, None, None, None))


def conv_param_sharding(mesh: Mesh, params, tp_axis: str = "tp"):
    """Sharding pytree for a list of {'w': HWIO, 'b': [O]} conv params."""
    tp_size = mesh.shape[tp_axis]

    def spec_for(x):
        o = x.shape[-1]
        if o >= 64 and o % tp_size == 0:
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1)), tp_axis))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec_for, params)
