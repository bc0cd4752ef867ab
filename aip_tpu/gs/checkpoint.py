"""Checkpoint/resume for 3DGS training (orbax).

Parity with reference ``gaussians.capture()/restore`` + ``--start_checkpoint``
(`train.py:72-74,302-307`, `gaussian_model.py:106-134`): the FULL trainer
state — gaussian params & stats, color field, both optimizer states, RVQ
codebooks, step counter — round-trips losslessly.
"""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np


def save_checkpoint(path, trainer) -> str:
    """Write the TrainerState pytree with orbax. Returns the path."""
    import orbax.checkpoint as ocp

    path = Path(path).absolute()
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(trainer), force=True)
    return str(path)


def load_checkpoint(path, like):
    """Restore into the structure of ``like`` (a template TrainerState)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(Path(path).absolute(), item=jax.device_get(like))
