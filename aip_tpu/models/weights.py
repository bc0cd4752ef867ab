"""Weight management: torch-checkpoint conversion, npz save/load, fallback init.

The reference ships pretrained VGG/decoder weights as git-LFS ``.pth`` files
(`README.md:11-16`). This module converts those torch state_dicts (OIHW conv
weights keyed by Sequential index, e.g. ``'0.weight'``) into our NHWC/HWIO
pytree layout, caches them as ``.npz``, and falls back to deterministic random
init when no checkpoint is available (e.g. an air-gapped machine with only
LFS pointer files).

Conversion is one-shot and host-side; torch is imported lazily so the TPU
compute path never depends on it.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from aip_tpu.models import vgg as vgg_mod
from aip_tpu.models import decoder as dec_mod

DEFAULT_WEIGHTS_DIR = Path(os.environ.get("AIP_TPU_WEIGHTS", Path.home() / ".cache" / "aip_tpu"))


def _torch_conv_to_hwio(w: np.ndarray) -> np.ndarray:
    """torch OIHW -> JAX HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _is_real_checkpoint(path: Path) -> bool:
    """Reject git-LFS pointer stubs (≈130-byte text files)."""
    try:
        return path.is_file() and path.stat().st_size > 4096
    except OSError:
        return False


def convert_torch_sequential(state_dict, torch_indices) -> list[dict]:
    """Map a torch Sequential state_dict to our conv param list.

    ``torch_indices`` is the ordered list of key stems that hold convs —
    Sequential indices (``'0'``) or dotted paths (``'features.0'``).
    """
    params = []
    for idx in torch_indices:
        w = np.asarray(state_dict[f"{idx}.weight"], dtype=np.float32)
        b = np.asarray(state_dict[f"{idx}.bias"], dtype=np.float32)
        params.append({"w": jnp.asarray(_torch_conv_to_hwio(w)), "b": jnp.asarray(b)})
    return params


def _load_torch_state_dict(path: Path):
    import torch  # lazy: host-side conversion only

    obj = torch.load(str(path), map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    return {k: v.detach().numpy() for k, v in obj.items()}


def save_params_npz(params: list[dict], path: Path) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    flat = {}
    for i, p in enumerate(params):
        flat[f"w{i}"] = np.asarray(p["w"])
        flat[f"b{i}"] = np.asarray(p["b"])
    np.savez(str(path), **flat)


def load_params_npz(path: Path) -> list[dict]:
    data = np.load(str(path))
    n = len([k for k in data.files if k.startswith("w")])
    return [{"w": jnp.asarray(data[f"w{i}"]), "b": jnp.asarray(data[f"b{i}"])} for i in range(n)]


def _get_params(name: str, torch_path, torch_indices, init_fn) -> list[dict]:
    cache = DEFAULT_WEIGHTS_DIR / f"{name}.npz"
    if cache.is_file():
        return load_params_npz(cache)
    if torch_path is not None and _is_real_checkpoint(Path(torch_path)):
        params = convert_torch_sequential(_load_torch_state_dict(Path(torch_path)), torch_indices)
        save_params_npz(params, cache)
        return params
    # Deterministic fallback so every pipeline still runs (and benches) without
    # the pretrained checkpoint.
    return init_fn(jax.random.PRNGKey(0))


def get_vgg_params(torch_path=None) -> list[dict]:
    idxs = [spec[4] for spec in vgg_mod.conv_specs()]
    return _get_params("vgg_normalised", torch_path, idxs, vgg_mod.init_vgg_params)


def get_decoder_params(torch_path=None) -> list[dict]:
    idxs = [spec[3] for spec in dec_mod.conv_specs()]
    return _get_params("adain_decoder", torch_path, idxs, dec_mod.init_decoder_params)
