"""Distillation trainer for the magenta-style fast stylizer.

The reference's fast video path loads a PRETRAINED TF-Hub module
(`video/utils.py:14`, ``arbitrary-image-stylization-v1-256``) — a checkpoint
this environment can neither download (no egress) nor parse (TF format). The
TPU-native answer is to TRAIN the equivalent: the AdaIN pipeline (exact
torch-parity weights converter, `models/weights.py`) is the teacher, and the
magenta transformer+predictor (`models/magenta.py`) learns to reproduce its
stylizations at ~1/25 the per-frame FLOPs — the same student/teacher shape
as magenta's own published *distilled* MobileNetV2 variant.

Loss per (content, style) batch:

    student = magenta(params, content, style)
    teacher = stop_grad(AdaIN(content, style, alpha=1))
    L = ||student - teacher||^2  +  lambda_feat * ||phi(student) - phi(teacher)||^2

with phi = frozen VGG relu4_1 features (the perceptual term keeps textures
from washing out under plain MSE). One jitted step; data-parallel over a
mesh axis if given (gradients psum'd by XLA).
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import optax

from aip_tpu.models import magenta as M


def distill_loss(params, vgg_params, dec_params, content, style,
                 lambda_feat: float = 0.1):
    """Scalar distillation loss for a content batch against ONE style.

    content [N, H, W, 3]; style [Hs, Ws, 3]; both float in [0, 1].
    """
    from aip_tpu.models.vgg import vgg_encode
    from aip_tpu.pipelines.adain_infer import stylize_simple

    teacher = jax.lax.stop_gradient(
        stylize_simple(vgg_params, dec_params, content, style[None],
                       alpha=1.0))
    teacher = jnp.clip(teacher, 0.0, 1.0)
    # The decoder emits 8*floor(H/8) rows; train at sizes where they agree.
    assert teacher.shape == content.shape, (teacher.shape, content.shape)
    student = M.stylize(params, content, style)
    pix = jnp.mean((student - teacher) ** 2)
    f_s = vgg_encode(vgg_params, student, "relu4_1", jnp.float32)
    f_t = jax.lax.stop_gradient(
        vgg_encode(vgg_params, teacher, "relu4_1", jnp.float32))
    feat = jnp.mean((f_s - f_t) ** 2)
    return pix + lambda_feat * feat


def make_distill_step(optimizer, vgg_params, dec_params,
                      lambda_feat: float = 0.1):
    """Jitted (params, opt_state, content, style) -> (params, opt_state,
    loss). Shard the content batch's leading axis over a mesh for dp."""

    @jax.jit
    def step(params, opt_state, content, style):
        loss, grads = jax.value_and_grad(distill_loss)(
            params, vgg_params, dec_params, content, style,
            lambda_feat=lambda_feat)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def train_magenta_distill(
    content_dir,
    style_dir,
    steps: int = 40_000,
    batch_size: int = 8,
    crop: int = 256,
    lr: float = 1e-3,
    lr_decay: float = 5e-5,
    lambda_feat: float = 0.1,
    predictor_trunk: str = "compact",
    save_path=None,
    save_every: int = 10_000,
    seed: int = 0,
    log_every: int = 100,
    params: "M.MagentaParams | None" = None,
    mesh=None,
    mesh_axis: str = "dp",
):
    """Train the fast stylizer by distilling the AdaIN teacher.

    Mirrors the AdaIN trainer's data plumbing (`cli/train_adain.py` /
    reference `AdaIN/train.py:58-136`): flat content/style folders, random
    resize+crop, inverse-time lr decay. Returns (params, last_loss).
    """
    from aip_tpu.data.images import FlatFolderDataset, infinite_batches
    from aip_tpu.models import weights as weights_mod
    from aip_tpu.parallel.train import make_optimizer

    vgg_params = weights_mod.get_vgg_params()
    dec_params = weights_mod.get_decoder_params()
    if params is None:
        params = M.init_magenta_params(jax.random.PRNGKey(seed),
                                       predictor_trunk=predictor_trunk)

    optimizer = make_optimizer(lr, lr_decay)  # reference inverse-linear decay
    opt_state = optimizer.init(params)
    step = make_distill_step(optimizer, vgg_params, dec_params,
                             lambda_feat=lambda_feat)

    content_ds = FlatFolderDataset(content_dir)
    style_ds = FlatFolderDataset(style_dir)
    content_it = infinite_batches(content_ds, batch_size, seed=seed,
                                  crop=crop)
    style_it = infinite_batches(style_ds, 1, seed=seed + 1, crop=crop)

    shard = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        shard = NamedSharding(mesh, P(mesh_axis, None, None, None))

    loss = float("nan")
    for it in range(1, steps + 1):
        content = jnp.asarray(next(content_it))
        style = jnp.asarray(next(style_it)[0])
        if shard is not None:
            content = jax.device_put(content, shard)
        params, opt_state, loss = step(params, opt_state, content, style)
        if log_every and it % log_every == 0:
            print(f"distill iter {it}: loss={float(loss):.5f}")
        if save_path is not None and (it % save_every == 0 or it == steps):
            M.save_magenta_npz(params, Path(save_path))
    return params, float(loss)
