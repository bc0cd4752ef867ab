"""AdaIN decoder training — data/tensor-parallel pjit step.

Trains the decoder against a frozen VGG encoder with the reference's loss
(`Style_3DGS/AdaIN/net.py:139-152` forward: content loss ``MSE(enc(g_t), t)``
plus style loss ``sum_i MSE(mean_i) + MSE(std_i)`` over relu1_1..relu4_1,
weighted 1.0 / 10.0 per `AdaIN/train.py:24-25,121-123`) and the reference's
optimizer schedule (Adam lr=1e-4 with ``lr/(1 + 5e-5 * iter)`` decay,
`AdaIN/train.py:51-55,100`).

TPU-first: the step is jit-compiled with NamedSharding annotations — batch
over ``dp`` (XLA inserts the gradient psum over dp), conv output channels
over ``tp`` (column-parallel convs) — and runs identically on 1 chip, an
8-chip slice, or a CPU-simulated mesh.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from aip_tpu.models.vgg import vgg_encode_with_intermediate, STYLE_TAPS
from aip_tpu.models.decoder import decoder_apply
from aip_tpu.ops.adain import adain, style_loss_terms
from aip_tpu.parallel.sharding import conv_param_sharding, batch_sharding, replicated


class TrainState(NamedTuple):
    params: list
    opt_state: optax.OptState
    step: jax.Array


def make_optimizer(lr: float = 1e-4, lr_decay: float = 5e-5) -> optax.GradientTransformation:
    """Adam with the reference's inverse-linear decay (train.py:51-55)."""
    schedule = lambda count: lr / (1.0 + lr_decay * count)
    return optax.adam(schedule)


def init_train_state(dec_params, optimizer) -> TrainState:
    return TrainState(dec_params, optimizer.init(dec_params), jnp.zeros((), jnp.int32))


def adain_train_loss(
    dec_params,
    vgg_params,
    content: jax.Array,
    style: jax.Array,
    style_weight: float = 10.0,
    content_weight: float = 1.0,
    compute_dtype=jnp.float32,
):
    """Reference Net.forward semantics (net.py:139-152), alpha=1."""
    style_feats = vgg_encode_with_intermediate(vgg_params, style, STYLE_TAPS, compute_dtype)
    content_feat = vgg_encode_with_intermediate(vgg_params, content, ("relu4_1",), compute_dtype)["relu4_1"]
    t = adain(content_feat, style_feats["relu4_1"]).astype(compute_dtype)
    g_t = decoder_apply(dec_params, t, compute_dtype)
    g_t_feats = vgg_encode_with_intermediate(vgg_params, g_t, STYLE_TAPS, compute_dtype)

    loss_c = jnp.mean((g_t_feats["relu4_1"].astype(jnp.float32) - t.astype(jnp.float32)) ** 2)
    loss_s = jnp.asarray(0.0, jnp.float32)
    for tap in STYLE_TAPS:
        loss_s = loss_s + style_loss_terms(g_t_feats[tap], style_feats[tap])
    return content_weight * loss_c + style_weight * loss_s, (loss_c, loss_s)


def make_train_step(optimizer, vgg_params, compute_dtype=jnp.float32,
                    style_weight: float = 10.0, content_weight: float = 1.0):
    """Build the jittable train step (donate the state for in-place update)."""

    def step(state: TrainState, content: jax.Array, style: jax.Array):
        (loss, (lc, ls)), grads = jax.value_and_grad(adain_train_loss, has_aux=True)(
            state.params, vgg_params, content, style,
            style_weight, content_weight, compute_dtype,
        )
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), {
            "loss": loss, "loss_content": lc, "loss_style": ls,
        }

    return step


def shard_train_setup(mesh, vgg_params, dec_params, optimizer):
    """Place params/state on the mesh: decoder channel-sharded over tp,
    frozen VGG replicated (it is inference-only weight traffic)."""
    dec_shard = conv_param_sharding(mesh, dec_params)
    dec_params = jax.device_put(dec_params, dec_shard)
    vgg_params = jax.device_put(vgg_params, jax.tree.map(lambda _: replicated(mesh), vgg_params))
    state = init_train_state(dec_params, optimizer)
    # optimizer state mirrors param sharding automatically via init on-sharded params
    return vgg_params, state


def compile_train_step(mesh, optimizer, vgg_params, batch_shape=None,
                       compute_dtype=jnp.float32,
                       style_weight: float = 10.0, content_weight: float = 1.0):
    """jit the step with explicit in/out shardings for the image batch."""
    step = make_train_step(optimizer, vgg_params, compute_dtype,
                           style_weight, content_weight)
    data_shard = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(None, data_shard, data_shard),
        donate_argnums=(0,),
    )
