"""Gaussian parameter state with fixed capacity + active mask.

The reference grows/shrinks torch parameter tensors in place during
densification (`scene/gaussian_model.py:449-578`); XLA requires static
shapes, so here the Gaussian set lives in CAPACITY-sized padded arrays with
an ``active`` mask (SURVEY.md §7.5c). Clone/split append into free slots via
masked scatter; prune just clears flags. All state transitions are jitted,
shape-stable functions of (state, rng).

Parity map (reference gaussian_model.py):
* activations: exp scaling, sigmoid opacity, normalized rotation (:35-50);
* create_from_pcd (:165-189): kNN-initialized log scales, identity quats,
  0.1 opacity, mask ones;
* densify_and_clone (:545-558), densify_and_split (:520-543, N=2, scale/1.6,
  rotated normal samples), densify_and_prune (:560-573: mask<=0.01 or
  opacity<min, plus big-point pruning), mask_prune (:575-578);
* add_densification_stats (:658-660): accumulate screen-space grad norms;
* reset_opacity (:434-438): clamp opacity to <=0.01.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from aip_tpu.ops.quaternion import build_rotation, inverse_sigmoid
from aip_tpu.ops.knn import mean_knn_sq_dist
from aip_tpu.ops.sh import rgb_to_sh


class GaussianState(NamedTuple):
    xyz: jax.Array        # [C, 3]
    scaling: jax.Array    # [C, 3] log-scale
    rotation: jax.Array   # [C, 4] unnormalized quaternion
    opacity: jax.Array    # [C, 1] logit
    mask: jax.Array       # [C, 1] learnable gate logits
    active: jax.Array     # [C] bool
    max_radii2d: jax.Array    # [C]
    xyz_grad_accum: jax.Array  # [C, 1]
    denom: jax.Array      # [C, 1]

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def n_active(self) -> jax.Array:
        return jnp.sum(self.active)


def get_scaling(state: GaussianState) -> jax.Array:
    return jnp.exp(state.scaling)


def get_opacity(state: GaussianState) -> jax.Array:
    return jax.nn.sigmoid(state.opacity)


def get_rotation(state: GaussianState) -> jax.Array:
    return state.rotation / jnp.linalg.norm(state.rotation, axis=-1, keepdims=True)


def ste_mask(state: GaussianState) -> jax.Array:
    """Straight-through binary gate (renderer :78): hard >0.01 forward,
    sigmoid gradient backward."""
    s = jax.nn.sigmoid(state.mask)
    hard = (s > 0.01).astype(s.dtype)
    return jax.lax.stop_gradient(hard - s) + s


def create_from_pcd(points: jax.Array, colors: jax.Array, capacity: int) -> tuple:
    """Initialize state from a COLMAP point cloud; returns (state, sh_dc).

    sh_dc [C, 3] is the DC color used for the photometric warm-up before the
    neural field takes over (reference keeps colors in the field; the DC
    seed mirrors create_from_pcd's feature init :167-170).
    """
    n = points.shape[0]
    if n > capacity:
        points = points[:capacity]
        colors = colors[:capacity]
        n = capacity

    dist2 = mean_knn_sq_dist(points.astype(jnp.float32), k=3)
    scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)
    rots = jnp.zeros((n, 4)).at[:, 0].set(1.0)
    opac = inverse_sigmoid(0.1 * jnp.ones((n, 1)))

    def pad(x, fill=0.0):
        return jnp.pad(x, [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    state = GaussianState(
        xyz=pad(points.astype(jnp.float32)),
        scaling=pad(scales),
        rotation=pad(rots.at[:, 0].set(1.0), 0.0).at[n:, 0].set(1.0),
        opacity=pad(opac, -10.0),
        mask=pad(jnp.ones((n, 1))),
        active=jnp.arange(capacity) < n,
        max_radii2d=jnp.zeros(capacity),
        xyz_grad_accum=jnp.zeros((capacity, 1)),
        denom=jnp.zeros((capacity, 1)),
    )
    sh_dc = jnp.pad(rgb_to_sh(colors.astype(jnp.float32)), ((0, capacity - n), (0, 0)))
    return state, sh_dc


@functools.partial(jax.jit, static_argnums=(3, 4))
def add_densification_stats(state: GaussianState, screenspace_grad: jax.Array,
                            radii: jax.Array, width: int | None = None,
                            height: int | None = None) -> GaussianState:
    """Accumulate ||dL/d mean2d|| for visible gaussians (:658-660) and track
    max screen radius.

    ``screenspace_grad`` arrives in PIXEL units (the rasterizer adds the
    offset to the pixel-space mean2d); the reference's CUDA backward returns
    NDC-unit gradients (dL_dmean2D scaled by ddelx_dx = 0.5*W / 0.5*H), which
    is what densify_grad_threshold=0.0002 is calibrated against. Pass the
    image dims so the accumulated norm matches the reference's units.
    """
    visible = (radii > 0) & state.active
    g = screenspace_grad[:, :2]
    if width is not None and height is not None:
        g = g * jnp.asarray([0.5 * width, 0.5 * height], g.dtype)
    gnorm = jnp.linalg.norm(g, axis=-1, keepdims=True)
    return state._replace(
        xyz_grad_accum=state.xyz_grad_accum + jnp.where(visible[:, None], gnorm, 0.0),
        denom=state.denom + visible[:, None].astype(jnp.float32),
        max_radii2d=jnp.maximum(state.max_radii2d, jnp.where(visible, radii, 0.0)),
    )


def _append_slots(state: GaussianState, new_vals: dict, want: jax.Array):
    """Scatter ``new_vals`` rows (where want[i]) into free slots. Rows that
    do not fit (capacity exhausted) are dropped silently."""
    c = state.capacity
    free_rank = jnp.cumsum(~state.active) - 1  # rank of each free slot
    # dest_for_rank[r] = index of the r-th free slot.
    slot_order = jnp.argsort(state.active, stable=True)  # free slots first
    want_rank = jnp.cumsum(want) - 1  # rank among selected
    dest = jnp.where(want, slot_order[jnp.clip(want_rank, 0, c - 1)], c)  # c = drop
    n_free = jnp.sum(~state.active)
    dest = jnp.where(want & (want_rank < n_free), dest, c)

    def scatter(target, values):
        return target.at[dest].set(values, mode="drop")

    new_active = state.active.at[dest].set(True, mode="drop")
    updated = {k: scatter(getattr(state, k), v) for k, v in new_vals.items()}
    zeros1 = jnp.zeros((c, 1))
    return state._replace(
        active=new_active,
        max_radii2d=jnp.zeros(c),
        xyz_grad_accum=zeros1,
        denom=zeros1,
        **updated,
    ), dest


def avg_densify_grads(state: GaussianState) -> jax.Array:
    """Per-gaussian mean accumulated screen-space grad norm [C, 1].

    Compute this ONCE per densification event and pass it to both
    densify_and_clone and densify_and_split: appending slots resets the
    accumulators, so recomputing inside the second call would see zeros
    (the reference captures `grads` before both calls,
    `scene/gaussian_model.py:560-566`).
    """
    return jnp.nan_to_num(state.xyz_grad_accum / jnp.maximum(state.denom, 1.0))


@functools.partial(jax.jit, static_argnames=())
def densify_and_clone(state: GaussianState, grad_threshold: float,
                      percent_dense: float, scene_extent: float,
                      grads: jax.Array | None = None):
    """:545-558. Returns (state, appended_slot_mask [C])."""
    if grads is None:
        grads = avg_densify_grads(state)
    sel = (
        (grads[:, 0] >= grad_threshold)
        & (jnp.max(get_scaling(state), axis=1) <= percent_dense * scene_extent)
        & state.active
    )
    new_state, dest = _append_slots(
        state,
        {"xyz": state.xyz, "scaling": state.scaling, "rotation": state.rotation,
         "opacity": state.opacity, "mask": state.mask},
        sel,
    )
    slot_mask = jnp.zeros(state.capacity, bool).at[dest].set(True, mode="drop")
    return new_state, slot_mask


@functools.partial(jax.jit, static_argnames=("n_split",))
def densify_and_split(state: GaussianState, key: jax.Array, grad_threshold: float,
                      percent_dense: float, scene_extent: float, n_split: int = 2,
                      grads: jax.Array | None = None):
    """:520-543. Each selected gaussian becomes n_split samples at scale/1.6;
    the original is pruned. Returns (state, appended_slot_mask)."""
    if grads is None:
        grads = avg_densify_grads(state)
    scaling = get_scaling(state)
    sel = (
        (grads[:, 0] >= grad_threshold)
        & (jnp.max(scaling, axis=1) > percent_dense * scene_extent)
        & state.active
    )

    appended = jnp.zeros(state.capacity, bool)
    for i in range(n_split):
        key, sub = jax.random.split(key)
        samples = jax.random.normal(sub, state.xyz.shape) * scaling
        rots = build_rotation(state.rotation)
        offset = jnp.einsum("nij,nj->ni", rots, samples)
        new_vals = {
            "xyz": state.xyz + offset,
            "scaling": jnp.log(scaling / (0.8 * n_split)),
            "rotation": state.rotation,
            "opacity": state.opacity,
            "mask": state.mask,
        }
        state, dest = _append_slots(state, new_vals, sel)
        appended = appended.at[dest].set(True, mode="drop")
    # Prune originals.
    state = state._replace(active=state.active & ~sel)
    return state, appended


@jax.jit
def prune(state: GaussianState, min_opacity: float, extent: float,
          max_screen_size: float) -> GaussianState:
    """:560-573 prune clause: mask gate off, low opacity, or too big."""
    p = (jax.nn.sigmoid(state.mask[:, 0]) <= 0.01) | (get_opacity(state)[:, 0] < min_opacity)
    big_vs = jnp.where(max_screen_size > 0, state.max_radii2d > max_screen_size, False)
    big_ws = jnp.where(max_screen_size > 0,
                       jnp.max(get_scaling(state), axis=1) > 0.1 * extent, False)
    return state._replace(active=state.active & ~(p | big_vs | big_ws))


@jax.jit
def mask_prune(state: GaussianState) -> GaussianState:
    """:575-578."""
    return state._replace(
        active=state.active & ~(jax.nn.sigmoid(state.mask[:, 0]) <= 0.01)
    )


@jax.jit
def reset_opacity(state: GaussianState) -> GaussianState:
    """3DGS opacity reset: clamp to at most 0.01 (:434-438)."""
    new_op = jnp.minimum(state.opacity, inverse_sigmoid(jnp.asarray(0.01)))
    return state._replace(opacity=new_op)


def reset_stats(state: GaussianState) -> GaussianState:
    c = state.capacity
    return state._replace(
        max_radii2d=jnp.zeros(c),
        xyz_grad_accum=jnp.zeros((c, 1)),
        denom=jnp.zeros((c, 1)),
    )


def recompact_order(state: GaussianState) -> jax.Array:
    """Stable permutation that packs active slots to the front."""
    return jnp.argsort(~state.active, stable=True)


def shrink_tree(tree, order: jax.Array, new_capacity: int):
    """Permute-and-slice every [C, ...] leaf of a pytree to
    ``new_capacity`` rows (leaves whose leading dim differs pass through
    — e.g. optimizer step counts). Apply the SAME order to the trainer
    state and its Adam moments so slots stay aligned."""
    c = order.shape[0]

    def fix(leaf):
        if isinstance(leaf, jax.Array) and leaf.ndim >= 1 and leaf.shape[0] == c:
            return leaf[order][:new_capacity]
        return leaf

    return jax.tree.map(fix, tree)


def capacity_bucket(n_active: int, floor: int = 8192, headroom: int = 2) -> int:
    """Power-of-2 capacity for ``n_active`` splats with densification
    headroom. TPU-first redesign of the reference's dynamically-growing
    tensors (`gaussian_model.py:449-578` cat/prune reallocates every
    call): XLA wants static shapes, so live counts map onto pow-2 buckets
    and jit retraces once per bucket. Shrinking after prune events removes
    dead colorfield + rasterizer work — the dominant per-step cost scales
    with capacity, and real scenes spend >90% of the schedule far below
    their initial point count."""
    need = max(int(n_active) * headroom, floor)
    return 1 << (need - 1).bit_length()


def grow_tree(tree, old_capacity: int, new_capacity: int):
    """Pad every [C, ...] leaf with zeros up to ``new_capacity`` rows (the
    inverse of shrink_tree; padded slots are inactive and their Adam
    moments zero, exactly like fresh capacity)."""
    def fix(leaf):
        if (isinstance(leaf, jax.Array) and leaf.ndim >= 1
                and leaf.shape[0] == old_capacity):
            pad = [(0, new_capacity - old_capacity)] + [(0, 0)] * (leaf.ndim - 1)
            return jnp.pad(leaf, pad)
        return leaf

    return jax.tree.map(fix, tree)
