"""Neural color field: multires hash grid + style-conditioned MLP -> SH.

TPU-native replacement for the tiny-cuda-nn pair in the reference
(`scene/gaussian_model.py:74-104`): a HashGrid encoding (16 levels x 2
features, 2^19 table, base res 16, per-level scale 1.447) of the contracted
position, concatenated with a normalized style embedding (Linear 512 ->
style_dim, renderer `gaussian_renderer/__init__.py:91-104`), through a
64-wide 2-hidden-layer ReLU MLP to 48 outputs = deg-3 SH coefficients
[16, 3] per Gaussian.

Implementation: per-level trilinear interpolation over a hashed table —
8 gathers + lerp per level, batched over N Gaussians; the MLP is three
matmuls. Hash function is the standard spatial hash (primes 1,
2654435761, 805459861); we train from scratch so only self-consistency
matters (SURVEY.md §7.iii).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

N_LEVELS = 16
N_FEATURES = 2
LOG2_HASHMAP = 19
BASE_RES = 16
PER_LEVEL_SCALE = 1.447

_PRIMES = (1, 2654435761, 805459861)


class ColorFieldParams(NamedTuple):
    hash_tables: jax.Array  # [L, T, F]
    mlp_w1: jax.Array
    mlp_b1: jax.Array
    mlp_w2: jax.Array
    mlp_b2: jax.Array
    mlp_w3: jax.Array
    mlp_b3: jax.Array
    style_w: jax.Array | None  # [512, style_dim]
    style_b: jax.Array | None


def level_resolutions(n_levels: int = N_LEVELS):
    return [int(BASE_RES * PER_LEVEL_SCALE**l) for l in range(n_levels)]


def level_table_sizes(log2_hashmap: int = LOG2_HASHMAP,
                      n_levels: int = N_LEVELS):
    """Effective entries per level: tcnn parity — levels whose dense grid
    ((res+1)^3 corners, 8-aligned) fits under the hashmap budget are stored
    DENSE (no hashing); larger levels hash into 2^log2_hashmap entries.
    At the stock 16-level / 2^19 config this sums to 6.30M entries =
    25.20 MB fp16, exactly the reference's hash-grid storage line
    (`Style_3DGS/storage:6`, written by gaussian_model.py:624-632)."""
    return level_table_sizes_for_cap(2 ** log2_hashmap, n_levels)


def level_table_sizes_for_cap(table_cap: int, n_levels: int = N_LEVELS):
    sizes = []
    for res in level_resolutions(n_levels):
        dense8 = -(-((res + 1) ** 3) // 8) * 8
        sizes.append(dense8 if dense8 <= table_cap else table_cap)
    return sizes


def init_colorfield(key: jax.Array, style_dim: int | None = 256,
                    log2_hashmap: int = LOG2_HASHMAP) -> ColorFieldParams:
    t = 2**log2_hashmap
    keys = jax.random.split(key, 8)
    tables = jax.random.uniform(keys[0], (N_LEVELS, t, N_FEATURES),
                                minval=-1e-4, maxval=1e-4)
    n_enc = N_LEVELS * N_FEATURES
    n_in = n_enc + (style_dim or 0)

    def lin(k, i, o):
        return jax.random.normal(k, (i, o)) * jnp.sqrt(2.0 / i)

    style_w = lin(keys[5], 512, style_dim) if style_dim else None
    style_b = jnp.zeros((style_dim,)) if style_dim else None
    return ColorFieldParams(
        hash_tables=tables,
        mlp_w1=lin(keys[1], n_in, 64), mlp_b1=jnp.zeros((64,)),
        mlp_w2=lin(keys[2], 64, 64), mlp_b2=jnp.zeros((64,)),
        mlp_w3=lin(keys[3], 64, 48), mlp_b3=jnp.zeros((48,)),
        style_w=style_w, style_b=style_b,
    )


def contract_to_unisphere(x: jax.Array, aabb=(-1.0, -1.0, -1.0, 1.0, 1.0, 1.0),
                          eps: float = 1e-6) -> jax.Array:
    """Mip-NeRF-360 scene contraction (gaussian_model.py:662-685 parity).

    Maps R^3 into [0, 1]^3: inside the aabb linearly, outside by 2-1/|x|.
    """
    aabb = jnp.asarray(aabb, x.dtype)
    lo, hi = aabb[:3], aabb[3:]
    y = (x - lo) / (hi - lo) * 2.0 - 1.0
    mag = jnp.linalg.norm(y, axis=-1, keepdims=True)
    mag = jnp.maximum(mag, eps)
    contracted = (2.0 - 1.0 / mag) * (y / mag)
    y = jnp.where(mag > 1.0, contracted, y)
    return y / 4.0 + 0.5


def _hash_corner(ix: jax.Array, iy: jax.Array, iz: jax.Array, table_size: int) -> jax.Array:
    h = (
        ix.astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
        ^ iy.astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
        ^ iz.astype(jnp.uint32) * jnp.uint32(_PRIMES[2])
    )
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


def _corner_index(p0i, ox, oy, oz, res: int, table_cap: int) -> jax.Array:
    """Per-level corner -> table row. tcnn parity: DENSE linear indexing
    when the (res+1)^3 grid (8-aligned) fits the hashmap budget — no
    collisions on coarse levels — otherwise the spatial hash. Corner
    coords clamp to res (contracted positions live in [0.25, 0.75] so the
    boundary is never hit in practice)."""
    if -(-((res + 1) ** 3) // 8) * 8 <= table_cap:
        ix = jnp.minimum(p0i[:, 0] + ox, res)
        iy = jnp.minimum(p0i[:, 1] + oy, res)
        iz = jnp.minimum(p0i[:, 2] + oz, res)
        return (ix + (res + 1) * (iy + (res + 1) * iz)).astype(jnp.int32)
    return _hash_corner(p0i[:, 0] + ox, p0i[:, 1] + oy, p0i[:, 2] + oz,
                        table_cap)


def hash_encode(tables: jax.Array, x01: jax.Array) -> jax.Array:
    """[N, 3] positions in [0,1] -> [N, L*F] multires features."""
    feats = []
    for lvl, res in enumerate(level_resolutions(tables.shape[0])):
        pos = x01 * res
        p0 = jnp.floor(pos)
        frac = pos - p0
        p0i = p0.astype(jnp.int32)
        level_feats = 0.0
        for corner in range(8):
            ox, oy, oz = corner & 1, (corner >> 1) & 1, (corner >> 2) & 1
            idx = _corner_index(p0i, ox, oy, oz, res, tables.shape[1])
            wx = frac[:, 0] if ox else (1.0 - frac[:, 0])
            wy = frac[:, 1] if oy else (1.0 - frac[:, 1])
            wz = frac[:, 2] if oz else (1.0 - frac[:, 2])
            weight = (wx * wy * wz)[:, None]
            level_feats = level_feats + weight * tables[lvl][idx]
        feats.append(level_feats)
    return jnp.concatenate(feats, axis=1)


def _encode_terms(tables_shape, x01):
    """Shared index/weight computation: returns (idx [N, L, 8] with level
    offsets, w [N, L, 8])."""
    l, t, _f = tables_shape
    idx_levels, w_levels = [], []
    for lvl, res in enumerate(level_resolutions(l)):
        pos = x01 * res
        p0 = jnp.floor(pos)
        frac = pos - p0
        p0i = p0.astype(jnp.int32)
        idx_c, w_c = [], []
        for corner in range(8):
            ox, oy, oz = corner & 1, (corner >> 1) & 1, (corner >> 2) & 1
            idx = _corner_index(p0i, ox, oy, oz, res, t)
            wx = frac[:, 0] if ox else (1.0 - frac[:, 0])
            wy = frac[:, 1] if oy else (1.0 - frac[:, 1])
            wz = frac[:, 2] if oz else (1.0 - frac[:, 2])
            idx_c.append(idx + lvl * t)
            w_c.append(wx * wy * wz)
        idx_levels.append(jnp.stack(idx_c, 1))
        w_levels.append(jnp.stack(w_c, 1))
    return jnp.stack(idx_levels, 1), jnp.stack(w_levels, 1)


@jax.custom_vjp
def hash_encode_sg(tables: jax.Array, x01: jax.Array) -> jax.Array:
    """hash_encode with a sort-based gradient (positions are treated as
    stop-gradient, as the renderer does — gaussian_model.py:91 detaches xyz).

    The straightforward backward is a scatter-add of N*L*8 rows into the
    [L*T, F] table (~1.05 s at 131k points / 2^19 on v5e). This variant
    reduces segments via sort + cumsum + vectorized binary search instead —
    measured SLOWER on TPU (4.3 s: XLA's TPU sort is costlier than the
    scatter), so it is NOT the default; kept as the reference implementation
    for a future Pallas binned-scatter backward and for backends with fast
    sorts. Gradients verified identical to autodiff.
    """
    return hash_encode(tables, x01)


def _hash_encode_sg_fwd(tables, x01):
    return hash_encode(tables, x01), (tables.shape, x01)


def _hash_encode_sg_bwd(res, g_out):
    tables_shape, x01 = res
    l, t, f = tables_shape
    n = x01.shape[0]
    idx, w = _encode_terms(tables_shape, x01)           # [N, L, 8]
    # Update values: dL/dtable[idx[n,l,c]] += w[n,l,c] * g_out[n, l*F:(l+1)F]
    g = g_out.reshape(n, l, 1, f)                        # [N, L, 1, F]
    vals = (w[..., None] * g).reshape(-1, f)             # [N*L*8, F]
    flat_idx = idx.reshape(-1)                           # [M]

    order = jnp.argsort(flat_idx)
    sorted_idx = flat_idx[order]
    sorted_vals = vals[order]
    csum = jnp.concatenate([jnp.zeros((1, f), sorted_vals.dtype),
                            jnp.cumsum(sorted_vals, axis=0)], axis=0)
    rows = jnp.arange(l * t, dtype=sorted_idx.dtype)
    lo = jnp.searchsorted(sorted_idx, rows, side="left")
    hi = jnp.searchsorted(sorted_idx, rows, side="right")
    table_grad = (csum[hi] - csum[lo]).reshape(l, t, f)
    return table_grad, jnp.zeros_like(x01)


hash_encode_sg.defvjp(_hash_encode_sg_fwd, _hash_encode_sg_bwd)


# ---------------------------------------------------------------------------
# MXU segment-sum backward: the table gradient as dense matmuls
# ---------------------------------------------------------------------------
#
# XLA lowers scatter-add with duplicate indices to a serialized update loop
# on TPU (~15M updates/s -> ~1s for the 16.7M-row hash gradient at 131k
# points); sorting first is even slower (TPU sort). Instead, decompose each
# table index as idx = hi * LO + lo and compute, per level,
#   G[hi, lo*F + f] = sum_m onehot(hi_m)[hi] * (onehot(lo_m)[lo] * v[m, f])
# i.e. one [M, HI]^T @ [M, LO*F] matmul per chunk of updates -- dense bf16
# MXU work with f32 accumulation, no serialization. Total FLOPs are
# 2*M*T*F per level; on a v5e this beats the scatter whenever the table is
# large enough for scatter serialization to dominate.

def _mxu_chunk_for(n_levels: int, hi: int, lo_f: int) -> int:
    """Chunk size keeping the materialized per-step one-hot operands
    (n_levels * chunk * max(hi, lo_f) bf16 entries) around <=128MB."""
    budget = 128 * 1024 * 1024 // 2  # bf16 entries
    c = max(512, budget // max(1, n_levels * max(hi, lo_f)))
    return 1 << (c.bit_length() - 1)


@jax.custom_vjp
def hash_encode_mxu(tables: jax.Array, x01: jax.Array) -> jax.Array:
    """hash_encode with the table gradient computed on the MXU (see above).

    Positions are treated as stop-gradient, matching the renderer
    (gaussian_model.py:91 detaches xyz before the tcnn encoder).
    """
    return hash_encode(tables, x01)


def _hash_encode_mxu_fwd(tables, x01):
    return hash_encode(tables, x01), (tables.shape, x01)


def _hash_encode_mxu_bwd(res, g_out):
    tables_shape, x01 = res
    l, t, f = tables_shape
    n = x01.shape[0]
    idx, w = _encode_terms(tables_shape, x01)            # [N, L, 8]
    local = (idx - jnp.arange(l, dtype=idx.dtype)[None, :, None] * t)
    g = g_out.reshape(n, l, 1, f)
    vals = (w[..., None] * g)                            # [N, L, 8, F]

    hi_all = local.transpose(1, 0, 2).reshape(l, -1)            # [L, M]
    v_all = vals.transpose(1, 0, 2, 3).reshape(l, -1, f)        # [L, M, F]

    # Group levels by effective table size (tcnn parity: dense coarse
    # levels are far smaller than the hashed budget — their one-hot dots
    # shrink with t_eff, so a uniform-T decomposition would waste MXU
    # work on rows that can never be touched).
    sizes = level_table_sizes_for_cap(t, l)
    groups: list[tuple[int, list[int]]] = []
    for lvl, te in enumerate(sizes):
        if groups and groups[-1][0] == te:
            groups[-1][1].append(lvl)
        else:
            groups.append((te, [lvl]))

    parts = []
    for te, levels in groups:
        lo_bits = max(1, (te - 1).bit_length() // 2)
        lo_n = 1 << lo_bits
        hi_n = (te + lo_n - 1) // lo_n
        hi_g = hi_all[levels, :] >> lo_bits
        lo_g = hi_all[levels, :] & (lo_n - 1)
        v_g = v_all[levels, :, :]
        acc = _grad_group(hi_g, lo_g, v_g, hi_n, lo_n, f)
        grad_g = acc.reshape(len(levels), hi_n * lo_n, f)[:, :te, :]
        parts.append(jnp.pad(grad_g, ((0, 0), (0, t - te), (0, 0))))
    table_grad = jnp.concatenate(parts, axis=0)
    return table_grad.astype(g_out.dtype), jnp.zeros_like(x01)


def _grad_group(hi, lo, v, hi_n: int, lo_n: int, f: int):
    """[Lg, M] index streams + [Lg, M, F] values -> [Lg, hi_n, lo_n*F]
    accumulator, platform-dispatched between the Pallas kernel and the
    XLA one-hot-matmul scan."""
    l = hi.shape[0]

    def pallas_branch(hi, lo, v):
        # Fused Pallas path: one-hots built in VMEM, no HBM materialization
        # of the [C, HI]/[C, LO*F] operands (halves the backward time).
        from aip_tpu.ops.pallas.hashgrad import hash_grad_pallas

        return hash_grad_pallas(hi, lo, v, hi_n, lo_n)

    def xla_branch(hi, lo, v):
        m = hi.shape[1]
        chunk = _mxu_chunk_for(l, hi_n, lo_n * f)
        # Pad M to a chunk multiple with hi index = hi_n (one-hot row of zeros).
        pad = (-m) % chunk
        if pad:
            hi = jnp.pad(hi, ((0, 0), (0, pad)), constant_values=hi_n)
            lo = jnp.pad(lo, ((0, 0), (0, pad)))
            v = jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
        steps = (m + pad) // chunk
        hi = hi.reshape(l, steps, chunk).transpose(1, 0, 2)          # [S, L, C]
        lo = lo.reshape(l, steps, chunk).transpose(1, 0, 2)
        v = v.reshape(l, steps, chunk, f).transpose(1, 0, 2, 3)      # [S, L, C, F]

        iota_hi = jnp.arange(hi_n, dtype=hi.dtype)
        iota_lo = jnp.arange(lo_n, dtype=lo.dtype)

        def body(acc, operands):
            hi_c, lo_c, v_c = operands                               # [L, C], [L, C, F]
            hi_oh = (hi_c[..., None] == iota_hi).astype(jnp.bfloat16)        # [L, C, HI]
            lo_v = ((lo_c[..., None] == iota_lo)[..., None].astype(jnp.bfloat16)
                    * v_c[..., None, :].astype(jnp.bfloat16))                # [L, C, LO, F]
            lo_v = lo_v.reshape(lo_v.shape[0], lo_v.shape[1], lo_n * f)
            acc = acc + jnp.einsum(
                "lch,lck->lhk", hi_oh, lo_v,
                preferred_element_type=jnp.float32,
            )
            return acc, None

        acc0 = jnp.zeros((l, hi_n, lo_n * f), jnp.float32)
        acc, _ = jax.lax.scan(body, acc0, (hi, lo, v))
        return acc

    # Platform-resolved dispatch (NOT trace-time jax.default_backend():
    # the branch must follow the platform the computation lowers for, so
    # CPU-placed jits inside a TPU-default process — and AOT lowering —
    # pick the right kernel).
    return jax.lax.platform_dependent(hi, lo, v,
                                      tpu=pallas_branch, default=xla_branch)


hash_encode_mxu.defvjp(_hash_encode_mxu_fwd, _hash_encode_mxu_bwd)


def style_embedding(params: ColorFieldParams, style_f: jax.Array) -> jax.Array:
    """Pooled VGG style feature [1, 512] -> normalized [1, style_dim]
    (renderer :91-96: Linear then L2-normalize)."""
    e = style_f @ params.style_w + params.style_b
    return e / jnp.linalg.norm(e, axis=1, keepdims=True)


def precompute_features(params: ColorFieldParams, xyz: jax.Array) -> jax.Array:
    """Cache the hash-grid features for a fixed Gaussian set
    (gaussian_model.precompute parity, :653-656) — rendering under many
    styles then only re-runs style_fc + MLP."""
    x01 = contract_to_unisphere(jax.lax.stop_gradient(xyz))
    return hash_encode(params.hash_tables, x01)


def predict_sh(params: ColorFieldParams, xyz: jax.Array,
               style_f: jax.Array | None = None,
               precomputed_enc: jax.Array | None = None) -> jax.Array:
    """[N, 3] world positions (+ optional [1, 512] style) -> [N, 16, 3] SH.

    Mirrors the renderer wiring (:91-104): contract -> hash encode ->
    concat(normalized style embedding) -> MLP -> 48 = 16x3 SH coefficients.
    ``precomputed_enc`` skips the encoding (gaussian_model.precompute
    parity, :653-656).
    """
    if precomputed_enc is None:
        x01 = contract_to_unisphere(jax.lax.stop_gradient(xyz))
        # Large tables take the MXU segment-sum backward: XLA's serialized
        # scatter-add costs ~700ms fwd+bwd at 131k pts / 2^19 vs ~330ms for
        # the dense-matmul gradient (scripts/bench_hashgrad.py, v5e). Small
        # tables (tests, previews) keep the plain scatter — it compiles much
        # faster and wins when T is small.
        if params.hash_tables.shape[1] >= (1 << 16):
            enc = hash_encode_mxu(params.hash_tables, x01)
        else:
            enc = hash_encode(params.hash_tables, x01)
    else:
        enc = precomputed_enc
    if params.style_w is not None:
        if style_f is None:
            # Style-conditioned field queried without a style: condition on a
            # zero embedding rather than failing with a shape error.
            emb = jnp.zeros((1, params.style_w.shape[1]))
        else:
            emb = style_embedding(params, style_f)
        enc = jnp.concatenate(
            [enc, jnp.broadcast_to(emb, (enc.shape[0], emb.shape[1]))], axis=1
        )
    h = jax.nn.relu(enc @ params.mlp_w1 + params.mlp_b1)
    h = jax.nn.relu(h @ params.mlp_w2 + params.mlp_b2)
    out = h @ params.mlp_w3 + params.mlp_b3
    return out.reshape(-1, 16, 3)
