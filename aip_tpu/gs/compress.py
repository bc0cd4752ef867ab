"""Model compression & storage: post-quant, Huffman, npz save/load, report.

Parity with reference `scene/gaussian_model.py`:
* ``final_prune`` (:607-651) — mask prune, RVQ codebook quantization of
  scale/rotation, storage accounting string;
* ``post_quant`` (:580-588) — 8-bit uniform quantization (optionally pruning
  near-zero entries) of the hash grid;
* ``huffman_encode`` (:590-605) — entropy coding of RVQ indices / quantized
  grid (dahuffman replaced by a self-contained canonical Huffman codec);
* ``save_npz``/``load_npz`` (:295-333, :340-396) — compressed checkpoint;
* Morton ``sort_morton`` (:687-699) before storage.

All host-side numpy; device state converts at the boundary.
"""

from __future__ import annotations

import heapq
import json
from collections import Counter
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from aip_tpu.gs import gaussians as G
from aip_tpu.gs import rvq as rvq_mod
from aip_tpu.ops.morton import morton_encode_np


# ---------------------------------------------------------------------------
# Canonical Huffman codec (dahuffman stand-in)
# ---------------------------------------------------------------------------

def huffman_build(symbols: np.ndarray) -> dict:
    """Symbol frequencies -> {symbol: (code_int, code_len)}."""
    freq = Counter(symbols.tolist())
    if len(freq) == 1:
        (s,) = freq
        return {s: (0, 1)}
    heap = [(f, i, s, None, None) for i, (s, f) in enumerate(freq.items())]
    heapq.heapify(heap)
    counter = len(heap)
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        heapq.heappush(heap, (a[0] + b[0], counter, None, a, b))
        counter += 1
    codes = {}

    def walk(node, code, length):
        _f, _i, sym, left, right = node
        if sym is not None:
            codes[sym] = (code, max(length, 1))
            return
        walk(left, code << 1, length + 1)
        walk(right, (code << 1) | 1, length + 1)

    walk(heap[0], 0, 0)
    return codes


def huffman_encode(symbols: np.ndarray):
    """Returns (packed_bytes, codes, n_symbols, total_bits).

    Code lengths come from the Huffman tree; the emitted codes are
    *canonical* (equivalent lengths, deterministic values), packed by the
    native bit codec (aip_tpu.runtime.bitcodec) with a numpy fallback.
    """
    from aip_tpu.runtime import bitcodec

    tree_codes = huffman_build(symbols)
    lengths = {s: l for s, (_c, l) in tree_codes.items()}
    codes, _tables = bitcodec.canonical_codes(lengths)
    packed, total_bits = bitcodec.pack(np.asarray(symbols), codes)
    return packed, codes, len(symbols), total_bits


def huffman_decode(packed: np.ndarray, codes: dict, n_symbols: int) -> np.ndarray:
    from aip_tpu.runtime import bitcodec

    lengths = {s: l for s, (_c, l) in codes.items()}
    _codes, tables = bitcodec.canonical_codes(lengths)
    return bitcodec.unpack(np.asarray(packed), n_symbols, tables)


def _encode_stream(symbols: np.ndarray) -> dict:
    """Huffman-encode a flat int stream into npz-storable arrays: packed
    bitstream + (symbol, code-length) table (canonical codes are fully
    determined by the lengths)."""
    packed, codes, n, total_bits = huffman_encode(symbols)
    syms = np.fromiter(codes.keys(), np.int64, len(codes))
    lens = np.fromiter((codes[int(s)][1] for s in syms), np.uint8, len(syms))
    return {"packed": packed, "syms": syms, "lens": lens,
            "n": np.int64(n), "bits": np.int64(total_bits)}


def _decode_stream(d, prefix: str) -> np.ndarray:
    from aip_tpu.runtime import bitcodec

    lengths = {int(s): int(l) for s, l in zip(d[f"{prefix}_syms"], d[f"{prefix}_lens"])}
    _codes, tables = bitcodec.canonical_codes(lengths)
    return bitcodec.unpack(np.asarray(d[f"{prefix}_packed"]),
                           int(d[f"{prefix}_n"]), tables)


def huffman_size_bytes(symbols: np.ndarray) -> float:
    """Entropy-coded size in bytes (codebook overhead excluded, as in the
    reference's accounting which reports the coded stream)."""
    codes = huffman_build(symbols)
    freq = Counter(symbols.tolist())
    total_bits = sum(freq[s] * codes[s][1] for s in freq)
    return total_bits / 8.0


# ---------------------------------------------------------------------------
# Post-quantization (gaussian_model.post_quant parity)
# ---------------------------------------------------------------------------

def post_quant(param: np.ndarray, prune: bool = False):
    """8-bit uniform quantization; returns (dequantized, int_codes, scale).

    Mirrors :580-588: max-abs scaling to [-127, 127]; ``prune`` zeroes
    entries with |value| < scale (i.e. quantized magnitude < 1)."""
    max_val = np.abs(param).max()
    scale = max_val / 127.0 if max_val > 0 else 1.0
    q = np.round(param / scale).astype(np.int8)
    if prune:
        q = np.where(np.abs(param) < scale, 0, q)
    return q.astype(np.float32) * scale, q, scale


# ---------------------------------------------------------------------------
# Save / load
# ---------------------------------------------------------------------------

def sort_active_by_morton(state: G.GaussianState):
    """Return active indices in Morton order (:687-699)."""
    active = np.asarray(state.active)
    xyz = np.asarray(state.xyz)[active]
    lo, hi = xyz.min(0), xyz.max(0)
    grid = ((2**21 - 1) * (xyz - lo) / np.maximum(hi - lo, 1e-12)).astype(np.uint64)
    order = np.argsort(morton_encode_np(grid), kind="stable")
    return np.nonzero(active)[0][order]


def save_npz(path, state: G.GaussianState, field, rvq_scale: rvq_mod.RVQState,
             rvq_rot: rvq_mod.RVQState, style_dim: int = 256) -> str:
    """Compressed save (save_npz parity) + storage report string."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    order = sort_active_by_morton(state)

    xyz = np.asarray(state.xyz)[order].astype(np.float16)
    opacity = np.asarray(state.opacity)[order].astype(np.float16)
    scales = np.asarray(G.get_scaling(state))[order]
    rots = np.asarray(G.get_rotation(state))[order]

    _, sc_idx = rvq_mod.quantize(rvq_scale, jnp.asarray(scales))
    _, ro_idx = rvq_mod.quantize(rvq_rot, jnp.asarray(rots))
    sc_idx = np.asarray(sc_idx).astype(np.int32)
    ro_idx = np.asarray(ro_idx).astype(np.int32)

    # Only each level's EFFECTIVE rows are serialized (tcnn parity: dense
    # coarse levels are far smaller than the hashed budget — rows past
    # level_table_sizes are unreachable padding; see colorfield.py).
    from aip_tpu.gs.colorfield import level_table_sizes_for_cap

    tables_np = np.asarray(field.hash_tables)
    lvl_sizes = level_table_sizes_for_cap(tables_np.shape[1], tables_np.shape[0])
    hash_flat = np.concatenate(
        [tables_np[i, :s] for i, s in enumerate(lvl_sizes)], axis=0)
    hash_q, hash_codes, hash_scale = post_quant(hash_flat, prune=True)

    mlp = {
        f"mlp_{k}": np.asarray(getattr(field, k)).astype(np.float16)
        for k in ("mlp_w1", "mlp_b1", "mlp_w2", "mlp_b2", "mlp_w3", "mlp_b3")
    }
    if field.style_w is not None:
        mlp["style_w"] = np.asarray(field.style_w).astype(np.float16)
        mlp["style_b"] = np.asarray(field.style_b).astype(np.float16)

    # Entropy-code the index/grid streams so the on-disk artifact is the
    # Huffman bitstream the storage report describes (reference save_npz /
    # huffman_encode path, gaussian_model.py:295-333,590-605).
    sc_stream = _encode_stream(sc_idx.ravel())
    ro_stream = _encode_stream(ro_idx.ravel())
    hash_stream = _encode_stream(hash_codes.ravel().astype(np.int64))

    np.savez_compressed(
        str(path),
        xyz=xyz, opacity=opacity,
        sc_shape=np.asarray(sc_idx.shape), ro_shape=np.asarray(ro_idx.shape),
        sc_books=np.asarray(rvq_scale.codebooks).astype(np.float16),
        ro_books=np.asarray(rvq_rot.codebooks).astype(np.float16),
        hash_shape=np.asarray(np.asarray(field.hash_tables).shape),
        hash_scale=np.asarray(hash_scale),
        **{f"sc_{k}": v for k, v in sc_stream.items()},
        **{f"ro_{k}": v for k, v in ro_stream.items()},
        **{f"hash_{k}": v for k, v in hash_stream.items()},
        **mlp,
    )

    # Storage accounting (final_prune :624-647 format) from the ACTUAL
    # serialized bitstream sizes.
    pos_mb = xyz.nbytes / 1e6
    sc_mb = (sc_stream["packed"].nbytes
             + np.asarray(rvq_scale.codebooks).astype(np.float16).nbytes) / 1e6
    ro_mb = (ro_stream["packed"].nbytes
             + np.asarray(rvq_rot.codebooks).astype(np.float16).nbytes) / 1e6
    op_mb = opacity.nbytes / 1e6
    hash_mb = hash_stream["packed"].nbytes / 1e6
    mlp_mb = sum(v.nbytes for v in mlp.values()) / 1e6
    total = pos_mb + sc_mb + ro_mb + op_mb + hash_mb + mlp_mb
    # Exact reference report format (`Style_3DGS/storage`, written by
    # gaussian_model.py:624-647): "Storage" header, bare per-component
    # values, " MB" suffix only on the total.
    report = (
        "Storage\n"
        f"position: {round(pos_mb, 6)}\n"
        f"scale: {round(sc_mb, 6)}\n"
        f"rotation: {round(ro_mb, 6)}\n"
        f"opacity: {round(op_mb, 6)}\n"
        f"hash: {round(hash_mb, 6)}\n"
        f"mlp: {round(mlp_mb, 6)}\n"
        f"total: {round(total, 6)} MB"
    )
    return report


def save_ply(path, state: G.GaussianState, field=None, style_f=None) -> str:
    """Standard 3DGS PLY export (gaussian_model.save_ply parity, :254-293):
    bakes the (style-conditioned) neural SH into f_dc/f_rest attributes so
    external 3DGS viewers can load the stylized scene."""
    from aip_tpu.gs.dataset import write_ply

    active = np.asarray(state.active)
    xyz = np.asarray(state.xyz)[active]
    opacity = np.asarray(state.opacity)[active]
    scaling = np.asarray(state.scaling)[active]
    rotation = np.asarray(state.rotation)[active]

    extra = {}
    if field is not None:
        from aip_tpu.gs.colorfield import predict_sh

        sh = np.asarray(predict_sh(field, jnp.asarray(xyz), style_f))  # [n,16,3]
        f_dc = sh[:, 0, :]                    # [n, 3]
        f_rest = sh[:, 1:, :].transpose(0, 2, 1).reshape(len(xyz), -1)  # [n, 45]
        for i in range(3):
            extra[f"f_dc_{i}"] = f_dc[:, i]
        for i in range(f_rest.shape[1]):
            extra[f"f_rest_{i}"] = f_rest[:, i]
    extra["opacity"] = opacity[:, 0]
    for i in range(3):
        extra[f"scale_{i}"] = scaling[:, i]
    for i in range(4):
        extra[f"rot_{i}"] = rotation[:, i]

    write_ply(path, xyz, rgb=None, extra=extra)
    return str(path)


def load_ply(path, capacity: int | None = None):
    """Load a standard 3DGS PLY (gaussian_model.load_ply parity, :398-432).

    Returns (GaussianState, baked_sh [C, 16, 3] or None)."""
    from aip_tpu.gs.dataset import read_ply

    d = read_ply(path)
    n = len(d["x"])
    cap = capacity or n
    xyz = np.stack([d["x"], d["y"], d["z"]], 1).astype(np.float32)
    opacity = d.get("opacity", np.zeros(n)).astype(np.float32)[:, None]
    scaling = np.stack([d[f"scale_{i}"] for i in range(3)], 1).astype(np.float32)
    rotation = np.stack([d[f"rot_{i}"] for i in range(4)], 1).astype(np.float32)

    sh = None
    if "f_dc_0" in d:
        f_dc = np.stack([d[f"f_dc_{i}"] for i in range(3)], 1)
        n_rest = len([k for k in d if k.startswith("f_rest_")])
        if n_rest:
            f_rest = np.stack([d[f"f_rest_{i}"] for i in range(n_rest)], 1)
            f_rest = f_rest.reshape(n, 3, n_rest // 3).transpose(0, 2, 1)
        else:
            f_rest = np.zeros((n, 15, 3))
        sh = np.concatenate([f_dc[:, None, :], f_rest], axis=1).astype(np.float32)
        if cap > n:
            sh = np.pad(sh, ((0, cap - n), (0, 0), (0, 0)))
        sh = jnp.asarray(sh)

    def pad(x, fill=0.0):
        return np.pad(x, [(0, cap - n)] + [(0, 0)] * (x.ndim - 1), constant_values=fill)

    state = G.GaussianState(
        xyz=jnp.asarray(pad(xyz)),
        scaling=jnp.asarray(pad(scaling)),
        rotation=jnp.asarray(pad(rotation)).at[n:, 0].set(1.0),
        opacity=jnp.asarray(pad(opacity, -10.0)),
        mask=jnp.asarray(pad(np.ones((n, 1), np.float32))),
        active=jnp.arange(cap) < n,
        max_radii2d=jnp.zeros(cap),
        xyz_grad_accum=jnp.zeros((cap, 1)),
        denom=jnp.zeros((cap, 1)),
    )
    return state, sh


def load_npz(path, capacity: int | None = None):
    """Load a compressed checkpoint. Returns (GaussianState, field arrays
    dict, rvq states). Scales/rotations are decoded from RVQ indices."""
    from aip_tpu.gs.colorfield import ColorFieldParams
    from aip_tpu.ops.quaternion import inverse_sigmoid

    d = np.load(str(path))
    n = d["xyz"].shape[0]
    cap = capacity or n

    rvq_scale = rvq_mod.RVQState(jnp.asarray(d["sc_books"].astype(np.float32)))
    rvq_rot = rvq_mod.RVQState(jnp.asarray(d["ro_books"].astype(np.float32)))
    if "sc_packed" in d:
        sc_idx = _decode_stream(d, "sc").reshape(tuple(d["sc_shape"]))
        ro_idx = _decode_stream(d, "ro").reshape(tuple(d["ro_shape"]))
    else:  # pre-entropy-coded format
        sc_idx, ro_idx = d["sc_idx"], d["ro_idx"]
    scales = np.asarray(rvq_mod.decode(rvq_scale, jnp.asarray(sc_idx)))
    rots = np.asarray(rvq_mod.decode(rvq_rot, jnp.asarray(ro_idx)))

    def pad(x, fill=0.0):
        return np.pad(x, [(0, cap - n)] + [(0, 0)] * (x.ndim - 1), constant_values=fill)

    state = G.GaussianState(
        xyz=jnp.asarray(pad(d["xyz"].astype(np.float32))),
        scaling=jnp.asarray(pad(np.log(np.maximum(scales, 1e-8)))),
        rotation=jnp.asarray(pad(rots).astype(np.float32)).at[n:, 0].set(1.0),
        opacity=jnp.asarray(pad(d["opacity"].astype(np.float32), -10.0)),
        mask=jnp.asarray(pad(np.ones((n, 1), np.float32))),
        active=jnp.arange(cap) < n,
        max_radii2d=jnp.zeros(cap),
        xyz_grad_accum=jnp.zeros((cap, 1)),
        denom=jnp.zeros((cap, 1)),
    )

    hash_shape = tuple(d["hash_shape"])
    if "hash_packed" in d:
        hash_q = _decode_stream(d, "hash")
    else:  # pre-entropy-coded format
        hash_q = d["hash_q"].reshape(-1, hash_shape[-1])
    if hash_q.size == int(np.prod(hash_shape)):
        from aip_tpu.gs.colorfield import level_table_sizes_for_cap

        lvl_sizes = level_table_sizes_for_cap(hash_shape[1], hash_shape[0])
        if sum(lvl_sizes) != hash_shape[0] * hash_shape[1]:
            # A full [L, T, F] stream at a cap where coarse levels are now
            # DENSE can only come from a pre-r3 save whose coarse levels
            # were trained under hashed indexing — decoding it with dense
            # _corner_index would silently scramble them.
            raise ValueError(
                f"{path}: legacy full-table hash stream (pre dense-level "
                "indexing). Re-train or re-save the model; coarse-level "
                "rows cannot be remapped onto the dense layout.")
        hash_q = hash_q.reshape(hash_shape)
    else:
        # Flat per-level-sized stream: re-pad each level to the uniform cap.
        from aip_tpu.gs.colorfield import level_table_sizes_for_cap

        l_lv, t_cap, f_f = hash_shape
        lvl_sizes = level_table_sizes_for_cap(t_cap, l_lv)
        flat = hash_q.reshape(-1, f_f)
        full = np.zeros(hash_shape, flat.dtype)
        off = 0
        for i, s in enumerate(lvl_sizes):
            full[i, :s] = flat[off:off + s]
            off += s
        hash_q = full
    hash_tables = hash_q.astype(np.float32) * d["hash_scale"]
    field = ColorFieldParams(
        hash_tables=jnp.asarray(hash_tables),
        mlp_w1=jnp.asarray(d["mlp_mlp_w1"].astype(np.float32)),
        mlp_b1=jnp.asarray(d["mlp_mlp_b1"].astype(np.float32)),
        mlp_w2=jnp.asarray(d["mlp_mlp_w2"].astype(np.float32)),
        mlp_b2=jnp.asarray(d["mlp_mlp_b2"].astype(np.float32)),
        mlp_w3=jnp.asarray(d["mlp_mlp_w3"].astype(np.float32)),
        mlp_b3=jnp.asarray(d["mlp_mlp_b3"].astype(np.float32)),
        style_w=jnp.asarray(d["style_w"].astype(np.float32)) if "style_w" in d else None,
        style_b=jnp.asarray(d["style_b"].astype(np.float32)) if "style_b" in d else None,
    )
    return state, field, rvq_scale, rvq_rot
