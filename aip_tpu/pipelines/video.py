"""Video style transfer with optical-flow temporal consistency.

Behavioral parity with `video/utils.py`:
* ``video_to_frames`` (:24) / ``frames_to_video`` (:374-392) — host-side
  decode/encode (cv2, mp4v, fps=20);
* ``apply_style_transfer_multi_ada`` (:304-371) — per-frame AdaIN at 256px
  with depth, style switched every ``max(1, n_frames // n_styles)`` frames,
  and the recurrence ``out_i = α·stylized_i + (1-α)·warp(out_{i-1}, flow_i)``
  with α=0.7 (:353-360, prev_stylized carries the *blended* result);
* ``run_style_transfer`` (:407-425) — demo driver.

TPU-first restructure of the reference's serial loop (SURVEY.md §3.4):
1. stylize ALL frames as one batched jitted program (per-frame style stats
   gathered from the precomputed per-style table — no regrouping needed);
2. estimate ALL consecutive-pair flows with a single vmapped program;
3. run the (cheap, inherently serial) warp+blend recurrence as a lax.scan;
4. only host work is video decode/encode.

The reference crosses the host<->device boundary twice per frame; here the
whole stylize->flow->blend graph stays on device.
"""

from __future__ import annotations

import functools
import os
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from aip_tpu.models import weights as weights_mod
from aip_tpu.models.vgg import vgg_encode
from aip_tpu.models.decoder import decoder_apply
from aip_tpu.ops.adain import calc_mean_std
from aip_tpu.ops.depth import compute_stylization_strength_map
from aip_tpu.ops.flow import (estimate_flow, estimate_flow_method,
                              warp_image, blend_images)
from aip_tpu.ops.image import resize_bilinear
from aip_tpu.pipelines.adain_infer import _to_array, precompute_style_stats


# ---------------------------------------------------------------------------
# Host-side video IO
# ---------------------------------------------------------------------------

def video_to_frames(video_path, output_dir) -> list:
    """Decode mp4 to jpg frames (video/utils.py:24-38 parity)."""
    import cv2

    Path(output_dir).mkdir(parents=True, exist_ok=True)
    cap = cv2.VideoCapture(str(video_path))
    paths = []
    i = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        p = Path(output_dir) / f"frame_{i:05d}.jpg"
        cv2.imwrite(str(p), frame)
        paths.append(p)
        i += 1
    cap.release()
    return paths


def frames_to_video(image_folder, output_video, fps: int = 20) -> None:
    """jpg frames -> mp4 (video/utils.py:374-392 parity)."""
    import cv2

    images = sorted(f for f in os.listdir(image_folder) if f.endswith(".jpg"))
    if not images:
        return
    first = cv2.imread(os.path.join(image_folder, images[0]))
    h, w, _ = first.shape
    Path(output_video).parent.mkdir(parents=True, exist_ok=True)
    writer = cv2.VideoWriter(
        str(output_video), cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )
    for name in images:
        writer.write(cv2.imread(os.path.join(image_folder, name)))
    writer.release()


def clear_frames(directory) -> None:
    """Remove all files except .gitkeep (video/utils.py:395-404 parity)."""
    d = Path(directory)
    if not d.exists():
        return
    for p in d.iterdir():
        if p.is_file() and p.name != ".gitkeep":
            p.unlink()


# ---------------------------------------------------------------------------
# Device-side batched compute
# ---------------------------------------------------------------------------

@jax.jit
def _batch_proximity(frames: jax.Array) -> jax.Array:
    from aip_tpu.models.depthnet import _proximity_core

    return jax.vmap(_proximity_core)(frames)


def _stylize_frames(vgg_params, dec_params, frames, s_mean, s_std,
                    depth_maps, offset, prominence, compute_dtype):
    """Batched depth-aware stylization with per-frame style stats.

    frames: [N, H, W, 3]; s_mean/s_std: [N, 1, 1, C]; depth_maps: [N, H, W].
    """
    content_f = vgg_encode(vgg_params, frames, "relu4_1", compute_dtype)
    hc, wc = content_f.shape[1], content_f.shape[2]
    p = jax.vmap(
        lambda d: compute_stylization_strength_map(d, (hc, wc), offset, prominence)
    )(depth_maps)[..., None]
    c_mean, c_std = calc_mean_std(content_f)
    x = content_f.astype(jnp.float32)
    adain_feat = (x - c_mean) / c_std * s_std + s_mean
    feat = adain_feat * (1.0 - p) + x * p
    out = decoder_apply(dec_params, feat.astype(compute_dtype), compute_dtype)
    return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)


_stylize_frames_jit = jax.jit(_stylize_frames, static_argnames=("offset", "prominence", "compute_dtype"))


@functools.partial(jax.jit, static_argnames=("method",))
def _batch_flows(frames: jax.Array, method: str = "lk") -> jax.Array:
    """[N, H, W, 3] -> [N-1, H, W, 2] flows between consecutive frames.

    ``method`` picks the flow algorithm ('farneback' | 'tvl1' | 'lk'),
    mirroring the reference's Farneback-vs-DualTVL1 switch
    (`video/utils.py:75-86`; its video driver defaults to DualTVL1, its
    `estimate_optical_flow` to Farneback). The batch maps in chunks of 32: the
    XLA TPU gather used by the bilinear warps faults on very large
    batched index sets (reproduced at ~95 x 256^2 slices), and 32 frames
    already saturate the chip."""
    f = lambda ab: estimate_flow_method(ab[0], ab[1], method=method)
    return jax.lax.map(f, (frames[:-1], frames[1:]), batch_size=32)


@jax.jit
def _temporal_blend(stylized: jax.Array, flows: jax.Array, alpha: float = 0.7) -> jax.Array:
    """Recurrent blend: out_i = blend(stylized_i, warp(out_{i-1}, flow_i))."""

    def step(prev_out, inputs):
        cur_stylized, flow = inputs
        warped = warp_image(prev_out, flow)
        out = blend_images(cur_stylized, warped, alpha)
        return out, out

    first = stylized[0]
    _, rest = jax.lax.scan(step, first, (stylized[1:], flows))
    return jnp.concatenate([first[None], rest], axis=0)


def apply_style_transfer_multi_ada(
    content_dir,
    style_dir,
    output_dir,
    target_resolution=(256, 256),
    alpha: float = 0.7,
    offset: float = 0.30,
    prominence: float = 20.0,
    use_depth: bool = True,
    cancel_flag=None,
    vgg_params=None,
    dec_params=None,
    compute_dtype=jnp.bfloat16,
    shard: bool = True,
    flow_method: str = "tvl1",
) -> list:
    """Stylize a frame directory against a style directory (multi-style).

    Parity: video/utils.py:304-371. Returns the list of written frame paths.

    Multi-chip: with ``shard`` and >1 device, the frame batch is placed with
    its leading axis sharded over a ``dp`` mesh — the stylize/flow programs
    then run frame-parallel across chips (the reference processes frames
    serially on one GPU, SURVEY.md §3.4).
    """
    from PIL import Image

    if vgg_params is None:
        vgg_params = weights_mod.get_vgg_params()
    if dec_params is None:
        dec_params = weights_mod.get_decoder_params()

    Path(output_dir).mkdir(parents=True, exist_ok=True)
    content_frames = sorted(
        f for f in os.listdir(content_dir) if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    style_images = sorted(
        f for f in os.listdir(style_dir) if f.lower().endswith((".jpg", ".jpeg", ".png"))
    )
    if not style_images:
        raise ValueError("No style images found in the style directory.")
    n, m = len(content_frames), len(style_images)
    frames_per_style = max(1, n // m)

    h, w = target_resolution[1], target_resolution[0]
    frames = np.stack([
        np.asarray(resize_bilinear(jnp.asarray(_to_array(Path(content_dir) / f)), (h, w), antialias=True))
        for f in content_frames
    ])
    frames_j = jnp.asarray(frames)
    if shard and jax.device_count() > 1 and n % jax.device_count() == 0:
        from aip_tpu.parallel.mesh import make_mesh
        from aip_tpu.parallel.sharding import batch_sharding

        mesh = make_mesh(jax.devices(), ("dp", "tp"), shape=(jax.device_count(), 1))
        frames_j = jax.device_put(frames_j, batch_sharding(mesh))

    # Per-style AdaIN stats (one encode per style), gathered per frame.
    stats = [
        precompute_style_stats(vgg_params, jnp.asarray(_to_array(Path(style_dir) / s))[None],
                               compute_dtype=compute_dtype)
        for s in style_images
    ]
    means = jnp.concatenate([s[0] for s in stats])  # [M, 1, 1, C]
    stds = jnp.concatenate([s[1] for s in stats])
    # Reference switching rule (:336-338): idx increments every
    # frames_per_style frames, clamped to the last style.
    idx = np.minimum(np.arange(n) // frames_per_style, m - 1)
    s_mean = means[jnp.asarray(idx)]
    s_std = stds[jnp.asarray(idx)]

    if use_depth:
        depth_maps = _batch_proximity(frames_j)
    else:
        depth_maps = jnp.ones((n, h, w), jnp.float32)  # constant -> P=0

    stylized = _stylize_frames_jit(
        vgg_params, dec_params, frames_j, s_mean, s_std, depth_maps,
        float(offset), float(prominence), compute_dtype,
    )
    if cancel_flag is not None and getattr(cancel_flag, "is_set", lambda: False)():
        return []

    flows = _batch_flows(frames_j, method=flow_method)
    blended = np.asarray(_temporal_blend(stylized, flows, alpha))

    out_paths = []
    for i, name in enumerate(content_frames):
        p = Path(output_dir) / name
        Image.fromarray((np.clip(blended[i], 0, 1) * 255).astype(np.uint8)).save(p)
        out_paths.append(p)
    return out_paths


# Hook for an external fast-stylization network (the reference's TF-Hub
# magenta module, `video/utils.py:14,108-154`). magenta's weights are not
# redistributable/fetchable here; register a callable
# fn(frames [N,H,W,3] float01, style [H,W,3] float01) -> [N,H,W,3] to use it.
_FAST_STYLIZE = None


def register_fast_stylizer(fn) -> None:
    global _FAST_STYLIZE
    _FAST_STYLIZE = fn


def apply_style_transfer(
    content_dir,
    style_image_path,
    output_dir,
    target_resolution=(256, 256),
    alpha: float = 0.7,
    cancel_flag=None,
    flow_method: str = "tvl1",
    **kw,
) -> list:
    """Feed-forward-stylizer video path (video/utils.py:108-154 parity).

    Uses the registered fast stylizer (magenta-equivalent) when available;
    otherwise falls back to the AdaIN path (same temporal-consistency
    machinery, different stylization network).
    """
    if _FAST_STYLIZE is None:
        return apply_style_transfer_ada(
            content_dir, style_image_path, output_dir,
            target_resolution=target_resolution, alpha=alpha,
            cancel_flag=cancel_flag, use_depth=False,
            flow_method=flow_method, **kw,
        )
    from PIL import Image

    Path(output_dir).mkdir(parents=True, exist_ok=True)
    names = sorted(f for f in os.listdir(content_dir)
                   if f.lower().endswith((".jpg", ".jpeg", ".png")))
    h, w = target_resolution[1], target_resolution[0]
    frames = np.stack([
        np.asarray(resize_bilinear(jnp.asarray(_to_array(Path(content_dir) / f)),
                                   (h, w), antialias=True))
        for f in names
    ])
    style = np.asarray(resize_bilinear(jnp.asarray(_to_array(style_image_path)),
                                       (h, w), antialias=True))
    stylized = jnp.asarray(np.asarray(_FAST_STYLIZE(frames, style), np.float32))
    flows = _batch_flows(jnp.asarray(frames), method=flow_method)
    blended = np.asarray(_temporal_blend(stylized, flows, alpha))
    out_paths = []
    for i, name in enumerate(names):
        p = Path(output_dir) / name
        Image.fromarray((np.clip(blended[i], 0, 1) * 255).astype(np.uint8)).save(p)
        out_paths.append(p)
    return out_paths


def apply_style_transfer_ada(
    content_dir,
    style_image_path,
    output_dir,
    target_resolution=(256, 256),
    alpha: float = 0.7,
    offset: float = 0.30,
    prominence: float = 20.0,
    cancel_flag=None,
    **kw,
) -> list:
    """Single-style AdaIN video stylization (video/utils.py:240-302 parity):
    the multi-style path with a one-style directory."""
    import tempfile
    import shutil

    style_dir = Path(tempfile.mkdtemp(prefix="aip_single_style_"))
    try:
        shutil.copy(str(style_image_path), style_dir / Path(style_image_path).name)
        return apply_style_transfer_multi_ada(
            content_dir, style_dir, output_dir,
            target_resolution=target_resolution, alpha=alpha,
            offset=offset, prominence=prominence, cancel_flag=cancel_flag, **kw,
        )
    finally:
        shutil.rmtree(style_dir, ignore_errors=True)


def apply_style_transfer_multi(content_dir, style_dir, output_dir,
                               target_resolution=(256, 256), alpha: float = 0.7,
                               cancel_flag=None, **kw) -> list:
    """Multi-style feed-forward variant (video/utils.py:156-215): the
    AdaIN multi-style path without the depth pass."""
    return apply_style_transfer_multi_ada(
        content_dir, style_dir, output_dir,
        target_resolution=target_resolution, alpha=alpha,
        cancel_flag=cancel_flag, use_depth=False, **kw,
    )


def run_style_transfer(
    selected_video="input/videos/sample.mp4",
    styles_dir="input/videos/styles/",
    content_dir="input/videos/content_frames/",
    styled_dir="input/videos/styled_frames/",
    output_video="video/outputs/stylized_video_manual.mp4",
    offset: float = 0.30,
    prominence: float = 20.0,
    fps: int = 20,
) -> str:
    """Demo driver (video/utils.py:407-425 parity). Returns the mp4 path."""
    clear_frames(content_dir)
    clear_frames(styled_dir)
    video_to_frames(selected_video, content_dir)
    apply_style_transfer_multi_ada(
        content_dir, styles_dir, styled_dir,
        target_resolution=(256, 256), offset=offset, prominence=prominence,
    )
    frames_to_video(styled_dir, output_video, fps=fps)
    return str(output_video)
