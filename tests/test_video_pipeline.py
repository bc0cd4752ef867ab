"""Video pipeline tests: IO round-trip, temporal blend recurrence, end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aip_tpu.pipelines.video import (
    video_to_frames,
    frames_to_video,
    clear_frames,
    apply_style_transfer_multi_ada,
    _temporal_blend,
)
from aip_tpu.ops.flow import warp_image, blend_images


def test_temporal_blend_matches_serial_recurrence(rng):
    n, h, w = 4, 16, 16
    stylized = rng.random((n, h, w, 3)).astype(np.float32)
    flows = (rng.random((n - 1, h, w, 2)) * 2 - 1).astype(np.float32)

    out = np.asarray(_temporal_blend(jnp.asarray(stylized), jnp.asarray(flows), 0.7))

    # Serial oracle mirroring video/utils.py:353-366.
    prev = stylized[0]
    expect = [prev]
    for i in range(1, n):
        warped = np.asarray(warp_image(jnp.asarray(prev), jnp.asarray(flows[i - 1])))
        prev = np.asarray(blend_images(jnp.asarray(stylized[i]), jnp.asarray(warped), 0.7))
        expect.append(prev)
    np.testing.assert_allclose(out, np.stack(expect), atol=1e-5)


def test_video_roundtrip_and_pipeline(tmp_path, rng, monkeypatch):
    cv2 = pytest.importorskip("cv2")
    from aip_tpu.models import weights as weights_mod

    monkeypatch.setattr(weights_mod, "DEFAULT_WEIGHTS_DIR", tmp_path / "w")

    # Write a tiny 6-frame video.
    vid = tmp_path / "in.mp4"
    writer = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"), 5, (48, 32))
    base = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
    for i in range(6):
        writer.write(np.roll(base, i * 2, axis=1))
    writer.release()

    content_dir = tmp_path / "frames"
    frames = video_to_frames(vid, content_dir)
    assert len(frames) == 6

    # Two styles -> switches mid-video.
    style_dir = tmp_path / "styles"
    style_dir.mkdir()
    from PIL import Image

    for i in range(2):
        Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(
            style_dir / f"style_{i}.jpg"
        )

    out_dir = tmp_path / "styled"
    out_paths = apply_style_transfer_multi_ada(
        content_dir, style_dir, out_dir,
        target_resolution=(32, 32), compute_dtype=jnp.float32,
    )
    assert len(out_paths) == 6
    for p in out_paths:
        assert p.exists()

    out_mp4 = tmp_path / "out.mp4"
    frames_to_video(out_dir, out_mp4, fps=5)
    assert out_mp4.exists() and out_mp4.stat().st_size > 0

    clear_frames(content_dir)
    assert not any(f.suffix == ".jpg" for f in content_dir.iterdir())


def test_video_sharded_over_mesh(tmp_path, rng, monkeypatch):
    """8 frames sharded over the 8-device CPU mesh produce valid outputs."""
    import jax

    from aip_tpu.models import weights as weights_mod

    assert jax.device_count() == 8
    monkeypatch.setattr(weights_mod, "DEFAULT_WEIGHTS_DIR", tmp_path / "w")
    from PIL import Image

    content_dir = tmp_path / "frames"
    content_dir.mkdir()
    for i in range(8):
        Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(
            content_dir / f"f_{i:03d}.jpg")
    style_dir = tmp_path / "styles"
    style_dir.mkdir()
    Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(
        style_dir / "s.jpg")

    outs = apply_style_transfer_multi_ada(
        content_dir, style_dir, tmp_path / "out",
        target_resolution=(32, 32), compute_dtype=jnp.float32, shard=True,
    )
    assert len(outs) == 8
    for p in outs:
        img = np.asarray(Image.open(p))
        assert img.shape == (32, 32, 3)


def test_run_video_cli_fast_stylizer(tmp_path, rng, monkeypatch):
    """`run_video --fast_stylizer NPZ --style img` drives the reference's
    default video vertical (magenta single-style, video/utils.py:108-154)
    end-to-end: loads the distilled checkpoint, registers the fast
    stylizer, stylizes every frame and writes the output mp4."""
    cv2 = pytest.importorskip("cv2")
    from PIL import Image

    from aip_tpu.cli import run_video
    from aip_tpu.models import magenta as M
    from aip_tpu.pipelines import video as video_mod

    # tiny checkpoint (random init, compact trunk) + tiny video + style
    params = M.init_magenta_params(jax.random.PRNGKey(0))
    npz = tmp_path / "student.npz"
    M.save_magenta_npz(params, npz)

    vid = tmp_path / "in.mp4"
    writer = cv2.VideoWriter(str(vid), cv2.VideoWriter_fourcc(*"mp4v"),
                             5, (48, 32))
    base = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
    for i in range(4):
        writer.write(np.roll(base, i * 2, axis=1))
    writer.release()
    style = tmp_path / "style.jpg"
    Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(style)

    out = run_video.main([
        "--fast_stylizer", str(npz), "--style", str(style),
        "--video", str(vid), "--output", str(tmp_path / "out.mp4"),
        "--frames_dir", str(tmp_path / "cf"),
        "--styled_dir", str(tmp_path / "sf"),
        "--flow", "farneback", "--fps", "5",
    ])
    assert (tmp_path / "out.mp4").stat().st_size > 0
    assert len(list((tmp_path / "sf").glob("*.jpg"))) == 4
    # the hook really was the magenta student
    assert video_mod._FAST_STYLIZE is not None
    video_mod.register_fast_stylizer(None)  # reset for other tests
