"""Compression: Huffman codec, post-quant, save/load roundtrip, full
train->save->render pipeline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aip_tpu.gs import compress as C
from aip_tpu.gs import gaussians as G
from aip_tpu.gs import rvq as rvq_mod
from aip_tpu.gs.colorfield import init_colorfield


def test_huffman_roundtrip(rng):
    symbols = rng.integers(0, 16, 500)
    packed, codes, n, bits = C.huffman_encode(symbols)
    decoded = C.huffman_decode(packed, codes, n)
    np.testing.assert_array_equal(decoded, symbols)
    # Entropy coding beats fixed 8-bit for a skewed distribution.
    skewed = np.concatenate([np.zeros(900, np.int64), rng.integers(0, 16, 100)])
    assert C.huffman_size_bytes(skewed) < len(skewed)


def test_huffman_single_symbol():
    symbols = np.zeros(10, np.int64)
    packed, codes, n, _ = C.huffman_encode(symbols)
    np.testing.assert_array_equal(C.huffman_decode(packed, codes, n), symbols)


def test_post_quant_error_bound(rng):
    x = rng.standard_normal((100, 4)).astype(np.float32)
    deq, q, scale = C.post_quant(x)
    assert q.dtype == np.int8
    assert np.abs(deq - x).max() <= scale * 0.5 + 1e-7


def test_save_load_roundtrip(tmp_path, rng):
    pts = jnp.asarray(rng.standard_normal((60, 3)).astype(np.float32))
    cols = jnp.asarray(rng.random((60, 3)).astype(np.float32))
    state, _ = G.create_from_pcd(pts, cols, capacity=64)
    field = init_colorfield(jax.random.PRNGKey(0), style_dim=256, log2_hashmap=10)
    scales = G.get_scaling(state)[state.active]
    rots = G.get_rotation(state)[state.active]
    rvq_s = rvq_mod.kmeans_init(jax.random.PRNGKey(1), scales, 2, 8)
    rvq_r = rvq_mod.kmeans_init(jax.random.PRNGKey(2), rots, 2, 8)

    report = C.save_npz(tmp_path / "m.npz", state, field, rvq_s, rvq_r)
    assert "total:" in report

    state2, field2, rvq_s2, rvq_r2 = C.load_npz(tmp_path / "m.npz")
    assert int(state2.n_active) == 60
    # Positions survive at fp16 precision.
    a = np.sort(np.asarray(state.xyz[state.active]), axis=0)
    b = np.sort(np.asarray(state2.xyz[state2.active]), axis=0)
    np.testing.assert_allclose(a, b, atol=1e-2)
    # Hash tables dequantize within 8-bit error.
    orig = np.asarray(field.hash_tables)
    got = np.asarray(field2.hash_tables)
    assert np.abs(orig - got).max() < np.abs(orig).max() / 64


def test_train_save_render_pipeline(tmp_path, rng, monkeypatch):
    """run_3dgs_training -> run_3dgs_rendering end to end (tiny)."""
    import json
    from PIL import Image

    from aip_tpu.models import weights as weights_mod
    from aip_tpu.gs.pipeline import run_3dgs_rendering
    from aip_tpu.gs.dataset import Scene
    from aip_tpu.gs.train import GSTrainConfig, train
    from aip_tpu.gs import compress as compress_mod
    from pathlib import Path

    monkeypatch.setattr(weights_mod, "DEFAULT_WEIGHTS_DIR", tmp_path / "w")

    # Tiny Blender scene.
    (tmp_path / "scene" / "images").mkdir(parents=True)
    frames = []
    for i in range(2):
        c2w = np.eye(4)
        c2w[2, 3] = 3.0 - i * 0.5
        frames.append({"file_path": f"./images/r_{i}", "transform_matrix": c2w.tolist()})
        img = np.zeros((32, 32, 4), np.uint8)
        img[10:22, 10:22] = (200, 60, 60, 255)
        img[..., 3] = 255
        Image.fromarray(img).save(tmp_path / "scene" / "images" / f"r_{i}.png")
    (tmp_path / "scene" / "transforms_train.json").write_text(
        json.dumps({"camera_angle_x": 0.8, "frames": frames}))

    Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(tmp_path / "style.png")

    scene = Scene(str(tmp_path / "scene"), shuffle=False)
    scene.scene_info.point_cloud.points = scene.scene_info.point_cloud.points[:100]
    scene.scene_info.point_cloud.colors = scene.scene_info.point_cloud.colors[:100]
    cfg = GSTrainConfig(iterations=8, freeze_iters=5, capacity=128, max_per_tile=16,
                        raster_chunk=128, densify_from_iter=100, log2_hashmap=10,
                        rvq_size=8, rvq_num=2, net_lr_step=(1000,))
    trainer, _ = train(scene, str(tmp_path / "style.png"), cfg, img_size=32,
                       guide_dir=str(tmp_path / "guides"))

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    report = compress_mod.save_npz(model_dir / "model.npz", trainer.gstate,
                                   trainer.field, trainer.rvq_scale, trainer.rvq_rot)
    (model_dir / "storage").write_text(report)
    (model_dir / "cfg_args.json").write_text(json.dumps({
        "source_path": str(tmp_path / "scene"), "white_background": False,
    }))

    gif = run_3dgs_rendering(str(tmp_path / "style.png"), str(model_dir),
                             max_per_tile=16)
    assert Path(gif).exists()
    assert (model_dir / "renders" / "00000.png").exists()


def test_fit_train_selection_records_shape(tmp_path, rng, monkeypatch):
    """run_3dgs_training(fit_train_selection=True) fits the selection to
    the initial cloud, records it in cfg_args["selection"], and
    run_3dgs_rendering renders with the recorded shape."""
    import json
    from pathlib import Path

    from PIL import Image

    from aip_tpu.models import weights as weights_mod
    from aip_tpu.gs.pipeline import run_3dgs_rendering, run_3dgs_training

    monkeypatch.setattr(weights_mod, "DEFAULT_WEIGHTS_DIR", tmp_path / "w")

    (tmp_path / "scene" / "images").mkdir(parents=True)
    frames = []
    for i in range(2):
        c2w = np.eye(4)
        c2w[2, 3] = 3.0 - i * 0.5
        frames.append({"file_path": f"./images/r_{i}",
                       "transform_matrix": c2w.tolist()})
        img = np.zeros((32, 32, 4), np.uint8)
        img[8:24, 8:24] = (60, 200, 60, 255)
        img[..., 3] = 255
        Image.fromarray(img).save(tmp_path / "scene" / "images" / f"r_{i}.png")
    (tmp_path / "scene" / "transforms_train.json").write_text(
        json.dumps({"camera_angle_x": 0.8, "frames": frames}))
    Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(
        tmp_path / "style.png")

    model = run_3dgs_training(
        str(tmp_path / "scene"), str(tmp_path / "style.png"),
        model_path=str(tmp_path / "model"), iterations=6, freeze_iters=4,
        capacity=128, log2_hashmap=10, img_size=32, max_per_tile=16,
        progress_every=0, fit_train_selection=True)

    cfg_args = json.loads((Path(model) / "cfg_args.json").read_text())
    sel = cfg_args["selection"]
    assert set(sel) >= {"macro_capacity", "dup_span", "giant_capacity",
                        "giant_backend", "giant_pool", "giant_pool_full"}
    assert 2 <= sel["dup_span"] <= 6
    assert sel["giant_capacity"] >= 128
    assert sel["giant_backend"] == "direct"
    assert sel["giant_pool"] >= 128 and sel["giant_pool_full"] >= 64

    gif = run_3dgs_rendering(str(tmp_path / "style.png"), model,
                             max_per_tile=16)
    assert Path(gif).exists()


def test_ply_export_import_roundtrip(tmp_path, rng):
    from aip_tpu.gs.compress import save_ply, load_ply

    pts = jnp.asarray(rng.standard_normal((30, 3)).astype(np.float32))
    cols = jnp.asarray(rng.random((30, 3)).astype(np.float32))
    state, _ = G.create_from_pcd(pts, cols, capacity=32)
    field = init_colorfield(jax.random.PRNGKey(0), style_dim=None, log2_hashmap=10)

    p = save_ply(tmp_path / "scene.ply", state, field)
    state2, sh = load_ply(p, capacity=32)
    assert int(state2.n_active) == 30
    assert sh.shape == (32, 16, 3)
    a = np.sort(np.asarray(state.xyz[state.active]), axis=0)
    b = np.sort(np.asarray(state2.xyz[state2.active]), axis=0)
    np.testing.assert_allclose(a, b, atol=1e-5)

    # Baked SH matches the field's prediction.
    from aip_tpu.gs.colorfield import predict_sh

    expect = np.asarray(predict_sh(field, state2.xyz[:30], None))
    np.testing.assert_allclose(np.asarray(sh[:30]), expect, atol=1e-5)


def test_render_with_sh_override(tmp_path, rng):
    from aip_tpu.gs.compress import save_ply, load_ply
    from aip_tpu.gs.render import render
    from aip_tpu.gs.rasterizer import RasterSettings
    from aip_tpu.gs.cameras import Camera

    pts = jnp.asarray((rng.standard_normal((20, 3)) * 0.5).astype(np.float32))
    cols = jnp.asarray(rng.random((20, 3)).astype(np.float32))
    state, _ = G.create_from_pcd(pts, cols, capacity=32)
    field = init_colorfield(jax.random.PRNGKey(0), style_dim=None, log2_hashmap=10)
    p = save_ply(tmp_path / "s.ply", state, field)
    state2, sh = load_ply(p, capacity=32)

    cam = Camera(colmap_id=0, R=np.eye(3), T=np.array([0.0, 0.0, 3.0]),
                 FoVx=0.8, FoVy=0.8, image=np.zeros((32, 32, 3), np.float32),
                 image_name="t", uid=0)
    out = render(cam, state2, None, jnp.zeros(3), mode="inference",
                 settings=RasterSettings(32, 32, max_per_tile=16),
                 sh_override=sh)
    assert np.isfinite(np.asarray(out.render)).all()


def test_cameras_json_dump(tmp_path, rng):
    import json as _json
    from PIL import Image
    from aip_tpu.gs.dataset import Scene

    (tmp_path / "images").mkdir()
    frames = []
    for i in range(2):
        c2w = np.eye(4); c2w[2, 3] = 2.0
        frames.append({"file_path": f"./images/r_{i}", "transform_matrix": c2w.tolist()})
        Image.fromarray((rng.random((16, 16, 4)) * 255).astype(np.uint8)).save(
            tmp_path / "images" / f"r_{i}.png")
    (tmp_path / "transforms_train.json").write_text(
        _json.dumps({"camera_angle_x": 0.8, "frames": frames}))
    scene = Scene(str(tmp_path), shuffle=False)
    path = scene.dump_cameras_json(tmp_path / "model")
    data = _json.loads(open(path).read())
    assert len(data) == 2
    assert {"id", "img_name", "position", "rotation", "fx", "fy"} <= set(data[0])


def test_bitcodec_canonical_and_fallback(rng):
    """Canonical codec: native and numpy paths agree bit-for-bit."""
    from aip_tpu.runtime import bitcodec

    symbols = np.concatenate([np.zeros(300, np.int64),
                              rng.integers(0, 32, 200)])
    lengths = {s: l for s, (_c, l) in C.huffman_build(symbols).items()}
    codes, tables = bitcodec.canonical_codes(lengths)

    packed_native, bits_native = bitcodec.pack(symbols, codes)
    out_native = bitcodec.unpack(packed_native, len(symbols), tables)
    np.testing.assert_array_equal(out_native, symbols)

    # Force the pure-python fallback and compare.
    saved = bitcodec._LIB
    try:
        bitcodec._LIB = None
        packed_py, bits_py = bitcodec.pack(symbols, codes)
        assert bits_py == bits_native
        np.testing.assert_array_equal(packed_py, packed_native)
        out_py = bitcodec.unpack(packed_py, len(symbols), tables)
        np.testing.assert_array_equal(out_py, symbols)
    finally:
        bitcodec._LIB = saved


def test_bitcodec_truncated_stream_raises(rng):
    """A truncated/corrupt bitstream must fail cleanly (no OOB reads) on
    both the native and the numpy decode paths (ADVICE r1 low)."""
    from aip_tpu.runtime import bitcodec

    symbols = rng.integers(0, 64, 500)
    lengths = {s: l for s, (_c, l) in C.huffman_build(symbols).items()}
    codes, tables = bitcodec.canonical_codes(lengths)
    packed, _bits = bitcodec.pack(symbols, codes)
    truncated = packed[: max(1, len(packed) // 4)].copy()

    with pytest.raises(ValueError):
        bitcodec.unpack(truncated, len(symbols), tables)
    saved = bitcodec._LIB
    try:
        bitcodec._LIB = None
        with pytest.raises(ValueError):
            bitcodec.unpack(truncated, len(symbols), tables)
    finally:
        bitcodec._LIB = saved


def test_npz_stores_entropy_coded_streams(tmp_path, rng):
    """The npz artifact must hold the packed Huffman bitstreams (what the
    storage report accounts for), not raw index arrays (ADVICE r1 low)."""
    from aip_tpu.gs import gaussians as G
    from aip_tpu.gs import rvq as rvq_mod
    from aip_tpu.gs.colorfield import init_colorfield

    pts = jnp.asarray(rng.random((60, 3)).astype(np.float32))
    cols = jnp.asarray(rng.random((60, 3)).astype(np.float32))
    state, _ = G.create_from_pcd(pts, cols, 64)
    field = init_colorfield(jax.random.PRNGKey(0), style_dim=None, log2_hashmap=8)
    scales = G.get_scaling(state)[np.asarray(state.active)]
    rots = G.get_rotation(state)[np.asarray(state.active)]
    rvq_s = rvq_mod.kmeans_init(jax.random.PRNGKey(1), scales, 2, 8)
    rvq_r = rvq_mod.kmeans_init(jax.random.PRNGKey(2), rots, 2, 8)

    report = C.save_npz(tmp_path / "m.npz", state, field, rvq_s, rvq_r)
    d = np.load(tmp_path / "m.npz")
    assert "sc_packed" in d and "ro_packed" in d and "hash_packed" in d
    assert "sc_idx" not in d and "hash_q" not in d
    assert d["sc_packed"].dtype == np.uint8
    assert "total" in report
