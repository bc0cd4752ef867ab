"""Color field / gaussian state / scene IO tests."""

import numpy as np
import jax
import jax.numpy as jnp

from aip_tpu.gs.colorfield import (
    init_colorfield,
    contract_to_unisphere,
    hash_encode,
    predict_sh,
    style_embedding,
)
from aip_tpu.gs import gaussians as G


def test_contract_identity_inside():
    x = jnp.asarray([[0.0, 0.0, 0.0], [0.5, -0.5, 0.25]])
    y = np.asarray(contract_to_unisphere(x))
    # Inside the unit ball the map is linear: y = x/4 + 0.5.
    np.testing.assert_allclose(y, np.asarray(x) / 4 + 0.5, atol=1e-6)


def test_contract_bounded_outside():
    x = jnp.asarray([[100.0, 0.0, 0.0], [0.0, -1000.0, 0.0]])
    y = np.asarray(contract_to_unisphere(x))
    assert (y >= 0).all() and (y <= 1).all()
    # Far points approach the 2-sphere boundary: |contract| -> 2 => y -> [0,1] edge.
    assert abs(y[0, 0] - 1.0) < 0.01


def test_hash_encode_continuity(rng):
    params = init_colorfield(jax.random.PRNGKey(0), style_dim=None)
    x = jnp.asarray(rng.random((16, 3)).astype(np.float32)) * 0.5 + 0.25
    e1 = hash_encode(params.hash_tables, x)
    e2 = hash_encode(params.hash_tables, x + 1e-5)
    assert e1.shape == (16, 32)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-2)


def test_predict_sh_shapes_and_style_conditioning(rng):
    params = init_colorfield(jax.random.PRNGKey(0), style_dim=256)
    xyz = jnp.asarray(rng.standard_normal((32, 3)).astype(np.float32))
    s1 = jnp.asarray(rng.standard_normal((1, 512)).astype(np.float32))
    s2 = jnp.asarray(rng.standard_normal((1, 512)).astype(np.float32))
    sh1 = predict_sh(params, xyz, s1)
    sh2 = predict_sh(params, xyz, s2)
    assert sh1.shape == (32, 16, 3)
    assert not np.allclose(np.asarray(sh1), np.asarray(sh2))
    emb = style_embedding(params, s1)
    np.testing.assert_allclose(float(jnp.linalg.norm(emb)), 1.0, atol=1e-5)


def test_create_from_pcd_and_activations(rng):
    pts = jnp.asarray(rng.standard_normal((50, 3)).astype(np.float32))
    cols = jnp.asarray(rng.random((50, 3)).astype(np.float32))
    state, sh_dc = G.create_from_pcd(pts, cols, capacity=64)
    assert int(state.n_active) == 50
    assert state.capacity == 64
    op = np.asarray(G.get_opacity(state))[:50]
    np.testing.assert_allclose(op, 0.1, atol=1e-5)
    rot = np.asarray(G.get_rotation(state))
    np.testing.assert_allclose(np.linalg.norm(rot, axis=1), 1.0, atol=1e-5)


def test_clone_appends_into_free_slots(rng):
    pts = jnp.asarray(rng.standard_normal((10, 3)).astype(np.float32))
    cols = jnp.asarray(rng.random((10, 3)).astype(np.float32))
    state, _ = G.create_from_pcd(pts, cols, capacity=32)
    # Force high gradient stats on 3 gaussians, tiny scales -> clone path.
    state = state._replace(
        xyz_grad_accum=state.xyz_grad_accum.at[:3].set(10.0),
        denom=state.denom.at[:3].set(1.0),
        scaling=state.scaling.at[:, :].set(-5.0),
    )
    new_state, slots = G.densify_and_clone(state, 0.5, 0.01, 10.0)
    assert int(new_state.n_active) == 13
    assert int(slots.sum()) == 3


def test_split_replaces_selected(rng):
    pts = jnp.asarray(rng.standard_normal((10, 3)).astype(np.float32))
    cols = jnp.asarray(rng.random((10, 3)).astype(np.float32))
    state, _ = G.create_from_pcd(pts, cols, capacity=64)
    state = state._replace(
        xyz_grad_accum=state.xyz_grad_accum.at[:2].set(10.0),
        denom=state.denom.at[:2].set(1.0),
        scaling=state.scaling.at[:, :].set(2.0),  # big -> split path
    )
    new_state, appended = G.densify_and_split(state, jax.random.PRNGKey(0), 0.5, 0.01, 1.0)
    # 2 originals pruned, 2*2 appended.
    assert int(new_state.n_active) == 10 - 2 + 4
    # New scales shrunk by 1.6 in log space.
    app_idx = np.nonzero(np.asarray(appended))[0]
    np.testing.assert_allclose(
        np.asarray(new_state.scaling)[app_idx], 2.0 - np.log(1.6), atol=1e-5
    )


def test_capacity_overflow_drops(rng):
    pts = jnp.asarray(rng.standard_normal((30, 3)).astype(np.float32))
    cols = jnp.asarray(rng.random((30, 3)).astype(np.float32))
    state, _ = G.create_from_pcd(pts, cols, capacity=32)
    state = state._replace(
        xyz_grad_accum=state.xyz_grad_accum.at[:30].set(10.0),
        denom=state.denom.at[:30].set(1.0),
        scaling=state.scaling.at[:, :].set(-5.0),
    )
    new_state, _ = G.densify_and_clone(state, 0.5, 0.01, 10.0)
    assert int(new_state.n_active) == 32  # clamped at capacity


def test_prune_and_ste_mask(rng):
    pts = jnp.asarray(rng.standard_normal((10, 3)).astype(np.float32))
    cols = jnp.asarray(rng.random((10, 3)).astype(np.float32))
    state, _ = G.create_from_pcd(pts, cols, capacity=16)
    state = state._replace(mask=state.mask.at[0].set(-10.0))  # gate off
    m = np.asarray(G.ste_mask(state))
    assert m[0, 0] == 0.0 and m[1, 0] == 1.0
    pruned = G.mask_prune(state)
    assert int(pruned.n_active) == 9
    state2 = G.reset_opacity(state)
    assert np.asarray(G.get_opacity(state2)).max() <= 0.0101


def test_scene_io_blender_roundtrip(tmp_path, rng):
    """Minimal Blender-format scene: transforms + white png frames."""
    import json
    from PIL import Image

    from aip_tpu.gs.dataset import Scene, write_ply, read_ply

    (tmp_path / "images").mkdir()
    frames = []
    for i in range(3):
        angle = i * 2 * np.pi / 3
        c2w = np.eye(4)
        c2w[0, 3] = 2 * np.sin(angle)
        c2w[2, 3] = 2 * np.cos(angle)
        frames.append({"file_path": f"./images/r_{i}", "transform_matrix": c2w.tolist()})
        Image.fromarray((rng.random((20, 24, 4)) * 255).astype(np.uint8)).save(
            tmp_path / "images" / f"r_{i}.png"
        )
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.9, "frames": frames}, f)

    scene = Scene(str(tmp_path), shuffle=False)
    cams = scene.getTrainCameras()
    assert len(cams) == 3
    assert cams[0].image.shape == (20, 24, 3)
    assert scene.cameras_extent > 0
    assert scene.point_cloud.points.shape[0] == 100_000

    # PLY roundtrip.
    xyz = rng.standard_normal((17, 3)).astype(np.float32)
    rgb = (rng.random((17, 3)) * 255).astype(np.uint8)
    write_ply(tmp_path / "t.ply", xyz, rgb)
    d = read_ply(tmp_path / "t.ply")
    np.testing.assert_allclose(np.stack([d["x"], d["y"], d["z"]], 1), xyz, rtol=1e-6)
    np.testing.assert_array_equal(np.stack([d["red"], d["green"], d["blue"]], 1), rgb)


def test_colmap_text_parsing(tmp_path):
    from aip_tpu.gs import colmap

    sparse = tmp_path
    (sparse / "cameras.txt").write_text(
        "# comment\n1 PINHOLE 640 480 500.0 500.0 320.0 240.0\n"
    )
    (sparse / "images.txt").write_text(
        "1 1 0 0 0 0.5 0.2 1.5 1 img0.png\n"
        "10.0 20.0 1 30.0 40.0 2\n"
    )
    (sparse / "points3D.txt").write_text(
        "1 0.1 0.2 0.3 255 128 0 0.5 1 0 2 1\n"
    )
    cams = colmap.read_cameras_text(sparse / "cameras.txt")
    assert cams[1].model == "PINHOLE" and cams[1].width == 640
    imgs = colmap.read_images_text(sparse / "images.txt")
    assert imgs[1].name == "img0.png"
    np.testing.assert_allclose(imgs[1].tvec, [0.5, 0.2, 1.5])
    R = colmap.qvec2rotmat(np.array([1.0, 0, 0, 0]))
    np.testing.assert_allclose(R, np.eye(3))
    xyz, rgb, err = colmap.read_points3d_text(sparse / "points3D.txt")
    np.testing.assert_allclose(xyz[0], [0.1, 0.2, 0.3])
    assert tuple(rgb[0]) == (255, 128, 0)


def test_hash_encode_sg_matches_autodiff(rng):
    """Sort-based hash gradient == scatter autodiff (forward identical)."""
    from aip_tpu.gs.colorfield import hash_encode, hash_encode_sg

    field = init_colorfield(jax.random.PRNGKey(0), style_dim=None, log2_hashmap=9)
    x = jnp.asarray(rng.random((300, 3)).astype(np.float32))
    g_seed = jnp.asarray(rng.standard_normal((300, 32)).astype(np.float32))

    np.testing.assert_array_equal(
        np.asarray(hash_encode(field.hash_tables, x)),
        np.asarray(hash_encode_sg(field.hash_tables, x)))
    ga = jax.grad(lambda tb: jnp.sum(hash_encode(tb, x) * g_seed))(field.hash_tables)
    gb = jax.grad(lambda tb: jnp.sum(hash_encode_sg(tb, x) * g_seed))(field.hash_tables)
    scale = float(jnp.abs(ga).max())
    assert float(jnp.abs(ga - gb).max()) / scale < 1e-4


def test_hash_grad_pallas_matches_scatter():
    """Pallas fused one-hot-matmul hash gradient (interpret) == scatter
    gradient, small table."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aip_tpu.gs import colorfield as CF
    from aip_tpu.ops.pallas.hashgrad import hash_grad_pallas

    key = jax.random.PRNGKey(0)
    params = CF.init_colorfield(key, style_dim=None, log2_hashmap=10)
    tables = params.hash_tables  # [L, T, F]
    l, t, f = tables.shape
    n = 64
    x01 = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    g_out = jax.random.normal(jax.random.PRNGKey(2), (n, l * f))

    def loss(tb):
        return jnp.sum(CF.hash_encode(tb, x01) * g_out)

    want = jax.grad(loss)(tables)

    idx, w = CF._encode_terms(tables.shape, x01)
    local = idx - jnp.arange(l, dtype=idx.dtype)[None, :, None] * t
    vals = w[..., None] * g_out.reshape(n, l, 1, f)
    lo_bits = (t - 1).bit_length() // 2
    lo_n = 1 << lo_bits
    hi_n = (t + lo_n - 1) // lo_n
    hi = (local >> lo_bits).transpose(1, 0, 2).reshape(l, -1)
    lo = (local & (lo_n - 1)).transpose(1, 0, 2).reshape(l, -1)
    v = vals.transpose(1, 0, 2, 3).reshape(l, -1, f)

    acc = hash_grad_pallas(hi, lo, v, hi_n, lo_n, chunk=128, interpret=True)
    got = acc.reshape(l, hi_n * lo_n, f)[:, :t, :]
    # bf16 value rounding in the one-hot matmul accumulation (same
    # class as the XLA mxu path's documented 1.6e-3 rel; tcnn itself
    # accumulates hashgrid gradients in fp16).
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=4e-3)


def test_level_table_sizes_match_reference_storage():
    """tcnn parity: dense coarse levels + hashed fine levels sum to the
    reference's exact hash-grid storage (25.20 MB fp16,
    `Style_3DGS/storage:6`)."""
    from aip_tpu.gs.colorfield import level_table_sizes

    sizes = level_table_sizes(19, 16)
    assert sizes[0] == 4920          # (16+1)^3 -> 8-aligned
    assert sizes[-1] == 1 << 19      # fine levels hashed
    assert all(s % 8 == 0 for s in sizes)
    fp16_mb = sum(sizes) * 2 * 2 / 1e6
    np.testing.assert_allclose(fp16_mb, 25.200, atol=0.005)


def test_hash_encode_mxu_matches_autodiff_mixed_dense_hashed(rng):
    """The grouped MXU backward must match the scatter autodiff when some
    levels are dense (t_eff < T) and some hashed (log2=15: levels 0-1
    dense at 4920/13824 entries, levels 2+ hashed at 32768)."""
    from aip_tpu.gs.colorfield import (hash_encode, hash_encode_mxu,
                                       level_table_sizes)

    sizes = level_table_sizes(15, 16)
    assert sizes[0] < (1 << 15) and sizes[2] == (1 << 15)  # mixed for real

    field = init_colorfield(jax.random.PRNGKey(0), style_dim=None,
                            log2_hashmap=15)
    x = jnp.asarray(rng.random((257, 3)).astype(np.float32))
    g_seed = jnp.asarray(rng.standard_normal((257, 32)).astype(np.float32))

    np.testing.assert_array_equal(
        np.asarray(hash_encode(field.hash_tables, x)),
        np.asarray(hash_encode_mxu(field.hash_tables, x)))
    ga = jax.grad(lambda tb: jnp.sum(hash_encode(tb, x) * g_seed))(field.hash_tables)
    gb = jax.grad(lambda tb: jnp.sum(hash_encode_mxu(tb, x) * g_seed))(field.hash_tables)
    scale = float(jnp.abs(ga).max())
    assert float(jnp.abs(ga - gb).max()) / scale < 5e-3
    # Rows past each level's effective size carry no gradient.
    for lvl, s in enumerate(level_table_sizes(15, 16)):
        if s < ga.shape[1]:
            assert float(jnp.abs(ga[lvl, s:]).max()) == 0.0
            assert float(jnp.abs(gb[lvl, s:]).max()) == 0.0


def test_dense_levels_have_no_hash_collisions(rng):
    """On a dense level, distinct integer cells map to distinct rows."""
    from aip_tpu.gs.colorfield import _corner_index

    res = 16  # level 0 at log2>=13 (4920 entries)
    coords = np.stack(np.meshgrid(*[np.arange(res + 1)] * 3,
                                  indexing="ij"), -1).reshape(-1, 3)
    idx = np.asarray(_corner_index(jnp.asarray(coords), 0, 0, 0, res, 1 << 13))
    assert len(np.unique(idx)) == len(coords)
    assert idx.max() < 4920
