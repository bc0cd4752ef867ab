"""End-to-end 3DGS training smoke tests on a tiny synthetic scene."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from PIL import Image

from aip_tpu.gs.dataset import Scene
from aip_tpu.gs.train import GSTrainConfig, train, init_trainer, make_train_step, camera_to_arrays
from aip_tpu.gs import rvq as rvq_mod


def _make_scene(tmp_path, rng, n_views=3, size=32):
    (tmp_path / "images").mkdir()
    frames = []
    for i in range(n_views):
        angle = i * 2 * np.pi / n_views
        # Simple orbit: camera at radius 3 looking roughly at origin.
        c2w = np.eye(4)
        c2w[0, 3] = 3 * np.sin(angle)
        c2w[2, 3] = 3 * np.cos(angle)
        frames.append({"file_path": f"./images/r_{i}", "transform_matrix": c2w.tolist()})
        # A colorful blob on black background.
        img = np.zeros((size, size, 4), np.uint8)
        img[8:24, 8:24, 0] = 200
        img[12:20, 12:20, 1] = 180
        img[..., 3] = 255
        Image.fromarray(img).save(tmp_path / "images" / f"r_{i}.png")
    with open(tmp_path / "transforms_train.json", "w") as f:
        json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    return Scene(str(tmp_path), shuffle=False)


def _tiny_cfg(**kw):
    defaults = dict(
        iterations=24, freeze_iters=16, capacity=256, max_per_tile=32,
        raster_chunk=256, densify_from_iter=4, densification_interval=8,
        densify_until_iter=20, opacity_reset_interval=1000,
        mask_prune_iter=4, style_dim=256, rvq_size=8, rvq_num=2,
        net_lr_step=(1000,), log2_hashmap=12,
    )
    defaults.update(kw)
    return GSTrainConfig(**defaults)


@pytest.fixture(scope="module")
def style_img(tmp_path_factory):
    rng = np.random.default_rng(7)
    p = tmp_path_factory.mktemp("style") / "style.png"
    Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(p)
    return str(p)


def test_training_step_decreases_loss(tmp_path, rng, monkeypatch):
    """Photometric-only optimization on one view should reduce the loss."""
    from aip_tpu.models import weights as weights_mod

    monkeypatch.setattr(weights_mod, "DEFAULT_WEIGHTS_DIR", tmp_path / "w")
    scene = _make_scene(tmp_path, rng)
    cfg = _tiny_cfg(style_dim=0)

    # Subsample the random point cloud so the test stays fast.
    pcd = scene.point_cloud
    trainer = init_trainer(cfg, pcd.points[:200], pcd.colors[:200], scene.cameras_extent)
    cam = scene.getTrainCameras()[0]
    step = make_train_step(cfg, scene.cameras_extent, "photometric",
                           cam.image_height, cam.image_width)
    arrays = camera_to_arrays(cam)
    bg = jnp.zeros(3)

    losses = []
    for _ in range(25):
        trainer, metrics = step(trainer, arrays, None, bg)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_full_train_pipeline(tmp_path, rng, monkeypatch, style_img):
    """Both phases + densification + final RVQ complete without error."""
    from aip_tpu.models import weights as weights_mod

    monkeypatch.setattr(weights_mod, "DEFAULT_WEIGHTS_DIR", tmp_path / "w")
    scene = _make_scene(tmp_path, rng)
    # Shrink the point cloud for speed.
    scene.scene_info.point_cloud.points = scene.scene_info.point_cloud.points[:150]
    scene.scene_info.point_cloud.colors = scene.scene_info.point_cloud.colors[:150]

    cfg = _tiny_cfg()
    trainer, style_f = train(
        scene, style_img, cfg, img_size=32,
        guide_dir=str(tmp_path / "guides"),
    )
    assert style_f.shape == (1, 512)
    assert int(trainer.gstate.n_active) > 0
    assert trainer.rvq_scale is not None
    assert trainer.rvq_scale.codebooks.shape == (2, 8, 3)
    assert trainer.rvq_rot.codebooks.shape == (2, 8, 4)
    assert np.isfinite(np.asarray(trainer.gstate.xyz)).all()


def test_rvq_roundtrip(rng):
    data = jnp.asarray(rng.standard_normal((500, 3)).astype(np.float32))
    state = rvq_mod.kmeans_init(jax.random.PRNGKey(0), data, num_quantizers=4,
                                codebook_size=32, iters=2)
    xq, idx = rvq_mod.quantize(state, data)
    assert idx.shape == (500, 4)
    # Residual cascade should reconstruct reasonably well.
    err = float(jnp.mean((xq - data) ** 2)) / float(jnp.mean(data**2))
    assert err < 0.3, err
    # decode(indices) == forward quantization values.
    np.testing.assert_allclose(np.asarray(rvq_mod.decode(state, idx)),
                               np.asarray(xq), atol=1e-6)
    # Straight-through gradient: d(quantize)/dx == identity.
    g = jax.grad(lambda x: jnp.sum(rvq_mod.quantize(state, x)[0]))(data)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)
