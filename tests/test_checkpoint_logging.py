"""Checkpoint/resume + logging tests."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_scalar_logger(tmp_path):
    from aip_tpu.utils.logging import ScalarLogger

    log = ScalarLogger(tmp_path, use_tensorboard=False)
    log.scalar("loss", 1.5, 1)
    log.scalar("loss", 1.2, 2)
    log.close()
    lines = [json.loads(l) for l in (tmp_path / "scalars.jsonl").read_text().splitlines()]
    assert lines[0]["tag"] == "loss" and lines[0]["value"] == 1.5
    assert lines[1]["step"] == 2


def test_trainer_checkpoint_roundtrip(tmp_path, rng):
    from aip_tpu.gs.train import GSTrainConfig, init_trainer
    from aip_tpu.gs.checkpoint import save_checkpoint, load_checkpoint

    cfg = GSTrainConfig(capacity=64, style_dim=0, log2_hashmap=10,
                        rvq_size=8, rvq_num=2, net_lr_step=(100,))
    pts = rng.standard_normal((40, 3)).astype(np.float32)
    cols = rng.random((40, 3)).astype(np.float32)
    trainer = init_trainer(cfg, pts, cols, 2.0)
    trainer = trainer._replace(step=jnp.asarray(7, jnp.int32))

    path = save_checkpoint(tmp_path / "ckpt", trainer)
    restored = load_checkpoint(path, trainer)
    assert int(restored.step) == 7
    np.testing.assert_allclose(np.asarray(restored.gstate.xyz),
                               np.asarray(trainer.gstate.xyz))
    np.testing.assert_allclose(np.asarray(restored.field.hash_tables),
                               np.asarray(trainer.field.hash_tables))


def test_train_with_logging_and_checkpoint(tmp_path, rng, monkeypatch):
    """train() with test_iterations + checkpoint_iterations + resume."""
    from PIL import Image

    from aip_tpu.models import weights as weights_mod
    from aip_tpu.gs.dataset import Scene
    from aip_tpu.gs.train import GSTrainConfig, train
    from aip_tpu.utils.logging import ScalarLogger

    monkeypatch.setattr(weights_mod, "DEFAULT_WEIGHTS_DIR", tmp_path / "w")
    (tmp_path / "scene" / "images").mkdir(parents=True)
    frames = []
    for i in range(2):
        c2w = np.eye(4)
        c2w[2, 3] = 3.0
        frames.append({"file_path": f"./images/r_{i}", "transform_matrix": c2w.tolist()})
        img = np.zeros((32, 32, 4), np.uint8)
        img[8:24, 8:24] = (200, 40, 40, 255)
        img[..., 3] = 255
        Image.fromarray(img).save(tmp_path / "scene" / "images" / f"r_{i}.png")
    (tmp_path / "scene" / "transforms_train.json").write_text(
        json.dumps({"camera_angle_x": 0.8, "frames": frames}))
    Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(tmp_path / "style.png")

    scene = Scene(str(tmp_path / "scene"), shuffle=False)
    scene.scene_info.point_cloud.points = scene.scene_info.point_cloud.points[:80]
    scene.scene_info.point_cloud.colors = scene.scene_info.point_cloud.colors[:80]
    cfg = GSTrainConfig(iterations=10, freeze_iters=8, capacity=128, max_per_tile=16,
                        raster_chunk=128, densify_from_iter=100, log2_hashmap=10,
                        rvq_size=8, rvq_num=2, net_lr_step=(100,), style_dim=0)
    logger = ScalarLogger(tmp_path / "logs", use_tensorboard=False)
    trainer, _ = train(
        scene, str(tmp_path / "style.png"), cfg, img_size=32,
        guide_dir=str(tmp_path / "guides"), logger=logger,
        test_iterations=(5,), checkpoint_iterations=(6,),
        checkpoint_dir=str(tmp_path / "ckpts"),
    )
    logger.close()
    scalars = (tmp_path / "logs" / "scalars.jsonl").read_text()
    assert "test/psnr" in scalars
    assert (tmp_path / "ckpts" / "chkpnt6").exists()

    # Resume from the checkpoint: runs the remaining iterations only.
    trainer2, _ = train(
        scene, str(tmp_path / "style.png"), cfg, img_size=32,
        guide_dir=str(tmp_path / "guides2"),
        start_checkpoint=str(tmp_path / "ckpts" / "chkpnt6"),
    )
    assert int(trainer2.step) == 10


def test_resume_across_recompaction(tmp_path, rng):
    """A checkpoint saved AFTER a capacity-bucket shrink restores into a
    template of the original (larger) capacity: orbax adopts the saved
    shapes, and training resumes at the smaller bucket."""
    from aip_tpu.gs.train import GSTrainConfig, init_trainer
    from aip_tpu.gs import gaussians as G
    from aip_tpu.gs.checkpoint import save_checkpoint, load_checkpoint

    cfg = GSTrainConfig(capacity=128, style_dim=0, log2_hashmap=10,
                        rvq_size=8, rvq_num=2, net_lr_step=(100,))
    pts = rng.standard_normal((40, 3)).astype(np.float32)
    trainer = init_trainer(cfg, pts, rng.random((40, 3)).astype(np.float32), 2.0)
    order = G.recompact_order(trainer.gstate)
    small = trainer._replace(
        gstate=G.shrink_tree(trainer.gstate, order, 64),
        opt_g=G.shrink_tree(trainer.opt_g, order, 64),
        step=jnp.asarray(16, jnp.int32))
    path = save_checkpoint(tmp_path / "ck", small)

    template = init_trainer(cfg, pts, rng.random((40, 3)).astype(np.float32), 2.0)
    restored = load_checkpoint(path, template)
    assert restored.gstate.capacity == 64
    assert int(restored.step) == 16
    np.testing.assert_allclose(np.asarray(restored.gstate.xyz),
                               np.asarray(small.gstate.xyz))
