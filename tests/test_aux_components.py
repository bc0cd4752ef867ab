"""Auxiliary components: network GUI bridge, system utils, style
interpolation, sweep harness, full_eval wiring."""

import json
import socket
import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_network_gui_roundtrip():
    from aip_tpu.gs.network_gui import NetworkGUI

    gui = NetworkGUI(port=0)  # ephemeral port
    port = gui.listener.getsockname()[1]

    msg = {
        "resolution_x": 8, "resolution_y": 6, "train": 1, "fov_y": 0.8,
        "fov_x": 0.9, "z_near": 0.01, "z_far": 100.0, "shs_python": 0,
        "rot_scale_python": 0, "keep_alive": 1, "scaling_modifier": 1.0,
        "view_matrix": list(np.eye(4).ravel().astype(float)),
        "view_projection_matrix": list(np.eye(4).ravel().astype(float)),
    }

    received = {}

    def client():
        s = socket.create_connection(("127.0.0.1", port), timeout=10)
        payload = json.dumps(msg).encode()
        s.sendall(len(payload).to_bytes(4, "little") + payload)

        def recv_exact(n):
            buf = b""
            while len(buf) < n:
                chunk = s.recv(n - len(buf))
                if not chunk:
                    raise ConnectionError
                buf += chunk
            return buf

        img = recv_exact(8 * 6 * 3)
        vlen = int.from_bytes(recv_exact(4), "little")
        verify = recv_exact(vlen).decode()
        received["img_len"] = len(img)
        received["verify"] = verify
        s.close()

    t = threading.Thread(target=client)
    t.start()
    import time

    for _ in range(100):
        gui.try_connect()
        if gui.conn:
            break
        time.sleep(0.05)
    assert gui.conn is not None
    cam, do_training, keep_alive, scaling = gui.receive()
    assert cam.image_width == 8 and cam.image_height == 6
    assert do_training and keep_alive and scaling == 1.0
    # Y/Z sign flips applied.
    assert cam.world_view_transform[1, 1] == -1.0
    gui.send(np.zeros((6, 8, 3), np.uint8), "ok")
    t.join(timeout=5)
    gui.close()
    assert received["img_len"] == 144
    assert received["verify"] == "ok"


def test_system_utils(tmp_path, capsys):
    from aip_tpu.utils.system import mkdir_p, search_for_max_iteration, safe_state

    mkdir_p(str(tmp_path / "a" / "b"))
    mkdir_p(str(tmp_path / "a" / "b"))  # idempotent
    assert (tmp_path / "a" / "b").is_dir()

    (tmp_path / "c").mkdir()
    for n in ["iteration_30", "iteration_7000", "iteration_15000"]:
        (tmp_path / "c" / n).mkdir()
    assert search_for_max_iteration(tmp_path / "c") == 15000

    import sys

    old = sys.stdout
    try:
        safe_state(silent=False)
        print("hello")
        sys.stdout.flush()
    finally:
        sys.stdout = old


def test_style_interpolation(rng):
    from aip_tpu.models.vgg import init_vgg_params
    from aip_tpu.models.decoder import init_decoder_params
    from aip_tpu.pipelines.adain_infer import stylize_interpolated

    vgg_params = init_vgg_params(jax.random.PRNGKey(0))
    dec_params = init_decoder_params(jax.random.PRNGKey(1))
    c = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    styles = jnp.asarray(rng.random((3, 32, 32, 3)).astype(np.float32))

    w1 = jnp.asarray([1.0, 0.0, 0.0])
    w2 = jnp.asarray([0.0, 0.0, 1.0])
    out1 = stylize_interpolated(vgg_params, dec_params, c, styles, w1,
                                compute_dtype=jnp.float32)
    out2 = stylize_interpolated(vgg_params, dec_params, c, styles, w2,
                                compute_dtype=jnp.float32)
    assert out1.shape == (1, 32, 32, 3)
    assert not np.allclose(np.asarray(out1), np.asarray(out2))

    # One-hot weights equal plain single-style stylization at alpha=1.
    from aip_tpu.pipelines.adain_infer import stylize_simple

    single = stylize_simple(vgg_params, dec_params, c, styles[:1], alpha=1.0,
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(single), atol=1e-4)


def test_sweep_depth_cli(tmp_path, rng, monkeypatch):
    from PIL import Image

    from aip_tpu.models import weights as weights_mod
    from aip_tpu.cli.sweep_depth import main

    monkeypatch.setattr(weights_mod, "DEFAULT_WEIGHTS_DIR", tmp_path / "w")
    c = tmp_path / "c.png"
    s = tmp_path / "s.png"
    Image.fromarray((rng.random((40, 40, 3)) * 255).astype(np.uint8)).save(c)
    Image.fromarray((rng.random((40, 40, 3)) * 255).astype(np.uint8)).save(s)
    out = main(["--content", str(c), "--style", str(s),
                "--output", str(tmp_path), "--offsets", "0", "0.5"])
    assert (tmp_path / "depth_values_comparison.png").exists()


def test_full_eval_empty_sets(tmp_path):
    from aip_tpu.gs.full_eval import run_full_eval

    out = run_full_eval("style.png", output_path=str(tmp_path))
    assert out == {}


def test_network_gui_in_training_loop(tmp_path, rng, monkeypatch):
    """A viewer connected during train() receives a rendered frame."""
    import json as _json
    import socket as _socket
    import threading as _threading

    from PIL import Image

    from aip_tpu.models import weights as weights_mod
    from aip_tpu.gs.dataset import Scene
    from aip_tpu.gs.network_gui import NetworkGUI
    from aip_tpu.gs.train import GSTrainConfig, train

    monkeypatch.setattr(weights_mod, "DEFAULT_WEIGHTS_DIR", tmp_path / "w")
    (tmp_path / "scene" / "images").mkdir(parents=True)
    frames = []
    c2w = np.eye(4); c2w[2, 3] = 3.0
    frames.append({"file_path": "./images/r_0", "transform_matrix": c2w.tolist()})
    img = np.zeros((32, 32, 4), np.uint8); img[..., 3] = 255; img[8:24, 8:24] = (200, 0, 0, 255)
    Image.fromarray(img).save(tmp_path / "scene" / "images" / "r_0.png")
    (tmp_path / "scene" / "transforms_train.json").write_text(
        _json.dumps({"camera_angle_x": 0.8, "frames": frames}))
    Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(tmp_path / "s.png")

    scene = Scene(str(tmp_path / "scene"), shuffle=False)
    scene.scene_info.point_cloud.points = scene.scene_info.point_cloud.points[:60]
    scene.scene_info.point_cloud.colors = scene.scene_info.point_cloud.colors[:60]

    gui = NetworkGUI(port=0)
    port = gui.listener.getsockname()[1]
    got = {}

    def viewer():
        s = _socket.create_connection(("127.0.0.1", port), timeout=60)
        msg = {"resolution_x": 16, "resolution_y": 16, "train": 1, "fov_y": 0.8,
               "fov_x": 0.8, "z_near": 0.01, "z_far": 100.0, "shs_python": 0,
               "rot_scale_python": 0, "keep_alive": 0, "scaling_modifier": 1.0,
               "view_matrix": list(np.eye(4).ravel().astype(float)),
               "view_projection_matrix": list(np.eye(4).ravel().astype(float))}
        payload = _json.dumps(msg).encode()
        s.sendall(len(payload).to_bytes(4, "little") + payload)

        def rx(n):
            b = b""
            while len(b) < n:
                ch = s.recv(n - len(b))
                if not ch:
                    raise ConnectionError
                b += ch
            return b

        got["frame"] = rx(16 * 16 * 3)
        vlen = int.from_bytes(rx(4), "little")
        got["verify"] = rx(vlen).decode()
        s.close()

    t = _threading.Thread(target=viewer, daemon=True)
    t.start()
    cfg = GSTrainConfig(iterations=3, freeze_iters=2, capacity=64, max_per_tile=16,
                        raster_chunk=64, densify_from_iter=100, log2_hashmap=10,
                        rvq_size=8, rvq_num=2, net_lr_step=(100,), style_dim=0)
    train(scene, str(tmp_path / "s.png"), cfg, img_size=32,
          guide_dir=str(tmp_path / "g"), network_gui=gui)
    t.join(timeout=30)
    gui.close()
    assert len(got.get("frame", b"")) == 16 * 16 * 3


def test_depixelize_and_stylize(tmp_path, rng, monkeypatch):
    from PIL import Image

    from aip_tpu.models import weights as weights_mod
    from aip_tpu.pipelines.pixel_art import depixelize_and_stylize

    monkeypatch.setattr(weights_mod, "DEFAULT_WEIGHTS_DIR", tmp_path / "w")
    sprite = np.zeros((8, 8, 3), np.uint8)
    sprite[2:6, 2:6] = (200, 30, 30)
    style = tmp_path / "style.png"
    Image.fromarray((rng.random((32, 32, 3)) * 255).astype(np.uint8)).save(style)
    out = depixelize_and_stylize(sprite, str(style), scale=4,
                                 output=str(tmp_path), use_depth=False)
    assert out.exists()


def test_step_timer_and_device_sync(rng):
    import jax.numpy as jnp

    from aip_tpu.utils.profiling import StepTimer, device_sync

    t = StepTimer()
    t.start()
    x = jnp.ones((64, 64)) * 2
    dt = t.stop(sync_on=x)
    assert dt >= 0 and t.value is not None
    device_sync(x)  # no exception
