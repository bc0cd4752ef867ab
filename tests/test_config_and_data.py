"""Config system + data loader tests."""

import argparse
import json

import numpy as np
import pytest
from PIL import Image

from aip_tpu.config import (
    ModelParams,
    OptimizationParams,
    PipelineParams,
    save_cfg_args,
    get_combined_args,
)
from aip_tpu.data.images import FlatFolderDataset, infinite_batches, train_transform


def test_param_group_defaults_roundtrip():
    parser = argparse.ArgumentParser()
    mp = ModelParams()
    op = OptimizationParams()
    mp.add_to_parser(parser, "model")
    op.add_to_parser(parser, "opt")
    args = parser.parse_args(["--source_path", "/x", "--iterations", "123"])
    m = mp.extract(args)
    o = op.extract(args)
    assert m.source_path.endswith("/x")
    assert o.iterations == 123
    assert o.densify_grad_threshold == 0.0002  # untouched default
    assert m.style_dim == 256 and m.rvq_size == 64 and m.max_hashmap == 19


def test_shorthand_flags():
    parser = argparse.ArgumentParser()
    ModelParams().add_to_parser(parser, "model")
    args = parser.parse_args(["-s", "/scene", "-m", "/model", "-w"])
    assert args.source_path == "/scene"
    assert args.model_path == "/model"
    assert args.white_background is True


def test_cfg_args_merge(tmp_path):
    ns = argparse.Namespace(source_path="/orig", iterations=500, model_path=str(tmp_path))
    save_cfg_args(tmp_path, ns)
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_path", default=str(tmp_path))
    parser.add_argument("--iterations", type=int, default=None)
    merged = get_combined_args(parser, [])
    assert merged.source_path == "/orig"  # from saved cfg
    assert merged.iterations == 500


def test_flat_folder_dataset(tmp_path, rng):
    for i in range(3):
        Image.fromarray((rng.random((30, 40, 3)) * 255).astype(np.uint8)).save(
            tmp_path / f"img_{i}.jpg"
        )
    (tmp_path / "notes.txt").write_text("not an image")
    ds = FlatFolderDataset(tmp_path)
    assert len(ds) == 3
    crop = ds.load(0, np.random.default_rng(0), crop=16)
    assert crop.shape == (16, 16, 3)
    assert crop.dtype == np.float32 and crop.max() <= 1.0

    it = infinite_batches(ds, batch_size=2, crop=16)
    b1 = next(it)
    b2 = next(it)
    assert b1.shape == (2, 16, 16, 3)
    assert not np.array_equal(b1, b2)


def test_empty_folder_raises(tmp_path):
    with pytest.raises(ValueError):
        FlatFolderDataset(tmp_path)


def test_read_images_binary_point3d_ids(tmp_path):
    """POINT2D records are (double x, double y, int64 id); the id must not
    be reinterpreted as a double (-1 -> NaN) (ADVICE r1 low)."""
    import struct

    from aip_tpu.gs.colmap import read_images_binary

    p = tmp_path / "images.bin"
    with open(p, "wb") as f:
        f.write(struct.pack("<Q", 1))                      # n images
        f.write(struct.pack("<i", 7))                      # image id
        f.write(struct.pack("<4d", 1.0, 0.0, 0.0, 0.0))    # qvec
        f.write(struct.pack("<3d", 0.1, 0.2, 0.3))         # tvec
        f.write(struct.pack("<i", 1))                      # camera id
        f.write(b"img.png\x00")
        f.write(struct.pack("<Q", 2))                      # n points2D
        f.write(struct.pack("<ddq", 10.5, 20.5, -1))
        f.write(struct.pack("<ddq", 30.0, 40.0, 12345))
    images = read_images_binary(p)
    img = images[7]
    np.testing.assert_allclose(img.xys, [[10.5, 20.5], [30.0, 40.0]])
    assert img.point3D_ids.tolist() == [-1, 12345]
