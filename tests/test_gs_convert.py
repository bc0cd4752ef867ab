"""gs/convert.py COLMAP-driver tests with a mocked colmap executable
(VERDICT r1 item #9): a PATH shim records every argv and fabricates the
outputs each stage is expected to produce (reference
`Style_3DGS/convert.py:31-78`)."""

import json
import os
import stat
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

from aip_tpu.gs.convert import convert_scene, main as convert_main


@pytest.fixture
def fake_colmap(tmp_path):
    """A fake colmap binary: logs argv as JSON lines; image_undistorter
    fabricates sparse/ model files and images/."""
    log = tmp_path / "colmap_calls.jsonl"
    script = tmp_path / "colmap"
    script.write_text(f"""#!{sys.executable}
import json, sys, shutil
from pathlib import Path

args = sys.argv[1:]
with open({str(log)!r}, "a") as f:
    f.write(json.dumps(args) + "\\n")

def get(flag):
    for i, a in enumerate(args):
        if a == flag:
            return args[i + 1]
        if a.startswith(flag + "="):
            return a.split("=", 1)[1]
    return None

if args and args[0] == "mapper":
    out = Path(get("--output_path")) / "0"
    out.mkdir(parents=True, exist_ok=True)
    for n in ("cameras.bin", "images.bin", "points3D.bin"):
        (out / n).write_bytes(b"stub")
if args and args[0] == "image_undistorter":
    out = Path(get("--output_path"))
    (out / "sparse").mkdir(parents=True, exist_ok=True)
    for n in ("cameras.bin", "images.bin", "points3D.bin"):
        (out / "sparse" / n).write_bytes(b"stub")
    img_in = Path(get("--image_path"))
    (out / "images").mkdir(exist_ok=True)
    for p in img_in.iterdir():
        shutil.copy(p, out / "images" / p.name)
""")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    return script, log


def _make_source(tmp_path, rng, n=2, size=32):
    src = tmp_path / "scene"
    (src / "input").mkdir(parents=True)
    for i in range(n):
        Image.fromarray((rng.random((size, size, 3)) * 255).astype(np.uint8)
                        ).save(src / "input" / f"im{i}.jpg")
    return src


def _calls(log):
    return [json.loads(l) for l in log.read_text().splitlines()]


def test_convert_full_pipeline_args(tmp_path, rng, fake_colmap):
    colmap, log = fake_colmap
    src = _make_source(tmp_path, rng)
    out = convert_scene(str(src), colmap_executable=str(colmap))
    calls = _calls(log)
    stages = [c[0] for c in calls]
    assert stages == ["feature_extractor", "exhaustive_matcher", "mapper",
                      "image_undistorter"]

    fe = calls[0]
    assert "--ImageReader.single_camera" in fe and "OPENCV" in fe
    assert "--SiftExtraction.use_gpu" in fe
    assert fe[fe.index("--SiftExtraction.use_gpu") + 1] == "0"
    mapper = calls[2]
    assert any(a.startswith("--Mapper.ba_global_function_tolerance")
               for a in mapper)
    und = calls[3]
    assert und[und.index("--output_type") + 1] == "COLMAP"
    # Sparse model moved into sparse/0 (convert.py:70-78).
    assert (src / "sparse" / "0" / "points3D.bin").exists()
    assert not (src / "sparse" / "points3D.bin").exists()
    assert out == str(src)


def test_convert_skip_matching(tmp_path, rng, fake_colmap):
    colmap, log = fake_colmap
    src = _make_source(tmp_path, rng)
    # skip_matching expects a pre-existing distorted sparse model.
    (src / "distorted" / "sparse" / "0").mkdir(parents=True)
    convert_scene(str(src), colmap_executable=str(colmap), skip_matching=True)
    stages = [c[0] for c in _calls(log)]
    assert stages == ["image_undistorter"]


def test_convert_resize_pyramid(tmp_path, rng, fake_colmap):
    colmap, _log = fake_colmap
    src = _make_source(tmp_path, rng, size=64)
    convert_scene(str(src), colmap_executable=str(colmap), resize=True)
    for factor in (2, 4, 8):
        p = src / f"images_{factor}" / "im0.jpg"
        assert p.exists(), factor
        assert Image.open(p).size == (64 // factor, 64 // factor)


def test_convert_missing_binary_raises(tmp_path, rng, monkeypatch):
    src = _make_source(tmp_path, rng)
    monkeypatch.setenv("PATH", str(tmp_path / "nowhere"))
    with pytest.raises(RuntimeError, match="colmap binary not found"):
        convert_scene(str(src))


def test_convert_stage_failure_raises(tmp_path, rng):
    src = _make_source(tmp_path, rng)
    bad = tmp_path / "colmap_bad"
    bad.write_text(f"#!{sys.executable}\nimport sys\nsys.stderr.write('boom')\nsys.exit(3)\n")
    bad.chmod(bad.stat().st_mode | stat.S_IEXEC)
    with pytest.raises(RuntimeError, match="boom"):
        convert_scene(str(src), colmap_executable=str(bad))


def test_convert_cli(tmp_path, rng, fake_colmap):
    colmap, log = fake_colmap
    src = _make_source(tmp_path, rng)
    convert_main(["--source_path", str(src), "--no_gpu",
                  "--colmap_executable", str(colmap), "--camera", "PINHOLE"])
    fe = _calls(log)[0]
    assert "PINHOLE" in fe
