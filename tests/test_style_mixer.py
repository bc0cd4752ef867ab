"""Multi-backbone NST + palette post tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aip_tpu.pipelines.style_mixer import (
    PREDEFINED_PALETTES,
    hex_to_rgb_palette,
    adjust_palette_hsl,
    select_style_for_prompt,
    get_feature_extractor,
    style_transfer,
    rgb_to_cielab,
    cielab_to_rgb,
    extract_palette,
    map_colors,
    blend_images_with_intensity,
    register_backbone,
)


def test_hex_palette_and_hsl():
    pal = hex_to_rgb_palette(PREDEFINED_PALETTES["Mario"])
    assert len(pal) == 5
    assert all(0 <= v <= 1 for c in pal for v in c)
    boosted = adjust_palette_hsl(pal, saturation=0.0)
    # Zero saturation -> gray (r == g == b).
    for c in boosted:
        assert abs(c[0] - c[1]) < 1e-9 and abs(c[1] - c[2]) < 1e-9


def test_cielab_roundtrip(rng):
    x = jnp.asarray((rng.random((8, 8, 3)) * 0.8 + 0.1).astype(np.float32))
    back = cielab_to_rgb(rgb_to_cielab(x))
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=5e-3)


def test_cielab_matches_skimage_convention():
    white = rgb_to_cielab(jnp.asarray([[1.0, 1.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(white)[0], [100.0, 0.0, 0.0], atol=0.5)
    black = rgb_to_cielab(jnp.asarray([[0.0, 0.0, 0.0]]))
    np.testing.assert_allclose(np.asarray(black)[0], [0.0, 0.0, 0.0], atol=0.5)


def test_extract_palette_and_map(rng):
    # Image made of two distinct colors -> palette should recover both.
    img = np.zeros((16, 16, 3), np.float32)
    img[:8] = [0.9, 0.1, 0.1]
    img[8:] = [0.1, 0.2, 0.9]
    pal = np.asarray(extract_palette(jnp.asarray(img), num_colors=2))
    reds = pal[np.argmax(pal[:, 0])]
    blues = pal[np.argmax(pal[:, 2])]
    assert reds[0] > 0.6 and blues[2] > 0.6

    mapped = np.asarray(map_colors(jnp.asarray(img), jnp.asarray(pal)))
    # All mapped pixels come from the palette (within conversion tolerance).
    flat = mapped.reshape(-1, 3)
    d = np.min(np.linalg.norm(flat[:, None] - pal[None], axis=-1), axis=1)
    assert d.max() < 0.05


def test_blend_intensity_bounds(rng):
    a = jnp.asarray(rng.random((4, 4, 3)).astype(np.float32))
    b = jnp.asarray(rng.random((4, 4, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(blend_images_with_intensity(a, b, 1.0)),
                               np.asarray(a), atol=1e-5)
    np.testing.assert_allclose(np.asarray(blend_images_with_intensity(a, b, 0.0)),
                               np.asarray(b), atol=1e-5)


def test_prompt_selection(tmp_path):
    for name in ["vangogh_starry.jpg", "picasso3.jpg", "other.png"]:
        (tmp_path / name).write_bytes(b"x")
    out = select_style_for_prompt("make it look like Van Gogh please", tmp_path)
    assert "vangogh" in out
    out2 = select_style_for_prompt("picasso style", tmp_path)
    assert "picasso" in out2


def test_resnet_extractor_shapes(rng):
    fx = get_feature_extractor("ResNet")
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    feats = fx(x)
    assert feats["layer1"].shape == (1, 16, 16, 256)
    assert feats["layer2"].shape == (1, 8, 8, 512)
    assert feats["layer3"].shape == (1, 4, 4, 1024)
    assert feats["layer4"].shape == (1, 2, 2, 2048)


def test_style_transfer_resnet_runs(rng):
    c = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    s = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    out = style_transfer(c, s, model="ResNet", iterations=3)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_custom_backbone_registration(rng):
    def fake(x):
        return {"layer2": x, "layer3": x, "layer4": x}

    register_backbone("Fake", fake)
    fx = get_feature_extractor("Fake")
    x = jnp.ones((1, 4, 4, 3))
    assert fx(x)["layer4"].shape == (1, 4, 4, 3)


def test_swin_extractor_shapes(rng):
    fx = get_feature_extractor("Swin")
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    feats = fx(x)
    assert feats["layer1"].shape == (1, 16, 16, 96)
    assert feats["layer2"].shape == (1, 8, 8, 192)
    assert feats["layer3"].shape == (1, 4, 4, 384)
    assert feats["swin"].shape == (1, 2, 2, 768)
    assert np.isfinite(np.asarray(feats["swin"])).all()


def test_style_transfer_swin_runs(rng):
    c = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    s = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    out = style_transfer(c, s, model="Swin", iterations=2)
    assert np.isfinite(np.asarray(out)).all()


def test_densenet_extractor_shapes(rng):
    fx = get_feature_extractor("DenseNet")
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    feats = fx(x)
    # DenseNet-121 channels: 256/512/1024 after blocks 1-3, 1024 after norm5.
    assert feats["layer1"].shape == (1, 16, 16, 256)
    assert feats["layer2"].shape == (1, 8, 8, 512)
    assert feats["layer3"].shape == (1, 4, 4, 1024)
    assert feats["layer4"].shape == (1, 2, 2, 1024)


def test_style_transfer_densenet_runs(rng):
    c = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    s = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    out = style_transfer(c, s, model="DenseNet", iterations=2)
    assert np.isfinite(np.asarray(out)).all()
