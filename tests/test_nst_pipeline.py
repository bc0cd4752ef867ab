"""Optimization NST tests: gram oracle, loss descent, spatial blending."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from aip_tpu.ops.gram import gram_matrix
from aip_tpu.models import vgg19_std as backbone
from aip_tpu.pipelines.nst import nst_optimize, color_mask, spatially_varying_style_transfer


def test_gram_matches_torch(rng):
    x = rng.standard_normal((2, 6, 7, 5)).astype(np.float32)
    ours = np.asarray(gram_matrix(jnp.asarray(x)))
    t = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
    b, c, h, w = t.shape
    f = t.reshape(b, c, h * w)
    ref = (torch.bmm(f, f.transpose(1, 2)) / (c * h * w)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)


def test_vgg19_std_shapes(rng):
    params = backbone.init_vgg19_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    feats = backbone.extract_features(
        params, backbone.normalize_imagenet(x),
        ("conv1_1", "conv2_1", "conv3_1", "conv4_1", "conv4_2", "conv5_1"),
    )
    assert feats["conv1_1"].shape == (1, 64, 64, 64)
    assert feats["conv2_1"].shape == (1, 32, 32, 128)
    assert feats["conv3_1"].shape == (1, 16, 16, 256)
    assert feats["conv4_1"].shape == (1, 8, 8, 512)
    assert feats["conv4_2"].shape == (1, 8, 8, 512)
    assert feats["conv5_1"].shape == (1, 4, 4, 512)


def test_nst_reduces_style_loss(rng):
    """A short optimization should move grams toward the style's."""
    params = backbone.init_vgg19_params(jax.random.PRNGKey(0))
    content = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    style = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))

    def style_dist(img01):
        f = backbone.extract_features(
            params, backbone.normalize_imagenet(img01), ("conv2_1",))
        g = gram_matrix(f["conv2_1"])
        fs = backbone.extract_features(
            params, backbone.normalize_imagenet(style), ("conv2_1",))
        gs = gram_matrix(fs["conv2_1"])
        return float(jnp.mean((g - gs) ** 2))

    before = style_dist(content)
    out = nst_optimize(params, content, style, jnp.ones((1,)),
                       num_steps=40, lr=0.02, style_weight=1e4)
    after = style_dist(out)
    assert after < before, (before, after)
    assert np.isfinite(np.asarray(out)).all()


def test_multi_style_weights_shift_result(rng):
    params = backbone.init_vgg19_params(jax.random.PRNGKey(0))
    content = jnp.asarray(rng.random((1, 32, 32, 3)).astype(np.float32))
    styles = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    out_a = nst_optimize(params, content, styles, jnp.asarray([1.0, 0.0]),
                         num_steps=20, lr=0.02, style_weight=1e4)
    out_b = nst_optimize(params, content, styles, jnp.asarray([0.0, 1.0]),
                         num_steps=20, lr=0.02, style_weight=1e4)
    assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


def test_color_mask_feathering():
    mask = np.zeros((20, 20, 3), np.float32)
    mask[5:15, 5:15, 0] = 1.0  # red region
    m = np.asarray(color_mask(jnp.asarray(mask), (1.0, 0.0, 0.0), feather=3))
    assert m[10, 10] > 0.9
    assert m[0, 0] < 0.05
    # Feathered edge is intermediate.
    assert 0.05 < m[5, 10] < 0.95


def test_spatial_variation_end_to_end(tmp_path, rng, monkeypatch):
    from aip_tpu.models import weights as weights_mod

    monkeypatch.setattr(weights_mod, "DEFAULT_WEIGHTS_DIR", tmp_path / "w")
    content = rng.random((24, 24, 3)).astype(np.float32)
    s1 = rng.random((24, 24, 3)).astype(np.float32)
    s2 = rng.random((24, 24, 3)).astype(np.float32)
    s3 = rng.random((24, 24, 3)).astype(np.float32)
    mask = np.zeros((24, 24, 3), np.float32)
    mask[:8, :, 0] = 1.0
    mask[8:16, :, 1] = 1.0
    mask[16:, :, 2] = 1.0

    out = spatially_varying_style_transfer(
        content, s1, s2, s3, mask, num_steps=5, max_dim=64,
    )
    assert out.shape == (24, 24, 3)
    assert np.isfinite(np.asarray(out)).all()
