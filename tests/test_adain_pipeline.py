"""End-to-end AdaIN pipeline tests (small shapes, random weights)."""

import numpy as np
import jax
import jax.numpy as jnp

from aip_tpu.models.vgg import init_vgg_params, vgg_encode, vgg_encode_with_intermediate
from aip_tpu.models.decoder import init_decoder_params, decoder_apply
from aip_tpu.pipelines.adain_infer import stylize_simple, stylize_depth, adain_inference
from aip_tpu.ops.depth import compute_stylization_strength_map


def _params():
    key = jax.random.PRNGKey(0)
    return init_vgg_params(key), init_decoder_params(jax.random.PRNGKey(1))


def test_vgg_encoder_shapes(rng):
    vgg_params, _ = _params()
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    feats = vgg_encode_with_intermediate(vgg_params, x)
    assert feats["relu1_1"].shape == (1, 64, 64, 64)
    assert feats["relu2_1"].shape == (1, 32, 32, 128)
    assert feats["relu3_1"].shape == (1, 16, 16, 256)
    assert feats["relu4_1"].shape == (1, 8, 8, 512)


def test_decoder_inverts_spatial_dims(rng):
    _, dec_params = _params()
    f = jnp.asarray(rng.random((1, 8, 8, 512)).astype(np.float32))
    out = decoder_apply(dec_params, f)
    assert out.shape == (1, 64, 64, 3)


def test_stylize_simple_runs_and_is_finite(rng):
    vgg_params, dec_params = _params()
    c = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    s = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    out = stylize_simple(vgg_params, dec_params, c, s, alpha=0.5, compute_dtype=jnp.float32)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_stylize_alpha_zero_reconstructs_content_feat(rng):
    """alpha=0 blends to pure content features (net.py:146 semantics)."""
    vgg_params, dec_params = _params()
    c = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    s = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    out0 = stylize_simple(vgg_params, dec_params, c, s, alpha=0.0, compute_dtype=jnp.float32)
    content_f = vgg_encode(vgg_params, c, "relu4_1", jnp.float32)
    direct = decoder_apply(dec_params, content_f)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(direct), atol=1e-5)


def test_stylize_depth_runs(rng):
    vgg_params, dec_params = _params()
    c = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    s = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    depth = jnp.asarray(rng.random((64, 64)).astype(np.float32))
    out = stylize_depth(vgg_params, dec_params, c, s, depth, compute_dtype=jnp.float32)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_strength_map_range_and_constant_case(rng):
    d = jnp.asarray(rng.random((32, 32)).astype(np.float32))
    p = compute_stylization_strength_map(d, (8, 8), offset=0.15, prominence=20.0)
    assert p.shape == (8, 8)
    assert float(jnp.max(p)) <= 1.0 - 0.15 + 1e-6
    assert float(jnp.min(p)) >= 0.0
    # Constant map -> zeros (reference test.py:139-143).
    pc = compute_stylization_strength_map(jnp.ones((32, 32)), (8, 8))
    np.testing.assert_array_equal(np.asarray(pc), 0.0)


def test_adain_inference_end_to_end(tmp_path, rng, monkeypatch):
    """Full IO wrapper: PIL in, JPEG out, mask composite."""
    monkeypatch.setenv("AIP_TPU_WEIGHTS", str(tmp_path / "weights"))
    from aip_tpu.models import weights as weights_mod

    monkeypatch.setattr(weights_mod, "DEFAULT_WEIGHTS_DIR", tmp_path / "weights")
    content = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
    style = (rng.random((40, 48, 3)) * 255).astype(np.uint8)
    mask = np.zeros((1, 40, 48), dtype=np.float32)
    mask[:, :20] = 1.0

    out_path = adain_inference(
        content, style,
        content_size=32, style_size=32,
        output=str(tmp_path), file_name="t",
        content_mask=mask,
    )
    assert out_path.exists()
    from PIL import Image

    img = np.asarray(Image.open(out_path))
    assert img.shape[-1] == 3


def test_adain_inference_depth_path(tmp_path, rng, monkeypatch):
    from aip_tpu.models import weights as weights_mod

    monkeypatch.setattr(weights_mod, "DEFAULT_WEIGHTS_DIR", tmp_path / "weights")
    content = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    style = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
    out_path = adain_inference(
        content, style,
        content_size=32, style_size=32,
        output=str(tmp_path), file_name="d",
        use_depth=True,
    )
    assert out_path.exists()


def test_strength_map_matches_torch_oracle(rng):
    """compute_stylization_strength_map vs a torch transcription of the
    reference math (test.py:119-150): bicubic resize -> min-max -> mean
    center -> sigmoid(prominence*x) -> clamp <= 1-offset."""
    import torch
    import torch.nn.functional as F

    depth = rng.random((37, 45)).astype(np.float32) * 5.0
    offset, prominence = 0.3, 17.0
    hc, wc = 9, 11

    ours = np.asarray(compute_stylization_strength_map(
        jnp.asarray(depth), (hc, wc), offset, prominence))

    d = torch.from_numpy(depth)[None, None]
    p = F.interpolate(d, size=(hc, wc), mode="bicubic", align_corners=False)
    mn, mx = p.min(), p.max()
    p = (p - mn) / (mx - mn)
    p = p - p.mean()
    p = 1.0 / (1.0 + torch.exp(-prominence * p))
    p = torch.clamp(p, max=1.0 - offset)
    expect = p[0, 0].numpy()
    np.testing.assert_allclose(ours, expect, atol=1e-5)
