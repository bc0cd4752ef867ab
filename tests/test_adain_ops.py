"""Unit tests for AdaIN core ops vs torch/NumPy oracles."""

import numpy as np
import jax.numpy as jnp
import torch

from aip_tpu.ops.adain import calc_mean_std, adain, coral, style_loss_terms


def _torch_mean_std(feat_nchw, eps=1e-5):
    n, c = feat_nchw.shape[:2]
    var = feat_nchw.reshape(n, c, -1).var(dim=2) + eps
    std = var.sqrt().reshape(n, c, 1, 1)
    mean = feat_nchw.reshape(n, c, -1).mean(dim=2).reshape(n, c, 1, 1)
    return mean, std


def test_calc_mean_std_matches_torch(rng):
    x = rng.standard_normal((2, 7, 9, 5)).astype(np.float32)
    mean, std = calc_mean_std(jnp.asarray(x))
    t_mean, t_std = _torch_mean_std(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(mean)[:, 0, 0, :], t_mean.numpy()[:, :, 0, 0], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(std)[:, 0, 0, :], t_std.numpy()[:, :, 0, 0], rtol=1e-4, atol=1e-6)


def test_adain_matches_oracle(rng):
    c = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    s = rng.standard_normal((1, 6, 10, 4)).astype(np.float32)
    out = np.asarray(adain(jnp.asarray(c), jnp.asarray(s)))

    ct = torch.from_numpy(c).permute(0, 3, 1, 2)
    st = torch.from_numpy(s).permute(0, 3, 1, 2)
    sm, ss = _torch_mean_std(st)
    cm, cs = _torch_mean_std(ct)
    expect = ((ct - cm) / cs * ss + sm).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)


def test_adain_transfers_stats(rng):
    c = rng.standard_normal((1, 32, 32, 16)).astype(np.float32)
    s = (rng.standard_normal((1, 32, 32, 16)) * 3 + 5).astype(np.float32)
    out = adain(jnp.asarray(c), jnp.asarray(s))
    om, ostd = calc_mean_std(out)
    sm, sstd = calc_mean_std(jnp.asarray(s))
    np.testing.assert_allclose(np.asarray(om), np.asarray(sm), atol=1e-3)
    np.testing.assert_allclose(np.asarray(ostd), np.asarray(sstd), rtol=1e-2)


def test_coral_matches_target_stats(rng):
    src = rng.random((16, 12, 3)).astype(np.float32)
    tgt = (rng.random((10, 14, 3)) * 0.5 + 0.25).astype(np.float32)
    out = np.asarray(coral(jnp.asarray(src), jnp.asarray(tgt)))
    assert out.shape == src.shape
    # Channel means should match the target's after CORAL.
    np.testing.assert_allclose(
        out.reshape(-1, 3).mean(0), tgt.reshape(-1, 3).mean(0), atol=5e-2
    )
    # Channel correlation structure should match target's.
    def corr(a):
        f = a.reshape(-1, 3)
        f = (f - f.mean(0)) / (f.std(0) + 1e-8)
        return (f.T @ f) / f.shape[0]
    np.testing.assert_allclose(corr(out), corr(tgt), atol=0.12)


def test_style_loss_zero_for_identical(rng):
    x = rng.standard_normal((2, 8, 8, 4)).astype(np.float32)
    loss = style_loss_terms(jnp.asarray(x), jnp.asarray(x))
    assert float(loss) < 1e-10


def test_coral_matches_torch_oracle(rng):
    """Exact CORAL parity vs a torch transcription of function.py:26-67."""
    src = rng.random((12, 14, 3)).astype(np.float32)
    tgt = (rng.random((10, 11, 3)) * 0.6 + 0.2).astype(np.float32)
    ours = np.asarray(coral(jnp.asarray(src), jnp.asarray(tgt)))

    def flat_stats(img):
        f = torch.from_numpy(img).permute(2, 0, 1).reshape(3, -1)
        return f, f.mean(-1, keepdim=True), f.std(-1, keepdim=True)

    def mat_sqrt(x):
        u, d, v = torch.svd(x)
        return u @ d.pow(0.5).diag() @ v.t()

    sf, sm, ss = flat_stats(src)
    tf, tm, ts = flat_stats(tgt)
    sn = (sf - sm) / ss
    tn = (tf - tm) / ts
    s_cov = sn @ sn.t() + torch.eye(3)
    t_cov = tn @ tn.t() + torch.eye(3)
    transfer = mat_sqrt(t_cov) @ torch.inverse(mat_sqrt(s_cov)) @ sn
    expect = (transfer * ts + tm).reshape(3, 12, 14).permute(1, 2, 0).numpy()
    np.testing.assert_allclose(ours, expect, atol=2e-4)
