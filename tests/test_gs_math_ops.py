"""SH eval / quaternion / Morton / kNN vs oracles."""

import numpy as np
import jax.numpy as jnp

from aip_tpu.ops.sh import eval_sh, rgb_to_sh, sh_to_rgb, C0
from aip_tpu.ops.quaternion import (
    build_rotation,
    build_scaling_rotation,
    covariance_from_scaling_rotation,
    strip_symmetric,
    inverse_sigmoid,
)
from aip_tpu.ops.morton import morton_encode_np, morton_encode, morton_argsort
from aip_tpu.ops.knn import mean_knn_sq_dist


def test_sh_deg0_is_constant(rng):
    sh = rng.standard_normal((5, 3, 1)).astype(np.float32)
    dirs = rng.standard_normal((5, 3)).astype(np.float32)
    out = np.asarray(eval_sh(0, jnp.asarray(sh), jnp.asarray(dirs)))
    np.testing.assert_allclose(out, C0 * sh[..., 0], rtol=1e-6)


def test_sh_roundtrip_rgb():
    rgb = np.array([[0.2, 0.5, 0.9]], np.float32)
    np.testing.assert_allclose(
        np.asarray(sh_to_rgb(rgb_to_sh(jnp.asarray(rgb)))), rgb, rtol=1e-6
    )


def test_sh_orthonormality_integration(rng):
    """Integral of Y_lm * Y_l'm' over the sphere ~= delta — sanity for basis
    constants at deg<=3 via Monte Carlo."""
    n = 200_000
    v = rng.standard_normal((n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    # Basis value for coefficient k: eval with one-hot sh.
    def basis(k):
        sh = np.zeros((n, 1, 16), np.float32)
        sh[:, 0, k] = 1.0
        return np.asarray(eval_sh(3, jnp.asarray(sh), jnp.asarray(v.astype(np.float32))))[:, 0]
    b2 = basis(2)
    b6 = basis(6)
    # <Y,Y> * 4pi ≈ 1 for orthonormal real SH.
    assert abs(4 * np.pi * np.mean(b2 * b2) - 1.0) < 0.05
    assert abs(4 * np.pi * np.mean(b2 * b6)) < 0.05


def test_build_rotation_orthogonal(rng):
    q = rng.standard_normal((10, 4)).astype(np.float32)
    R = np.asarray(build_rotation(jnp.asarray(q)))
    for i in range(10):
        np.testing.assert_allclose(R[i] @ R[i].T, np.eye(3), atol=1e-5)
        assert abs(np.linalg.det(R[i]) - 1.0) < 1e-5


def test_build_rotation_identity():
    q = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    np.testing.assert_allclose(np.asarray(build_rotation(q))[0], np.eye(3), atol=1e-7)


def test_covariance_psd(rng):
    s = np.exp(rng.standard_normal((8, 3))).astype(np.float32)
    q = rng.standard_normal((8, 4)).astype(np.float32)
    cov = np.asarray(covariance_from_scaling_rotation(jnp.asarray(s), jnp.asarray(q)))
    for c in cov:
        evals = np.linalg.eigvalsh(c)
        assert (evals > 0).all()
    packed = np.asarray(strip_symmetric(jnp.asarray(cov)))
    np.testing.assert_allclose(packed[:, 0], cov[:, 0, 0], rtol=1e-6)
    np.testing.assert_allclose(packed[:, 5], cov[:, 2, 2], rtol=1e-6)


def test_inverse_sigmoid_roundtrip(rng):
    x = rng.random(20).astype(np.float32) * 0.9 + 0.05
    back = 1.0 / (1.0 + np.exp(-np.asarray(inverse_sigmoid(jnp.asarray(x)))))
    np.testing.assert_allclose(back, x, rtol=1e-5)


def test_morton_jax_matches_numpy(rng):
    pos = rng.integers(0, 2**21, (64, 3)).astype(np.int64)
    codes = morton_encode_np(pos.astype(np.uint64))
    hi, lo = morton_encode(jnp.asarray(pos.astype(np.int32)))
    ours = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | np.asarray(lo).astype(np.uint64)
    np.testing.assert_array_equal(ours, codes)


def test_morton_argsort_orders_by_code(rng):
    pos = rng.random((128, 3)).astype(np.float32)
    lower = jnp.zeros(3)
    upper = jnp.ones(3)
    order = np.asarray(morton_argsort(jnp.asarray(pos), lower, upper))
    grid = np.clip(pos * (2**21 - 1), 0, 2**21 - 1).astype(np.uint64)
    codes = morton_encode_np(grid)
    assert (np.diff(codes[order]) >= 0).all()


def test_knn_matches_bruteforce(rng):
    pts = rng.standard_normal((200, 3)).astype(np.float32)
    ours = np.asarray(mean_knn_sq_dist(jnp.asarray(pts), k=3, block_size=64))
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    expect = np.sort(d2, axis=1)[:, :3].mean(1)
    np.testing.assert_allclose(ours, np.maximum(expect, 1e-7), rtol=1e-4)
