"""Color space / PCA / CDF matching vs numpy+sklearn oracles."""

import numpy as np
import jax.numpy as jnp

from aip_tpu.ops.color import (
    RGB_TO_LMS,
    LMS_TO_LAB,
    rgb_to_lab,
    lab_to_rgb,
    weighted_pca1,
    masked_cdf_match,
    harmonize_foreground,
)


def _np_rgb_to_lab(rgb01):
    lms = rgb01.reshape(-1, 3) @ RGB_TO_LMS.T
    lms = np.maximum(lms, 1e-6)
    return (np.log10(lms) @ LMS_TO_LAB.T).reshape(rgb01.shape)


def test_rgb_to_lab_matches_numpy(rng):
    x = rng.random((8, 9, 3)).astype(np.float32)
    ours = np.asarray(rgb_to_lab(jnp.asarray(x)))
    np.testing.assert_allclose(ours, _np_rgb_to_lab(x), rtol=1e-4, atol=1e-5)


def test_lab_rgb_roundtrip(rng):
    x = (rng.random((16, 16, 3)) * 0.8 + 0.1).astype(np.float32)
    back = np.asarray(lab_to_rgb(rgb_to_lab(jnp.asarray(x))))
    np.testing.assert_allclose(back, x, atol=2e-3)


def test_weighted_pca1_matches_sklearn(rng):
    from sklearn.decomposition import PCA

    x = rng.standard_normal((500, 3)).astype(np.float32)
    x[:, 0] *= 5.0  # dominant direction
    w = (rng.random(500) > 0.3).astype(np.float32)

    proj, mean, comp = weighted_pca1(jnp.asarray(x), jnp.asarray(w))
    pca = PCA(n_components=1)
    ref_proj = pca.fit_transform(x[w > 0])

    np.testing.assert_allclose(np.asarray(mean), x[w > 0].mean(0), atol=1e-5)
    ref_comp = pca.components_[0]
    ours_comp = np.asarray(comp)
    # Component defined up to sign.
    if np.dot(ref_comp, ours_comp) < 0:
        ours_comp = -ours_comp
    np.testing.assert_allclose(ours_comp, ref_comp, atol=1e-4)
    ours_proj = np.asarray(proj)[w > 0]
    if np.dot(ref_comp, np.asarray(comp)) < 0:
        ours_proj = -ours_proj
    np.testing.assert_allclose(ours_proj, ref_proj[:, 0], atol=1e-3)


def test_masked_cdf_match_matches_numpy(rng):
    """Oracle: reference-style sort + np.interp on the valid subsets."""
    t = rng.standard_normal(400).astype(np.float32)
    s = (rng.standard_normal(300) * 2 + 1).astype(np.float32)
    tw = np.ones(400, np.float32)
    sw = np.ones(300, np.float32)
    # Pad source into same-length buffer with zero weights (static shapes).
    s_pad = np.concatenate([s, np.zeros(100, np.float32)])
    sw_pad = np.concatenate([sw, np.zeros(100, np.float32)])

    ours = np.asarray(
        masked_cdf_match(jnp.asarray(t), jnp.asarray(tw), jnp.asarray(s_pad), jnp.asarray(sw_pad), k=2048)
    )

    t_sorted = np.sort(t)
    s_sorted = np.interp(np.linspace(0, 1, len(t)), np.linspace(0, 1, len(s)), np.sort(s))
    expect = np.interp(t, t_sorted, s_sorted)
    err = np.abs(ours - expect)
    # K-grid quantile resampling deviates only at the extreme tails.
    assert np.percentile(err, 99) < 2e-2, np.percentile(err, 99)
    assert err.max() < 0.15, err.max()


def test_masked_cdf_match_distribution_transfer(rng):
    t = rng.standard_normal(1000).astype(np.float32)
    s = (rng.standard_normal(1000) * 3 + 7).astype(np.float32)
    w = np.ones(1000, np.float32)
    out = np.asarray(masked_cdf_match(jnp.asarray(t), jnp.asarray(w), jnp.asarray(s), jnp.asarray(w)))
    assert abs(out.mean() - s.mean()) < 0.3
    assert abs(out.std() - s.std()) < 0.3


def test_harmonize_foreground_only_touches_fg(rng):
    img = rng.random((20, 20, 3)).astype(np.float32)
    bg_img = rng.random((20, 20, 3)).astype(np.float32)
    fg_mask = np.zeros((20, 20), np.float32)
    fg_mask[5:15, 5:15] = 1.0
    bg_mask = 1.0 - fg_mask
    out = np.asarray(
        harmonize_foreground(
            jnp.asarray(img), jnp.asarray(bg_img), jnp.asarray(fg_mask), jnp.asarray(bg_mask)
        )
    )
    np.testing.assert_array_equal(out[fg_mask == 0], img[fg_mask == 0])
    assert not np.allclose(out[fg_mask == 1], img[fg_mask == 1])


def test_localized_pipeline_end_to_end(tmp_path, rng, monkeypatch):
    from aip_tpu.models import weights as weights_mod
    from aip_tpu.pipelines.localized import run_localized_style_transfer
    from PIL import Image

    monkeypatch.setattr(weights_mod, "DEFAULT_WEIGHTS_DIR", tmp_path / "w")
    c = tmp_path / "c.png"
    s = tmp_path / "s.png"
    Image.fromarray((rng.random((48, 48, 3)) * 255).astype(np.uint8)).save(c)
    Image.fromarray((rng.random((48, 48, 3)) * 255).astype(np.uint8)).save(s)

    out = run_localized_style_transfer(str(c), str(s), output_path=str(tmp_path), file_name="x")
    assert Path(out).exists()
    img = np.asarray(Image.open(out))
    assert img.shape == (48, 48, 3)


from pathlib import Path
