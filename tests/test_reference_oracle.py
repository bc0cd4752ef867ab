"""End-to-end pixel parity against the REFERENCE'S OWN torch code.

VERDICT r3 item #2: previous fidelity tests compared hand-built torch
*mirrors* of our layer specs; these tests run the reference implementation
itself. `/root/reference/Style_3DGS/AdaIN/{function,net,test}.py` are loaded
via importlib (the AdaIN package __init__ pulls in torchvision, which is not
installed here, so `test.py` gets a minimal stub for the two torchvision
symbols it uses — see _install_torchvision_stub; for PIL inputs torchvision's
own Resize delegates to PIL.Image.resize(BILINEAR), so the stub reproduces
the reference's actual runtime behavior, not an approximation of it).

Our deterministic random weights are converted into the reference's
nn.Sequential state_dicts, so any drift in layer program, padding, pooling,
resize or blend semantics fails these tests even without the pretrained
checkpoints (BASELINE.md: ≤1e-3 mean abs pixel error).
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from PIL import Image

from aip_tpu.models import vgg as vgg_mod
from aip_tpu.models import decoder as dec_mod

REF = Path("/root/reference/Style_3DGS/AdaIN")

pytestmark = pytest.mark.skipif(not REF.is_dir(), reason="reference not present")


# ---------------------------------------------------------------------------
# Reference loading
# ---------------------------------------------------------------------------

def _install_torchvision_stub():
    """Minimal torchvision surface for reference test.py.

    transforms.Resize/CenterCrop on PIL inputs ARE PIL calls inside
    torchvision (pinned 0.13.1 in the reference's environment.yml); ToTensor
    and save_image are the documented conversions.
    """
    if "torchvision" in sys.modules:
        return

    class _Resize:
        def __init__(self, size):
            self.size = size

        def __call__(self, img):
            w, h = img.size
            s = self.size
            # torchvision _compute_resized_output_size: long edge TRUNCATED.
            if h <= w:
                oh, ow = s, max(1, int(s * w / h))
            else:
                oh, ow = max(1, int(s * h / w)), s
            return img.resize((ow, oh), Image.BILINEAR)

    class _CenterCrop:
        def __init__(self, size):
            self.size = size

        def __call__(self, img):
            w, h = img.size
            s = self.size
            left, top = max(0, (w - s) // 2), max(0, (h - s) // 2)
            return img.crop((left, top, left + s, top + s))

    class _ToTensor:
        def __call__(self, img):
            a = np.asarray(img, dtype=np.float32) / 255.0
            if a.ndim == 2:
                a = a[:, :, None]
            return torch.from_numpy(np.ascontiguousarray(a.transpose(2, 0, 1)))

    class _Compose:
        def __init__(self, fns):
            self.fns = fns

        def __call__(self, x):
            for f in self.fns:
                x = f(x)
            return x

    def _save_image(tensor, path):
        a = tensor.detach().cpu().numpy()
        if a.ndim == 4:
            a = a[0]
        a = np.clip(np.floor(a * 255.0 + 0.5), 0, 255).astype(np.uint8)
        Image.fromarray(a.transpose(1, 2, 0)).save(str(path))

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    tr.Resize, tr.CenterCrop, tr.ToTensor, tr.Compose = (
        _Resize, _CenterCrop, _ToTensor, _Compose)
    ut = types.ModuleType("torchvision.utils")
    ut.save_image = _save_image
    tv.transforms, tv.utils = tr, ut
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.utils"] = ut


@pytest.fixture(scope="module")
def ref():
    """The reference AdaIN modules, loaded under a synthetic package."""
    _install_torchvision_stub()
    if "refadain" not in sys.modules:
        pkg = types.ModuleType("refadain")
        pkg.__path__ = [str(REF)]
        sys.modules["refadain"] = pkg
        for name in ("function", "net", "test"):
            spec = importlib.util.spec_from_file_location(
                f"refadain.{name}", REF / f"{name}.py")
            mod = importlib.util.module_from_spec(spec)
            sys.modules[f"refadain.{name}"] = mod
            spec.loader.exec_module(mod)
    return types.SimpleNamespace(
        function=sys.modules["refadain.function"],
        net=sys.modules["refadain.net"],
        test=sys.modules["refadain.test"],
    )


# ---------------------------------------------------------------------------
# Weight bridging: our pytree params -> reference torch state_dicts
# ---------------------------------------------------------------------------

def _to_torch_state_dict(params, torch_indices):
    sd = {}
    for p, idx in zip(params, torch_indices):
        w = np.asarray(p["w"], np.float32).transpose(3, 2, 0, 1)  # HWIO->OIHW
        sd[f"{idx}.weight"] = torch.from_numpy(np.ascontiguousarray(w))
        sd[f"{idx}.bias"] = torch.from_numpy(np.asarray(p["b"], np.float32))
    return sd


@pytest.fixture(scope="module")
def nets(ref):
    """(our_vgg_params, our_dec_params, ref_vgg31, ref_decoder) sharing
    the same deterministic random weights."""
    vgg_params = vgg_mod.init_vgg_params(jax.random.PRNGKey(0))
    dec_params = dec_mod.init_decoder_params(jax.random.PRNGKey(1))

    vgg_sd = _to_torch_state_dict(
        vgg_params, [s[4] for s in vgg_mod.conv_specs()])
    dec_sd = _to_torch_state_dict(
        dec_params, [s[3] for s in dec_mod.conv_specs()])

    ref.net.vgg.load_state_dict(vgg_sd)
    ref.net.decoder.load_state_dict(dec_sd)
    ref.net.vgg.eval()
    ref.net.decoder.eval()
    vgg31 = torch.nn.Sequential(*list(ref.net.vgg.children())[:31])
    return vgg_params, dec_params, vgg31, ref.net.decoder


def _t(img_np):
    """float HWC [0,1] -> torch NCHW."""
    return torch.from_numpy(img_np.transpose(2, 0, 1)).float()[None]


def _mean_abs(a, b):
    return float(np.mean(np.abs(np.asarray(a) - np.asarray(b))))


@pytest.fixture(scope="module")
def imgs():
    r = np.random.default_rng(42)

    def smooth(h, w, k=9):
        x = r.random((h + k, w + k, 3)).astype(np.float32)
        c = np.cumsum(np.cumsum(x, 0), 1)
        y = (c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k]) / (k * k)
        return np.clip(y, 0, 1)

    return smooth(96, 128), smooth(80, 72)


# ---------------------------------------------------------------------------
# Core-op parity straight against function.py
# ---------------------------------------------------------------------------

def test_adain_matches_reference_function(ref, rng):
    from aip_tpu.ops.adain import adain, calc_mean_std

    c = rng.standard_normal((2, 12, 10, 32)).astype(np.float32)
    s = rng.standard_normal((2, 7, 9, 32)).astype(np.float32)
    ours = np.asarray(adain(jnp.asarray(c), jnp.asarray(s)))
    theirs = ref.function.adaptive_instance_normalization(
        torch.from_numpy(c.transpose(0, 3, 1, 2)),
        torch.from_numpy(s.transpose(0, 3, 1, 2)),
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)

    m, sd = calc_mean_std(jnp.asarray(c))
    tm, tsd = ref.function.calc_mean_std(torch.from_numpy(c.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(m)[:, 0, 0, :], tm.numpy()[:, :, 0, 0],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sd)[:, 0, 0, :], tsd.numpy()[:, :, 0, 0],
                               rtol=1e-5, atol=1e-6)


def test_coral_matches_reference_function(ref, rng):
    from aip_tpu.ops.adain import coral

    src = rng.random((40, 30, 3)).astype(np.float32)
    tgt = rng.random((33, 37, 3)).astype(np.float32)
    ours = np.asarray(coral(jnp.asarray(src), jnp.asarray(tgt)))
    theirs = ref.function.coral(
        torch.from_numpy(src.transpose(2, 0, 1)),
        torch.from_numpy(tgt.transpose(2, 0, 1)),
    ).numpy().transpose(1, 2, 0)
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=2e-4)


def test_strength_map_matches_reference(ref, rng):
    from aip_tpu.ops.depth import compute_stylization_strength_map

    d = (rng.random((41, 57)) * 5.0).astype(np.float32)
    ours = np.asarray(compute_stylization_strength_map(
        jnp.asarray(d), (12, 16), offset=0.3, prominence=15.0))
    theirs = ref.test.compute_stylization_strength_map(
        torch.from_numpy(d), (12, 16), offset=0.3, prominence=15.0,
    ).numpy()[0, 0]
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)

    # Constant map -> zeros (test.py:139-143).
    flat = np.full((20, 20), 2.5, np.float32)
    ours0 = np.asarray(compute_stylization_strength_map(jnp.asarray(flat), (8, 8)))
    assert np.all(ours0 == 0)


# ---------------------------------------------------------------------------
# Network-level parity: encoder / decoder / full stylization graph
# ---------------------------------------------------------------------------

def test_encoder_matches_reference_net(nets, imgs):
    from aip_tpu.models.vgg import vgg_encode

    vgg_params, _, vgg31, _ = nets
    content, _ = imgs
    ours = np.asarray(vgg_encode(vgg_params, jnp.asarray(content)[None],
                                 "relu4_1", jnp.float32))
    with torch.no_grad():
        theirs = vgg31(_t(content)).numpy().transpose(0, 2, 3, 1)
    assert ours.shape == theirs.shape
    denom = np.abs(theirs).mean() + 1e-8
    assert _mean_abs(ours, theirs) / denom < 1e-5


def test_decoder_matches_reference_net(nets, rng):
    from aip_tpu.models.decoder import decoder_apply

    _, dec_params, _, dec = nets
    feat = rng.standard_normal((1, 12, 16, 512)).astype(np.float32) * 0.5
    ours = np.asarray(decoder_apply(dec_params, jnp.asarray(feat), jnp.float32))
    with torch.no_grad():
        theirs = dec(torch.from_numpy(feat.transpose(0, 3, 1, 2))).numpy()
    theirs = theirs.transpose(0, 2, 3, 1)
    assert ours.shape == theirs.shape
    denom = np.abs(theirs).mean() + 1e-8
    assert _mean_abs(ours, theirs) / denom < 1e-5


def test_stylize_simple_matches_reference(nets, ref, imgs):
    """Our jitted graph vs the reference's style_transfer_simple
    (test.py:74-81), same weights, fp32."""
    from aip_tpu.pipelines.adain_infer import stylize_simple

    vgg_params, dec_params, vgg31, dec = nets
    content, style = imgs
    ours = np.asarray(stylize_simple(
        vgg_params, dec_params, jnp.asarray(content)[None],
        jnp.asarray(style)[None], alpha=0.5, compute_dtype=jnp.float32))[0]
    with torch.no_grad():
        theirs = ref.test.style_transfer_simple(
            vgg31, dec, _t(content), _t(style), alpha=0.5,
        ).numpy()[0].transpose(1, 2, 0)
    assert ours.shape == theirs.shape
    # Raw decoder outputs are unbounded under random weights; compare on the
    # clamped [0,1] image exactly as saved outputs would be.
    a = np.clip(ours, 0, 1)
    b = np.clip(theirs, 0, 1)
    assert _mean_abs(a, b) < 1e-3, _mean_abs(a, b)


def test_stylize_depth_matches_reference(nets, ref, imgs, rng):
    """Depth-blended path vs reference style_transfer (test.py:52-71)."""
    from aip_tpu.pipelines.adain_infer import stylize_depth

    vgg_params, dec_params, vgg31, dec = nets
    content, style = imgs
    depth = (rng.random(content.shape[:2]) * 3.0).astype(np.float32)
    ours = np.asarray(stylize_depth(
        vgg_params, dec_params, jnp.asarray(content)[None],
        jnp.asarray(style)[None], jnp.asarray(depth),
        offset=0.15, prominence=20.0, compute_dtype=jnp.float32))[0]
    with torch.no_grad():
        theirs = ref.test.style_transfer(
            vgg31, dec, _t(content), _t(style), torch.from_numpy(depth),
            alpha=1.0, offset=0.15, prominence=20,
        ).numpy()[0].transpose(1, 2, 0)
    assert ours.shape == theirs.shape
    a, b = np.clip(ours, 0, 1), np.clip(theirs, 0, 1)
    assert _mean_abs(a, b) < 1e-3, _mean_abs(a, b)


# ---------------------------------------------------------------------------
# Full adain_inference CLI-surface parity (resize + coral + mask + save)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_adain_inference_512_matches_reference(nets, ref, tmp_path, monkeypatch):
    """The reference's own adain_inference end to end at the 512 working size
    (weights from .pth files we write), vs ours — PNG outputs within
    BASELINE's 1e-3 mean abs (uint8 scale: 0.255)."""
    from aip_tpu.pipelines import adain_infer as ours_mod
    from aip_tpu.models import weights as weights_mod

    from aip_tpu.ops.adain import adain
    from aip_tpu.models.decoder import decoder_apply
    from aip_tpu.models.vgg import vgg_encode

    vgg_params, dec_params, vgg31, dec = nets

    r = np.random.default_rng(3)

    def smooth_u8(h, w, k=11):
        x = r.random((h + k, w + k, 3))
        c = np.cumsum(np.cumsum(x, 0), 1)
        y = (c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k]) / (k * k)
        return (np.clip(y, 0, 1) * 255).astype(np.uint8)

    content_p = tmp_path / "content.png"
    style_p = tmp_path / "style.png"
    Image.fromarray(smooth_u8(300, 400)).save(content_p)
    Image.fromarray(smooth_u8(256, 230)).save(style_p)
    mask = (r.random((1, 300, 400)) > 0.5).astype(np.float32)

    # Calibrate the random decoder's final conv so outputs land in [0, 1]
    # with useful spread: raw He-init decoders blow up to |x| >> 1, which
    # saturates the clamp everywhere and lets fp-association noise dominate
    # the few mid-range pixels. Rescale = same weights on both sides, so
    # parity semantics are unchanged.
    ca = np.asarray(Image.open(content_p), np.float32)[None] / 255.0
    sa = np.asarray(Image.open(style_p), np.float32)[None] / 255.0
    cf = vgg_encode(vgg_params, jnp.asarray(ca), "relu4_1", jnp.float32)
    sf = vgg_encode(vgg_params, jnp.asarray(sa), "relu4_1", jnp.float32)
    feat = adain(cf, sf) * 0.5 + cf * 0.5
    probe = np.asarray(decoder_apply(dec_params, feat, jnp.float32))
    mu, sd = float(probe.mean()), float(probe.std())
    g = 0.25 / max(sd, 1e-6)
    last = dec_params[-1]
    dec_params = dec_params[:-1] + [{
        "w": last["w"] * g, "b": (last["b"] - mu) * g + 0.5}]

    # Serialize the shared weights as .pth for the reference's loader.
    vgg_sd = _to_torch_state_dict(vgg_params, [s[4] for s in vgg_mod.conv_specs()])
    dec_sd = _to_torch_state_dict(dec_params, [s[3] for s in dec_mod.conv_specs()])
    vgg_pth, dec_pth = tmp_path / "vgg.pth", tmp_path / "dec.pth"
    torch.save(vgg_sd, vgg_pth)
    torch.save(dec_sd, dec_pth)

    ref_out = ref.test.adain_inference(
        str(content_p), str(style_p), vgg_str=str(vgg_pth),
        decoder_str=str(dec_pth), content_size=512, style_size=512,
        alpha=0.5, preserve_color=True, content_mask=mask,
        save_ext=".png", output=str(tmp_path / "ref"), file_name="out")

    monkeypatch.setattr(weights_mod, "DEFAULT_WEIGHTS_DIR", tmp_path / "w")
    our_out = ours_mod.adain_inference(
        str(content_p), str(style_p), vgg_str=str(vgg_pth),
        decoder_str=str(dec_pth), content_size=512, style_size=512,
        alpha=0.5, preserve_color=True, content_mask=mask,
        save_ext=".png", output=str(tmp_path / "ours"), file_name="out")

    a = np.asarray(Image.open(ref_out), np.float32)
    b = np.asarray(Image.open(our_out), np.float32)
    assert a.shape == b.shape, (a.shape, b.shape)
    mae = np.mean(np.abs(a - b)) / 255.0
    assert mae < 1e-3, mae
    assert np.max(np.abs(a - b)) <= 8.0  # no localized divergence


def test_test_transform_matches_reference(ref, tmp_path):
    """Our _test_transform (PIL path) is bit-exact with the reference's
    test_transform on a PIL input, including the truncated long-edge rule."""
    from aip_tpu.pipelines.adain_infer import _test_transform

    r = np.random.default_rng(5)
    img = Image.fromarray((r.random((300, 400, 3)) * 255).astype(np.uint8))
    theirs = ref.test.test_transform(512, False)(img).numpy().transpose(1, 2, 0)
    ours = np.asarray(_test_transform(img, 512, False))
    assert ours.shape == theirs.shape, (ours.shape, theirs.shape)
    np.testing.assert_array_equal(ours, theirs)

    theirs_c = ref.test.test_transform(256, True)(img).numpy().transpose(1, 2, 0)
    ours_c = np.asarray(_test_transform(img, 256, True))
    assert ours_c.shape == theirs_c.shape
    np.testing.assert_array_equal(ours_c, theirs_c)


def test_get_style_embeddings_matches_reference(nets, ref, tmp_path, imgs,
                                                monkeypatch):
    from aip_tpu.pipelines import adain_infer as ours_mod
    from aip_tpu.models import weights as weights_mod

    vgg_params, _, vgg31, _ = nets
    _, style = imgs
    style_u8 = (style * 255).astype(np.uint8)
    p = tmp_path / "style.png"
    Image.fromarray(style_u8).save(p)

    vgg_sd = _to_torch_state_dict(vgg_params, [s[4] for s in vgg_mod.conv_specs()])
    vgg_pth = tmp_path / "vgg.pth"
    torch.save(vgg_sd, vgg_pth)
    with torch.no_grad():
        theirs = ref.test.get_style_embeddings(
            Image.open(p), vgg_str=str(vgg_pth), style_size=128,
        ).numpy().transpose(0, 2, 3, 1)

    monkeypatch.setattr(weights_mod, "DEFAULT_WEIGHTS_DIR", tmp_path / "w")
    ours = np.asarray(ours_mod.get_style_embeddings(
        str(p), style_size=128, vgg_params=vgg_params))
    assert ours.shape == theirs.shape
    denom = np.abs(theirs).mean() + 1e-8
    assert _mean_abs(ours, theirs) / denom < 2e-3
