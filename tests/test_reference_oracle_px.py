"""Function-level parity against the REFERENCE'S OWN pixel-art and
localized-style-transfer code (VERDICT r4 item #5).

`/root/reference/pixel_art/utils.py` (networkx/PIL similarity graphs,
Voronoi templates, Chaikin smoothing) and the color math of
`/root/reference/Style_3DGS/localized_style_transfer.py:12-168`
(Reinhard lab, PCA(1), CDF matching) are importable as-is modulo stubs
for their unused heavy deps (svgwrite/cairosvg; torchvision models).
These tests run them directly as oracles for our vectorized numpy /
jax implementations — any drift in thresholds, templates, smoothing
factors or color matrices fails loudly.

The ONE deliberate divergence is documented and pinned:
remove_valency_2_voronoi_points mutates each list while iterating
(`utils.py:242-252`), silently skipping the vertex after every removal;
ours removes every interior valency-2 vertex. The prune test asserts
our removals are a superset of the reference's and that every extra
vertex the reference kept is exactly such a skipped valency-2 vertex.
"""

import importlib.util
import sys
import types
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from PIL import Image

REF_PX = Path("/root/reference/pixel_art/utils.py")
REF_LOC = Path("/root/reference/Style_3DGS/localized_style_transfer.py")

pytestmark = pytest.mark.skipif(
    not (REF_PX.is_file() and REF_LOC.is_file()),
    reason="reference not present")


def _stub_module(name, **attrs):
    """Create (or EXTEND) a stub module: another test file may already
    have installed a partial stub under the same name — e.g.
    test_reference_oracle.py's torchvision stub has transforms/utils but
    not `models` — so missing attributes are added rather than the whole
    module skipped (order-dependence otherwise)."""
    m = sys.modules.get(name)
    if m is None:
        m = types.ModuleType(name)
        sys.modules[name] = m
    for k, v in attrs.items():
        if not hasattr(m, k):
            setattr(m, k, v)


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, str(path))
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref_px():
    """The reference pixel_art.utils, with stubs for the SVG writers its
    graph/smoothing functions never touch."""
    _stub_module("svgwrite", Drawing=None)
    _stub_module("cairosvg", svg2png=None)
    return _load("ref_px_utils", REF_PX)


@pytest.fixture(scope="module")
def ref_loc():
    """The reference localized_style_transfer color math. torchvision and
    the AdaIN pipeline import are stubbed (only rgb/lab/PCA/CDF are
    exercised here)."""
    _stub_module("torchvision", models=types.SimpleNamespace())
    _stub_module("torchvision.transforms", functional=types.SimpleNamespace())
    if "torchvision" in sys.modules and not hasattr(
            sys.modules["torchvision"], "transforms"):
        sys.modules["torchvision"].transforms = sys.modules[
            "torchvision.transforms"]
    _stub_module("Style_3DGS")
    _stub_module("Style_3DGS.AdaIN", adain_inference=lambda *a, **k: None)
    sys.modules["Style_3DGS"].AdaIN = sys.modules["Style_3DGS.AdaIN"]
    return _load("ref_localized", REF_LOC)


# ---------------------------------------------------------------------------
# Pixel-art graph pipeline
# ---------------------------------------------------------------------------

def _test_sprite():
    """Small sprite with regions, thin curves and isolated pixels —
    exercises all three diagonal heuristics. Deterministic."""
    rng = np.random.default_rng(7)
    palette = np.array([[252, 40, 40], [40, 200, 60], [30, 60, 240],
                        [250, 250, 250], [10, 10, 10]], np.uint8)
    idx = np.zeros((12, 14), np.int64)
    idx[3:9, 2:7] = 1
    idx[:, 8:] = 2
    for t in range(14):          # diagonal curve
        idx[min(11, t // 2 + 2), t % 14] = 3
    sp = rng.integers(0, 5, size=8)
    idx[rng.integers(0, 12, 8), rng.integers(0, 14, 8)] = sp
    return Image.fromarray(palette[idx], "RGB")


def _dolphin():
    p = Path("/root/reference/input/pixel_art/smw_dolphin_input.png")
    if not p.is_file():
        pytest.skip("dolphin input missing")
    return Image.open(p).convert("RGB")


def _ref_graph(ref_px, img):
    yuv = img.convert("YCbCr")
    g = ref_px.create_similarity_graph(img, yuv)
    ref_px.process_diagonal_edges(g, yuv.width, yuv.height)
    return g, yuv


def _our_graph(img):
    from aip_tpu.pipelines.pixel_art import (_Graph, resolve_diagonals,
                                             similarity_edges)

    rgb = np.asarray(img)
    yuv = np.asarray(img.convert("YCbCr"))
    h, w, _ = rgb.shape
    graph = _Graph(similarity_edges(yuv), h, w)
    resolve_diagonals(graph, w, h)
    return graph, yuv, w, h


def _edge_set(adj):
    return {(min(a, b), max(a, b)) for a in adj for b in adj[a]}


@pytest.mark.parametrize("image", ["sprite", "dolphin"])
def test_similarity_graph_matches_reference(ref_px, image):
    """Edge set after the full heuristic pass (create_similarity_graph +
    process_diagonal_edges, utils.py:115-174) matches exactly."""
    img = _test_sprite() if image == "sprite" else _dolphin()
    g, _ = _ref_graph(ref_px, img)
    ours, _, _, _ = _our_graph(img)
    ref_edges = {(min(a, b), max(a, b)) for a, b in g.edges}
    assert _edge_set(ours.adj) == ref_edges


def test_voronoi_templates_match_reference(ref_px):
    """Per-cell half-integer Voronoi vertex lists (utils.py:176-228),
    ordered, match exactly."""
    img = _test_sprite()
    g, yuv = _ref_graph(ref_px, img)
    ref_px.create_voronoi_cells(g, yuv)

    from aip_tpu.pipelines.pixel_art import voronoi_cells

    ours, _, w, h = _our_graph(img)
    cells = voronoi_cells(ours, w, h)
    for (x, y), verts in cells.items():
        assert verts == g.nodes[(x, y)][ref_px.VORONOI_VERTICES], (x, y)


def test_valencies_match_reference(ref_px):
    img = _test_sprite()
    g, yuv = _ref_graph(ref_px, img)
    ref_px.create_voronoi_cells(g, yuv)
    ref_val = ref_px.calculate_valencies(g, yuv)

    from collections import defaultdict

    from aip_tpu.pipelines.pixel_art import voronoi_cells

    ours, _, w, h = _our_graph(img)
    cells = voronoi_cells(ours, w, h)
    val = defaultdict(int)
    for verts in cells.values():
        for v in verts:
            val[v] += 1
    assert dict(val) == dict(ref_val)


@pytest.mark.parametrize("image", ["sprite", "dolphin"])
def test_prune_matches_reference(ref_px, image):
    """remove_valency_2_voronoi_points parity. The reference mutates each
    list while iterating (utils.py:242-252) and so skips the vertex after
    every removal — but the Voronoi templates interleave midpoints and
    corners such that two removable vertices are never adjacent on real
    inputs (verified on both images here), so the outputs must be
    IDENTICAL. The crafted-case test below pins the divergence class
    the mutation would cause."""
    img = _test_sprite() if image == "sprite" else _dolphin()
    g, yuv = _ref_graph(ref_px, img)
    ref_px.create_voronoi_cells(g, yuv)
    ref_val = ref_px.calculate_valencies(g, yuv)
    ref_px.remove_valency_2_voronoi_points(g, ref_val, yuv)

    from aip_tpu.pipelines.pixel_art import prune_valency2, voronoi_cells

    ours, _, w, h = _our_graph(img)
    cells = prune_valency2(voronoi_cells(ours, w, h), w, h)
    for (x, y), kept in cells.items():
        assert kept == g.nodes[(x, y)][ref_px.VORONOI_VERTICES], (x, y)


def test_prune_mutation_bug_class_pinned(ref_px):
    """Direct demonstration of the reference's iterate-while-mutate skip
    (utils.py:242-252) on a crafted cell whose list has two ADJACENT
    interior valency-2 vertices: the reference removes only the first of
    the pair; ours removes both. This is the one deliberate divergence —
    if the reference's behavior here ever changes, this fails loudly."""
    import networkx as nx

    # a and b are each shared by both cells (valency 2, interior); c/d are
    # private (valency 1, kept by the valency==2 rule on both sides).
    a, b, c, d = (0.25, 0.25), (0.3, 0.3), (0.5, 0.5), (0.5, 1.5)
    g = nx.Graph()
    g.add_node((0, 0))
    g.add_node((0, 1))
    g.nodes[(0, 0)][ref_px.VORONOI_VERTICES] = [a, b, c]
    g.nodes[(0, 1)][ref_px.VORONOI_VERTICES] = [a, b, d]
    val = {a: 2, b: 2, c: 1, d: 1}
    img = Image.new("YCbCr", (1, 2))
    ref_px.remove_valency_2_voronoi_points(g, val, img)
    # the reference removes a, then the mutated iterator skips b
    assert g.nodes[(0, 0)][ref_px.VORONOI_VERTICES] == [b, c]
    assert g.nodes[(0, 1)][ref_px.VORONOI_VERTICES] == [b, d]

    from aip_tpu.pipelines.pixel_art import prune_valency2

    ours = prune_valency2({(0, 0): [a, b, c], (0, 1): [a, b, d]}, 1, 2)
    assert ours[(0, 0)] == [c] and ours[(0, 1)] == [d]  # both removed


def test_chaikin_smoothing_matches_reference(ref_px):
    """Junction marking + Chaikin smoothing (utils.py:254-329) oracled
    function-level: both sides start from OUR pruned cells (prune
    diverges by design, see above), 4 iterations at the reference's
    thresholds, and every smoothed vertex list must match exactly."""
    img = _test_sprite()
    g, yuv = _ref_graph(ref_px, img)

    from aip_tpu.pipelines.pixel_art import (prune_valency2, smooth_cells,
                                             voronoi_cells)

    ours, yuv_arr, w, h = _our_graph(img)
    cells = prune_valency2(voronoi_cells(ours, w, h), w, h)
    for (x, y), verts in cells.items():
        g.nodes[(x, y)][ref_px.VORONOI_VERTICES] = list(verts)
    ref_px.smooth_voronoi_graph(
        g, num_iterations=4, num_different_colors_threshold=3,
        diagonal_length_threshold=0.8, width=w, height=h)

    smoothed = smooth_cells(cells, yuv_arr, num_iterations=4,
                            color_pairs_threshold=3, diagonal_threshold=0.8)
    for (x, y), verts in smoothed.items():
        ref_verts = g.nodes[(x, y)][ref_px.VORONOI_VERTICES]
        assert len(verts) == len(ref_verts), (x, y)
        np.testing.assert_allclose(np.asarray(verts, np.float64),
                                   np.asarray(ref_verts, np.float64),
                                   rtol=0, atol=1e-12, err_msg=str((x, y)))


# ---------------------------------------------------------------------------
# Localized style transfer color math
# ---------------------------------------------------------------------------

def test_reinhard_lab_matches_reference(ref_loc):
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (500, 3)).astype(np.uint8)
    ref_lab = ref_loc.rgb_to_lab_pixels(px)

    from aip_tpu.ops.color import lab_to_rgb, rgb_to_lab

    ours = np.asarray(rgb_to_lab(jnp.asarray(px, jnp.float32) / 255.0))
    np.testing.assert_allclose(ours, ref_lab, atol=2e-5)

    # and the image form
    img = rng.integers(0, 256, (11, 9, 3)).astype(np.uint8)
    np.testing.assert_allclose(
        np.asarray(rgb_to_lab(jnp.asarray(img, jnp.float32) / 255.0)),
        ref_loc.rgb_to_lab_image(img), atol=2e-5)

    # inverse: the reference truncates to uint8; match within 1 step
    back_ref = ref_loc.lab_to_rgb_pixels(ref_lab.astype(np.float64))
    back_ours = np.asarray(lab_to_rgb(jnp.asarray(ref_lab, jnp.float32)))
    assert np.abs((back_ours * 255).astype(np.int32)
                  - back_ref.astype(np.int32)).max() <= 1


def test_pca1_matches_sklearn_reference(ref_loc):
    """apply_pca (sklearn PCA(1), localized_style_transfer.py:92-96) vs
    weighted_pca1 — projection AND sign convention must agree (the CDF
    match downstream is not sign-invariant)."""
    from aip_tpu.ops.color import weighted_pca1

    rng = np.random.default_rng(5)
    for t in range(3):
        lab = (rng.random((300, 3)) * [1.0, 0.4, 0.6] + t).astype(np.float64)
        proj_ref, pca = ref_loc.apply_pca(lab)
        proj, mean, comp = weighted_pca1(jnp.asarray(lab, jnp.float32),
                                         jnp.ones(300))
        np.testing.assert_allclose(np.asarray(comp), pca.components_[0],
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(proj), proj_ref[:, 0],
                                   atol=1e-4)


def test_match_cdf_matches_reference(ref_loc):
    """match_cdf (:99-125) vs masked_cdf_match: identical quantile
    semantics when the grid covers the larger set."""
    from aip_tpu.ops.color import masked_cdf_match

    rng = np.random.default_rng(11)
    t = rng.standard_normal((800, 1)) * 0.3
    s = rng.standard_normal((500, 1)) * 0.7 + 0.2
    ref = ref_loc.match_cdf(t, s)[:, 0]
    ours = np.asarray(masked_cdf_match(
        jnp.asarray(t[:, 0], jnp.float32), jnp.ones(800),
        jnp.asarray(s[:, 0], jnp.float32), jnp.ones(500), k=800))
    np.testing.assert_allclose(ours, ref, atol=1e-4)

    # masked form: same values padded with dead slots must not change it
    tp = np.concatenate([t[:, 0], np.full(100, 99.0)])
    wp = np.concatenate([np.ones(800), np.zeros(100)])
    ours_m = np.asarray(masked_cdf_match(
        jnp.asarray(tp, jnp.float32), jnp.asarray(wp, jnp.float32),
        jnp.asarray(s[:, 0], jnp.float32), jnp.ones(500), k=800))[:800]
    np.testing.assert_allclose(ours_m, ref, atol=1e-4)


def test_color_transfer_foreground_matches_reference(ref_loc):
    """End-to-end color_transfer_foreground (:128-168) vs
    harmonize_foreground on synthetic fg/bg with black (masked-out)
    regions. The reference sorts the exact pixel sets; ours resamples
    quantile functions on a k-grid — tolerance covers that plus uint8
    truncation."""
    from aip_tpu.ops.color import harmonize_foreground

    rng = np.random.default_rng(13)
    h, w = 24, 20
    fg = (rng.random((h, w, 3)) * 200 + 30).astype(np.uint8)
    bg = (rng.random((h, w, 3)) * [80, 255, 120]).astype(np.uint8)
    fg[:6] = 0                       # masked-out black band
    bg[:, :4] = 0
    ref = ref_loc.color_transfer_foreground(fg, bg).astype(np.float32)

    fgm = jnp.asarray((fg.sum(-1) > 0).astype(np.float32))
    bgm = jnp.asarray((bg.sum(-1) > 0).astype(np.float32))
    ours = np.asarray(harmonize_foreground(
        jnp.asarray(fg, jnp.float32) / 255.0,
        jnp.asarray(bg, jnp.float32) / 255.0, fgm, bgm, k=1024)) * 255.0

    err = np.abs(ours - ref)
    assert float(err.mean()) <= 1.5, float(err.mean())
    assert float(err.max()) <= 8.0, float(err.max())
