"""Headless GUI tests (SDL dummy driver): menu navigation, page wiring,
threaded pipeline execution through the AdaIN page."""

import os
import time

import numpy as np
import pytest

os.environ["SDL_VIDEODRIVER"] = "dummy"

pygame = pytest.importorskip("pygame")


@pytest.fixture
def app():
    from aip_tpu.gui.app import App

    a = App(headless=True)
    yield a
    pygame.quit()


def _click(x, y):
    return pygame.event.Event(pygame.MOUSEBUTTONDOWN, {"pos": (x, y), "button": 1})


def test_menu_renders_eight_pages(app):
    app.step([])
    assert len(app.buttons) == 8
    assert app.page is None


def test_open_each_page_and_back(app):
    from aip_tpu.gui.pages import PAGES

    for label, page_cls in PAGES:
        app.page = page_cls(app.screen, app._back_to_menu)
        app.step([])  # renders without error
        app.page._back()
        assert app.page is None


def test_adain_page_full_flow(app, tmp_path, rng, monkeypatch):
    """Drive the AdaIN page end to end: pick files via env override, run,
    wait for the worker thread, confirm a result surface appears."""
    from PIL import Image

    from aip_tpu.models import weights as weights_mod
    from aip_tpu.gui.pages import AdainPage

    monkeypatch.setattr(weights_mod, "DEFAULT_WEIGHTS_DIR", tmp_path / "w")
    c = tmp_path / "c.png"
    s = tmp_path / "s.png"
    Image.fromarray((rng.random((48, 48, 3)) * 255).astype(np.uint8)).save(c)
    Image.fromarray((rng.random((48, 48, 3)) * 255).astype(np.uint8)).save(s)

    monkeypatch.chdir(tmp_path)
    page = AdainPage(app.screen, app._back_to_menu)
    app.page = page

    monkeypatch.setenv("AIP_TPU_GUI_FILE", str(c))
    page._pick_content()
    monkeypatch.setenv("AIP_TPU_GUI_FILE", str(s))
    page._pick_style()
    assert page.content_path == str(c) and page.style_path == str(s)

    page._run()
    assert page.runner.running or page.runner.result is not None
    for _ in range(600):  # wait up to 60s for the jit+run
        if not page.runner.running:
            break
        time.sleep(0.1)
    app.step([])
    assert page.status in ("Done", "")
    assert page.result_surface is not None


def test_run_without_inputs_sets_status(app):
    from aip_tpu.gui.pages import AdainPage

    page = AdainPage(app.screen, app._back_to_menu)
    page._run()
    assert "Pick input" in page.status


def test_double_run_guard(app, monkeypatch):
    from aip_tpu.gui.pages import AdainPage
    from aip_tpu.gui.widgets import PipelineRunner

    r = PipelineRunner()
    started = r.start(lambda: time.sleep(0.3))
    assert started
    assert not r.start(lambda: None)  # guard against double-launch
    r.thread.join()


def test_pixelart_page_palette_chooser(app, tmp_path, rng, monkeypatch):
    """The PixelArtPage surfaces the FULL Lospec palette set (reference
    second_page's 1024-palette chooser) plus brightness/contrast and
    grayscale controls, and runs pixelize with the chosen palette."""
    from PIL import Image

    from aip_tpu.gui.pages import PixelArtPage

    page = PixelArtPage(app.screen, app._back_to_menu)
    app.page = page
    assert len(page.palette_list.options) >= 1024
    assert {"pico-8", "sweetie-16", "slso8"} <= set(page.palette_list.options)
    assert [s.label for s in page.sliders[1:]] == ["brightness", "contrast"]

    # Type-to-filter narrows the visible list; selection survives.
    for ch in "slso":
        page.palette_list.handle(pygame.event.Event(
            pygame.KEYDOWN, {"key": pygame.K_a, "unicode": ch}))
    visible = [page.palette_list.options[i]
               for i in page.palette_list._visible_idx]
    assert "slso8" in visible and len(visible) < 50

    page.palette_list.selected = page.palette_list.options.index("slso8")
    c = tmp_path / "c.png"
    Image.fromarray((rng.random((24, 24, 3)) * 255).astype(np.uint8)).save(c)
    page.content_path = str(c)
    page.sliders[1].value = 0.2   # brightness
    page.sliders[2].value = 0.1   # contrast
    out = page.run_pipeline()
    assert out.dtype == np.uint8
    # Every output pixel is an slso8 palette color.
    from aip_tpu.pipelines.pixel_art import hex_palette_to_rgb

    pal = hex_palette_to_rgb(page._palettes["slso8"])
    flat = out.reshape(-1, 3)
    match = (flat[:, None, :] == pal[None, :, :]).all(-1).any(-1)
    assert match.all()
    app.step([])  # draws the list + swatch without error


def test_video_page_has_flow_and_stylizer_toggles(app):
    from aip_tpu.gui.pages import VideoPage

    page = VideoPage(app.screen, app._back_to_menu)
    assert page.radios[0].options == ["farneback", "tvl1", "lk"]
    assert page.radios[1].options == ["AdaIN", "fast stylizer"]


def test_gif_result_animates_in_pane(app, tmp_path, rng):
    """The 3DGS page's flagship deliverable is an orbit GIF; the reference
    plays it in-page (first_page.py:150-163). A multi-frame GIF result
    must become a frame-cycling AnimatedSurface whose current() frame
    advances with time, and draw() must blit it without error."""
    from PIL import Image

    from aip_tpu.gui.pages import AdainPage
    from aip_tpu.gui.widgets import AnimatedSurface

    frames = [Image.fromarray(np.full((20, 24, 3), c, np.uint8))
              for c in (10, 120, 240)]
    gif = tmp_path / "orbit.gif"
    frames[0].save(gif, save_all=True, append_images=frames[1:],
                   duration=30, loop=0)

    page = AdainPage(app.screen, app._back_to_menu)
    app.page = page
    page.runner.result = str(gif)
    page._poll_result()
    assert isinstance(page.result_surface, AnimatedSurface)
    assert len(page.result_surface.frames) == 3

    seen = set()
    t0 = time.time()
    while len(seen) < 3 and time.time() - t0 < 3.0:
        seen.add(id(page.result_surface.current()))
        app.step([])  # draw loop blits the animated surface
        time.sleep(0.01)
    assert len(seen) == 3, "GIF frames did not cycle"


def test_video_result_plays_in_pane(app, tmp_path, rng):
    """An .mp4/.avi result goes through cv2 into an AnimatedSurface
    (draw_helpers.play_video parity, :263-308)."""
    cv2 = pytest.importorskip("cv2")

    from aip_tpu.gui.pages import VideoPage
    from aip_tpu.gui.widgets import AnimatedSurface

    path = tmp_path / "out.avi"
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"MJPG"), 12,
                         (32, 24))
    for c in (0, 128, 255):
        vw.write(np.full((24, 32, 3), c, np.uint8))
    vw.release()

    page = VideoPage(app.screen, app._back_to_menu)
    app.page = page
    page.runner.result = str(path)
    page._poll_result()
    assert isinstance(page.result_surface, AnimatedSurface)
    assert len(page.result_surface.frames) == 3
    app.step([])


def test_single_frame_gif_degrades_to_surface(app, tmp_path, rng):
    from PIL import Image

    from aip_tpu.gui.widgets import animated_surface_from_file

    gif = tmp_path / "one.gif"
    Image.fromarray((rng.random((16, 16, 3)) * 255).astype(np.uint8)).save(gif)
    surf = animated_surface_from_file(gif)
    assert isinstance(surf, pygame.Surface)
