"""Pygame GUI shell (reference `main_gui.py` + `gui/*.py` L5 layer).

Eight pipeline pages behind a menu, mirroring the reference:
1. 2D AdaIN / depth-aware / 3DGS stylization (first_page)
2. Pixel art: pixelize + depixelize (second_page)
3. Video style transfer (third_page)
4. Regional (semantic) style transfer (fourth_page)
5. Depth-only stylization controls (fifth_page)
6. Two-style Gram mixing (six_page)
7. Multi-backbone style mixer with palettes (seven_page)
8. Spatially-varying style transfer (eight_page)

All pipeline invocations run in worker threads so the UI stays responsive
(the reference's pattern, `gui/first_page.py:139` etc.). Headless-safe:
``SDL_VIDEODRIVER=dummy`` renders offscreen for tests/CI.
"""

from aip_tpu.gui.app import run_app
