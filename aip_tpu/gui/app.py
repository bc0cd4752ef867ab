"""Main menu application (reference `main_gui.py` parity: 8-button menu,
resizable 800x600 window)."""

from __future__ import annotations

import os

import pygame

from aip_tpu.gui.widgets import Button, draw_text, WHITE, DARK


class App:
    def __init__(self, width: int = 800, height: int = 600, headless: bool = False):
        if headless:
            os.environ.setdefault("SDL_VIDEODRIVER", "dummy")
        pygame.init()
        pygame.font.init()
        self.screen = pygame.display.set_mode((width, height), pygame.RESIZABLE)
        pygame.display.set_caption("Style Transfer (TPU)")
        self.font = pygame.font.Font(None, 50)
        self.page = None
        self.running = True

        from aip_tpu.gui.pages import PAGES

        self.buttons = []
        for i, (label, page_cls) in enumerate(PAGES):
            col, row = divmod(i, 4)
            self.buttons.append(Button(
                (160 + col * 260, 200 + row * 70, 240, 50), label,
                action=self._make_opener(page_cls),
            ))

    def _make_opener(self, page_cls):
        def open_page():
            self.page = page_cls(self.screen, self._back_to_menu)

        return open_page

    def _back_to_menu(self):
        self.page = None

    def draw_menu(self):
        self.screen.fill(DARK)
        draw_text("Style Transfer", self.font, WHITE, self.screen,
                  self.screen.get_width() // 2, 100)
        for b in self.buttons:
            b.draw(self.screen)

    def step(self, events) -> None:
        """One frame: dispatch events, draw. Separated for headless tests."""
        for event in events:
            if event.type == pygame.QUIT:
                self.running = False
            elif self.page is not None:
                self.page.handle(event)
            else:
                for b in self.buttons:
                    b.handle(event)
        if self.page is not None:
            self.page.tick()
            self.page.draw()
        else:
            self.draw_menu()
        pygame.display.flip()

    def run(self):
        clock = pygame.time.Clock()
        while self.running:
            self.step(pygame.event.get())
            clock.tick(30)
        pygame.quit()


def run_app(headless: bool = False):
    App(headless=headless).run()


if __name__ == "__main__":
    run_app()
