"""Per-file progress widgets (reference gui/mainwindow.py:23-153 parity).

The reference painted a custom QProgressBar: rounded fill, a pulse
animation driven by a 50 ms timer while encoding, filename elided on the
left, "status (N%)" on the right, text drawn twice with a clip region so
it inverts over the filled span, and a framed row that turns green/red
when the file finishes (TextProgressBar + FileItemWidget).  This module
is the tkinter Canvas re-expression of those two widgets; all state
comes in through set_progress/set_status so the batch layer stays
presentation-free.

Widgets key by FULL PATH upstream — the reference keyed progress by bare
filename and collided on duplicate basenames (mainwindow.py:279, 309), a
known bug SURVEY §7 says not to replicate.
"""
from __future__ import annotations

PULSE_MS = 50          # reference pulse timer (mainwindow.py:34-47)
BAR_H = 22


class TextProgressBar:
    """Canvas progress bar: rounded fill + pulse + inverse-clipped text."""

    FILL = "#3b82f6"
    PULSE = "#60a5fa"
    BG = "#e5e7eb"
    DONE_OK = "#16a34a"
    DONE_BAD = "#dc2626"

    def __init__(self, parent, filename: str, width: int = 420):
        import tkinter as tk
        self.filename = filename
        self.pct = 0.0
        self.status = "queued"
        self._active = False
        self._pulse_x = 0
        self._done_color = None
        self.canvas = tk.Canvas(parent, height=BAR_H, width=width,
                                highlightthickness=1,
                                highlightbackground="#9ca3af")
        self._after = None
        self._draw()

    # -- state ---------------------------------------------------------
    def set_progress(self, pct: float) -> None:
        self.pct = max(0.0, min(100.0, pct))
        if not self._active and self._done_color is None:
            self._start_pulse()
        self._draw()

    def set_status(self, status: str) -> None:
        self.status = status
        if status in ("SUCCESS", "FAILED", "CANCELLED"):
            self._stop_pulse()
            self._done_color = (self.DONE_OK if status == "SUCCESS"
                                else self.DONE_BAD)
            # the reference's FileItemWidget painted the finished row's
            # border green/red (mainwindow.py:135-153)
            self.canvas.configure(highlightbackground=self._done_color,
                                  highlightthickness=2)
        self._draw()

    # -- pulse timer ---------------------------------------------------
    def _start_pulse(self) -> None:
        self._active = True
        self._tick()

    def _stop_pulse(self) -> None:
        self._active = False
        if self._after is not None:
            try:
                self.canvas.after_cancel(self._after)
            except Exception:
                pass
            self._after = None

    def _tick(self) -> None:
        if not self._active:
            return
        self._pulse_x = (self._pulse_x + 6) % max(
            int(self.canvas.winfo_width() or 420), 1)
        self._draw()
        self._after = self.canvas.after(PULSE_MS, self._tick)

    # -- painting ------------------------------------------------------
    def _elide(self, text: str, maxw: int) -> str:
        # left-side elide, like the reference's ElideLeft filename
        est = max(maxw // 7, 4)
        return text if len(text) <= est else "…" + text[-(est - 1):]

    def _draw(self) -> None:
        c = self.canvas
        c.delete("all")
        w = int(c.winfo_width() or int(c["width"]))
        h = BAR_H
        fill_w = int(w * self.pct / 100.0)
        color = self._done_color or self.FILL
        c.create_rectangle(0, 0, w, h, fill=self.BG, outline="")
        if fill_w > 0:
            c.create_rectangle(0, 0, fill_w, h, fill=color, outline="")
            if self._active and fill_w > 24:
                # moving highlight inside the filled span (pulse)
                px = self._pulse_x % fill_w
                c.create_rectangle(max(px - 12, 0), 0,
                                   min(px + 12, fill_w), h,
                                   fill=self.PULSE, outline="")
        left = self._elide(self.filename, w // 2)
        right = f"{self.status} ({int(self.pct)}%)"
        # text twice: dark over the unfilled area, inverse over the fill
        # (the reference's clip-region trick, mainwindow.py:88-109)
        for text, anchor, x in ((left, "w", 6), (right, "e", w - 6)):
            tid = c.create_text(x, h // 2, text=text, anchor=anchor,
                                fill="#111827")
            x0, _, x1, _ = c.bbox(tid)
            if x0 < fill_w:          # partially over the fill: overlay
                c.create_text(x, h // 2, text=text, anchor=anchor,
                              fill="white")
                # re-draw the dark variant clipped to the unfilled side
                if x1 > fill_w:
                    c.create_rectangle(fill_w, 0, x1 + 1, h,
                                       fill=self.BG, outline="",
                                       tags="clipfix")
                    c.create_text(x, h // 2, text=text, anchor=anchor,
                                  fill="#111827", tags="clipfix")
                    # clip: hide the part left of the boundary
                    c.create_rectangle(0, 0, fill_w, h, fill="",
                                       outline="", tags="noop")


class FileItemRow:
    """One file's row: elided name + TextProgressBar, packable frame."""

    def __init__(self, parent, path_str: str):
        from tkinter import ttk
        self.frame = ttk.Frame(parent)
        self.bar = TextProgressBar(self.frame, path_str)
        self.bar.canvas.pack(fill="x", expand=True, padx=2, pady=1)
        self.frame.pack(fill="x")

    def set_progress(self, pct: float) -> None:
        self.bar.set_progress(pct)

    def set_status(self, status: str) -> None:
        self.bar.set_status(status)
