"""Rate control: CRF-style quality targeting with VBV-aware QP adaptation.

The reference delegated rate control to x265/NVENC flags (CRF/CQ + VBV).
Here a light controller adapts the per-slice QP between device batches toward
the planner's target bitrate envelope while respecting the VBV ceiling
(HEVC allows per-slice QP, so adaptation costs nothing in the bitstream).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass
class RateController:
    base_qp: int
    target_bps: float            # planner target (bits/second)
    vbv_max_bps: float           # hard ceiling (level-clamped maxrate)
    fps: float
    min_qp: int = 10
    max_qp: int = 49
    strength: float = 3.0        # qp steps per 2x rate error
    bits_seen: int = field(default=0, init=False)
    frames_seen: int = field(default=0, init=False)
    qp: int = field(default=0, init=False)

    def __post_init__(self):
        self.qp = self.base_qp

    @property
    def target_bpf(self) -> float:
        return self.target_bps / max(self.fps, 1.0)

    def update(self, frame_bits: int) -> int:
        """Record one encoded frame; returns the QP for upcoming frames."""
        self.bits_seen += frame_bits
        self.frames_seen += 1
        avg = self.bits_seen / self.frames_seen
        ratio = avg / max(self.target_bpf, 1.0)
        # CRF-like: stay near base_qp unless drifting past target/VBV
        adj = 0.0
        if ratio > 1.0:
            adj = self.strength * math.log2(ratio)
        elif ratio < 0.35:       # far under target: spend a little more
            adj = self.strength * math.log2(ratio / 0.35) * 0.5
        # VBV hard ceiling on the recent frame
        if frame_bits > self.vbv_max_bps / max(self.fps, 1.0) * 1.5:
            adj = max(adj, 2.0)
        self.qp = int(min(max(self.base_qp + round(adj), self.min_qp),
                          self.max_qp))
        return self.qp
