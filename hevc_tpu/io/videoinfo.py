"""VideoInfo: the probe result record.

Field set matches the reference's `VideoInfo` dataclass (reference
core/probe.py:9-24) plus the monolith's extra `chromaloc` field (reference
apple_hevc_batch.py:64).  Produced by hevc_tpu.io.probe.probe_media, consumed
by the parameter planner (hevc_tpu.planner) and encoder.
"""
from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class VideoInfo:
    width: int = 1920
    height: int = 1080
    fps: float = 30.0
    duration: float = 0.0
    nb_frames: int = 0
    pix_fmt: str = "yuv420p"
    bit_depth: int = 8
    color_primaries: str = "bt709"
    color_transfer: str = "bt709"
    color_space: str = "bt709"
    color_range: str = "tv"
    chromaloc: int = 0
    is_hdr: bool = False
    # HDR10 static metadata (None when absent; defaults applied by the
    # metadata builder, reference core/utils.py:38-40)
    master_display: str | None = None
    max_cll: str | None = None
    has_audio: bool = False
    audio_codec: str = ""
    audio_channels: int = 0
    audio_sample_rate: int = 48000
    codec_name: str = ""
    container: str = ""
    extra: dict = field(default_factory=dict)

    @property
    def est_frames(self) -> int:
        """Best-effort frame count (reference probe.py:97-105)."""
        if self.nb_frames > 0:
            return self.nb_frames
        if self.duration > 0 and self.fps > 0:
            return int(self.duration * self.fps)
        return 0
