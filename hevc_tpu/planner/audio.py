"""Audio policy (reference get_audio_flags parity, core/transcoder.py:423-450).

AAC-LC at 48 kHz; bitrate = clamp(64k per channel, [128k, 512k]), at least
256k for >2 channels; explicit channel layouts for mono/stereo/5.1/7.1.
"""
from __future__ import annotations

from dataclasses import dataclass

CHANNEL_LAYOUTS = {1: "mono", 2: "stereo", 6: "5.1", 8: "7.1"}


@dataclass
class AudioPlan:
    codec: str = "aac"
    sample_rate: int = 48000
    channels: int = 2
    bitrate: int = 128_000
    layout: str = "stereo"


def plan_audio(channels: int, sample_rate: int = 48000) -> AudioPlan:
    ch = max(1, channels)
    bitrate = min(max(64_000 * ch, 128_000), 512_000)
    if ch > 2:
        bitrate = max(bitrate, 256_000)
    return AudioPlan(sample_rate=48000, channels=ch, bitrate=bitrate,
                     layout=CHANNEL_LAYOUTS.get(ch, f"{ch}ch"))
