"""HEVC level/tier/profile autoselection.

Behavior parity with the reference's planner (reference core/transcoder.py:
157-209): the 13-entry level-limit table and the Apple-compat selection rules
are part of the public behavior this framework preserves; the conformance
validator (hevc_tpu.validate) checks emitted streams against the same table.
"""
from __future__ import annotations

from dataclasses import dataclass

from hevc_tpu.io.videoinfo import VideoInfo

# level -> (max luma samples/frame, max luma samples/sec,
#           conservative max bitrate bps, conservative max CPB bits,
#           main-tier kbps, high-tier kbps)
# Exact values from the reference planner (reference core/transcoder.py:
# 158-172 == apple_hevc_batch.py:288-302): the bitrate/CPB columns are the
# reference's deliberately conservative VBV envelope, NOT the spec maxima —
# preserved verbatim per SURVEY §7's behavior checklist (C4).
HEVC_LEVEL_LIMITS: dict[float, tuple] = {
    1.0: (36864, 552960, 64_000, 4608 * 8, 128, 128),
    2.0: (122880, 3_686_400, 150_000, 18432 * 8, 1500, 3000),
    2.1: (245760, 7_372_800, 300_000, 36864 * 8, 3000, 6000),
    3.0: (552960, 16_588_800, 600_000, 61440 * 8, 6000, 12000),
    3.1: (983040, 33_177_600, 1_200_000, 122880 * 8, 10000, 20000),
    4.0: (2_228_224, 66_846_720, 3_000_000, 245760 * 8, 12000, 30000),
    4.1: (2_228_224, 133_693_440, 6_000_000, 491520 * 8, 20000, 50000),
    5.0: (8_912_896, 267_386_880, 12_000_000, 983040 * 8, 25000, 100000),
    5.1: (8_912_896, 534_773_760, 24_000_000, 1966080 * 8, 40000, 160000),
    5.2: (8_912_896, 1_069_547_520, 48_000_000, 3932160 * 8, 60000, 240000),
    6.0: (35_651_584, 1_069_547_520, 48_000_000, 3932160 * 8, 60000, 240000),
    6.1: (35_651_584, 2_139_095_040, 96_000_000, 7864320 * 8, 120000, 480000),
    6.2: (35_651_584, 4_278_190_080, 192_000_000, 15728640 * 8, 240000,
          800000),
}


@dataclass
class LevelChoice:
    level: float
    tier_high: bool
    profile: str            # "main" | "main10"
    pix_fmt: str            # "yuv420p" | "p010le"

    @property
    def level_idc(self) -> int:
        return int(round(self.level * 30))


def calculate_apple_hevc_level(width: int, height: int, fps: float,
                               is_hdr: bool) -> tuple[float, bool]:
    """First level whose sample limits fit; the reference's exact tier gate
    (reference core/transcoder.py:174-187): tier wants high iff HDR or
    max(w, h) >= 3840 or fps > 60, and is granted only when samples/sec
    <= the high-tier kbps number (the reference compares those raw values;
    preserved verbatim for parity)."""
    samples = width * height
    sps = round(samples * fps)
    max_dim = max(width, height)
    for level, (max_s, max_sps, _, _, main_kbps, high_kbps) in \
            sorted(HEVC_LEVEL_LIMITS.items()):
        if samples <= max_s and sps <= max_sps:
            wants_high = is_hdr or max_dim >= 3840 or fps > 60
            tier_high = wants_high and sps <= high_kbps
            return level, tier_high
    return 6.2, False


def calculate_fast_hevc_level(width: int, height: int,
                              is_hdr: bool) -> LevelChoice:
    """Resolution-bucketed quick path (reference calculate_nvenc_hevc_level,
    core/transcoder.py:189-209 == apple_hevc_batch.py:320-333): level by
    max dimension, tier high iff HDR, profile main10 + 10-bit iff HDR."""
    max_dim = max(width, height)
    if max_dim <= 1920:
        level = 4.0
    elif max_dim <= 2560:
        level = 4.1
    elif max_dim <= 3840:
        level = 5.1
    else:
        level = 5.2
    profile = "main10" if is_hdr else "main"
    pix_fmt = "p010le" if is_hdr else "yuv420p"
    return LevelChoice(level, is_hdr, profile, pix_fmt)


def select_level(info: VideoInfo, fast: bool = False) -> LevelChoice:
    if fast:
        return calculate_fast_hevc_level(info.width, info.height, info.is_hdr)
    level, tier = calculate_apple_hevc_level(info.width, info.height,
                                             info.fps, info.is_hdr)
    # main10 for HDR (the reference's rule) and for any 10-bit source
    deep = info.is_hdr or getattr(info, "bit_depth", 8) > 8
    profile = "main10" if deep else "main"
    pix_fmt = "p010le" if deep else "yuv420p"
    return LevelChoice(level, tier, profile, pix_fmt)


def max_bitrate_bps(level: float, tier_high: bool) -> int:
    lim = HEVC_LEVEL_LIMITS[level]
    return (lim[5] if tier_high else lim[4]) * 1000


def max_cpb_bits(level: float) -> int:
    return HEVC_LEVEL_LIMITS[level][3]
