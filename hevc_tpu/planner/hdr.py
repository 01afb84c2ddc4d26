"""HDR detection and HDR10 static metadata policy.

Parity with the reference: detection uses the monolith's any-of-5 rule
(reference apple_hevc_batch.py:168-174, the newer generation per SURVEY C2);
metadata defaults mirror core/utils.py:38-40.
"""
from __future__ import annotations

from hevc_tpu.io.videoinfo import VideoInfo

HDR_PIXFMTS = {"yuv420p10le", "p010le", "yuv422p10le", "yuv444p10le",
               "yuv420p12le"}
HDR_COLOR_SPACES = {"bt2020nc", "bt2020c"}
HDR_TRANSFERS = {"smpte2084", "pq", "arib-std-b67"}
HDR_PRIMARIES = {"bt2020"}

DEFAULT_MASTER_DISPLAY = ("G(13250,34500)B(7500,3000)R(34000,16000)"
                          "WP(15635,16450)L(10000000,50)")
DEFAULT_MAX_CLL = "1000,400"


def detect_hdr(info: VideoInfo) -> bool:
    """Monolith rule: any of 5 signals marks HDR."""
    return any((
        info.color_primaries in HDR_PRIMARIES,
        info.color_transfer in HDR_TRANSFERS,
        info.color_space in HDR_COLOR_SPACES,
        info.pix_fmt in HDR_PIXFMTS or info.bit_depth >= 10,
        info.master_display is not None,
    ))


def detect_hdr_core(info: VideoInfo) -> bool:
    """Core (modular) rule kept for reference parity tests: >=2 of 4 signals
    (reference core/probe.py:76-82)."""
    votes = sum((
        info.color_primaries in HDR_PRIMARIES,
        info.color_transfer in {"smpte2084", "pq"},
        info.color_space.startswith("bt2020"),
        info.pix_fmt in HDR_PIXFMTS,
    ))
    return votes >= 2


def build_hdr_metadata(info: VideoInfo) -> dict:
    """HDR10 static metadata with the reference's defaults when absent."""
    if not info.is_hdr:
        return {}
    return {
        "master_display": info.master_display or DEFAULT_MASTER_DISPLAY,
        "max_cll": info.max_cll or DEFAULT_MAX_CLL,
        "color_primaries": "bt2020",
        "color_transfer": info.color_transfer
        if info.color_transfer in HDR_TRANSFERS else "smpte2084",
        "color_space": "bt2020nc",
    }


def parse_master_display(s: str) -> dict | None:
    """Parse 'G(x,y)B(..)R(..)WP(..)L(max,min)' into integer fields."""
    import re
    m = re.match(r"G\((\d+),(\d+)\)B\((\d+),(\d+)\)R\((\d+),(\d+)\)"
                 r"WP\((\d+),(\d+)\)L\((\d+),(\d+)\)", s)
    if not m:
        return None
    v = [int(x) for x in m.groups()]
    return {"g": (v[0], v[1]), "b": (v[2], v[3]), "r": (v[4], v[5]),
            "wp": (v[6], v[7]), "max_lum": v[8], "min_lum": v[9]}
