"""probe_media: stream analysis -> VideoInfo (reference core/probe.py parity).

The reference shelled out to ffprobe; here probing is in-framework:
  * .y4m / .yuv: native parsing (hevc_tpu.io.y4m)
  * .mp4/.mov: native box parsing (hevc_tpu.io.mp4parse)
  * anything else: optional libavformat harness (hevc_tpu.validate.avref)
    when present, else safe 1080p30 SDR defaults — the reference's
    never-raise fallback behavior (core/probe.py:114-116).
"""
from __future__ import annotations

import logging
from fractions import Fraction
from pathlib import Path

from hevc_tpu.io.videoinfo import VideoInfo

log = logging.getLogger(__name__)

_COLR_PRIMARIES = {1: "bt709", 5: "bt470bg", 6: "smpte170m", 9: "bt2020",
                   12: "smpte432"}
_COLR_TRANSFERS = {1: "bt709", 6: "smpte170m", 8: "linear", 16: "smpte2084",
                   18: "arib-std-b67"}
_COLR_MATRICES = {0: "gbr", 1: "bt709", 6: "smpte170m", 9: "bt2020nc",
                  10: "bt2020c"}


def probe_media(path) -> VideoInfo:
    """Never raises; on failure returns safe 1080p30 SDR defaults."""
    path = Path(path)
    try:
        suffix = path.suffix.lower()
        if suffix == ".y4m":
            return _probe_y4m(path)
        if suffix in (".mp4", ".mov", ".m4v"):
            return _probe_mp4(path)
        return _probe_generic(path)
    except Exception as e:  # reference behavior: warn + defaults
        log.warning("probe failed for %s: %s; using defaults", path, e)
        return VideoInfo()


def _probe_y4m(path) -> VideoInfo:
    from hevc_tpu.io.y4m import Y4MReader
    r = Y4MReader(path)
    nb = r.count_frames()
    r.close()
    bd = r.bit_depth
    info = VideoInfo(
        width=r.width, height=r.height, fps=float(r.fps),
        nb_frames=nb, duration=nb / float(r.fps) if r.fps else 0.0,
        pix_fmt="yuv420p10le" if bd == 10 else "yuv420p",
        bit_depth=bd, container="y4m",
        codec_name="rawvideo",
    )
    _finalize_hdr(info)
    return info


def _probe_mp4(path) -> VideoInfo:
    from hevc_tpu.io.mp4parse import probe_mp4
    d = probe_mp4(path)
    info = VideoInfo(container="mp4")
    info.width = d.get("width", info.width)
    info.height = d.get("height", info.height)
    info.codec_name = d.get("codec", "")
    if "fps" in d:
        info.fps = float(d["fps"])
    info.nb_frames = d.get("nb_frames", 0)
    info.duration = d.get("duration", 0.0)
    if "hvcc" in d:
        info.bit_depth = d["hvcc"].get("bit_depth", 8)
        info.pix_fmt = "yuv420p10le" if info.bit_depth == 10 else "yuv420p"
    if "colr" in d:
        c = d["colr"]
        info.color_primaries = _COLR_PRIMARIES.get(c["primaries"], "unknown")
        info.color_transfer = _COLR_TRANSFERS.get(c["transfer"], "unknown")
        info.color_space = _COLR_MATRICES.get(c["matrix"], "unknown")
        info.color_range = "pc" if c["full_range"] else "tv"
    if d.get("mdcv"):
        from hevc_tpu.planner.hdr import DEFAULT_MASTER_DISPLAY
        info.master_display = DEFAULT_MASTER_DISPLAY
    _finalize_hdr(info)
    return info


def _probe_generic(path) -> VideoInfo:
    """Fallback through the linked libavformat harness (not a subprocess)."""
    from hevc_tpu.validate import avref
    if not avref.available():
        raise RuntimeError("no native parser for this container")
    frames = avref.decode_file(str(path), max_frames=1)
    if not frames:
        raise RuntimeError("no decodable video stream")
    y, cb, cr = frames[0]
    info = VideoInfo(width=y.shape[1], height=y.shape[0],
                     container=path.suffix.lstrip("."), codec_name="unknown")
    _finalize_hdr(info)
    return info


def _finalize_hdr(info: VideoInfo) -> None:
    from hevc_tpu.planner.hdr import detect_hdr
    info.is_hdr = detect_hdr(info)
