"""Planner behavior parity (SURVEY C2, C4, C5)."""
import numpy as np
import pytest

from hevc_tpu.io.videoinfo import VideoInfo
from hevc_tpu.planner.levels import calculate_apple_hevc_level, \
    calculate_fast_hevc_level, select_level
from hevc_tpu.planner.rate import calculate_dynamic_values, \
    compute_aligned_gop, target_bitrate_kbps
from hevc_tpu.planner.hdr import detect_hdr, detect_hdr_core, \
    build_hdr_metadata, DEFAULT_MASTER_DISPLAY, DEFAULT_MAX_CLL, \
    parse_master_display


def info(w=1920, h=1080, fps=30.0, hdr=False, **kw):
    # mid-range motion density (no +-1 adjustment) unless caller overrides
    kw.setdefault("nb_frames", int(w * h * 1.5e-4))
    return VideoInfo(width=w, height=h, fps=fps, is_hdr=hdr, **kw)


def test_level_selection():
    assert calculate_apple_hevc_level(1920, 1080, 30, False)[0] <= 4.1
    lvl, tier = calculate_apple_hevc_level(3840, 2160, 60, True)
    # reference tier gate compares samples/sec to the high-tier kbps value
    # raw (core/transcoder.py:183-186), so real 4K never passes it
    assert lvl >= 5.1 and not tier
    lvl, tier = calculate_apple_hevc_level(1280, 720, 30, False)
    assert lvl <= 4.0 and not tier
    lvl, tier = calculate_apple_hevc_level(7680, 4320, 60, False)
    assert lvl >= 6.0


def test_level_table_matches_reference():
    # the conservative bitrate/CPB columns are the reference's exact values
    from hevc_tpu.planner.levels import HEVC_LEVEL_LIMITS
    assert HEVC_LEVEL_LIMITS[4.0][2] == 3_000_000
    assert HEVC_LEVEL_LIMITS[4.0][3] == 245760 * 8
    assert HEVC_LEVEL_LIMITS[2.0][5] == 3000
    assert HEVC_LEVEL_LIMITS[5.1][2] == 24_000_000


def test_fast_level_buckets():
    assert calculate_fast_hevc_level(1920, 1080, False).level == 4.0
    assert calculate_fast_hevc_level(2560, 1440, False).level == 4.1
    assert calculate_fast_hevc_level(3840, 2160, False).level == 5.1
    assert calculate_fast_hevc_level(7680, 4320, False).level == 5.2
    c = calculate_fast_hevc_level(1920, 1080, True)
    assert c.profile == "main10" and c.pix_fmt == "p010le"


def test_crf_envelope():
    # base CRF by height, HDR -1, clamp [16, 24]
    assert calculate_dynamic_values(info(640, 480)).crf == 17
    assert calculate_dynamic_values(info(1280, 720)).crf == 18
    assert calculate_dynamic_values(info(1920, 1080)).crf == 19
    assert calculate_dynamic_values(info(3840, 2160)).crf == 21
    assert calculate_dynamic_values(info(1920, 1080, hdr=True)).crf == 18
    p = calculate_dynamic_values(info())
    assert p.cq == p.crf + 1
    assert 16 <= p.crf <= 24


def test_crf_to_qp_calibrated():
    # piecewise-linear through the measured matched-PSNR anchors
    # (tools/quality_bd_r3_*.jsonl); monotone; clamped to [0, 51]
    from hevc_tpu.planner.rate import crf_to_qp
    i = info()
    assert crf_to_qp(18, i) == 21
    assert crf_to_qp(23, i) == 24   # round(24.5) banker's -> 24
    assert crf_to_qp(28, i) == 28   # round(27.5) -> 28
    assert crf_to_qp(33, i) == 32   # round(31.5) -> 32
    qs = [crf_to_qp(c, i) for c in range(0, 52)]
    assert all(a <= b for a, b in zip(qs, qs[1:]))
    assert 0 <= qs[0] and qs[-1] <= 51
    # the old crf+5 stub over-quantized mid-range CRFs by ~4 QP
    assert crf_to_qp(28, i) <= 28 + 1


def test_bitrate_envelope():
    assert target_bitrate_kbps(info(1920, 1080)) == 16000
    assert target_bitrate_kbps(info(1920, 1080, hdr=True)) == 19000
    assert target_bitrate_kbps(info(2560, 1440)) == 26000
    assert target_bitrate_kbps(info(3840, 2160)) == 50000
    assert target_bitrate_kbps(info(3840, 2160, hdr=True)) == 65000
    assert target_bitrate_kbps(info(7680, 4320)) == 140000
    assert target_bitrate_kbps(info(1280, 720)) == 8000


def test_vbv_respects_level_limits():
    p = calculate_dynamic_values(info(3840, 2160, 60, hdr=True))
    from hevc_tpu.planner.levels import max_bitrate_bps, \
        calculate_apple_hevc_level
    lvl, tier = calculate_apple_hevc_level(3840, 2160, 60, True)
    assert p.vbv_maxrate_kbps * 1000 <= max_bitrate_bps(lvl, tier)


def test_gop_alignment():
    # reference matrix (core/transcoder.py:339-342): SDR <4K -> 3.0 s,
    # SDR >=4K -> 2.5 s; HDR 2.5 / 2.0 s.  Alignment ties (2.5 s at an
    # integer fps) resolve to FEWER seconds per the reference's
    # first-win candidate scan (core/transcoder.py:233-241).
    g = compute_aligned_gop(30.0, False, 1080, 1920)
    assert g == 90                       # 3.0 s at 30 fps
    g = compute_aligned_gop(29.97, False, 1080, 1920)
    assert 2 <= g <= 240 and abs(g / 29.97 - round(g / 29.97)) < 0.02
    assert compute_aligned_gop(30.0, False, 2160, 3840) == 60   # 2.5 s tie
    assert compute_aligned_gop(30.0, True, 1080, 1920) == 60    # HDR 2.5 s
    assert compute_aligned_gop(30.0, True, 2160, 3840) == 60    # HDR 2.0 s
    assert compute_aligned_gop(120.0, False, 720, 1280) <= 240


def test_hdr_detection_rules():
    sdr = info()
    assert not detect_hdr(sdr)
    # any-of-5 monolith rule
    assert detect_hdr(info(color_primaries="bt2020"))
    assert detect_hdr(info(color_transfer="smpte2084"))
    assert detect_hdr(info(color_transfer="arib-std-b67"))   # HLG
    assert detect_hdr(info(color_space="bt2020nc"))
    assert detect_hdr(info(pix_fmt="yuv420p10le"))
    assert detect_hdr(info(master_display="G(1,2)B(3,4)R(5,6)WP(7,8)L(9,10)"))
    # core >=2-of-4 rule stays stricter
    assert not detect_hdr_core(info(color_primaries="bt2020"))
    assert detect_hdr_core(info(color_primaries="bt2020",
                                color_transfer="smpte2084"))


def test_hdr_metadata_defaults():
    i = info(hdr=True)
    md = build_hdr_metadata(i)
    assert md["master_display"] == DEFAULT_MASTER_DISPLAY
    assert md["max_cll"] == DEFAULT_MAX_CLL
    parsed = parse_master_display(md["master_display"])
    assert parsed["g"] == (13250, 34500) and parsed["max_lum"] == 10000000
    assert build_hdr_metadata(info()) == {}


def test_level_autoraise_for_tile_grid():
    """StreamConfig signals a level whose Table A.1 tile limits admit the
    lane grid (A.4.2): 102 tiles at 1080p needs level 6.0, not 4.0."""
    from hevc_tpu.entropy.headers import StreamConfig, min_level_idc
    cfg = StreamConfig(width=1920, height=1080, tile_cols=6, tile_rows=17)
    assert cfg.level_idc == 180                      # 17 rows -> level 6.0
    assert StreamConfig(width=1920, height=1080).level_idc == 120
    # explicit higher level is kept
    cfg = StreamConfig(width=640, height=384, level_idc=153)
    assert cfg.level_idc == 153
    assert min_level_idc(3840, 2176, 15, 17, 30.0) == 180
    assert min_level_idc(1280, 720, 3, 3, 30.0) == 93


def test_pick_tile_grid_obeys_level6_caps():
    from hevc_tpu.encoder.frame_jax import pick_tile_grid
    for nh, nw, ctb in ((135, 240, 16), (68, 120, 32), (68, 120, 16)):
        tc, tr = pick_tile_grid(nh, nw, ctb)
        assert tc <= 20 and tr <= 22
        assert nw % tc == 0 and nh % tr == 0
