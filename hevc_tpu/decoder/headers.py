"""HEVC parameter-set and slice-header parsing (spec 7.3.2/7.3.6).

Parses the subset of SPS/PPS features the conformance decoder supports and
asserts on anything outside it.  Used both to decode this framework's own
output and to decode third-party streams (x265) as entropy-layer test vectors.
"""
from __future__ import annotations

from dataclasses import dataclass, field

from hevc_tpu.utils.bitio import BitReader, ebsp_to_rbsp


def _parse_ptl(r: BitReader, max_sub_layers: int = 1) -> dict:
    out = {
        "profile_space": r.u(2), "tier": r.u(1), "profile_idc": r.u(5),
        "compat": r.u(32),
    }
    r.u(4)      # progressive/interlaced/non_packed/frame_only
    r.u(32)
    r.u(12)     # reserved 44 bits
    out["level_idc"] = r.u(8)
    subs = []
    for _ in range(max_sub_layers - 1):
        subs.append((r.u(1), r.u(1)))  # profile/level present flags
    if max_sub_layers > 1:
        for _ in range(8 - (max_sub_layers - 1)):
            r.u(2)
    for pp, lp in subs:
        if pp:
            r.u(88)
        if lp:
            r.u(8)
    return out


@dataclass
class Sps:
    width: int = 0
    height: int = 0
    pic_width: int = 0          # before conformance cropping
    pic_height: int = 0
    bit_depth: int = 8
    chroma_format_idc: int = 1
    log2_ctb: int = 4
    log2_min_cb: int = 4
    log2_min_tb: int = 2
    log2_max_tb: int = 4
    max_trafo_depth_intra: int = 0
    max_trafo_depth_inter: int = 0
    scaling_list_enabled: bool = False
    amp_enabled: bool = False
    sao_enabled: bool = False
    pcm_enabled: bool = False
    strong_intra_smoothing: bool = False
    temporal_mvp: bool = False
    num_st_rps: int = 0
    rps: list = field(default_factory=list)
    log2_max_poc_lsb: int = 8
    crop: tuple = (0, 0, 0, 0)
    raw: dict = field(default_factory=dict)


def parse_sps(nal: bytes) -> Sps:
    r = BitReader(ebsp_to_rbsp(nal[2:]))
    s = Sps()
    r.u(4)                              # sps_video_parameter_set_id
    max_sub = r.u(3) + 1
    r.u(1)                              # temporal_id_nesting
    ptl = _parse_ptl(r, max_sub)
    s.raw["ptl"] = ptl
    r.ue()                              # sps id
    s.chroma_format_idc = r.ue()
    if s.chroma_format_idc == 3:
        r.u(1)
    s.pic_width = r.ue()
    s.pic_height = r.ue()
    crop = (0, 0, 0, 0)
    if r.u(1):                          # conformance_window_flag
        crop = (r.ue(), r.ue(), r.ue(), r.ue())  # l, r, t, b (chroma units)
    s.crop = crop
    sub_w = 2 if s.chroma_format_idc in (1, 2) else 1
    sub_h = 2 if s.chroma_format_idc == 1 else 1
    s.width = s.pic_width - sub_w * (crop[0] + crop[1])
    s.height = s.pic_height - sub_h * (crop[2] + crop[3])
    s.bit_depth = r.ue() + 8
    bd_c = r.ue() + 8
    assert bd_c == s.bit_depth
    s.log2_max_poc_lsb = r.ue() + 4
    sub_ordering = r.u(1)
    for _ in range(max_sub if sub_ordering else 1):
        r.ue(), r.ue(), r.ue()
    s.log2_min_cb = r.ue() + 3
    s.log2_ctb = s.log2_min_cb + r.ue()
    s.log2_min_tb = r.ue() + 2
    s.log2_max_tb = s.log2_min_tb + r.ue()
    s.max_trafo_depth_inter = r.ue()
    s.max_trafo_depth_intra = r.ue()
    s.scaling_list_enabled = bool(r.u(1))
    assert not s.scaling_list_enabled, "scaling lists unsupported"
    s.amp_enabled = bool(r.u(1))
    s.sao_enabled = bool(r.u(1))
    s.pcm_enabled = bool(r.u(1))
    assert not s.pcm_enabled, "PCM unsupported"
    s.num_st_rps = r.ue()
    assert s.num_st_rps <= 8, "too many short-term RPS"
    s.rps = []
    for idx in range(s.num_st_rps):
        if idx > 0:
            assert r.u(1) == 0, "inter-RPS prediction unsupported"
        num_neg = r.ue()
        num_pos = r.ue()
        assert num_neg <= 1 and num_pos <= 1, "one ref per list supported"
        neg, pos = [], []
        for _ in range(num_neg):
            neg.append(r.ue() + 1)      # delta_poc_s0_minus1 + 1
            assert r.u(1) == 1          # used_by_curr_pic
        for _ in range(num_pos):
            pos.append(r.ue() + 1)
            assert r.u(1) == 1
        s.rps.append((neg, pos))
    if r.u(1):                          # long_term_ref_pics_present
        raise NotImplementedError("long-term refs")
    s.temporal_mvp = bool(r.u(1))
    s.strong_intra_smoothing = bool(r.u(1))
    # VUI and extensions ignored
    return s


@dataclass
class Pps:
    sign_data_hiding: bool = False
    cabac_init_present: bool = False
    init_qp: int = 26
    constrained_intra: bool = False
    transform_skip: bool = False
    cu_qp_delta_enabled: bool = False
    diff_cu_qp_delta_depth: int = 0
    cb_qp_offset: int = 0
    cr_qp_offset: int = 0
    slice_chroma_qp_offsets_present: bool = False
    transquant_bypass: bool = False
    weighted_pred: bool = False
    lists_modification: bool = False
    tiles_enabled: bool = False
    tile_cols: int = 1
    tile_rows: int = 1
    uniform_tiles: bool = True
    entropy_sync: bool = False
    deblocking_disabled: bool = True
    deblocking_override_enabled: bool = False
    deblocking_control_present: bool = False
    loop_filter_across_slices: bool = True
    num_extra_slice_header_bits: int = 0
    output_flag_present: bool = False
    dependent_slices: bool = False
    beta_offset_div2: int = 0
    tc_offset_div2: int = 0


def parse_pps(nal: bytes) -> Pps:
    r = BitReader(ebsp_to_rbsp(nal[2:]))
    p = Pps()
    r.ue(), r.ue()                      # pps id, sps id
    p.dependent_slices = bool(r.u(1))
    p.output_flag_present = bool(r.u(1))
    p.num_extra_slice_header_bits = r.u(3)
    p.sign_data_hiding = bool(r.u(1))
    p.cabac_init_present = bool(r.u(1))
    r.ue(), r.ue()                      # num_ref_idx defaults
    p.init_qp = 26 + r.se()
    p.constrained_intra = bool(r.u(1))
    p.transform_skip = bool(r.u(1))
    p.cu_qp_delta_enabled = bool(r.u(1))
    if p.cu_qp_delta_enabled:
        p.diff_cu_qp_delta_depth = r.ue()
    p.cb_qp_offset = r.se()
    p.cr_qp_offset = r.se()
    p.slice_chroma_qp_offsets_present = bool(r.u(1))
    p.weighted_pred = bool(r.u(1))
    r.u(1)                              # weighted_bipred
    p.transquant_bypass = bool(r.u(1))
    assert not p.transquant_bypass, "transquant bypass unsupported"
    p.tiles_enabled = bool(r.u(1))
    p.entropy_sync = bool(r.u(1))
    if p.tiles_enabled:
        p.tile_cols = r.ue() + 1
        p.tile_rows = r.ue() + 1
        p.uniform_tiles = bool(r.u(1))
        assert p.uniform_tiles, "non-uniform tiles unsupported"
        r.u(1)                          # loop_filter_across_tiles
    p.loop_filter_across_slices = bool(r.u(1))
    p.deblocking_control_present = bool(r.u(1))
    if p.deblocking_control_present:
        p.deblocking_override_enabled = bool(r.u(1))
        p.deblocking_disabled = bool(r.u(1))
        if not p.deblocking_disabled:
            p.beta_offset_div2 = r.se()
            p.tc_offset_div2 = r.se()
    else:
        p.deblocking_disabled = False
    if r.u(1):                          # pps_scaling_list_data_present
        raise NotImplementedError("pps scaling lists")
    p.lists_modification = bool(r.u(1))
    r.ue()                              # log2_parallel_merge_level_minus2
    r.u(1)                              # slice_segment_header_extension
    return p


@dataclass
class SliceHeader:
    slice_type: int = 2
    poc: int = 0
    init_type: int = 0                  # CABAC initType (9.3.2.2)
    max_merge_cand: int = 1
    temporal_mvp: bool = False          # slice_temporal_mvp_enabled_flag
    collocated_from_l0: bool = True     # B: col pic list (P infers L0)
    mvd_l1_zero: bool = False
    rps: tuple = ([], [])               # (neg POC deltas, pos POC deltas)
    qp: int = 26
    sao_luma: bool = False
    sao_chroma: bool = False
    deblocking_disabled: bool = True
    beta_offset_div2: int = 0
    tc_offset_div2: int = 0
    payload_offset: int = 0             # byte offset of CABAC data in RBSP
    first_in_pic: bool = True
    entry_point_offsets: list = None    # EBSP byte sizes of substreams[:-1]
    wp: tuple | None = None             # explicit P weights
                                        # (wy, oy, wcb, ocb, wcr, ocr),
                                        # denom fixed 2^6 (None = default)


def _parse_pred_weight_table(r: BitReader) -> tuple:
    """pred_weight_table (7.3.6.3), one L0 reference, 4:2:0.

    Returns (wy, oy, wcb, ocb, wcr, ocr); the luma/chroma weight denom is
    required to be 2^6 (the only denom this profile emits)."""
    denom_y = r.ue()                    # luma_log2_weight_denom
    denom_c = denom_y + r.se()          # + delta_chroma_log2_weight_denom
    assert denom_y == 6 and denom_c == 6, "weight denom != 6 unsupported"
    luma_f = r.u(1)                     # luma_weight_l0_flag[0]
    chroma_f = r.u(1)                   # chroma_weight_l0_flag[0]
    wy, oy = 64, 0
    wcb, ocb, wcr, ocr = 64, 0, 64, 0
    if luma_f:
        wy = 64 + r.se()                # delta_luma_weight_l0[0]
        oy = r.se()                     # luma_offset_l0[0]
    if chroma_f:
        cw = []
        for _ in range(2):
            wc = 64 + r.se()            # delta_chroma_weight_l0[0][j]
            delta = r.se()              # delta_chroma_offset_l0[0][j]
            oc = min(max(128 + delta - ((128 * wc) >> denom_c), -128), 127)
            cw += [wc, oc]
        wcb, ocb, wcr, ocr = cw
    return (wy, oy, wcb, ocb, wcr, ocr)


def parse_slice_header(rbsp: bytes, nal_type: int, sps: Sps, pps: Pps) -> SliceHeader:
    r = BitReader(rbsp)
    h = SliceHeader()
    h.first_in_pic = bool(r.u(1))
    assert h.first_in_pic, "multi-slice frames unsupported (v0)"
    if 16 <= nal_type <= 23:            # IRAP
        r.u(1)                          # no_output_of_prior_pics
    r.ue()                              # pps id
    for _ in range(pps.num_extra_slice_header_bits):
        r.u(1)
    h.slice_type = r.ue()
    assert h.slice_type in (0, 1, 2)
    if pps.output_flag_present:
        r.u(1)
    if nal_type not in (19, 20):        # not IDR: POC + RPS
        h.poc = r.u(sps.log2_max_poc_lsb)
        if not r.u(1):                  # short_term_ref_pic_set_sps_flag
            raise NotImplementedError("inline RPS")
        idx = 0
        if sps.num_st_rps > 1:
            nbits = max(1, (sps.num_st_rps - 1).bit_length())
            idx = r.u(nbits)
        h.rps = sps.rps[idx] if sps.rps else ([], [])
        if sps.temporal_mvp:
            h.temporal_mvp = bool(r.u(1))   # slice_temporal_mvp_enabled_flag
    if sps.sao_enabled:
        h.sao_luma = bool(r.u(1))
        h.sao_chroma = bool(r.u(1))
    if h.slice_type in (0, 1):          # P/B: ref lists + merge config
        assert not pps.lists_modification, "ref list modification unsupported"
        if r.u(1):                      # num_ref_idx_active_override_flag
            r.ue()                      # num_ref_idx_l0_active_minus1
            if h.slice_type == 0:
                r.ue()                  # num_ref_idx_l1_active_minus1
        if h.slice_type == 0:
            h.mvd_l1_zero = bool(r.u(1))
        if pps.cabac_init_present:
            cabac_init = r.u(1)
            h.init_type = (1 if cabac_init else 2) if h.slice_type == 0 \
                else (2 if cabac_init else 1)
        else:
            h.init_type = 2 if h.slice_type == 0 else 1
        if h.temporal_mvp and h.slice_type == 0:
            h.collocated_from_l0 = bool(r.u(1))
        if pps.weighted_pred and h.slice_type == 1:
            h.wp = _parse_pred_weight_table(r)
        h.max_merge_cand = 5 - r.ue()   # five_minus_max_num_merge_cand
        assert h.max_merge_cand <= 2, \
            "merge candidate lists beyond 2 unsupported"
    h.qp = pps.init_qp + r.se()
    if pps.slice_chroma_qp_offsets_present:
        r.se(), r.se()
    h.deblocking_disabled = pps.deblocking_disabled
    if pps.deblocking_control_present and pps.deblocking_override_enabled:
        if r.u(1):                      # deblocking_filter_override_flag
            h.deblocking_disabled = bool(r.u(1))
            if not h.deblocking_disabled:
                h.beta_offset_div2 = r.se()
                h.tc_offset_div2 = r.se()
    else:
        h.beta_offset_div2 = pps.beta_offset_div2
        h.tc_offset_div2 = pps.tc_offset_div2
    if pps.loop_filter_across_slices and \
            (h.sao_luma or h.sao_chroma or not h.deblocking_disabled):
        r.u(1)                          # slice_loop_filter_across_slices
    assert not pps.entropy_sync, "WPP unsupported"
    h.entry_point_offsets = []
    if pps.tiles_enabled:
        n = r.ue()                      # num_entry_point_offsets
        if n:
            blen = r.ue() + 1
            h.entry_point_offsets = [r.u(blen) + 1 for _ in range(n)]
    assert r.bit() == 1                 # byte alignment
    r.byte_align()
    h.payload_offset = r.bitpos // 8
    return h
