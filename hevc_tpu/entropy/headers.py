"""HEVC parameter set and slice header writers (spec 7.3.2, 7.3.6).

Emits VPS/SPS/PPS/slice-segment headers for the encode profiles this framework
produces.  The VUI carries the color signaling the reference wrote through
ffmpeg flags (`-color_primaries/-color_trc/-colorspace`, reference
core/utils.py:43-55) and `-chromaloc 0` (reference apple_hevc_batch.py:717).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from fractions import Fraction

from hevc_tpu.utils.bitio import BitWriter, make_nal, NAL_VPS, NAL_SPS, \
    NAL_PPS, NAL_AUD


def write_aud(pic_type: int = 2) -> bytes:
    """Access-unit delimiter NAL (spec 7.3.2.5): pic_type 0=I, 1=P+I, 2=B+P+I.

    The reference forces `-aud 1` into every encode command for Apple
    compliance (reference core/transcoder.py:148-153); every MP4 sample this
    framework muxes starts with one.
    """
    w = BitWriter()
    w.u(pic_type, 3)
    w.rbsp_trailing_bits()
    return make_nal(NAL_AUD, w.bytes())

# color description name -> code (spec Table E.3/E.4/E.5 subsets)
PRIMARIES = {"bt709": 1, "unknown": 2, "bt470bg": 5, "smpte170m": 6,
             "bt2020": 9, "smpte432": 12}
TRANSFERS = {"bt709": 1, "unknown": 2, "smpte170m": 6, "linear": 8,
             "smpte2084": 16, "arib-std-b67": 18}
MATRICES = {"gbr": 0, "bt709": 1, "unknown": 2, "smpte170m": 6,
            "bt2020nc": 9, "bt2020c": 10}


# spec Table A.1 (level limits): level_idc -> (MaxTileCols, MaxTileRows,
# MaxLumaPs, MaxLumaSr).  Used to auto-raise the signaled level when the
# tile lane grid (our device-parallelism axis) exceeds the tile-count
# limits of the resolution-derived level — the stream then conforms to
# the level it signals (A.4.2 items f/g).
LEVEL_CAPS: tuple = (
    (30, 1, 1, 36_864, 552_960),
    (60, 1, 1, 122_880, 3_686_400),
    (63, 1, 1, 245_760, 7_372_800),
    (90, 2, 2, 552_960, 16_588_800),
    (93, 3, 3, 983_040, 33_177_600),
    (120, 5, 5, 2_228_224, 66_846_720),
    (123, 5, 5, 2_228_224, 133_693_440),
    (150, 10, 11, 8_912_896, 267_386_880),
    (153, 10, 11, 8_912_896, 534_773_760),
    (156, 10, 11, 8_912_896, 1_069_547_520),
    (180, 20, 22, 35_651_584, 1_069_547_520),
    (183, 20, 22, 35_651_584, 2_139_095_040),
    (186, 20, 22, 35_651_584, 4_278_190_080),
)


def min_level_idc(pic_w: int, pic_h: int, tile_cols: int, tile_rows: int,
                  fps: float = 30.0) -> int:
    """Smallest level_idc whose Table A.1 limits admit this stream."""
    luma_ps = pic_w * pic_h
    luma_sr = luma_ps * fps
    for idc, mc, mr, mps, msr in LEVEL_CAPS:
        if tile_cols <= mc and tile_rows <= mr and luma_ps <= mps \
                and luma_sr <= msr:
            return idc
    return LEVEL_CAPS[-1][0]


@dataclass
class StreamConfig:
    """Static per-stream coding configuration (one compiled bucket)."""
    width: int                     # display (cropped) size
    height: int
    bit_depth: int = 8
    fps: Fraction = Fraction(30, 1)
    log2_ctb: int = 4              # CTB size (v0 profile: 16)
    log2_min_cb: int = 4
    log2_min_tb: int = 2
    log2_max_tb: int = 4
    max_transform_hierarchy_depth_intra: int = 0
    qp: int = 30
    level_idc: int = 120           # level 4.0 * 30
    tier_high: bool = False
    profile_idc: int = 1           # Main
    color_primaries: str = "bt709"
    color_transfer: str = "bt709"
    color_space: str = "bt709"
    full_range: bool = False
    chromaloc: int = 0
    hdr: bool = False
    tile_cols: int = 1             # uniform tile grid (1x1 = tiles off)
    tile_rows: int = 1
    deblock: bool = True           # in-loop deblocking filter
    inter: bool = False            # P slices (zero-MV skip GOP structure)
    bframes: bool = False          # IbPbP GOP (non-reference B pictures)
    sao: bool = False              # sample-adaptive offset (luma + chroma)
    sdh: bool = False              # sign-data hiding (x265-medium parity)
    rdoq: bool = False             # RD-aware quantization (encoder-only)
    weightp: bool = False          # explicit weighted prediction, P slices
                                   # (x265-medium `weightp`; PPS
                                   # weighted_pred_flag + per-slice table)
    bframes_n: int = 1             # non-reference B pictures per mini-GOP
                                   # (1 = IbPbP, 2 = IbbPbbP; x265-medium
                                   # runs bframes 4 w/ pyramid - multi-B
                                   # is the non-pyramid step toward it)
    cu_qp_delta: bool = False      # per-CTB QP (PPS cu_qp_delta_enabled,
                                   # QG = CTB); carrier for adaptive QP
                                   # (x265-medium AQ mode 2)
    tmvp: bool = False             # temporal MV predictor (SPS
                                   # sps_temporal_mvp_enabled_flag;
                                   # x265-medium `tmvp`): collocated
                                   # candidate in merge + AMVP, col pic
                                   # = L0[0] (P) / L1[0] (B)
    merge_cands: int = 1           # MaxNumMergeCand (slice
                                   # five_minus_max_num_merge_cand);
                                   # >1 codes merge_idx on skip/merge
                                   # CUs (x265-medium runs merge 3)
    aq_strength: float = 0.0       # variance AQ: per-CTB QP offset =
                                   # clip(round(s*(log2 var - mean)), +-6)
    extra: dict = field(default_factory=dict)

    def __post_init__(self):
        # the signaled level must admit the tile grid / luma rate
        # (Table A.1); the planner's resolution-derived level is a floor
        need = min_level_idc(self.pic_width, self.pic_height,
                             self.tile_cols, self.tile_rows,
                             float(self.fps))
        if self.level_idc < need:
            self.level_idc = need

    @property
    def tiles_enabled(self) -> bool:
        return self.tile_cols > 1 or self.tile_rows > 1

    @property
    def num_tiles(self) -> int:
        return self.tile_cols * self.tile_rows

    def rps_nbits(self) -> int:
        """Fixed-bit width of short_term_ref_pic_set_idx (7.4.7.1)."""
        n = len(rps_sets(self))
        return max(1, (n - 1).bit_length()) if n > 1 else 0

    def tile_grid(self) -> tuple[list[int], list[int]]:
        """(col_widths, row_heights) in CTUs, uniform spacing (spec 6.5.1)."""
        nw, nh = self.ctbs_w, self.ctbs_h
        t, r = self.tile_cols, self.tile_rows
        cols = [(i + 1) * nw // t - i * nw // t for i in range(t)]
        rows = [(j + 1) * nh // r - j * nh // r for j in range(r)]
        return cols, rows

    @property
    def ctb(self) -> int:
        return 1 << self.log2_ctb

    @property
    def pic_width(self) -> int:       # coded (padded) size
        c = self.ctb
        return (self.width + c - 1) // c * c

    @property
    def pic_height(self) -> int:
        c = self.ctb
        return (self.height + c - 1) // c * c

    @property
    def ctbs_w(self) -> int:
        return self.pic_width // self.ctb

    @property
    def ctbs_h(self) -> int:
        return self.pic_height // self.ctb


def _profile_tier_level(w: BitWriter, cfg: StreamConfig) -> None:
    w.u(0, 2)                       # general_profile_space
    w.u(1 if cfg.tier_high else 0, 1)
    w.u(cfg.profile_idc, 5)
    for i in range(32):             # compatibility flags
        w.u(1 if i in (1, 2) else 0, 1)   # Main + Main10 compatible
    w.u(1, 1)                       # progressive_source
    w.u(0, 1)                       # interlaced_source
    w.u(1, 1)                       # non_packed_constraint
    w.u(1, 1)                       # frame_only_constraint
    w.u(0, 32)                      # general_reserved_zero_44bits
    w.u(0, 12)
    w.u(cfg.level_idc, 8)


def write_vps(cfg: StreamConfig) -> bytes:
    w = BitWriter()
    w.u(0, 4)                       # vps_video_parameter_set_id
    w.u(3, 2)                       # base_layer_internal + available (reserved=1,1)
    w.u(0, 6)                       # vps_max_layers_minus1
    w.u(0, 3)                       # vps_max_sub_layers_minus1
    w.u(1, 1)                       # vps_temporal_id_nesting_flag
    w.u(0xFFFF, 16)                 # vps_reserved_0xffff_16bits
    _profile_tier_level(w, cfg)
    w.u(0, 1)                       # vps_sub_layer_ordering_info_present_flag
    w.ue(1 + cfg.bframes_n if cfg.bframes else 1)   # vps_max_dec_pic_buffering_minus1[0]
    w.ue(cfg.bframes_n if cfg.bframes else 0)       # vps_max_num_reorder_pics[0]
    w.ue(0)                         # vps_max_latency_increase_plus1[0]
    w.u(0, 6)                       # vps_max_layer_id
    w.ue(0)                         # vps_num_layer_sets_minus1
    w.u(0, 1)                       # vps_timing_info_present_flag
    w.u(0, 1)                       # vps_extension_flag
    w.rbsp_trailing_bits()
    return make_nal(NAL_VPS, w.bytes())


def write_sps(cfg: StreamConfig) -> bytes:
    w = BitWriter()
    w.u(0, 4)                       # sps_video_parameter_set_id
    w.u(0, 3)                       # sps_max_sub_layers_minus1
    w.u(1, 1)                       # sps_temporal_id_nesting_flag
    _profile_tier_level(w, cfg)
    w.ue(0)                         # sps_seq_parameter_set_id
    w.ue(1)                         # chroma_format_idc (4:2:0)
    w.ue(cfg.pic_width)
    w.ue(cfg.pic_height)
    crop_r = cfg.pic_width - cfg.width
    crop_b = cfg.pic_height - cfg.height
    if crop_r or crop_b:
        w.u(1, 1)                   # conformance_window_flag
        w.ue(0)                     # left (in chroma units: /2 for 4:2:0)
        w.ue(crop_r // 2)
        w.ue(0)
        w.ue(crop_b // 2)
    else:
        w.u(0, 1)
    w.ue(cfg.bit_depth - 8)         # bit_depth_luma_minus8
    w.ue(cfg.bit_depth - 8)         # bit_depth_chroma_minus8
    w.ue(4)                         # log2_max_pic_order_cnt_lsb_minus4 (=> 8 bits)
    w.u(0, 1)                       # sps_sub_layer_ordering_info_present_flag
    w.ue(1 + cfg.bframes_n if cfg.bframes else 1)   # sps_max_dec_pic_buffering_minus1
    w.ue(cfg.bframes_n if cfg.bframes else 0)       # sps_max_num_reorder_pics
    w.ue(0)                         # sps_max_latency_increase_plus1
    w.ue(cfg.log2_min_cb - 3)       # log2_min_luma_coding_block_size_minus3
    w.ue(cfg.log2_ctb - cfg.log2_min_cb)
    w.ue(cfg.log2_min_tb - 2)       # log2_min_luma_transform_block_size_minus2
    w.ue(cfg.log2_max_tb - cfg.log2_min_tb)
    w.ue(0)                         # max_transform_hierarchy_depth_inter
    w.ue(cfg.max_transform_hierarchy_depth_intra)
    w.u(0, 1)                       # scaling_list_enabled_flag
    w.u(0, 1)                       # amp_enabled_flag
    w.u(1 if cfg.sao else 0, 1)     # sample_adaptive_offset_enabled_flag
    w.u(0, 1)                       # pcm_enabled_flag
    sets = rps_sets(cfg)
    w.ue(len(sets))                 # num_short_term_ref_pic_sets
    for i, (neg, pos) in enumerate(sets):
        if i:
            w.u(0, 1)               # inter_ref_pic_set_prediction_flag
        w.ue(len(neg))              # num_negative_pics
        w.ue(len(pos))              # num_positive_pics
        for d in neg:               # single-entry lists, delta from cur
            w.ue(d - 1)             # delta_poc_s0_minus1
            w.u(1, 1)               # used_by_curr_pic_s0_flag
        for d in pos:
            w.ue(d - 1)             # delta_poc_s1_minus1
            w.u(1, 1)               # used_by_curr_pic_s1_flag
    w.u(0, 1)                       # long_term_ref_pics_present_flag
    w.u(1 if cfg.tmvp else 0, 1)    # sps_temporal_mvp_enabled_flag
    w.u(0, 1)                       # strong_intra_smoothing_enabled_flag
    w.u(1, 1)                       # vui_parameters_present_flag
    _write_vui(w, cfg)
    w.u(0, 1)                       # sps_extension_present_flag
    w.rbsp_trailing_bits()
    return make_nal(NAL_SPS, w.bytes())


def _write_vui(w: BitWriter, cfg: StreamConfig) -> None:
    w.u(0, 1)                       # aspect_ratio_info_present_flag
    w.u(0, 1)                       # overscan_info_present_flag
    w.u(1, 1)                       # video_signal_type_present_flag
    w.u(5, 3)                       # video_format = unspecified
    w.u(1 if cfg.full_range else 0, 1)
    w.u(1, 1)                       # colour_description_present_flag
    w.u(PRIMARIES.get(cfg.color_primaries, 2), 8)
    w.u(TRANSFERS.get(cfg.color_transfer, 2), 8)
    w.u(MATRICES.get(cfg.color_space, 2), 8)
    w.u(1, 1)                       # chroma_loc_info_present_flag
    w.ue(cfg.chromaloc)             # chroma_sample_loc_type_top_field
    w.ue(cfg.chromaloc)             # chroma_sample_loc_type_bottom_field
    w.u(0, 1)                       # neutral_chroma_indication_flag
    w.u(0, 1)                       # field_seq_flag
    w.u(0, 1)                       # frame_field_info_present_flag
    w.u(0, 1)                       # default_display_window_flag
    w.u(1, 1)                       # vui_timing_info_present_flag
    fps = cfg.fps
    w.u(fps.denominator, 32)        # vui_num_units_in_tick
    w.u(fps.numerator, 32)          # vui_time_scale
    w.u(0, 1)                       # vui_poc_proportional_to_timing_flag
    w.u(0, 1)                       # vui_hrd_parameters_present_flag
    w.u(0, 1)                       # bitstream_restriction_flag


def rps_sets(cfg: StreamConfig) -> list:
    """The SPS short-term RPS table: [(neg deltas, pos deltas)].

    THE single source of truth shared by the SPS writer, the GOP
    scheduler (encoder/gop.b_schedule rps_idx fields) and the per-B
    dsf derivation.  bframes_n=1: {P@2, b(1,1), P@1};  bframes_n=2:
    {P@3, b(1,2), P@1, b(2,1), P@2, b(1,1)} (trailing-segment P/b
    shapes included)."""
    if not cfg.inter:
        return []
    if not cfg.bframes:
        return [([1], [])]
    if cfg.bframes_n >= 2:
        return [([3], []), ([1], [2]), ([1], []),
                ([2], [1]), ([2], []), ([1], [1])]
    return [([2], []), ([1], [1]), ([1], [])]


def write_pps(cfg: StreamConfig) -> bytes:
    w = BitWriter()
    w.ue(0)                         # pps_pic_parameter_set_id
    w.ue(0)                         # pps_seq_parameter_set_id
    w.u(0, 1)                       # dependent_slice_segments_enabled_flag
    w.u(0, 1)                       # output_flag_present_flag
    w.u(0, 3)                       # num_extra_slice_header_bits
    w.u(1 if cfg.sdh else 0, 1)     # sign_data_hiding_enabled_flag
    w.u(0, 1)                       # cabac_init_present_flag
    w.ue(0)                         # num_ref_idx_l0_default_active_minus1
    w.ue(0)                         # num_ref_idx_l1_default_active_minus1
    w.se(0)                         # init_qp_minus26
    w.u(0, 1)                       # constrained_intra_pred_flag
    w.u(0, 1)                       # transform_skip_enabled_flag
    w.u(1 if cfg.cu_qp_delta else 0, 1)   # cu_qp_delta_enabled_flag
    if cfg.cu_qp_delta:
        w.ue(0)                     # diff_cu_qp_delta_depth (QG = CTB)
    w.se(0)                         # pps_cb_qp_offset
    w.se(0)                         # pps_cr_qp_offset
    w.u(0, 1)                       # pps_slice_chroma_qp_offsets_present_flag
    w.u(1 if cfg.weightp else 0, 1)  # weighted_pred_flag (P slices)
    w.u(0, 1)                       # weighted_bipred_flag
    w.u(0, 1)                       # transquant_bypass_enabled_flag
    w.u(1 if cfg.tiles_enabled else 0, 1)   # tiles_enabled_flag
    w.u(0, 1)                       # entropy_coding_sync_enabled_flag
    if cfg.tiles_enabled:
        w.ue(cfg.tile_cols - 1)
        w.ue(cfg.tile_rows - 1)
        w.u(1, 1)                   # uniform_spacing_flag
        w.u(0, 1)                   # loop_filter_across_tiles_enabled_flag
    w.u(1, 1)                       # pps_loop_filter_across_slices_enabled_flag
    w.u(1, 1)                       # deblocking_filter_control_present_flag
    w.u(0, 1)                       # deblocking_filter_override_enabled_flag
    w.u(0 if cfg.deblock else 1, 1)  # pps_deblocking_filter_disabled_flag
    if cfg.deblock:
        w.se(0)                     # pps_beta_offset_div2
        w.se(0)                     # pps_tc_offset_div2
    w.u(0, 1)                       # pps_scaling_list_data_present_flag
    w.u(0, 1)                       # lists_modification_present_flag
    w.ue(0)                         # log2_parallel_merge_level_minus2
    w.u(0, 1)                       # slice_segment_header_extension_present_flag
    w.u(0, 1)                       # pps_extension_present_flag
    w.rbsp_trailing_bits()
    return make_nal(NAL_PPS, w.bytes())


def write_slice_header_idr(cfg: StreamConfig,
                           entry_point_offsets: list[int] | None = None,
                           sao_on: bool | None = None) -> BitWriter:
    """IDR (I-slice) slice segment header up to and incl. byte alignment.

    entry_point_offsets: per-substream byte sizes (EBSP domain) for all but
    the last tile, required when tiles are enabled.
    sao_on: per-slice SAO flags (defaults to cfg.sao); the flag BITS are
    present whenever the SPS enables SAO.
    Returns the BitWriter so the caller can append the CABAC payload bytes.
    """
    w = BitWriter()
    w.u(1, 1)                       # first_slice_segment_in_pic_flag
    w.u(0, 1)                       # no_output_of_prior_pics_flag (IRAP)
    w.ue(0)                         # slice_pic_parameter_set_id
    w.ue(2)                         # slice_type = I
    if cfg.sao:
        s = 1 if (sao_on or sao_on is None) else 0
        w.u(s, 1)                   # slice_sao_luma_flag
        w.u(s, 1)                   # slice_sao_chroma_flag
    w.se(cfg.qp - 26)               # slice_qp_delta
    if cfg.deblock:                 # deblocking on: across-slices flag present
        w.u(1, 1)                   # slice_loop_filter_across_slices_enabled
    if cfg.tiles_enabled:
        offs = entry_point_offsets or []
        w.ue(len(offs))             # num_entry_point_offsets
        if offs:
            blen = max(1, max(o - 1 for o in offs).bit_length())
            w.ue(blen - 1)          # offset_len_minus1
            for o in offs:
                w.u(o - 1, blen)    # entry_point_offset_minus1
    w.bit(1)                        # byte_alignment: alignment_bit_equal_to_one
    w.byte_align(0)
    return w


def write_pred_weight_table(w: BitWriter, wp, bit_depth: int = 8) -> None:
    """pred_weight_table (spec 7.3.6.3), one L0 reference.

    wp = (wy, oy, wcb, ocb, wcr, ocr), weights with denom 2^6 and offsets
    in 8-bit sample units (scaled by the decoder at higher bit depths).
    (64, 0) planes code as flag-0 defaults."""
    from hevc_tpu.ops.inter import WP_DENOM
    wy, oy, wcb, ocb, wcr, ocr = wp
    w.ue(WP_DENOM)                  # luma_log2_weight_denom
    w.se(0)                         # delta_chroma_log2_weight_denom
    luma_f = not (wy == 64 and oy == 0)
    chroma_f = not (wcb == 64 and ocb == 0 and wcr == 64 and ocr == 0)
    w.u(1 if luma_f else 0, 1)      # luma_weight_l0_flag[0]
    w.u(1 if chroma_f else 0, 1)    # chroma_weight_l0_flag[0]
    if luma_f:
        w.se(wy - 64)               # delta_luma_weight_l0[0]
        w.se(oy)                    # luma_offset_l0[0]
    if chroma_f:
        for wc, oc in ((wcb, ocb), (wcr, ocr)):
            w.se(wc - 64)           # delta_chroma_weight_l0[0][j]
            # 7.4.7.3: ChromaOffset = Clip3(-128, 127,
            #   128 + delta - ((128 * w) >> denom))
            w.se(oc - 128 + ((128 * wc) >> WP_DENOM))


def write_slice_header_p(cfg: StreamConfig, poc_lsb: int,
                         entry_point_offsets: list[int] | None = None,
                         rps_idx: int = 0,
                         sao_on: bool | None = None,
                         wp=None) -> BitWriter:
    """P-slice (TRAIL_R) slice segment header (spec 7.3.6.1).

    Zero-MV-skip profile: one ref pic (the previous picture, RPS idx 0 from
    the SPS), MaxNumMergeCand = 1 so skip CUs carry no merge_idx, no
    temporal MVP.  With cfg.weightp the pred_weight_table is always
    present; wp = (wy, oy, wcb, ocb, wcr, ocr) (None -> defaults).
    """
    w = BitWriter()
    w.u(1, 1)                       # first_slice_segment_in_pic_flag
    w.ue(0)                         # slice_pic_parameter_set_id
    w.ue(1)                         # slice_type = P
    w.u(poc_lsb & 0xFF, 8)          # slice_pic_order_cnt_lsb (log2 = 8)
    w.u(1, 1)                       # short_term_ref_pic_set_sps_flag
    if cfg.bframes:
        w.u(rps_idx, cfg.rps_nbits())   # short_term_ref_pic_set_idx
    if cfg.tmvp:
        w.u(1, 1)                   # slice_temporal_mvp_enabled_flag
    if cfg.sao:
        s = 1 if (sao_on or sao_on is None) else 0
        w.u(s, 1)                   # slice_sao_luma_flag
        w.u(s, 1)                   # slice_sao_chroma_flag
    w.u(0, 1)                       # num_ref_idx_active_override_flag
    # P: collocated_from_l0 inferred 1; collocated_ref_idx absent (1 ref)
    if cfg.weightp:
        write_pred_weight_table(w, wp or (64, 0, 64, 0, 64, 0),
                                cfg.bit_depth)
    w.ue(5 - cfg.merge_cands)       # five_minus_max_num_merge_cand
    w.se(cfg.qp - 26)               # slice_qp_delta
    if cfg.deblock:
        w.u(1, 1)                   # slice_loop_filter_across_slices_enabled
    if cfg.tiles_enabled:
        offs = entry_point_offsets or []
        w.ue(len(offs))             # num_entry_point_offsets
        if offs:
            blen = max(1, max(o - 1 for o in offs).bit_length())
            w.ue(blen - 1)          # offset_len_minus1
            for o in offs:
                w.u(o - 1, blen)    # entry_point_offset_minus1
    w.bit(1)                        # byte_alignment
    w.byte_align(0)
    return w


def write_slice_header_b(cfg: StreamConfig, poc_lsb: int,
                         entry_point_offsets: list[int] | None = None,
                         sao_on: bool | None = None,
                         rps_idx: int = 1) -> BitWriter:
    """B-slice (TRAIL_N, non-reference) slice segment header.

    rps_idx selects the (past, future) reference pair from rps_sets
    (set 1 = the nearest-past + nearest-future IbPbP pair); one active
    ref per list, MaxNumMergeCand = 1, mvd_l1_zero off, default
    weighting.
    """
    w = BitWriter()
    w.u(1, 1)                       # first_slice_segment_in_pic_flag
    w.ue(0)                         # slice_pic_parameter_set_id
    w.ue(0)                         # slice_type = B
    w.u(poc_lsb & 0xFF, 8)          # slice_pic_order_cnt_lsb
    w.u(1, 1)                       # short_term_ref_pic_set_sps_flag
    w.u(rps_idx, cfg.rps_nbits())   # short_term_ref_pic_set_idx
    if cfg.tmvp:
        w.u(1, 1)                   # slice_temporal_mvp_enabled_flag
    if cfg.sao:
        s = 1 if (sao_on or sao_on is None) else 0
        w.u(s, 1)                   # slice_sao_luma_flag
        w.u(s, 1)                   # slice_sao_chroma_flag
    w.u(0, 1)                       # num_ref_idx_active_override_flag
    w.u(0, 1)                       # mvd_l1_zero_flag
    if cfg.tmvp:
        w.u(0, 1)                   # collocated_from_l0_flag -> col=L1[0]
    w.ue(5 - cfg.merge_cands)       # five_minus_max_num_merge_cand
    w.se(cfg.qp - 26)               # slice_qp_delta
    if cfg.deblock:
        w.u(1, 1)                   # slice_loop_filter_across_slices_enabled
    if cfg.tiles_enabled:
        offs = entry_point_offsets or []
        w.ue(len(offs))
        if offs:
            blen = max(1, max(o - 1 for o in offs).bit_length())
            w.ue(blen - 1)
            for o in offs:
                w.u(o - 1, blen)
    w.bit(1)                        # byte_alignment
    w.byte_align(0)
    return w
