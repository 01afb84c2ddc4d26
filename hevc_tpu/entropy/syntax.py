"""HEVC slice-data syntax encoding: CU / transform-tree / residual coding.

Walks per-CTU decisions produced by the TPU encode graph (intra modes +
quantized coefficients) and drives the CABAC engine.  Implements spec 7.3.8
(slice data syntax) and 9.3.4 (ctx derivation) for intra slices.

Supported configuration (v0 encode profile):
  * CTB = CU, part 2NxN/NxN intra, TUs = CU (2Nx2N) or quad split (NxN)
  * SAO / deblocking signaling disabled (SPS/PPS flags off)
  * no transform skip, no sign data hiding, no cu_qp_delta

This module is also the behavioral spec for the C++ fast path
(hevc_tpu/cpp/entropy.cpp); keep them in sync.
"""
from __future__ import annotations

import numpy as np

from hevc_tpu.entropy import tables as T
from hevc_tpu.entropy.cabac import CabacEncoder

INTRA_PLANAR = 0
INTRA_DC = 1
INTRA_ANGULAR26 = 26


def mpm_candidates(cand_a: int, cand_b: int) -> list[int]:
    """Spec 8.4.2: 3-entry most-probable-mode list from neighbor modes."""
    if cand_a == cand_b:
        if cand_a < 2:
            return [INTRA_PLANAR, INTRA_DC, INTRA_ANGULAR26]
        return [cand_a, 2 + ((cand_a + 29) % 32), 2 + ((cand_a - 2 + 1) % 32)]
    out = [cand_a, cand_b]
    for m in (INTRA_PLANAR, INTRA_DC, INTRA_ANGULAR26):
        if m not in out:
            out.append(m)
            break
    return out


class SliceSyntaxEncoder:
    """Encodes one intra slice's CTU decisions into CABAC bins."""

    def __init__(self, qp: int, init_type: int = 0, sdh: bool = False):
        self.sdh = sdh              # sign_data_hiding_enabled_flag
        self.cabac = CabacEncoder(qp, init_type)

    # ---- intra mode signaling ----------------------------------------------
    def encode_luma_mode(self, mode: int, cands: list[int]) -> None:
        c = self.cabac
        if mode in cands:
            c.encode_bin(T.CTX_OFF["prev_intra_luma_pred"], 1)
            idx = cands.index(mode)
            c.encode_bypass(0 if idx == 0 else 1)
            if idx > 0:
                c.encode_bypass(idx - 1)
        else:
            c.encode_bin(T.CTX_OFF["prev_intra_luma_pred"], 0)
            rem = mode - sum(1 for x in cands if x < mode)
            c.encode_bypass_bits(rem, 5)

    def encode_chroma_mode_dm(self) -> None:
        """intra_chroma_pred_mode = 4 (derived from luma): single '0' bin."""
        self.cabac.encode_bin(T.CTX_OFF["intra_chroma_pred_mode"], 0)

    # ---- cbf flags -----------------------------------------------------------
    def encode_cbf_luma(self, cbf: int, trafo_depth: int) -> None:
        ctx = T.CTX_OFF["cbf_luma"] + (1 if trafo_depth == 0 else 0)
        self.cabac.encode_bin(ctx, cbf)

    def encode_cbf_chroma(self, cbf: int, trafo_depth: int) -> None:
        self.cabac.encode_bin(T.CTX_OFF["cbf_chroma"] + trafo_depth, cbf)

    def encode_part_mode_intra(self, part_nxn: bool) -> None:
        self.cabac.encode_bin(T.CTX_OFF["part_mode"], 0 if part_nxn else 1)

    # ---- P-slice CU signaling (zero-MV skip profile) --------------------------
    def encode_cu_skip(self, skip: int, left_skip: int, above_skip: int) -> None:
        """cu_skip_flag, ctx = left + above neighbor skip flags (9.3.4.2.2)."""
        self.cabac.encode_bin(T.CTX_OFF["cu_skip"] + left_skip + above_skip,
                              skip)

    def encode_pred_mode(self, intra: bool) -> None:
        """pred_mode_flag for non-skip CUs in P slices."""
        self.cabac.encode_bin(T.CTX_OFF["pred_mode"], 1 if intra else 0)

    # compat alias (pre-MC-inter callers)
    def encode_pred_mode_intra(self) -> None:
        self.encode_pred_mode(True)

    def encode_part_mode_inter_2nx2n(self) -> None:
        """part_mode for an inter CU at MinCb: '1' = PART_2Nx2N (9.3.3.7)."""
        self.cabac.encode_bin(T.CTX_OFF["part_mode"], 1)

    def encode_merge_flag(self, merge: bool) -> None:
        self.cabac.encode_bin(T.CTX_OFF["merge_flag"], 1 if merge else 0)

    def encode_merge_idx(self, idx: int, max_cands: int) -> None:
        """merge_idx (spec 9.3.3.x): TR binarization cMax = max_cands-1;
        first bin ctx-coded, remaining bins bypass."""
        if max_cands <= 1:
            return
        self.cabac.encode_bin(T.CTX_OFF["merge_idx"], 1 if idx > 0 else 0)
        for k in range(1, min(idx + 1, max_cands - 1)):
            self.cabac.encode_bypass(0 if idx == k else 1)

    def encode_mvd(self, mvdx: int, mvdy: int) -> None:
        """mvd_coding (spec 7.3.8.9): greater0/1 flags, EG1 remainder, sign."""
        c = self.cabac
        ax, ay = abs(mvdx), abs(mvdy)
        c.encode_bin(T.CTX_OFF["mvd"], 1 if ax else 0)
        c.encode_bin(T.CTX_OFF["mvd"], 1 if ay else 0)
        if ax:
            c.encode_bin(T.CTX_OFF["mvd"] + 1, 1 if ax > 1 else 0)
        if ay:
            c.encode_bin(T.CTX_OFF["mvd"] + 1, 1 if ay > 1 else 0)
        for v, a in ((mvdx, ax), (mvdy, ay)):
            if a > 1:
                self._encode_eg1(a - 2)
            if a:
                c.encode_bypass(1 if v < 0 else 0)

    def encode_cu_qp_delta(self, delta: int) -> None:
        """cu_qp_delta_abs + sign (7.3.8.10): TR prefix cMax=5 (bin 0 ctx
        +0, bins 1-4 ctx +1, Table 9-37), EG0 bypass suffix for abs >= 5,
        bypass sign."""
        c = self.cabac
        a = abs(delta)
        base = T.CTX_OFF["cu_qp_delta_abs"]
        c.encode_bin(base, 1 if a > 0 else 0)
        if not a:
            return
        for _ in range(min(a, 5) - 1):
            c.encode_bin(base + 1, 1)
        if a < 5:
            c.encode_bin(base + 1, 0)
        else:
            self._encode_eg0(a - 5)
        c.encode_bypass(1 if delta < 0 else 0)

    def _encode_eg0(self, v: int) -> None:
        """0th-order exp-Golomb, bypass (cu_qp_delta_abs suffix)."""
        c = self.cabac
        length = 0
        while v >= (1 << length):
            c.encode_bypass(1)
            v -= 1 << length
            length += 1
        c.encode_bypass(0)
        if length:
            c.encode_bypass_bits(v, length)

    def _encode_eg1(self, v: int) -> None:
        """1st-order exp-Golomb, bypass (abs_mvd_minus2 binarization)."""
        c = self.cabac
        length = 1
        while v >= (1 << length):
            c.encode_bypass(1)
            v -= 1 << length
            length += 1
        c.encode_bypass(0)
        c.encode_bypass_bits(v, length)

    def encode_mvp_flag(self, idx: int) -> None:
        self.cabac.encode_bin(T.CTX_OFF["mvp_flag"], idx)

    def encode_inter_pred_idc(self, direction: int, depth: int = 0) -> None:
        """inter_pred_idc for a 2Nx2N PU (9.3.3.8): direction 0 = PRED_L0,
        1 = PRED_L1, 2 = PRED_BI.  First bin ctx = CU quadtree depth
        (spec Table 9-41)."""
        c = self.cabac
        c.encode_bin(T.CTX_OFF["inter_pred_idc"] + depth, 1 if direction == 2
                     else 0)
        if direction != 2:
            c.encode_bin(T.CTX_OFF["inter_pred_idc"] + 4, direction)

    def encode_rqt_root_cbf(self, cbf: int) -> None:
        self.cabac.encode_bin(T.CTX_OFF["rqt_root_cbf"], cbf)

    def encode_end_of_slice(self, last: bool) -> None:
        self.cabac.encode_terminate(1 if last else 0)

    # ---- SAO (spec 7.3.8.3) ---------------------------------------------------
    def encode_sao_ctu(self, p_y, p_c, left_avail: bool, up_avail: bool,
                       bit_depth: int = 8) -> None:
        """One CTU's SAO params.  p_y: None | (type, aux, off[4]);
        p_c: None | (type, aux, off_cb[4], off_cr[4]) with shared chroma
        type/class (aux = eo_class or (pos_cb, pos_cr)).  This encoder never
        uses merge (flags coded 0)."""
        c = self.cabac
        if left_avail:
            c.encode_bin(T.CTX_OFF["sao_merge"], 0)
        if up_avail:
            c.encode_bin(T.CTX_OFF["sao_merge"], 0)
        cmax = (1 << (min(bit_depth, 10) - 5)) - 1
        self._sao_type(p_y)
        if p_y is not None:
            self._sao_offsets(p_y[2], band=p_y[0] == 1, cmax=cmax)
            if p_y[0] == 1:
                c.encode_bypass_bits(p_y[1], 5)     # sao_band_position
            else:
                c.encode_bypass_bits(p_y[1], 2)     # sao_eo_class_luma
        self._sao_type(p_c)
        if p_c is not None:
            band = p_c[0] == 1
            self._sao_offsets(p_c[2], band=band, cmax=cmax)
            if band:
                c.encode_bypass_bits(p_c[1][0], 5)
            else:
                c.encode_bypass_bits(p_c[1], 2)     # sao_eo_class_chroma
            self._sao_offsets(p_c[3], band=band,    # cr (type/class inherited)
                              cmax=cmax)
            if band:
                c.encode_bypass_bits(p_c[1][1], 5)
        return

    def _sao_type(self, p) -> None:
        c = self.cabac
        if p is None:
            c.encode_bin(T.CTX_OFF["sao_type_idx"], 0)
        else:
            c.encode_bin(T.CTX_OFF["sao_type_idx"], 1)
            c.encode_bypass(1 if p[0] == 2 else 0)  # TR: 1=band, 2=edge

    def _sao_offsets(self, offs, band: bool, cmax: int = 7) -> None:
        """4x sao_offset_abs (TR bypass, cMax bit-depth dependent) + signs
        for band offsets."""
        c = self.cabac
        for o in offs:
            a = abs(int(o))
            for k in range(a + 1 if a < cmax else cmax):  # no stop bin at cMax
                c.encode_bypass(1 if k < a else 0)
        if band:
            for o in offs:
                if o:
                    c.encode_bypass(1 if o < 0 else 0)

    # ---- residual coding (spec 7.3.8.11) -------------------------------------
    def encode_residual(self, coeffs: np.ndarray, log2_size: int,
                        scan_idx: int, c_idx: int) -> None:
        """Encode one TB's quantized coefficients. cbf must be 1 (some nonzero)."""
        c = self.cabac
        n = 1 << log2_size
        scan = T.scan_order(scan_idx, n)            # (n*n, 2) (x, y)
        sb_scan = T.scan_order(scan_idx, n >> 2) if n > 4 else np.zeros((1, 2), np.int32)
        num_sb = (n * n) >> 4

        vals = coeffs[scan[:, 1], scan[:, 0]]        # coeff values in scan order
        nz = np.nonzero(vals)[0]
        assert nz.size > 0, "encode_residual called with all-zero TB"
        last_pos = int(nz[-1])

        # --- last significant coefficient position ---
        last_x, last_y = int(scan[last_pos, 0]), int(scan[last_pos, 1])
        if scan_idx == T.SCAN_VERT:
            last_x, last_y = last_y, last_x
        self._encode_last(last_x, last_y, log2_size, c_idx)

        # --- sub-block significance map ---
        # sb index (in sub-block scan order) for each scan position
        last_sb = last_pos >> 4
        sb_coded = np.zeros(num_sb, dtype=np.int32)
        for i in range(last_sb + 1):
            if np.any(vals[i * 16:(i + 1) * 16]):
                sb_coded[i] = 1
        sb_coded[0] = 1
        sb_coded[last_sb] = 1

        # csbf position lookup: sub-block (xS, yS) -> coded flag, for ctx derivation
        sb_pos = np.zeros((max(n >> 2, 1), max(n >> 2, 1)), dtype=np.int32)
        if n > 4:
            for i in range(num_sb):
                xs, ys = int(sb_scan[i, 0]), int(sb_scan[i, 1])
                sb_pos[ys, xs] = sb_coded[i]

        c1 = 1
        for i in range(last_sb, -1, -1):
            sub = vals[i * 16:(i + 1) * 16]
            if n > 4:
                xs, ys = int(sb_scan[i, 0]), int(sb_scan[i, 1])
                csbf_right = int(sb_pos[ys, xs + 1]) if xs + 1 < (n >> 2) else 0
                csbf_below = int(sb_pos[ys + 1, xs]) if ys + 1 < (n >> 2) else 0
            else:
                xs = ys = csbf_right = csbf_below = 0

            infer_dc_sig = False
            if 0 < i < last_sb:
                ctx = T.CTX_OFF["csbf"] + (2 if c_idx else 0) + \
                    min(csbf_right + csbf_below, 1)
                c.encode_bin(ctx, int(sb_coded[i]))
                infer_dc_sig = True
            if not sb_coded[i]:
                continue

            # significance flags
            start = (last_pos & 15) - 1 if i == last_sb else 15
            sig_positions = []          # scan positions within sb, descending
            if i == last_sb:
                sig_positions.append(last_pos & 15)
            for ns in range(start, -1, -1):
                coded_here = ns > 0 or not infer_dc_sig
                sig = int(sub[ns] != 0)
                if coded_here:
                    gpos = i * 16 + ns
                    xc, yc = int(scan[gpos, 0]), int(scan[gpos, 1])
                    ctx_inc = T.sig_ctx_inc(log2_size, scan_idx, xc, yc,
                                            c_idx, csbf_right, csbf_below)
                    c.encode_bin(T.CTX_OFF["sig"] + ctx_inc, sig)
                    if sig:
                        infer_dc_sig = False
                else:
                    sig = 1  # inferred DC significance
                if sig:
                    sig_positions.append(ns)

            abs_vals = [int(abs(sub[p])) for p in sig_positions]
            signs = [1 if sub[p] < 0 else 0 for p in sig_positions]
            num_nz = len(abs_vals)
            if num_nz == 0:
                continue  # inferred-coded DC sub-block with no coeffs: c1 carries

            # greater1 flags (first 8)
            ctx_set = (2 if (i > 0 and c_idx == 0) else 0) + (1 if c1 == 0 else 0)
            c1 = 1
            g1_base = T.CTX_OFF["gt1"] + (16 if c_idx else 0) + 4 * ctx_set
            first_g1_idx = -1
            for k in range(min(8, num_nz)):
                g1 = int(abs_vals[k] > 1)
                c.encode_bin(g1_base + c1, g1)
                if g1:
                    c1 = 0
                    if first_g1_idx < 0:
                        first_g1_idx = k
                elif 0 < c1 < 3:
                    c1 += 1

            # greater2 flag (first coeff with g1 == 1)
            if first_g1_idx >= 0:
                ctx = T.CTX_OFF["gt2"] + (4 if c_idx else 0) + ctx_set
                c.encode_bin(ctx, int(abs_vals[first_g1_idx] > 2))

            # signs; with sign-data hiding the firstSigScanPos sign (the
            # LAST of this reverse-scan list) is omitted when the
            # sub-block's significant span exceeds 3 — the quantizer's
            # sdh_fixup guarantees the decoder's parity inference matches
            sign_hidden = self.sdh and \
                (sig_positions[0] - sig_positions[-1]) > 3
            if sign_hidden:
                assert (sum(abs_vals) & 1) == signs[-1], \
                    "sdh parity violated: quantizer fixup missing"
            for s in (signs[:-1] if sign_hidden else signs):
                c.encode_bypass(s)

            # remaining levels
            rice = 0
            first_coeff2 = 1
            for k in range(num_nz):
                base = (2 + first_coeff2) if k < 8 else 1
                if abs_vals[k] >= base:
                    self._encode_remaining(abs_vals[k] - base, rice)
                    if abs_vals[k] > (3 << rice):
                        rice = min(rice + 1, 4)
                if abs_vals[k] >= 2:
                    first_coeff2 = 0

    def _encode_last(self, x: int, y: int, log2_size: int, c_idx: int) -> None:
        c = self.cabac
        gmax = (log2_size << 1) - 1
        for coord, tbl in ((x, "last_x"), (y, "last_y")):
            prefix = self._last_prefix(coord)
            for b in range(min(prefix + 1, gmax)):
                ctx = T.CTX_OFF[tbl] + T.last_prefix_ctx(log2_size, c_idx, b)
                c.encode_bin(ctx, 1 if b < prefix else 0)
        for coord in (x, y):
            prefix = self._last_prefix(coord)
            if prefix > 3:
                nbits = (prefix >> 1) - 1
                suffix = coord - ((2 + (prefix & 1)) << nbits)
                c.encode_bypass_bits(suffix, nbits)

    @staticmethod
    def _last_prefix(coord: int) -> int:
        """Map last position coordinate -> TR prefix value (spec Table 9-48).

        prefix 0..3 <-> coord 0..3; prefix >= 4: coord in
        [(2+(prefix&1)) << ((prefix>>1)-1), ...), suffix (prefix>>1)-1 bits.
        """
        if coord <= 3:
            return coord
        bl = coord.bit_length()           # coord in [2^(bl-1), 2^bl)
        return 2 * (bl - 1) + (1 if coord >= (3 << (bl - 2)) else 0)

    def _encode_remaining(self, value: int, rice: int) -> None:
        """coeff_abs_level_remaining: Golomb-Rice + exp-Golomb escape (9.3.3.13)."""
        c = self.cabac
        if (value >> rice) < 3:
            length = value >> rice
            c.encode_bypass_bits((1 << (length + 1)) - 2, length + 1)
            if rice:
                c.encode_bypass_bits(value & ((1 << rice) - 1), rice)
        else:
            length = rice
            value -= 3 << rice
            while value >= (1 << length):
                value -= 1 << length
                length += 1
            c.encode_bypass_bits((1 << (3 + length + 1 - rice)) - 2,
                                 3 + length + 1 - rice)
            if length:
                c.encode_bypass_bits(value, length)
