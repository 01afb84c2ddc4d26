"""HEVC slice-data syntax decoding — mirror of hevc_tpu.entropy.syntax.

Used by the in-framework conformance decoder (the AppleHEVCValidator
equivalent, see SURVEY.md C12): every bitstream this framework emits is decoded
back and the reconstruction compared bit-exactly against the encoder's.
"""
from __future__ import annotations

import numpy as np

from hevc_tpu.entropy import tables as T
from hevc_tpu.entropy.cabac import CabacDecoder


class SliceSyntaxDecoder:
    """Decodes intra-slice CTU syntax from CABAC bins."""

    def __init__(self, data: bytes, qp: int, init_type: int = 0,
                 sdh: bool = False):
        self.cabac = CabacDecoder(data, qp, init_type)
        self.sdh = sdh              # pps.sign_data_hiding_enabled_flag

    # ---- intra mode signaling ----------------------------------------------
    def decode_luma_mode(self, cands: list[int]) -> int:
        c = self.cabac
        if c.decode_bin(T.CTX_OFF["prev_intra_luma_pred"]):
            idx = 0
            if c.decode_bypass():
                idx = 1 + c.decode_bypass()
            return cands[idx]
        rem = c.decode_bypass_bits(5)
        mode = rem
        for cand in sorted(cands):
            if mode >= cand:
                mode += 1
        return mode

    def decode_chroma_mode_is_dm(self) -> bool:
        """Returns True if intra_chroma_pred_mode == 4 (derived mode)."""
        if self.cabac.decode_bin(T.CTX_OFF["intra_chroma_pred_mode"]) == 0:
            return True
        self.cabac.decode_bypass_bits(2)
        return False

    def decode_cbf_luma(self, trafo_depth: int) -> int:
        ctx = T.CTX_OFF["cbf_luma"] + (1 if trafo_depth == 0 else 0)
        return self.cabac.decode_bin(ctx)

    def decode_cbf_chroma(self, trafo_depth: int) -> int:
        return self.cabac.decode_bin(T.CTX_OFF["cbf_chroma"] + trafo_depth)

    def decode_part_mode_intra(self) -> bool:
        """Returns True for PART_NxN."""
        return self.cabac.decode_bin(T.CTX_OFF["part_mode"]) == 0

    def decode_cu_skip(self, left_skip: int, above_skip: int) -> int:
        return self.cabac.decode_bin(
            T.CTX_OFF["cu_skip"] + left_skip + above_skip)

    def decode_pred_mode_is_intra(self) -> bool:
        return self.cabac.decode_bin(T.CTX_OFF["pred_mode"]) == 1

    def decode_part_mode_inter_is_2nx2n(self) -> bool:
        return self.cabac.decode_bin(T.CTX_OFF["part_mode"]) == 1

    def decode_merge_flag(self) -> bool:
        return self.cabac.decode_bin(T.CTX_OFF["merge_flag"]) == 1

    def decode_merge_idx(self, max_cands: int) -> int:
        """merge_idx: TR cMax = max_cands-1, first bin ctx, rest bypass."""
        if max_cands <= 1:
            return 0
        if self.cabac.decode_bin(T.CTX_OFF["merge_idx"]) == 0:
            return 0
        idx = 1
        while idx < max_cands - 1 and self.cabac.decode_bypass():
            idx += 1
        return idx

    def decode_mvd(self) -> tuple[int, int]:
        c = self.cabac
        g0x = c.decode_bin(T.CTX_OFF["mvd"])
        g0y = c.decode_bin(T.CTX_OFF["mvd"])
        g1x = c.decode_bin(T.CTX_OFF["mvd"] + 1) if g0x else 0
        g1y = c.decode_bin(T.CTX_OFF["mvd"] + 1) if g0y else 0
        out = []
        for g0, g1 in ((g0x, g1x), (g0y, g1y)):
            if not g0:
                out.append(0)
                continue
            a = (2 + self._decode_eg1()) if g1 else 1
            out.append(-a if c.decode_bypass() else a)
        return out[0], out[1]

    def decode_cu_qp_delta(self) -> int:
        """cu_qp_delta_abs + sign (7.3.8.10): TR cMax=5 prefix (bin 0 ctx
        +0, bins 1-4 ctx +1), EG0 bypass suffix, bypass sign."""
        c = self.cabac
        base = T.CTX_OFF["cu_qp_delta_abs"]
        if not c.decode_bin(base):
            return 0
        a = 1
        while a < 5 and c.decode_bin(base + 1):
            a += 1
        if a == 5:
            a += self._decode_eg0()
        return -a if c.decode_bypass() else a

    def _decode_eg0(self) -> int:
        c = self.cabac
        length = 0
        v = 0
        while c.decode_bypass():
            v += 1 << length
            length += 1
            if length > 30:
                raise ValueError("corrupt cu_qp_delta_abs")
        return v + (c.decode_bypass_bits(length) if length else 0)

    def _decode_eg1(self) -> int:
        c = self.cabac
        length = 1
        v = 0
        while c.decode_bypass():
            v += 1 << length
            length += 1
            if length > 30:
                raise ValueError("corrupt abs_mvd_minus2")
        return v + c.decode_bypass_bits(length)

    def decode_mvp_flag(self) -> int:
        return self.cabac.decode_bin(T.CTX_OFF["mvp_flag"])

    def decode_inter_pred_idc(self, depth: int = 0) -> int:
        """0 = PRED_L0, 1 = PRED_L1, 2 = PRED_BI for a 2Nx2N PU.

        First bin ctx = the CU's quadtree depth (spec Table 9-41)."""
        if self.cabac.decode_bin(T.CTX_OFF["inter_pred_idc"] + depth):
            return 2
        return self.cabac.decode_bin(T.CTX_OFF["inter_pred_idc"] + 4)

    def decode_rqt_root_cbf(self) -> int:
        return self.cabac.decode_bin(T.CTX_OFF["rqt_root_cbf"])

    def decode_end_of_slice(self) -> int:
        return self.cabac.decode_terminate()

    # ---- SAO (spec 7.3.8.3) ---------------------------------------------------
    def decode_sao_ctu(self, left_avail: bool, up_avail: bool,
                       bit_depth: int = 8):
        """Returns ('merge_left'|'merge_up') or (p_y, p_c) — see the encoder
        mirror for the parameter tuple layout."""
        c = self.cabac
        if left_avail and c.decode_bin(T.CTX_OFF["sao_merge"]):
            return "merge_left"
        if up_avail and c.decode_bin(T.CTX_OFF["sao_merge"]):
            return "merge_up"
        p_y = p_c = None
        cmax = (1 << (min(bit_depth, 10) - 5)) - 1
        ty = self._sao_type()
        if ty:
            offs = self._sao_offsets(band=ty == 1, cmax=cmax)
            aux = c.decode_bypass_bits(5 if ty == 1 else 2)
            if ty == 2:
                offs = [offs[0], offs[1], -offs[2], -offs[3]]
            p_y = (ty, aux, offs)
        tc_ = self._sao_type()
        if tc_:
            band = tc_ == 1
            offs_cb = self._sao_offsets(band=band, cmax=cmax)
            if band:
                pos_cb = c.decode_bypass_bits(5)
            else:
                cls = c.decode_bypass_bits(2)
            offs_cr = self._sao_offsets(band=band, cmax=cmax)
            if band:
                pos_cr = c.decode_bypass_bits(5)
                p_c = (tc_, (pos_cb, pos_cr), offs_cb, offs_cr)
            else:
                offs_cb = [offs_cb[0], offs_cb[1], -offs_cb[2], -offs_cb[3]]
                offs_cr = [offs_cr[0], offs_cr[1], -offs_cr[2], -offs_cr[3]]
                p_c = (tc_, cls, offs_cb, offs_cr)
        return (p_y, p_c)

    def _sao_type(self) -> int:
        c = self.cabac
        if not c.decode_bin(T.CTX_OFF["sao_type_idx"]):
            return 0
        return 2 if c.decode_bypass() else 1

    def _sao_offsets(self, band: bool, cmax: int = 7) -> list[int]:
        c = self.cabac
        offs = []
        for _ in range(4):
            a = 0
            while a < cmax and c.decode_bypass():
                a += 1
            offs.append(a)
        if band:
            offs = [(-a if a and c.decode_bypass() else a) for a in offs]
        return offs

    # ---- residual coding ------------------------------------------------------
    def decode_residual(self, log2_size: int, scan_idx: int,
                        c_idx: int) -> np.ndarray:
        c = self.cabac
        n = 1 << log2_size
        scan = T.scan_order(scan_idx, n)
        sb_scan = T.scan_order(scan_idx, n >> 2) if n > 4 else np.zeros((1, 2), np.int32)
        num_sb = (n * n) >> 4

        px = self._decode_last_prefix(log2_size, c_idx, "last_x")
        py = self._decode_last_prefix(log2_size, c_idx, "last_y")
        last_x = self._resolve_suffix(px)
        last_y = self._resolve_suffix(py)
        if scan_idx == T.SCAN_VERT:
            last_x, last_y = last_y, last_x

        # find last scan pos from (last_x, last_y)
        pos_of = {(int(scan[i, 0]), int(scan[i, 1])): i for i in range(n * n)}
        last_pos = pos_of[(last_x, last_y)]
        last_sb = last_pos >> 4

        vals = np.zeros(n * n, dtype=np.int32)
        sb_pos = np.zeros((max(n >> 2, 1), max(n >> 2, 1)), dtype=np.int32)
        c1 = 1
        for i in range(last_sb, -1, -1):
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
                coded = c.decode_bin(ctx)
                infer_dc_sig = True
            else:
                coded = 1
            if n > 4:
                sb_pos[ys, xs] = coded
            if not coded:
                continue

            sig_positions = []
            if i == last_sb:
                sig_positions.append(last_pos & 15)
            start = (last_pos & 15) - 1 if i == last_sb else 15
            for ns in range(start, -1, -1):
                if ns > 0 or not infer_dc_sig:
                    gpos = i * 16 + ns
                    xc, yc = int(scan[gpos, 0]), int(scan[gpos, 1])
                    ctx_inc = T.sig_ctx_inc(log2_size, scan_idx, xc, yc,
                                            c_idx, csbf_right, csbf_below)
                    sig = c.decode_bin(T.CTX_OFF["sig"] + ctx_inc)
                    if sig:
                        infer_dc_sig = False
                        sig_positions.append(ns)
                else:
                    sig_positions.append(ns)  # inferred DC significance

            num_nz = len(sig_positions)
            if num_nz == 0:
                continue

            ctx_set = (2 if (i > 0 and c_idx == 0) else 0) + (1 if c1 == 0 else 0)
            c1 = 1
            g1_base = T.CTX_OFF["gt1"] + (16 if c_idx else 0) + 4 * ctx_set
            levels = [1] * num_nz
            first_g1_idx = -1
            for k in range(min(8, num_nz)):
                g1 = c.decode_bin(g1_base + c1)
                if g1:
                    levels[k] = 2
                    c1 = 0
                    if first_g1_idx < 0:
                        first_g1_idx = k
                elif 0 < c1 < 3:
                    c1 += 1

            if first_g1_idx >= 0:
                ctx = T.CTX_OFF["gt2"] + (4 if c_idx else 0) + ctx_set
                levels[first_g1_idx] += c.decode_bin(ctx)

            # sign of the firstSigScanPos coefficient is hidden when the
            # sub-block's significant span exceeds 3 (spec 7.4.9.11): it
            # is inferred from the parity of the level sum, parsed below
            sign_hidden = self.sdh and \
                (sig_positions[0] - sig_positions[-1]) > 3
            signs = [c.decode_bypass()
                     for _ in range(num_nz - (1 if sign_hidden else 0))]

            rice = 0
            first_coeff2 = 1
            for k in range(num_nz):
                base = (2 + first_coeff2) if k < 8 else 1
                if levels[k] == base:
                    rem = self._decode_remaining(rice)
                    levels[k] = base + rem
                    if levels[k] > (3 << rice):
                        rice = min(rice + 1, 4)
                if levels[k] >= 2:
                    first_coeff2 = 0

            if sign_hidden:
                signs.append(1 if (sum(levels) & 1) else 0)

            for k, ns in enumerate(sig_positions):
                gpos = i * 16 + ns
                vals[gpos] = -levels[k] if signs[k] else levels[k]

        out = np.zeros((n, n), dtype=np.int32)
        out[scan[:, 1], scan[:, 0]] = vals
        return out

    def _decode_last_prefix(self, log2_size: int, c_idx: int, tbl: str) -> int:
        c = self.cabac
        gmax = (log2_size << 1) - 1
        prefix = 0
        while prefix < gmax:
            ctx = T.CTX_OFF[tbl] + T.last_prefix_ctx(log2_size, c_idx, prefix)
            if not c.decode_bin(ctx):
                break
            prefix += 1
        return prefix

    def _resolve_suffix(self, prefix: int) -> int:
        if prefix <= 3:
            return prefix
        nbits = (prefix >> 1) - 1
        suffix = self.cabac.decode_bypass_bits(nbits)
        return ((2 + (prefix & 1)) << nbits) + suffix

    def _decode_remaining(self, rice: int) -> int:
        c = self.cabac
        prefix = 0
        while c.decode_bypass():
            prefix += 1
            if prefix > 40:
                raise ValueError("corrupt coeff_abs_level_remaining")
        if prefix < 3:
            return (prefix << rice) + (c.decode_bypass_bits(rice) if rice else 0)
        length = rice + prefix - 3
        rem = c.decode_bypass_bits(length) if length else 0
        return (3 << rice) + (1 << length) - (1 << rice) + rem
