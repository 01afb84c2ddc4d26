"""In-framework HEVC decoder (conformance half of the validator).

General decoder: arbitrary CTB size (16/32/64), full coding quadtree,
PART_2Nx2N / PART_NxN intra PUs, P and B inter CUs (merge/AMVP, fractional
MVs, bi-prediction), residual quadtree, 4x4 DST, all 35 intra modes, tiles,
and in-loop filters (deblocking + SAO applied to the reconstruction).

Dual role:
  * validator: every bitstream we emit is decoded back and compared bit-exactly
    with the encoder's reconstruction (AppleHEVCValidator parity, SURVEY C12).
  * entropy test vectors: decodes constrained libx265 streams, pinning this
    implementation to the real spec (tests/test_conformance.py).
"""
from __future__ import annotations

import numpy as np

from hevc_tpu.decoder.syntax import SliceSyntaxDecoder
from hevc_tpu.decoder.headers import Sps, Pps, SliceHeader, parse_sps, \
    parse_pps, parse_slice_header
from hevc_tpu.entropy.syntax import mpm_candidates, INTRA_DC
from hevc_tpu.entropy import tables as T
from hevc_tpu.ops import reference as R
from hevc_tpu.utils.bitio import ebsp_to_rbsp, split_annexb


class IntraDecoder:
    def __init__(self, sps: Sps, pps: Pps):
        self.sps = sps
        self.pps = pps
        # cu_qp_delta: QG = CTB only (diff depth 0), intra slices — the
        # shapes this framework's AQ emits (encoder/reference_encoder.py)
        assert not pps.cu_qp_delta_enabled or \
            pps.diff_cu_qp_delta_depth == 0, \
            "cu_qp_delta with sub-CTB quantization groups unsupported"
        assert not pps.transform_skip, "transform skip unsupported (v0)"
        assert not pps.constrained_intra, "constrained intra unsupported"
        self.W = sps.pic_width
        self.H = sps.pic_height
        self.ctb = 1 << sps.log2_ctb

    # ---- z-scan availability ------------------------------------------------
    def _zidx(self, x: int, y: int) -> int:
        l2 = self.sps.log2_ctb
        ctbs_w = (self.W + self.ctb - 1) >> l2
        cidx = (y >> l2) * ctbs_w + (x >> l2)
        ux = (x & (self.ctb - 1)) >> 2
        uy = (y & (self.ctb - 1)) >> 2
        m = 0
        for b in range(4):
            m |= ((ux >> b) & 1) << (2 * b)
            m |= ((uy >> b) & 1) << (2 * b + 1)
        return (cidx << (2 * (l2 - 2))) | m

    def _avail(self, xc: int, yc: int, xn: int, yn: int) -> bool:
        if xn < 0 or yn < 0 or xn >= self.W or yn >= self.H:
            return False
        return self._zidx(xn, yn) < self._zidx(xc, yc)

    # ---- reference sample construction (8.4.4.2.2) ---------------------------
    def _build_ref(self, plane: np.ndarray, x0: int, y0: int, n: int,
                   c_idx: int) -> np.ndarray:
        """Reference array layout as ops.reference.build_reference."""
        sub = 2 if c_idx else 1     # chroma coords are in chroma units
        xl = x0 * sub
        yl = y0 * sub
        h, w = plane.shape
        n2 = 2 * n
        ref = np.full(4 * n + 1, -1, dtype=np.int64)
        # left column downwards: ref[n2-1-k] = p[-1][k]
        for k in range(n2):
            yk = y0 + k
            if yk < h and self._avail(xl, yl, xl - sub, yk * sub):
                ref[n2 - 1 - k] = plane[yk, x0 - 1]
        if self._avail(xl, yl, xl - sub, yl - sub):
            ref[n2] = plane[y0 - 1, x0 - 1]
        for k in range(n2):
            xk = x0 + k
            if xk < w and self._avail(xl, yl, xk * sub, yl - sub):
                ref[n2 + 1 + k] = plane[y0 - 1, xk]
        if np.all(ref < 0):
            ref[:] = 1 << (self.sps.bit_depth - 1)
        else:
            if ref[0] < 0:
                nz = np.nonzero(ref >= 0)[0][0]
                ref[0] = ref[nz]
            for k in range(1, 4 * n + 1):
                if ref[k] < 0:
                    ref[k] = ref[k - 1]
        return ref.astype(np.int32)

    def _predict(self, plane: np.ndarray, x0: int, y0: int, n: int,
                 mode: int, c_idx: int) -> np.ndarray:
        ref = self._build_ref(plane, x0, y0, n, c_idx)
        if c_idx == 0 and R.use_filtered_ref(mode, n, 0):
            if n == 32 and self.sps.strong_intra_smoothing:
                ref = self._strong_smooth(ref, n)
            else:
                ref = R.filter_reference(ref, n)
        return R.predict_intra(ref, mode, n, c_idx, self.sps.bit_depth)

    def _strong_smooth(self, ref: np.ndarray, n: int) -> np.ndarray:
        """Strong intra smoothing for 32x32 (spec 8.4.4.2.3)."""
        bd = self.sps.bit_depth
        n2 = 2 * n
        corner, top0, topn2 = int(ref[n2]), int(ref[n2 + 1]), int(ref[4 * n])
        left0, leftn2 = int(ref[n2 - 1]), int(ref[0])
        thr = 1 << (bd - 5)
        flat_top = abs(corner + topn2 - 2 * int(ref[n2 + n])) < thr
        flat_left = abs(corner + leftn2 - 2 * int(ref[n])) < thr
        if not (flat_top and flat_left):
            return R.filter_reference(ref, n)
        out = ref.copy()
        # pF[x][-1] = ((63-x)*p[-1][-1] + (x+1)*p[63][-1] + 32) >> 6
        for x in range(n2 - 1):
            out[n2 + 1 + x] = ((63 - x) * corner + (x + 1) * topn2 + 32) >> 6
        for y in range(n2 - 1):
            out[n2 - 1 - y] = ((63 - y) * corner + (y + 1) * leftn2 + 32) >> 6
        return out

    # ---- slice decode ---------------------------------------------------------
    def decode_slice(self, payload: bytes, hdr: SliceHeader,
                     expect_end: bool = True, ref: dict | None = None,
                     off: tuple[int, int] = (0, 0),
                     ref1: dict | None = None,
                     pocs: tuple | None = None,
                     colctx: dict | None = None) -> dict:
        qp_bd = 6 * (self.sps.bit_depth - 8)   # Qp' = Qp + QpBdOffset (8.6.3)
        self._qp_bd = qp_bd
        self._set_qg_qp(hdr.qp)
        self.qp_pred = hdr.qp      # qPY_PREV, reset at slice/tile start
        self.qg_coded = False
        self.y = np.zeros((self.H, self.W), dtype=np.int32)
        self.cb = np.zeros((self.H // 2, self.W // 2), dtype=np.int32)
        self.cr = np.zeros((self.H // 2, self.W // 2), dtype=np.int32)
        self.modes = np.full((self.H // 4, self.W // 4), INTRA_DC, np.int32)
        self.depth_map = np.zeros((self.H // 4, self.W // 4), np.int32)
        self.part_map = np.zeros(((self.H + self.ctb - 1) // self.ctb,
                                  (self.W + self.ctb - 1) // self.ctb), bool)
        self.skip4 = np.zeros((self.H // 4, self.W // 4), np.int32)
        self.skip_map = np.zeros_like(self.part_map)
        # motion/cbf maps at 16-granularity (the deblock bS grid); CUs
        # larger than 16 fan their record out over all covered cells
        nh16 = (self.H + 15) // 16
        nw16 = (self.W + 15) // 16
        self.inter_map = np.zeros((nh16, nw16), bool)
        self.mv_map = np.zeros((nh16, nw16, 2), np.int32)
        self.mv1_map = np.zeros((nh16, nw16, 2), np.int32)
        self.pf_map = np.zeros((nh16, nw16, 2), np.int32)
        self.cbf_map = np.zeros((nh16, nw16), bool)
        self.p_slice = hdr.slice_type in (0, 1)
        self.b_slice = hdr.slice_type == 0
        # explicit P-slice weights (pred_weight_table); B slices keep
        # default weighting (weighted_bipred_flag is never set here)
        self.wp = getattr(hdr, "wp", None) if hdr.slice_type == 1 else None
        self.ref = ref              # L0 reference picture (full, uncropped)
        self.ref1 = ref1            # L1 reference picture (B slices)
        self.pocs = pocs or (0, 0, None)   # (cur, poc_l0, poc_l1)
        self.rec_map = [[None] * nw16 for _ in range(nh16)]
        self.off = off              # this tile's (x, y) offset in the picture
        # TMVP context: GLOBAL col-picture motion field + per-list
        # distScaleFactors (None when slice_temporal_mvp off or col is I)
        self.colctx = colctx
        self.max_merge = hdr.max_merge_cand
        assert not self.p_slice or ref is not None, "P slice needs a ref pic"
        assert not self.b_slice or ref1 is not None, "B slice needs L1 ref"
        self.syn = SliceSyntaxDecoder(payload, hdr.qp, hdr.init_type,
                                      sdh=self.pps.sign_data_hiding)
        ctbs_w = (self.W + self.ctb - 1) // self.ctb
        ctbs_h = (self.H + self.ctb - 1) // self.ctb
        use_sao = self.sps.sao_enabled and (hdr.sao_luma or hdr.sao_chroma)
        self.sao_y = [[None] * ctbs_w for _ in range(ctbs_h)]
        self.sao_c = [[None] * ctbs_w for _ in range(ctbs_h)]
        aq = self.pps.cu_qp_delta_enabled
        assert not (aq and self.p_slice), \
            "cu_qp_delta in P/B slices unsupported"
        for cy in range(ctbs_h):
            for cx in range(ctbs_w):
                if aq:
                    # new quantization group (QG = CTB): QP predicts
                    # from the previous QG until a delta is parsed
                    self.qg_coded = False
                    self._set_qg_qp(self.qp_pred)
                if use_sao:
                    p = self.syn.decode_sao_ctu(cx > 0, cy > 0,
                                                self.sps.bit_depth)
                    if p == "merge_left":
                        p = (self.sao_y[cy][cx - 1], self.sao_c[cy][cx - 1])
                    elif p == "merge_up":
                        p = (self.sao_y[cy - 1][cx], self.sao_c[cy - 1][cx])
                    self.sao_y[cy][cx], self.sao_c[cy][cx] = p
                self._coding_quadtree(cx * self.ctb, cy * self.ctb,
                                      self.sps.log2_ctb)
                if aq:
                    self.qp_pred = self.cur_qpy   # qPY_PREV for next QG
                last = (cy == ctbs_h - 1) and (cx == ctbs_w - 1)
                got = self.syn.decode_end_of_slice()
                assert got == (1 if (last and expect_end) else 0), \
                    f"end_of_slice mismatch at CTB ({cx},{cy})"
                if last and not expect_end:
                    # end_of_subset_one_bit terminates this tile's substream
                    assert self.syn.decode_end_of_slice() == 1, \
                        "missing end_of_subset_one_bit"
        return {"y": self.y, "cb": self.cb, "cr": self.cr, "qp": hdr.qp,
                "part_map": self.part_map, "skip_map": self.skip_map,
                "sao": (self.sao_y, self.sao_c),
                "cu_maps": {"intra": ~self.inter_map, "cbf": self.cbf_map,
                            "mv": self.mv_map, "mv1": self.mv1_map,
                            "pf": self.pf_map}}

    def _coding_quadtree(self, x0: int, y0: int, log2size: int) -> None:
        size = 1 << log2size
        inside = (x0 + size <= self.W) and (y0 + size <= self.H)
        if inside and log2size > self.sps.log2_min_cb:
            split = self.syn.cabac.decode_bin(
                T.CTX_OFF["split_cu"] + self._split_ctx(x0, y0, log2size))
        else:
            # implicit split at picture boundary (pic dims multiple of minCB)
            split = 1 if not inside else 0
        if split:
            half = size >> 1
            for dy in (0, half):
                for dx in (0, half):
                    if x0 + dx < self.W and y0 + dy < self.H:
                        self._coding_quadtree(x0 + dx, y0 + dy, log2size - 1)
            return
        self._coding_unit(x0, y0, log2size)

    def _split_ctx(self, x0: int, y0: int, log2size: int) -> int:
        ctx = 0
        depth = self.sps.log2_ctb - log2size
        if self._avail(x0, y0, x0 - 1, y0):
            if self._cu_depth(x0 - 1, y0) > depth:
                ctx += 1
        if self._avail(x0, y0, x0, y0 - 1):
            if self._cu_depth(x0, y0 - 1) > depth:
                ctx += 1
        return ctx

    def _cu_depth(self, x: int, y: int) -> int:
        return int(self.depth_map[y >> 2, x >> 2])

    def _coding_unit(self, x0: int, y0: int, log2size: int) -> None:
        syn = self.syn
        size = 1 << log2size
        if self.p_slice:
            left = int(self.skip4[y0 >> 2, (x0 - 1) >> 2]) \
                if self._avail(x0, y0, x0 - 1, y0) else 0
            above = int(self.skip4[(y0 - 1) >> 2, x0 >> 2]) \
                if self._avail(x0, y0, x0, y0 - 1) else 0
            self.depth_map[y0 >> 2:(y0 + size) >> 2,
                           x0 >> 2:(x0 + size) >> 2] = \
                self.sps.log2_ctb - log2size
            if syn.decode_cu_skip(left, above):
                self.skip4[y0 >> 2:(y0 + size) >> 2,
                           x0 >> 2:(x0 + size) >> 2] = 1
                self.skip_map[y0 >> self.sps.log2_ctb,
                              x0 >> self.sps.log2_ctb] = True
                self._inter_cu(x0, y0, size, merge=True, residual=False)
                return
            if not syn.decode_pred_mode_is_intra():
                assert log2size in (4, 5), \
                    "inter CUs only at 16/32 granularity"
                assert syn.decode_part_mode_inter_is_2nx2n(), \
                    "inter partitions other than 2Nx2N unsupported"
                if syn.decode_merge_flag():
                    self._inter_cu(x0, y0, size, merge=True, residual=True)
                else:
                    self._inter_cu(x0, y0, size, merge=False, residual=True)
                return
        part_nxn = False
        if log2size == self.sps.log2_min_cb:
            part_nxn = syn.decode_part_mode_intra()
        if part_nxn:
            self.part_map[y0 >> self.sps.log2_ctb,
                          x0 >> self.sps.log2_ctb] = True
        self.depth_map[y0 >> 2:(y0 + size) >> 2, x0 >> 2:(x0 + size) >> 2] = \
            self.sps.log2_ctb - log2size

        npb = size >> 1 if part_nxn else size
        pu_xy = [(x0, y0)]
        if part_nxn:
            pu_xy = [(x0, y0), (x0 + npb, y0), (x0, y0 + npb), (x0 + npb, y0 + npb)]
        prev_flags = [syn.cabac.decode_bin(T.CTX_OFF["prev_intra_luma_pred"])
                      for _ in pu_xy]
        modes = []
        for (px, py), pf in zip(pu_xy, prev_flags):
            cands = self._mpm(px, py)
            if pf:
                idx = 0
                if syn.cabac.decode_bypass():
                    idx = 1 + syn.cabac.decode_bypass()
                mode = cands[idx]
            else:
                rem = syn.cabac.decode_bypass_bits(5)
                mode = rem
                for cand in sorted(cands):
                    if mode >= cand:
                        mode += 1
            modes.append(mode)
            self.modes[py >> 2:(py + npb) >> 2, px >> 2:(px + npb) >> 2] = mode
        chroma_mode = self._decode_chroma_mode(modes[0])
        self.cu = {"x0": x0, "y0": y0, "log2": log2size,
                   "part_nxn": part_nxn, "modes": modes,
                   "chroma_mode": chroma_mode}
        max_depth = self.sps.max_trafo_depth_intra + (1 if part_nxn else 0)
        self._transform_tree(x0, y0, x0, y0, log2size, 0, 0,
                             max_depth, 1, 1)

    def _inter_cu(self, x0: int, y0: int, size: int, merge: bool,
                  residual: bool) -> None:
        """Inter CU (CTU = CU = PU, one ref/list): motion + MC + TU.

        merge + residual=False is the skip path (rqt_root_cbf absent);
        merge + residual=True has rqt_root_cbf inferred 1 (7.4.9.5);
        explicit signals [inter_pred_idc in B] + mvd/mvp per list, then
        rqt_root_cbf.
        """
        from hevc_tpu.ops import inter as M
        syn = self.syn
        bd = self.sps.bit_depth
        cy, cx = y0 >> 4, x0 >> 4
        ns = size >> 4                     # CU size in 16-cells (1 or 2)
        nh, nw = self.inter_map.shape
        nbrs = M.neighbor_records_sized(self.rec_map, cy, cx, ns, nh, nw)
        cur_poc, poc0, poc1 = self.pocs
        # temporal (collocated) MV: global-cell walk, spec 8.5.3.2.8
        tm = None
        col_rec = None
        if self.colctx is not None:
            ox_, oy_ = self.off
            gcy, gcx = (oy_ + y0) >> 4, (ox_ + x0) >> 4
            ca, cm = self.colctx["avail"], self.colctx["mv"]
            tm = M.tmvp_col_mv(ca, cm, gcy, gcx, ns, ca.shape[0],
                               ca.shape[1], ctb_cells=self.ctb >> 4)
            if tm is not None:
                dsf0, dsf1 = self.colctx["dsf"]
                if self.b_slice:
                    col_rec = (1, 1, M._scale_col(tm, dsf0),
                               M._scale_col(tm, dsf1))
                else:
                    col_rec = (1, 0, M._scale_col(tm, dsf0), (0, 0))
        if merge:
            midx = syn.decode_merge_idx(self.max_merge)
            cands = M.merge_list_b(nbrs, self.b_slice,
                                   max_cands=self.max_merge, col=col_rec)
            rec_m = cands[midx]
            rqt = 1 if residual else 0
        else:
            direction = syn.decode_inter_pred_idc(
                self.sps.log2_ctb - (size.bit_length() - 1)) \
                if self.b_slice else 0
            mv0 = mv1 = (0, 0)
            cmvp0 = cmvp1 = None
            if tm is not None:
                dsf0, dsf1 = self.colctx["dsf"]
                cmvp0 = M._scale_col(tm, dsf0)
                cmvp1 = M._scale_col(tm, dsf1) if self.b_slice else None
            if direction in (0, 2):
                mvd = syn.decode_mvd()
                mvp_idx = syn.decode_mvp_flag()
                cands = M.amvp_list_b(nbrs, 0, cur_poc, (poc0, poc1),
                                      col_mvp=cmvp0)
                mv0 = (cands[mvp_idx][0] + mvd[0], cands[mvp_idx][1] + mvd[1])
            if direction in (1, 2):
                mvd = syn.decode_mvd()
                mvp_idx = syn.decode_mvp_flag()
                cands = M.amvp_list_b(nbrs, 1, cur_poc, (poc0, poc1),
                                      col_mvp=cmvp1)
                mv1 = (cands[mvp_idx][0] + mvd[0], cands[mvp_idx][1] + mvd[1])
            rec_m = (1 if direction in (0, 2) else 0,
                     1 if direction in (1, 2) else 0, mv0, mv1)
            rqt = syn.decode_rqt_root_cbf()
        pf0, pf1, mv0, mv1 = rec_m
        for qy in range(ns):
            for qx in range(ns):
                self.inter_map[cy + qy, cx + qx] = True
                self.rec_map[cy + qy][cx + qx] = rec_m
                self.mv_map[cy + qy, cx + qx] = mv0 if pf0 else mv1
                self.pf_map[cy + qy, cx + qx] = (pf0, pf1)
                self.mv1_map[cy + qy, cx + qx] = mv1

        # MC against the FULL reference picture(s) (tiles don't bound MC)
        ox, oy = self.off
        cs = size >> 1
        xc, yc = x0 >> 1, y0 >> 1

        def mc_i(refp, mv):
            vy = M.mc_luma_i(refp["y"], ox + x0, oy + y0, size,
                             mv[0], mv[1], bd)
            vcb = M.mc_chroma_i(refp["cb"], (ox >> 1) + xc, (oy >> 1) + yc,
                                cs, mv[0], mv[1], bd)
            vcr = M.mc_chroma_i(refp["cr"], (ox >> 1) + xc, (oy >> 1) + yc,
                                cs, mv[0], mv[1], bd)
            return vy, vcb, vcr

        if pf0 and pf1:
            v0 = mc_i(self.ref, mv0)
            v1 = mc_i(self.ref1, mv1)
            py, pcb, pcr = (M.weight_bi(v0[i], v1[i], bd) for i in range(3))
        else:
            v = mc_i(self.ref if pf0 else self.ref1, mv0 if pf0 else mv1)
            if self.wp is not None:     # explicit P weighting (8.5.3.2.9.3)
                wy, oy, wcb, ocb, wcr, ocr = self.wp
                py = M.weight_uni_w(v[0], wy, oy, bd)
                pcb = M.weight_uni_w(v[1], wcb, ocb, bd)
                pcr = M.weight_uni_w(v[2], wcr, ocr, bd)
            else:
                py, pcb, pcr = (M.weight_uni(v[i], bd) for i in range(3))

        bd = self.sps.bit_depth

        def tu(plane, pred, cbf, c_idx, qpv, px, pyy, n):
            if cbf:
                log2n = n.bit_length() - 1
                lvl = syn.decode_residual(log2n, 0, c_idx)  # diagonal scan
                resi = R.inverse_transform(R.dequantize(lvl, qpv, bd),
                                           bit_depth=bd)
                rec = R.reconstruct(pred, resi, bd)
            else:
                rec = pred
            plane[pyy:pyy + n, px:px + n] = rec

        if size > (1 << self.sps.log2_max_tb) and rqt:
            # forced transform split (log2 CB > max TB, spec 7.3.8.8):
            # parent chroma cbfs at depth 0, then four TU quadrants
            pcbf_cb = syn.decode_cbf_chroma(0)
            pcbf_cr = syn.decode_cbf_chroma(0)
            half = size >> 1
            for q in range(4):
                dqx, dqy = (q & 1) * half, (q >> 1) * half
                cbf_cb_q = syn.decode_cbf_chroma(1) if pcbf_cb else 0
                cbf_cr_q = syn.decode_cbf_chroma(1) if pcbf_cr else 0
                cbf_y_q = syn.decode_cbf_luma(1)
                self.cbf_map[cy + (q >> 1), cx + (q & 1)] = bool(cbf_y_q)
                hc = half >> 1
                tu(self.y, py[dqy:dqy + half, dqx:dqx + half], cbf_y_q, 0,
                   self.qp, x0 + dqx, y0 + dqy, half)
                tu(self.cb, pcb[dqy // 2:dqy // 2 + hc,
                                dqx // 2:dqx // 2 + hc], cbf_cb_q, 1,
                   self.qpc_cb, xc + dqx // 2, yc + dqy // 2, hc)
                tu(self.cr, pcr[dqy // 2:dqy // 2 + hc,
                                dqx // 2:dqx // 2 + hc], cbf_cr_q, 2,
                   self.qpc_cr, xc + dqx // 2, yc + dqy // 2, hc)
            return

        cbf_y = cbf_cb = cbf_cr = 0
        if rqt:
            cbf_cb = syn.decode_cbf_chroma(0)
            cbf_cr = syn.decode_cbf_chroma(0)
            cbf_y = syn.decode_cbf_luma(0) if (cbf_cb or cbf_cr) else 1
        for qy in range(ns):
            for qx in range(ns):
                self.cbf_map[cy + qy, cx + qx] = bool(cbf_y)

        tu(self.y, py, cbf_y, 0, self.qp, x0, y0, size)
        tu(self.cb, pcb, cbf_cb, 1, self.qpc_cb, xc, yc, cs)
        tu(self.cr, pcr, cbf_cr, 2, self.qpc_cr, xc, yc, cs)

    def _decode_chroma_mode(self, luma_mode: int) -> int:
        syn = self.syn
        if syn.cabac.decode_bin(T.CTX_OFF["intra_chroma_pred_mode"]) == 0:
            return luma_mode                      # DM
        idx = syn.cabac.decode_bypass_bits(2)
        cand = [0, 26, 10, 1]
        mode = cand[idx]
        if mode == luma_mode:
            mode = 34
        return mode

    def _mpm(self, xp: int, yp: int) -> list[int]:
        ca = INTRA_DC
        if self._avail(xp, yp, xp - 1, yp):
            ca = int(self.modes[yp >> 2, (xp - 1) >> 2])
        cb = INTRA_DC
        if self._avail(xp, yp, xp, yp - 1) and \
                (yp - 1) >= ((yp >> self.sps.log2_ctb) << self.sps.log2_ctb):
            cb = int(self.modes[(yp - 1) >> 2, xp >> 2])
        return mpm_candidates(ca, cb)

    def _transform_tree(self, x0, y0, x_base, y_base, log2size, depth,
                        blk_idx, max_depth, parent_cbf_cb, parent_cbf_cr):
        syn = self.syn
        sps = self.sps
        intra_split = self.cu["part_nxn"]
        if (log2size <= sps.log2_max_tb and log2size > sps.log2_min_tb
                and depth < max_depth and not (intra_split and depth == 0)):
            split = syn.cabac.decode_bin(
                T.CTX_OFF["split_transform"] + (5 - log2size))
        else:
            split = int(log2size > sps.log2_max_tb or
                        (intra_split and depth == 0))
        cbf_cb = parent_cbf_cb
        cbf_cr = parent_cbf_cr
        if log2size > 2:
            if depth == 0 or parent_cbf_cb:
                cbf_cb = syn.decode_cbf_chroma(depth)
            if depth == 0 or parent_cbf_cr:
                cbf_cr = syn.decode_cbf_chroma(depth)
        if split:
            half = 1 << (log2size - 1)
            self._transform_tree(x0, y0, x0, y0, log2size - 1, depth + 1, 0,
                                 max_depth, cbf_cb, cbf_cr)
            self._transform_tree(x0 + half, y0, x0, y0, log2size - 1,
                                 depth + 1, 1, max_depth, cbf_cb, cbf_cr)
            self._transform_tree(x0, y0 + half, x0, y0, log2size - 1,
                                 depth + 1, 2, max_depth, cbf_cb, cbf_cr)
            self._transform_tree(x0 + half, y0 + half, x0, y0, log2size - 1,
                                 depth + 1, 3, max_depth, cbf_cb, cbf_cr)
            return
        # leaf: cbf_luma (always signaled for intra)
        cbf_luma = syn.decode_cbf_luma(depth)
        self._transform_unit(x0, y0, x_base, y_base, log2size, depth, blk_idx,
                             cbf_luma, cbf_cb, cbf_cr)

    def _luma_mode_at(self, x: int, y: int) -> int:
        return int(self.modes[y >> 2, x >> 2])

    def _set_qg_qp(self, qpy: int) -> None:
        """Derive the current QG's luma/chroma Qp' scalars (8.6.1-8.6.3)."""
        self.cur_qpy = qpy
        self.qp = qpy + self._qp_bd
        self.qpc_cb = R.chroma_qp(
            min(max(qpy + self.pps.cb_qp_offset, 0), 57)) + self._qp_bd
        self.qpc_cr = R.chroma_qp(
            min(max(qpy + self.pps.cr_qp_offset, 0), 57)) + self._qp_bd

    def _transform_unit(self, x0, y0, x_base, y_base, log2size, depth,
                        blk_idx, cbf_luma, cbf_cb, cbf_cr):
        n = 1 << log2size
        if (self.pps.cu_qp_delta_enabled and not self.qg_coded
                and (cbf_luma or cbf_cb or cbf_cr)):
            # first coded TU of the quantization group (7.3.8.10)
            self.qg_coded = True
            self._set_qg_qp(self.qp_pred + self.syn.decode_cu_qp_delta())
        mode = self._luma_mode_at(x0, y0)
        # luma: predict + reconstruct
        pred = self._predict(self.y, x0, y0, n, mode, 0)
        if cbf_luma:
            scan = T.intra_scan_idx(log2size, mode, 0)
            lvl = self.syn.decode_residual(log2size, scan, 0)
            dst = (log2size == 2)
            resi = R.inverse_transform(
                R.dequantize(lvl, self.qp, self.sps.bit_depth), dst=dst,
                bit_depth=self.sps.bit_depth)
            rec = R.reconstruct(pred, resi, self.sps.bit_depth)
        else:
            rec = pred
        self.y[y0:y0 + n, x0:x0 + n] = rec

        # chroma: at this node if log2size > 2, else at blk_idx 3 on parent
        cmode = self.cu["chroma_mode"]
        if log2size > 2:
            self._chroma_tb(x0 >> 1, y0 >> 1, log2size - 1, cmode,
                            cbf_cb, cbf_cr, mode)
        elif blk_idx == 3:
            self._chroma_tb(x_base >> 1, y_base >> 1, 2, cmode,
                            cbf_cb, cbf_cr, mode)

    def _chroma_tb(self, xc, yc, log2c, cmode, cbf_cb, cbf_cr, luma_mode):
        n = 1 << log2c
        for plane, cbf, c_idx, qpc in ((self.cb, cbf_cb, 1, self.qpc_cb),
                                       (self.cr, cbf_cr, 2, self.qpc_cr)):
            pred = self._predict(plane, xc, yc, n, cmode, c_idx)
            if cbf:
                scan = T.intra_scan_idx(log2c, cmode, c_idx)
                lvl = self.syn.decode_residual(log2c, scan, c_idx)
                resi = R.inverse_transform(
                    R.dequantize(lvl, qpc, self.sps.bit_depth),
                    bit_depth=self.sps.bit_depth)
                rec = R.reconstruct(pred, resi, self.sps.bit_depth)
            else:
                rec = pred
            plane[yc:yc + n, xc:xc + n] = rec


def split_substreams(payload: bytes, ebsp_sizes: list[int]) -> list[bytes]:
    """Split slice payload (RBSP domain) at entry points given in EBSP bytes.

    Valid because every substream ends with a nonzero byte (flush stop /
    alignment-one), so emulation-prevention zero runs never span boundaries.
    """
    parts = []
    pos = 0
    for L in ebsp_sizes:
        zeros = 0
        ebsp = 0
        start = pos
        while ebsp < L and pos < len(payload):
            b = payload[pos]
            if zeros >= 2 and b <= 3:
                ebsp += 1           # an emulation-prevention byte sits here
                zeros = 0
                if ebsp >= L:
                    break
            ebsp += 1
            zeros = zeros + 1 if b == 0 else 0
            pos += 1
        parts.append(payload[start:pos])
    parts.append(payload[pos:])
    return parts


def _decode_tiled_slice(payload: bytes, hdr, sps: Sps, pps: Pps,
                        ref: dict | None = None, ref1: dict | None = None,
                        pocs: tuple | None = None,
                        colctx: dict | None = None) -> dict:
    from dataclasses import replace
    ctb = 1 << sps.log2_ctb
    nw = (sps.pic_width + ctb - 1) // ctb
    nh = (sps.pic_height + ctb - 1) // ctb
    t, r = pps.tile_cols, pps.tile_rows
    cols = [(i + 1) * nw // t - i * nw // t for i in range(t)]
    rows = [(j + 1) * nh // r - j * nh // r for j in range(r)]
    subs = split_substreams(payload, hdr.entry_point_offsets or [])
    assert len(subs) == t * r, (len(subs), t * r)
    out_y = np.zeros((sps.pic_height, sps.pic_width), np.int32)
    out_cb = np.zeros((sps.pic_height // 2, sps.pic_width // 2), np.int32)
    out_cr = np.zeros_like(out_cb)
    part_map = np.zeros((nh, nw), bool)
    skip_map = np.zeros((nh, nw), bool)
    sao_y = [[None] * nw for _ in range(nh)]
    sao_c = [[None] * nw for _ in range(nh)]
    # motion/cbf maps live on the 16-sample deblock bS grid, NOT the CTB
    # grid (they only coincide at CTB=16)
    s16 = ctb // 16
    nh16, nw16 = nh * s16, nw * s16
    cu_maps = {"intra": np.ones((nh16, nw16), bool),
               "cbf": np.zeros((nh16, nw16), bool),
               "mv": np.zeros((nh16, nw16, 2), np.int32),
               "mv1": np.zeros((nh16, nw16, 2), np.int32),
               "pf": np.zeros((nh16, nw16, 2), np.int32)}
    k = 0
    y0 = 0
    for th in rows:
        x0 = 0
        for tw in cols:
            sub_sps = replace(sps, pic_width=tw * ctb, pic_height=th * ctb,
                              width=tw * ctb, height=th * ctb)
            dec = IntraDecoder(sub_sps, pps)
            ys, xs = y0 * ctb, x0 * ctb
            # MC reads the FULL reference picture; tile offset keeps the
            # sub-decoder's local coords addressing the right region
            f = dec.decode_slice(subs[k], hdr,
                                 expect_end=(k == t * r - 1), ref=ref,
                                 off=(xs, ys), ref1=ref1, pocs=pocs,
                                 colctx=colctx)
            out_y[ys:ys + th * ctb, xs:xs + tw * ctb] = f["y"]
            out_cb[ys // 2:(ys + th * ctb) // 2,
                   xs // 2:(xs + tw * ctb) // 2] = f["cb"]
            out_cr[ys // 2:(ys + th * ctb) // 2,
                   xs // 2:(xs + tw * ctb) // 2] = f["cr"]
            part_map[y0:y0 + th, x0:x0 + tw] = f["part_map"]
            skip_map[y0:y0 + th, x0:x0 + tw] = f["skip_map"]
            for kk in ("intra", "cbf", "mv", "mv1", "pf"):
                cu_maps[kk][y0 * s16:(y0 + th) * s16,
                            x0 * s16:(x0 + tw) * s16] = f["cu_maps"][kk]
            fy, fc = f["sao"]
            for j in range(th):
                sao_y[y0 + j][x0:x0 + tw] = fy[j]
                sao_c[y0 + j][x0:x0 + tw] = fc[j]
            k += 1
            x0 += tw
        y0 += th
    return {"y": out_y, "cb": out_cb, "cr": out_cr, "qp": hdr.qp,
            "part_map": part_map, "skip_map": skip_map, "cu_maps": cu_maps,
            "sao": (sao_y, sao_c)}


def decode_annexb(data: bytes, cfg=None) -> list[dict]:
    """Decode an Annex-B stream: IDR (I), TRAIL_R (P) and non-reference
    TRAIL_N (B) pictures.

    The DPB keys reference pictures by POC (reset at each IDR); frames are
    returned in DISPLAY order (sorted by IDR epoch then POC).
    """
    sps = pps = None
    out = []                    # (epoch, poc, frame)
    dpb = {}                    # poc -> {"y","cb","cr"} (reference pics only)
    epoch = 0
    for nal in split_annexb(data):
        nal_type = (nal[0] >> 1) & 0x3F
        if nal_type == 33:
            sps = parse_sps(nal)
        elif nal_type == 34:
            pps = parse_pps(nal)
        elif nal_type in (0, 1, 19, 20, 21):
            assert sps is not None and pps is not None
            rbsp = ebsp_to_rbsp(nal[2:])
            hdr = parse_slice_header(rbsp, nal_type, sps, pps)
            payload = rbsp[hdr.payload_offset:]
            if nal_type in (19, 20, 21):
                dpb = {}
                epoch += 1
            r0 = r1 = None
            pocs = None
            colctx = None
            if hdr.slice_type in (0, 1):
                neg, pos = hdr.rps
                poc0 = hdr.poc - neg[0]
                r0 = dpb[poc0]
                poc1 = None
                if hdr.slice_type == 0:
                    poc1 = hdr.poc + pos[0]
                    r1 = dpb[poc1]
                pocs = (hdr.poc, poc0, poc1)
                if hdr.temporal_mvp:
                    # col pic: L0[0] for P / collocated_from_l0 choice for B
                    col_poc = poc0 if (hdr.slice_type == 1
                                       or hdr.collocated_from_l0) else poc1
                    ce = dpb[col_poc]
                    if ce.get("ref_delta") is not None:
                        from hevc_tpu.ops.inter import dist_scale
                        td = ce["ref_delta"]
                        dsf0 = dist_scale(hdr.poc - poc0, td)
                        dsf1 = dist_scale(hdr.poc - poc1, td) \
                            if poc1 is not None else None
                        colctx = {"avail": ce["col_avail"],
                                  "mv": ce["col_mv"],
                                  "dsf": (dsf0, dsf1)}
            if pps.tiles_enabled:
                frame = _decode_tiled_slice(payload, hdr, sps, pps, ref=r0,
                                            ref1=r1, pocs=pocs,
                                            colctx=colctx)
            else:
                dec = IntraDecoder(sps, pps)
                frame = dec.decode_slice(payload, hdr, ref=r0, ref1=r1,
                                         pocs=pocs, colctx=colctx)
            if not hdr.deblocking_disabled:
                _apply_deblock(frame, hdr, sps, pps)
            if sps.sao_enabled and (hdr.sao_luma or hdr.sao_chroma):
                _apply_sao(frame, hdr, sps, pps)
            out.append((epoch, hdr.poc, frame))
            if nal_type != 0:   # TRAIL_N pictures are not references
                maps = frame.get("cu_maps")
                entry = {"y": frame["y"], "cb": frame["cb"],
                         "cr": frame["cr"], "ref_delta": None}
                if maps is not None and hdr.slice_type == 1:
                    # retain the 16x16-compressed motion field for TMVP:
                    # P anchors carry L0 motion; ref_delta = POC gap to
                    # their single L0 reference (td of 8.5.3.2.8)
                    pf = maps["pf"]
                    entry["col_avail"] = ~maps["intra"] & \
                        ((pf[:, :, 0] > 0) | (pf[:, :, 1] > 0))
                    entry["col_mv"] = maps["mv"]
                    entry["ref_delta"] = hdr.rps[0][0] if hdr.rps[0] else None
                dpb[hdr.poc] = entry
                if len(dpb) > 3:
                    del dpb[min(dpb)]
    out.sort(key=lambda t: (t[0], t[1]))
    res = []
    for e, p, f in out:
        f["epoch"], f["poc"] = e, p       # display bookkeeping for callers
        res.append(f)
    return res


def _apply_sao(frame: dict, hdr, sps: Sps, pps: Pps) -> None:
    """SAO on the deblocked picture (spec 8.7.3; after deblocking)."""
    from hevc_tpu.ops.sao import apply_sao_plane, _split_c
    ctb = 1 << sps.log2_ctb
    tile_x = tile_y = None
    if pps.tiles_enabled:
        nw = (sps.pic_width + ctb - 1) // ctb
        nh = (sps.pic_height + ctb - 1) // ctb
        tile_x = [((i + 1) * nw // pps.tile_cols) * ctb
                  for i in range(pps.tile_cols - 1)]
        tile_y = [((j + 1) * nh // pps.tile_rows) * ctb
                  for j in range(pps.tile_rows - 1)]
    sao_y, sao_c = frame["sao"]
    bd = sps.bit_depth
    if hdr.sao_luma:
        frame["y"][:] = apply_sao_plane(frame["y"], sao_y, ctb, bd,
                                        tile_x, tile_y)
    if hdr.sao_chroma:
        hx = [t // 2 for t in (tile_x or [])] or None
        hy = [t // 2 for t in (tile_y or [])] or None
        pc_cb = [[_split_c(p, 0) for p in row] for row in sao_c]
        pc_cr = [[_split_c(p, 1) for p in row] for row in sao_c]
        frame["cb"][:] = apply_sao_plane(frame["cb"], pc_cb, ctb // 2, bd,
                                         hx, hy)
        frame["cr"][:] = apply_sao_plane(frame["cr"], pc_cr, ctb // 2, bd,
                                         hx, hy)


def _apply_deblock(frame: dict, hdr, sps: Sps, pps: Pps) -> None:
    from hevc_tpu.ops.deblock import deblock_frame
    ctb = 1 << sps.log2_ctb
    tile_x = tile_y = None
    if pps.tiles_enabled:
        nw = (sps.pic_width + ctb - 1) // ctb
        nh = (sps.pic_height + ctb - 1) // ctb
        tile_x = [((i + 1) * nw // pps.tile_cols) * ctb
                  for i in range(pps.tile_cols - 1)]
        tile_y = [((j + 1) * nh // pps.tile_rows) * ctb
                  for j in range(pps.tile_rows - 1)]
    maps = frame.get("cu_maps")
    if maps is not None and bool(maps["intra"].all()):
        maps = None                     # all-intra frame: bS=2 everywhere
    deblock_frame(frame["y"], frame["cb"], frame["cr"], hdr.qp,
                  ctb=ctb, bit_depth=sps.bit_depth,
                  tile_cols_px=tile_x, tile_rows_px=tile_y,
                  nxn_map=frame.get("part_map"), cu_maps=maps)
