"""v1 scalar reference encoder: CTB16 with 2Nx2N/NxN partition decision."""
from __future__ import annotations

import numpy as np

from hevc_tpu.encoder.ctu_modes import encode_ctu_v1, level_bits_estimate, \
    skip_lambda16
from hevc_tpu.encoder.reference_encoder import hadamard_satd, pad_to_ctb
from hevc_tpu.entropy.headers import StreamConfig, write_vps, write_sps, \
    write_pps
from hevc_tpu.entropy.syntax import INTRA_DC
from hevc_tpu.entropy.tiled_v1 import entropy_encode_frame_v1
from hevc_tpu.ops import reference as R


def _sse(a: np.ndarray, b: np.ndarray) -> int:
    d = a.astype(np.int64) - b.astype(np.int64)
    return int((d * d).sum())


class RefIntraEncoderV1:
    def __init__(self, cfg: StreamConfig, enable_nxn: bool = True,
                 mc: bool = True, subpel: bool = True,
                 nxn_p: bool | None = None):
        assert cfg.log2_ctb == 4, "v1 profile: CTB16"
        self.cfg = cfg
        self.enable_nxn = enable_nxn
        self.mc = mc            # P frames: motion search (False: zero-MV only)
        self.subpel = subpel    # half/quarter-pel refinement after int search
        # NxN intra inside P frames: rarely wins and doubles the search; the
        # medium preset keeps it for I frames only (matches GopEncoder)
        self.nxn_p = (False if mc else enable_nxn) if nxn_p is None else nxn_p

    def parameter_sets(self) -> list[bytes]:
        return [write_vps(self.cfg), write_sps(self.cfg), write_pps(self.cfg)]

    def encode_frame_decisions(self, y, cb, cr):
        """Returns (ctus [tile-agnostic full grid], recon planes).

        With tiles enabled, each tile region is encoded independently
        (availability reset at tile boundaries), matching the device graph.
        """
        cfg = self.cfg
        ctb = cfg.ctb
        qp_bd = 6 * (cfg.bit_depth - 8)
        qp = cfg.qp + qp_bd
        qpc = R.chroma_qp(cfg.qp) + qp_bd
        ys = pad_to_ctb(np.asarray(y), ctb)
        cbs = pad_to_ctb(np.asarray(cb), ctb // 2)
        crs = pad_to_ctb(np.asarray(cr), ctb // 2)
        H, W = ys.shape
        nw, nh = W // ctb, H // ctb
        rec_y = np.zeros_like(ys)
        rec_cb = np.zeros((H // 2, W // 2), np.int32)
        rec_cr = np.zeros((H // 2, W // 2), np.int32)
        lam = 0.85 * 2.0 ** ((qp - 12) / 3.0)
        sqrt_lam = float(np.sqrt(lam))

        cols, rows = cfg.tile_grid()
        ctus = [[None] * nw for _ in range(nh)]
        ty0 = 0
        for th in rows:
            tx0 = 0
            for tw in cols:
                self._encode_tile(ys, cbs, crs, rec_y, rec_cb, rec_cr,
                                  tx0, ty0, tw, th, qp, qpc, sqrt_lam, ctus)
                tx0 += tw
            ty0 += th
        return ctus, {"y": rec_y, "cb": rec_cb, "cr": rec_cr}

    def _encode_tile(self, ys, cbs, crs, rec_y, rec_cb, rec_cr,
                     tx0, ty0, tw, th, qp, qpc, sqrt_lam, ctus):
        cfg = self.cfg
        ctb = cfg.ctb
        # tile-local views so availability resets at tile boundaries
        vy = ys[ty0 * ctb:(ty0 + th) * ctb, tx0 * ctb:(tx0 + tw) * ctb]
        vcb = cbs[ty0 * ctb // 2:(ty0 + th) * ctb // 2,
                  tx0 * ctb // 2:(tx0 + tw) * ctb // 2]
        vcr = crs[ty0 * ctb // 2:(ty0 + th) * ctb // 2,
                  tx0 * ctb // 2:(tx0 + tw) * ctb // 2]
        ry = rec_y[ty0 * ctb:(ty0 + th) * ctb, tx0 * ctb:(tx0 + tw) * ctb]
        rcb = rec_cb[ty0 * ctb // 2:(ty0 + th) * ctb // 2,
                     tx0 * ctb // 2:(tx0 + tw) * ctb // 2]
        rcr = rec_cr[ty0 * ctb // 2:(ty0 + th) * ctb // 2,
                     tx0 * ctb // 2:(tx0 + tw) * ctb // 2]
        for cy in range(th):
            left_modes = (INTRA_DC, INTRA_DC)
            for cx in range(tw):
                dec, left_modes = encode_ctu_v1(
                    vy, vcb, vcr, ry, rcb, rcr, cx, cy, ctb, qp, qpc, None,
                    sqrt_lam, left_modes, cfg.bit_depth, hadamard_satd,
                    enable_nxn=self.enable_nxn, sdh=cfg.sdh, rdoq=cfg.rdoq)
                ctus[ty0 + cy][tx0 + cx] = dec

    def encode_frame(self, y, cb, cr):
        ctus, recon = self.encode_frame_decisions(y, cb, cr)
        nal = entropy_encode_frame_v1(self.cfg, ctus)
        return nal, recon

    # ---- P frames (motion-compensated, CTU = CU = PU) --------------------------
    def encode_frame_p_decisions(self, y, cb, cr, ref: dict, wp=None):
        """P-frame encode against ref (the previous DEBLOCKED reconstruction).

        wp: explicit P weights (wy, oy, wcb, ocb, wcr, ocr) when
        cfg.weightp (slice pred_weight_table); None = default weighting.

        Per CTU, four candidates under J = SSE + (lambda16 * bits_est >> 4):
          skip        merge cand 0 motion, no residual
          merge       merge cand 0 motion + coded residual (rqt inferred 1)
          explicit    full-search integer MV (AMVP + mvd) +- residual
          intra       the full v1 2Nx2N/NxN search
        Motion compensation reads the full reference picture (tiles constrain
        entropy + intra availability + merge/AMVP neighbors, not MC).
        Returns (ctus grid, recon, cu_maps for deblocking).
        """
        cfg = self.cfg
        ctb = cfg.ctb
        qp_bd = 6 * (cfg.bit_depth - 8)
        qp = cfg.qp + qp_bd
        qpc = R.chroma_qp(cfg.qp) + qp_bd
        ys = pad_to_ctb(np.asarray(y), ctb)
        cbs = pad_to_ctb(np.asarray(cb), ctb // 2)
        crs = pad_to_ctb(np.asarray(cr), ctb // 2)
        H, W = ys.shape
        nw, nh = W // ctb, H // ctb
        rec_y = np.zeros_like(ys)
        rec_cb = np.zeros((H // 2, W // 2), np.int32)
        rec_cr = np.zeros((H // 2, W // 2), np.int32)
        lam = 0.85 * 2.0 ** ((qp - 12) / 3.0)
        sqrt_lam = float(np.sqrt(lam))
        lam16 = skip_lambda16(qp)

        cols, rows = cfg.tile_grid()
        ctus = [[None] * nw for _ in range(nh)]
        cu_maps = {"intra": np.zeros((nh, nw), bool),
                   "cbf": np.zeros((nh, nw), bool),
                   "mv": np.zeros((nh, nw, 2), np.int32)}
        tile_fn = self._encode_tile_p_mc if self.mc else self._encode_tile_p
        kw = {"wp": wp} if self.mc else {}
        ty0 = 0
        for th in rows:
            tx0 = 0
            for tw in cols:
                tile_fn(ys, cbs, crs, rec_y, rec_cb, rec_cr, ref,
                        tx0, ty0, tw, th, qp, qpc, sqrt_lam,
                        lam16, ctus, cu_maps, **kw)
                tx0 += tw
            ty0 += th
        return ctus, {"y": rec_y, "cb": rec_cb, "cr": rec_cr}, cu_maps

    def _encode_tile_p(self, ys, cbs, crs, rec_y, rec_cb, rec_cr, ref,
                       tx0, ty0, tw, th, qp, qpc, sqrt_lam, lam16, ctus,
                       cu_maps):
        cfg = self.cfg
        ctb = cfg.ctb
        hc = ctb // 2
        vy = ys[ty0 * ctb:(ty0 + th) * ctb, tx0 * ctb:(tx0 + tw) * ctb]
        vcb = cbs[ty0 * hc:(ty0 + th) * hc, tx0 * hc:(tx0 + tw) * hc]
        vcr = crs[ty0 * hc:(ty0 + th) * hc, tx0 * hc:(tx0 + tw) * hc]
        ry = rec_y[ty0 * ctb:(ty0 + th) * ctb, tx0 * ctb:(tx0 + tw) * ctb]
        rcb = rec_cb[ty0 * hc:(ty0 + th) * hc, tx0 * hc:(tx0 + tw) * hc]
        rcr = rec_cr[ty0 * hc:(ty0 + th) * hc, tx0 * hc:(tx0 + tw) * hc]
        fy = ref["y"][ty0 * ctb:(ty0 + th) * ctb, tx0 * ctb:(tx0 + tw) * ctb]
        fcb = ref["cb"][ty0 * hc:(ty0 + th) * hc, tx0 * hc:(tx0 + tw) * hc]
        fcr = ref["cr"][ty0 * hc:(ty0 + th) * hc, tx0 * hc:(tx0 + tw) * hc]
        for cy in range(th):
            left_modes = (INTRA_DC, INTRA_DC)
            for cx in range(tw):
                x0, y0 = cx * ctb, cy * ctb
                xc, yc = cx * hc, cy * hc
                sl = np.s_[y0:y0 + ctb, x0:x0 + ctb]
                slc = np.s_[yc:yc + hc, xc:xc + hc]
                # skip candidate: co-located ref CTU, no residual
                sse_skip = _sse(vy[sl], fy[sl]) + _sse(vcb[slc], fcb[slc]) \
                    + _sse(vcr[slc], fcr[slc])
                # intra candidate: full v1 search (writes recon in place)
                dec, lm = encode_ctu_v1(
                    vy, vcb, vcr, ry, rcb, rcr, cx, cy, ctb, qp, qpc, None,
                    sqrt_lam, left_modes, cfg.bit_depth, hadamard_satd,
                    enable_nxn=self.enable_nxn, sdh=cfg.sdh, rdoq=cfg.rdoq)
                sse_intra = _sse(vy[sl], ry[sl]) + _sse(vcb[slc], rcb[slc]) \
                    + _sse(vcr[slc], rcr[slc])
                bits = min(8 + level_bits_estimate(
                    (dec["lvl_y"], dec["lvl_cb"], dec["lvl_cr"])), 2048)
                j_skip = sse_skip + (lam16 >> 4)
                j_intra = sse_intra + ((lam16 * bits) >> 4)
                if j_skip <= j_intra:
                    ry[sl] = fy[sl]
                    rcb[slc] = fcb[slc]
                    rcr[slc] = fcr[slc]
                    ctus[ty0 + cy][tx0 + cx] = {"skip": True}
                    left_modes = (INTRA_DC, INTRA_DC)
                else:
                    ctus[ty0 + cy][tx0 + cx] = dec
                    cu_maps["intra"][ty0 + cy, tx0 + cx] = True
                    cu_maps["cbf"][ty0 + cy, tx0 + cx] = \
                        bool(np.any(dec["lvl_y"]))
                    left_modes = lm

    def _encode_tile_p_mc(self, ys, cbs, crs, rec_y, rec_cb, rec_cr, ref,
                          tx0, ty0, tw, th, qp, qpc, sqrt_lam, lam16, ctus,
                          cu_maps, wp=None):
        """MC tile encode: skip / merge / explicit-MV / intra per CTU.

        wp: explicit weights (spec 8.5.3.2.9.3) applied to every inter
        prediction (skip/merge/explicit) and inside the motion search."""
        from hevc_tpu.ops import inter as M
        from hevc_tpu.encoder.ctu_modes import encode_tu
        cfg = self.cfg
        ctb = cfg.ctb
        hc = ctb // 2
        bd = cfg.bit_depth
        sl16 = int(sqrt_lam * 16)
        vy = ys[ty0 * ctb:(ty0 + th) * ctb, tx0 * ctb:(tx0 + tw) * ctb]
        vcb = cbs[ty0 * hc:(ty0 + th) * hc, tx0 * hc:(tx0 + tw) * hc]
        vcr = crs[ty0 * hc:(ty0 + th) * hc, tx0 * hc:(tx0 + tw) * hc]
        ry = rec_y[ty0 * ctb:(ty0 + th) * ctb, tx0 * ctb:(tx0 + tw) * ctb]
        rcb = rec_cb[ty0 * hc:(ty0 + th) * hc, tx0 * hc:(tx0 + tw) * hc]
        rcr = rec_cr[ty0 * hc:(ty0 + th) * hc, tx0 * hc:(tx0 + tw) * hc]
        inter_map = np.zeros((th, tw), bool)
        mv_map = np.zeros((th, tw, 2), np.int32)

        def tu3(src3, pred3):
            """(lvl, cbf, rec) per plane for one inter CU's residual."""
            sdh_scan = 0 if cfg.sdh else None   # inter TBs: diag scan
            out = []
            for (s, p, q) in ((src3[0], pred3[0], qp),
                              (src3[1], pred3[1], qpc),
                              (src3[2], pred3[2], qpc)):
                out.append(encode_tu(s, p, q, bd, sdh_scan=sdh_scan,
                                     rdoq=cfg.rdoq))
            return out

        for cy in range(th):
            left_modes = (INTRA_DC, INTRA_DC)
            for cx in range(tw):
                x0, y0 = cx * ctb, cy * ctb
                xc, yc = cx * hc, cy * hc
                gx0, gy0 = (tx0 + cx) * ctb, (ty0 + cy) * ctb
                sl = np.s_[y0:y0 + ctb, x0:x0 + ctb]
                slc = np.s_[yc:yc + hc, xc:xc + hc]
                src3 = (vy[sl], vcb[slc], vcr[slc])
                merge_mv = M.merge_cand0(inter_map, mv_map, cy, cx, th, tw)
                amvp = M.amvp_list(inter_map, mv_map, cy, cx, th, tw)

                # --- motion search: SAD + lambda * mvd bits ---
                def mv_cost(mv):
                    pred = M.mc_luma(ref["y"], gx0, gy0, ctb,
                                     mv[0], mv[1], bd)
                    sad = int(np.abs(src3[0].astype(np.int64)
                                     - pred.astype(np.int64)).sum())
                    mb0 = M.mvd_bits(mv[0] - amvp[0][0]) + \
                        M.mvd_bits(mv[1] - amvp[0][1])
                    mb1 = M.mvd_bits(mv[0] - amvp[1][0]) + \
                        M.mvd_bits(mv[1] - amvp[1][1])
                    mvp_idx = 0 if mb0 <= mb1 else 1
                    return ((sad << 4) + sl16 * min(mb0, mb1),
                            mv, mvp_idx, min(mb0, mb1))

                # two-stage shared search (coarse center + dual fine
                # windows + subpel) — see _mv_search
                _, mv_e, mvp_e, mbits_e = self._mv_search(
                    src3[0], ref["y"], gx0, gy0, amvp, sl16, bd, ctb,
                    wp_l=None if wp is None else wp[:2])

                # --- candidate: skip (merge motion, no residual) ---
                pm3 = M.mc_block_w(ref, gx0, gy0, ctb, merge_mv, wp, bd)
                sse_skip = sum(_sse(s, p) for s, p in zip(src3, pm3))
                j = sse_skip + ((lam16 * 2) >> 4)
                choice = ("skip", j)

                # --- candidate: merge with residual ---
                tm = tu3(src3, pm3)
                if any(t[1] for t in tm):
                    sse_m = sum(_sse(s, t[2]) for s, t in zip(src3, tm))
                    bits = min(12 + level_bits_estimate(
                        [t[0] for t in tm]), 2048)
                    j = sse_m + ((lam16 * bits) >> 4)
                    if j < choice[1]:
                        choice = ("merge", j)

                # --- candidate: explicit MV (+- residual) ---
                pe3 = M.mc_block_w(ref, gx0, gy0, ctb, mv_e, wp, bd)
                te = tu3(src3, pe3)
                rqt = int(any(t[1] for t in te))
                if rqt:
                    sse_e = sum(_sse(s, t[2]) for s, t in zip(src3, te))
                    lv = [t[0] for t in te]
                else:
                    sse_e = sum(_sse(s, p) for s, p in zip(src3, pe3))
                    lv = []
                bits = min(16 + mbits_e + level_bits_estimate(lv), 2048)
                j = sse_e + ((lam16 * bits) >> 4)
                if j < choice[1]:
                    choice = ("explicit", j)

                # --- candidate: intra (writes recon in place) ---
                dec, lm = encode_ctu_v1(
                    vy, vcb, vcr, ry, rcb, rcr, cx, cy, ctb, qp, qpc, None,
                    sqrt_lam, left_modes, bd, hadamard_satd,
                    enable_nxn=self.nxn_p, sdh=cfg.sdh, rdoq=cfg.rdoq)
                sse_i = _sse(vy[sl], ry[sl]) + _sse(vcb[slc], rcb[slc]) \
                    + _sse(vcr[slc], rcr[slc])
                bits = min(8 + level_bits_estimate(
                    (dec["lvl_y"], dec["lvl_cb"], dec["lvl_cr"])), 2048)
                j = sse_i + ((lam16 * bits) >> 4)
                if j < choice[1]:
                    choice = ("intra", j)

                gy, gx = ty0 + cy, tx0 + cx
                kind = choice[0]
                if kind == "intra":
                    ctus[gy][gx] = dec
                    cu_maps["intra"][gy, gx] = True
                    cu_maps["cbf"][gy, gx] = bool(np.any(dec["lvl_y"]))
                    left_modes = lm
                    continue
                left_modes = (INTRA_DC, INTRA_DC)
                inter_map[cy, cx] = True
                if kind == "skip":
                    mv, rec3 = merge_mv, pm3
                    ctus[gy][gx] = {"skip": True}
                elif kind == "merge":
                    mv = merge_mv
                    rec3 = [t[2] for t in tm]
                    ctus[gy][gx] = {
                        "inter": True, "merge": True,
                        "cbf_y": tm[0][1], "lvl_y": tm[0][0],
                        "cbf_cb": tm[1][1], "lvl_cb": tm[1][0],
                        "cbf_cr": tm[2][1], "lvl_cr": tm[2][0]}
                    cu_maps["cbf"][gy, gx] = bool(tm[0][1])
                else:
                    mv = mv_e
                    mvd = (mv_e[0] - amvp[mvp_e][0], mv_e[1] - amvp[mvp_e][1])
                    rec3 = [t[2] for t in te] if rqt else list(pe3)
                    d = {"inter": True, "merge": False,
                         "mvd": mvd, "mvp": mvp_e, "rqt": rqt}
                    if rqt:
                        d.update(cbf_y=te[0][1], lvl_y=te[0][0],
                                 cbf_cb=te[1][1], lvl_cb=te[1][0],
                                 cbf_cr=te[2][1], lvl_cr=te[2][0])
                        cu_maps["cbf"][gy, gx] = bool(te[0][1])
                    ctus[gy][gx] = d
                mv_map[cy, cx] = mv
                cu_maps["mv"][gy, gx] = mv
                ry[sl], rcb[slc], rcr[slc] = rec3[0], rec3[1], rec3[2]

    # ---- B frames (bi-prediction, non-reference, IbPbP GOP) -------------------
    def _mv_search(self, src, ref_y, gx0, gy0, amvp, sl16, bd, ctb,
                   wp_l=None):
        """Hierarchical motion search vs one ref (effective range +-40 px;
        the reference's x265-medium runs hex +-57):

          A: coarse 4x-decimated 17x17 full search (+-32 px, center
             clipped to +-30)
          B: 2x-decimated 7x7 refine in 2-px steps (+-6) around A
          C: full-res 9x9 (+-4) around ZERO first (small true motions
             must never lose to a decimation-aliased center), then 9x9
             around B; strict < keeps the earlier candidate
          D: optional subpel refinement (half then quarter)

        Round-2's dual +-8 full windows (2x289 full-res SADs) cost ~2x
        the device P step; the pyramid covers the same reach with 2x81
        full-res SADs + cheap decimated stages (VERDICT r2 item 8)."""
        from hevc_tpu.ops import inter as M

        def pred_l(mvx, mvy):
            if wp_l is None:
                return M.mc_luma(ref_y, gx0, gy0, ctb, mvx, mvy, bd)
            return M.weight_uni_w(
                M.mc_luma_i(ref_y, gx0, gy0, ctb, mvx, mvy, bd),
                wp_l[0], wp_l[1], bd)

        def mv_cost(mv):
            pred = pred_l(mv[0], mv[1])
            sad = int(np.abs(src.astype(np.int64)
                             - pred.astype(np.int64)).sum())
            mb0 = M.mvd_bits(mv[0] - amvp[0][0]) + \
                M.mvd_bits(mv[1] - amvp[0][1])
            mb1 = M.mvd_bits(mv[0] - amvp[1][0]) + \
                M.mvd_bits(mv[1] - amvp[1][1])
            mvp_idx = 0 if mb0 <= mb1 else 1
            return ((sad << 4) + sl16 * min(mb0, mb1), mv, mvp_idx,
                    min(mb0, mb1))

        src4 = src[::4, ::4].astype(np.int64)
        best4 = None
        for dy in range(-8, 9):
            for dx in range(-8, 9):
                pred = pred_l(16 * dx, 16 * dy)
                sad4 = int(np.abs(src4
                                  - pred[::4, ::4].astype(np.int64)).sum())
                if best4 is None or sad4 < best4[0]:
                    best4 = (sad4, 4 * dx, 4 * dy)      # full-res px
        cx = min(max(best4[1], -30), 30)
        cy = min(max(best4[2], -30), 30)

        src2 = src[::2, ::2].astype(np.int64)
        best2 = None
        for dy in range(-3, 4):
            for dx in range(-3, 4):
                ex, ey = cx + 2 * dx, cy + 2 * dy
                pred = pred_l(4 * ex, 4 * ey)
                sad2 = int(np.abs(src2
                                  - pred[::2, ::2].astype(np.int64)).sum())
                if best2 is None or sad2 < best2[0]:
                    best2 = (sad2, ex, ey)
        cx, cy = best2[1], best2[2]

        best = None
        for dy in range(-4, 5):
            for dx in range(-4, 5):
                cand = mv_cost((4 * dx, 4 * dy))
                if best is None or cand[0] < best[0]:
                    best = cand
        for dy in range(-4, 5):
            for dx in range(-4, 5):
                cand = mv_cost((4 * (cx + dx), 4 * (cy + dy)))
                if cand[0] < best[0]:
                    best = cand
        for step in (2, 1) if self.subpel else ():
            base = best[1]
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if (dx, dy) == (0, 0):
                        continue
                    cand = mv_cost((base[0] + dx * step, base[1] + dy * step))
                    if cand[0] < best[0]:
                        best = cand
        return best

    B_QP_OFFSET = 2     # non-reference B pictures code at QP + 2

    def encode_frame_b_decisions(self, y, cb, cr, ref0: dict, ref1: dict,
                                 pocs: tuple):
        """B-frame encode vs two refs (past, future); pocs=(cur, p0, p1).

        Per CTU: skip / merge / explicit L0 / L1 / BI / intra under the
        same integer RD as the P path.  Single tile grid walk (tiles
        constrain entropy + availability, not MC)."""
        from hevc_tpu.ops import inter as M
        from hevc_tpu.encoder.ctu_modes import encode_tu
        cfg = self.cfg
        ctb = cfg.ctb
        hc = ctb // 2
        bd = cfg.bit_depth
        qp_bd = 6 * (bd - 8)
        qp_s = min(cfg.qp + self.B_QP_OFFSET, 51)
        qp = qp_s + qp_bd
        qpc = R.chroma_qp(qp_s) + qp_bd
        ys = pad_to_ctb(np.asarray(y), ctb)
        cbs = pad_to_ctb(np.asarray(cb), hc)
        crs = pad_to_ctb(np.asarray(cr), hc)
        H, W = ys.shape
        nw, nh = W // ctb, H // ctb
        rec_y = np.zeros_like(ys)
        rec_cb = np.zeros((H // 2, W // 2), np.int32)
        rec_cr = np.zeros((H // 2, W // 2), np.int32)
        lam = 0.85 * 2.0 ** ((qp - 12) / 3.0)
        sqrt_lam = float(np.sqrt(lam))
        sl16 = int(sqrt_lam * 16)
        lam16 = skip_lambda16(qp)
        cur_poc, poc0, poc1 = pocs

        cols, rows = cfg.tile_grid()
        ctus = [[None] * nw for _ in range(nh)]
        cu_maps = {"intra": np.zeros((nh, nw), bool),
                   "cbf": np.zeros((nh, nw), bool),
                   "mv": np.zeros((nh, nw, 2), np.int32),
                   "mv1": np.zeros((nh, nw, 2), np.int32),
                   "pf": np.zeros((nh, nw, 2), np.int32)}

        def tu3(src3, pred3):
            sdh_scan = 0 if cfg.sdh else None   # inter TBs: diag scan
            return [encode_tu(s, p, q, bd, sdh_scan=sdh_scan,
                              rdoq=cfg.rdoq) for (s, p, q)
                    in ((src3[0], pred3[0], qp), (src3[1], pred3[1], qpc),
                        (src3[2], pred3[2], qpc))]

        def mc_rec(rec):
            pf0, pf1, mv0, mv1 = rec
            if pf0 and pf1:
                return M.mc_block_bi(ref0, ref1, gx0, gy0, ctb, mv0, mv1, bd)
            refp, mv = (ref0, mv0) if pf0 else (ref1, mv1)
            return M.mc_block(refp, gx0, gy0, ctb, mv, bd)

        ty0 = 0
        for th in rows:
            tx0 = 0
            for tw in cols:
                vy = ys[ty0 * ctb:(ty0 + th) * ctb,
                        tx0 * ctb:(tx0 + tw) * ctb]
                vcb = cbs[ty0 * hc:(ty0 + th) * hc, tx0 * hc:(tx0 + tw) * hc]
                vcr = crs[ty0 * hc:(ty0 + th) * hc, tx0 * hc:(tx0 + tw) * hc]
                ry = rec_y[ty0 * ctb:(ty0 + th) * ctb,
                           tx0 * ctb:(tx0 + tw) * ctb]
                rcb = rec_cb[ty0 * hc:(ty0 + th) * hc,
                             tx0 * hc:(tx0 + tw) * hc]
                rcr = rec_cr[ty0 * hc:(ty0 + th) * hc,
                             tx0 * hc:(tx0 + tw) * hc]
                rec_map = [[None] * tw for _ in range(th)]
                for cy in range(th):
                    left_modes = (INTRA_DC, INTRA_DC)
                    for cx in range(tw):
                        x0, y0 = cx * ctb, cy * ctb
                        xc, yc = cx * hc, cy * hc
                        gx0, gy0 = (tx0 + cx) * ctb, (ty0 + cy) * ctb
                        sl = np.s_[y0:y0 + ctb, x0:x0 + ctb]
                        slc = np.s_[yc:yc + hc, xc:xc + hc]
                        src3 = (vy[sl], vcb[slc], vcr[slc])
                        nbrs = M.neighbor_records(rec_map, cy, cx, th, tw)
                        mrec = M.merge_cand0_b(nbrs, True)
                        amvp0 = M.amvp_list_b(nbrs, 0, cur_poc, (poc0, poc1))
                        amvp1 = M.amvp_list_b(nbrs, 1, cur_poc, (poc0, poc1))

                        # skip / merge
                        pm3 = mc_rec(mrec)
                        sse_skip = sum(_sse(s, p)
                                       for s, p in zip(src3, pm3))
                        choice = ("skip", sse_skip + ((lam16 * 2) >> 4))
                        tm = tu3(src3, pm3)
                        if any(t[1] for t in tm):
                            sse_m = sum(_sse(s, t[2])
                                        for s, t in zip(src3, tm))
                            bits = min(12 + level_bits_estimate(
                                [t[0] for t in tm]), 2048)
                            j = sse_m + ((lam16 * bits) >> 4)
                            if j < choice[1]:
                                choice = ("merge", j)

                        # explicit uni L0 / L1 / BI
                        b0 = self._mv_search(src3[0], ref0["y"], gx0, gy0,
                                             amvp0, sl16, bd, ctb)
                        b1 = self._mv_search(src3[0], ref1["y"], gx0, gy0,
                                             amvp1, sl16, bd, ctb)
                        expl = {}
                        for dirn, rec in ((0, (1, 0, b0[1], (0, 0))),
                                          (1, (0, 1, (0, 0), b1[1])),
                                          (2, (1, 1, b0[1], b1[1]))):
                            p3 = mc_rec(rec)
                            te = tu3(src3, p3)
                            rqt = int(any(t[1] for t in te))
                            sse_e = sum(_sse(s, t[2])
                                        for s, t in zip(src3, te))
                            mb = (b0[3] if dirn in (0, 2) else 0) \
                                + (b1[3] if dirn in (1, 2) else 0)
                            base_bits = 16 if dirn != 2 else 24
                            bits = min(base_bits + mb + level_bits_estimate(
                                [t[0] for t in te] if rqt else []), 2048)
                            j = sse_e + ((lam16 * bits) >> 4)
                            expl[dirn] = (j, rec, te, rqt)
                            if j < choice[1]:
                                choice = (("l0", "l1", "bi")[dirn], j)

                        # intra (writes recon in place)
                        dec, lm = encode_ctu_v1(
                            vy, vcb, vcr, ry, rcb, rcr, cx, cy, ctb, qp, qpc,
                            None, sqrt_lam, left_modes, bd, hadamard_satd,
                            enable_nxn=self.nxn_p, sdh=cfg.sdh, rdoq=cfg.rdoq)
                        sse_i = _sse(vy[sl], ry[sl]) \
                            + _sse(vcb[slc], rcb[slc]) \
                            + _sse(vcr[slc], rcr[slc])
                        bits = min(8 + level_bits_estimate(
                            (dec["lvl_y"], dec["lvl_cb"], dec["lvl_cr"])),
                            2048)
                        j = sse_i + ((lam16 * bits) >> 4)
                        if j < choice[1]:
                            choice = ("intra", j)

                        gy, gx = ty0 + cy, tx0 + cx
                        kind = choice[0]
                        if kind == "intra":
                            ctus[gy][gx] = dec
                            cu_maps["intra"][gy, gx] = True
                            cu_maps["cbf"][gy, gx] = bool(np.any(dec["lvl_y"]))
                            left_modes = lm
                            continue
                        left_modes = (INTRA_DC, INTRA_DC)
                        if kind == "skip":
                            rec, rec3 = mrec, pm3
                            ctus[gy][gx] = {"skip": True}
                            cbf_l = False
                        elif kind == "merge":
                            rec = mrec
                            rec3 = [t[2] for t in tm]
                            ctus[gy][gx] = {
                                "inter": True, "merge": True,
                                "cbf_y": tm[0][1], "lvl_y": tm[0][0],
                                "cbf_cb": tm[1][1], "lvl_cb": tm[1][0],
                                "cbf_cr": tm[2][1], "lvl_cr": tm[2][0]}
                            cbf_l = bool(tm[0][1])
                        else:
                            dirn = ("l0", "l1", "bi").index(kind)
                            jv, rec, te, rqt = expl[dirn]
                            rec3 = [t[2] for t in te]
                            d = {"inter": True, "merge": False,
                                 "dir": dirn, "rqt": rqt}
                            if dirn in (0, 2):
                                d["mvd"] = (b0[1][0] - amvp0[b0[2]][0],
                                            b0[1][1] - amvp0[b0[2]][1])
                                d["mvp"] = b0[2]
                            if dirn in (1, 2):
                                d["mvd1"] = (b1[1][0] - amvp1[b1[2]][0],
                                             b1[1][1] - amvp1[b1[2]][1])
                                d["mvp1"] = b1[2]
                            if rqt:
                                d.update(cbf_y=te[0][1], lvl_y=te[0][0],
                                         cbf_cb=te[1][1], lvl_cb=te[1][0],
                                         cbf_cr=te[2][1], lvl_cr=te[2][0])
                            ctus[gy][gx] = d
                            cbf_l = bool(rqt and te[0][1])
                        rec_map[cy][cx] = rec
                        cu_maps["cbf"][gy, gx] = cbf_l
                        pf0, pf1, mv0, mv1 = rec
                        cu_maps["pf"][gy, gx] = (pf0, pf1)
                        cu_maps["mv"][gy, gx] = mv0 if pf0 else mv1
                        cu_maps["mv1"][gy, gx] = mv1
                        ry[sl], rcb[slc], rcr[slc] = rec3[0], rec3[1], rec3[2]
                tx0 += tw
            ty0 += th
        return ctus, {"y": rec_y, "cb": rec_cb, "cr": rec_cr}, cu_maps

    def _wp_for(self, cur3, ref3):
        """Per-P-frame weightp analysis (host, source domain); offsets
        are estimated in 8-bit units at any bit depth.  None when the
        tool is off; (64,0)x3 codes as an all-default table."""
        cfg = self.cfg
        if not cfg.weightp or not self.mc:
            return None
        from hevc_tpu.ops.inter import estimate_weights_p
        sh = cfg.bit_depth - 8
        args = []
        for c, r in zip(cur3, ref3):
            c = np.asarray(c)
            r = np.asarray(r)
            if sh:
                c, r = c >> sh, r >> sh
            args += [c, r]
        return estimate_weights_p(*args)

    def encode_video(self, frames, gop: int = 0):
        """Encode a GOP-structured sequence -> (annexb bytes, recons).

        gop=0: first frame IDR, rest P.  gop=N: IDR every N frames.
        Reference frame = deblocked previous reconstruction (DPB size 1).
        Recons returned are the deblocked (output) pictures.
        """
        from hevc_tpu.ops.deblock import deblock_frame
        from hevc_tpu.utils.bitio import annexb
        assert self.cfg.inter, "encode_video(P) requires cfg.inter"
        cfg = self.cfg
        if cfg.bframes:
            return self._encode_video_b(frames, gop)
        out = annexb(self.parameter_sets())
        ref = None
        recons = []
        poc = 0
        for i, (y, cb, cr) in enumerate(frames):
            idr = ref is None or (gop and i % gop == 0)
            wp = None
            if idr:
                ctus, recon = self.encode_frame_decisions(y, cb, cr)
                cu_maps = None
                poc = 0
            else:
                poc += 1
                wp = self._wp_for(frames[i], frames[i - 1])
                ctus, recon, cu_maps = self.encode_frame_p_decisions(
                    y, cb, cr, ref, wp=wp)
            nh, nw = len(ctus), len(ctus[0])
            nxn_map = np.array([[bool(c.get("part_nxn")) for c in row]
                                for row in ctus])
            dy = recon["y"].copy()
            dcb = recon["cb"].copy()
            dcr = recon["cr"].copy()
            tx = tyy = None
            if cfg.tiles_enabled:
                cols, rows_ = cfg.tile_grid()
                tx = list(np.cumsum(cols)[:-1] * cfg.ctb)
                tyy = list(np.cumsum(rows_)[:-1] * cfg.ctb)
            if cfg.deblock:
                deblock_frame(dy, dcb, dcr, cfg.qp, ctb=cfg.ctb,
                              bit_depth=cfg.bit_depth,
                              tile_cols_px=tx, tile_rows_px=tyy,
                              nxn_map=nxn_map, cu_maps=cu_maps)
            sao_params = None
            if cfg.sao:
                from hevc_tpu.ops.sao import estimate_and_apply_sao
                qp_eff = cfg.qp + 6 * (cfg.bit_depth - 8)
                src3 = (pad_to_ctb(np.asarray(y), cfg.ctb),
                        pad_to_ctb(np.asarray(cb), cfg.ctb // 2),
                        pad_to_ctb(np.asarray(cr), cfg.ctb // 2))
                p_y, p_c, out3 = estimate_and_apply_sao(
                    src3, (dy, dcb, dcr), cfg.ctb, cfg.bit_depth,
                    skip_lambda16(qp_eff), tx, tyy)
                dy, dcb, dcr = out3
                sao_params = (p_y, p_c)
            nal = entropy_encode_frame_v1(cfg, ctus, sao=sao_params,
                                          poc=None if idr else poc,
                                          wp=None if idr else wp)
            out += b"\x00\x00\x00\x01" + nal
            ref = {"y": dy, "cb": dcb, "cr": dcr}
            recons.append(ref)
        return out, recons

    # ---- IbPbP GOP driver (decode order != display order) ---------------------
    def _finish_pic(self, ctus, recon, cu_maps, y, cb, cr, qp=None,
                    do_sao: bool | None = None):
        """Deblock (+SAO) one picture; returns (display planes, sao params).

        do_sao=False skips SAO even when cfg.sao: the framework codes
        non-reference B slices with slice_sao_*_flag=0 (policy shared
        with the chunked device path, which would otherwise need the
        two-list deblock BS rule on device for the B reconstruction)."""
        from hevc_tpu.ops.deblock import deblock_frame
        cfg = self.cfg
        qp = cfg.qp if qp is None else qp
        nxn_map = np.array([[bool(c.get("part_nxn")) for c in row]
                            for row in ctus])
        dy = recon["y"].copy()
        dcb = recon["cb"].copy()
        dcr = recon["cr"].copy()
        tx = tyy = None
        if cfg.tiles_enabled:
            cols, rows_ = cfg.tile_grid()
            tx = list(np.cumsum(cols)[:-1] * cfg.ctb)
            tyy = list(np.cumsum(rows_)[:-1] * cfg.ctb)
        if cfg.deblock:
            deblock_frame(dy, dcb, dcr, qp, ctb=cfg.ctb,
                          bit_depth=cfg.bit_depth,
                          tile_cols_px=tx, tile_rows_px=tyy,
                          nxn_map=nxn_map, cu_maps=cu_maps)
        sao_params = None
        if cfg.sao and do_sao is not False:
            from hevc_tpu.ops.sao import estimate_and_apply_sao
            qp_eff = qp + 6 * (cfg.bit_depth - 8)
            src3 = (pad_to_ctb(np.asarray(y), cfg.ctb),
                    pad_to_ctb(np.asarray(cb), cfg.ctb // 2),
                    pad_to_ctb(np.asarray(cr), cfg.ctb // 2))
            p_y, p_c, out3 = estimate_and_apply_sao(
                src3, (dy, dcb, dcr), cfg.ctb, cfg.bit_depth,
                skip_lambda16(qp_eff), tx, tyy)
            dy, dcb, dcr = out3
            sao_params = (p_y, p_c)
        return {"y": dy, "cb": dcb, "cr": dcr}, sao_params

    def _encode_video_b(self, frames, gop: int = 0):
        """B GOP driver (decode order != display order), scheduled by
        encoder.gop.b_schedule: cfg.bframes_n non-reference B pictures
        between anchors (1 = IbPbP, 2 = IbbPbbP).  Each B references the
        nearest past/future anchors per its RPS set (the device chunk
        path mirrors this schedule exactly).
        Returns (annexb bytes, recons in DISPLAY order)."""
        import dataclasses
        from hevc_tpu.utils.bitio import annexb
        from hevc_tpu.encoder.gop import b_schedule
        from hevc_tpu.entropy.headers import rps_sets
        cfg = self.cfg
        sets = rps_sets(cfg)
        out = annexb(self.parameter_sets())
        n = len(frames)
        recons = [None] * n
        refs = {}                     # display idx -> deblocked planes
        seg0 = 0                      # current segment's IDR display idx
        prev_ref_disp = None
        cfg_b = dataclasses.replace(
            cfg, qp=min(cfg.qp + self.B_QP_OFFSET, 51))
        for (disp, kind, poc, rps) in b_schedule(n, gop, True,
                                                 cfg.bframes_n):
            if kind == 0:
                refs.clear()
                seg0 = disp
                ctus, recon = self.encode_frame_decisions(*frames[disp])
                dispf, sao_p = self._finish_pic(ctus, recon, None,
                                                *frames[disp])
                nal = entropy_encode_frame_v1(cfg, ctus, sao=sao_p)
                prev_ref_disp = disp
            elif kind == 1:
                wp = self._wp_for(frames[disp], frames[prev_ref_disp])
                ctus, recon, maps = self.encode_frame_p_decisions(
                    *frames[disp], refs[prev_ref_disp], wp=wp)
                dispf, sao_p = self._finish_pic(ctus, recon, maps,
                                                *frames[disp])
                nal = entropy_encode_frame_v1(cfg, ctus, poc=poc,
                                              sao=sao_p, rps_idx=rps,
                                              wp=wp)
                prev_ref_disp = disp
            else:
                neg, pos = sets[rps]
                l0, l1 = disp - neg[0], disp + pos[0]
                ctus, recon, maps = self.encode_frame_b_decisions(
                    *frames[disp], refs[l0], refs[l1],
                    (poc, l0 - seg0, l1 - seg0))
                dispf, _ = self._finish_pic(ctus, recon, maps,
                                            *frames[disp], qp=cfg_b.qp,
                                            do_sao=False)
                nal = entropy_encode_frame_v1(cfg_b, ctus, poc=poc,
                                              sao=None, b_slice=True,
                                              rps_idx=rps)
            out += b"\x00\x00\x00\x01" + nal
            if kind != 2:
                refs[disp] = dispf
            recons[disp] = dispf
        return out, recons
