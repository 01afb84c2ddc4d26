"""Numpy reference encoder for the ctb32 profile (two-level quadtree).

Behavioral spec for the device kernel: every decision rule here (candidate
sets, j-cost models, tie-breaks, scan orders) must be replicated bit-exactly
by the JAX ctb32 graph, and the emitted stream must decode bit-exactly in
the in-framework decoder and libavcodec.

Profile (see entropy/ctb32.py): CTB 32 / min CB 16 / max TB 16, no
PART_NxN; CU32 candidates are inter skip/merge/explicit (one MV per list)
plus intra 2Nx2N (I slices); CU16 candidates are the v1 toolset minus NxN.
Split decision: sum of quadrant RD costs vs the best 32-level cost
(strict <; ties keep the 32 CU).

Replaces the reference's x265 64/8 coding quadtree delegation (reference
core/transcoder.py:398-412) with a first-party 32/16 tree.
"""
from __future__ import annotations

import numpy as np

from hevc_tpu.encoder.ctu_modes import (encode_tu, level_bits_estimate,
                                        mode_bits_estimate, skip_lambda16)
from hevc_tpu.encoder.reference_encoder import pad_to_ctb, hadamard_satd
from hevc_tpu.entropy.ctb32 import entropy_encode_frame_ctb32
from hevc_tpu.entropy.headers import StreamConfig, write_vps, write_sps, \
    write_pps
from hevc_tpu.entropy.syntax import mpm_candidates, INTRA_DC
from hevc_tpu.ops import inter as M
from hevc_tpu.ops import reference as R

INF = 1 << 60


def _sse(a, b) -> int:
    d = np.asarray(a, np.int64) - np.asarray(b, np.int64)
    return int((d * d).sum())


def make_ctb32_config(**kw) -> StreamConfig:
    kw.setdefault("log2_ctb", 5)
    kw.setdefault("log2_min_cb", 4)
    kw.setdefault("log2_max_tb", 4)
    return StreamConfig(**kw)


# per-quadrant intra availability inside a 32 CTB (z-order q0..q3):
# (left_from_ctb, above_from_ctb, left_valid_x n, top_valid_x n) where
# left/top valid lengths are in units of the TB size n (1 or 2) and
# 'ar' marks q1's top-right dependence on the above-right CTB
_QUAD = [  # (dx16, dy16, left_is_ctb, above_is_ctb, lv2, tv2, tr_is_ar)
    (0, 0, True, True, True, True, False),
    (1, 0, False, True, False, True, True),
    (0, 1, True, False, False, True, False),
    (1, 1, False, False, False, False, False),
]


class Ctb32RefEncoder:
    """CTB-32 two-level-quadtree encoder (numpy, exact)."""

    B_QP_OFFSET = 2

    def __init__(self, cfg: StreamConfig, subpel: bool = True):
        assert cfg.log2_ctb == 5 and cfg.log2_min_cb == 4 \
            and cfg.log2_max_tb == 4
        self.cfg = cfg
        self.subpel = subpel
        # every ctb32-profile TB is diag-scanned (TU16 luma / TB8 chroma,
        # spec 7.4.9.11 mode-dependent scans only reach log2 sizes 2-3
        # luma): one static sdh scan for the parity fix-up
        self._sdh_scan = 0 if cfg.sdh else None

    def parameter_sets(self) -> list[bytes]:
        return [write_vps(self.cfg), write_sps(self.cfg),
                write_pps(self.cfg)]

    # ---- shared helpers -------------------------------------------------------
    def _lams(self, qp_eff):
        lam = 0.85 * 2.0 ** ((qp_eff - 12) / 3.0)
        return float(np.sqrt(lam)), skip_lambda16(qp_eff)

    def _mv_search(self, src, ref_y, gx0, gy0, amvp, sl16, bd, n,
                   wp_l=None):
        """Size-n hierarchical search — same pyramid/tie rules as
        RefIntraEncoderV1._mv_search (reference_encoder_v1.py).  wp_l:
        (w, o) luma weights; SAD stages run on the weighted window."""
        from hevc_tpu.encoder.reference_encoder_v1 import RefIntraEncoderV1
        return RefIntraEncoderV1._mv_search(
            self, src, ref_y, gx0, gy0, amvp, sl16, bd, n, wp_l=wp_l)

    def _tu3(self, src3, pred3, qp, qpc, bd):
        out = []
        for (s, p, q) in ((src3[0], pred3[0], qp), (src3[1], pred3[1], qpc),
                          (src3[2], pred3[2], qpc)):
            out.append(encode_tu(s, p, q, bd, sdh_scan=self._sdh_scan, rdoq=self.cfg.rdoq))
        return out

    def _tu32(self, src3, pred3, qp, qpc, bd):
        """Forced-split residual of a 32 CU: four TU16 luma + TB8 chroma
        quadrants (independent for inter prediction).  Returns
        (lvl3 32-size arrays, cbf_q lists per plane, rec3)."""
        lvl3 = [np.zeros((32, 32), np.int32), np.zeros((16, 16), np.int32),
                np.zeros((16, 16), np.int32)]
        rec3 = [np.empty((32, 32), np.int32), np.empty((16, 16), np.int32),
                np.empty((16, 16), np.int32)]
        cbfs = [[], [], []]
        for q in range(4):
            dx, dy = (q & 1) * 16, (q >> 1) * 16
            for pi, (n, qv) in enumerate(((16, qp), (8, qpc), (8, qpc))):
                d2x, d2y = (dx, dy) if pi == 0 else (dx // 2, dy // 2)
                lvl, cbf, rec = encode_tu(
                    src3[pi][d2y:d2y + n, d2x:d2x + n],
                    pred3[pi][d2y:d2y + n, d2x:d2x + n], qv,
                    self.cfg.bit_depth, sdh_scan=self._sdh_scan, rdoq=self.cfg.rdoq)
                lvl3[pi][d2y:d2y + n, d2x:d2x + n] = lvl
                rec3[pi][d2y:d2y + n, d2x:d2x + n] = rec
                cbfs[pi].append(int(cbf))
        return lvl3, cbfs, rec3

    def _intra_refs(self, recon, x0, y0, n, al, aa, lv2, tv2, bd):
        lv = (2 * n if lv2 else n) if al else None
        tv = (2 * n if tv2 else n) if aa else None
        return R.build_reference(recon, x0, y0, n, al, aa, bd, lv, tv)

    def _intra16_2n(self, vy, vcb, vcr, ry, rcb, rcr, x0, y0, mode_cands,
                    qp, qpc, sqrt_lam, al, aa, lv2, tv2, bd):
        """2Nx2N intra CU16 at tile-local (x0, y0): 35-mode search + TU.

        Writes recon in place; returns (dec fields, j-cost pieces)."""
        src = vy[y0:y0 + 16, x0:x0 + 16]
        ref = self._intra_refs(ry, x0, y0, 16, al, aa, lv2, tv2, bd)
        reff = R.filter_reference(ref, 16)
        best = None
        for mode in range(35):
            r = reff if R.use_filtered_ref(mode, 16, 0) else ref
            pred = R.predict_intra(r, mode, 16, 0, bd)
            cost = hadamard_satd(src - pred) + \
                int(sqrt_lam * mode_bits_estimate(mode, mode_cands))
            if best is None or cost < best[0]:
                best = (cost, mode, pred)
        mode = best[1]
        lvl_y, cbf_y, rec = encode_tu(src, best[2], qp, bd,
                                      sdh_scan=self._sdh_scan, rdoq=self.cfg.rdoq)
        ry[y0:y0 + 16, x0:x0 + 16] = rec
        xc, yc = x0 // 2, y0 // 2
        out_c = []
        for plane, recp in ((vcb, rcb), (vcr, rcr)):
            refc = self._intra_refs(recp, xc, yc, 8, al, aa, lv2, tv2, bd)
            predc = R.predict_intra(refc, mode, 8, 1, bd)
            lvlc, cbfc, recc = encode_tu(plane[yc:yc + 8, xc:xc + 8],
                                         predc, qpc, bd,
                                         sdh_scan=self._sdh_scan, rdoq=self.cfg.rdoq)
            recp[yc:yc + 8, xc:xc + 8] = recc
            out_c.append((lvlc, cbfc))
        return dict(mode=mode, lvl_y=lvl_y, cbf_y=int(cbf_y),
                    lvl_cb=out_c[0][0], cbf_cb=int(out_c[0][1]),
                    lvl_cr=out_c[1][0], cbf_cr=int(out_c[1][1]))

    def _intra32(self, vy, vcb, vcr, ry, rcb, rcr, x0, y0, mode_cands,
                 qp, qpc, sqrt_lam, al, aa, ar, bd):
        """Intra 32 CU: mode by whole-32 SATD on CTB-boundary refs, then
        the normative forced-split TU16 chain.  Writes recon in place."""
        src = vy[y0:y0 + 32, x0:x0 + 32]
        ref = self._intra_refs(ry, x0, y0, 32, al, aa, False, ar, bd)
        reff = R.filter_reference(ref, 32)
        best = None
        for mode in range(35):
            r = reff if R.use_filtered_ref(mode, 32, 0) else ref
            pred = R.predict_intra(r, mode, 32, 0, bd)
            cost = hadamard_satd(src - pred) + \
                int(sqrt_lam * mode_bits_estimate(mode, mode_cands))
            if best is None or cost < best[0]:
                best = (cost, mode)
        mode = best[1]
        lvl_y = np.zeros((32, 32), np.int32)
        cbf_yq = []
        for q, (qx, qy, lctb, actb, lv2, tv2, tr_ar) in enumerate(_QUAD):
            x1, y1 = x0 + 16 * qx, y0 + 16 * qy
            qal = al if lctb else True
            qaa = aa if actb else True
            qtv2 = tv2 if not tr_ar else ar
            refq = self._intra_refs(ry, x1, y1, 16, qal, qaa, lv2, qtv2, bd)
            rq = R.filter_reference(refq, 16) \
                if R.use_filtered_ref(mode, 16, 0) else refq
            pred = R.predict_intra(rq, mode, 16, 0, bd)
            lvl, cbf, rec = encode_tu(vy[y1:y1 + 16, x1:x1 + 16], pred,
                                      qp, bd, sdh_scan=self._sdh_scan, rdoq=self.cfg.rdoq)
            lvl_y[16 * qy:16 * qy + 16, 16 * qx:16 * qx + 16] = lvl
            ry[y1:y1 + 16, x1:x1 + 16] = rec
            cbf_yq.append(int(cbf))
        xc, yc = x0 // 2, y0 // 2
        lvl_c = [np.zeros((16, 16), np.int32), np.zeros((16, 16), np.int32)]
        cbf_cq = [[], []]
        for pi, (plane, recp) in enumerate(((vcb, rcb), (vcr, rcr))):
            for q, (qx, qy, lctb, actb, lv2, tv2, tr_ar) in enumerate(_QUAD):
                x1, y1 = xc + 8 * qx, yc + 8 * qy
                qal = al if lctb else True
                qaa = aa if actb else True
                qtv2 = tv2 if not tr_ar else ar
                refc = self._intra_refs(recp, x1, y1, 8, qal, qaa, lv2,
                                        qtv2, bd)
                predc = R.predict_intra(refc, mode, 8, 1, bd)
                lvlc, cbfc, recc = encode_tu(plane[y1:y1 + 8, x1:x1 + 8],
                                             predc, qpc, bd,
                                             sdh_scan=self._sdh_scan, rdoq=self.cfg.rdoq)
                lvl_c[pi][8 * qy:8 * qy + 8, 8 * qx:8 * qx + 8] = lvlc
                recp[y1:y1 + 8, x1:x1 + 8] = recc
                cbf_cq[pi].append(int(cbfc))
        return dict(mode=mode, lvl_y=lvl_y, cbf_yq=cbf_yq,
                    lvl_cb=lvl_c[0], cbf_cbq=cbf_cq[0],
                    lvl_cr=lvl_c[1], cbf_crq=cbf_cq[1])

    # ---- decision array allocation -------------------------------------------
    def _alloc(self, nh16, nw16):
        nh32, nw32 = nh16 // 2, nw16 // 2
        z = np.zeros
        dec = {
            "modes4": z((nh16, nw16, 4), np.int32),
            "cbf_y4": z((nh16, nw16, 4), bool),
            "cbf_cb": z((nh16, nw16), bool), "cbf_cr": z((nh16, nw16), bool),
            "cbf_cb4": z((nh16, nw16, 4), bool),
            "cbf_cr4": z((nh16, nw16, 4), bool),
            "part_nxn": z((nh16, nw16), bool),
            "lvl_y": z((nh16, nw16, 16, 16), np.int32),
            "lvl_cb": z((nh16, nw16, 8, 8), np.int32),
            "lvl_cr": z((nh16, nw16, 8, 8), np.int32),
            "skip": z((nh16, nw16), bool), "inter": z((nh16, nw16), bool),
            "merge": z((nh16, nw16), bool),
            "mvd": z((nh16, nw16, 2), np.int32),
            "mvp": z((nh16, nw16), np.int32),
            "rqt": z((nh16, nw16), np.int32),
            "midx": z((nh16, nw16), np.int32),
            "dir": z((nh16, nw16), np.int32),
            "mvd1": z((nh16, nw16, 2), np.int32),
            "mvp1": z((nh16, nw16), np.int32),
            "cbf_yi": z((nh16, nw16), bool), "cbf_cbi": z((nh16, nw16), bool),
            "cbf_cri": z((nh16, nw16), bool),
            "split32": z((nh32, nw32), bool),
            "skip32": z((nh32, nw32), bool),
            "inter32": z((nh32, nw32), bool),
            "merge32": z((nh32, nw32), bool),
            "dir32": z((nh32, nw32), np.int32),
            "mvd32": z((nh32, nw32, 2), np.int32),
            "mvp32": z((nh32, nw32), np.int32),
            "mvd32_1": z((nh32, nw32, 2), np.int32),
            "mvp32_1": z((nh32, nw32), np.int32),
            "rqt32": z((nh32, nw32), np.int32),
            "midx32": z((nh32, nw32), np.int32),
            "mode32": z((nh32, nw32), np.int32),
            "cbf32_cb": z((nh32, nw32), bool),
            "cbf32_cr": z((nh32, nw32), bool),
        }
        return dec

    def _store_cu32(self, dec, g32y, g32x, res32, lvl3=None, cbfs=None):
        """Write a 32-CU's per-quadrant residual data into the 16-grid."""
        for q in range(4):
            gy, gx = 2 * g32y + (q >> 1), 2 * g32x + (q & 1)
            dx, dy = (q & 1) * 16, (q >> 1) * 16
            if lvl3 is not None:
                dec["lvl_y"][gy, gx] = lvl3[0][dy:dy + 16, dx:dx + 16]
                dec["lvl_cb"][gy, gx] = lvl3[1][dy // 2:dy // 2 + 8,
                                                dx // 2:dx // 2 + 8]
                dec["lvl_cr"][gy, gx] = lvl3[2][dy // 2:dy // 2 + 8,
                                                dx // 2:dx // 2 + 8]
                dec["cbf_y4"][gy, gx, 0] = bool(cbfs[0][q])
                dec["cbf_cb"][gy, gx] = bool(cbfs[1][q])
                dec["cbf_cr"][gy, gx] = bool(cbfs[2][q])
        if lvl3 is not None:
            dec["cbf32_cb"][g32y, g32x] = any(cbfs[1])
            dec["cbf32_cr"][g32y, g32x] = any(cbfs[2])

    # ---- frame encoders -------------------------------------------------------
    def encode_frame_i(self, y, cb, cr):
        """IDR frame -> (decision arrays, recon planes)."""
        cfg = self.cfg
        bd = cfg.bit_depth
        qp_bd = 6 * (bd - 8)
        qp = cfg.qp + qp_bd
        qpc = R.chroma_qp(cfg.qp) + qp_bd
        sqrt_lam, lam16 = self._lams(qp)
        ys = pad_to_ctb(np.asarray(y), 32)
        cbs = pad_to_ctb(np.asarray(cb), 16)
        crs = pad_to_ctb(np.asarray(cr), 16)
        H, W = ys.shape
        nh16, nw16 = H // 16, W // 16
        dec = self._alloc(nh16, nw16)
        rec_y = np.zeros_like(ys)
        rec_cb = np.zeros((H // 2, W // 2), np.int32)
        rec_cr = np.zeros((H // 2, W // 2), np.int32)

        cols, rows = cfg.tile_grid()      # in 32-CTB units
        ty0 = 0
        for th in rows:
            tx0 = 0
            for tw in cols:
                self._encode_tile_i(ys, cbs, crs, rec_y, rec_cb, rec_cr,
                                    tx0, ty0, tw, th, qp, qpc, sqrt_lam,
                                    lam16, dec, bd)
                tx0 += tw
            ty0 += th
        return dec, {"y": rec_y, "cb": rec_cb, "cr": rec_cr}

    def _encode_tile_i(self, ys, cbs, crs, rec_y, rec_cb, rec_cr,
                       tx0, ty0, tw, th, qp, qpc, sqrt_lam, lam16, dec, bd):
        vy = ys[ty0 * 32:(ty0 + th) * 32, tx0 * 32:(tx0 + tw) * 32]
        vcb = cbs[ty0 * 16:(ty0 + th) * 16, tx0 * 16:(tx0 + tw) * 16]
        vcr = crs[ty0 * 16:(ty0 + th) * 16, tx0 * 16:(tx0 + tw) * 16]
        ry = rec_y[ty0 * 32:(ty0 + th) * 32, tx0 * 32:(tx0 + tw) * 32]
        rcb = rec_cb[ty0 * 16:(ty0 + th) * 16, tx0 * 16:(tx0 + tw) * 16]
        rcr = rec_cr[ty0 * 16:(ty0 + th) * 16, tx0 * 16:(tx0 + tw) * 16]
        modes16 = np.full((2 * th, 2 * tw), -1, np.int32)

        for cy32 in range(th):
            for cx32 in range(tw):
                x0, y0 = 32 * cx32, 32 * cy32
                al, aa = cx32 > 0, cy32 > 0
                ar = aa and cx32 < tw - 1
                cyc, cxc = 2 * cy32, 2 * cx32
                save = (ry[y0:y0 + 32, x0:x0 + 32].copy(),
                        rcb[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16].copy(),
                        rcr[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16].copy())

                # --- candidate A: four intra16 quadrants (z-order) ---
                q16 = []
                j16 = 0
                for q, (qx, qy, lctb, actb, lv2, tv2, tr_ar) in \
                        enumerate(_QUAD):
                    x1, y1 = x0 + 16 * qx, y0 + 16 * qy
                    qal = al if lctb else True
                    qaa = aa if actb else True
                    qtv2 = tv2 if not tr_ar else ar
                    a = b = INTRA_DC
                    lcx, lcy = cxc + qx - 1, cyc + qy
                    if (qx == 1 or al) and modes16[lcy, lcx] >= 0:
                        a = int(modes16[lcy, lcx])
                    if qy == 1 and modes16[cyc, cxc + qx] >= 0:
                        b = int(modes16[cyc, cxc + qx])
                    cands = mpm_candidates(a, b)
                    r = self._intra16_2n(vy, vcb, vcr, ry, rcb, rcr, x1, y1,
                                         cands, qp, qpc, sqrt_lam, qal, qaa,
                                         lv2, qtv2, bd)
                    modes16[cyc + qy, cxc + qx] = r["mode"]
                    sse = _sse(vy[y1:y1 + 16, x1:x1 + 16],
                               ry[y1:y1 + 16, x1:x1 + 16]) \
                        + _sse(vcb[y1 // 2:y1 // 2 + 8, x1 // 2:x1 // 2 + 8],
                               rcb[y1 // 2:y1 // 2 + 8, x1 // 2:x1 // 2 + 8]) \
                        + _sse(vcr[y1 // 2:y1 // 2 + 8, x1 // 2:x1 // 2 + 8],
                               rcr[y1 // 2:y1 // 2 + 8, x1 // 2:x1 // 2 + 8])
                    bits = min(8 + level_bits_estimate(
                        (r["lvl_y"], r["lvl_cb"], r["lvl_cr"])), 2048)
                    j16 += sse + ((lam16 * bits) >> 4)
                    q16.append(r)
                rec16 = (ry[y0:y0 + 32, x0:x0 + 32].copy(),
                         rcb[y0 // 2:y0 // 2 + 16,
                             x0 // 2:x0 // 2 + 16].copy(),
                         rcr[y0 // 2:y0 // 2 + 16,
                             x0 // 2:x0 // 2 + 16].copy())

                # --- candidate B: one intra32 (restore pre-CTB state) ---
                ry[y0:y0 + 32, x0:x0 + 32] = save[0]
                rcb[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16] = save[1]
                rcr[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16] = save[2]
                a = INTRA_DC
                if al and modes16[cyc, cxc - 1] >= 0:
                    # NOTE: left col mode from the committed left CTB
                    a = int(modes16[cyc, cxc - 1])
                r32 = self._intra32(vy, vcb, vcr, ry, rcb, rcr, x0, y0,
                                    mpm_candidates(a, INTRA_DC), qp, qpc,
                                    sqrt_lam, al, aa, ar, bd)
                sse32 = _sse(vy[y0:y0 + 32, x0:x0 + 32],
                             ry[y0:y0 + 32, x0:x0 + 32]) \
                    + _sse(vcb[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16],
                           rcb[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16]) \
                    + _sse(vcr[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16],
                           rcr[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16])
                bits32 = min(8 + level_bits_estimate(
                    (r32["lvl_y"], r32["lvl_cb"], r32["lvl_cr"])), 8192)
                j32 = sse32 + ((lam16 * bits32) >> 4)

                g32y, g32x = ty0 + cy32, tx0 + cx32
                if j16 < j32:
                    # restore the quadrant recon and commit A
                    ry[y0:y0 + 32, x0:x0 + 32] = rec16[0]
                    rcb[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16] = rec16[1]
                    rcr[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16] = rec16[2]
                    dec["split32"][g32y, g32x] = True
                    for q, r in enumerate(q16):
                        gy = 2 * g32y + (q >> 1)
                        gx = 2 * g32x + (q & 1)
                        dec["modes4"][gy, gx] = r["mode"]
                        dec["cbf_y4"][gy, gx, 0] = bool(r["cbf_y"])
                        dec["cbf_cb"][gy, gx] = bool(r["cbf_cb"])
                        dec["cbf_cr"][gy, gx] = bool(r["cbf_cr"])
                        dec["lvl_y"][gy, gx] = r["lvl_y"]
                        dec["lvl_cb"][gy, gx] = r["lvl_cb"]
                        dec["lvl_cr"][gy, gx] = r["lvl_cr"]
                else:
                    dec["mode32"][g32y, g32x] = r32["mode"]
                    modes16[cyc:cyc + 2, cxc:cxc + 2] = r32["mode"]
                    lvl3 = (r32["lvl_y"], r32["lvl_cb"], r32["lvl_cr"])
                    cbfs = (r32["cbf_yq"], r32["cbf_cbq"], r32["cbf_crq"])
                    self._store_cu32(dec, g32y, g32x, r32, lvl3, cbfs)

    def encode_frame_p(self, y, cb, cr, ref: dict, ref1: dict | None = None,
                       pocs: tuple | None = None, qp_ovr: int | None = None,
                       wp=None, colctx: dict | None = None):
        """P (or B when ref1 is given) frame -> (dec arrays, recon, cu_maps).

        ref/ref1: deblocked full reference planes; pocs=(cur, poc0, poc1)
        for B cross-list scaling.  wp: explicit P weights (wy, oy, wcb,
        ocb, wcr, ocr) applied to every inter prediction and inside the
        motion search (spec 8.5.3.2.9.3); B slices ignore it.
        colctx (cfg.tmvp): the collocated picture's GLOBAL-cell motion
        field {"avail", "mv", "dsf": (dsf0, dsf1|None)} for the temporal
        merge/AMVP candidate (spec 8.5.3.2.8); None disables it.
        """
        cfg = self.cfg
        bd = cfg.bit_depth
        qp_bd = 6 * (bd - 8)
        qp_s = cfg.qp if qp_ovr is None else qp_ovr
        qp = qp_s + qp_bd
        qpc = R.chroma_qp(qp_s) + qp_bd
        sqrt_lam, lam16 = self._lams(qp)
        ys = pad_to_ctb(np.asarray(y), 32)
        cbs = pad_to_ctb(np.asarray(cb), 16)
        crs = pad_to_ctb(np.asarray(cr), 16)
        H, W = ys.shape
        nh16, nw16 = H // 16, W // 16
        dec = self._alloc(nh16, nw16)
        rec_y = np.zeros_like(ys)
        rec_cb = np.zeros((H // 2, W // 2), np.int32)
        rec_cr = np.zeros((H // 2, W // 2), np.int32)
        cu_maps = {"intra": np.zeros((nh16, nw16), bool),
                   "cbf": np.zeros((nh16, nw16), bool),
                   "mv": np.zeros((nh16, nw16, 2), np.int32),
                   "mv1": np.zeros((nh16, nw16, 2), np.int32),
                   "pf": np.zeros((nh16, nw16, 2), np.int32)}
        cols, rows = cfg.tile_grid()
        ty0 = 0
        for th in rows:
            tx0 = 0
            for tw in cols:
                self._encode_tile_p(ys, cbs, crs, rec_y, rec_cb, rec_cr,
                                    ref, ref1, pocs, tx0, ty0, tw, th,
                                    qp, qpc, sqrt_lam, lam16, dec, cu_maps,
                                    bd, wp=wp, colctx=colctx)
                tx0 += tw
            ty0 += th
        return dec, {"y": rec_y, "cb": rec_cb, "cr": rec_cr}, cu_maps

    def _encode_tile_p(self, ys, cbs, crs, rec_y, rec_cb, rec_cr, ref, ref1,
                       pocs, tx0, ty0, tw, th, qp, qpc, sqrt_lam, lam16,
                       dec, cu_maps, bd, wp=None, colctx=None):
        b_slice = ref1 is not None
        if b_slice:
            wp = None          # weightp is a P-slice tool here (v1 policy)
        wp_l = None if wp is None else wp[:2]
        sl16 = int(sqrt_lam * 16)
        vy = ys[ty0 * 32:(ty0 + th) * 32, tx0 * 32:(tx0 + tw) * 32]
        vcb = cbs[ty0 * 16:(ty0 + th) * 16, tx0 * 16:(tx0 + tw) * 16]
        vcr = crs[ty0 * 16:(ty0 + th) * 16, tx0 * 16:(tx0 + tw) * 16]
        ry = rec_y[ty0 * 32:(ty0 + th) * 32, tx0 * 32:(tx0 + tw) * 32]
        rcb = rec_cb[ty0 * 16:(ty0 + th) * 16, tx0 * 16:(tx0 + tw) * 16]
        rcr = rec_cr[ty0 * 16:(ty0 + th) * 16, tx0 * 16:(tx0 + tw) * 16]
        nh, nw = 2 * th, 2 * tw          # tile-local 16-grid
        rec_map = [[None] * nw for _ in range(nh)]
        modes16 = np.full((nh, nw), -1, np.int32)
        cur_poc, poc0, poc1 = pocs if pocs else (0, 0, None)
        mcand = self.cfg.merge_cands

        def tmvp(cy, cx, ns):
            """(col merge record, (col_mvp_l0, col_mvp_l1)) for a CU of
            ns cells at TILE-local cell (cy, cx) — the col walk runs on
            the frame-global grid (tiles don't bound TMVP)."""
            if colctx is None:
                return None, (None, None)
            gcy, gcx = ty0 * 2 + cy, tx0 * 2 + cx
            ca = colctx["avail"]
            tm = M.tmvp_col_mv(ca, colctx["mv"], gcy, gcx, ns,
                               ca.shape[0], ca.shape[1], ctb_cells=2)
            if tm is None:
                return None, (None, None)
            dsf0, dsf1 = colctx["dsf"]
            m0 = M._scale_col(tm, dsf0)
            if b_slice:
                m1 = M._scale_col(tm, dsf1)
                return (1, 1, m0, m1), (m0, m1)
            return (1, 0, m0, (0, 0)), (m0, None)

        def mc3(refp, x1, y1, n, rec):
            """(y, cb, cr) prediction for an n-CU at tile-local (x1, y1)
            from a motion record (uni or bi)."""
            gx, gy = tx0 * 32 + x1, ty0 * 32 + y1
            pf0, pf1, mv0, mv1 = rec
            if pf0 and pf1:
                return M.mc_block_bi(refp[0], refp[1], gx, gy, n, mv0, mv1,
                                     bd)
            rp = refp[0] if pf0 else refp[1]
            return M.mc_block_w(rp, gx, gy, n, mv0 if pf0 else mv1, wp, bd)

        def explicit_eval(src3, x1, y1, n, nbrs, cmvp=(None, None)):
            """Best explicit candidate(s): [(j, rec_m, te, rqt, extra)].
            cmvp: per-list temporal MVP fallbacks (spec 8.5.3.2.6)."""
            gx, gy = tx0 * 32 + x1, ty0 * 32 + y1
            outs = []
            if not b_slice:
                amvp = M.amvp_list_b(nbrs, 0, 1, (0, None),
                                     col_mvp=cmvp[0])
                _, mv_e, mvp_e, mbits = self._mv_search(
                    src3[0], ref["y"], gx, gy, amvp, sl16, bd, n,
                    wp_l=wp_l)
                pe3 = M.mc_block_w(ref, gx, gy, n, mv_e, wp, bd)
                te, rqt, sse_e, lv = self._resid(src3, pe3, n, qp, qpc, bd)
                bits = min(16 + mbits + level_bits_estimate(lv),
                           2048 if n == 16 else 8192)
                j = sse_e + ((lam16 * bits) >> 4)
                rec_m = (1, 0, mv_e, (0, 0))
                outs.append((j, rec_m, te, rqt,
                             dict(dir=0, mvd=(mv_e[0] - amvp[mvp_e][0],
                                              mv_e[1] - amvp[mvp_e][1]),
                                  mvp=mvp_e)))
                return outs
            amvp0 = M.amvp_list_b(nbrs, 0, cur_poc, (poc0, poc1),
                                  col_mvp=cmvp[0])
            amvp1 = M.amvp_list_b(nbrs, 1, cur_poc, (poc0, poc1),
                                  col_mvp=cmvp[1])
            b0 = self._mv_search(src3[0], ref["y"], gx, gy, amvp0, sl16,
                                 bd, n)
            b1 = self._mv_search(src3[0], ref1["y"], gx, gy, amvp1, sl16,
                                 bd, n)
            cands = [
                ((1, 0, b0[1], (0, 0)), 16 + b0[3],
                 dict(dir=0, mvd=(b0[1][0] - amvp0[b0[2]][0],
                                  b0[1][1] - amvp0[b0[2]][1]), mvp=b0[2])),
                ((0, 1, (0, 0), b1[1]), 16 + b1[3],
                 dict(dir=1, mvd1=(b1[1][0] - amvp1[b1[2]][0],
                                   b1[1][1] - amvp1[b1[2]][1]),
                      mvp1=b1[2])),
                ((1, 1, b0[1], b1[1]), 24 + b0[3] + b1[3],
                 dict(dir=2, mvd=(b0[1][0] - amvp0[b0[2]][0],
                                  b0[1][1] - amvp0[b0[2]][1]), mvp=b0[2],
                      mvd1=(b1[1][0] - amvp1[b1[2]][0],
                            b1[1][1] - amvp1[b1[2]][1]), mvp1=b1[2])),
            ]
            for rec_m, hdr_bits, extra in cands:
                p3 = mc3((ref, ref1), x1, y1, n, rec_m)
                te, rqt, sse_e, lv = self._resid(src3, p3, n, qp, qpc, bd)
                bits = min(hdr_bits + level_bits_estimate(lv),
                           2048 if n == 16 else 8192)
                outs.append((sse_e + ((lam16 * bits) >> 4), rec_m, te, rqt,
                             extra))
            return outs

        for cy32 in range(th):
            for cx32 in range(tw):
                x0, y0 = 32 * cx32, 32 * cy32
                cyc, cxc = 2 * cy32, 2 * cx32
                g32y, g32x = ty0 + cy32, tx0 + cx32
                save = (ry[y0:y0 + 32, x0:x0 + 32].copy(),
                        rcb[y0 // 2:y0 // 2 + 16,
                            x0 // 2:x0 // 2 + 16].copy(),
                        rcr[y0 // 2:y0 // 2 + 16,
                            x0 // 2:x0 // 2 + 16].copy())
                # 32-level merge/AMVP neighbors come from the PRE-CTB state
                nbrs32 = M.neighbor_records_sized(rec_map, cyc, cxc, 2,
                                                  nh, nw)

                # --- candidate A: four CU16 (z-order, full RD) ---
                j16 = 0
                q16 = []
                for q in range(4):
                    qx, qy = q & 1, q >> 1
                    r = self._cu16_p(vy, vcb, vcr, ry, rcb, rcr, ref, ref1,
                                     pocs, x0 + 16 * qx, y0 + 16 * qy,
                                     cyc + qy, cxc + qx, rec_map, modes16,
                                     qp, qpc, sqrt_lam, sl16, lam16, bd,
                                     tx0, ty0, nh, nw, explicit_eval, mc3,
                                     tmvp, mcand)
                    j16 += r["j"]
                    q16.append(r)
                rec16 = (ry[y0:y0 + 32, x0:x0 + 32].copy(),
                         rcb[y0 // 2:y0 // 2 + 16,
                             x0 // 2:x0 // 2 + 16].copy(),
                         rcr[y0 // 2:y0 // 2 + 16,
                             x0 // 2:x0 // 2 + 16].copy())
                map16 = [[rec_map[cyc + qy][cxc + qx] for qx in (0, 1)]
                         for qy in (0, 1)]

                # --- candidate B: one 32 CU ---
                src3 = (vy[y0:y0 + 32, x0:x0 + 32],
                        vcb[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16],
                        vcr[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16])
                tm32, cmvp32 = tmvp(cyc, cxc, 2)
                mglist32 = M.merge_list_b(nbrs32, b_slice, max_cands=mcand,
                                          col=tm32)
                idx_bits = 1 if mcand > 1 else 0
                refs = (ref, ref1) if b_slice else (ref, None)
                pick = None
                midx32 = 0
                for k, mg in enumerate(mglist32):
                    pm3k = mc3(refs, x0, y0, 32, mg)
                    sse_skip = sum(_sse(s, p) for s, p in zip(src3, pm3k))
                    j = sse_skip + ((lam16 * (2 + idx_bits)) >> 4)
                    if pick is None or j < pick[1]:
                        pick = ("skip32", j, mg, None, None)
                        midx32, pm3 = k, pm3k
                    lvl3m, cbfm, rec3m = self._tu32(src3, pm3k, qp, qpc, bd)
                    if any(cbfm[0]) or any(cbfm[1]) or any(cbfm[2]):
                        sse_m = sum(_sse(s, r) for s, r in zip(src3, rec3m))
                        bits = min(12 + idx_bits
                                   + level_bits_estimate(lvl3m), 8192)
                        j = sse_m + ((lam16 * bits) >> 4)
                        if j < pick[1]:
                            pick = ("merge32", j, mg,
                                    (lvl3m, cbfm, rec3m), None)
                            midx32, pm3 = k, pm3k
                for (j, rec_m, t32, rqt, extra) in self._explicit32(
                        src3, x0, y0, nbrs32, explicit_eval, cmvp32):
                    if j < pick[1]:
                        pick = ("explicit32", j, rec_m, t32, extra)

                if j16 < pick[1]:
                    ry[y0:y0 + 32, x0:x0 + 32] = rec16[0]
                    rcb[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16] = rec16[1]
                    rcr[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16] = rec16[2]
                    dec["split32"][g32y, g32x] = True
                    for q, r in enumerate(q16):
                        self._commit_cu16(dec, cu_maps, r,
                                          2 * g32y + (q >> 1),
                                          2 * g32x + (q & 1))
                    continue

                # commit the 32 CU (quadrant recon/state rolled back)
                ry[y0:y0 + 32, x0:x0 + 32] = save[0]
                rcb[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16] = save[1]
                rcr[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16] = save[2]
                modes16[cyc:cyc + 2, cxc:cxc + 2] = -1
                kind, j, rec_m, t32, extra = pick
                pf0, pf1, mv0, mv1 = rec_m
                for qy in (0, 1):
                    for qx in (0, 1):
                        rec_map[cyc + qy][cxc + qx] = rec_m
                        gy, gx = 2 * g32y + qy, 2 * g32x + qx
                        cu_maps["pf"][gy, gx] = (pf0, pf1)
                        cu_maps["mv"][gy, gx] = mv0 if pf0 else mv1
                        cu_maps["mv1"][gy, gx] = mv1
                if kind == "skip32":
                    dec["skip32"][g32y, g32x] = True
                    dec["midx32"][g32y, g32x] = midx32
                    rec3 = pm3
                else:
                    dec["inter32"][g32y, g32x] = True
                    if kind == "merge32":
                        dec["merge32"][g32y, g32x] = True
                        dec["midx32"][g32y, g32x] = midx32
                        lvl3, cbfs, rec3 = t32
                        self._store_cu32(dec, g32y, g32x, None, lvl3, cbfs)
                        for q in range(4):
                            cu_maps["cbf"][2 * g32y + (q >> 1),
                                           2 * g32x + (q & 1)] = \
                                bool(cbfs[0][q])
                    else:
                        dec["dir32"][g32y, g32x] = extra.get("dir", 0)
                        if "mvd" in extra:
                            dec["mvd32"][g32y, g32x] = extra["mvd"]
                            dec["mvp32"][g32y, g32x] = extra["mvp"]
                        if "mvd1" in extra:
                            dec["mvd32_1"][g32y, g32x] = extra["mvd1"]
                            dec["mvp32_1"][g32y, g32x] = extra["mvp1"]
                        lvl3, cbfs, rec3, rqt = t32
                        dec["rqt32"][g32y, g32x] = rqt
                        if rqt:
                            self._store_cu32(dec, g32y, g32x, None, lvl3,
                                             cbfs)
                            for q in range(4):
                                cu_maps["cbf"][2 * g32y + (q >> 1),
                                               2 * g32x + (q & 1)] = \
                                    bool(cbfs[0][q])
                ry[y0:y0 + 32, x0:x0 + 32] = rec3[0]
                rcb[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16] = rec3[1]
                rcr[y0 // 2:y0 // 2 + 16, x0 // 2:x0 // 2 + 16] = rec3[2]

    def _resid(self, src3, pred3, n, qp, qpc, bd):
        """Residual encode for an inter CU (size-n): returns
        (per-plane tu data, rqt, sse of the choice, levels list)."""
        if n == 16:
            te = self._tu3(src3, pred3, qp, qpc, bd)
            rqt = int(any(t[1] for t in te))
            if rqt:
                sse = sum(_sse(s, t[2]) for s, t in zip(src3, te))
                lv = [t[0] for t in te]
            else:
                sse = sum(_sse(s, p) for s, p in zip(src3, pred3))
                lv = []
            return te, rqt, sse, lv
        lvl3, cbfs, rec3 = self._tu32(src3, pred3, qp, qpc, bd)
        rqt = int(any(cbfs[0]) or any(cbfs[1]) or any(cbfs[2]))
        if rqt:
            sse = sum(_sse(s, r) for s, r in zip(src3, rec3))
            lv = lvl3
        else:
            sse = sum(_sse(s, p) for s, p in zip(src3, pred3))
            lv = []
            rec3 = pred3
        return (lvl3, cbfs, rec3, rqt), rqt, sse, lv

    def _explicit32(self, src3, x0, y0, nbrs32, explicit_eval,
                    cmvp=(None, None)):
        """Explicit 32-CU candidates via the shared evaluator."""
        outs = []
        for (j, rec_m, t32, rqt, extra) in explicit_eval(
                src3, x0, y0, 32, nbrs32, cmvp):
            outs.append((j, rec_m, t32, rqt, extra))
        return outs

    def _cu16_p(self, vy, vcb, vcr, ry, rcb, rcr, ref, ref1, pocs,
                x1, y1, cy, cx, rec_map, modes16, qp, qpc, sqrt_lam, sl16,
                lam16, bd, tx0, ty0, nh, nw, explicit_eval, mc3,
                tmvp=None, mcand=1):
        """Full-RD CU16 inside a CTB32 quadrant.  Writes recon + motion
        state; returns the decision record with its j-cost."""
        b_slice = ref1 is not None
        sl = np.s_[y1:y1 + 16, x1:x1 + 16]
        slc = np.s_[y1 // 2:y1 // 2 + 8, x1 // 2:x1 // 2 + 8]
        src3 = (vy[sl], vcb[slc], vcr[slc])
        nbrs = M.neighbor_records_sized(rec_map, cy, cx, 1, nh, nw)
        tm_rec, cmvp = tmvp(cy, cx, 1) if tmvp is not None \
            else (None, (None, None))
        mglist = M.merge_list_b(nbrs, b_slice, max_cands=mcand, col=tm_rec)
        idx_bits = 1 if mcand > 1 else 0
        refs = (ref, ref1) if b_slice else (ref, None)
        pick = None
        midx = 0
        pm3 = None
        for k, mg in enumerate(mglist):
            pm3k = mc3(refs, x1, y1, 16, mg)
            sse_skip = sum(_sse(s, p) for s, p in zip(src3, pm3k))
            j = sse_skip + ((lam16 * (2 + idx_bits)) >> 4)
            if pick is None or j < pick[1]:
                pick = ("skip", j, mg, None, None)
                midx, pm3 = k, pm3k
            tm = self._tu3(src3, pm3k, qp, qpc, bd)
            if any(t[1] for t in tm):
                sse_m = sum(_sse(s, t[2]) for s, t in zip(src3, tm))
                bits = min(12 + idx_bits
                           + level_bits_estimate([t[0] for t in tm]), 2048)
                j = sse_m + ((lam16 * bits) >> 4)
                if j < pick[1]:
                    pick = ("merge", j, mg, tm, None)
                    midx, pm3 = k, pm3k
        for (j, rec_m, te, rqt, extra) in explicit_eval(src3, x1, y1, 16,
                                                        nbrs, cmvp):
            if j < pick[1]:
                pick = ("explicit", j, rec_m, (te, rqt), extra)

        # intra candidate (2Nx2N, no NxN in this profile)
        a = b = INTRA_DC
        if cx > 0 and modes16[cy, cx - 1] >= 0:
            a = int(modes16[cy, cx - 1])
        if (cy & 1) and modes16[cy - 1, cx] >= 0:
            b = int(modes16[cy - 1, cx])
        save = (ry[sl].copy(), rcb[slc].copy(), rcr[slc].copy())
        qx, qy = cx & 1, cy & 1
        q = 2 * qy + qx
        _, _, lctb, actb, lv2, tv2, tr_ar = _QUAD[q]
        al = (cx > 0) if lctb else True
        aa = (cy > 0) if actb else True
        ar_ok = (cy > 0) and (cx + 1 < nw)
        qtv2 = tv2 if not tr_ar else ar_ok
        ri = self._intra16_2n(vy, vcb, vcr, ry, rcb, rcr, x1, y1,
                              mpm_candidates(a, b), qp, qpc, sqrt_lam,
                              al, aa, lv2, qtv2, bd)
        sse_i = _sse(vy[sl], ry[sl]) + _sse(vcb[slc], rcb[slc]) \
            + _sse(vcr[slc], rcr[slc])
        bits = min(8 + level_bits_estimate(
            (ri["lvl_y"], ri["lvl_cb"], ri["lvl_cr"])), 2048)
        j = sse_i + ((lam16 * bits) >> 4)
        if j < pick[1]:
            pick = ("intra", j, None, ri, None)
        else:
            ry[sl], rcb[slc], rcr[slc] = save   # undo the intra recon

        kind, j, rec_m, payload, extra = pick
        out = {"j": j, "kind": kind}
        if kind == "intra":
            modes16[cy, cx] = payload["mode"]
            rec_map[cy][cx] = None
            out["intra"] = payload
            return out
        modes16[cy, cx] = -1
        rec_map[cy][cx] = rec_m
        out["rec_m"] = rec_m
        out["midx"] = midx
        if kind == "skip":
            rec3 = pm3
        elif kind == "merge":
            rec3 = [t[2] for t in payload]
            out["tm"] = payload
        else:
            te, rqt = payload
            rec3 = [t[2] for t in te] if rqt else None
            out["te"], out["rqt"], out["extra"] = te, rqt, extra
            if rec3 is None:
                pe3 = mc3(refs, x1, y1, 16, rec_m)
                rec3 = pe3
        ry[sl], rcb[slc], rcr[slc] = rec3[0], rec3[1], rec3[2]
        return out

    def _commit_cu16(self, dec, cu_maps, r, gy, gx):
        kind = r["kind"]
        if kind == "intra":
            p = r["intra"]
            dec["modes4"][gy, gx] = p["mode"]
            dec["cbf_y4"][gy, gx, 0] = bool(p["cbf_y"])
            dec["cbf_cb"][gy, gx] = bool(p["cbf_cb"])
            dec["cbf_cr"][gy, gx] = bool(p["cbf_cr"])
            dec["lvl_y"][gy, gx] = p["lvl_y"]
            dec["lvl_cb"][gy, gx] = p["lvl_cb"]
            dec["lvl_cr"][gy, gx] = p["lvl_cr"]
            cu_maps["intra"][gy, gx] = True
            cu_maps["cbf"][gy, gx] = bool(p["cbf_y"])
            return
        pf0, pf1, mv0, mv1 = r["rec_m"]
        cu_maps["pf"][gy, gx] = (pf0, pf1)
        cu_maps["mv"][gy, gx] = mv0 if pf0 else mv1
        cu_maps["mv1"][gy, gx] = mv1
        if kind == "skip":
            dec["skip"][gy, gx] = True
            dec["midx"][gy, gx] = r.get("midx", 0)
            return
        dec["inter"][gy, gx] = True
        if kind == "merge":
            tm = r["tm"]
            dec["merge"][gy, gx] = True
            dec["midx"][gy, gx] = r.get("midx", 0)
            dec["cbf_yi"][gy, gx] = bool(tm[0][1])
            dec["cbf_cbi"][gy, gx] = bool(tm[1][1])
            dec["cbf_cri"][gy, gx] = bool(tm[2][1])
            dec["lvl_y"][gy, gx] = tm[0][0]
            dec["lvl_cb"][gy, gx] = tm[1][0]
            dec["lvl_cr"][gy, gx] = tm[2][0]
            cu_maps["cbf"][gy, gx] = bool(tm[0][1])
            return
        te, rqt, extra = r["te"], r["rqt"], r["extra"]
        dec["dir"][gy, gx] = extra.get("dir", 0)
        if "mvd" in extra:
            dec["mvd"][gy, gx] = extra["mvd"]
            dec["mvp"][gy, gx] = extra["mvp"]
        if "mvd1" in extra:
            dec["mvd1"][gy, gx] = extra["mvd1"]
            dec["mvp1"][gy, gx] = extra["mvp1"]
        dec["rqt"][gy, gx] = rqt
        if rqt:
            dec["cbf_yi"][gy, gx] = bool(te[0][1])
            dec["cbf_cbi"][gy, gx] = bool(te[1][1])
            dec["cbf_cri"][gy, gx] = bool(te[2][1])
            dec["lvl_y"][gy, gx] = te[0][0]
            dec["lvl_cb"][gy, gx] = te[1][0]
            dec["lvl_cr"][gy, gx] = te[2][0]
            cu_maps["cbf"][gy, gx] = bool(te[0][1])

    # ---- GOP driver -----------------------------------------------------------
    def _finish(self, recon, cu_maps, src=None, qp=None,
                do_sao: bool | None = None):
        """Deblock (+SAO when cfg.sao) one picture -> (display planes,
        sao params).  do_sao=False codes non-reference B slices with
        slice_sao_*_flag=0 (policy shared with the ctb16 path,
        reference_encoder_v1._finish_pic)."""
        from hevc_tpu.ops.deblock import deblock_frame
        cfg = self.cfg
        qp = cfg.qp if qp is None else qp
        dy = recon["y"].copy()
        dcb = recon["cb"].copy()
        dcr = recon["cr"].copy()
        tx = tyy = None
        if cfg.tiles_enabled:
            cols, rows_ = cfg.tile_grid()
            tx = list(np.cumsum(cols)[:-1] * 32)
            tyy = list(np.cumsum(rows_)[:-1] * 32)
        if cfg.deblock:
            deblock_frame(dy, dcb, dcr, qp, ctb=32, bit_depth=cfg.bit_depth,
                          tile_cols_px=tx, tile_rows_px=tyy,
                          cu_maps=cu_maps)
        sao_params = None
        if cfg.sao and do_sao is not False:
            from hevc_tpu.ops.sao import estimate_and_apply_sao
            qp_eff = qp + 6 * (cfg.bit_depth - 8)
            y, cb, cr = src
            src3 = (pad_to_ctb(np.asarray(y), 32),
                    pad_to_ctb(np.asarray(cb), 16),
                    pad_to_ctb(np.asarray(cr), 16))
            p_y, p_c, out3 = estimate_and_apply_sao(
                src3, (dy, dcb, dcr), 32, cfg.bit_depth,
                skip_lambda16(qp_eff), tx, tyy)
            dy, dcb, dcr = out3
            sao_params = (p_y, p_c)
        return {"y": dy, "cb": dcb, "cr": dcr}, sao_params

    def _col_entry(self, maps, ref_delta):
        """DPB-side motion retention for TMVP: 16x16-compressed col field
        of a just-encoded REFERENCE picture (None for I pictures)."""
        if not self.cfg.tmvp or maps is None:
            return None
        pf = maps["pf"]
        avail = ~maps["intra"] & ((pf[:, :, 0] > 0) | (pf[:, :, 1] > 0))
        return {"avail": avail, "mv": maps["mv"], "ref_delta": ref_delta}

    def _colctx(self, entry, tb0, tb1=None):
        """Per-slice TMVP context from a DPB col entry (None when the col
        picture carries no motion, e.g. an I anchor)."""
        if entry is None:
            return None
        td = entry["ref_delta"]
        dsf0 = M.dist_scale(tb0, td)
        dsf1 = M.dist_scale(tb1, td) if tb1 is not None else None
        return {"avail": entry["avail"], "mv": entry["mv"],
                "dsf": (dsf0, dsf1)}

    def _wp_for(self, cur3, ref3):
        """Per-P-frame weightp analysis (host, source domain) — same
        estimator and 8-bit-unit convention as the v1 path
        (RefIntraEncoderV1._wp_for)."""
        cfg = self.cfg
        if not cfg.weightp:
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
        """IPPP (or IbPbP when cfg.bframes) -> (annexb bytes, recons)."""
        from hevc_tpu.utils.bitio import annexb
        cfg = self.cfg
        out = annexb(self.parameter_sets())
        if cfg.bframes:
            return self._encode_video_b(frames, gop, out)
        ref = None
        recons = []
        poc = 0
        col_prev = None               # col entry of the previous picture
        for i, f in enumerate(frames):
            idr = ref is None or (gop and i % gop == 0)
            wp = None
            if idr:
                dec, recon = self.encode_frame_i(*f)
                maps = None
                poc = 0
                col_prev = None
            else:
                poc += 1
                wp = self._wp_for(f, frames[i - 1])
                dec, recon, maps = self.encode_frame_p(
                    *f, ref, wp=wp, colctx=self._colctx(col_prev, 1))
                col_prev = self._col_entry(maps, 1)
            disp, sao_p = self._finish(recon, maps, src=f)
            out += b"\x00\x00\x00\x01" + entropy_encode_frame_ctb32(
                cfg, dec, poc=None if idr else poc, sao=sao_p, wp=wp)
            ref = disp
            recons.append(disp)
        return out, recons

    def _encode_video_b(self, frames, gop, out):
        """B GOP driver scheduled by encoder.gop.b_schedule:
        cfg.bframes_n non-reference B pictures between anchors
        (1 = IbPbP, 2 = IbbPbbP); each B references the nearest
        past/future anchors per its RPS set (same schedule contract as
        reference_encoder_v1._encode_video_b)."""
        import dataclasses
        from hevc_tpu.encoder.gop import b_schedule
        from hevc_tpu.entropy.headers import rps_sets
        cfg = self.cfg
        sets = rps_sets(cfg)
        n = len(frames)
        recons = [None] * n
        refs = {}                     # display idx -> deblocked planes
        seg0 = 0
        prev_ref_disp = None
        qp_b = min(cfg.qp + self.B_QP_OFFSET, 51)
        cfg_b = dataclasses.replace(cfg, qp=qp_b)
        cols = {}                     # display idx -> col entry (refs only)
        for (disp, kind, poc, rps) in b_schedule(n, gop, True,
                                                 cfg.bframes_n):
            if kind == 0:
                refs.clear()
                cols.clear()
                seg0 = disp
                dec, recon = self.encode_frame_i(*frames[disp])
                dispf, sao_p = self._finish(recon, None, src=frames[disp])
                nal = entropy_encode_frame_ctb32(cfg, dec, sao=sao_p)
                prev_ref_disp = disp
                cols[disp] = None
            elif kind == 1:
                wp = self._wp_for(frames[disp], frames[prev_ref_disp])
                d = disp - prev_ref_disp
                dec, recon, maps = self.encode_frame_p(
                    *frames[disp], refs[prev_ref_disp], wp=wp,
                    colctx=self._colctx(cols.get(prev_ref_disp), d))
                cols[disp] = self._col_entry(maps, d)
                dispf, sao_p = self._finish(recon, maps, src=frames[disp])
                nal = entropy_encode_frame_ctb32(cfg, dec, poc=poc,
                                                 rps_idx=rps, sao=sao_p,
                                                 wp=wp)
                prev_ref_disp = disp
            else:
                neg, pos = sets[rps]
                l0, l1 = disp - neg[0], disp + pos[0]
                # collocated_from_l0_flag=0: col = L1[0] (future anchor)
                dec, recon, maps = self.encode_frame_p(
                    *frames[disp], refs[l0], ref1=refs[l1],
                    pocs=(poc, l0 - seg0, l1 - seg0), qp_ovr=qp_b,
                    colctx=self._colctx(cols.get(l1), disp - l0, disp - l1))
                dispf, _ = self._finish(recon, maps, qp=qp_b,
                                        do_sao=False)
                nal = entropy_encode_frame_ctb32(cfg_b, dec, poc=poc,
                                                 b_slice=True, rps_idx=rps)
            out += b"\x00\x00\x00\x01" + nal
            if kind != 2:
                refs[disp] = dispf
            recons[disp] = dispf
        return out, recons
