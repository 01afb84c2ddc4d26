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
    def __init__(self, cfg: StreamConfig, enable_nxn: bool = True):
        assert cfg.log2_ctb == 4, "v1 profile: CTB16"
        self.cfg = cfg
        self.enable_nxn = enable_nxn

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
                    enable_nxn=self.enable_nxn)
                ctus[ty0 + cy][tx0 + cx] = dec

    def encode_frame(self, y, cb, cr):
        ctus, recon = self.encode_frame_decisions(y, cb, cr)
        nal = entropy_encode_frame_v1(self.cfg, ctus)
        return nal, recon

    # ---- P frames (zero-MV skip; conditional replenishment) -------------------
    def encode_frame_p_decisions(self, y, cb, cr, ref: dict):
        """P-frame encode against ref (the previous DEBLOCKED reconstruction).

        Per CTU: full v1 intra search vs the zero-MV skip candidate (copy the
        co-located ref CTU); the cheaper of
            J = SSE + (lambda16 * bits_estimate >> 4)
        wins.  Returns (ctus grid incl skip dicts, recon, skip_map).
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
        skip_map = np.zeros((nh, nw), bool)
        ty0 = 0
        for th in rows:
            tx0 = 0
            for tw in cols:
                self._encode_tile_p(ys, cbs, crs, rec_y, rec_cb, rec_cr, ref,
                                    tx0, ty0, tw, th, qp, qpc, sqrt_lam,
                                    lam16, ctus, skip_map)
                tx0 += tw
            ty0 += th
        return ctus, {"y": rec_y, "cb": rec_cb, "cr": rec_cr}, skip_map

    def _encode_tile_p(self, ys, cbs, crs, rec_y, rec_cb, rec_cr, ref,
                       tx0, ty0, tw, th, qp, qpc, sqrt_lam, lam16, ctus,
                       skip_map):
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
                    enable_nxn=self.enable_nxn)
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
                    skip_map[ty0 + cy, tx0 + cx] = True
                    left_modes = (INTRA_DC, INTRA_DC)
                else:
                    ctus[ty0 + cy][tx0 + cx] = dec
                    left_modes = lm

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
        out = annexb(self.parameter_sets())
        ref = None
        recons = []
        poc = 0
        for i, (y, cb, cr) in enumerate(frames):
            idr = ref is None or (gop and i % gop == 0)
            if idr:
                ctus, recon = self.encode_frame_decisions(y, cb, cr)
                skip_map = None
                poc = 0
                nal = entropy_encode_frame_v1(cfg, ctus)
            else:
                poc += 1
                ctus, recon, skip_map = self.encode_frame_p_decisions(
                    y, cb, cr, ref)
                nal = entropy_encode_frame_v1(cfg, ctus, poc=poc)
            out += b"\x00\x00\x00\x01" + nal
            nh, nw = len(ctus), len(ctus[0])
            nxn_map = np.array([[bool(c.get("part_nxn")) for c in row]
                                for row in ctus])
            dy = recon["y"].copy()
            dcb = recon["cb"].copy()
            dcr = recon["cr"].copy()
            if cfg.deblock:
                cols, rows_ = cfg.tile_grid()
                tx = np.cumsum(cols)[:-1] * cfg.ctb if cfg.tiles_enabled else None
                tyy = np.cumsum(rows_)[:-1] * cfg.ctb if cfg.tiles_enabled else None
                deblock_frame(dy, dcb, dcr, cfg.qp, ctb=cfg.ctb,
                              bit_depth=cfg.bit_depth,
                              tile_cols_px=list(tx) if tx is not None else None,
                              tile_rows_px=list(tyy) if tyy is not None else None,
                              nxn_map=nxn_map, skip_map=skip_map)
            ref = {"y": dy, "cb": dcb, "cr": dcr}
            recons.append(ref)
        return out, recons
