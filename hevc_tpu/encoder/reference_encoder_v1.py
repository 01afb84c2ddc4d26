"""v1 scalar reference encoder: CTB16 with 2Nx2N/NxN partition decision."""
from __future__ import annotations

import numpy as np

from hevc_tpu.encoder.ctu_modes import encode_ctu_v1
from hevc_tpu.encoder.reference_encoder import hadamard_satd, pad_to_ctb
from hevc_tpu.entropy.headers import StreamConfig, write_vps, write_sps, \
    write_pps
from hevc_tpu.entropy.syntax import INTRA_DC
from hevc_tpu.entropy.tiled_v1 import entropy_encode_frame_v1
from hevc_tpu.ops import reference as R


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
