"""Scalar (numpy) reference intra-frame HEVC encoder.

The behavioral ground truth for the JAX/TPU encode graph
(hevc_tpu.encoder.frame): same decisions, same normative reconstruction, same
syntax stream.  Slow by design; used in tests and as the fallback path.

v0 encode profile: CTB = CU = 16, PART_2Nx2N, TU16 luma + TU8 chroma,
35-mode intra search (SATD + mode bits), deblock/SAO off.
"""
from __future__ import annotations

import numpy as np

from hevc_tpu.entropy.headers import StreamConfig, write_vps, write_sps, \
    write_pps, write_slice_header_idr
from hevc_tpu.entropy.syntax import SliceSyntaxEncoder, mpm_candidates, INTRA_DC
from hevc_tpu.entropy import tables as T
from hevc_tpu.ops import reference as R
from hevc_tpu.utils.bitio import make_nal, NAL_IDR_W_RADL


def hadamard_satd(diff: np.ndarray) -> int:
    """Sum of 8x8 Hadamard-transformed absolute differences."""
    h, w = diff.shape
    bs = 8 if (h % 8 == 0 and w % 8 == 0) else 4
    hm = np.array([[1]], dtype=np.int64)
    while hm.shape[0] < bs:
        hm = np.block([[hm, hm], [hm, -hm]])
    total = 0
    for y in range(0, h, bs):
        for x in range(0, w, bs):
            b = diff[y:y + bs, x:x + bs].astype(np.int64)
            total += int(np.abs(hm @ b @ hm).sum())
    # normalize like HM: /2 per dimension log — use >> for 8x8: sum/4? keep raw
    return total >> (2 if bs == 8 else 1)


def pad_to_ctb(plane: np.ndarray, ctb: int) -> np.ndarray:
    h, w = plane.shape
    ph = (h + ctb - 1) // ctb * ctb
    pw = (w + ctb - 1) // ctb * ctb
    if ph == h and pw == w:
        return plane.astype(np.int32)
    return np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge").astype(np.int32)


def mode_bits_estimate(mode: int, cands: list[int]) -> int:
    if mode in cands:
        return 2 if cands.index(mode) == 0 else 3
    return 6


class RefIntraEncoder:
    def __init__(self, cfg: StreamConfig):
        assert cfg.log2_ctb == 4 and cfg.log2_min_cb == 4, "v0 profile: CTB16"
        self.cfg = cfg

    def parameter_sets(self) -> list[bytes]:
        return [write_vps(self.cfg), write_sps(self.cfg), write_pps(self.cfg)]

    def encode_frame(self, y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
        """Encode one frame. Returns (slice_nal, recon_planes dict)."""
        cfg = self.cfg
        ctb = cfg.ctb
        qp_bd = 6 * (cfg.bit_depth - 8)
        qp = cfg.qp + qp_bd              # Qp' for quant (spec 8.6.3)
        qpc = R.chroma_qp(cfg.qp) + qp_bd
        ys = pad_to_ctb(y, ctb)
        cbs = pad_to_ctb(cb, ctb // 2)
        crs = pad_to_ctb(cr, ctb // 2)
        H, W = ys.shape
        rec_y = np.zeros_like(ys)
        rec_cb = np.zeros_like(cbs)
        rec_cr = np.zeros_like(crs)
        nw, nh = W // ctb, H // ctb

        lam = 0.85 * 2.0 ** ((qp - 12) / 3.0)
        sqrt_lam = np.sqrt(lam)

        # ---- per-CTB QP map (cu_qp_delta; QG = CTB since PPS
        # diff_cu_qp_delta_depth = 0).  Variance AQ in the x265 aq-mode-2
        # shape: busy CTBs code coarser, flat CTBs finer (reference
        # delegate runs "AQ: mode 2 / str 1.0", BENCH log /
        # core/transcoder.py:398-412).
        qp_map = None
        if cfg.cu_qp_delta:
            blk = ys.reshape(nh, ctb, nw, ctb).transpose(0, 2, 1, 3)
            var = blk.astype(np.float64).var(axis=(2, 3))
            lv = np.log2(var + 1.0)
            off = np.clip(np.rint(cfg.aq_strength * (lv - lv.mean())),
                          -6, 6).astype(np.int32)
            qp_map = np.clip(cfg.qp + off, 1, 51)
        qp_pred = cfg.qp             # qPY_PREV: QG = CTB means both
        #                              spatial QP candidates fall outside
        #                              the current CTB, so qPY_PRED is
        #                              always the previous QG's QP (8.6.1)

        syn = SliceSyntaxEncoder(cfg.qp, sdh=cfg.sdh)  # CABAC init: SliceQpY
        mode_row = np.full(nw, INTRA_DC, dtype=np.int32)  # left-neighbor modes

        for cy in range(nh):
            left_mode = INTRA_DC
            for cx in range(nw):
                x0, y0 = cx * ctb, cy * ctb
                if qp_map is not None:
                    qp_y = int(qp_map[cy, cx])
                    qp = qp_y + qp_bd
                    qpc = R.chroma_qp(min(max(qp_y, 0), 57)) + qp_bd
                # ---- luma: search 35 modes on reconstructed refs ----
                src = ys[y0:y0 + ctb, x0:x0 + ctb]
                ref = R.build_reference(rec_y, x0, y0, ctb,
                                        avail_left=cx > 0, avail_above=cy > 0,
                                        bit_depth=cfg.bit_depth)
                reff = R.filter_reference(ref, ctb)
                cand_a = int(mode_row[cx - 1]) if cx > 0 else INTRA_DC
                cands = mpm_candidates(cand_a if cx > 0 else INTRA_DC, INTRA_DC)
                best = (None, None, None)
                best_cost = 1 << 60
                for mode in range(35):
                    r = reff if R.use_filtered_ref(mode, ctb, 0) else ref
                    pred = R.predict_intra(r, mode, ctb, 0, cfg.bit_depth)
                    cost = hadamard_satd(src - pred) + \
                        int(sqrt_lam * mode_bits_estimate(mode, cands))
                    if cost < best_cost:
                        best_cost, best = cost, (mode, pred, None)
                mode, pred, _ = best
                coef = R.forward_transform(src - pred, dst=False,
                                           bit_depth=cfg.bit_depth)
                lvl = R.quantize(coef, qp, cfg.bit_depth)
                if cfg.sdh:
                    lvl = R.sdh_fixup(lvl, coef, qp, 0,
                                      cfg.bit_depth)   # TU16 luma: diag
                cbf_y = int(np.any(lvl))
                if cbf_y:
                    resi = R.inverse_transform(
                        R.dequantize(lvl, qp, cfg.bit_depth),
                        dst=False, bit_depth=cfg.bit_depth)
                    rec = R.reconstruct(pred, resi, cfg.bit_depth)
                else:
                    rec = pred.copy()
                rec_y[y0:y0 + ctb, x0:x0 + ctb] = rec
                mode_row[cx] = mode
                left_mode = mode

                # ---- chroma (DM mode), 8x8 TBs ----
                n_c = ctb // 2
                xc, yc = x0 // 2, y0 // 2
                ch = []
                for plane, recp, qpcc in ((cbs, rec_cb, qpc), (crs, rec_cr, qpc)):
                    srcc = plane[yc:yc + n_c, xc:xc + n_c]
                    refc = R.build_reference(recp, xc, yc, n_c,
                                             avail_left=cx > 0,
                                             avail_above=cy > 0,
                                             bit_depth=cfg.bit_depth)
                    predc = R.predict_intra(refc, mode, n_c, 1, cfg.bit_depth)
                    coefc = R.forward_transform(srcc - predc,
                                                bit_depth=cfg.bit_depth)
                    lvlc = R.quantize(coefc, qpcc, cfg.bit_depth)
                    if cfg.sdh:
                        lvlc = R.sdh_fixup(lvlc, coefc, qpcc, 0,
                                           cfg.bit_depth)  # TB8: diag
                    cbf_c = int(np.any(lvlc))
                    if cbf_c:
                        resic = R.inverse_transform(
                            R.dequantize(lvlc, qpcc, cfg.bit_depth),
                            bit_depth=cfg.bit_depth)
                        recc = R.reconstruct(predc, resic, cfg.bit_depth)
                    else:
                        recc = predc.copy()
                    recp[yc:yc + n_c, xc:xc + n_c] = recc
                    ch.append((cbf_c, lvlc))

                # ---- syntax for this CTU ----
                syn.encode_part_mode_intra(part_nxn=False)
                syn.encode_luma_mode(mode, cands)
                syn.encode_chroma_mode_dm()
                (cbf_cb, lvl_cb), (cbf_cr, lvl_cr) = ch
                syn.encode_cbf_chroma(cbf_cb, 0)
                syn.encode_cbf_chroma(cbf_cr, 0)
                syn.encode_cbf_luma(cbf_y, 0)
                if qp_map is not None:
                    # cu_qp_delta at the QG's first coded TU (7.3.8.10);
                    # an all-zero CTB transmits nothing and inherits
                    # qPY_PRED, so it does not advance the predictor
                    if cbf_y or cbf_cb or cbf_cr:
                        syn.encode_cu_qp_delta(qp_y - qp_pred)
                        qp_pred = qp_y
                if cbf_y:
                    scan = T.intra_scan_idx(4, mode, 0)
                    syn.encode_residual(lvl, 4, scan, 0)
                if cbf_cb:
                    syn.encode_residual(lvl_cb, 3,
                                        T.intra_scan_idx(3, mode, 1), 1)
                if cbf_cr:
                    syn.encode_residual(lvl_cr, 3,
                                        T.intra_scan_idx(3, mode, 1), 2)
                last = (cy == nh - 1) and (cx == nw - 1)
                syn.encode_end_of_slice(last)

        hdr = write_slice_header_idr(cfg)
        rbsp = hdr.bytes() + syn.cabac.bytes_aligned()
        nal = make_nal(NAL_IDR_W_RADL, rbsp)
        return nal, {"y": rec_y, "cb": rec_cb, "cr": rec_cr}
