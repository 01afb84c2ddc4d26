"""Shared CTU-level mode/partition search logic (numpy reference).

v1 encode profile adds PART_NxN: each 16x16 CU may split into four 8x8 intra
PUs (own mode each, 8x8 luma TBs, chroma as four 4x4 TBs).  The partition
decision is SATD + lambda*bits over both candidates, searched with true
sequential reconstruction (the JAX row-scan graph replicates this procedure
bit-exactly; tests enforce it).

Spec refs: part_mode 7.4.9.5, IntraSplitFlag transform tree 7.3.8.8, MPM
neighbors 8.4.2 (above PU outside the CTB row -> DC; inside the CTB -> real).
"""
from __future__ import annotations

import numpy as np

from hevc_tpu.entropy.syntax import mpm_candidates, INTRA_DC
from hevc_tpu.ops import reference as R


def mode_bits_estimate(mode: int, cands: list[int]) -> int:
    if mode in cands:
        return 2 if cands.index(mode) == 0 else 3
    return 6


def level_bits_estimate(lvls) -> int:
    """Cheap residual-rate estimate for the P-slice skip decision.

    2 bits per nonzero coefficient plus its magnitude bit-length; NOT a real
    CABAC rate — just a monotone proxy that the JAX P kernel replicates
    bit-identically (integer compare-sums, no float logs).
    """
    bits = 0
    for l in lvls:
        a = np.abs(np.asarray(l, np.int64))
        bits += 2 * int((a > 0).sum())
        for k in range(1, 15):
            bits += int((a >= (1 << k)).sum())
    return bits


def skip_lambda16(qp: int) -> int:
    """SSE-domain lambda in 4-bit fixed point (qp includes QpBdOffset)."""
    return int(0.85 * 2.0 ** ((qp - 12) / 3.0) * 16)


def subblock_valid(i: int, n: int) -> tuple[int, int]:
    """(left_valid, top_valid) for sub-block i (z-order) of a 2x2 split.

    PU0: full left column of the left CU is coded (2n) and top spans two
    coded blocks (2n).  PU1/PU2 have one n-limited edge; PU3 both.
    """
    left_v = 2 * n if i == 0 else n
    top_v = n if i == 3 else 2 * n
    return left_v, top_v


def search_block(src, recon, x0, y0, n, cands, sqrt_lam, avail_left,
                 avail_above, bit_depth, hadamard_satd,
                 left_valid=None, top_valid=None):
    """35-mode search on one luma block; returns (mode, pred, cost)."""
    ref = R.build_reference(recon, x0, y0, n, avail_left, avail_above,
                            bit_depth, left_valid, top_valid)
    reff = R.filter_reference(ref, n)
    best_cost = 1 << 60
    best = None
    for mode in range(35):
        r = reff if R.use_filtered_ref(mode, n, 0) else ref
        pred = R.predict_intra(r, mode, n, 0, bit_depth)
        cost = hadamard_satd(src - pred) + \
            int(sqrt_lam * mode_bits_estimate(mode, cands))
        if cost < best_cost:
            best_cost = cost
            best = (mode, pred)
    return best[0], best[1], best_cost


def encode_tu(src, pred, qp, bit_depth, dst=False, sdh_scan=None,
              rdoq=False):
    """Transform/quant/recon one TB; returns (lvl, cbf, rec).

    sdh_scan: when not None, apply the sign-data-hiding parity fix-up
    with this coefficient scan index (the TB's entropy scan) so the
    reconstruction matches the decoder's inferred signs.  rdoq switches
    the deadzone quantizer for the RD-aware one (ops/reference.py
    quantize_rdoq).
    """
    coef = R.forward_transform(src - pred, dst=dst, bit_depth=bit_depth)
    if rdoq:
        lvl = R.quantize_rdoq(coef, qp, bit_depth)
    else:
        lvl = R.quantize(coef, qp, bit_depth)
    if sdh_scan is not None:
        lvl = R.sdh_fixup(lvl, coef, qp, sdh_scan, bit_depth)
    cbf = int(np.any(lvl))
    if cbf:
        resi = R.inverse_transform(R.dequantize(lvl, qp, bit_depth), dst=dst,
                                   bit_depth=bit_depth)
        rec = R.reconstruct(pred, resi, bit_depth)
    else:
        rec = pred.copy()
    return lvl, cbf, rec


def nxn_mpm_cands(pu_idx: int, modes_so_far: list[int],
                  left_modes: tuple[int, int], left_avail: bool) -> list[int]:
    """MPM candidate list for PU pu_idx of an NxN CU.

    left_modes: (left CTU's top-right PU mode, bottom-right PU mode).
    Above PU outside the CTB -> DC (spec 8.4.2); inside -> actual mode.
    """
    if pu_idx == 0:
        a = left_modes[0] if left_avail else INTRA_DC
        b = INTRA_DC
    elif pu_idx == 1:
        a = modes_so_far[0]
        b = INTRA_DC
    elif pu_idx == 2:
        a = left_modes[1] if left_avail else INTRA_DC
        b = modes_so_far[0]
    else:
        a = modes_so_far[2]
        b = modes_so_far[1]
    return mpm_candidates(a, b)


def encode_ctu_v1(ys, cbs, crs, rec_y, rec_cb, rec_cr, cx, cy, ctb,
                  qp, qpc, base_qp_cands, sqrt_lam, left_modes, bit_depth,
                  hadamard_satd, enable_nxn=True, lam_part_bits=0,
                  sdh=False, rdoq=False):
    """Encode one CTU with 2Nx2N vs NxN decision; mutates recon planes.

    Returns a decision dict for the entropy stage plus (tr_mode, br_mode)
    for the next CTU's left_modes state.  sdh applies the sign-data-
    hiding fix-up on every TB with its entropy scan (mode-dependent for
    the NxN TU8 luma / TU4 chroma, spec 7.4.9.11).
    """
    from hevc_tpu.entropy.tables import intra_scan_idx

    def sc(log2, mode, c_idx):
        return intra_scan_idx(log2, mode, c_idx) if sdh else None

    x0, y0 = cx * ctb, cy * ctb
    n = ctb
    h = n // 2
    src = ys[y0:y0 + n, x0:x0 + n]

    # ---- candidate A: 2Nx2N ----
    cands_2n = mpm_candidates(left_modes[0] if cx > 0 else INTRA_DC, INTRA_DC)
    mode2n, pred2n, cost2n = search_block(
        src, rec_y, x0, y0, n, cands_2n, sqrt_lam, cx > 0, cy > 0,
        bit_depth, hadamard_satd)

    # ---- candidate B: NxN (sequential sub-recon in a scratch copy) ----
    cost_nxn = None
    if enable_nxn:
        scratch = rec_y.copy()
        modes4 = []
        preds4 = []
        cost_nxn = lam_part_bits
        for i in range(4):
            dx, dy = (i & 1) * h, (i >> 1) * h
            xs, ysv = x0 + dx, y0 + dy
            cands = nxn_mpm_cands(i, modes4, left_modes, cx > 0)
            al = (cx > 0) or dx > 0
            aa = (cy > 0) or dy > 0
            lv, tv = subblock_valid(i, h)
            sub = ys[ysv:ysv + h, xs:xs + h]
            m, p, c = search_block(sub, scratch, xs, ysv, h, cands, sqrt_lam,
                                   al, aa, bit_depth, hadamard_satd, lv, tv)
            lvl, cbf, rec = encode_tu(sub, p, qp, bit_depth,
                                      sdh_scan=sc(3, m, 0), rdoq=rdoq)
            scratch[ysv:ysv + h, xs:xs + h] = rec
            modes4.append(m)
            preds4.append((p, lvl, cbf, rec))
            cost_nxn += c

    use_nxn = enable_nxn and cost_nxn < cost2n
    dec = {"part_nxn": use_nxn}

    if use_nxn:
        lvl_y = np.zeros((n, n), np.int32)
        cbf4 = []
        for i in range(4):
            dx, dy = (i & 1) * h, (i >> 1) * h
            p, lvl, cbf, rec = preds4[i]
            lvl_y[dy:dy + h, dx:dx + h] = lvl
            cbf4.append(cbf)
            rec_y[y0 + dy:y0 + dy + h, x0 + dx:x0 + dx + h] = rec
        dec.update(modes=modes4, cbf_y4=cbf4, lvl_y=lvl_y)
        chroma_mode = modes4[0]
        tr_mode, br_mode = modes4[1], modes4[3]
    else:
        lvl, cbf, rec = encode_tu(src, pred2n, qp, bit_depth,
                                  sdh_scan=sc(4, mode2n, 0), rdoq=rdoq)
        rec_y[y0:y0 + n, x0:x0 + n] = rec
        dec.update(modes=[mode2n] * 4, cbf_y4=[cbf] * 4, lvl_y=lvl)
        chroma_mode = mode2n
        tr_mode = br_mode = mode2n

    # ---- chroma ----
    nc = n // 2
    xc, yc = x0 // 2, y0 // 2
    for plane, recp, key in ((cbs, rec_cb, "cb"), (crs, rec_cr, "cr")):
        if not use_nxn:
            refc = R.build_reference(recp, xc, yc, nc, cx > 0, cy > 0,
                                     bit_depth)
            predc = R.predict_intra(refc, chroma_mode, nc, 1, bit_depth)
            lvlc, cbfc, recc = encode_tu(plane[yc:yc + nc, xc:xc + nc],
                                         predc, qpc, bit_depth,
                                         sdh_scan=sc(3, chroma_mode, 1),
                                         rdoq=rdoq)
            recp[yc:yc + nc, xc:xc + nc] = recc
            dec[f"lvl_{key}"] = lvlc
            dec[f"cbf_{key}"] = cbfc
            dec[f"cbf_{key}4"] = [cbfc] * 4
        else:
            # four 4x4 chroma TBs (z-order), same derived mode
            hc = nc // 2
            lvlc_full = np.zeros((nc, nc), np.int32)
            cbfs = []
            for i in range(4):
                dx, dy = (i & 1) * hc, (i >> 1) * hc
                xs, ysv = xc + dx, yc + dy
                al = (cx > 0) or dx > 0
                aa = (cy > 0) or dy > 0
                lv, tv = subblock_valid(i, hc)
                refc = R.build_reference(recp, xs, ysv, hc, al, aa, bit_depth,
                                         lv, tv)
                predc = R.predict_intra(refc, chroma_mode, hc, 1, bit_depth)
                lvlc, cbfc, recc = encode_tu(
                    plane[ysv:ysv + hc, xs:xs + hc], predc, qpc, bit_depth,
                    sdh_scan=sc(2, chroma_mode, 1), rdoq=rdoq)
                recp[ysv:ysv + hc, xs:xs + hc] = recc
                lvlc_full[dy:dy + hc, dx:dx + hc] = lvlc
                cbfs.append(cbfc)
            dec[f"lvl_{key}"] = lvlc_full
            dec[f"cbf_{key}"] = int(any(cbfs))
            dec[f"cbf_{key}4"] = cbfs
    dec["chroma_mode"] = chroma_mode
    return dec, (tr_mode, br_mode)
