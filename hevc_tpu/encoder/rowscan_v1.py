"""Row-scan tiled encoder, v1 profile: per-CTU 2Nx2N / NxN partition search.

Device-side replica of encoder.ctu_modes.encode_ctu_v1 (bit-exact, tested):
the step evaluates the 16x16 whole-CU candidate AND four sequential 8x8
sub-searches (each with true sub-reconstruction), picks the cheaper partition,
and encodes chroma as one 8x8 TB or four sequential 4x4 TBs accordingly.
Everything stays scalar-indexed dynamic slices + fused all-mode matmuls.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from hevc_tpu.ops import jax_ops as J
from hevc_tpu.ops import reference as R
from hevc_tpu.ops.intra_matrices import intra_weights, use_filtered_mask
from hevc_tpu.encoder.frame_jax import _luma_fixups as _fixups_fx

I32 = jnp.int32
CTB = 16

_CQP = np.array([R.chroma_qp(q) for q in range(58)], dtype=np.int32)


@lru_cache(maxsize=None)
def _fused_weights(n: int, luma: bool = True):
    """Weight matrix for all 35 modes at size n.

    luma=True: modes reordered raw-then-filtered (per 8.4.4.2.3);
    luma=False (chroma): natural order, ALL modes use the unfiltered ref.
    """
    w, shifts = intra_weights(n)
    if not luma:
        wmat = w.reshape(35 * n * n, 4 * n + 1).T.astype(np.float32)
        return wmat, np.arange(35), shifts, 35
    filt = use_filtered_mask(n)
    raw_ids = [m for m in range(35) if not filt[m]]
    filt_ids = [m for m in range(35) if filt[m]]
    order = raw_ids + filt_ids
    wmat = w[order].reshape(35 * n * n, 4 * n + 1).T.astype(np.float32)
    perm = np.argsort(np.array(order))
    return wmat, perm, shifts, len(raw_ids)


def _predict_all(ref_raw, n: int, maxv: int, fixups: bool, luma: bool = True):
    """(B, 4n+1) refs -> (B, 35, n*n) predictions (incl. luma fixups)."""
    wmat, perm, shifts, n_raw = _fused_weights(n, luma)
    wm = jnp.asarray(wmat)
    B = ref_raw.shape[0]
    p_raw = J.exact_matmul_small(ref_raw.astype(jnp.float32),
                                 wm[:, :n_raw * n * n])
    if n_raw < 35:
        ref_filt = J.filter_refs(ref_raw)
        p_filt = J.exact_matmul_small(ref_filt.astype(jnp.float32),
                                      wm[:, n_raw * n * n:])
        p = jnp.concatenate([p_raw, p_filt], axis=1).astype(I32)
        p = p.reshape(B, 35, n * n)[:, jnp.asarray(perm)]
    else:
        p = p_raw.astype(I32).reshape(B, 35, n * n)
    sh = jnp.asarray(shifts)[None, :, None]
    p = jnp.right_shift(p + (1 << (sh - 1)), sh)
    if fixups:
        p = _fixups_fx(p, ref_raw, n, maxv)
    return p


def _assemble_ref(below_left, left, corner, top, topright,
                  a_bl, a_l, a_c, a_t, a_tr, n, bit_depth):
    """Segments (each (B, n) or (B,)) + per-segment scalar avail flags."""
    B = left.shape[0]

    def bb(flag, k):
        return jnp.broadcast_to(flag, (B, k))
    vals = jnp.concatenate([below_left[:, ::-1], left[:, ::-1],
                            corner[:, None], top, topright], axis=-1)
    avail = jnp.concatenate([bb(a_bl, n), bb(a_l, n), bb(a_c, 1),
                             bb(a_t, n), bb(a_tr, n)], axis=-1)
    return J.substitute_refs(vals, avail, bit_depth)


def _mpm_jax(a, b):
    """Device mpm_candidates (spec 8.4.2). a, b: (B,) int32 -> 3x (B,)."""
    eq = a == b
    lt2 = a < 2
    ca0 = jnp.where(lt2, 0, a)
    ca1 = jnp.where(lt2, 1, 2 + ((a + 29) % 32))
    ca2 = jnp.where(lt2, 26, 2 + ((a - 1) % 32))
    # a != b: [a, b, first of (0,1,26) not in {a,b}]
    third = jnp.where((a != 0) & (b != 0), 0,
                      jnp.where((a != 1) & (b != 1), 1, 26))
    c0 = jnp.where(eq, ca0, a)
    c1 = jnp.where(eq, ca1, b)
    c2 = jnp.where(eq, ca2, third)
    return c0, c1, c2


def _mode_bits(c0, c1, c2, lam_bits):
    m = jnp.arange(35, dtype=I32)[None, :]
    return jnp.where(m == c0[:, None], lam_bits[0],
                     jnp.where((m == c1[:, None]) | (m == c2[:, None]),
                               lam_bits[1], lam_bits[2]))


def _scan_sel_j(mode):
    """Mode-dependent coefficient scan (spec 7.4.9.11): vert for modes
    6-14, horiz for 22-30, else diag.  Applies to log2 sizes 2-3."""
    return jnp.where((mode >= 6) & (mode <= 14), 2,
                     jnp.where((mode >= 22) & (mode <= 30), 1, 0))


def _tu_q(src, pred, qp, n, bit_depth, maxv, sdh_scan=None, rdoq=False):
    coef = J.forward_transform(src - pred, n, bit_depth=bit_depth)
    if rdoq:
        lvl = J.quantize_rdoq(coef, qp, n, bit_depth)
    else:
        lvl = J.quantize(coef, qp, n, bit_depth)
    if sdh_scan is not None:
        lvl = J.sdh_fixup(lvl, coef, qp, n, sdh_scan, bit_depth)
    cbf = jnp.any(lvl != 0, axis=(-2, -1))
    rin = J.inverse_transform(J.dequantize(lvl, qp, n, bit_depth), n,
                              bit_depth=bit_depth)
    rec = jnp.where(cbf[:, None, None], jnp.clip(pred + rin, 0, maxv), pred)
    return lvl, cbf, rec


def _search_select(src, ref, n, lam_bits, c0, c1, c2, maxv, fixups=True):
    """All-mode search: returns (mode, pred, best_cost)."""
    B = src.shape[0]
    preds = _predict_all(ref, n, maxv, fixups)
    diff = src.reshape(B, 1, n, n) - preds.reshape(B, 35, n, n)
    costs = J.satd(diff, n) + _mode_bits(c0, c1, c2, lam_bits)
    mode = jnp.argmin(costs, axis=1).astype(I32)
    pred = jnp.take_along_axis(preds, mode[:, None, None],
                               axis=1).reshape(B, n, n)
    return mode, pred, jnp.min(costs, axis=1)


def _level_bits(lvl):
    """Residual-rate estimate, mirror of ctu_modes.level_bits_estimate."""
    a = jnp.abs(lvl)
    b = 2 * jnp.sum((a > 0).astype(I32), axis=(-2, -1))
    ks = jnp.asarray([1 << k for k in range(1, 15)], I32)
    b = b + jnp.sum((a[:, None] >= ks[None, :, None, None]).astype(I32),
                    axis=(1, 2, 3))
    return b


def _sse_j(a, b):
    d = a - b
    return jnp.sum(d * d, axis=(-2, -1))


MARGIN = 48    # padded-ref halo: +-40 px search reach + subpel/interp taps
MARGIN_C = 24


def _mvd_bits_j(d):
    """Device mirror of ops.inter.mvd_bits (EG1 bin-count estimate)."""
    a = jnp.abs(d)
    ks = jnp.asarray([1 << k for k in range(1, 16)], I32)
    bl = 1 + jnp.sum((a[..., None] >= ks).astype(I32), -1)   # bit_length(a)
    ln = jnp.maximum(1, bl - 1)
    return jnp.where(a == 0, 1, jnp.where(a == 1, 3, 2 * ln + 3))


# 4-tap chroma filters (spec Table 8-13) and 8-tap luma filters (Table 8-10)
_FC_NP = np.array([[0, 64, 0, 0], [-2, 58, 10, -2], [-4, 54, 16, -2],
                   [-6, 46, 28, -4], [-4, 36, 36, -4], [-4, 28, 46, -6],
                   [-2, 16, 54, -4], [-2, 10, 58, -2]], np.int32)
_FL_NP = np.array([[0, 0, 0, 64, 0, 0, 0, 0], [-1, 4, -10, 58, 17, -5, 1, 0],
                   [-1, 4, -11, 40, 40, -11, 4, -1],
                   [0, 1, -5, 17, 58, -10, 4, -1]], np.int32)


def _sel_coeffs(table_np, frac, ntaps):
    """Per-lane filter taps via one-hot select: frac (B,) -> (B, ntaps)."""
    tbl = jnp.asarray(table_np)
    return sum(jnp.where((frac == f)[:, None], tbl[f], 0)
               for f in range(table_np.shape[0]))


def _chroma_mc_val_j(win, mvx, mvy, bit_depth):
    """(B, 11, 11) gathered window -> (B, 8, 8) 14-bit chroma MC
    intermediate (pre-weighting), spec 8.5.4.2.3 with per-lane 4-tap
    coefficients selected by one-hot from Table 8-13."""
    shift1 = bit_depth - 8
    xf = mvx & 7
    yf = mvy & 7
    cx = _sel_coeffs(_FC_NP, xf, 4)                      # (B, 4)
    cy = _sel_coeffs(_FC_NP, yf, 4)

    def h4(a, c):                   # filter along x with per-lane taps
        return sum(c[:, k, None, None] * a[..., k:k + 8] for k in range(4))

    def v4(a, c):                   # filter along y
        return sum(c[:, k, None, None] * a[:, k:k + 8] for k in range(4))

    p00 = win[:, 1:9, 1:9] << (14 - bit_depth)
    ph = h4(win, cx)[:, 1:9] >> shift1                   # (B, 8, 8)
    pv = v4(win[:, :, 1:9], cy) >> shift1                # y-only path
    tmp = h4(win, cx) >> shift1                          # (B, 11, 8)
    phv = v4(tmp, cy) >> 6
    xz = (xf == 0)[:, None, None]
    yz = (yf == 0)[:, None, None]
    return jnp.where(xz & yz, p00,
                     jnp.where(yz, ph, jnp.where(xz, pv, phv)))


def _weight_uni_j(val, bit_depth):
    """Default uni-prediction weighting (spec 8.5.4.2.4)."""
    off = 1 << (13 - bit_depth)
    return jnp.clip((val + off) >> (14 - bit_depth), 0,
                    (1 << bit_depth) - 1)


def _weight_bi_j(val0, val1, bit_depth):
    """Default bi-prediction averaging (spec 8.5.4.2.4)."""
    off = 1 << (14 - bit_depth)
    return jnp.clip((val0 + val1 + off) >> (15 - bit_depth), 0,
                    (1 << bit_depth) - 1)


def _weight_explicit_j(val, w, o, bit_depth):
    """Explicit uni-prediction weighting (spec 8.5.3.2.9.3, P slices with
    pred_weight_table): denom 2^6, offset coded in 8-bit units.  w/o are
    traced scalars; (64, 0) reproduces _weight_uni_j bit-exactly (device
    mirror of ops.inter.weight_uni_w)."""
    log2wd = 6 + 14 - bit_depth
    off = o << (bit_depth - 8)
    v = (val * w + (1 << (log2wd - 1))) >> log2wd
    return jnp.clip(v + off, 0, (1 << bit_depth) - 1)


def _weight_px_j(p, w, o, bit_depth):
    """Integer-pixel-domain explicit weighting of reference windows (the
    SEARCH-side transform; equals _weight_explicit_j on the 14-bit
    intermediate of any integer MV — ops.inter.weight_px_w)."""
    off = o << (bit_depth - 8)
    v = (p * w + 32) >> 6
    return jnp.clip(v + off, 0, (1 << bit_depth) - 1)


def _chroma_mc_j(win, mvx, mvy, bit_depth):
    """(B, 11, 11) gathered window -> (B, 8, 8) chroma MC prediction."""
    return _weight_uni_j(_chroma_mc_val_j(win, mvx, mvy, bit_depth),
                         bit_depth)


def _scale_mv_j(mv, dsf):
    """Temporal MV scaling (spec 8.5.3.2.8) with the distance factor dsf
    precomputed on host ((tb*tx+32)>>6 clipped to [-4096,4095])."""
    s = dsf * mv
    mag = (jnp.abs(s) + 127) >> 8
    return jnp.clip(jnp.where(s >= 0, mag, -mag), -32768, 32767)


def _win_at(p, y, x, h, w):
    """Per-lane (h, w) windows from (B, H, W) planes at (y, x) offsets.

    NOT vmap(dynamic_slice): that lowers to a B-iteration serialized
    per-lane while loop on TPU (round-5 device trace: ~45 such sites
    were ~60% of the whole ctb32 scan step).  Two take_along_axis
    gathers vectorize over lanes instead.  Every call site keeps its
    window in-bounds by construction (MARGIN covers the full MV reach
    plus filter taps), so dynamic_slice's clamp-the-start semantics
    never applied anyway."""
    rows = y[:, None] + jnp.arange(h, dtype=jnp.int32)
    t = jnp.take_along_axis(p, rows[:, :, None], axis=1)
    cols = x[:, None] + jnp.arange(w, dtype=jnp.int32)
    return jnp.take_along_axis(t, cols[:, None, :], axis=2)


def _luma_superwin(pad_y, r, c, n: int = 16):
    """(B, n+96, n+96) window at pad position (r*n-48, c*n-48): covers the
    full coarse+fine+subpel motion reach (+-40 px + taps) of one n-CU."""
    B = pad_y.shape[0]
    return jax.lax.dynamic_slice(
        pad_y, (0, r * n + MARGIN - 48, c * n + MARGIN - 48),
        (B, n + 96, n + 96))


def _search_explicit_ref(src, pad_y, r, c, c0mv, c1mv, sl16, bit_depth,
                         subpel, maxv, n: int = 16, wl=None):
    """Hierarchical search against ONE reference pad (device mirror of
    the numpy _mv_search, any CU size n): 4x-decimated 17x17 coarse
    (+-32, clipped +-30) -> 2x-decimated 7x7 refine (+-6) -> full-res
    9x9 around zero then around the refined center -> optional subpel.
    Effective reach +-40 px with 2x81 full-res SADs instead of round-2's
    2x289 (VERDICT r2 item 8).  Returns (mv_e, mvd bits vs cand0, vs
    cand1, and the 14-bit pre-weighting prediction intermediate)."""
    B = src.shape[0]
    WIN = _luma_superwin(pad_y, r, c, n)                # (B, n+96, n+96)
    # wl = (w, o): SAD stages run on the explicitly-weighted window (the
    # integer-domain transform equals spec weighting at integer MVs);
    # prediction intermediates stay unweighted (callers weight them)
    WINs = WIN if wl is None else _weight_px_j(WIN, wl[0], wl[1], bit_depth)
    # A: subsampled SAD over 17x17 decimated offsets (+-32 px)
    dec = WINs[:, 16:80 + n:4, 16:80 + n:4]             # (B, 16+n/4, ...)
    src4 = src[:, ::4, ::4]                             # (B, n/4, n/4)
    n4 = n // 4
    rows4 = jnp.stack([dec[:, k:k + n4, :] for k in range(17)], 1)
    cand4 = jnp.stack([rows4[..., k:k + n4] for k in range(17)], 2)
    sad4 = jnp.sum(jnp.abs(src4[:, None, None] - cand4), axis=(3, 4))
    b4 = jnp.argmin(sad4.reshape(B, 289), axis=1).astype(I32)
    ccx = jnp.clip(4 * (b4 % 17 - 8), -30, 30)          # full-res px
    ccy = jnp.clip(4 * (b4 // 17 - 8), -30, 30)

    # B: 2x-decimated 7x7 refine in 2-px steps (+-6) around the coarse
    # center (ccx/ccy stay even so decimated indices are exact)
    dec2 = WINs[:, ::2, ::2]                            # (B, (n+96)/2, ..)
    src2 = src[:, ::2, ::2]                             # (B, n/2, n/2)
    n2 = n // 2
    w2 = _win_at(dec2, (ccy >> 1) + 21, (ccx >> 1) + 21, n2 + 6, n2 + 6)
    rows2 = jnp.stack([w2[:, k:k + n2, :] for k in range(7)], 1)
    cnd2 = jnp.stack([rows2[..., k:k + n2] for k in range(7)], 2)
    sad2 = jnp.sum(jnp.abs(src2[:, None, None] - cnd2), axis=(3, 4))
    b2 = jnp.argmin(sad2.reshape(B, 49), axis=1).astype(I32)
    ccx = ccx + 2 * (b2 % 7 - 3)
    ccy = ccy + 2 * (b2 // 7 - 3)

    # C: full-res 9x9 (+-4) over TWO windows: the zero-centered one
    # first (small true motions must never lose to a decimation-aliased
    # center), then the refined one; flat argmin keeps the earlier
    # candidate on ties (the numpy scan order)
    def fine_cands(cy0, cx0):
        w = _win_at(WINs, cy0 + 44, cx0 + 44, n + 8, n + 8)
        rows_s = jnp.stack([w[:, k:k + n, :] for k in range(9)], 1)
        cnd = jnp.stack([rows_s[..., k:k + n] for k in range(9)], 2)
        return cnd.reshape(B, 81, n, n)

    z = jnp.zeros((B,), I32)
    cand = jnp.concatenate([fine_cands(z, z), fine_cands(ccy, ccx)], 1)
    sad = jnp.sum(jnp.abs(src[:, None] - cand), axis=(2, 3))
    offs = jnp.arange(81, dtype=I32)
    cx2 = jnp.concatenate([jnp.zeros_like(ccx)[:, None] + offs[None] % 9,
                           ccx[:, None] + offs[None] % 9], 1) - 4
    cy2 = jnp.concatenate([jnp.zeros_like(ccy)[:, None] + offs[None] // 9,
                           ccy[:, None] + offs[None] // 9], 1) - 4
    mvx_all = 4 * cx2
    mvy_all = 4 * cy2
    mb0 = _mvd_bits_j(mvx_all - c0mv[:, 0:1]) \
        + _mvd_bits_j(mvy_all - c0mv[:, 1:2])
    mb1 = _mvd_bits_j(mvx_all - c1mv[:, 0:1]) \
        + _mvd_bits_j(mvy_all - c1mv[:, 1:2])
    cost = (sad << 4) + sl16 * jnp.minimum(mb0, mb1)
    bi = jnp.argmin(cost, axis=1).astype(I32)
    mv_e = jnp.stack(
        [4 * jnp.take_along_axis(cx2, bi[:, None], 1).reshape(B),
         4 * jnp.take_along_axis(cy2, bi[:, None], 1).reshape(B)], 1)

    def mvd_pair(mvq):
        m0 = _mvd_bits_j(mvq[:, 0] - c0mv[:, 0]) \
            + _mvd_bits_j(mvq[:, 1] - c0mv[:, 1])
        m1 = _mvd_bits_j(mvq[:, 0] - c1mv[:, 0]) \
            + _mvd_bits_j(mvq[:, 1] - c1mv[:, 1])
        return m0, m1

    if subpel:
        shift1 = bit_depth - 8
        by = (mv_e[:, 1] >> 2) + 44
        bx = (mv_e[:, 0] >> 2) + 44
        w24 = _win_at(WIN, by, bx, n + 8, n + 8)

        def hpass(xf):
            return sum(int(_FL_NP[xf][k]) * w24[:, :, k:k + n + 1]
                       for k in range(8))
        hp = [w24[:, :, 3:n + 4] << (14 - bit_depth)] \
            + [hpass(f) for f in (1, 2, 3)]

        def qval(dqx, dqy):
            xf, ix = dqx & 3, dqx >> 2
            yf, iy = dqy & 3, dqy >> 2
            if xf == 0 and yf == 0:
                return w24[:, iy + 4:iy + 4 + n, ix + 4:ix + 4 + n] \
                    << (14 - bit_depth)
            if yf == 0:
                return hp[xf][:, iy + 4:iy + 4 + n, ix + 1:ix + 1 + n] \
                    >> shift1
            if xf == 0:
                col = w24[:, :, ix + 4:ix + 4 + n]
                return sum(int(_FL_NP[yf][k])
                           * col[:, iy + 1 + k:iy + 1 + n + k]
                           for k in range(8)) >> shift1
            t = hp[xf] >> shift1
            return sum(int(_FL_NP[yf][k])
                       * t[:, iy + 1 + k:iy + 1 + n + k, ix + 1:ix + 1 + n]
                       for k in range(8)) >> 6

        vals_q, costs_q = {}, {}
        cost_int = jnp.take_along_axis(cost, bi[:, None], 1).reshape(B)
        for dqy in range(-3, 4):
            for dqx in range(-3, 4):
                v = qval(dqx, dqy)
                vals_q[(dqx, dqy)] = v
                if dqx == 0 and dqy == 0:
                    costs_q[(0, 0)] = cost_int
                    continue
                p = _weight_uni_j(v, bit_depth) if wl is None else \
                    _weight_explicit_j(v, wl[0], wl[1], bit_depth)
                sadq = jnp.sum(jnp.abs(src - p), axis=(1, 2))
                mvq = mv_e + jnp.asarray([dqx, dqy], I32)[None]
                m0, m1 = mvd_pair(mvq)
                costs_q[(dqx, dqy)] = (sadq << 4) \
                    + sl16 * jnp.minimum(m0, m1)

        def cost_at(dx_arr, dy_arr):
            return sum(jnp.where((dx_arr == px) & (dy_arr == py),
                                 costs_q[(px, py)], 0)
                       for px in range(-3, 4) for py in range(-3, 4))

        def refine(base_dx, base_dy, step_):
            best_dx, best_dy = base_dx, base_dy
            best_c = cost_at(base_dx, base_dy)
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if (dx, dy) == (0, 0):
                        continue
                    ndx = base_dx + dx * step_
                    ndy = base_dy + dy * step_
                    nc = cost_at(ndx, ndy)
                    better = nc < best_c
                    best_dx = jnp.where(better, ndx, best_dx)
                    best_dy = jnp.where(better, ndy, best_dy)
                    best_c = jnp.where(better, nc, best_c)
            return best_dx, best_dy

        z = jnp.zeros((B,), I32)
        dx1, dy1 = refine(z, z, 2)
        dx2, dy2 = refine(dx1, dy1, 1)
        mv_e = mv_e + jnp.stack([dx2, dy2], 1)
        val_e = sum(jnp.where(((dx2 == px) & (dy2 == py))[:, None, None],
                              vals_q[(px, py)], 0)
                    for px in range(-3, 4) for py in range(-3, 4))
    else:
        if wl is None:
            val_e = jnp.take_along_axis(
                cand, bi[:, None, None, None], 1).reshape(B, n, n) \
                << (14 - bit_depth)
        else:
            # cand holds WEIGHTED pixels (search domain); the prediction
            # intermediate must be unweighted -- refetch from WIN
            w = _win_at(WIN, (mv_e[:, 1] >> 2) + 48,
                        (mv_e[:, 0] >> 2) + 48, n, n)
            val_e = w << (14 - bit_depth)
    mb0b, mb1b = mvd_pair(mv_e)
    return mv_e, mb0b, mb1b, val_e


def _merge_luma_val_ref(pad_y, r, c, mg_mv, bit_depth, subpel, n: int = 16):
    """14-bit luma MC intermediate at a merge MV against one pad.

    Merge MVs inherit the extended search range (|mv| <= ~41 px), so the
    taps window is a per-lane slice of the CU superwindow."""
    B = mg_mv.shape[0]
    WIN = _luma_superwin(pad_y, r, c, n)
    if subpel:
        shift1 = bit_depth - 8
        bym = (mg_mv[:, 1] >> 2) + 45
        bxm = (mg_mv[:, 0] >> 2) + 45
        w23 = _win_at(WIN, bym, bxm, n + 7, n + 7)
        xfm = mg_mv[:, 0] & 3
        yfm = mg_mv[:, 1] & 3
        cxm = _sel_coeffs(_FL_NP, xfm, 8)
        cym = _sel_coeffs(_FL_NP, yfm, 8)
        hm = sum(cxm[:, k, None, None] * w23[:, :, k:k + n]
                 for k in range(8))
        p00m = w23[:, 3:3 + n, 3:3 + n] << (14 - bit_depth)
        phm = hm[:, 3:3 + n] >> shift1
        pvm = sum(cym[:, k, None, None] * w23[:, k:k + n, 3:3 + n]
                  for k in range(8)) >> shift1
        thm = hm >> shift1
        phvm = sum(cym[:, k, None, None] * thm[:, k:k + n]
                   for k in range(8)) >> 6
        xzm = (xfm == 0)[:, None, None]
        yzm = (yfm == 0)[:, None, None]
        return jnp.where(xzm & yzm, p00m,
                         jnp.where(yzm, phm, jnp.where(xzm, pvm, phvm)))
    w16 = _win_at(WIN, (mg_mv[:, 1] >> 2) + 48,
                  (mg_mv[:, 0] >> 2) + 48, n, n)
    return w16 << (14 - bit_depth)


def _chroma_mc_val_n(win, mvx, mvy, bit_depth, nc: int):
    """(B, nc+3, nc+3) gathered window -> (B, nc, nc) 14-bit chroma MC
    intermediate (generalized _chroma_mc_val_j)."""
    shift1 = bit_depth - 8
    xf = mvx & 7
    yf = mvy & 7
    cx = _sel_coeffs(_FC_NP, xf, 4)
    cy = _sel_coeffs(_FC_NP, yf, 4)

    def h4(a, c_):
        return sum(c_[:, k, None, None] * a[..., k:k + nc] for k in range(4))

    def v4(a, c_):
        return sum(c_[:, k, None, None] * a[:, k:k + nc] for k in range(4))

    p00 = win[:, 1:1 + nc, 1:1 + nc] << (14 - bit_depth)
    ph = h4(win, cx)[:, 1:1 + nc] >> shift1
    pv = v4(win[:, :, 1:1 + nc], cy) >> shift1
    tmp = h4(win, cx) >> shift1
    phv = v4(tmp, cy) >> 6
    xz = (xf == 0)[:, None, None]
    yz = (yf == 0)[:, None, None]
    return jnp.where(xz & yz, p00,
                     jnp.where(yz, ph, jnp.where(xz, pv, phv)))


def _chroma_val_ref(pad_c, r, c, mv, bit_depth, nc: int = 8):
    """14-bit chroma MC intermediate at a (luma-quarter-pel) MV: per-lane
    (nc+3)x(nc+3) taps window from the chroma superwindow."""
    B = pad_c.shape[0]
    CWIN = jax.lax.dynamic_slice(
        pad_c, (0, r * nc + MARGIN_C - 24, c * nc + MARGIN_C - 24),
        (B, nc + 48, nc + 48))
    wins = _win_at(CWIN, (mv[:, 1] >> 3) + 23, (mv[:, 0] >> 3) + 23,
                   nc + 3, nc + 3)
    return _chroma_mc_val_n(wins, mv[:, 0], mv[:, 1], bit_depth, nc)


def _rowscan_v1_scan(src_y, src_cb, src_cr, qp, lam_bits, tnh, tnw, bit_depth,
                     refs=None, lam16=None, enable_nxn=True,
                     ref_pads=None, sl16=None, subpel=True,
                     ref_pads1=None, dsf=None, sdh=False, rdoq=False,
                     wp=None):
    """Shared row-scan body.

    refs=(ref_y, ref_cb, ref_cr) (block layout) enables the P-slice zero-MV
    skip candidate.  ref_pads=(pad_y, pad_cb, pad_cr) (padded tile planes,
    MARGIN halo built from the FULL reference picture) enables the
    motion-compensated P step instead: full +-8 integer search, merge /
    explicit-MV / skip / intra RD — replicating the numpy reference encoder
    (mc=True, subpel=False) bit-exactly.

    ref_pads1 (same layout) enables the B step: two reference lists,
    skip / merge / L0 / L1 / BI / intra RD, bit-exact with the numpy
    encode_frame_b_decisions (reference_encoder_v1.py:389).  dsf: (2,)
    cross-list MV scaling factors (list 0, list 1), host-precomputed from
    the POC deltas."""
    B = src_y.shape[0]
    b_mode = ref_pads1 is not None
    mc_mode = ref_pads is not None and not b_mode
    p_mode = refs is not None or mc_mode or b_mode
    maxv = (1 << bit_depth) - 1
    # wp: (6,) traced vector (wy, oy, wcb, ocb, wcr, ocr) -> explicit
    # P-slice weighted prediction (spec 8.5.3.2.9.3); None compiles the
    # default-weighting graph.  (64,0) weights are bit-identical to None.
    if wp is not None:
        assert mc_mode, "weightp applies to the MC P step only"
        _wl = (wp[0], wp[1])

        def _wu_y(v):
            return _weight_explicit_j(v, wp[0], wp[1], bit_depth)

        def _wu_cb(v):
            return _weight_explicit_j(v, wp[2], wp[3], bit_depth)

        def _wu_cr(v):
            return _weight_explicit_j(v, wp[4], wp[5], bit_depth)
    else:
        _wl = None
        _wu_y = _wu_cb = _wu_cr = lambda v: _weight_uni_j(v, bit_depth)

    def shs(scan):
        """sdh_scan arg for _tu: the TB's entropy scan when sign-data
        hiding is on (static flag), else None (fix-up compiled out)."""
        return scan if sdh else None

    # every TB in this scan body quantizes with the same static toolset
    _tu = partial(_tu_q, rdoq=rdoq)
    qp_bd = 6 * (bit_depth - 8)
    qp_eff = qp + qp_bd
    qpc = jnp.asarray(_CQP)[jnp.clip(qp, 0, 57)] + qp_bd
    DC = jnp.full((B,), 1, I32)

    src_y_rows = src_y.transpose(1, 0, 2, 3, 4)
    src_cb_rows = src_cb.transpose(1, 0, 2, 3, 4)
    src_cr_rows = src_cr.transpose(1, 0, 2, 3, 4)
    if refs is not None:
        ref_y_rows = refs[0].transpose(1, 0, 2, 3, 4)
        ref_cb_rows = refs[1].transpose(1, 0, 2, 3, 4)
        ref_cr_rows = refs[2].transpose(1, 0, 2, 3, 4)

    state = dict(
        top_y=jnp.zeros((B, tnw * 16), I32),
        top_cb=jnp.zeros((B, tnw * 8), I32),
        top_cr=jnp.zeros((B, tnw * 8), I32),
        left_y=jnp.zeros((B, 16), I32),
        left_cb=jnp.zeros((B, 8), I32),
        left_cr=jnp.zeros((B, 8), I32),
        corner_y=jnp.zeros((B,), I32),
        corner_cb=jnp.zeros((B,), I32),
        corner_cr=jnp.zeros((B,), I32),
        left_modes=jnp.full((B, 2), 1, I32),   # (top-right, bottom-right)
    )
    if mc_mode:
        # motion state for merge/AMVP: left CTU, above row, above-left corner
        state.update(
            left_inter=jnp.zeros((B,), jnp.bool_),
            left_mv=jnp.zeros((B, 2), I32),
            top_inter=jnp.zeros((B, tnw), jnp.bool_),
            top_mv=jnp.zeros((B, tnw, 2), I32),
            corner_inter=jnp.zeros((B,), jnp.bool_),
            corner_mv=jnp.zeros((B, 2), I32),
        )
    elif b_mode:
        # full motion records per neighbor: prediction flag + MV per list
        state.update(
            left_pf=jnp.zeros((B, 2), jnp.bool_),
            left_mv2=jnp.zeros((B, 2, 2), I32),
            top_pf=jnp.zeros((B, tnw, 2), jnp.bool_),
            top_mv2=jnp.zeros((B, tnw, 2, 2), I32),
            corner_pf=jnp.zeros((B, 2), jnp.bool_),
            corner_mv2=jnp.zeros((B, 2, 2), I32),
        )

    zeros8 = jnp.zeros((B, 8), I32)
    zeros4 = jnp.zeros((B, 4), I32)
    zeros1 = jnp.zeros((B,), I32)
    F = jnp.asarray(False)
    Tr = jnp.asarray(True)

    def step(state, d):
        r = d // tnw
        c = d % tnw
        al = c > 0
        aa = r > 0
        aar = aa & (c < tnw - 1)
        ac = al & aa
        cclamp = jnp.minimum(c + 1, tnw - 1)

        src = jax.lax.dynamic_slice(src_y_rows, (r, 0, c, 0, 0),
                                    (1, B, 1, 16, 16)).reshape(B, 16, 16)
        top16 = jax.lax.dynamic_slice(state["top_y"], (0, c * 16), (B, 16))
        tr16 = jax.lax.dynamic_slice(state["top_y"], (0, cclamp * 16), (B, 16))
        left16 = state["left_y"]
        corner = state["corner_y"]

        # ---- 2Nx2N candidate ----
        ref2n = _assemble_ref(zeros8.repeat(2, 1), left16, corner,
                              top16, tr16, F, al, ac, aa, aar, 16, bit_depth)
        a2n = jnp.where(al, state["left_modes"][:, 0], DC)
        c0, c1, c2 = _mpm_jax(a2n, DC)
        mode2n, pred2n, cost2n = _search_select(src, ref2n, 16, lam_bits,
                                                c0, c1, c2, maxv)

        # ---- NxN candidate: 4 sequential 8x8 sub-searches ----
        # CTU-local luma recon buffer for sub-block refs
        sub_modes = []
        sub_out = []
        cost_nxn = jnp.zeros((B,), I32)
        ctu_rec = jnp.zeros((B, 16, 16), I32)
        for i in range(4 if enable_nxn else 0):
            dx, dy = (i & 1) * 8, (i >> 1) * 8
            sub = src[:, dy:dy + 8, dx:dx + 8]
            if i == 0:
                bl = left16[:, 8:16]
                lf = left16[:, 0:8]
                cor = corner
                tp = top16[:, 0:8]
                trr = top16[:, 8:16]
                flags = (al, al, ac, aa, aa)
                a_m = jnp.where(al, state["left_modes"][:, 0], DC)
                b_m = DC
            elif i == 1:
                bl = zeros8
                lf = ctu_rec[:, 0:8, 7]
                cor = top16[:, 7]
                tp = top16[:, 8:16]
                trr = tr16[:, 0:8]
                flags = (F, Tr, aa, aa, aar)
                a_m = sub_modes[0]
                b_m = DC
            elif i == 2:
                bl = zeros8
                lf = left16[:, 8:16]
                cor = left16[:, 7]
                tp = ctu_rec[:, 7, 0:8]
                trr = ctu_rec[:, 7, 8:16]
                flags = (F, al, al, Tr, Tr)
                a_m = jnp.where(al, state["left_modes"][:, 1], DC)
                b_m = sub_modes[0]
            else:
                bl = zeros8
                lf = ctu_rec[:, 8:16, 7]
                cor = ctu_rec[:, 7, 7]
                tp = ctu_rec[:, 7, 8:16]
                trr = zeros8
                flags = (F, Tr, Tr, Tr, F)
                a_m = sub_modes[2]
                b_m = sub_modes[1]
            ref = _assemble_ref(bl, lf, cor, tp, trr, *flags, 8, bit_depth)
            s0, s1, s2 = _mpm_jax(a_m, b_m)
            m, p, cst = _search_select(sub, ref, 8, lam_bits, s0, s1, s2, maxv)
            lvl, cbf, rec = _tu(sub, p, qp_eff, 8, bit_depth, maxv,
                                sdh_scan=shs(_scan_sel_j(m)))
            ctu_rec = ctu_rec.at[:, dy:dy + 8, dx:dx + 8].set(rec)
            sub_modes.append(m)
            sub_out.append((lvl, cbf))
            cost_nxn = cost_nxn + cst

        if enable_nxn:
            part = cost_nxn < cost2n                      # (B,)
        else:
            part = jnp.zeros((B,), jnp.bool_)
            sub_modes = [mode2n] * 4
            sub_out = [(jnp.zeros((B, 8, 8), I32),
                        jnp.zeros((B,), jnp.bool_))] * 4

        # ---- luma selection ----
        lvl2n, cbf2n, rec2n = _tu(src, pred2n, qp_eff, 16, bit_depth, maxv,
                                  sdh_scan=shs(0))
        lvl_nxn = jnp.zeros((B, 16, 16), I32)
        for i in range(4):
            dx, dy = (i & 1) * 8, (i >> 1) * 8
            lvl_nxn = lvl_nxn.at[:, dy:dy + 8, dx:dx + 8].set(sub_out[i][0])
        pm = part[:, None, None]
        lvl_y = jnp.where(pm, lvl_nxn, lvl2n)
        rec_y = jnp.where(pm, ctu_rec, rec2n)
        modes4 = jnp.stack([jnp.where(part, sub_modes[i], mode2n)
                            for i in range(4)], axis=1)
        cbf_y4 = jnp.stack([jnp.where(part, sub_out[i][1], cbf2n)
                            for i in range(4)], axis=1)
        chroma_mode = jnp.where(part, sub_modes[0], mode2n)

        # ---- chroma: both variants ----
        ch = {}
        src_c = {}
        for (rows, tkey, lkey, ckey, name) in (
                (src_cb_rows, "top_cb", "left_cb", "corner_cb", "cb"),
                (src_cr_rows, "top_cr", "left_cr", "corner_cr", "cr")):
            sc = jax.lax.dynamic_slice(rows, (r, 0, c, 0, 0),
                                       (1, B, 1, 8, 8)).reshape(B, 8, 8)
            src_c[name] = sc
            topc = jax.lax.dynamic_slice(state[tkey], (0, c * 8), (B, 8))
            trc = jax.lax.dynamic_slice(state[tkey], (0, cclamp * 8), (B, 8))
            lfc = state[lkey]
            corc = state[ckey]
            # variant A: single 8x8 TB
            refc = _assemble_ref(zeros4.repeat(2, 1), lfc, corc, topc, trc,
                                 F, al, ac, aa, aar, 8, bit_depth)
            pallc = _predict_all(refc, 8, maxv, fixups=False, luma=False)
            pc = jnp.take_along_axis(pallc, chroma_mode[:, None, None],
                                     axis=1).reshape(B, 8, 8)
            lvl_a, cbf_a, rec_a = _tu(sc, pc, qpc, 8, bit_depth, maxv,
                                      sdh_scan=shs(0))
            # variant B: four sequential 4x4 TBs
            crec = jnp.zeros((B, 8, 8), I32)
            lvl_b = jnp.zeros((B, 8, 8), I32)
            cbfs_b = []
            if not enable_nxn:
                crec, lvl_b = rec_a, lvl_a
                cbfs_b = [cbf_a] * 4
            for i in range(4 if enable_nxn else 0):
                dx, dy = (i & 1) * 4, (i >> 1) * 4
                subc = sc[:, dy:dy + 4, dx:dx + 4]
                if i == 0:
                    seg = (lfc[:, 4:8], lfc[:, 0:4], corc, topc[:, 0:4],
                           topc[:, 4:8])
                    fl = (al, al, ac, aa, aa)
                elif i == 1:
                    seg = (zeros4, crec[:, 0:4, 3], topc[:, 3],
                           topc[:, 4:8], trc[:, 0:4])
                    fl = (F, Tr, aa, aa, aar)
                elif i == 2:
                    seg = (zeros4, lfc[:, 4:8], lfc[:, 3],
                           crec[:, 3, 0:4], crec[:, 3, 4:8])
                    fl = (F, al, al, Tr, Tr)
                else:
                    seg = (zeros4, crec[:, 4:8, 3], crec[:, 3, 3],
                           crec[:, 3, 4:8], zeros4)
                    fl = (F, Tr, Tr, Tr, F)
                refq = _assemble_ref(*seg, *fl, 4, bit_depth)
                pall4 = _predict_all(refq, 4, maxv, fixups=False, luma=False)
                pq = jnp.take_along_axis(pall4, chroma_mode[:, None, None],
                                         axis=1).reshape(B, 4, 4)
                lq, cq_, rq = _tu(subc, pq, qpc, 4, bit_depth, maxv,
                                  sdh_scan=shs(_scan_sel_j(chroma_mode)))
                crec = crec.at[:, dy:dy + 4, dx:dx + 4].set(rq)
                lvl_b = lvl_b.at[:, dy:dy + 4, dx:dx + 4].set(lq)
                cbfs_b.append(cq_)
            lvl_c = jnp.where(pm, lvl_b, lvl_a)
            rec_c = jnp.where(pm, crec, rec_a)
            cbf4 = jnp.stack([jnp.where(part, cbfs_b[i], cbf_a)
                              for i in range(4)], axis=1)
            cbf_parent = jnp.where(part, jnp.any(jnp.stack(cbfs_b, 1), axis=1),
                                   cbf_a)
            ch[name] = (lvl_c, rec_c, cbf4, cbf_parent)

        rec_cb, rec_cr = ch["cb"][1], ch["cr"][1]
        lmodes = jnp.stack(
            [jnp.where(part, sub_modes[1], mode2n),
             jnp.where(part, sub_modes[3], mode2n)], axis=1)

        # ---- B slice: skip / merge / L0 / L1 / BI / intra ----
        if b_mode:
            pad0_y, pad0_cb, pad0_cr = ref_pads
            pad1_y, pad1_cb, pad1_cr = ref_pads1
            INF = jnp.asarray(2**31 - 1, I32)
            lpf, lmv2 = state["left_pf"], state["left_mv2"]
            b1_pf = jax.lax.dynamic_slice(state["top_pf"], (0, c, 0),
                                          (B, 1, 2)).reshape(B, 2)
            b1_mv2 = jax.lax.dynamic_slice(state["top_mv2"], (0, c, 0, 0),
                                           (B, 1, 2, 2)).reshape(B, 2, 2)
            b0_pf = jax.lax.dynamic_slice(state["top_pf"], (0, cclamp, 0),
                                          (B, 1, 2)).reshape(B, 2)
            b0_mv2 = jax.lax.dynamic_slice(state["top_mv2"],
                                           (0, cclamp, 0, 0),
                                           (B, 1, 2, 2)).reshape(B, 2, 2)
            cpf, cmv2 = state["corner_pf"], state["corner_mv2"]
            a1_av = al & (lpf[:, 0] | lpf[:, 1])
            b1_av = aa & (b1_pf[:, 0] | b1_pf[:, 1])
            b0_av = aar & (b0_pf[:, 0] | b0_pf[:, 1])
            b2_av = ac & (cpf[:, 0] | cpf[:, 1])

            # merge cand 0: full record of first of A1, B1, B0, B2;
            # else the zero-bi candidate (ops.inter.merge_cand0_b)
            mg_pf = jnp.ones((B, 2), jnp.bool_)
            mg_mv2 = jnp.zeros((B, 2, 2), I32)
            for av_, pf_, mv_ in ((b2_av, cpf, cmv2),
                                  (b0_av, b0_pf, b0_mv2),
                                  (b1_av, b1_pf, b1_mv2),
                                  (a1_av, lpf, lmv2)):
                mg_pf = jnp.where(av_[:, None], pf_, mg_pf)
                mg_mv2 = jnp.where(av_[:, None, None], mv_, mg_mv2)

            def amvp_b(lx):
                """Device mirror of ops.inter.amvp_list_b (distinct ref
                POCs per list, so cross-list unscaled never applies)."""
                ly = 1 - lx
                # dsf: (2,) batch-uniform or (B, 2) per-lane factors
                d_ = dsf[lx] if dsf.ndim == 1 else dsf[:, lx][:, None]

                def unscaled(av_, pf_, mv_):
                    return av_ & pf_[:, lx], mv_[:, lx]

                def scaled(av_, pf_, mv_):
                    has = av_ & (pf_[:, lx] | pf_[:, ly])
                    mv = jnp.where(pf_[:, lx][:, None], mv_[:, lx],
                                   _scale_mv_j(mv_[:, ly], d_))
                    return has, mv

                a_h, a_mv = unscaled(a1_av, lpf, lmv2)
                as_h, as_mv = scaled(a1_av, lpf, lmv2)
                ca_h = a_h | as_h
                ca_mv = jnp.where(a_h[:, None], a_mv, as_mv)
                ub_h = jnp.zeros((B,), jnp.bool_)
                ub_mv = jnp.zeros((B, 2), I32)
                sb_h = jnp.zeros((B,), jnp.bool_)
                sb_mv = jnp.zeros((B, 2), I32)
                for av_, pf_, mv_ in ((b2_av, cpf, cmv2),
                                      (b1_av, b1_pf, b1_mv2),
                                      (b0_av, b0_pf, b0_mv2)):
                    h, m = unscaled(av_, pf_, mv_)
                    ub_mv = jnp.where(h[:, None], m, ub_mv)
                    ub_h = ub_h | h
                    h, m = scaled(av_, pf_, mv_)
                    sb_mv = jnp.where(h[:, None], m, sb_mv)
                    sb_h = sb_h | h
                # isScaledFlag dance: without an inter A1, the unscaled B
                # takes A's slot and the scaled B search fills B
                A_h = jnp.where(a1_av, ca_h, ub_h)
                A_mv = jnp.where(a1_av[:, None], ca_mv, ub_mv)
                B_h = jnp.where(a1_av, ub_h, sb_h)
                B_mv = jnp.where(a1_av[:, None], ub_mv, sb_mv)
                dup = A_h & B_h & jnp.all(A_mv == B_mv, -1)
                c0_ = jnp.where(A_h[:, None], A_mv,
                                jnp.where(B_h[:, None], B_mv, 0))
                c1_ = jnp.where((A_h & B_h & ~dup)[:, None], B_mv, 0)
                return c0_, c1_

            c0mv0, c1mv0 = amvp_b(0)
            c0mv1, c1mv1 = amvp_b(1)
            mv_e0, mb00, mb01, val_e0 = _search_explicit_ref(
                src, pad0_y, r, c, c0mv0, c1mv0, sl16, bit_depth, subpel,
                maxv)
            mv_e1, mb10, mb11, val_e1 = _search_explicit_ref(
                src, pad1_y, r, c, c0mv1, c1mv1, sl16, bit_depth, subpel,
                maxv)
            mvp_e0 = (mb00 > mb01).astype(I32)
            mbits0 = jnp.minimum(mb00, mb01)
            mvp_e1 = (mb10 > mb11).astype(I32)
            mbits1 = jnp.minimum(mb10, mb11)
            pred_l0 = _weight_uni_j(val_e0, bit_depth)
            pred_l1 = _weight_uni_j(val_e1, bit_depth)
            pred_bi = _weight_bi_j(val_e0, val_e1, bit_depth)

            valm0 = _merge_luma_val_ref(pad0_y, r, c, mg_mv2[:, 0],
                                        bit_depth, subpel)
            valm1 = _merge_luma_val_ref(pad1_y, r, c, mg_mv2[:, 1],
                                        bit_depth, subpel)
            both_m = mg_pf[:, 0] & mg_pf[:, 1]
            valm_u = jnp.where(mg_pf[:, 0][:, None, None], valm0, valm1)
            pred_m = jnp.where(both_m[:, None, None],
                               _weight_bi_j(valm0, valm1, bit_depth),
                               _weight_uni_j(valm_u, bit_depth))

            def comb_c(pc0, pc1, mv0_, mv1_, pf=None):
                v0 = _chroma_val_ref(pc0, r, c, mv0_, bit_depth)
                v1 = _chroma_val_ref(pc1, r, c, mv1_, bit_depth)
                if pf is None:
                    return _weight_bi_j(v0, v1, bit_depth)
                vu = jnp.where(pf[:, 0][:, None, None], v0, v1)
                return jnp.where((pf[:, 0] & pf[:, 1])[:, None, None],
                                 _weight_bi_j(v0, v1, bit_depth),
                                 _weight_uni_j(vu, bit_depth))

            pm_cb = comb_c(pad0_cb, pad1_cb, mg_mv2[:, 0], mg_mv2[:, 1],
                           mg_pf)
            pm_cr = comb_c(pad0_cr, pad1_cr, mg_mv2[:, 0], mg_mv2[:, 1],
                           mg_pf)
            pl0_cb = _weight_uni_j(_chroma_val_ref(pad0_cb, r, c, mv_e0,
                                                   bit_depth), bit_depth)
            pl0_cr = _weight_uni_j(_chroma_val_ref(pad0_cr, r, c, mv_e0,
                                                   bit_depth), bit_depth)
            pl1_cb = _weight_uni_j(_chroma_val_ref(pad1_cb, r, c, mv_e1,
                                                   bit_depth), bit_depth)
            pl1_cr = _weight_uni_j(_chroma_val_ref(pad1_cr, r, c, mv_e1,
                                                   bit_depth), bit_depth)
            pbi_cb = comb_c(pad0_cb, pad1_cb, mv_e0, mv_e1)
            pbi_cr = comb_c(pad0_cr, pad1_cr, mv_e0, mv_e1)

            def tu3(py, pcb, pcr):
                a = _tu(src, py, qp_eff, 16, bit_depth, maxv,
                        sdh_scan=shs(0))
                b_ = _tu(src_c["cb"], pcb, qpc, 8, bit_depth, maxv,
                         sdh_scan=shs(0))
                c_ = _tu(src_c["cr"], pcr, qpc, 8, bit_depth, maxv,
                         sdh_scan=shs(0))
                return ((a[0], b_[0], c_[0]), (a[1], b_[1], c_[1]),
                        (a[2], b_[2], c_[2]))

            lv_m, cb_m, rc_m = tu3(pred_m, pm_cb, pm_cr)
            lv_0, cb_0, rc_0 = tu3(pred_l0, pl0_cb, pl0_cr)
            lv_1, cb_1, rc_1 = tu3(pred_l1, pl1_cb, pl1_cr)
            lv_b, cb_b, rc_b = tu3(pred_bi, pbi_cb, pbi_cr)

            def sse3(p3):
                return _sse_j(src, p3[0]) + _sse_j(src_c["cb"], p3[1]) \
                    + _sse_j(src_c["cr"], p3[2])

            def lvbits(lv):
                return _level_bits(lv[0]) + _level_bits(lv[1]) \
                    + _level_bits(lv[2])

            j_skip = sse3((pred_m, pm_cb, pm_cr)) + ((lam16 * 2) >> 4)
            any_m = cb_m[0] | cb_m[1] | cb_m[2]
            j_m = jnp.where(
                any_m,
                sse3(rc_m) + ((lam16 * jnp.minimum(12 + lvbits(lv_m),
                                                   2048)) >> 4), INF)
            j_0 = sse3(rc_0) + ((lam16 * jnp.minimum(
                16 + mbits0 + lvbits(lv_0), 2048)) >> 4)
            j_1 = sse3(rc_1) + ((lam16 * jnp.minimum(
                16 + mbits1 + lvbits(lv_1), 2048)) >> 4)
            j_bi2 = sse3(rc_b) + ((lam16 * jnp.minimum(
                24 + mbits0 + mbits1 + lvbits(lv_b), 2048)) >> 4)
            j_i = sse3((rec_y, rec_cb, rec_cr)) + ((lam16 * jnp.minimum(
                8 + _level_bits(lvl_y) + _level_bits(ch["cb"][0])
                + _level_bits(ch["cr"][0]), 2048)) >> 4)

            kind = jnp.argmin(jnp.stack(
                [j_skip, j_m, j_0, j_1, j_bi2, j_i], 1),
                axis=1).astype(I32)           # first-min = priority order
            skipf = kind == 0
            is_m = kind == 1
            is_e = (kind >= 2) & (kind <= 4)
            inter_sel = kind != 5
            dir_e = jnp.clip(kind - 2, 0, 2)

            def sel6(a_s, a_m, a_0, a_1, a_b, a_i, nd):
                k = kind.reshape(kind.shape + (1,) * nd)
                return jnp.where(k == 0, a_s,
                                 jnp.where(k == 1, a_m,
                                           jnp.where(k == 2, a_0,
                                                     jnp.where(k == 3, a_1,
                                                               jnp.where(
                                                                   k == 4,
                                                                   a_b,
                                                                   a_i)))))

            rec_y = sel6(pred_m, rc_m[0], rc_0[0], rc_1[0], rc_b[0],
                         rec_y, 2)
            rec_cb = sel6(pm_cb, rc_m[1], rc_0[1], rc_1[1], rc_b[1],
                          rec_cb, 2)
            rec_cr = sel6(pm_cr, rc_m[2], rc_0[2], rc_1[2], rc_b[2],
                          rec_cr, 2)
            lvl_y = sel6(lv_m[0], lv_m[0], lv_0[0], lv_1[0], lv_b[0],
                         lvl_y, 2)
            lvl_cb_f = sel6(lv_m[1], lv_m[1], lv_0[1], lv_1[1], lv_b[1],
                            ch["cb"][0], 2)
            lvl_cr_f = sel6(lv_m[2], lv_m[2], lv_0[2], lv_1[2], lv_b[2],
                            ch["cr"][0], 2)
            ch["cb"] = (lvl_cb_f,) + ch["cb"][1:]
            ch["cr"] = (lvl_cr_f,) + ch["cr"][1:]
            z1b = jnp.zeros((B,), jnp.bool_)
            cbfi_y = sel6(cb_m[0], cb_m[0], cb_0[0], cb_1[0], cb_b[0],
                          z1b, 0)
            cbfi_cb = sel6(cb_m[1], cb_m[1], cb_0[1], cb_1[1], cb_b[1],
                           z1b, 0)
            cbfi_cr = sel6(cb_m[2], cb_m[2], cb_0[2], cb_1[2], cb_b[2],
                           z1b, 0)
            rqt_e = (cbfi_y | cbfi_cb | cbfi_cr).astype(I32)
            mvp_sel0 = jnp.where(mvp_e0[:, None] == 0, c0mv0, c1mv0)
            mvd0 = mv_e0 - mvp_sel0
            mvp_sel1 = jnp.where(mvp_e1[:, None] == 0, c0mv1, c1mv1)
            mvd1 = mv_e1 - mvp_sel1
            # selected motion record (for neighbors + deblock maps)
            use0 = (kind == 2) | (kind == 4)
            use1 = (kind == 3) | (kind == 4)
            pf_sel = jnp.where(is_e[:, None],
                               jnp.stack([use0, use1], 1),
                               jnp.where((skipf | is_m)[:, None], mg_pf,
                                         jnp.zeros((B, 2), jnp.bool_)))
            mv2_sel = jnp.where(
                is_e[:, None, None],
                jnp.stack([mv_e0, mv_e1], 1),
                jnp.where((skipf | is_m)[:, None, None], mg_mv2, 0))
            mv_f = jnp.where(pf_sel[:, 0][:, None], mv2_sel[:, 0],
                             jnp.where(pf_sel[:, 1][:, None],
                                       mv2_sel[:, 1], 0))
            mv1_f = jnp.where(pf_sel[:, 1][:, None], mv2_sel[:, 1], 0)
            lmodes = jnp.where(inter_sel[:, None],
                               jnp.ones_like(lmodes), lmodes)

        # ---- P slice, MC mode: skip / merge / explicit-MV / intra ----
        elif mc_mode:
            pad_y, pad_cb, pad_cr = ref_pads
            INF = jnp.asarray(2**31 - 1, I32)
            li, lmv = state["left_inter"], state["left_mv"]
            b1_i = jax.lax.dynamic_slice(state["top_inter"], (0, c),
                                         (B, 1)).reshape(B)
            b1_mv = jax.lax.dynamic_slice(state["top_mv"], (0, c, 0),
                                          (B, 1, 2)).reshape(B, 2)
            b0_i = jax.lax.dynamic_slice(state["top_inter"], (0, cclamp),
                                         (B, 1)).reshape(B)
            b0_mv = jax.lax.dynamic_slice(state["top_mv"], (0, cclamp, 0),
                                          (B, 1, 2)).reshape(B, 2)
            a1_av = al & li
            b1_av = aa & b1_i
            b0_av = aar & b0_i
            b2_av = ac & state["corner_inter"]
            cmv = state["corner_mv"]
            # merge cand 0: first of A1, B1, B0, B2 (A0 is undecoded)
            mg_mv = jnp.where(a1_av[:, None], lmv,
                              jnp.where(b1_av[:, None], b1_mv,
                                        jnp.where(b0_av[:, None], b0_mv,
                                                  jnp.where(b2_av[:, None],
                                                            cmv, 0))))
            # AMVP: A = A1; B = first of B0, B1, B2; dedupe; zero-fill
            b_av = b0_av | b1_av | b2_av
            b_mv = jnp.where(b0_av[:, None], b0_mv,
                             jnp.where(b1_av[:, None], b1_mv,
                                       jnp.where(b2_av[:, None], cmv, 0)))
            dup = a1_av & b_av & jnp.all(lmv == b_mv, -1)
            c0mv = jnp.where(a1_av[:, None], lmv,
                             jnp.where(b_av[:, None], b_mv, 0))
            c1mv = jnp.where((a1_av & b_av & ~dup)[:, None], b_mv, 0)

            # two-stage search (coarse 4x +-32 px center + fine +-8 +
            # subpel) via the shared per-list helper; merge/chroma MC from
            # per-lane superwindow slices
            mv_e, mb0b, mb1b, val_e = _search_explicit_ref(
                src, pad_y, r, c, c0mv, c1mv, sl16, bit_depth, subpel,
                maxv, wl=_wl)
            pred_e = _wu_y(val_e)

            def mvd_pair(mvq):
                m0 = _mvd_bits_j(mvq[:, 0] - c0mv[:, 0]) \
                    + _mvd_bits_j(mvq[:, 1] - c0mv[:, 1])
                m1 = _mvd_bits_j(mvq[:, 0] - c1mv[:, 0]) \
                    + _mvd_bits_j(mvq[:, 1] - c1mv[:, 1])
                return m0, m1

            mvp_e = (mb0b > mb1b).astype(I32)
            mbits_e = jnp.minimum(mb0b, mb1b)

            valm = _merge_luma_val_ref(pad_y, r, c, mg_mv, bit_depth,
                                       subpel)
            pred_m = _wu_y(valm)
            pm_cb = _wu_cb(_chroma_val_ref(pad_cb, r, c, mg_mv, bit_depth))
            pm_cr = _wu_cr(_chroma_val_ref(pad_cr, r, c, mg_mv, bit_depth))
            pe_cb = _wu_cb(_chroma_val_ref(pad_cb, r, c, mv_e, bit_depth))
            pe_cr = _wu_cr(_chroma_val_ref(pad_cr, r, c, mv_e, bit_depth))

            lvlm_y, cbfm_y, recm_y = _tu(src, pred_m, qp_eff, 16,
                                         bit_depth, maxv, sdh_scan=shs(0))
            lvlm_cb, cbfm_cb, recm_cb = _tu(src_c["cb"], pm_cb, qpc, 8,
                                            bit_depth, maxv, sdh_scan=shs(0))
            lvlm_cr, cbfm_cr, recm_cr = _tu(src_c["cr"], pm_cr, qpc, 8,
                                            bit_depth, maxv, sdh_scan=shs(0))
            lvle_y, cbfe_y, rece_y = _tu(src, pred_e, qp_eff, 16,
                                         bit_depth, maxv, sdh_scan=shs(0))
            lvle_cb, cbfe_cb, rece_cb = _tu(src_c["cb"], pe_cb, qpc, 8,
                                            bit_depth, maxv, sdh_scan=shs(0))
            lvle_cr, cbfe_cr, rece_cr = _tu(src_c["cr"], pe_cr, qpc, 8,
                                            bit_depth, maxv, sdh_scan=shs(0))

            sse_skip = _sse_j(src, pred_m) + _sse_j(src_c["cb"], pm_cb) \
                + _sse_j(src_c["cr"], pm_cr)
            j_skip = sse_skip + ((lam16 * 2) >> 4)
            sse_m = _sse_j(src, recm_y) + _sse_j(src_c["cb"], recm_cb) \
                + _sse_j(src_c["cr"], recm_cr)
            bits_m = jnp.minimum(12 + _level_bits(lvlm_y)
                                 + _level_bits(lvlm_cb)
                                 + _level_bits(lvlm_cr), 2048)
            any_m = cbfm_y | cbfm_cb | cbfm_cr
            j_m = jnp.where(any_m, sse_m + ((lam16 * bits_m) >> 4), INF)
            sse_e = _sse_j(src, rece_y) + _sse_j(src_c["cb"], rece_cb) \
                + _sse_j(src_c["cr"], rece_cr)
            bits_e = jnp.minimum(16 + mbits_e + _level_bits(lvle_y)
                                 + _level_bits(lvle_cb)
                                 + _level_bits(lvle_cr), 2048)
            j_e = sse_e + ((lam16 * bits_e) >> 4)
            rqt_e = (cbfe_y | cbfe_cb | cbfe_cr).astype(I32)
            sse_i = _sse_j(src, rec_y) + _sse_j(src_c["cb"], rec_cb) \
                + _sse_j(src_c["cr"], rec_cr)
            bits_i = jnp.minimum(8 + _level_bits(lvl_y)
                                 + _level_bits(ch["cb"][0])
                                 + _level_bits(ch["cr"][0]), 2048)
            j_i = sse_i + ((lam16 * bits_i) >> 4)

            kind = jnp.argmin(jnp.stack([j_skip, j_m, j_e, j_i], 1),
                              axis=1).astype(I32)   # first-min = priority
            skipf = kind == 0
            is_m = kind == 1
            is_e = kind == 2
            inter_sel = kind != 3

            def sel4(a_skip, a_m, a_e, a_i, flags_nd):
                k = kind.reshape(kind.shape + (1,) * flags_nd)
                return jnp.where(k == 0, a_skip,
                                 jnp.where(k == 1, a_m,
                                           jnp.where(k == 2, a_e, a_i)))

            rec_y = sel4(pred_m, recm_y, rece_y, rec_y, 2)
            rec_cb = sel4(pm_cb, recm_cb, rece_cb, rec_cb, 2)
            rec_cr = sel4(pm_cr, recm_cr, rece_cr, rec_cr, 2)
            lvl_y = sel4(lvlm_y, lvlm_y, lvle_y, lvl_y, 2)
            lvl_cb_f = sel4(lvlm_cb, lvlm_cb, lvle_cb, ch["cb"][0], 2)
            lvl_cr_f = sel4(lvlm_cr, lvlm_cr, lvle_cr, ch["cr"][0], 2)
            ch["cb"] = (lvl_cb_f,) + ch["cb"][1:]
            ch["cr"] = (lvl_cr_f,) + ch["cr"][1:]
            cbfi_y = jnp.where(is_e, cbfe_y, cbfm_y)
            cbfi_cb = jnp.where(is_e, cbfe_cb, cbfm_cb)
            cbfi_cr = jnp.where(is_e, cbfe_cr, cbfm_cr)
            mvp_sel = jnp.where(mvp_e[:, None] == 0, c0mv, c1mv)
            mvd = mv_e - mvp_sel
            mv_f = jnp.where(is_e[:, None], mv_e,
                             jnp.where(inter_sel[:, None], mg_mv, 0))
            lmodes = jnp.where(inter_sel[:, None],
                               jnp.ones_like(lmodes), lmodes)

        # ---- P slice, zero-MV profile: skip candidate vs intra ----
        elif p_mode:
            refy = jax.lax.dynamic_slice(ref_y_rows, (r, 0, c, 0, 0),
                                         (1, B, 1, 16, 16)).reshape(B, 16, 16)
            refcb = jax.lax.dynamic_slice(ref_cb_rows, (r, 0, c, 0, 0),
                                          (1, B, 1, 8, 8)).reshape(B, 8, 8)
            refcr = jax.lax.dynamic_slice(ref_cr_rows, (r, 0, c, 0, 0),
                                          (1, B, 1, 8, 8)).reshape(B, 8, 8)
            sse_skip = _sse_j(src, refy) + _sse_j(src_c["cb"], refcb) \
                + _sse_j(src_c["cr"], refcr)
            sse_intra = _sse_j(src, rec_y) + _sse_j(src_c["cb"], rec_cb) \
                + _sse_j(src_c["cr"], rec_cr)
            bits = 8 + _level_bits(lvl_y) + _level_bits(ch["cb"][0]) \
                + _level_bits(ch["cr"][0])
            bits = jnp.minimum(bits, 2048)
            j_skip = sse_skip + (lam16 >> 4)
            j_intra = sse_intra + ((lam16 * bits) >> 4)
            skip = j_skip <= j_intra                      # (B,)
            sm = skip[:, None, None]
            rec_y = jnp.where(sm, refy, rec_y)
            rec_cb = jnp.where(sm, refcb, rec_cb)
            rec_cr = jnp.where(sm, refcr, rec_cr)
            lmodes = jnp.where(skip[:, None], jnp.ones_like(lmodes), lmodes)

        # ---- state updates ----
        nxt = dict(state)
        nxt["corner_y"] = jax.lax.dynamic_slice(
            state["top_y"], (0, c * 16 + 15), (B, 1)).reshape(B)
        nxt["corner_cb"] = jax.lax.dynamic_slice(
            state["top_cb"], (0, c * 8 + 7), (B, 1)).reshape(B)
        nxt["corner_cr"] = jax.lax.dynamic_slice(
            state["top_cr"], (0, c * 8 + 7), (B, 1)).reshape(B)
        nxt["top_y"] = jax.lax.dynamic_update_slice(
            state["top_y"], rec_y[:, 15, :], (0, c * 16))
        nxt["top_cb"] = jax.lax.dynamic_update_slice(
            state["top_cb"], rec_cb[:, 7, :], (0, c * 8))
        nxt["top_cr"] = jax.lax.dynamic_update_slice(
            state["top_cr"], rec_cr[:, 7, :], (0, c * 8))
        nxt["left_y"] = rec_y[:, :, 15]
        nxt["left_cb"] = rec_cb[:, :, 7]
        nxt["left_cr"] = rec_cr[:, :, 7]
        nxt["left_modes"] = lmodes
        if mc_mode:
            nxt["corner_inter"] = jax.lax.dynamic_slice(
                state["top_inter"], (0, c), (B, 1)).reshape(B)
            nxt["corner_mv"] = jax.lax.dynamic_slice(
                state["top_mv"], (0, c, 0), (B, 1, 2)).reshape(B, 2)
            nxt["top_inter"] = jax.lax.dynamic_update_slice(
                state["top_inter"], inter_sel[:, None], (0, c))
            nxt["top_mv"] = jax.lax.dynamic_update_slice(
                state["top_mv"], mv_f[:, None, :], (0, c, 0))
            nxt["left_inter"] = inter_sel
            nxt["left_mv"] = mv_f
        elif b_mode:
            nxt["corner_pf"] = jax.lax.dynamic_slice(
                state["top_pf"], (0, c, 0), (B, 1, 2)).reshape(B, 2)
            nxt["corner_mv2"] = jax.lax.dynamic_slice(
                state["top_mv2"], (0, c, 0, 0),
                (B, 1, 2, 2)).reshape(B, 2, 2)
            nxt["top_pf"] = jax.lax.dynamic_update_slice(
                state["top_pf"], pf_sel[:, None, :], (0, c, 0))
            nxt["top_mv2"] = jax.lax.dynamic_update_slice(
                state["top_mv2"], mv2_sel[:, None], (0, c, 0, 0))
            nxt["left_pf"] = pf_sel
            nxt["left_mv2"] = mv2_sel

        rdt = jnp.uint8 if bit_depth == 8 else jnp.uint16
        out = (part, modes4.astype(jnp.int8), cbf_y4,
               ch["cb"][3], ch["cr"][3], ch["cb"][2], ch["cr"][2],
               lvl_y.astype(jnp.int16),
               ch["cb"][0].astype(jnp.int16), ch["cr"][0].astype(jnp.int16),
               rec_y.astype(rdt), rec_cb.astype(rdt), rec_cr.astype(rdt))
        if mc_mode:
            out = out + (skipf, inter_sel & ~skipf, is_m,
                         mvd.astype(jnp.int16), mvp_e.astype(jnp.int8),
                         jnp.where(is_e, rqt_e, 1).astype(jnp.int8),
                         cbfi_y, cbfi_cb, cbfi_cr, mv_f.astype(jnp.int16))
        elif b_mode:
            out = out + (skipf, inter_sel & ~skipf, is_m,
                         mvd0.astype(jnp.int16), mvp_e0.astype(jnp.int8),
                         jnp.where(is_e, rqt_e, 1).astype(jnp.int8),
                         cbfi_y, cbfi_cb, cbfi_cr, mv_f.astype(jnp.int16),
                         dir_e.astype(jnp.int8), mvd1.astype(jnp.int16),
                         mvp_e1.astype(jnp.int8), pf_sel,
                         mv1_f.astype(jnp.int16))
        elif p_mode:
            out = out + (skip,)
        return nxt, out

    _, outs = jax.lax.scan(step, state, jnp.arange(tnh * tnw, dtype=I32))
    return outs


@partial(jax.jit, static_argnames=("tnh", "tnw", "bit_depth", "enable_nxn",
                                   "sdh", "rdoq"))
def encode_tiles_rowscan_v1_jit(src_y, src_cb, src_cr, qp, lam_bits,
                                tnh, tnw, bit_depth=8, enable_nxn=True,
                                sdh=False, rdoq=False):
    return _rowscan_v1_scan(src_y, src_cb, src_cr, qp, lam_bits, tnh, tnw,
                            bit_depth, enable_nxn=enable_nxn, sdh=sdh, rdoq=rdoq)


@partial(jax.jit, static_argnames=("tnh", "tnw", "bit_depth", "enable_nxn",
                                   "sdh", "rdoq"))
def encode_tiles_rowscan_p_jit(src_y, src_cb, src_cr, ref_y, ref_cb, ref_cr,
                               qp, lam_bits, lam16, tnh, tnw, bit_depth=8,
                               enable_nxn=True, sdh=False, rdoq=False):
    """P-frame row-scan: v1 intra search + zero-MV skip per CTU.

    ref planes are the previous picture's DEBLOCKED reconstruction in the
    same (B, tnh, tnw, n, n) block layout.  Returns the v1 outputs plus a
    (steps, B) skip flag; recons reflect the skip selection.
    """
    return _rowscan_v1_scan(src_y, src_cb, src_cr, qp, lam_bits, tnh, tnw,
                            bit_depth, refs=(ref_y, ref_cb, ref_cr),
                            lam16=lam16, enable_nxn=enable_nxn, sdh=sdh, rdoq=rdoq)


@partial(jax.jit, static_argnames=("tnh", "tnw", "bit_depth", "enable_nxn",
                                   "subpel", "sdh", "rdoq"))
def encode_tiles_rowscan_pmc_jit(src_y, src_cb, src_cr,
                                 pad_y, pad_cb, pad_cr,
                                 qp, lam_bits, lam16, sl16,
                                 tnh, tnw, bit_depth=8, enable_nxn=True,
                                 subpel=True, sdh=False, rdoq=False):
    """Motion-compensated P-frame row-scan (device mirror of the numpy
    reference encoder with mc=True, subpel=False).

    pad_*: per-tile reference planes with a MARGIN/MARGIN_C halo of true
    picture pixels (edge-replicated at frame borders), so MC across tile
    boundaries matches the full-picture fetch.  Extra outputs (after the
    13 v1 outputs): skip, inter, merge, mvd, mvp, rqt, cbf_y/cb/cr, mv.
    """
    return _rowscan_v1_scan(src_y, src_cb, src_cr, qp, lam_bits, tnh, tnw,
                            bit_depth, lam16=lam16,
                            ref_pads=(pad_y, pad_cb, pad_cr), sl16=sl16,
                            enable_nxn=enable_nxn, subpel=subpel, sdh=sdh, rdoq=rdoq)


@partial(jax.jit, static_argnames=("tnh", "tnw", "bit_depth", "enable_nxn",
                                   "subpel", "sdh", "rdoq"))
def encode_tiles_rowscan_bmc_jit(src_y, src_cb, src_cr,
                                 pad0_y, pad0_cb, pad0_cr,
                                 pad1_y, pad1_cb, pad1_cr,
                                 qp, lam_bits, lam16, sl16, dsf,
                                 tnh, tnw, bit_depth=8, enable_nxn=False,
                                 subpel=True, sdh=False, rdoq=False):
    """B-frame row-scan (device mirror of the numpy
    encode_frame_b_decisions, reference_encoder_v1.py:389).

    pad0/pad1: padded tile planes of the L0 (past) and L1 (future)
    reference pictures.  qp must already include the B QP offset; dsf is
    the (2,) cross-list MV scaling factor vector.  Extra outputs (after
    the 13 v1 outputs): skip, inter, merge, mvd0, mvp0, rqt, cbf_y/cb/cr,
    mv0, dir, mvd1, mvp1, pf (B, 2), mv1.
    """
    return _rowscan_v1_scan(src_y, src_cb, src_cr, qp, lam_bits, tnh, tnw,
                            bit_depth, lam16=lam16,
                            ref_pads=(pad0_y, pad0_cb, pad0_cr),
                            ref_pads1=(pad1_y, pad1_cb, pad1_cr),
                            sl16=sl16, dsf=dsf,
                            enable_nxn=enable_nxn, subpel=subpel, sdh=sdh, rdoq=rdoq)


def dsf_pair(cur_poc: int, poc0: int, poc1: int) -> np.ndarray:
    """Host-side cross-list MV scaling factors (spec 8.5.3.2.8): entry lx
    scales an MV referencing the OTHER list's picture into list lx."""
    out = []
    for lx in (0, 1):
        tgt, other = (poc0, poc1) if lx == 0 else (poc1, poc0)
        tb = min(max(cur_poc - tgt, -128), 127)
        td = min(max(cur_poc - other, -128), 127)
        tx = ((16384 + (abs(td) >> 1)) // abs(td)) * (1 if td > 0 else -1)
        out.append(min(4095, max(-4096, (tb * tx + 32) >> 6)))
    return np.asarray(out, np.int32)


class RowScanEncoderV1:
    """Host wrapper for the v1 (NxN-capable) row-scan graph."""

    def __init__(self, qp: int, bit_depth: int = 8):
        from hevc_tpu.utils.jaxcfg import ensure_compile_cache
        ensure_compile_cache()
        self.qp = qp
        self.bit_depth = bit_depth
        qp_eff = qp + 6 * (bit_depth - 8)
        lam = 0.85 * 2.0 ** ((qp_eff - 12) / 3.0)
        sl = float(np.sqrt(lam))
        self.lam_bits = jnp.asarray([int(sl * b) for b in (2, 3, 6)],
                                    dtype=np.int32)

    def encode_frames_tiled(self, frames, tile_cols, tile_rows,
                            want_recon: bool = True):
        from hevc_tpu.encoder.frame_jax import JaxIntraEncoder
        F = len(frames)
        blocks = [JaxIntraEncoder._to_blocks(*f) for f in frames]
        nh, nw, H, W = blocks[0][3:]
        assert nh % tile_rows == 0 and nw % tile_cols == 0
        tnh, tnw = nh // tile_rows, nw // tile_cols
        T = tile_cols * tile_rows

        def tsplit(b, bs):
            return (b.reshape(tile_rows, tnh, tile_cols, tnw, bs, bs)
                     .swapaxes(1, 2).reshape(T, tnh, tnw, bs, bs))

        yb = jnp.asarray(np.concatenate([tsplit(b[0], 16) for b in blocks]))
        cbb = jnp.asarray(np.concatenate([tsplit(b[1], 8) for b in blocks]))
        crb = jnp.asarray(np.concatenate([tsplit(b[2], 8) for b in blocks]))
        outs = encode_tiles_rowscan_v1_jit(
            yb, cbb, crb, jnp.asarray(self.qp), self.lam_bits, tnh, tnw,
            self.bit_depth)
        outs = [np.asarray(o) for o in outs]

        def unstep(a, to=None):
            s = a.shape
            x = np.moveaxis(a.reshape(tnh, tnw, F, T, *s[2:]), (2, 3), (0, 1))
            x = x.reshape(F, tile_rows, tile_cols, tnh, tnw, *s[2:])
            x = x.swapaxes(2, 3).reshape(F, nh, nw, *s[2:])
            return x.astype(to) if to is not None else x

        (part, modes4, cbf_y4, cbf_cb, cbf_cr, cbf_cb4, cbf_cr4,
         lvl_y, lvl_cb, lvl_cr, rec_y, rec_cb, rec_cr) = outs
        full = {
            "part_nxn": unstep(part),
            "modes4": unstep(modes4, np.int32),
            "cbf_y4": unstep(cbf_y4),
            "cbf_cb": unstep(cbf_cb), "cbf_cr": unstep(cbf_cr),
            "cbf_cb4": unstep(cbf_cb4), "cbf_cr4": unstep(cbf_cr4),
            "lvl_y": unstep(lvl_y, np.int32),
            "lvl_cb": unstep(lvl_cb, np.int32),
            "lvl_cr": unstep(lvl_cr, np.int32),
        }
        results = []
        if want_recon:
            ry = unstep(rec_y, np.int32)
            rcb = unstep(rec_cb, np.int32)
            rcr = unstep(rec_cr, np.int32)
        for f in range(F):
            d = {k: v[f] for k, v in full.items()}
            if want_recon:
                d["recon"] = {
                    "y": ry[f].swapaxes(1, 2).reshape(H, W),
                    "cb": rcb[f].swapaxes(1, 2).reshape(H // 2, W // 2),
                    "cr": rcr[f].swapaxes(1, 2).reshape(H // 2, W // 2),
                }
            results.append(d)
        return results
