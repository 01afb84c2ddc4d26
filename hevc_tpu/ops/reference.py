"""Normative HEVC compute primitives — numpy reference implementations.

Bit-exact scalar ground truth for:
  * integer DCT-II (4..32) and 4x4 DST-VII transforms (spec 8.6.4)
  * quantization / normative de-quantization (spec 8.6.3)
  * 35-mode intra prediction incl. reference substitution/filtering (8.4.4.2)

The JAX/Pallas kernels in hevc_tpu.ops.* must match these exactly (tested in
tests/test_ops_*.py); the conformance decoder (hevc_tpu.decoder) reuses them
directly.  The reference transcoder delegated all of this to libx265/NVENC.
"""
from __future__ import annotations

import numpy as np

# --- Transform matrices (spec 8.6.4, Table of transform coefficients) -------

# magnitude of 64*sqrt(2)*cos(i*pi/64) as standardized integer values
_V = [64, 90, 90, 90, 89, 88, 87, 85, 83, 82, 80, 78, 75, 73, 70, 67,
      64, 61, 57, 54, 50, 46, 43, 38, 36, 31, 25, 22, 18, 13, 9, 4]


def dct_matrix(n: int) -> np.ndarray:
    """HEVC integer DCT-II matrix of size n in {4, 8, 16, 32}."""
    step = 32 // n
    m = np.zeros((n, n), dtype=np.int32)
    for k in range(n):
        kk = k * step
        for j in range(n):
            if kk == 0:
                m[k, j] = 64
                continue
            i = ((2 * j + 1) * kk) % 128
            jfold = min(i, 128 - i)
            m[k, j] = _V[jfold] if jfold < 32 else -_V[64 - jfold]
    return m


DST4 = np.array([[29, 55, 74, 84],
                 [74, 74, 0, -74],
                 [84, -29, -74, 55],
                 [55, -84, 74, -29]], dtype=np.int32)

DCT = {n: dct_matrix(n) for n in (4, 8, 16, 32)}


def _tmatrix(n: int, dst: bool) -> np.ndarray:
    return DST4 if (dst and n == 4) else DCT[n]


def forward_transform(resi: np.ndarray, dst: bool = False,
                      bit_depth: int = 8) -> np.ndarray:
    """2D forward transform (encoder-side; x265-convention shifts)."""
    n = resi.shape[0]
    log2n = n.bit_length() - 1
    t = _tmatrix(n, dst).astype(np.int64)
    shift1 = log2n + bit_depth - 9
    shift2 = log2n + 6
    tmp = (resi.astype(np.int64) @ t.T + (1 << (shift1 - 1))) >> shift1
    coef = (t @ tmp + (1 << (shift2 - 1))) >> shift2
    return coef.astype(np.int32)


def inverse_transform(coef: np.ndarray, dst: bool = False,
                      bit_depth: int = 8) -> np.ndarray:
    """Normative 2D inverse transform (spec 8.6.4.2): 7-bit then 12-bit shifts."""
    n = coef.shape[0]
    t = _tmatrix(n, dst).astype(np.int64)
    shift2 = 20 - bit_depth
    e = t.T @ coef.astype(np.int64)
    e = np.clip((e + 64) >> 7, -32768, 32767)
    r = (e @ t + (1 << (shift2 - 1))) >> shift2
    return np.clip(r, -32768, 32767).astype(np.int32)


# --- Quantization (spec 8.6.3) -----------------------------------------------

QUANT_SCALES = np.array([26214, 23302, 20560, 18396, 16384, 14564], np.int64)
DEQUANT_SCALES = np.array([40, 45, 51, 57, 64, 72], np.int64)

# lambda = 0.85 * 2^((qp-12)/3) in pixel-SSE units, fixed-point x256.
# Single source for both the numpy and device SDH fix-ups (bit-exact).
SDH_LAMBDA256 = np.round(0.85 * 2.0 ** ((np.arange(64) - 12) / 3.0)
                         * 256).astype(np.int64)


def sdh_lambda_c(qp, log2n: int, bit_depth: int):
    """lambda per bit in TRANSFORM-domain SSE units, int.

    The HEVC forward transform scales pixel residuals by
    2^(15 - bit_depth - log2n) (rows of the core matrix have norm
    64*sqrt(n); the forward shifts remove 2*log2n + bit_depth - 3
    bits), so coefficient-domain SSE = pixel SSE * 4^k with
    k = 15 - bit_depth - log2n.  Clamped to 2^27 so int32 cost sums
    cannot overflow on device.
    """
    k2 = 2 * (15 - bit_depth - log2n)
    lam = SDH_LAMBDA256[np.minimum(qp, 63)]
    if k2 >= 8:
        return np.minimum(lam, 1 << (35 - k2)) << (k2 - 8)
    return np.minimum(lam >> (8 - k2), 1 << 27)


def quantize(coef: np.ndarray, qp: int, bit_depth: int = 8,
             intra: bool = True) -> np.ndarray:
    """Forward quantization (non-normative; deadzone matching recon scale)."""
    n = coef.shape[0]
    log2n = n.bit_length() - 1
    qbits = 14 + qp // 6 + (15 - bit_depth - log2n)
    add = (171 if intra else 85) << (qbits - 9)
    mag = (np.abs(coef.astype(np.int64)) * QUANT_SCALES[qp % 6] + add) >> qbits
    level = np.sign(coef) * mag
    return np.clip(level, -32768, 32767).astype(np.int32)


def _bits4_of_mag(m: np.ndarray) -> np.ndarray:
    """Approximate CABAC residual bits per |level|, quarter-bit units.

    sig_coeff_flag ~0.5 bit for a zero; a one costs sig + gt1 + sign
    ~3 bits; a two adds gt2 ~1.5; m>=3 adds a Golomb-Rice remainder
    growing with bit_length(m-2).  Context-free by design — this is the
    rate half of the RDOQ-lite cost, not an exact CABAC model.
    """
    m = np.abs(m).astype(np.int64)
    r = m - 2
    bl = np.zeros_like(m)
    for k in range(15):                 # bit_length(r) for r < 2^15
        bl += (r >> k) > 0
    return np.where(m == 0, 2,
                    np.where(m == 1, 12,
                             np.where(m == 2, 18, 20 + 8 * bl)))


def quantize_rdoq(coef: np.ndarray, qp: int, bit_depth: int = 8,
                  intra: bool = True) -> np.ndarray:
    """Rate-distortion-aware quantization (RDOQ-lite, non-normative).

    Per coefficient, choose among {0, m-1, m} (m = round-to-nearest
    level) by distortion + lambda * approximate-bits; then zero whole
    4x4 coefficient groups whose content costs more than it is worth
    (the DC group is exempt).  This is the dense-evaluation analogue of
    x265's RDOQ (the reference delegates to x265 at
    core/transcoder.py:398-412); context modeling and last-position
    search are intentionally dropped so the whole decision is a few
    elementwise ops + small reductions (device mirror:
    jax_ops.quantize_rdoq, bit-exact).

    All cost arithmetic uses the same capped-int32 formulation as the
    device kernel so numpy == device exactly.
    """
    n = coef.shape[-1]
    log2n = n.bit_length() - 1
    qbits = 14 + qp // 6 + (15 - bit_depth - log2n)
    mag = np.abs(coef.astype(np.int64))
    m_hi = np.clip((mag * QUANT_SCALES[qp % 6] + (1 << (qbits - 1)))
                   >> qbits, 0, 32767)
    m_lo = np.maximum(m_hi - 1, 0)
    lam_c = min(int(sdh_lambda_c(qp, log2n, bit_depth)), 1 << 22)

    def d_of(m):
        sgn = np.where(coef < 0, -1, 1)
        e = np.minimum(np.abs(coef - dequantize((m * sgn).astype(np.int32),
                                                qp, bit_depth)), 20000)
        return (e * e).astype(np.int64)

    def cost(m):
        return d_of(m) + ((lam_c * _bits4_of_mag(m)) >> 2)

    c_zero = cost(np.zeros_like(m_hi))
    c_lo = cost(m_lo)
    c_hi = cost(m_hi)
    # argmin with tie order zero < lo < hi (fewest bits wins ties)
    m = np.where(c_hi < np.minimum(c_zero, c_lo), m_hi,
                 np.where(c_lo < c_zero, m_lo, 0))
    # coefficient-group zeroing (except the DC group): drop groups whose
    # total rate exceeds the distortion they buy
    if n >= 8:
        g = n // 4
        dch = (d_of(m) >> 4).reshape(g, 4, g, 4).sum((1, 3))
        d0 = (d_of(np.zeros_like(m)) >> 4).reshape(g, 4, g, 4).sum((1, 3))
        bits = _bits4_of_mag(m).reshape(g, 4, g, 4).sum((1, 3)) + 4
        # (lam_c >> 4) * bits stays int32-safe on device (< 6e8)
        kill = (d0 - dch) < (((lam_c >> 4) * bits) >> 2)
        kill[0, 0] = False
        m = np.where(np.repeat(np.repeat(kill, 4, 0), 4, 1), 0, m)
    lvl = np.where(coef < 0, -m, m)
    return np.clip(lvl, -32768, 32767).astype(np.int32)


def sdh_fixup(level: np.ndarray, coef: np.ndarray, qp: int,
              scan_idx: int = 0, bit_depth: int = 8) -> np.ndarray:
    """Sign-data-hiding parity fix-up (non-normative encoder side).

    The decoder (spec 7.4.9.11) infers the sign of the coefficient at
    firstSigScanPosSb of every 4x4 coding sub-block whose significant-
    coefficient span exceeds 3: negative iff the sub-block's absolute
    level sum is odd.  When the parity disagrees with the actual sign,
    one coefficient's magnitude moves by +-1 — chosen to MINIMIZE the
    reconstruction-distortion delta against the true transform
    coefficients (the deadzone quantizer leaves most coefficients near
    a rounding boundary, so the best move is nearly free and frequently
    *improves* distortion).  Three move classes, by rate preference:
    decrement a |level|>=2, zero an INTERIOR +-1 (strictly between the
    sub-block's first/last significant positions, so the span and the
    hidden condition survive), or increment a significant level.  Zeros
    never become significant and first/last positions never move.  The
    reference transcoder got this from x265-medium's always-on
    `signhide` (core/transcoder.py:398-412 delegate; bench log
    "signhide").

    level: (n, n) quantized levels; coef: (n, n) pre-quant transform
    coefficients; returns an adjusted copy of level.  Mirrored on device
    by jax_ops.sdh_fixup (bit-exact, tested) — the capped int32 cost
    arithmetic below exists to match the device kernel exactly.
    """
    from hevc_tpu.entropy import tables as T
    n = level.shape[-1]
    scan = T.scan_order(scan_idx, n)
    out = level.copy()

    def err(lv):
        d = np.abs(coef - dequantize(lv, qp, bit_depth)).astype(np.int64)
        return np.minimum(d, 20000)

    e0 = err(out)
    mag = np.abs(out)
    sgn = np.where(out < 0, -1, 1)
    e_inc = err((mag + 1) * sgn)
    e_dec = err(np.maximum(mag - 1, 0) * sgn)
    lam_c = sdh_lambda_c(qp, int(level.shape[-1]).bit_length() - 1,
                         bit_depth)
    BIG = np.int64(1) << 30      # above any legal capped cost (< 8e8)
    # rate-aware cost: distortion delta + lambda * estimated bit delta
    # (inc grows gt1/gt2/remaining ~ +2 bits; dec shrinks them ~ -1;
    # zeroing an interior +-1 drops gt1 + sign + shorter sig run ~ -3)
    cost_inc = np.where(out != 0,
                        (e_inc - e0) * (e_inc + e0) + 2 * lam_c, BIG)
    cost_dec = np.where(mag >= 2,
                        (e_dec - e0) * (e_dec + e0) - lam_c, BIG)
    cost_zero = np.where(mag == 1,
                         (e_dec - e0) * (e_dec + e0) - 3 * lam_c, BIG)

    vals = out[scan[:, 1], scan[:, 0]]
    ci = cost_inc[scan[:, 1], scan[:, 0]]
    cd = cost_dec[scan[:, 1], scan[:, 0]]
    cz = cost_zero[scan[:, 1], scan[:, 0]]
    for sb in range(n * n // 16):
        sub = vals[sb * 16:(sb + 1) * 16]
        nz = np.nonzero(sub)[0]
        if nz.size == 0 or nz[-1] - nz[0] <= 3:
            continue
        first, last = int(nz[0]), int(nz[-1])
        want_neg = int(np.sum(np.abs(sub)) & 1)
        if want_neg == int(sub[first] < 0):
            continue
        k16 = np.arange(16)
        czi = np.where((k16 > first) & (k16 < last),
                       cz[sb * 16:(sb + 1) * 16], BIG)
        cands = np.concatenate([cd[sb * 16:(sb + 1) * 16], czi,
                                ci[sb * 16:(sb + 1) * 16]])
        j = int(np.argmin(cands))    # ties: dec, then zero, then inc
        k, cls = j % 16, j // 16
        if cls == 1:
            sub[k] = 0
        else:
            sub[k] += (1 if cls == 2 else -1) * (1 if sub[k] > 0 else -1)
    out[scan[:, 1], scan[:, 0]] = vals
    return out


def dequantize(level: np.ndarray, qp: int, bit_depth: int = 8) -> np.ndarray:
    """Normative scaling (spec 8.6.3 with flat m=16 scaling list)."""
    n = level.shape[0]
    log2n = n.bit_length() - 1
    bd_shift = bit_depth + log2n - 5
    scale = (16 * DEQUANT_SCALES[qp % 6]) << (qp // 6)
    d = (level.astype(np.int64) * scale + (1 << (bd_shift - 1))) >> bd_shift
    return np.clip(d, -32768, 32767).astype(np.int32)


def chroma_qp(qp_y: int) -> int:
    """QpC derivation for 4:2:0, zero chroma offsets (spec Table 8-10)."""
    qpi = min(max(qp_y, 0), 57)
    if qpi < 30:
        return qpi
    if qpi > 43:
        return qpi - 6
    return [29, 30, 31, 32, 33, 33, 34, 34, 35, 35, 36, 36, 37, 37][qpi - 30]


# --- Intra prediction (spec 8.4.4.2) ------------------------------------------

INTRA_ANGLE = {
    2: 32, 3: 26, 4: 21, 5: 17, 6: 13, 7: 9, 8: 5, 9: 2, 10: 0,
    11: -2, 12: -5, 13: -9, 14: -13, 15: -17, 16: -21, 17: -26, 18: -32,
    19: -26, 20: -21, 21: -17, 22: -13, 23: -9, 24: -5, 25: -2, 26: 0,
    27: 2, 28: 5, 29: 9, 30: 13, 31: 17, 32: 21, 33: 26, 34: 32,
}
INV_ANGLE = {11: -4096, 12: -1638, 13: -910, 14: -630, 15: -482, 16: -390,
             17: -315, 18: -256, 19: -315, 20: -390, 21: -482, 22: -630,
             23: -910, 24: -1638, 25: -4096}


def build_reference(recon: np.ndarray, x0: int, y0: int, n: int,
                    avail_left: bool, avail_above: bool,
                    bit_depth: int = 8, left_valid: int | None = None,
                    top_valid: int | None = None) -> np.ndarray:
    """Reference sample array for a TB at (x0, y0) of size n.

    Returns (left, top): left[k] = p[-1][k-1] for k in 0..2n (left[0] is the
    corner p[-1][-1]), top[k] = p[k][-1] for k in 0..2n-1... packed instead as
    a single array `ref` of length 4n+1 in substitution scan order:
        ref[0]        = p[-1][2n-1]   (bottom of left column)
        ref[2n-1]     = p[-1][0]
        ref[2n]       = p[-1][-1]     (corner)
        ref[2n+1+k]   = p[k][-1]      (top row, k = 0..2n-1)

    Availability model: raster coding order.  left_valid / top_valid give the
    number of valid samples along the left column / top row (z-scan
    availability for sub-CTB blocks); defaults are the whole-CTB-PU case
    (left n — below-left never coded; top 2n — above row fully coded).
    """
    h, w = recon.shape
    n2 = 2 * n
    ref = np.full(4 * n + 1, -1, dtype=np.int64)
    lv = n if left_valid is None else left_valid
    tv = n2 if top_valid is None else top_valid

    if avail_left:
        avail_rows = min(min(n2, h - y0), lv)
        col = recon[y0:y0 + avail_rows, x0 - 1]
        for k in range(avail_rows):
            ref[n2 - 1 - k] = col[k]
    if avail_left and avail_above:
        ref[n2] = recon[y0 - 1, x0 - 1]
    if avail_above:
        max_x = min(min(n2, w - x0), tv)
        row = recon[y0 - 1, x0:x0 + max_x]
        for k in range(max_x):
            ref[n2 + 1 + k] = row[k]

    # substitution (8.4.4.2.2)
    if np.all(ref < 0):
        ref[:] = 1 << (bit_depth - 1)
    else:
        if ref[0] < 0:
            nz = np.nonzero(ref >= 0)[0][0]
            ref[0] = ref[nz]
        for k in range(1, 4 * n + 1):
            if ref[k] < 0:
                ref[k] = ref[k - 1]
    return ref.astype(np.int32)


def filter_reference(ref: np.ndarray, n: int) -> np.ndarray:
    """[1 2 1]/4 smoothing along the reference array (8.4.4.2.3)."""
    out = ref.copy()
    out[1:-1] = (ref[:-2] + 2 * ref[1:-1] + ref[2:] + 2) >> 2
    return out


def use_filtered_ref(mode: int, n: int, c_idx: int) -> bool:
    if c_idx != 0 or n == 4 or mode == 1:
        return False
    min_dist = min(abs(mode - 26), abs(mode - 10))
    thresh = {8: 7, 16: 1, 32: 0}[n]
    return min_dist > thresh


def predict_intra(ref: np.ndarray, mode: int, n: int, c_idx: int,
                  bit_depth: int = 8) -> np.ndarray:
    """Intra prediction for one mode from the (possibly filtered) ref array.

    `ref` layout as produced by build_reference.  Returns (n, n) int32.
    """
    n2 = 2 * n
    # views: left[y] = p[-1][y] (y = 0..2n-1), top[x] = p[x][-1], corner
    left = ref[n2 - 1::-1]          # p[-1][0..2n-1]
    corner = int(ref[n2])
    top = ref[n2 + 1:]              # p[0..2n-1][-1]
    maxv = (1 << bit_depth) - 1

    if mode == 0:  # planar (8.4.4.2.4)
        x = np.arange(n)
        y = np.arange(n)[:, None]
        pred = ((n - 1 - x) * left[y] + (x + 1) * top[n]
                + (n - 1 - y) * top[x] + (y + 1) * left[n] + n) >> \
            (int(np.log2(n)) + 1)
        return pred.astype(np.int32)

    if mode == 1:  # DC (8.4.4.2.5)
        dc = (int(top[:n].sum()) + int(left[:n].sum()) + n) >> \
            (int(np.log2(n)) + 1)
        pred = np.full((n, n), dc, dtype=np.int32)
        if c_idx == 0 and n < 32:
            pred[0, 0] = (int(left[0]) + 2 * dc + int(top[0]) + 2) >> 2
            pred[0, 1:] = (top[1:n] + 3 * dc + 2) >> 2
            pred[1:, 0] = (left[1:n] + 3 * dc + 2) >> 2
        return pred

    angle = INTRA_ANGLE[mode]
    if mode >= 18:  # vertical-ish (8.4.4.2.6, intraPredMode >= 18)
        # build 1D ref: idx 0 = p[-1][-1], idx 1.. = top row
        r = np.zeros(3 * n + 1, dtype=np.int64)  # r[k] = ref[x = k - n - 1? ]
        # use offset n: r[n + k] for k = -n..2n
        r[n + 0] = corner
        r[n + 1: n + 1 + n2] = top[:n2]
        if angle < 0:
            inv = INV_ANGLE[mode]
            last = (n * angle) >> 5
            for k in range(-1, last - 1, -1):
                # clamp: the k=-1 projection can exceed 2n-1 for small blocks
                # with |angle|=2; that sample is never read by the prediction.
                r[n + k] = left[min(((k * inv + 128) >> 8) - 1, n2 - 1)]
        y = np.arange(1, n + 1)[:, None]
        x = np.arange(n)
        idx = (y * angle) >> 5
        fact = (y * angle) & 31
        base = n + x + idx + 1
        # when fact == 0 the base+1 term is zero-weighted; clip keeps it in range
        nxt = np.minimum(base + 1, 3 * n)
        pred = ((32 - fact) * r[base] + fact * r[nxt] + 16) >> 5
        if mode == 26 and c_idx == 0 and n < 32:
            col = top[0] + ((left[:n].astype(np.int64) - corner) >> 1)
            pred[:, 0] = np.clip(col, 0, maxv)
        return pred.astype(np.int32)

    # horizontal-ish (mode 2..17): transpose-symmetric with left/top swapped
    r = np.zeros(3 * n + 1, dtype=np.int64)
    r[n + 0] = corner
    r[n + 1: n + 1 + n2] = left[:n2]
    if angle < 0:
        inv = INV_ANGLE[mode]
        last = (n * angle) >> 5
        for k in range(-1, last - 1, -1):
            r[n + k] = top[min(((k * inv + 128) >> 8) - 1, n2 - 1)]
    xx = np.arange(1, n + 1)[:, None]   # plays the role of "y" transposed
    yy = np.arange(n)
    idx = (xx * angle) >> 5
    fact = (xx * angle) & 31
    base = n + yy + idx + 1
    nxt = np.minimum(base + 1, 3 * n)
    predt = ((32 - fact) * r[base] + fact * r[nxt] + 16) >> 5
    pred = predt.T.copy()
    if mode == 10 and c_idx == 0 and n < 32:
        row = left[0] + ((top[:n].astype(np.int64) - corner) >> 1)
        pred[0, :] = np.clip(row, 0, maxv)
    return pred.astype(np.int32)


def reconstruct(pred: np.ndarray, resi: np.ndarray, bit_depth: int = 8) -> np.ndarray:
    return np.clip(pred + resi, 0, (1 << bit_depth) - 1).astype(np.int32)
