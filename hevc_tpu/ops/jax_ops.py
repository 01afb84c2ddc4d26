"""JAX/XLA compute primitives for the TPU encode graph.

Bit-exact counterparts of hevc_tpu.ops.reference, shaped for the MXU:
  * forward/inverse integer transforms as f32 matmuls with hi/lo splitting
    (keeps every partial sum < 2^24 so f32 accumulation is exact, then
    recombines in int32 — see SURVEY.md section 7 'Bit-exactness')
  * quantization / normative dequantization in int32
  * 8x8 Hadamard SATD as batched matmuls
  * vectorized reference-sample substitution + smoothing

All functions are pure, shape-static, jit/vmap-friendly.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from hevc_tpu.ops import reference as R

F32 = jnp.float32
I32 = jnp.int32

# TPU MXU default precision is bf16 (8-bit mantissa) which silently breaks
# integer exactness; HIGHEST forces true-f32 accumulation (6-pass bf16).
# Every exactness-critical matmul in this module must use it.
EXACT = jax.lax.Precision.HIGHEST


def exact_matmul_small(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """f32 matmul that is exact when every partial sum stays < 2^24."""
    return jnp.matmul(a, b, preferred_element_type=F32, precision=EXACT)


def _exact_matmul(x: jnp.ndarray, c: jnp.ndarray):
    """Exact int matmul x @ c via hi/lo split in f32.

    x: int32 (..., k) with |x| < 2^16; c: constant int32 (k, m) with small
    entries (|c| <= 90, k <= 32).  Splits x = hi*256 + lo so each f32 product
    sum stays < 2^24.
    """
    cf = c.astype(F32)
    lo = (x & 0xFF).astype(F32)
    hi = jnp.right_shift(x, 8).astype(F32)    # arithmetic shift keeps sign
    plo = exact_matmul_small(lo, cf).astype(I32)
    phi = exact_matmul_small(hi, cf).astype(I32)
    return (phi << 8) + plo


@lru_cache(maxsize=None)
def _tmat_np(n: int, dst: bool):
    t = (R.DST4 if (dst and n == 4) else R.DCT[n]).astype(np.int32)
    return t, t.T.copy()


def _tmat(n: int, dst: bool):
    t, tt = _tmat_np(n, dst)
    # jnp conversion at use: constants fold under jit; caching jnp arrays
    # across traces leaks tracers.
    return jnp.asarray(t), jnp.asarray(tt)


def forward_transform(resi: jnp.ndarray, n: int, dst: bool = False,
                      bit_depth: int = 8) -> jnp.ndarray:
    """2D forward transform of (..., n, n) int32 residual -> int32 coeffs."""
    log2n = n.bit_length() - 1
    t, tt = _tmat(n, dst)
    s1, s2 = log2n + bit_depth - 9, log2n + 6
    tmp = (_exact_matmul(resi, tt) + (1 << (s1 - 1))) >> s1
    # second stage: contract over rows -> transpose, matmul, transpose back
    tmp_t = jnp.swapaxes(tmp, -1, -2)
    coef_t = (_exact_matmul(tmp_t, tt) + (1 << (s2 - 1))) >> s2
    return jnp.swapaxes(coef_t, -1, -2)


def inverse_transform(coef: jnp.ndarray, n: int, dst: bool = False,
                      bit_depth: int = 8) -> jnp.ndarray:
    """Normative 2D inverse transform (spec 8.6.4.2), bit-exact int32."""
    t, tt = _tmat(n, dst)
    s2 = 20 - bit_depth
    # stage 1: e = T^T @ coef  == (coef^T @ T)^T
    coef_t = jnp.swapaxes(coef, -1, -2)
    e_t = _exact_matmul(coef_t, t)
    e_t = jnp.clip((e_t + 64) >> 7, -32768, 32767)
    # stage 2: r = e @ T ; e is (..., col, row)^T so transpose back first
    e = jnp.swapaxes(e_t, -1, -2)
    r = (_exact_matmul(e, t) + (1 << (s2 - 1))) >> s2
    return jnp.clip(r, -32768, 32767)


QUANT_SCALES = jnp.asarray(R.QUANT_SCALES.astype(np.int32))
DEQUANT_SCALES = jnp.asarray(R.DEQUANT_SCALES.astype(np.int32))


def quantize(coef: jnp.ndarray, qp: jnp.ndarray, n: int,
             bit_depth: int = 8, intra: bool = True) -> jnp.ndarray:
    """Forward quantization, int32 (matches reference.quantize)."""
    log2n = n.bit_length() - 1
    qbits = 14 + qp // 6 + (15 - bit_depth - log2n)
    add = (171 if intra else 85) << (qbits - 9)
    scale = QUANT_SCALES[qp % 6]
    mag = jnp.abs(coef)
    # |coef| <= 32767, scale <= 26214: product < 2^31 -> int32 safe
    lvl = jnp.right_shift(mag * scale + add, qbits)
    return jnp.clip(jnp.sign(coef) * lvl, -32768, 32767)


def _bits4_of_mag_j(m: jnp.ndarray) -> jnp.ndarray:
    """Device mirror of reference._bits4_of_mag (quarter-bit units)."""
    m = jnp.abs(m)
    r = m - 2
    bl = jnp.zeros_like(m)
    for k in range(15):
        bl += ((r >> k) > 0).astype(m.dtype)
    return jnp.where(m == 0, 2,
                     jnp.where(m == 1, 12,
                               jnp.where(m == 2, 18, 20 + 8 * bl)))


def _lambda_c_j(qp, log2n: int, bit_depth: int):
    """Device mirror of reference.sdh_lambda_c (int32, traced qp)."""
    k2 = 2 * (15 - bit_depth - log2n)
    lam256 = jnp.asarray(R.SDH_LAMBDA256.astype(np.int32))[
        jnp.minimum(qp, 63)]
    if k2 >= 8:
        return jnp.minimum(lam256, 1 << (35 - k2)) << (k2 - 8)
    return jnp.minimum(lam256 >> (8 - k2), 1 << 27)


def quantize_rdoq(coef: jnp.ndarray, qp, n: int, bit_depth: int = 8,
                  intra: bool = True) -> jnp.ndarray:
    """Device mirror of reference.quantize_rdoq (bit-exact, batched).

    coef: (..., n, n) int32 transform coefficients.  Everything is
    elementwise + 4x4-group reductions; identical capped-int32 cost
    arithmetic to the numpy spec.
    """
    log2n = n.bit_length() - 1
    qbits = 14 + qp // 6 + (15 - bit_depth - log2n)
    mag = jnp.abs(coef)
    m_hi = jnp.clip(jnp.right_shift(
        mag * QUANT_SCALES[qp % 6] + (1 << (qbits - 1)), qbits), 0, 32767)
    m_lo = jnp.maximum(m_hi - 1, 0)
    lam_c = jnp.minimum(_lambda_c_j(qp, log2n, bit_depth), 1 << 22)
    sgn = jnp.where(coef < 0, -1, 1)

    def d_of(m):
        e = jnp.minimum(jnp.abs(coef - dequantize(m * sgn, qp, n,
                                                  bit_depth)), 20000)
        return e * e

    def cost(m):
        return d_of(m) + jnp.right_shift(lam_c * _bits4_of_mag_j(m), 2)

    zero = jnp.zeros_like(m_hi)
    c_zero = cost(zero)
    c_lo = cost(m_lo)
    c_hi = cost(m_hi)
    m = jnp.where(c_hi < jnp.minimum(c_zero, c_lo), m_hi,
                  jnp.where(c_lo < c_zero, m_lo, 0))
    if n >= 8:
        g = n // 4
        lead = coef.shape[:-2]

        def cg_sum(a):
            return a.reshape(lead + (g, 4, g, 4)).sum((-3, -1))

        dch = cg_sum(d_of(m) >> 4)
        d0 = cg_sum(d_of(zero) >> 4)
        bits = cg_sum(_bits4_of_mag_j(m)) + 4
        kill = (d0 - dch) < jnp.right_shift((lam_c >> 4) * bits, 2)
        keep_dc = jnp.zeros((g, g), bool).at[0, 0].set(True)
        kill = kill & ~keep_dc
        kill_full = jnp.repeat(jnp.repeat(kill, 4, axis=-2), 4, axis=-1)
        m = jnp.where(kill_full, 0, m)
    return jnp.clip(jnp.where(coef < 0, -m, m), -32768, 32767)


@lru_cache(maxsize=None)
def _sdh_perms(n: int):
    """(3, n*n) flat scan permutation + inverse per scan_idx, int32.

    Returns NUMPY arrays — converting to jnp here would cache a traced
    constant from one jit context and leak it into the next.
    """
    from hevc_tpu.entropy import tables as T
    perm = np.zeros((3, n * n), np.int32)
    inv = np.zeros((3, n * n), np.int32)
    for s in range(3):
        sc = T.scan_order(s, n)
        p = sc[:, 1] * n + sc[:, 0]
        perm[s] = p
        inv[s, p] = np.arange(n * n, dtype=np.int32)
    return perm, inv


@lru_cache(maxsize=None)
def _sdh_rank4(n: int):
    """(3, 4, 4) within-group scan ranks.  Every HEVC coefficient scan
    partitions an n x n TB into spatial 4x4 groups and orders the 16
    coefficients of each group by one shared rank map per scan class
    (verified against _sdh_perms for n in {4,8,16,32} x all scans) —
    so sign-data hiding never needs the full n*n permutation."""
    _, inv_np = _sdh_perms(n)
    return np.stack([(inv_np[s] % 16).reshape(n, n)[:4, :4]
                     for s in range(3)])


def sdh_fixup(lvl: jnp.ndarray, coef: jnp.ndarray, qp, n: int,
              scan_sel=0, bit_depth: int = 8) -> jnp.ndarray:
    """Device mirror of reference.sdh_fixup (bit-exact, batched).

    lvl/coef: (..., n, n) int32 levels / pre-quant transform
    coefficients; qp: traced or static scalar; scan_sel: scan index in
    {0, 1, 2} — a Python int or a traced scalar/batch array
    broadcastable over the leading dims (mode-dependent scans of NxN
    intra TBs are data).  Per eligible sub-block with a parity mismatch
    the +-1 magnitude move with the smallest capped-int32 distortion
    delta wins (decrements first on ties, matching the numpy argmin
    order).

    Entirely in block layout: coefficient groups are spatial 4x4 blocks
    for every scan, so the scan only enters through a constant 4x4
    within-group rank map and all ops are dense reshapes + group
    reductions.  (The earlier formulation permuted the three cost
    tensors to scan order with take_along_axis — those three gathers
    alone were ~80% of the whole fixup's TPU time.)
    """
    rank_np = _sdh_rank4(n)
    g = n // 4
    lead = lvl.shape[:-2]
    if isinstance(scan_sel, int):
        rank = jnp.asarray(rank_np[scan_sel])[None, :, None, :]
    else:
        sel = jnp.broadcast_to(jnp.asarray(scan_sel, I32), lead)
        rank = jnp.asarray(rank_np)[sel][..., None, :, None, :]

    # capped distortion-delta costs per coefficient (block layout)
    def err(lv):
        d = jnp.abs(coef - dequantize(lv, qp, n, bit_depth))
        return jnp.minimum(d, 20000)

    mag = jnp.abs(lvl)
    sgn = jnp.where(lvl < 0, -1, 1)
    e0 = err(lvl)
    e_inc = err((mag + 1) * sgn)
    e_dec = err(jnp.maximum(mag - 1, 0) * sgn)
    # lambda per bit in transform-SSE units (reference.sdh_lambda_c)
    lam_c = _lambda_c_j(qp, n.bit_length() - 1, bit_depth)
    BIG = jnp.int32(1 << 30)     # above any legal capped cost (< 8e8)
    # rate-aware cost: distortion delta + lambda * estimated bit delta
    cost_inc = jnp.where(lvl != 0,
                         (e_inc - e0) * (e_inc + e0) + 2 * lam_c, BIG)
    cost_dec = jnp.where(mag >= 2,
                         (e_dec - e0) * (e_dec + e0) - lam_c, BIG)
    cost_zero = jnp.where(mag == 1,
                          (e_dec - e0) * (e_dec + e0) - 3 * lam_c, BIG)

    def blk(a):                       # (..., n, n) -> (..., g, 4, g, 4)
        return a.reshape(lead + (g, 4, g, 4))

    def gmin(a):
        return a.min(axis=(-3, -1))   # -> (..., g, g)

    def gmax(a):
        return a.max(axis=(-3, -1))

    def gsum(a):
        return a.sum(axis=(-3, -1))

    def bexp(a):                      # (..., g, g) -> broadcast over group
        return a[..., :, None, :, None]

    v = blk(lvl)
    ci = blk(cost_inc)
    cd = blk(cost_dec)
    cz = blk(cost_zero)
    nz = v != 0
    first = gmin(jnp.where(nz, rank, 16))
    last = gmax(jnp.where(nz, rank, -1))
    hidden = (last - first) > 3
    sumabs = gsum(jnp.abs(v))
    fval = gsum(jnp.where(rank == bexp(first), v, 0))
    mismatch = (sumabs & 1) != (fval < 0).astype(I32)
    adj = hidden & mismatch
    # zeroing is only legal strictly inside (first, last): span survives
    czi = jnp.where((rank > bexp(first)) & (rank < bexp(last)), cz, BIG)
    # min over [dec, zero, inc] x 16 ranks; ties prefer dec, zero, inc,
    # then low scan rank — the priority index t = class*16 + rank
    # reproduces the scan-order argmin of the numpy spec exactly
    m = jnp.minimum(jnp.minimum(gmin(cd), gmin(czi)), gmin(ci))
    mb = bexp(m)
    BT = jnp.int32(64)
    tsel = jnp.minimum(jnp.minimum(
        gmin(jnp.where(cd == mb, rank, BT)),
        gmin(jnp.where(czi == mb, rank + 16, BT))),
        gmin(jnp.where(ci == mb, rank + 32, BT)))
    cls = tsel // 16
    tgt = tsel % 16
    tmask = rank == bexp(tgt)
    tval = gsum(jnp.where(tmask, v, 0))
    tsgn = jnp.where(tval < 0, -1, 1)
    newv = jnp.where(cls == 1, 0,
                     tval + jnp.where(cls == 2, tsgn, -tsgn))
    v = jnp.where(bexp(adj) & tmask, bexp(newv), v)
    return v.reshape(lvl.shape)


def dequantize(level: jnp.ndarray, qp: jnp.ndarray, n: int,
               bit_depth: int = 8) -> jnp.ndarray:
    """Normative scaling (spec 8.6.3, flat list), int32-safe factoring."""
    log2n = n.bit_length() - 1
    b = bit_depth + log2n - 5
    base = 16 * DEQUANT_SCALES[qp % 6]
    e = qp // 6
    x = level * base                                # |x| <= 32767*1152 < 2^26
    lo = jnp.right_shift(x + (1 << jnp.maximum(b - 1 - e, 0)),
                         jnp.maximum(b - e, 0))
    hi = x << jnp.maximum(e - b, 0)
    d = jnp.where(e >= b, hi, lo)
    return jnp.clip(d, -32768, 32767)


@lru_cache(maxsize=None)
def _hadamard_np(k: int):
    h = np.array([[1]], dtype=np.int32)
    while h.shape[0] < k:
        h = np.block([[h, h], [h, -h]])
    return h


def _hadamard(k: int):
    return jnp.asarray(_hadamard_np(k))


def satd(diff: jnp.ndarray, n: int) -> jnp.ndarray:
    """Hadamard SATD of (..., n, n) int32 -> (...,) int32.

    Matches reference_encoder.hadamard_satd: 8x8 blocks (4x4 when n==4),
    result >> 2 (>> 1 for 4x4).
    """
    bs = 8 if n % 8 == 0 else 4
    h = _hadamard(bs)
    nb = n // bs
    d = diff.reshape(*diff.shape[:-2], nb, bs, nb, bs)
    d = jnp.swapaxes(d, -3, -2)                     # (..., nb, nb, bs, bs)
    # |diff| <= 512 -> H@d@H <= 512*64*... : 512*8=4096 per stage1, *8 stage2
    # = 262144 < 2^24: single f32 matmuls are exact, no split needed
    df = d.astype(F32)
    hf = h.astype(F32)
    t = exact_matmul_small(exact_matmul_small(hf, df), hf)
    total = jnp.sum(jnp.abs(t), axis=(-4, -3, -2, -1)).astype(I32)
    return total >> (2 if bs == 8 else 1)


def substitute_refs(vals: jnp.ndarray, avail: jnp.ndarray,
                    bit_depth: int = 8) -> jnp.ndarray:
    """Vectorized reference substitution (spec 8.4.4.2.2).

    vals (..., m) int32 gathered candidates, avail (..., m) bool.
    Each unavailable sample takes the previous available value in array
    order; a missing prefix takes the first available; all-missing -> mid.
    """
    m = vals.shape[-1]
    iota = jnp.arange(m, dtype=I32)
    idx = jnp.where(avail, iota, -1)
    idx = jax.lax.associative_scan(jnp.maximum, idx, axis=-1)
    filled = jnp.take_along_axis(vals, jnp.maximum(idx, 0), axis=-1)
    # first available value for the missing prefix
    first_pos = jnp.argmax(avail, axis=-1)
    first_val = jnp.take_along_axis(vals, first_pos[..., None], axis=-1)
    any_avail = jnp.any(avail, axis=-1, keepdims=True)
    mid = jnp.asarray(1 << (bit_depth - 1), I32)
    out = jnp.where(idx >= 0, filled, first_val)
    return jnp.where(any_avail, out, mid)


def filter_refs(ref: jnp.ndarray) -> jnp.ndarray:
    """[1 2 1]/4 smoothing along the last axis, endpoints kept."""
    left = ref[..., :-2]
    mid = ref[..., 1:-1]
    right = ref[..., 2:]
    sm = (left + 2 * mid + right + 2) >> 2
    return jnp.concatenate([ref[..., :1], sm, ref[..., -1:]], axis=-1)
