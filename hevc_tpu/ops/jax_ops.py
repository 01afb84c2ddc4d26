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
