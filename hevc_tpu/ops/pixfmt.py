"""Pixel-format and colorspace ops — the swscale replacement (SURVEY C-table:
'vectorized JAX ops for colorspace, PQ/BT.2020 transfer, 420<->444, bit-depth').

All functions are pure jnp ops (jit/vmap-friendly); hot paths fuse into the
encode/upscale graphs.
"""
from __future__ import annotations

import numpy as np

# --- color matrices (RGB <-> YCbCr, normalized [0,1] domain) -----------------

BT709_RGB_TO_YUV = np.array([
    [0.2126, 0.7152, 0.0722],
    [-0.114572, -0.385428, 0.5],
    [0.5, -0.454153, -0.045847]], dtype=np.float32)

BT2020_RGB_TO_YUV = np.array([
    [0.2627, 0.6780, 0.0593],
    [-0.13963, -0.36037, 0.5],
    [0.5, -0.459786, -0.040214]], dtype=np.float32)

# RGB primaries conversion BT.709 -> BT.2020 (linear light)
M709_TO_2020 = np.array([
    [0.627404, 0.329283, 0.043313],
    [0.069097, 0.919540, 0.011362],
    [0.016391, 0.088013, 0.895595]], dtype=np.float32)


def rgb_to_yuv(rgb, matrix=BT709_RGB_TO_YUV):
    import jax.numpy as jnp
    m = jnp.asarray(matrix)
    return jnp.einsum("ij,...j->...i", m, rgb)


def yuv_to_rgb(yuv, matrix=BT709_RGB_TO_YUV):
    import jax.numpy as jnp
    m = jnp.asarray(np.linalg.inv(matrix))
    return jnp.einsum("ij,...j->...i", m, yuv)


def primaries_709_to_2020(rgb_linear):
    import jax.numpy as jnp
    return jnp.einsum("ij,...j->...i", jnp.asarray(M709_TO_2020), rgb_linear)


# --- transfer functions --------------------------------------------------------

_PQ_M1 = 2610 / 16384
_PQ_M2 = 2523 / 4096 * 128
_PQ_C1 = 3424 / 4096
_PQ_C2 = 2413 / 4096 * 32
_PQ_C3 = 2392 / 4096 * 32


def pq_encode(linear_nits, peak: float = 10000.0):
    """Linear light (cd/m^2) -> PQ (SMPTE ST 2084) signal [0,1]."""
    import jax.numpy as jnp
    y = jnp.clip(linear_nits / peak, 0.0, 1.0)
    num = _PQ_C1 + _PQ_C2 * y ** _PQ_M1
    den = 1.0 + _PQ_C3 * y ** _PQ_M1
    return (num / den) ** _PQ_M2


def pq_decode(signal, peak: float = 10000.0):
    import jax.numpy as jnp
    e = jnp.clip(signal, 0.0, 1.0) ** (1.0 / _PQ_M2)
    num = jnp.maximum(e - _PQ_C1, 0.0)
    den = _PQ_C2 - _PQ_C3 * e
    return peak * (num / den) ** (1.0 / _PQ_M1)


def hlg_encode(linear, peak: float = 1000.0):
    """Linear scene light [0,1] -> HLG (ARIB STD-B67) signal."""
    import jax.numpy as jnp
    a, b, c = 0.17883277, 0.28466892, 0.55991073
    x = jnp.clip(linear, 0.0, 1.0)
    return jnp.where(x <= 1 / 12, jnp.sqrt(3 * x),
                     a * jnp.log(jnp.maximum(12 * x - b, 1e-7)) + c)


def bt709_gamma_encode(linear):
    import jax.numpy as jnp
    x = jnp.clip(linear, 0.0, 1.0)
    return jnp.where(x < 0.018, 4.5 * x, 1.099 * x ** 0.45 - 0.099)


def bt709_gamma_decode(signal):
    import jax.numpy as jnp
    x = jnp.clip(signal, 0.0, 1.0)
    return jnp.where(x < 0.081, x / 4.5, ((x + 0.099) / 1.099) ** (1 / 0.45))


# --- bit depth / range ----------------------------------------------------------

def requantize(plane, src_bits: int, dst_bits: int):
    """Full-precision bit-depth conversion of integer code values."""
    import jax.numpy as jnp
    if src_bits == dst_bits:
        return plane
    if dst_bits > src_bits:
        return plane.astype(jnp.int32) << (dst_bits - src_bits)
    sh = src_bits - dst_bits
    return (plane.astype(jnp.int32) + (1 << (sh - 1))) >> sh


def sdr8_to_hdr10(y, cb, cr, nits: float = 203.0):
    """Convenience SDR (BT.709, 8-bit) -> HDR10 (PQ/BT.2020, 10-bit) planes.

    Inverse-tone-map-free 'reference white at `nits`' mapping: decode gamma,
    convert primaries, re-encode with PQ.  Chroma is upscaled to luma grid,
    converted, and re-subsampled.
    """
    import jax
    import jax.numpy as jnp
    yf = (y.astype(jnp.float32) - 16.0) / 219.0
    H, W = y.shape
    cbf = (cb.astype(jnp.float32) - 128.0) / 224.0
    crf = (cr.astype(jnp.float32) - 128.0) / 224.0
    cbu = jax.image.resize(cbf, (H, W), "bilinear")
    cru = jax.image.resize(crf, (H, W), "bilinear")
    yuv = jnp.stack([jnp.clip(yf, 0, 1), cbu, cru], axis=-1)
    rgb = jnp.clip(yuv_to_rgb(yuv, BT709_RGB_TO_YUV), 0.0, 1.0)
    lin = bt709_gamma_decode(rgb) * nits
    rgb2020 = primaries_709_to_2020(lin)
    pq = pq_encode(rgb2020)
    yuv2 = rgb_to_yuv(pq, BT2020_RGB_TO_YUV)
    y10 = jnp.clip(jnp.round(yuv2[..., 0] * 876.0 + 64.0), 0, 1023).astype(jnp.int32)
    cb10 = jnp.clip(jnp.round(
        yuv2[::2, ::2, 1] * 896.0 + 512.0), 0, 1023).astype(jnp.int32)
    cr10 = jnp.clip(jnp.round(
        yuv2[::2, ::2, 2] * 896.0 + 512.0), 0, 1023).astype(jnp.int32)
    return y10, cb10, cr10


def yuv420_to_444(y, cb, cr):
    import jax
    H, W = y.shape
    cbu = jax.image.resize(cb.astype("float32"), (H, W), "bilinear")
    cru = jax.image.resize(cr.astype("float32"), (H, W), "bilinear")
    return y, cbu, cru


def yuv444_to_420(y, cb, cr):
    """Simple co-sited 2x2 mean subsampling."""
    import jax.numpy as jnp
    cbs = (cb[0::2, 0::2] + cb[0::2, 1::2] + cb[1::2, 0::2] + cb[1::2, 1::2]) / 4
    crs = (cr[0::2, 0::2] + cr[0::2, 1::2] + cr[1::2, 0::2] + cr[1::2, 1::2]) / 4
    return y, cbs, crs
