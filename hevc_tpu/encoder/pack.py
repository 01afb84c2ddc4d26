"""Device-side packing of per-frame syntax decisions for host transfer.

The encode graph's host-bound outputs (mode/partition maps, CBFs, MVs,
quantized coefficient levels) are packed ON DEVICE into two compact
buffers per GOP chunk:

  1. a fixed-size "head" per frame — small integer arrays byte-packed,
     boolean maps bit-packed, plus the frame's nonzero-coefficient count;
  2. a variable-length coefficient stream for the whole chunk — 6-byte
     (position:int32, level:int16) records for nonzero levels only,
     compacted with a cumsum/scatter; the host slices the first
     6*total_nnz bytes.

Rationale: the transfer link between host and TPU can be latency- and
bandwidth-bound (25 ms + ~46 MB/s per fetch was measured through the
dev tunnel; PCIe is better but the decisions are still ~22 MB/frame of
int32 at 1080p if fetched naively).  Packing turns ~26 fetches/frame
into 2 fetches per K-frame chunk and ~1.5 MB of payload.

Replaces nothing in the reference (its encoder was an ffmpeg subprocess;
reference core/transcoder.py:497-535 streamed *text* progress instead).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


# host-bound arrays in pack order (name, dtype, per-CTU element count)
_INT_FIELDS = (
    ("modes4", np.int8, 4),
    ("mvp", np.int8, 1),
    ("rqt", np.int8, 1),
    ("dir", np.int8, 1),
    ("mvp1", np.int8, 1),
    ("mvd", np.int16, 2),
    ("mv", np.int16, 2),
    ("mvd1", np.int16, 2),
)
_BOOL_FIELDS = (
    ("part", 1), ("cbf_y4", 4), ("cbf_cb", 1), ("cbf_cr", 1),
    ("cbf_cb4", 4), ("cbf_cr4", 4), ("skip", 1), ("inter", 1),
    ("merge", 1), ("cbf_yi", 1), ("cbf_cbi", 1), ("cbf_cri", 1),
)
# coefficient planes: elements per CTU16 (luma 16x16, chroma 8x8 each)
_COEF_ELEMS = 256 + 64 + 64

# SAO parameter section (present when the spec is built with sao=True):
# the 9 arrays of ops.sao_jax.sao_frame_j in order, all packed as int8
# (offsets are in [-7, 7] at 8/10-bit, band position <= 31, EO class <= 3).
# Shapes are FRAME-grid (nh, nw[, 4]), not lane-grid — sao params are
# estimated on the assembled frame, so they pack/unpack in raster order.
_SAO_FIELDS = (
    ("sao_ty_y", 1), ("sao_aux_y", 1), ("sao_off_y", 4),
    ("sao_ty_c", 1), ("sao_cls_c", 1), ("sao_pos_cb", 1),
    ("sao_pos_cr", 1), ("sao_off_cb", 4), ("sao_off_cr", 4),
)


def _bitpack_j(b):
    """bool (N,) with N % 8 == 0 -> uint8 (N/8,), little-endian bits."""
    x = b.reshape(-1, 8).astype(jnp.uint8)
    w = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return (x * w).sum(axis=1, dtype=jnp.uint8)


def _u8(a):
    """Bitcast any array to a flat uint8 vector."""
    if a.dtype == jnp.bool_:
        a = a.astype(jnp.uint8)
    if a.dtype != jnp.uint8:
        a = jax.lax.bitcast_convert_type(a, jnp.uint8)
    return a.reshape(-1)


class FramePackSpec:
    """Static layout of one frame's packed head + coefficient stream."""

    def __init__(self, tnh: int, tnw: int, T: int, sao: bool = False,
                 sao_grid: tuple[int, int] | None = None):
        self.S, self.T = tnh * tnw, T
        n = self.S * self.T
        self.n_ctu = n
        self.int_bytes = sum(np.dtype(d).itemsize * k
                             for _, d, k in _INT_FIELDS) * n
        nbool = sum(k for _, k in _BOOL_FIELDS) * n
        self.bool_pad = (-nbool) % 8
        self.bool_bytes = (nbool + self.bool_pad) // 8
        self.coef_elems = _COEF_ELEMS * n        # per-frame flat coef count
        self.sao = sao
        # frame-grid shape for the sao section (defaults to one tile row/
        # col layout: callers with multiple tiles/streams pass theirs)
        self.sao_grid = sao_grid
        self.sao_bytes = sum(k for _, k in _SAO_FIELDS) * n if sao else 0
        self.head_bytes = (self.int_bytes + self.bool_bytes
                           + self.sao_bytes + 4)  # + nnz int32

    # ---- device side -------------------------------------------------------
    def pack_head(self, fields: dict, nnz):
        """fields: name -> (S, T, ...) device arrays. Returns uint8 head."""
        parts = [_u8(fields[nm]) for nm, _, _ in _INT_FIELDS]
        bools = jnp.concatenate([fields[nm].reshape(-1)
                                 for nm, _ in _BOOL_FIELDS])
        if self.bool_pad:
            bools = jnp.concatenate(
                [bools, jnp.zeros(self.bool_pad, bool)])
        parts.append(_bitpack_j(bools))
        if self.sao:
            parts += [_u8(fields[nm].astype(jnp.int8))
                      for nm, _ in _SAO_FIELDS]
        parts.append(_u8(nnz.astype(jnp.int32).reshape(1)))
        return jnp.concatenate(parts)

    @staticmethod
    def coef_flat(lvl_y, lvl_cb, lvl_cr):
        """Per-frame flat int16 coefficient vector, pack order."""
        return jnp.concatenate([lvl_y.astype(jnp.int16).reshape(-1),
                                lvl_cb.astype(jnp.int16).reshape(-1),
                                lvl_cr.astype(jnp.int16).reshape(-1)])

    # ---- host side ---------------------------------------------------------
    def unpack_head(self, buf: np.ndarray):
        """uint8 (head_bytes,) -> (fields dict of (S,T,...) arrays, nnz)."""
        S, T, n = self.S, self.T, self.n_ctu
        off = 0
        out = {}
        for nm, dt, k in _INT_FIELDS:
            nb = np.dtype(dt).itemsize * k * n
            a = buf[off:off + nb].view(dt)
            out[nm] = a.reshape((S, T) if k == 1 else (S, T, k))
            off += nb
        bits = np.unpackbits(buf[off:off + self.bool_bytes],
                             bitorder="little")
        off += self.bool_bytes
        boff = 0
        for nm, k in _BOOL_FIELDS:
            cnt = k * n
            out[nm] = bits[boff:boff + cnt].astype(bool).reshape(
                (S, T) if k == 1 else (S, T, k))
            boff += cnt
        if self.sao:
            grid = self.sao_grid
            for nm, k in _SAO_FIELDS:
                cnt = k * n
                a = buf[off:off + cnt].view(np.int8)
                if grid is not None:
                    a = a.reshape(grid if k == 1 else grid + (k,))
                out[nm] = a
                off += cnt
        nnz = int(buf[off:off + 4].view(np.int32)[0])
        return out, nnz

    def unpack_coefs(self, pos: np.ndarray, val: np.ndarray):
        """Frame-local (pos, val) -> dense (lvl_y, lvl_cb, lvl_cr) int16."""
        S, T = self.S, self.T
        dense = np.zeros(self.coef_elems, np.int16)
        dense[pos] = val
        ny = S * T * 256
        nc = S * T * 64
        return (dense[:ny].reshape(S, T, 16, 16),
                dense[ny:ny + nc].reshape(S, T, 8, 8),
                dense[ny + nc:].reshape(S, T, 8, 8))

    def outs_list(self, fields: dict, lvls, b_slice: bool = False):
        """Rebuild the kernel-output list consumed by GopEncoder's
        _dec_from_outs (positions 10-12, the recon planes, stay host-free).

        b_slice appends the B fields; pf/mv1 (decoder-side deblock inputs
        only — the B picture is never a reference) are zero-filled."""
        lvl_y, lvl_cb, lvl_cr = lvls
        f = fields
        out = [f["part"], f["modes4"], f["cbf_y4"], f["cbf_cb"],
               f["cbf_cr"], f["cbf_cb4"], f["cbf_cr4"],
               lvl_y, lvl_cb, lvl_cr, None, None, None,
               f["skip"], f["inter"], f["merge"], f["mvd"], f["mvp"],
               f["rqt"], f["cbf_yi"], f["cbf_cbi"], f["cbf_cri"], f["mv"]]
        if b_slice:
            S, T = f["part"].shape
            out += [f["dir"], f["mvd1"], f["mvp1"],
                    np.zeros((S, T, 2), bool),
                    np.zeros((S, T, 2), np.int16)]
        return out


def coef_stream(dense):
    """(K, coef_elems) int16 -> (bitpacked significance map, compacted
    int16 value stream, total nnz).  Traceable body; see coef_stream_jit.

    Positions travel as a dense bitmap (1 bit/coefficient) instead of
    per-record int32s: a 6-byte-row record scatter costs ~1.9 s for 25M
    rows on TPU while a single int16 element scatter is ~5-10x cheaper,
    and the bitmap is a fixed cheap vector op.  The host fetches the
    bitmap plus vals[:total] and rebuilds positions with unpackbits.

    The value stream stays int16 on device: bitcasting to bytes makes a
    u8[n, 2] intermediate whose TPU tiled layout pads the trailing dim
    2 -> 128 (a 64x HBM blowup — 19 GB at 4K, the round-3 OOM).
    """
    flat = dense.reshape(-1)
    mask = flat != 0
    idx = jnp.cumsum(mask) - 1
    n = flat.shape[0]
    # route zero coefficients to unique out-of-range slots: with
    # unique_indices XLA vectorizes the scatter (a dup-dropping scatter
    # serializes)
    tgt = jnp.where(mask, idx, n + jnp.arange(n, dtype=jnp.int32))
    vals = jnp.zeros(n, jnp.int16).at[tgt].set(
        flat, mode="drop", unique_indices=True)
    bits = _bitpack_j(mask)
    return bits, vals, mask.sum(dtype=jnp.int32)


coef_stream_jit = jax.jit(coef_stream)


def split_coef_bitmap(bitmap: np.ndarray, vals: np.ndarray,
                      coef_elems: int, nnz_per_frame):
    """Host: (bitpacked map, compacted int16 values) -> per-frame
    (positions, values).  Frames are contiguous in both streams."""
    bits = np.unpackbits(np.ascontiguousarray(bitmap, np.uint8),
                         bitorder="little")
    vals = np.asarray(vals, np.int16)
    out = []
    off = 0
    for k, nz in enumerate(nnz_per_frame):
        pos = np.flatnonzero(bits[k * coef_elems:(k + 1) * coef_elems])
        out.append((pos, vals[off:off + nz]))
        off += nz
    return out


def split_coef_stream(arr: np.ndarray, coef_elems: int, nnz_per_frame):
    """Host: (total, 6) record array -> per-frame (pos, val) arrays.

    nnz_per_frame (from the packed heads) gives the split points; records
    are globally ordered so each frame's run is contiguous.
    """
    arr = np.ascontiguousarray(arr, np.uint8)
    pos = arr[:, :4].copy().view(np.int32).reshape(-1)
    val = arr[:, 4:].copy().view(np.int16).reshape(-1)
    out = []
    off = 0
    for k, nz in enumerate(nnz_per_frame):
        p = pos[off:off + nz] - k * coef_elems
        out.append((p, val[off:off + nz]))
        off += nz
    return out
