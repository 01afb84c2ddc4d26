"""Cross-chip single-frame encoding with ICI halo exchange.

The intra-frame spatial-parallelism module (SURVEY §2/§5: the codec
analogue of tensor/sequence parallelism): ONE picture's tile columns are
sharded over the device mesh and the GOP reference feedback — deblocked
reconstruction → halo-padded reference planes for the next P frame's
motion search — stays entirely on-device, with the MARGIN-wide halo of
neighbor-tile pixels exchanged over ICI via `lax.ppermute` (the
"ring-attention-style" neighbor exchange; reference has no counterpart —
its spatial parallelism is delegated to x265's in-process WPP,
/root/reference/core/transcoder.py:411 `-threads 0`).

Bit-exactness contract: HEVC tiles do not predict, deblock, or SAO
across tile boundaries (ops/deblock_jax.py `_deblock_pad_body` breaks
filtering at tile edges), and the padded-reference halo carries TRUE
neighbor-picture pixels (edge-replicated only at frame borders,
`_pad_tiles_j`).  Hence the sharded step here — local kernel + local
deblock + ppermute halo — produces byte-identical decisions, recons and
pads to the single-device `encoder/gop._gop_step_jit`, which
tests/test_ici_tiles.py asserts.  The entropy/bitstream layer is shared,
so the emitted stream is the same stream.

Layout: tr=1 (one tile row), tc_= T tile columns sharded contiguously
over the 1-D "tile" mesh axis; each device owns T/D adjacent columns.
Only the two outermost halo strips per device move over ICI
(2 * MARGIN * H pixels per step — at 4K/8 devices that is ~0.4% of the
frame, riding ICI, never the host link).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from hevc_tpu.encoder.rowscan_v1 import MARGIN, MARGIN_C


def make_tile_mesh(devices=None, axis: str = "tile") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def _halo_pad_local(strip, m: int, d: int, axis: str):
    """Local deblocked strip (H, Wl) -> (H+2m, Wl+2m) with the left/right
    m-wide halos fetched from the neighbor devices over ICI (ppermute);
    frame-border devices edge-replicate their own outermost column.
    Matches `jnp.pad(frame, m, mode="edge")` sliced at this device's
    columns, i.e. ops/deblock_jax._pad_tiles_j semantics, bit-exactly."""
    i = lax.axis_index(axis)
    v = jnp.pad(strip, ((m, m), (0, 0)), mode="edge")       # top/bottom
    # my right edge -> right neighbor's left halo; my left edge -> left
    # neighbor's right halo (unpaired devices receive zeros, masked below)
    from_left = lax.ppermute(v[:, -m:], axis,
                             [(j, j + 1) for j in range(d - 1)])
    from_right = lax.ppermute(v[:, :m], axis,
                              [(j, j - 1) for j in range(1, d)])
    lh = jnp.where(i == 0, jnp.repeat(v[:, :1], m, 1), from_left)
    rh = jnp.where(i == d - 1, jnp.repeat(v[:, -1:], m, 1), from_right)
    return jnp.concatenate([lh, v, rh], 1)


def _col_pads(padded, t_loc: int, tw: int, m: int):
    """Padded local strip (H+2m, Wl+2m) -> per-column pads
    (t_loc, th+2m, tw+2m); interior halos are local slices."""
    return jnp.stack([padded[:, k * tw:(k + 1) * tw + 2 * m]
                      for k in range(t_loc)], 0)


@partial(jax.jit, static_argnames=("tnh", "tnw", "tc_", "bit_depth",
                                   "enable_nxn", "subpel", "idr", "sdh",
                                   "rdoq", "mesh_", "axis"))
def _gop_step_ici_jit(ya, cba, cra, pad_y, pad_cb, pad_cr, qp, lam_bits,
                      lam16, sl16, tnh, tnw, tc_, bit_depth, enable_nxn,
                      subpel, idr, sdh, rdoq, mesh_, axis):
    """One sharded GOP step: per-device rowscan kernel + per-device
    deblock + ICI halo exchange for the next frame's padded refs.

    ya: (tc_, tnh, tnw, 16, 16), tile columns sharded over `axis`;
    pad_*: (tc_, th+2*MARGIN, tw+2*MARGIN) sharded alike (ignored when
    idr).  Returns the step-major kernel outputs (lane axis sharded),
    the deblocked frame strips, and the next padded refs — identical
    values to encoder/gop._gop_step_jit on one device.
    """
    from hevc_tpu.encoder.rowscan_v1 import _rowscan_v1_scan
    from hevc_tpu.ops.deblock_jax import assemble_deblock_pad_jit

    mesh = mesh_
    d = mesh.shape[axis]
    t_loc = tc_ // d
    th, tw = tnh * 16, tnw * 16
    assert t_loc * d == tc_, f"tc_={tc_} not divisible by mesh size {d}"
    # the halo comes from the IMMEDIATE neighbor only: each device's strip
    # must be at least MARGIN wide (true for any real frame split — a 4K
    # frame on 8 chips is 480 px/device vs MARGIN=48)
    assert t_loc * tw >= MARGIN, (t_loc, tw, MARGIN)

    def body(y, cb, cr, py, pcb, pcr, qp, lam_bits, lam16, sl16):
        if idr:
            outs = _rowscan_v1_scan(y, cb, cr, qp, lam_bits, tnh, tnw,
                                    bit_depth, enable_nxn=enable_nxn,
                                    sdh=sdh, rdoq=rdoq)
            st = outs[0].shape
            intra_s = jnp.ones(st, bool)
            cbf_s = jnp.zeros(st, bool)
            mv_s = jnp.zeros(st + (2,), jnp.int16)
            nxn_s = outs[0]
            # pad out to the P-step arity so both branches share a pytree
            z = jnp.zeros(st, bool)
            outs = tuple(outs) + (z, z, z,
                                  jnp.zeros(st + (2,), jnp.int16),
                                  jnp.zeros(st, jnp.int8),
                                  jnp.zeros(st, jnp.int8),
                                  z, z, z, jnp.zeros(st + (2,), jnp.int16))
        else:
            outs = _rowscan_v1_scan(y, cb, cr, qp, lam_bits, tnh, tnw,
                                    bit_depth, lam16=lam16,
                                    ref_pads=(py, pcb, pcr), sl16=sl16,
                                    enable_nxn=enable_nxn, subpel=subpel,
                                    sdh=sdh, rdoq=rdoq)
            inter_s = outs[13] | outs[14]
            intra_s = ~inter_s
            cbf_s = outs[14] & outs[19]
            mv_s = outs[22]
            nxn_s = outs[0] & intra_s
        dy, dcb, dcr = assemble_deblock_pad_jit.__wrapped__(
            outs[10], outs[11], outs[12], qp, intra_s, cbf_s, mv_s, nxn_s,
            tnh, tnw, 1, t_loc, bit_depth, True, do_pad=False)
        # the collective: MARGIN-wide halo strips ride ICI
        pyn = _col_pads(_halo_pad_local(dy, MARGIN, d, axis),
                        t_loc, tw, MARGIN)
        pcbn = _col_pads(_halo_pad_local(dcb, MARGIN_C, d, axis),
                         t_loc, tw // 2, MARGIN_C)
        pcrn = _col_pads(_halo_pad_local(dcr, MARGIN_C, d, axis),
                         t_loc, tw // 2, MARGIN_C)
        return tuple(outs) + (dy, dcb, dcr, pyn, pcbn, pcrn)

    lane = P(None, "tile")       # step-major kernel outputs (steps, T, ...)
    col = P("tile")              # per-column pads (T, h, w)
    strip = P(None, "tile")      # frame strips (H, W) split by columns
    n_outs = 23
    out_specs = (lane,) * n_outs + (strip,) * 3 + (col,) * 3
    fn = shard_map(body, mesh=mesh,
                   in_specs=(col, col, col, col, col, col,
                             P(), P(), P(), P()),
                   out_specs=out_specs, check_vma=False)
    return fn(ya, cba, cra, pad_y, pad_cb, pad_cr, qp, lam_bits, lam16,
              sl16)


def encode_frame_tiles_ici(mesh: Mesh, ya, cba, cra, pads, qp, lam_bits,
                           lam16, sl16, tnh: int, tnw: int,
                           bit_depth: int = 8, enable_nxn: bool = True,
                           subpel: bool = True, idr: bool = False,
                           sdh: bool = False, rdoq: bool = False,
                           axis: str = "tile"):
    """Encode ONE frame's tile columns across the mesh (IDR or MC-P step).

    pads: (pad_y, pad_cb, pad_cr) from the previous step (any value on
    the IDR step).  Returns (outs, (dy, dcb, dcr), (pad_y, pad_cb,
    pad_cr)) with the kernel outputs lane-sharded and the new pads
    column-sharded — feed them straight into the next call; nothing
    returns to the host between frames.
    """
    col = NamedSharding(mesh, P(axis))
    ya, cba, cra = (jax.device_put(a, col) for a in (ya, cba, cra))
    r = _gop_step_ici_jit(ya, cba, cra, *pads, qp, lam_bits, lam16, sl16,
                          tnh, tnw, ya.shape[0], bit_depth, enable_nxn,
                          subpel, idr, sdh, rdoq, mesh, axis)
    return r[:23], r[23:26], r[26:29]


def zero_pads_ici(mesh: Mesh, tc_: int, tnh: int, tnw: int,
                  axis: str = "tile"):
    """Column-sharded all-zero padded refs (IDR-step placeholder)."""
    col = NamedSharding(mesh, P(axis))
    th, tw = tnh * 16, tnw * 16
    z = partial(jnp.zeros, dtype=jnp.int32)
    return (jax.device_put(z((tc_, th + 2 * MARGIN, tw + 2 * MARGIN)), col),
            jax.device_put(z((tc_, th // 2 + 2 * MARGIN_C,
                              tw // 2 + 2 * MARGIN_C)), col),
            jax.device_put(z((tc_, th // 2 + 2 * MARGIN_C,
                              tw // 2 + 2 * MARGIN_C)), col))
