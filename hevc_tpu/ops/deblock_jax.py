"""Device (JAX) deblocking filter + padded-reference construction.

Keeps the P-frame feedback loop on-chip: the GOP encoder's recon goes
through deblocking and halo padding without a host round-trip, so only the
per-CTU decision arrays leave the device each frame.

Fully vectorized formulation: a plane sliced at [:, 4:W-4] and reshaped to
(rows, n_edges, 8) aligns every 8-grid edge's p3..q3 window in one tensor —
filters write at most +-3 samples around each edge and edges are 8 apart, so
all edges process in parallel with no overlap.  Bit-exact mirror of
ops.deblock (tests enforce it).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hevc_tpu.ops.deblock import BETA_TABLE, TC_TABLE
from hevc_tpu.ops.reference import chroma_qp

I32 = jnp.int32

_CQP = np.array([chroma_qp(q) for q in range(58)], dtype=np.int32)


def _luma_edges_j(seg, beta, tc, en, maxv):
    """Filter aligned vertical luma edges.

    seg: (nE, g, 4, 8) int32 — per edge, per 4-line group, the p3..q3 window.
    beta: scalar; tc: (nE, g) per-edge-group tc (bS-dependent);
    en: (nE, g) bool enable.  Returns filtered seg.
    """
    p = seg[..., 3::-1]
    q = seg[..., 4:]
    d_p = jnp.abs(p[..., 2] - 2 * p[..., 1] + p[..., 0])     # (nE, g, 4)
    d_q = jnp.abs(q[..., 2] - 2 * q[..., 1] + q[..., 0])
    dp0, dp3 = d_p[..., 0], d_p[..., 3]
    dq0, dq3 = d_q[..., 0], d_q[..., 3]
    dpq0 = dp0 + dq0
    dpq3 = dp3 + dq3
    d = dpq0 + dpq3
    filt = (d < beta) & en

    def strong_side_ok(k, dd):
        sp = jnp.abs(p[..., k, 3] - p[..., k, 0])
        sq = jnp.abs(q[..., k, 0] - q[..., k, 3])
        return ((2 * dd < (beta >> 2)) &
                ((sp + sq) < (beta >> 3)) &
                (jnp.abs(p[..., k, 0] - q[..., k, 0]) < ((5 * tc + 1) >> 1)))

    strong = filt & strong_side_ok(0, dpq0) & strong_side_ok(3, dpq3)
    weak = filt & ~strong
    s = strong[..., None]
    tcl = tc[..., None]                                       # per line

    p0, p1, p2, p3 = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sp0 = jnp.clip((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                   p0 - 2 * tcl, p0 + 2 * tcl)
    sp1 = jnp.clip((p2 + p1 + p0 + q0 + 2) >> 2, p1 - 2 * tcl, p1 + 2 * tcl)
    sp2 = jnp.clip((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3,
                   p2 - 2 * tcl, p2 + 2 * tcl)
    sq0 = jnp.clip((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                   q0 - 2 * tcl, q0 + 2 * tcl)
    sq1 = jnp.clip((q2 + q1 + q0 + p0 + 2) >> 2, q1 - 2 * tcl, q1 + 2 * tcl)
    sq2 = jnp.clip((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3,
                   q2 - 2 * tcl, q2 + 2 * tcl)

    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    w_on = weak[..., None] & (jnp.abs(delta) < 10 * tcl)
    dclip = jnp.clip(delta, -tcl, tcl)
    wp0 = jnp.clip(p0 + dclip, 0, maxv)
    wq0 = jnp.clip(q0 - dclip, 0, maxv)
    side_thresh = (beta + (beta >> 1)) >> 3
    dEp = ((dp0 + dp3) < side_thresh)[..., None]
    dEq = ((dq0 + dq3) < side_thresh)[..., None]
    tc2 = tcl >> 1
    dp_ = jnp.clip((((p2 + p0 + 1) >> 1) - p1 + dclip) >> 1, -tc2, tc2)
    dq_ = jnp.clip((((q2 + q0 + 1) >> 1) - q1 - dclip) >> 1, -tc2, tc2)
    wp1 = jnp.clip(p1 + dp_, 0, maxv)
    wq1 = jnp.clip(q1 + dq_, 0, maxv)

    np0 = jnp.where(s, sp0, jnp.where(w_on, wp0, p0))
    np1 = jnp.where(s, sp1, jnp.where(w_on & dEp, wp1, p1))
    np2 = jnp.where(s, sp2, p2)
    nq0 = jnp.where(s, sq0, jnp.where(w_on, wq0, q0))
    nq1 = jnp.where(s, sq1, jnp.where(w_on & dEq, wq1, q1))
    nq2 = jnp.where(s, sq2, q2)
    return jnp.stack([p3, np2, np1, np0, nq0, nq1, nq2, q[..., 3]], -1)


def _edge_bs_j(intra, cbf, mv):
    """(nh, nw-1) bS per vertical CU edge (transpose maps for horizontal)."""
    p, q = np.s_[:, :-1], np.s_[:, 1:]
    two = intra[p] | intra[q]
    mvdiff = jnp.abs(mv[p] - mv[q]).max(-1) >= 4
    one = ~two & (cbf[p] | cbf[q] | mvdiff)
    return jnp.where(two, 2, jnp.where(one, 1, 0))


def _luma_pass_j(plane, qp, intra, cbf, mv, nxn, tile_cols, bit_depth):
    """One direction of luma deblocking over the full frame (vectorized).

    plane: (H, W); maps: (nh, nw) in this orientation; tile_cols: static
    list of CTU-column indices whose left edge is a tile boundary (skipped).
    """
    H, W = plane.shape
    nw = W // 16
    nE = W // 8 - 1
    g = H // 4
    sh = bit_depth - 8
    beta = jnp.asarray(BETA_TABLE)[jnp.clip(qp, 0, 51)] << sh
    tc1 = jnp.asarray(TC_TABLE)[jnp.clip(qp, 0, 53)] << sh
    tc2 = jnp.asarray(TC_TABLE)[jnp.clip(qp + 2, 0, 53)] << sh
    maxv = (1 << bit_depth) - 1
    # beta == 0 (qp < 16) is a natural no-op: d < 0 never holds

    # per-edge enables/tc: interior 8-grid edges (col m) interleaved with CU
    # edges (between m and m+1)
    inner_en = jnp.repeat((intra & nxn).T, 4, axis=1)            # (nw, g)
    bs = _edge_bs_j(intra, cbf, mv)                              # (nh, nw-1)
    cu_bs = jnp.repeat(bs.T, 4, axis=1)                          # (nw-1, g)
    tile_mask = np.ones((nw - 1, 1), bool)
    for m in tile_cols:
        if 1 <= m <= nw - 1:
            tile_mask[m - 1] = False
    cu_en = (cu_bs > 0) & jnp.asarray(tile_mask)
    cu_tc = jnp.where(cu_bs == 2, tc2, tc1)
    en = jnp.concatenate(
        [jnp.stack([inner_en[:-1], cu_en], 1).reshape(2 * (nw - 1), g),
         inner_en[-1:]], 0)                                      # (nE, g)
    tc2g = jnp.broadcast_to(tc2, (nw - 1, g)).astype(I32)
    tc = jnp.concatenate(
        [jnp.stack([tc2g, cu_tc], 1).reshape(2 * (nw - 1), g),
         tc2g[:1]], 0)

    seg = plane[:, 4:W - 4].reshape(g, 4, nE, 8).transpose(2, 0, 1, 3)
    out = _luma_edges_j(seg, beta, tc, en, maxv)
    mid = out.transpose(1, 2, 0, 3).reshape(H, W - 8)
    return jnp.concatenate([plane[:, :4], mid, plane[:, W - 4:]], 1)


def _chroma_pass_j(plane, qpc, intra, tile_cols, bit_depth):
    """One direction of chroma deblocking (bS=2 edges only)."""
    H, W = plane.shape
    nw = W // 8                   # CTUs in this orientation (8 chroma/CTU)
    nE = nw - 1
    if nE == 0:
        return plane
    tc = jnp.asarray(TC_TABLE)[jnp.clip(qpc + 2, 0, 53)] << (bit_depth - 8)
    # tc == 0 is a natural no-op (delta clipped to 0)
    maxv = (1 << bit_depth) - 1
    two = intra[:, :-1] | intra[:, 1:]                           # (nh, nE)
    tile_mask = np.ones((nE, 1), bool)
    for m in tile_cols:
        if 1 <= m <= nE:
            tile_mask[m - 1] = False
    en = jnp.repeat(two.T, 8, axis=1) & jnp.asarray(tile_mask)   # (nE, H)

    seg = plane[:, 4:W - 4].reshape(H, nE, 8).transpose(1, 0, 2)  # (nE, H, 8)
    p1, p0 = seg[..., 2], seg[..., 3]
    q0, q1 = seg[..., 4], seg[..., 5]
    delta = jnp.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc, tc)
    delta = jnp.where(en, delta, 0)
    np0 = jnp.clip(p0 + delta, 0, maxv)
    nq0 = jnp.clip(q0 - delta, 0, maxv)
    out = jnp.concatenate([seg[..., :3], np0[..., None], nq0[..., None],
                           seg[..., 5:]], -1)
    mid = out.transpose(1, 0, 2).reshape(H, W - 8)
    return jnp.concatenate([plane[:, :4], mid, plane[:, W - 4:]], 1)


def _pad_tiles_j(plane, tr, tc_, m):
    """(H, W) -> (tr*tc_, th+2m, tw+2m) per-tile planes with edge-clamped
    halo of true picture pixels (device mirror of GopEncoder._pad_tiles)."""
    H, W = plane.shape
    th, tw = H // tr, W // tc_
    padded = jnp.pad(plane, ((m, m), (m, m)), mode="edge")
    tiles = [padded[j * th:(j + 1) * th + 2 * m, i * tw:(i + 1) * tw + 2 * m]
             for j in range(tr) for i in range(tc_)]
    return jnp.stack(tiles, 0)


def _deblock_pad_body(y, cb, cr, qp, intra, cbf, mv, nxn,
                      tr, tc_, bit_depth, deblock, across_tiles,
                      sao_srcs=None, lam16=None, do_pad=True, sao_ctb=16):
    from hevc_tpu.encoder.rowscan_v1 import MARGIN, MARGIN_C
    H, W = y.shape
    nh, nw = intra.shape
    tile_cols = [] if across_tiles else \
        [(i + 1) * nw // tc_ for i in range(tc_ - 1)]
    tile_rows = [] if across_tiles else \
        [(j + 1) * nh // tr for j in range(tr - 1)]
    if deblock:
        y = _luma_pass_j(y, qp, intra, cbf, mv, nxn, tile_cols, bit_depth)
        y = _luma_pass_j(y.T, qp, intra.T, cbf.T, mv.transpose(1, 0, 2),
                         nxn.T, tile_rows, bit_depth).T
        qpc = jnp.asarray(_CQP)[jnp.clip(qp, 0, 57)]
        cb = _chroma_pass_j(cb, qpc, intra, tile_cols, bit_depth)
        cb = _chroma_pass_j(cb.T, qpc, intra.T, tile_rows, bit_depth).T
        cr = _chroma_pass_j(cr, qpc, intra, tile_cols, bit_depth)
        cr = _chroma_pass_j(cr.T, qpc, intra.T, tile_rows, bit_depth).T
    sao_params = None
    if sao_srcs is not None:
        # SAO between deblocking and reference padding (spec order).
        # The barrier stops XLA from interleaving/rematerializing the
        # deblock outputs into the SAO stats (a 40 ms pathology at 1080p
        # without it).
        from hevc_tpu.ops.sao_jax import sao_frame_j
        txp = tuple(m * 16 for m in tile_cols)
        typ_ = tuple(m * 16 for m in tile_rows)
        (y, cb, cr), sao_params = sao_frame_j(
            sao_srcs, (y, cb, cr), sao_ctb, bit_depth, lam16, txp, typ_)
    if not do_pad:
        return (y, cb, cr) + (sao_params if sao_params is not None else ())
    pad_y = _pad_tiles_j(y, tr, tc_, MARGIN)
    pad_cb = _pad_tiles_j(cb, tr, tc_, MARGIN_C)
    pad_cr = _pad_tiles_j(cr, tr, tc_, MARGIN_C)
    out = (y, cb, cr, pad_y, pad_cb, pad_cr)
    if sao_srcs is not None:
        out = out + sao_params
    return out


@partial(jax.jit, static_argnames=("tr", "tc_", "bit_depth", "deblock",
                                   "across_tiles"))
def deblock_pad_jit(y, cb, cr, qp, intra, cbf, mv, nxn,
                    tr, tc_, bit_depth=8, deblock=True, across_tiles=False):
    """Full-frame deblock (vertical then horizontal) + padded-tile refs.

    y/cb/cr: frame planes (int32 on device); maps: (nh, nw) CTU grids.
    Returns (dy, dcb, dcr, pad_y, pad_cb, pad_cr).
    """
    return _deblock_pad_body(y, cb, cr, qp, intra, cbf, mv, nxn,
                             tr, tc_, bit_depth, deblock, across_tiles)


@partial(jax.jit, static_argnames=("tnh", "tnw", "tr", "tc_", "bit_depth",
                                   "deblock", "do_pad", "sao_ctb"))
def assemble_deblock_pad_jit(rec_y, rec_cb, rec_cr, qp,
                             intra_s, cbf_s, mv_s, nxn_s,
                             tnh, tnw, tr, tc_, bit_depth=8, deblock=True,
                             sao_srcs=None, lam16=None, do_pad=True,
                             sao_ctb=16):
    """Step-major kernel outputs -> deblocked frame + padded refs, on device.

    rec_*: (steps, T, n, n) with steps = tnh*tnw (row-scan order) and
    T = tr*tc_ (raster tile order); maps_s: (steps, T[, 2]).  This is the
    GOP feedback stage: its pad outputs feed the next P frame's MC kernel
    with no host round-trip.
    """
    def asm(a, n):
        x = a.astype(I32).reshape(tnh, tnw, tr, tc_, n, n)
        return x.transpose(2, 0, 4, 3, 1, 5).reshape(tr * tnh * n,
                                                     tc_ * tnw * n)

    def asm_map(a):
        x = a.reshape(tnh, tnw, tr, tc_, *a.shape[2:])
        x = jnp.moveaxis(jnp.moveaxis(x, 2, 0), 3, 2)   # (tr, tnh, tc_, tnw)
        return x.reshape(tr * tnh, tc_ * tnw, *a.shape[2:])

    y = asm(rec_y, rec_y.shape[-1])
    cb = asm(rec_cb, rec_cb.shape[-1])
    cr = asm(rec_cr, rec_cr.shape[-1])
    # sao_srcs, when given, are already full-frame source planes
    return _deblock_pad_body(y, cb, cr, qp, asm_map(intra_s), asm_map(cbf_s),
                             asm_map(mv_s.astype(I32)), asm_map(nxn_s),
                             tr, tc_, bit_depth, deblock, False,
                             sao_srcs=sao_srcs, lam16=lam16, do_pad=do_pad,
                             sao_ctb=sao_ctb)


@partial(jax.jit, static_argnames=("tnh", "tnw", "tr", "tc_", "bit_depth"))
def sao_pad_jit(dy, dcb, dcr, ya, cba, cra, qp, lam16,
                tnh, tnw, tr, tc_, bit_depth=8):
    """Second GOP dispatch when SAO is on: SAO on the deblocked planes, then
    halo-padded reference construction.

    Splitting this from the encode+deblock graph avoids an XLA scheduling
    pathology where the shared source arrays de-optimize the scan (+40 ms
    at 1080p when fused)."""
    from hevc_tpu.encoder.rowscan_v1 import MARGIN, MARGIN_C
    from hevc_tpu.ops.sao_jax import sao_frame_j

    def asm_src(a):
        n = a.shape[-1]
        x = a.reshape(tr, tc_, tnh, tnw, n, n)
        return x.transpose(0, 2, 4, 1, 3, 5).reshape(tr * tnh * n,
                                                     tc_ * tnw * n)

    nh, nw = tr * tnh, tc_ * tnw
    tile_cols = tuple(((i + 1) * nw // tc_) * 16 for i in range(tc_ - 1))
    tile_rows = tuple(((j + 1) * nh // tr) * 16 for j in range(tr - 1))
    srcs = (asm_src(ya), asm_src(cba), asm_src(cra))
    (y, cb, cr), params = sao_frame_j(srcs, (dy, dcb, dcr), 16, bit_depth,
                                      lam16, tile_cols, tile_rows)
    pad_y = _pad_tiles_j(y, tr, tc_, MARGIN)
    pad_cb = _pad_tiles_j(cb, tr, tc_, MARGIN_C)
    pad_cr = _pad_tiles_j(cr, tr, tc_, MARGIN_C)
    return (y, cb, cr, pad_y, pad_cb, pad_cr) + params
