"""HEVC deblocking filter (spec 8.7.2) — numpy reference implementation.

v0 profile specifics: all-intra (bS = 2 everywhere), CU = TU = 16 so the
qualifying 8x8-grid edges are exactly the 16-luma-sample grid lines, constant
QP per slice, loop filter disabled across tile boundaries (tiles stay
independently decodable, matching the PPS flag this framework writes).

Vertical edges over the whole picture first, then horizontal edges on the
vertically filtered output.  Used by the conformance decoder and as the
encoder's output post-pass.
"""
from __future__ import annotations

import numpy as np

# beta'(Q 0..51) and tc'(Q 0..53) — spec Table 8-12 (verified against the
# tables compiled into libx265)
BETA_TABLE = np.array(
    [0] * 16 + [6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24,
                26, 28, 30, 32, 34, 36, 38, 40, 42, 44, 46, 48, 50, 52, 54,
                56, 58, 60, 62, 64], dtype=np.int32)
TC_TABLE = np.array(
    [0] * 18 + [1] * 9 + [2] * 4 + [3] * 4 + [4] * 3 + [5] * 2 + [6] * 2 +
    [7, 8, 9, 10, 11, 13, 14, 16, 18, 20, 22, 24], dtype=np.int32)


def _luma_edge(p: np.ndarray, q: np.ndarray, beta: int, tc: int,
               maxv: int, group_mask=None) -> tuple[np.ndarray, np.ndarray]:
    """Filter one set of vertical luma edges.

    p: (..., ngroups, 4, 4) samples left of the edge, p[..., k, j] = p_j of
    line k (j: 0 nearest the edge); q: same mirrored right side.
    Returns filtered (p, q).  Vectorized over leading dims and groups.
    """
    p = p.astype(np.int32)
    q = q.astype(np.int32)
    d_p = np.abs(p[..., 2] - 2 * p[..., 1] + p[..., 0])      # (..., g, 4)
    d_q = np.abs(q[..., 2] - 2 * q[..., 1] + q[..., 0])
    dp0, dp3 = d_p[..., 0], d_p[..., 3]
    dq0, dq3 = d_q[..., 0], d_q[..., 3]
    dpq0 = dp0 + dq0
    dpq3 = dp3 + dq3
    d = dpq0 + dpq3
    filt = d < beta                                           # (..., g)
    if group_mask is not None:
        filt = filt & group_mask

    def strong_side_ok(k):
        sp = np.abs(p[..., k, 3] - p[..., k, 0])
        sq = np.abs(q[..., k, 0] - q[..., k, 3])
        dd = dpq0 if k == 0 else dpq3
        return ((2 * dd < (beta >> 2)) &
                ((sp + sq) < (beta >> 3)) &
                (np.abs(p[..., k, 0] - q[..., k, 0]) < ((5 * tc + 1) >> 1)))

    strong = filt & strong_side_ok(0) & strong_side_ok(3)     # (..., g)
    weak = filt & ~strong

    s = strong[..., None]                                     # broadcast lines
    # strong filter (3 taps each side), clip +-2tc around original
    p0, p1, p2, p3 = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    q0, q1, q2, q3 = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    sp0 = np.clip((p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3,
                  p0 - 2 * tc, p0 + 2 * tc)
    sp1 = np.clip((p2 + p1 + p0 + q0 + 2) >> 2, p1 - 2 * tc, p1 + 2 * tc)
    sp2 = np.clip((2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3,
                  p2 - 2 * tc, p2 + 2 * tc)
    sq0 = np.clip((q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3,
                  q0 - 2 * tc, q0 + 2 * tc)
    sq1 = np.clip((q2 + q1 + q0 + p0 + 2) >> 2, q1 - 2 * tc, q1 + 2 * tc)
    sq2 = np.clip((2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3,
                  q2 - 2 * tc, q2 + 2 * tc)

    # weak filter
    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    w_on = weak[..., None] & (np.abs(delta) < 10 * tc)
    dclip = np.clip(delta, -tc, tc)
    wp0 = np.clip(p0 + dclip, 0, maxv)
    wq0 = np.clip(q0 - dclip, 0, maxv)
    side_thresh = (beta + (beta >> 1)) >> 3
    dEp = ((dp0 + dp3) < side_thresh)[..., None]
    dEq = ((dq0 + dq3) < side_thresh)[..., None]
    tc2 = tc >> 1
    dp_ = np.clip((((p2 + p0 + 1) >> 1) - p1 + dclip) >> 1, -tc2, tc2)
    dq_ = np.clip((((q2 + q0 + 1) >> 1) - q1 - dclip) >> 1, -tc2, tc2)
    wp1 = np.clip(p1 + dp_, 0, maxv)
    wq1 = np.clip(q1 + dq_, 0, maxv)

    out_p = p.copy()
    out_q = q.copy()
    out_p[..., 0] = np.where(s, sp0, np.where(w_on, wp0, p0))
    out_p[..., 1] = np.where(s, sp1, np.where(w_on & dEp, wp1, p1))
    out_p[..., 2] = np.where(s, sp2, p2)
    out_q[..., 0] = np.where(s, sq0, np.where(w_on, wq0, q0))
    out_q[..., 1] = np.where(s, sq1, np.where(w_on & dEq, wq1, q1))
    out_q[..., 2] = np.where(s, sq2, q2)
    return out_p, out_q


def _deblock_luma_dir(plane: np.ndarray, qp: int, edge_step: int,
                      skip_edges: set[int], bit_depth: int,
                      inner_groups=None) -> None:
    """Filter all vertical edges in-place (call on transposed for horizontal).

    inner_groups: optional {x: bool-array over 4-row groups} enabling interior
    (non-16-grid) edges only where an NxN CU creates a TU/PU boundary.
    """
    H, W = plane.shape
    betaq = min(max(qp, 0), 51)
    tcq = min(max(qp + 2, 0), 53)     # bS = 2 -> +2
    shift = bit_depth - 8
    beta = int(BETA_TABLE[betaq]) << shift
    tc = int(TC_TABLE[tcq]) << shift
    if beta == 0:
        return
    maxv = (1 << bit_depth) - 1
    xs = [x for x in range(edge_step, W, edge_step) if x not in skip_edges]
    if not xs:
        return
    ngroups = H // 4
    for x in xs:
        mask = None
        if inner_groups is not None and x in inner_groups:
            mask = inner_groups[x]
            if not mask.any():
                continue
        seg = plane[:, x - 4:x + 4].reshape(ngroups, 4, 8)
        pside = seg[:, :, 3::-1]       # p0..p3 (nearest first)
        qside = seg[:, :, 4:]
        fp, fq = _luma_edge(pside, qside, beta, tc, maxv, mask)
        seg[:, :, 3::-1] = fp
        seg[:, :, 4:] = fq
        plane[:, x - 4:x + 4] = seg.reshape(H, 8)


def _deblock_chroma_dir(plane: np.ndarray, qp_c: int, edge_step: int,
                        skip_edges: set[int], bit_depth: int,
                        edge_masks: dict | None = None) -> None:
    H, W = plane.shape
    tcq = min(max(qp_c + 2, 0), 53)
    tc = int(TC_TABLE[tcq]) << (bit_depth - 8)
    if tc == 0:
        return
    maxv = (1 << bit_depth) - 1
    xs = [x for x in range(edge_step, W, edge_step) if x not in skip_edges]
    for x in xs:
        mask = None
        if edge_masks is not None and x in edge_masks:
            mask = edge_masks[x]
            if not mask.any():
                continue
        p1 = plane[:, x - 2].astype(np.int32)
        p0 = plane[:, x - 1].astype(np.int32)
        q0 = plane[:, x].astype(np.int32)
        q1 = plane[:, x + 1].astype(np.int32)
        delta = np.clip((((q0 - p0) << 2) + p1 - q1 + 4) >> 3, -tc, tc)
        if mask is not None:
            delta = np.where(mask, delta, 0)
        plane[:, x - 1] = np.clip(p0 + delta, 0, maxv)
        plane[:, x] = np.clip(q0 - delta, 0, maxv)


def _inner_edge_masks(nxn_map, H: int, W: int, transposed: bool) -> dict:
    """{edge_x: (H//4,) bool} for interior 8-grid edges of NxN CTUs."""
    out = {}
    if nxn_map is None:
        return out
    m = nxn_map.T if transposed else nxn_map
    nh, nw = m.shape
    ngroups = H // 4
    for k in range(nw):
        x = 16 * k + 8
        if x >= W:
            continue
        mask = np.zeros(ngroups, bool)
        for j in range(nh):
            if m[j, k]:
                mask[j * 4:(j + 1) * 4] = True
        out[x] = mask
    return out


def _skip_edge_masks(skip_map, H: int, W: int, transposed: bool,
                     gran: int) -> dict:
    """{edge_x: (H//gran,) bool} for 16-grid CU edges when a skip map exists.

    bS derivation for the zero-MV-skip P profile: a filtered edge always has
    at least one intra side (bS=2); two adjacent skip CUs share MV (0,0),
    ref 0 and have no residual, so their mutual edge is bS=0 (not filtered).
    gran: rows per mask element (4 for luma 4-sample groups, 1 for chroma).
    """
    out = {}
    if skip_map is None:
        return out
    m = skip_map.T if transposed else skip_map
    nh, nw = m.shape
    rows_per_ctu = 16 // gran if gran == 4 else 8   # luma groups / chroma rows
    for k in range(1, nw):
        x = (16 if gran == 4 else 8) * k
        if x >= W:
            continue
        both = m[:, k - 1] & m[:, k]
        if not both.any():
            continue
        out[x] = np.repeat(~both, rows_per_ctu)[:H // gran if gran == 4 else H]
    return out


def deblock_frame(y: np.ndarray, cb: np.ndarray, cr: np.ndarray, qp: int,
                  ctb: int = 16, bit_depth: int = 8,
                  tile_cols_px: list[int] | None = None,
                  tile_rows_px: list[int] | None = None,
                  nxn_map: np.ndarray | None = None,
                  skip_map: np.ndarray | None = None) -> None:
    """In-place deblocking of one frame (v1 profile edges, bS in {0, 2}).

    Edges: CU boundaries on the 16-grid, plus interior 8-grid TU/PU edges of
    NxN CTUs (nxn_map, (nh, nw) bool).  Chroma stays on its 8-grid (16 luma).
    tile_cols_px/rows_px: pixel offsets of tile boundaries to SKIP
    (loop_filter_across_tiles disabled).
    skip_map: (nh, nw) bool of zero-MV skip CTUs (P slices); edges between
    two skip CTUs are bS=0 and left unfiltered.
    """
    from hevc_tpu.ops.reference import chroma_qp
    skip_v = set(tile_cols_px or [])
    skip_h = set(tile_rows_px or [])
    qpc = chroma_qp(qp)
    H, W = y.shape
    # vertical edges first, then horizontal on the vertically-filtered output
    step = 8 if nxn_map is not None else 16
    inner_v = _inner_edge_masks(nxn_map, H, W, False)
    inner_v.update(_skip_edge_masks(skip_map, H, W, False, 4))
    skip_v8 = skip_v | ({x for x in range(8, W, 16) if x not in inner_v}
                        if nxn_map is not None else set())
    _deblock_luma_dir(y, qp, step, skip_v8, bit_depth, inner_v)
    yt = np.ascontiguousarray(y.T)
    inner_h = _inner_edge_masks(nxn_map, W, H, True)
    inner_h.update(_skip_edge_masks(skip_map, W, H, True, 4))
    skip_h8 = skip_h | ({x for x in range(8, H, 16) if x not in inner_h}
                        if nxn_map is not None else set())
    _deblock_luma_dir(yt, qp, step, skip_h8, bit_depth, inner_h)
    y[:, :] = yt.T
    cmask_v = _skip_edge_masks(skip_map, H // 2, W // 2, False, 1)
    cmask_h = _skip_edge_masks(skip_map, W // 2, H // 2, True, 1)
    for plane in (cb, cr):
        _deblock_chroma_dir(plane, qpc, 8, {x // 2 for x in skip_v}, bit_depth,
                            cmask_v)
        pt = np.ascontiguousarray(plane.T)
        _deblock_chroma_dir(pt, qpc, 8, {x // 2 for x in skip_h}, bit_depth,
                            cmask_h)
        plane[:, :] = pt.T
