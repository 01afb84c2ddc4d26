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
                      inner_groups=None, bs1: bool = False) -> None:
    """Filter all vertical edges in-place (call on transposed for horizontal).

    inner_groups: optional {x: bool-array over 4-row groups} enabling interior
    (non-16-grid) edges only where an NxN CU creates a TU/PU boundary.
    bs1: filter with the bS=1 tc derivation (qp + 0) instead of bS=2 (qp + 2).
    """
    H, W = plane.shape
    betaq = min(max(qp, 0), 51)
    tcq = min(max(qp + (0 if bs1 else 2), 0), 53)   # Q = qp + 2*(bS-1)
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


def _edge_bs(cu_maps: dict, transposed: bool) -> np.ndarray:
    """(nh, nw-1) per-CTU-edge boundary strength (spec 8.7.2.4, CTU=CU=PU).

    2: either side intra; 1: either side has coded residual, the
    prediction-flag sets differ (uni vs bi / different ref pictures — one
    ref per list so the flag pair identifies the refs), or any used list's
    MVs differ by >= 1 luma pel; 0 otherwise.
    """
    intra = np.asarray(cu_maps["intra"], bool)
    cbf = np.asarray(cu_maps["cbf"], bool)
    mv = np.asarray(cu_maps["mv"], np.int32)
    if transposed:
        intra, cbf, mv = intra.T, cbf.T, mv.transpose(1, 0, 2)
    p, q = np.s_[:, :-1], np.s_[:, 1:]
    two = intra[p] | intra[q]
    if "pf" in cu_maps:
        pf = np.asarray(cu_maps["pf"], np.int32)
        mv1 = np.asarray(cu_maps["mv1"], np.int32)
        if transposed:
            pf = pf.transpose(1, 0, 2)
            mv1 = mv1.transpose(1, 0, 2)
        refs_differ = np.any(pf[p] != pf[q], axis=-1)
        # mv holds the L0 MV when pf0 (else the L1 uni MV); mv1 holds L1
        d0 = np.abs(mv[p] - mv[q]).max(-1) >= 4
        d1 = np.abs(mv1[p] - mv1[q]).max(-1) >= 4
        both_l1 = (pf[p][..., 1] & pf[q][..., 1]).astype(bool)
        mvdiff = d0 | (both_l1 & d1)
        one = ~two & (cbf[p] | cbf[q] | refs_differ | mvdiff)
    else:
        mvdiff = np.abs(mv[p] - mv[q]).max(-1) >= 4
        one = ~two & (cbf[p] | cbf[q] | mvdiff)
    return np.where(two, 2, np.where(one, 1, 0)).astype(np.int32)


def _bs_edge_masks(bs: np.ndarray, H: int, W: int, want: int,
                   gran: int) -> dict:
    """{edge_x: bool mask} for 16-grid CU edges with bS == want.

    gran: rows per mask element (4 = luma 4-sample groups, 1 = chroma rows).
    """
    out = {}
    nh, nwm1 = bs.shape
    rows_per_ctu = 4 if gran == 4 else 8
    for k in range(nwm1):
        x = (16 if gran == 4 else 8) * (k + 1)
        if x >= W:
            continue
        sel = bs[:, k] == want
        out[x] = np.repeat(sel, rows_per_ctu)
    return out


def deblock_frame(y: np.ndarray, cb: np.ndarray, cr: np.ndarray, qp: int,
                  ctb: int = 16, bit_depth: int = 8,
                  tile_cols_px: list[int] | None = None,
                  tile_rows_px: list[int] | None = None,
                  nxn_map: np.ndarray | None = None,
                  skip_map: np.ndarray | None = None,
                  cu_maps: dict | None = None) -> None:
    """In-place deblocking of one frame (CTU-granular bS in {0, 1, 2}).

    Edges: CU boundaries on the 16-grid, plus interior 8-grid TU/PU edges of
    NxN intra CTUs (nxn_map, (nh, nw) bool).  Chroma stays on its 8-grid
    (16 luma) and is filtered only at bS=2.  tile_cols_px/rows_px: pixel
    offsets of tile boundaries to SKIP (loop_filter_across_tiles disabled).

    cu_maps: {intra (nh,nw) bool, cbf (nh,nw) bool, mv (nh,nw,2) int32
    quarter-pel} for P frames; all-intra frames (None) use bS=2 everywhere.
    skip_map is legacy sugar for the zero-MV-skip profile.
    """
    from hevc_tpu.ops.reference import chroma_qp
    if cu_maps is None and skip_map is not None:
        sk = np.asarray(skip_map, bool)
        cu_maps = {"intra": ~sk, "cbf": np.zeros(sk.shape, bool),
                   "mv": np.zeros(sk.shape + (2,), np.int32)}
    skip_v = set(tile_cols_px or [])
    skip_h = set(tile_rows_px or [])
    qpc = chroma_qp(qp)
    H, W = y.shape
    bs_v = _edge_bs(cu_maps, False) if cu_maps is not None else None
    bs_h = _edge_bs(cu_maps, True) if cu_maps is not None else None
    # vertical edges first, then horizontal on the vertically-filtered output
    step = 8 if nxn_map is not None else 16

    def _luma_pass(plane, bs, transposed):
        h, w = plane.shape
        inner = _inner_edge_masks(nxn_map, h, w, transposed)
        skips = (skip_h if transposed else skip_v)
        skip8 = skips | ({x for x in range(8, w, 16) if x not in inner}
                         if nxn_map is not None else set())
        if bs is not None:
            inner.update(_bs_edge_masks(bs, h, w, 2, 4))
        _deblock_luma_dir(plane, qp, step, skip8, bit_depth, inner)
        if bs is not None and (bs == 1).any():
            m1 = _bs_edge_masks(bs, h, w, 1, 4)
            _deblock_luma_dir(plane, qp, 16, skips | set(), bit_depth, m1,
                              bs1=True)

    _luma_pass(y, bs_v, False)
    yt = np.ascontiguousarray(y.T)
    _luma_pass(yt, bs_h, True)
    y[:, :] = yt.T
    cmask_v = _bs_edge_masks(bs_v, H // 2, W // 2, 2, 1) \
        if bs_v is not None else None
    cmask_h = _bs_edge_masks(bs_h, W // 2, H // 2, 2, 1) \
        if bs_h is not None else None
    for plane in (cb, cr):
        _deblock_chroma_dir(plane, qpc, 8, {x // 2 for x in skip_v}, bit_depth,
                            cmask_v)
        pt = np.ascontiguousarray(plane.T)
        _deblock_chroma_dir(pt, qpc, 8, {x // 2 for x in skip_h}, bit_depth,
                            cmask_h)
        plane[:, :] = pt.T
