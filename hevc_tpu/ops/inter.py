"""Inter prediction: motion compensation + merge/AMVP derivation (numpy).

Normative fractional-sample interpolation (spec 8.5.4.2.2/8.5.4.2.3) with the
default uni-prediction weighting (8.5.4.2.4).  MVs are in quarter-luma-pel
units throughout (chroma uses the same MV at eighth-chroma-pel granularity).

The reference transcoder delegated all of this to x265/NVENC (reference
core/transcoder.py:398-535); first-party surface for the TPU-native design.
"""
from __future__ import annotations

import numpy as np

# 8-tap luma filters, Table 8-10 (index = xFracL in quarter pels)
FL = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1],
], np.int64)

# 4-tap chroma filters, Table 8-13 (index = xFracC in eighth pels)
FC = np.array([
    [0, 64, 0, 0],
    [-2, 58, 10, -2],
    [-4, 54, 16, -2],
    [-6, 46, 28, -4],
    [-4, 36, 36, -4],
    [-4, 28, 46, -6],
    [-2, 16, 54, -4],
    [-2, 10, 58, -2],
], np.int64)


def _fetch(plane: np.ndarray, y0: int, x0: int, h: int, w: int) -> np.ndarray:
    """Clamp-extended (edge-replicated) window read (spec ref sample clip)."""
    H, W = plane.shape
    ys = np.clip(np.arange(y0, y0 + h), 0, H - 1)
    xs = np.clip(np.arange(x0, x0 + w), 0, W - 1)
    return plane[np.ix_(ys, xs)].astype(np.int64)


def mc_luma_i(ref: np.ndarray, x0: int, y0: int, n: int, mvx: int, mvy: int,
              bit_depth: int = 8) -> np.ndarray:
    """Luma MC intermediate (14-bit, pre-weighting) — spec 8.5.4.2.2."""
    shift1 = bit_depth - 8
    shift3 = 14 - bit_depth
    xi, yi = x0 + (mvx >> 2), y0 + (mvy >> 2)
    xf, yf = mvx & 3, mvy & 3
    if xf == 0 and yf == 0:
        val = _fetch(ref, yi, xi, n, n) << shift3
    elif yf == 0:
        win = _fetch(ref, yi, xi - 3, n, n + 7)
        val = sum(FL[xf][k] * win[:, k:k + n] for k in range(8)) >> shift1
    elif xf == 0:
        win = _fetch(ref, yi - 3, xi, n + 7, n)
        val = sum(FL[yf][k] * win[k:k + n, :] for k in range(8)) >> shift1
    else:
        win = _fetch(ref, yi - 3, xi - 3, n + 7, n + 7)
        tmp = sum(FL[xf][k] * win[:, k:k + n] for k in range(8)) >> shift1
        val = sum(FL[yf][k] * tmp[k:k + n, :] for k in range(8)) >> 6
    return val


def weight_uni(val: np.ndarray, bit_depth: int) -> np.ndarray:
    """Default uni-prediction weighting (spec 8.5.4.2.4)."""
    off = 1 << (13 - bit_depth)
    return np.clip((val + off) >> (14 - bit_depth),
                   0, (1 << bit_depth) - 1).astype(np.int32)


WP_DENOM = 6        # luma/chroma log2 weight denom (x265 weightp default)


def weight_uni_w(val: np.ndarray, w: int, o: int,
                 bit_depth: int) -> np.ndarray:
    """Explicit uni-prediction weighting (spec 8.5.3.2.9.3, P slices):
    pred = Clip(((val14 * w + 2^(log2Wd-1)) >> log2Wd) + (o << (bd-8)))
    with log2Wd = WP_DENOM + 14 - bit_depth.  w=64, o=0 reproduces
    weight_uni bit-exactly."""
    log2wd = WP_DENOM + 14 - bit_depth
    off = o << (bit_depth - 8)
    v = (np.asarray(val, np.int64) * int(w) + (1 << (log2wd - 1))) >> log2wd
    return np.clip(v + off, 0, (1 << bit_depth) - 1).astype(np.int32)


def weight_px_w(p: np.ndarray, w: int, o: int,
                bit_depth: int) -> np.ndarray:
    """Integer-pixel-domain explicit weighting (search-side transform of
    reference pixels): identical to weight_uni_w on the 14-bit intermediate
    of an integer MV, since (p<<s)*w + 2^(WP_DENOM+s-1) >> (WP_DENOM+s)
    == (p*w + 2^(WP_DENOM-1)) >> WP_DENOM."""
    off = o << (bit_depth - 8)
    v = (np.asarray(p, np.int64) * int(w) + (1 << (WP_DENOM - 1))) >> WP_DENOM
    return np.clip(v + off, 0, (1 << bit_depth) - 1).astype(np.int32)


def mc_block_w(ref: dict, x0: int, y0: int, n: int, mv, wp,
               bit_depth: int = 8):
    """(luma, cb, cr) MC for one square PU with explicit weights
    wp = (wy, oy, wcb, ocb, wcr, ocr); wp None -> default weighting."""
    if wp is None:
        return mc_block(ref, x0, y0, n, mv, bit_depth)
    mvx, mvy = int(mv[0]), int(mv[1])
    wy, oy, wcb, ocb, wcr, ocr = wp
    py = weight_uni_w(mc_luma_i(ref["y"], x0, y0, n, mvx, mvy, bit_depth),
                      wy, oy, bit_depth)
    pcb = weight_uni_w(mc_chroma_i(ref["cb"], x0 // 2, y0 // 2, n // 2,
                                   mvx, mvy, bit_depth), wcb, ocb, bit_depth)
    pcr = weight_uni_w(mc_chroma_i(ref["cr"], x0 // 2, y0 // 2, n // 2,
                                   mvx, mvy, bit_depth), wcr, ocr, bit_depth)
    return py, pcb, pcr


def estimate_weights_p(cur_y, ref_y, cur_cb, ref_cb, cur_cr, ref_cr):
    """Host-side weightp analysis (x265 weightP-style DC/AC match): per
    plane w = 64 * std(cur)/std(ref), o = mean(cur) - w*mean(ref)/64,
    gated to defaults when the gain would be noise.  Returns
    (wy, oy, wcb, ocb, wcr, ocr) with denom WP_DENOM; (64,0)x3 = default."""
    out = []
    for c, r in ((cur_y, ref_y), (cur_cb, ref_cb), (cur_cr, ref_cr)):
        mc_ = float(np.mean(c))
        mr = float(np.mean(r))
        sc = float(np.std(c))
        sr = float(np.std(r))
        w = 64
        if sr > 0.5 and 0.25 < sc / sr < 4.0:
            w = int(round(64.0 * sc / sr))
        w = min(max(w, 1), 127)
        o = int(round(mc_ - (w * mr) / 64.0))
        o = min(max(o, -128), 127)
        if abs(o) < 2 and abs(w - 64) < 3:
            w, o = 64, 0
        out += [w, o]
    return tuple(out)


def weight_bi(val0: np.ndarray, val1: np.ndarray,
              bit_depth: int) -> np.ndarray:
    """Default bi-prediction averaging (spec 8.5.4.2.4)."""
    off = 1 << (14 - bit_depth)
    return np.clip((val0 + val1 + off) >> (15 - bit_depth),
                   0, (1 << bit_depth) - 1).astype(np.int32)


def mc_luma(ref: np.ndarray, x0: int, y0: int, n: int, mvx: int, mvy: int,
            bit_depth: int = 8) -> np.ndarray:
    """Luma MC for an n x n block at (x0, y0), MV in quarter pels."""
    return weight_uni(mc_luma_i(ref, x0, y0, n, mvx, mvy, bit_depth),
                      bit_depth)


def mc_chroma_i(ref: np.ndarray, xc: int, yc: int, nc: int, mvx: int,
                mvy: int, bit_depth: int = 8) -> np.ndarray:
    """Chroma MC intermediate (pre-weighting, spec 8.5.4.2.3)."""
    shift1 = bit_depth - 8
    xi, yi = xc + (mvx >> 3), yc + (mvy >> 3)
    xf, yf = mvx & 7, mvy & 7
    if xf == 0 and yf == 0:
        val = _fetch(ref, yi, xi, nc, nc) << (14 - bit_depth)
    elif yf == 0:
        win = _fetch(ref, yi, xi - 1, nc, nc + 3)
        val = sum(FC[xf][k] * win[:, k:k + nc] for k in range(4)) >> shift1
    elif xf == 0:
        win = _fetch(ref, yi - 1, xi, nc + 3, nc)
        val = sum(FC[yf][k] * win[k:k + nc, :] for k in range(4)) >> shift1
    else:
        win = _fetch(ref, yi - 1, xi - 1, nc + 3, nc + 3)
        tmp = sum(FC[xf][k] * win[:, k:k + nc] for k in range(4)) >> shift1
        val = sum(FC[yf][k] * tmp[k:k + nc, :] for k in range(4)) >> 6
    return val


def mc_chroma(ref: np.ndarray, xc: int, yc: int, nc: int, mvx: int, mvy: int,
              bit_depth: int = 8) -> np.ndarray:
    """Chroma MC (4:2:0): block at chroma coords, MV in LUMA quarter pels
    (== chroma eighth pels, spec 8.5.3.2.9)."""
    return weight_uni(mc_chroma_i(ref, xc, yc, nc, mvx, mvy, bit_depth),
                      bit_depth)


def mc_block_bi(ref0: dict, ref1: dict, x0: int, y0: int, n: int,
                mv0, mv1, bit_depth: int = 8):
    """Bi-predicted (luma, cb, cr) for one square PU (default weighting)."""
    a, b = (int(mv0[0]), int(mv0[1])), (int(mv1[0]), int(mv1[1]))
    py = weight_bi(mc_luma_i(ref0["y"], x0, y0, n, a[0], a[1], bit_depth),
                   mc_luma_i(ref1["y"], x0, y0, n, b[0], b[1], bit_depth),
                   bit_depth)
    xc, yc, nc = x0 // 2, y0 // 2, n // 2
    pcb = weight_bi(mc_chroma_i(ref0["cb"], xc, yc, nc, a[0], a[1], bit_depth),
                    mc_chroma_i(ref1["cb"], xc, yc, nc, b[0], b[1], bit_depth),
                    bit_depth)
    pcr = weight_bi(mc_chroma_i(ref0["cr"], xc, yc, nc, a[0], a[1], bit_depth),
                    mc_chroma_i(ref1["cr"], xc, yc, nc, b[0], b[1], bit_depth),
                    bit_depth)
    return py, pcb, pcr


def scale_mv(mv: int, tb: int, td: int) -> int:
    """Temporal MV scaling (spec 8.5.3.2.8): tb/td are clipped POC deltas."""
    tb = min(max(tb, -128), 127)
    td = min(max(td, -128), 127)
    tx = ((16384 + (abs(td) >> 1)) // abs(td)) * (1 if td > 0 else -1)
    dsf = min(4095, max(-4096, (tb * tx + 32) >> 6))
    s = dsf * mv
    mag = (abs(s) + 127) >> 8
    return min(max(mag if s >= 0 else -mag, -32768), 32767)


def mc_block(ref: dict, x0: int, y0: int, n: int, mv, bit_depth: int = 8):
    """(luma, cb, cr) MC for one square PU; ref = {'y','cb','cr'} planes."""
    mvx, mvy = int(mv[0]), int(mv[1])
    py = mc_luma(ref["y"], x0, y0, n, mvx, mvy, bit_depth)
    pcb = mc_chroma(ref["cb"], x0 // 2, y0 // 2, n // 2, mvx, mvy, bit_depth)
    pcr = mc_chroma(ref["cr"], x0 // 2, y0 // 2, n // 2, mvx, mvy, bit_depth)
    return py, pcb, pcr


# ---- motion candidate derivation (CTU == CU == PU profile) -------------------
#
# Motion state per CTU grid position: inter flag + (mvx, mvy).  With one
# reference picture (the previous picture, refIdx 0) no MV scaling ever
# applies, and list pruning cannot change candidate 0.

def merge_cand0(inter_map, mv_map, cy: int, cx: int, nh: int, nw: int):
    """First merge candidate (spec 8.5.3.2.2/8.5.3.2.3 with MaxNumMergeCand=1).

    Spatial order A1 (left), B1 (above), B0 (above-right), A0 (below-left,
    never decoded yet at CTU granularity), B2 (above-left); temporal MVP
    disabled; zero candidate otherwise.
    """
    for (dy, dx) in ((0, -1), (-1, 0), (-1, 1), (-1, -1)):  # A1, B1, B0, B2
        ny, nx = cy + dy, cx + dx
        if 0 <= ny < nh and 0 <= nx < nw and inter_map[ny, nx]:
            return int(mv_map[ny, nx, 0]), int(mv_map[ny, nx, 1])
    return 0, 0


def amvp_list(inter_map, mv_map, cy: int, cx: int, nh: int, nw: int):
    """Two AMVP candidates (spec 8.5.3.2.6, single-ref so no scaling).

    A = A0 (below-left, unavailable) else A1 (left); B = first of B0
    (above-right), B1 (above), B2 (above-left).  B dropped if equal to A;
    zero-fill to 2 entries.
    """
    cands = []
    if cx > 0 and inter_map[cy, cx - 1]:                     # A1
        cands.append((int(mv_map[cy, cx - 1, 0]), int(mv_map[cy, cx - 1, 1])))
    b = None
    for (dy, dx) in ((-1, 1), (-1, 0), (-1, -1)):            # B0, B1, B2
        ny, nx = cy + dy, cx + dx
        if 0 <= ny < nh and 0 <= nx < nw and inter_map[ny, nx]:
            b = (int(mv_map[ny, nx, 0]), int(mv_map[ny, nx, 1]))
            break
    if b is not None and (not cands or b != cands[0]):
        cands.append(b)
    while len(cands) < 2:
        cands.append((0, 0))
    return cands


# ---- generalized motion records (B slices) -----------------------------------
#
# A motion record is (pf0, pf1, mv0, mv1): prediction flags per list and the
# MV per list (each (x, y)).  Single ref per list, so refIdx is always 0 and
# the reference PICTURE per list is fixed per slice.

def neighbor_records(rec_map, cy, cx, nh, nw):
    """{'a1','b1','b0','b2'}: motion record of each spatial neighbor or None.

    rec_map[cy][cx] = motion record or None (intra / outside / not yet
    decoded — rec_map fills in decode order, so z-scan availability is
    implicit).
    """
    return neighbor_records_sized(rec_map, cy, cx, 1, nh, nw)


def neighbor_records_sized(rec_map, cy, cx, ns, nh, nw):
    """Spatial neighbor records for a CU spanning ns x ns 16-cells at
    top-left cell (cy, cx) — spec 8.5.3.2.3 positions: A1/A0 at/below the
    bottom of the left edge, B1/B0 at/right of the top edge, B2 the corner.

    A0 (below-left) is decodable inside a 32 CTB's z-order (a top-right
    quadrant's left CTB is fully coded); rec_map fills in decode order so
    not-yet-coded cells are None, which IS the z-scan availability rule.
    """
    def at(ny, nx):
        if 0 <= ny < nh and 0 <= nx < nw:
            return rec_map[ny][nx]
        return None
    return {"a1": at(cy + ns - 1, cx - 1), "a0": at(cy + ns, cx - 1),
            "b1": at(cy - 1, cx + ns - 1),
            "b0": at(cy - 1, cx + ns), "b2": at(cy - 1, cx - 1)}


def merge_cand0_b(nbrs, b_slice: bool):
    """First merge candidate: full motion of the first available spatial
    neighbor (spec order A1, B1, B0, A0, B2 — pruning never removes the
    first available); else the zero candidate (bi in B slices, L0-uni in
    P)."""
    for key in ("a1", "b1", "b0", "a0", "b2"):
        n = nbrs.get(key)
        if n is not None:
            return n
    return (1, 1, (0, 0), (0, 0)) if b_slice else (1, 0, (0, 0), (0, 0))


def tmvp_col_mv(col_avail, col_mv, cy: int, cx: int, ns: int,
                nh: int, nw: int, ctb_cells: int = 2):
    """Collocated MV for TMVP (spec 8.5.3.2.8, the col-PB walk only).

    col_avail/col_mv: the collocated reference picture's 16x16-compressed
    motion field — (nh, nw) bool inter mask and (nh, nw, 2) L0 MVs (our
    collocated pictures are I/P anchors, so only L0 motion exists; B
    pictures are non-reference).  (cy, cx) is the PU's top-left 16-cell,
    ns its size in cells, nh/nw the FRAME cell grid (no tile clipping —
    the spec imposes only picture bounds and the CTB-row constraint).
    Returns (mvx, mvy) or None.
    """
    br_y, br_x = cy + ns, cx + ns
    if (br_y < nh and br_x < nw
            and br_y // ctb_cells == cy // ctb_cells
            and col_avail[br_y, br_x]):
        return int(col_mv[br_y, br_x, 0]), int(col_mv[br_y, br_x, 1])
    ct_y, ct_x = cy + ns // 2, cx + ns // 2
    if col_avail[ct_y, ct_x]:
        return int(col_mv[ct_y, ct_x, 0]), int(col_mv[ct_y, ct_x, 1])
    return None


def _scale_col(mv, dsf):
    """Apply a precomputed distScaleFactor to a col MV (8.5.3.2.8)."""
    if dsf == 4096:
        return (int(mv[0]), int(mv[1]))

    def s(v):
        x = dsf * int(v)
        return max(-32768, min(32767, (abs(x) + 127 >> 8) * (1 if x >= 0
                                                             else -1)))
    return s(mv[0]), s(mv[1])


def dist_scale(tb: int, td: int) -> int:
    """distScaleFactor (spec 8.5.3.2.8): clip3(-4096, 4095,
    (tb*tx+32)>>6) with tx = (16384 + |td|/2) / td (truncating division,
    same arithmetic as scale_mv above)."""
    tb = max(-128, min(127, tb))
    td = max(-128, min(127, td))
    tx = ((16384 + (abs(td) >> 1)) // abs(td)) * (1 if td > 0 else -1)
    return max(-4096, min(4095, (tb * tx + 32) >> 6))


def merge_list_b(nbrs, b_slice: bool, max_cands: int = 1, col=None):
    """Spec 8.5.3.2.2 merge candidate list, first max_cands entries.

    Spatial candidates A1, B1, B0, A0, B2 with the spec's PAIRWISE
    pruning (B1~A1, B0~B1, A0~A1, B2~A1&B1; B2 only when fewer than 4),
    then the temporal candidate, then zero candidates.  Combined
    bi-predictive candidates can never materialize for max_cands <= 2
    (the list is already full whenever two originals exist).

    col: None, or (rec,) the ready temporal record (pf0, pf1, mv0, mv1)
    — built by the caller from tmvp_col_mv + per-list dist_scale.
    Returns a list of exactly max_cands records.
    """
    a1, b1, b0 = nbrs.get("a1"), nbrs.get("b1"), nbrs.get("b0")
    a0, b2 = nbrs.get("a0"), nbrs.get("b2")

    def eq(x, y):
        return x is not None and y is not None and \
            x[0] == y[0] and x[1] == y[1] and \
            tuple(x[2]) == tuple(y[2]) and tuple(x[3]) == tuple(y[3])

    cands = []
    if a1 is not None:
        cands.append(a1)
    if b1 is not None and not eq(b1, a1):
        cands.append(b1)
    if b0 is not None and not eq(b0, b1):
        cands.append(b0)
    if a0 is not None and not eq(a0, a1):
        cands.append(a0)
    if len(cands) < 4 and b2 is not None and not eq(b2, a1) \
            and not eq(b2, b1):
        cands.append(b2)
    if col is not None:
        cands.append(col)
    zero = (1, 1, (0, 0), (0, 0)) if b_slice else (1, 0, (0, 0), (0, 0))
    while len(cands) < max_cands:
        cands.append(zero)
    return cands[:max_cands]


def amvp_list_b(nbrs, lx: int, cur_poc: int, poc_l: tuple, col_mvp=None):
    """Two AMVP candidates for list lx (spec 8.5.3.2.6 with 1 ref/list).

    col_mvp: the temporal MVP for this list ((mvx, mvy) already
    dist-scaled, or None) — appended after the deduped spatial pair when
    fewer than two candidates exist (the spec adds the temporal without
    pruning against the spatial entries).

    poc_l = (poc of L0 ref, poc of L1 ref or None).  Spatial A = A1 (A0 is
    undecoded); B = first of B0, B1, B2.  Cross-list candidates use POC
    scaling (8.5.3.2.8); when no left neighbor is coded inter
    (isScaledFlag == 0), the unscaled B candidate takes A's slot and the
    scaled B search fills B — the spec's exact dance.
    """
    ly = 1 - lx
    tgt = poc_l[lx]

    def unscaled(n):
        if n is None:
            return None
        pf = (n[0], n[1])
        if pf[lx]:
            return tuple(n[2 + lx])
        if pf[ly] and poc_l[ly] == tgt:
            return tuple(n[2 + ly])
        return None

    def scaled(n):
        if n is None:
            return None
        pf = (n[0], n[1])
        if pf[lx]:
            mv = n[2 + lx]
            td = cur_poc - poc_l[lx]
        elif pf[ly]:
            mv = n[2 + ly]
            td = cur_poc - poc_l[ly]
        else:
            return None
        tb = cur_poc - tgt
        if td == tb:
            return tuple(mv)
        return (scale_mv(int(mv[0]), tb, td), scale_mv(int(mv[1]), tb, td))

    a_nbrs = [nbrs.get("a0"), nbrs["a1"]]   # spec scans A0 first
    is_scaled = any(n is not None for n in a_nbrs)
    cand_a = None
    for n in a_nbrs:
        cand_a = unscaled(n)
        if cand_a is not None:
            break
    if cand_a is None and is_scaled:
        for n in a_nbrs:
            cand_a = scaled(n)
            if cand_a is not None:
                break
    cand_b = None
    for key in ("b0", "b1", "b2"):
        cand_b = unscaled(nbrs[key])
        if cand_b is not None:
            break
    if not is_scaled:
        cand_a = cand_b                 # unscaled B takes A's slot
        cand_b = None
        for key in ("b0", "b1", "b2"):
            cand_b = scaled(nbrs[key])
            if cand_b is not None:
                break
    cands = []
    if cand_a is not None:
        cands.append(cand_a)
    if cand_b is not None and (not cands or cand_b != cands[0]):
        cands.append(cand_b)
    if len(cands) < 2 and col_mvp is not None:
        cands.append((int(col_mvp[0]), int(col_mvp[1])))
    while len(cands) < 2:
        cands.append((0, 0))
    return cands


def mvd_bits(mvd: int) -> int:
    """Approximate bin count of one mvd component (greater0/1 + EG1 + sign)."""
    a = abs(mvd)
    if a == 0:
        return 1
    if a == 1:
        return 3
    # abs_mvd_minus2 in EG1: prefix + suffix
    v = a - 2
    length = 1
    while v >= (1 << length):
        v -= 1 << length
        length += 1
    return 2 + (2 * length - 1) + 1 + 1
