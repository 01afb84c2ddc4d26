"""Sample-adaptive offset (spec 8.7.3) — numpy reference: apply + estimate.

SAO runs after deblocking; every CTB reads the unmodified deblocked picture
(no sequential dependency — fully parallel, which is why it vectorizes
cleanly on TPU; see ops/sao_jax.py for the device mirror).

Profile: CTB16, per-CTU params, merge flags always coded 0 by this encoder
(parsed fully by the decoder).  Encoder offset search evaluates ALL
magnitudes 0..7 per category/band closed-form (dD = N*o^2 - 2*o*E), so the
numpy and device searches are trivially identical — no division rounding.
"""
from __future__ import annotations

import numpy as np

SAO_OFF, SAO_BAND, SAO_EDGE = 0, 1, 2
# EO class neighbor offsets: (dy0, dx0), (dy1, dx1)
EO_NEIGHBORS = [((0, -1), (0, 1)), ((-1, 0), (1, 0)),
                ((-1, -1), (1, 1)), ((-1, 1), (1, -1))]


def eo_category(rec: np.ndarray, cls: int) -> np.ndarray:
    """Per-sample EO category 0..4 (0 = none).  Border samples (neighbor
    outside the plane) get category 0 — callers mask tile borders too."""
    H, W = rec.shape
    (dy0, dx0), (dy1, dx1) = EO_NEIGHBORS[cls]
    cat = np.zeros((H, W), np.int32)
    ys = slice(max(0, -dy0, -dy1), H - max(0, dy0, dy1))
    xs = slice(max(0, -dx0, -dx1), W - max(0, dx0, dx1))
    c = rec[ys, xs].astype(np.int32)
    n0 = rec[ys.start + dy0:ys.stop + dy0, xs.start + dx0:xs.stop + dx0]
    n1 = rec[ys.start + dy1:ys.stop + dy1, xs.start + dx1:xs.stop + dx1]
    s = np.sign(c - n0) + np.sign(c - n1)
    k = np.zeros_like(s)
    k[s == -2] = 1
    k[s == -1] = 2
    k[s == 1] = 3
    k[s == 2] = 4
    cat[ys, xs] = k
    return cat


def apply_sao_plane(rec: np.ndarray, params, ctb: int, bit_depth: int,
                    tile_x: list[int] | None = None,
                    tile_y: list[int] | None = None) -> np.ndarray:
    """params[cy][cx] = None | (SAO_BAND, band_pos, off[4]) |
    (SAO_EDGE, eo_class, off[4] with signs applied).
    tile_x/tile_y: tile boundary pixel offsets (SAO neighbor reads are
    unavailable across them when loop filtering across tiles is off)."""
    H, W = rec.shape
    maxv = (1 << bit_depth) - 1
    out = rec.copy()
    nh = (H + ctb - 1) // ctb
    nw = (W + ctb - 1) // ctb
    bx = set(tile_x or [])
    by = set(tile_y or [])
    for cy in range(nh):
        for cx in range(nw):
            p = params[cy][cx]
            if p is None:
                continue
            y0, x0 = cy * ctb, cx * ctb
            y1, x1 = min(y0 + ctb, H), min(x0 + ctb, W)
            region = rec[y0:y1, x0:x1].astype(np.int32)
            if p[0] == SAO_BAND:
                _, pos, off = p
                lut = np.zeros(32, np.int32)
                for i in range(4):
                    lut[(pos + i) & 31] = off[i]
                res = region + lut[region >> (bit_depth - 5)]
            else:
                _, cls, off = p
                cat = eo_category(rec, cls)[y0:y1, x0:x1].copy()
                # neighbors across tile boundaries are unavailable
                (dy0, dx0), (dy1, dx1) = EO_NEIGHBORS[cls]
                for xb in bx:
                    for dx in (dx0, dx1):
                        col = xb - 1 if dx > 0 else (xb if dx < 0 else None)
                        if col is not None and x0 <= col < x1:
                            cat[:, col - x0] = 0
                for yb in by:
                    for dy in (dy0, dy1):
                        row = yb - 1 if dy > 0 else (yb if dy < 0 else None)
                        if row is not None and y0 <= row < y1:
                            cat[row - y0, :] = 0
                lut = np.zeros(5, np.int32)
                lut[1:5] = off
                res = region + lut[cat]
            out[y0:y1, x0:x1] = np.clip(res, 0, maxv)
    return out


# ---- encoder estimation ------------------------------------------------------

def _best_offset(n: int, e: int, lam16: int, sign: int, bo: bool = False):
    """Best magnitude 0..7 for one category/band: minimizes
    16*(n*o^2 - 2*o*e*sign) + lam16*(TR bins + BO sign bin)."""
    best = None
    for o in range(8):
        es = e if sign > 0 else -e
        dd = n * o * o - 2 * o * es
        bits = o + 1 + (1 if bo and o > 0 else 0)
        j = 16 * dd + lam16 * bits
        if best is None or j < best[0]:
            best = (j, o)
    return best


def estimate_sao_ctu(src, rec, y0, x0, y1, x1, cats4, band_idx, lam16):
    """Best (J, params) for one CTU component region.

    cats4: list of 4 full-plane category maps (tile-masked);
    band_idx: full-plane band index map (rec >> (bd-5)).
    """
    s = src[y0:y1, x0:x1].astype(np.int64)
    r = rec[y0:y1, x0:x1].astype(np.int64)
    d = s - r
    cands = [(lam16 * 1, None)]                    # OFF: one type bin
    # EO classes: 2 type bins + 2 class bins + per-offset TR bins
    for cls in range(4):
        cat = cats4[cls][y0:y1, x0:x1]
        j = lam16 * 4
        offs = []
        for k in range(1, 5):
            m = cat == k
            n = int(m.sum())
            e = int(d[m].sum())
            sign = 1 if k <= 2 else -1
            jo, o = _best_offset(n, e, lam16, sign)
            j += jo
            offs.append(o * sign)
        cands.append((j, (SAO_EDGE, cls, offs)))
    # BO: stats per band, best 4-window
    bi = band_idx[y0:y1, x0:x1]
    nb = np.zeros(32, np.int64)
    eb = np.zeros(32, np.int64)
    np.add.at(nb, bi.ravel(), 1)
    np.add.at(eb, bi.ravel(), d.ravel())
    band_j = np.zeros(32, np.int64)
    band_o = np.zeros(32, np.int32)
    for b in range(32):
        jp, op = _best_offset(int(nb[b]), int(eb[b]), lam16, 1, bo=True)
        jn, on = _best_offset(int(nb[b]), int(eb[b]), lam16, -1, bo=True)
        if jn < jp:
            band_j[b], band_o[b] = jn, -on
        else:
            band_j[b], band_o[b] = jp, op
    best_pos, best_bj = 0, None
    for pos in range(29):                          # no wrap from the encoder
        j = int(band_j[pos:pos + 4].sum())
        if best_bj is None or j < best_bj:
            best_bj, best_pos = j, pos
    cands.append((best_bj + lam16 * (2 + 5),       # type + position bins
                  (SAO_BAND, best_pos,
                   [int(band_o[best_pos + i]) for i in range(4)])))
    return min(cands, key=lambda c: c[0])


def estimate_and_apply_sao(src3, rec3, ctb, bit_depth, lam16,
                           tile_x=None, tile_y=None,
                           luma=True, chroma=True):
    """Full-frame SAO decision + application.

    Returns (params_y, params_c, out3) where params_c holds the shared
    chroma decision ((type, aux, off_cb, off_cr) tuples) and out3 the
    SAO-filtered planes.  Chroma type/class chosen jointly for cb+cr
    (offsets per component), matching the shared-type syntax.
    """
    y_s, cb_s, cr_s = src3
    y_r, cb_r, cr_r = rec3
    H, W = y_r.shape
    nh, nw = (H + ctb - 1) // ctb, (W + ctb - 1) // ctb

    def tools(rec, bd):
        cats = [eo_category(rec, c) for c in range(4)]
        return cats, (rec.astype(np.int32) >> (bd - 5))

    params_y = [[None] * nw for _ in range(nh)]
    params_c = [[None] * nw for _ in range(nh)]
    if luma:
        cats, bidx = tools(y_r, bit_depth)
        for cy in range(nh):
            for cx in range(nw):
                y0, x0 = cy * ctb, cx * ctb
                _, p = estimate_sao_ctu(y_s, y_r, y0, x0,
                                        min(y0 + ctb, H), min(x0 + ctb, W),
                                        cats, bidx, lam16)
                params_y[cy][cx] = p
    if chroma:
        cc = ctb // 2
        Hc, Wc = cb_r.shape
        catsb, bidxb = tools(cb_r, bit_depth)
        catsr, bidxr = tools(cr_r, bit_depth)
        for cy in range(nh):
            for cx in range(nw):
                y0, x0 = cy * cc, cx * cc
                y1, x1 = min(y0 + cc, Hc), min(x0 + cc, Wc)
                # shared type/class: evaluate joint candidates
                best = (lam16, None)               # OFF: 1 type bin (cb only)
                for cls in range(4):
                    jb2, ob = _eo_fixed(cb_s, cb_r, y0, x0, y1, x1,
                                        catsb[cls], lam16)
                    jr2, orr = _eo_fixed(cr_s, cr_r, y0, x0, y1, x1,
                                         catsr[cls], lam16)
                    j = jb2 + jr2 + lam16 * 4      # type + class bins
                    if j < best[0]:
                        best = (j, (SAO_EDGE, cls, ob, orr))
                jb3, posb, ob3 = _bo_fixed(cb_s, cb_r, y0, x0, y1, x1,
                                           bidxb, lam16)
                jr3, posr, or3 = _bo_fixed(cr_s, cr_r, y0, x0, y1, x1,
                                           bidxr, lam16)
                j = jb3 + jr3 + lam16 * 2          # shared type bins
                if j < best[0]:
                    best = (j, (SAO_BAND, (posb, posr), ob3, or3))
                params_c[cy][cx] = best[1]

    hx = [t // 2 for t in (tile_x or [])]
    hy = [t // 2 for t in (tile_y or [])]
    out_y = apply_sao_plane(y_r, params_y, ctb, bit_depth, tile_x, tile_y) \
        if luma else y_r.copy()
    pc_cb = [[_split_c(p, 0) for p in row] for row in params_c]
    pc_cr = [[_split_c(p, 1) for p in row] for row in params_c]
    out_cb = apply_sao_plane(cb_r, pc_cb, ctb // 2, bit_depth, hx, hy) \
        if chroma else cb_r.copy()
    out_cr = apply_sao_plane(cr_r, pc_cr, ctb // 2, bit_depth, hx, hy) \
        if chroma else cr_r.copy()
    return params_y, params_c, (out_y, out_cb, out_cr)


def _split_c(p, comp):
    """Joint chroma params -> per-plane apply_sao_plane params."""
    if p is None:
        return None
    if p[0] == SAO_EDGE:
        return (SAO_EDGE, p[1], p[2 + comp])
    return (SAO_BAND, p[1][comp], p[2 + comp])


def _eo_fixed(src, rec, y0, x0, y1, x1, cat_full, lam16):
    d = src[y0:y1, x0:x1].astype(np.int64) - rec[y0:y1, x0:x1].astype(np.int64)
    cat = cat_full[y0:y1, x0:x1]
    j = 0
    offs = []
    for k in range(1, 5):
        m = cat == k
        sign = 1 if k <= 2 else -1
        jo, o = _best_offset(int(m.sum()), int(d[m].sum()), lam16, sign)
        j += jo
        offs.append(o * sign)
    return j, offs


def _bo_fixed(src, rec, y0, x0, y1, x1, bidx_full, lam16):
    d = src[y0:y1, x0:x1].astype(np.int64) - rec[y0:y1, x0:x1].astype(np.int64)
    bi = bidx_full[y0:y1, x0:x1]
    nb = np.zeros(32, np.int64)
    eb = np.zeros(32, np.int64)
    np.add.at(nb, bi.ravel(), 1)
    np.add.at(eb, bi.ravel(), d.ravel())
    band_j = np.zeros(32, np.int64)
    band_o = np.zeros(32, np.int32)
    for b in range(32):
        jp, op = _best_offset(int(nb[b]), int(eb[b]), lam16, 1, bo=True)
        jn, on = _best_offset(int(nb[b]), int(eb[b]), lam16, -1, bo=True)
        if jn < jp:
            band_j[b], band_o[b] = jn, -on
        else:
            band_j[b], band_o[b] = jp, op
    best_pos, best = 0, None
    for pos in range(29):
        j = int(band_j[pos:pos + 4].sum())
        if best is None or j < best:
            best, best_pos = j, pos
    return best + lam16 * 5, best_pos, \
        [int(band_o[best_pos + i]) for i in range(4)]
