"""Device (JAX) SAO: per-CTU estimation + application, mirror of ops.sao.

SAO has no sequential dependency (every CTB reads the unmodified deblocked
picture), so both the statistics and the application are single fused
elementwise/reduction passes over the whole frame — ideal TPU work.  The
offset search evaluates all magnitudes 0..7 closed-form exactly like the
numpy reference (strict-first argmin ordering preserved for bit parity).
"""
from __future__ import annotations

import jax.numpy as jnp

I32 = jnp.int32
I64 = jnp.int32   # stats fit int32 (16*N*o^2 + 2*o*|E| bounded < 2^31)

# EO class neighbor offsets (mirror ops.sao.EO_NEIGHBORS)
_EO = [((0, -1), (0, 1)), ((-1, 0), (1, 0)),
       ((-1, -1), (1, 1)), ((-1, 1), (1, -1))]


def _shift2(p, dy, dx):
    """Edge-invalid-marked shift: returns (shifted plane, valid mask)."""
    H, W = p.shape
    sp = jnp.roll(jnp.roll(p, -dy, 0), -dx, 1)
    ys = jnp.arange(H)[:, None] + dy
    xs = jnp.arange(W)[None, :] + dx
    valid = (ys >= 0) & (ys < H) & (xs >= 0) & (xs < W)
    return sp, valid


def eo_cats_j(rec, tile_x=(), tile_y=()):
    """4x (H, W) category maps 0..4; invalid-neighbor samples get 0.

    tile_x/tile_y: static pixel offsets of tile boundaries (neighbors
    across them are unavailable).  Returns (cats_est, cats_app): the
    estimator ignores tile boundaries (mirror of the numpy reference),
    the applier masks them.
    """
    import numpy as _np
    H, W = rec.shape
    cats_est, cats_app = [], []
    for cls, ((dy0, dx0), (dy1, dx1)) in enumerate(_EO):
        n0, v0 = _shift2(rec, dy0, dx0)
        n1, v1 = _shift2(rec, dy1, dx1)
        s = jnp.sign(rec - n0) + jnp.sign(rec - n1)
        k = jnp.where(s == -2, 1, jnp.where(s == -1, 2,
                      jnp.where(s == 1, 3, jnp.where(s == 2, 4, 0))))
        base = jnp.where(v0 & v1, k, 0)
        cats_est.append(base)
        # tile-boundary neighbor masks are STATIC: build once in numpy
        colm = _np.ones(W, bool)
        rowm = _np.ones(H, bool)
        for xb in tile_x:
            for dx in (dx0, dx1):
                if dx > 0 and 1 <= xb <= W:
                    colm[xb - 1] = False
                elif dx < 0 and 0 <= xb < W:
                    colm[xb] = False
        for yb in tile_y:
            for dy in (dy0, dy1):
                if dy > 0 and 1 <= yb <= H:
                    rowm[yb - 1] = False
                elif dy < 0 and 0 <= yb < H:
                    rowm[yb] = False
        if colm.all() and rowm.all():
            cats_app.append(base)
        else:
            tm = jnp.asarray(_np.outer(rowm, colm))
            cats_app.append(jnp.where(tm, base, 0))
    return cats_est, cats_app


def _ctu_sum(x, ctb):
    H, W = x.shape
    return x.reshape(H // ctb, ctb, W // ctb, ctb).sum((1, 3))


def _best_offset_j(n, e, lam16, sign, bo):
    """Vectorized mirror of ops.sao._best_offset: (J, o) over o in 0..7."""
    o = jnp.arange(8, dtype=I32).reshape((8,) + (1,) * n.ndim)
    es = e * sign
    dd = n[None] * o * o - 2 * o * es[None]
    bits = o + 1 + jnp.where(bo & (o > 0), 1, 0)
    j = 16 * dd + lam16 * bits
    oi = jnp.argmin(j, axis=0)
    return jnp.take_along_axis(j, oi[None], 0)[0], oi.astype(I32)


def _ctu_sum_v(x, ctb):
    """(..., H, W) -> (..., H/ctb, W/ctb) block sums."""
    s = x.shape
    H, W = s[-2], s[-1]
    return x.reshape(s[:-2] + (H // ctb, ctb, W // ctb, ctb)).sum((-3, -1))


def sao_component_stats(src, rec, cats_est, band_idx, ctb, lam16):
    """Per-CTU candidate costs and params for one plane (fully vectorized:
    one-hot reductions over categories/bands instead of unrolled loops, so
    the graph stays small and compiles fast).

    Returns dict with eo (j, offs per class) and bo (j, pos, offs); offsets
    carry inferred signs for EO and searched signs for BO.
    """
    d = src - rec
    # EO: (4cls, 4cat, H, W) one-hot -> per-CTU N and E
    cats = jnp.stack(cats_est, 0)                       # (4, H, W)
    oh = (cats[:, None] ==
          jnp.arange(1, 5, dtype=cats.dtype)[None, :, None, None])
    ohi = oh.astype(I32)
    n4 = _ctu_sum_v(ohi, ctb)                           # (4, 4, nh, nw)
    e4 = _ctu_sum_v(ohi * d[None, None], ctb)
    sign = jnp.asarray([1, 1, -1, -1], I32)[None, :, None, None]
    jo, o = _best_offset_j(n4, e4, lam16, sign, False)  # (4, 4, nh, nw)
    eo_j = jo.sum(1) + lam16 * 4                        # (4, nh, nw)
    eo_off = o * sign                                   # (4, 4, nh, nw)

    # BO: (32, H, W) one-hot -> per-CTU per-band stats
    bh = (band_idx[None] == jnp.arange(32, dtype=I32)[:, None, None])
    bhi = bh.astype(I32)
    nb = _ctu_sum_v(bhi, ctb)                           # (32, nh, nw)
    eb = _ctu_sum_v(bhi * d[None], ctb)
    jp, op = _best_offset_j(nb, eb, lam16, 1, True)
    jn_, on = _best_offset_j(nb, eb, lam16, -1, True)
    neg = jn_ < jp
    bj = jnp.where(neg, jn_, jp)                        # (32, nh, nw)
    bo_ = jnp.where(neg, -on, op)
    bj = jnp.moveaxis(bj, 0, -1)                        # (nh, nw, 32)
    bo_ = jnp.moveaxis(bo_, 0, -1)
    wins = jnp.stack([bj[..., p:p + 4].sum(-1) for p in range(29)], -1)
    pos = jnp.argmin(wins, -1).astype(I32)              # first-min like numpy
    bo_j = jnp.take_along_axis(wins, pos[..., None], -1)[..., 0]
    bo_offs = jnp.stack(
        [jnp.take_along_axis(bo_, (pos + i)[..., None], -1)[..., 0]
         for i in range(4)], -1)
    return {"eo_j": jnp.moveaxis(eo_j, 0, -1),
            "eo_off": jnp.moveaxis(eo_off, (0, 1), (-2, -1)),
            "bo_j": bo_j, "bo_pos": pos, "bo_off": bo_offs}


def sao_apply_j(rec, ty, aux, offs, cats_app, band_idx, ctb, bit_depth):
    """Apply per-CTU params: ty 0/1/2, aux = class or band pos, offs (..,4)."""
    H, W = rec.shape
    maxv = (1 << bit_depth) - 1
    rep = lambda a: jnp.repeat(jnp.repeat(a, ctb, 0), ctb, 1)
    typ = rep(ty)
    ax = rep(aux)
    of = [rep(offs[..., i]) for i in range(4)]
    # EO: select class per pixel, then category offset
    cat_sel = sum(jnp.where(ax == c, cats_app[c], 0) for c in range(4))
    eo_val = sum(jnp.where(cat_sel == k + 1, of[k], 0) for k in range(4))
    # BO: band window
    bo_val = sum(jnp.where(band_idx == ((ax + i) & 31), of[i], 0)
                 for i in range(4))
    val = jnp.where(typ == 2, eo_val, jnp.where(typ == 1, bo_val, 0))
    return jnp.clip(rec + val, 0, maxv)


def sao_frame_j(src3, rec3, ctb, bit_depth, lam16, tile_x=(), tile_y=()):
    """Full-frame device SAO: estimate (mirror of numpy) + apply.

    Returns (out3, params): params = (ty_y, aux_y, off_y, ty_c, cls_c,
    pos_cb, pos_cr, off_cb, off_cr) as (nh, nw[, 4]) arrays for host
    entropy."""
    y_s, cb_s, cr_s = src3
    y_r, cb_r, cr_r = rec3
    cc = ctb // 2
    htx = tuple(t // 2 for t in tile_x)
    hty = tuple(t // 2 for t in tile_y)

    def plane_tools(rec, tx, ty_):
        ce, ca = eo_cats_j(rec, tx, ty_)
        return ce, ca, rec >> (bit_depth - 5)

    ce_y, ca_y, bi_y = plane_tools(y_r, tile_x, tile_y)
    st_y = sao_component_stats(y_s, y_r, ce_y, bi_y, ctb, lam16)
    # luma decision: candidates in numpy order [OFF, EO0..3, BO]
    j_all = jnp.concatenate([jnp.full(st_y["bo_j"].shape + (1,), lam16, I32),
                             st_y["eo_j"],
                             (st_y["bo_j"] + lam16 * 7)[..., None]], -1)
    ci = jnp.argmin(j_all, -1).astype(I32)
    ty_y = jnp.where(ci == 0, 0, jnp.where(ci == 5, 1, 2))
    cls_y = jnp.clip(ci - 1, 0, 3)
    aux_y = jnp.where(ty_y == 1, st_y["bo_pos"], cls_y)
    off_eo_y = jnp.take_along_axis(
        st_y["eo_off"], cls_y[..., None, None], -2)[..., 0, :]
    off_y = jnp.where((ty_y == 1)[..., None], st_y["bo_off"], off_eo_y)
    out_y = sao_apply_j(y_r, ty_y, aux_y, off_y, ca_y, bi_y, ctb, bit_depth)

    # chroma: shared type/class, offsets per component (numpy joint decision)
    ce_b, ca_b, bi_b = plane_tools(cb_r, htx, hty)
    ce_r, ca_r, bi_r = plane_tools(cr_r, htx, hty)
    st_b = sao_component_stats(cb_s, cb_r, ce_b, bi_b, cc, lam16)
    st_r = sao_component_stats(cr_s, cr_r, ce_r, bi_r, cc, lam16)
    # joint EO: st stats include lam16*4 per comp; numpy _eo_fixed excludes
    # type/class bins -> joint = (eo_j - 4*lam16)*2comps + lam16*4
    eo_joint = (st_b["eo_j"] - lam16 * 4) + (st_r["eo_j"] - lam16 * 4) \
        + lam16 * 4
    # joint BO: numpy _bo_fixed = stats + lam16*5 per comp; st bo_j has no
    # extra bins -> joint = bo_b + bo_r + 2*(5 pos bins) + 2 type bins
    bo_joint = st_b["bo_j"] + st_r["bo_j"] + lam16 * (5 + 5 + 2)
    jc_all = jnp.concatenate([jnp.full(bo_joint.shape + (1,), lam16, I32),
                              eo_joint, bo_joint[..., None]], -1)
    cci = jnp.argmin(jc_all, -1).astype(I32)
    ty_c = jnp.where(cci == 0, 0, jnp.where(cci == 5, 1, 2))
    cls_c = jnp.clip(cci - 1, 0, 3)
    off_cb = jnp.where((ty_c == 1)[..., None], st_b["bo_off"],
                       jnp.take_along_axis(st_b["eo_off"],
                                           cls_c[..., None, None],
                                           -2)[..., 0, :])
    off_cr = jnp.where((ty_c == 1)[..., None], st_r["bo_off"],
                       jnp.take_along_axis(st_r["eo_off"],
                                           cls_c[..., None, None],
                                           -2)[..., 0, :])
    aux_cb = jnp.where(ty_c == 1, st_b["bo_pos"], cls_c)
    aux_cr = jnp.where(ty_c == 1, st_r["bo_pos"], cls_c)
    out_cb = sao_apply_j(cb_r, ty_c, aux_cb, off_cb, ca_b, bi_b, cc,
                         bit_depth)
    out_cr = sao_apply_j(cr_r, ty_c, aux_cr, off_cr, ca_r, bi_r, cc,
                         bit_depth)
    params = (ty_y, aux_y, off_y, ty_c, cls_c,
              st_b["bo_pos"], st_r["bo_pos"], off_cb, off_cr)
    return (out_y, out_cb, out_cr), params
