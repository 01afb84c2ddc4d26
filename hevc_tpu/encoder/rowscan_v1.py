"""Row-scan tiled encoder, v1 profile: per-CTU 2Nx2N / NxN partition search.

Device-side replica of encoder.ctu_modes.encode_ctu_v1 (bit-exact, tested):
the step evaluates the 16x16 whole-CU candidate AND four sequential 8x8
sub-searches (each with true sub-reconstruction), picks the cheaper partition,
and encodes chroma as one 8x8 TB or four sequential 4x4 TBs accordingly.
Everything stays scalar-indexed dynamic slices + fused all-mode matmuls.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from hevc_tpu.ops import jax_ops as J
from hevc_tpu.ops import reference as R
from hevc_tpu.ops.intra_matrices import intra_weights, use_filtered_mask
from hevc_tpu.encoder.frame_jax import _luma_fixups as _fixups_fx

I32 = jnp.int32
CTB = 16

_CQP = np.array([R.chroma_qp(q) for q in range(58)], dtype=np.int32)


@lru_cache(maxsize=None)
def _fused_weights(n: int, luma: bool = True):
    """Weight matrix for all 35 modes at size n.

    luma=True: modes reordered raw-then-filtered (per 8.4.4.2.3);
    luma=False (chroma): natural order, ALL modes use the unfiltered ref.
    """
    w, shifts = intra_weights(n)
    if not luma:
        wmat = w.reshape(35 * n * n, 4 * n + 1).T.astype(np.float32)
        return wmat, np.arange(35), shifts, 35
    filt = use_filtered_mask(n)
    raw_ids = [m for m in range(35) if not filt[m]]
    filt_ids = [m for m in range(35) if filt[m]]
    order = raw_ids + filt_ids
    wmat = w[order].reshape(35 * n * n, 4 * n + 1).T.astype(np.float32)
    perm = np.argsort(np.array(order))
    return wmat, perm, shifts, len(raw_ids)


def _predict_all(ref_raw, n: int, maxv: int, fixups: bool, luma: bool = True):
    """(B, 4n+1) refs -> (B, 35, n*n) predictions (incl. luma fixups)."""
    wmat, perm, shifts, n_raw = _fused_weights(n, luma)
    wm = jnp.asarray(wmat)
    B = ref_raw.shape[0]
    p_raw = J.exact_matmul_small(ref_raw.astype(jnp.float32),
                                 wm[:, :n_raw * n * n])
    if n_raw < 35:
        ref_filt = J.filter_refs(ref_raw)
        p_filt = J.exact_matmul_small(ref_filt.astype(jnp.float32),
                                      wm[:, n_raw * n * n:])
        p = jnp.concatenate([p_raw, p_filt], axis=1).astype(I32)
        p = p.reshape(B, 35, n * n)[:, jnp.asarray(perm)]
    else:
        p = p_raw.astype(I32).reshape(B, 35, n * n)
    sh = jnp.asarray(shifts)[None, :, None]
    p = jnp.right_shift(p + (1 << (sh - 1)), sh)
    if fixups:
        p = _fixups_fx(p, ref_raw, n, maxv)
    return p


def _assemble_ref(below_left, left, corner, top, topright,
                  a_bl, a_l, a_c, a_t, a_tr, n, bit_depth):
    """Segments (each (B, n) or (B,)) + per-segment scalar avail flags."""
    B = left.shape[0]

    def bb(flag, k):
        return jnp.broadcast_to(flag, (B, k))
    vals = jnp.concatenate([below_left[:, ::-1], left[:, ::-1],
                            corner[:, None], top, topright], axis=-1)
    avail = jnp.concatenate([bb(a_bl, n), bb(a_l, n), bb(a_c, 1),
                             bb(a_t, n), bb(a_tr, n)], axis=-1)
    return J.substitute_refs(vals, avail, bit_depth)


def _mpm_jax(a, b):
    """Device mpm_candidates (spec 8.4.2). a, b: (B,) int32 -> 3x (B,)."""
    eq = a == b
    lt2 = a < 2
    ca0 = jnp.where(lt2, 0, a)
    ca1 = jnp.where(lt2, 1, 2 + ((a + 29) % 32))
    ca2 = jnp.where(lt2, 26, 2 + ((a - 1) % 32))
    # a != b: [a, b, first of (0,1,26) not in {a,b}]
    third = jnp.where((a != 0) & (b != 0), 0,
                      jnp.where((a != 1) & (b != 1), 1, 26))
    c0 = jnp.where(eq, ca0, a)
    c1 = jnp.where(eq, ca1, b)
    c2 = jnp.where(eq, ca2, third)
    return c0, c1, c2


def _mode_bits(c0, c1, c2, lam_bits):
    m = jnp.arange(35, dtype=I32)[None, :]
    return jnp.where(m == c0[:, None], lam_bits[0],
                     jnp.where((m == c1[:, None]) | (m == c2[:, None]),
                               lam_bits[1], lam_bits[2]))


def _tu(src, pred, qp, n, bit_depth, maxv):
    lvl = J.quantize(J.forward_transform(src - pred, n, bit_depth=bit_depth),
                     qp, n, bit_depth)
    cbf = jnp.any(lvl != 0, axis=(-2, -1))
    rin = J.inverse_transform(J.dequantize(lvl, qp, n, bit_depth), n,
                              bit_depth=bit_depth)
    rec = jnp.where(cbf[:, None, None], jnp.clip(pred + rin, 0, maxv), pred)
    return lvl, cbf, rec


def _search_select(src, ref, n, lam_bits, c0, c1, c2, maxv, fixups=True):
    """All-mode search: returns (mode, pred, best_cost)."""
    B = src.shape[0]
    preds = _predict_all(ref, n, maxv, fixups)
    diff = src.reshape(B, 1, n, n) - preds.reshape(B, 35, n, n)
    costs = J.satd(diff, n) + _mode_bits(c0, c1, c2, lam_bits)
    mode = jnp.argmin(costs, axis=1).astype(I32)
    pred = jnp.take_along_axis(preds, mode[:, None, None],
                               axis=1).reshape(B, n, n)
    return mode, pred, jnp.min(costs, axis=1)


def _level_bits(lvl):
    """Residual-rate estimate, mirror of ctu_modes.level_bits_estimate."""
    a = jnp.abs(lvl)
    b = 2 * jnp.sum((a > 0).astype(I32), axis=(-2, -1))
    ks = jnp.asarray([1 << k for k in range(1, 15)], I32)
    b = b + jnp.sum((a[:, None] >= ks[None, :, None, None]).astype(I32),
                    axis=(1, 2, 3))
    return b


def _sse_j(a, b):
    d = a - b
    return jnp.sum(d * d, axis=(-2, -1))


def _rowscan_v1_scan(src_y, src_cb, src_cr, qp, lam_bits, tnh, tnw, bit_depth,
                     refs=None, lam16=None, enable_nxn=True):
    """Shared row-scan body.  refs=(ref_y, ref_cb, ref_cr) enables the
    P-slice zero-MV skip candidate (replicates the numpy reference P
    decision: integer SSE + lambda16 rate estimate, bits capped at 2048)."""
    B = src_y.shape[0]
    p_mode = refs is not None
    maxv = (1 << bit_depth) - 1
    qp_bd = 6 * (bit_depth - 8)
    qp_eff = qp + qp_bd
    qpc = jnp.asarray(_CQP)[jnp.clip(qp, 0, 57)] + qp_bd
    DC = jnp.full((B,), 1, I32)

    src_y_rows = src_y.transpose(1, 0, 2, 3, 4)
    src_cb_rows = src_cb.transpose(1, 0, 2, 3, 4)
    src_cr_rows = src_cr.transpose(1, 0, 2, 3, 4)
    if p_mode:
        ref_y_rows = refs[0].transpose(1, 0, 2, 3, 4)
        ref_cb_rows = refs[1].transpose(1, 0, 2, 3, 4)
        ref_cr_rows = refs[2].transpose(1, 0, 2, 3, 4)

    state = dict(
        top_y=jnp.zeros((B, tnw * 16), I32),
        top_cb=jnp.zeros((B, tnw * 8), I32),
        top_cr=jnp.zeros((B, tnw * 8), I32),
        left_y=jnp.zeros((B, 16), I32),
        left_cb=jnp.zeros((B, 8), I32),
        left_cr=jnp.zeros((B, 8), I32),
        corner_y=jnp.zeros((B,), I32),
        corner_cb=jnp.zeros((B,), I32),
        corner_cr=jnp.zeros((B,), I32),
        left_modes=jnp.full((B, 2), 1, I32),   # (top-right, bottom-right)
    )

    zeros8 = jnp.zeros((B, 8), I32)
    zeros4 = jnp.zeros((B, 4), I32)
    zeros1 = jnp.zeros((B,), I32)
    F = jnp.asarray(False)
    Tr = jnp.asarray(True)

    def step(state, d):
        r = d // tnw
        c = d % tnw
        al = c > 0
        aa = r > 0
        aar = aa & (c < tnw - 1)
        ac = al & aa
        cclamp = jnp.minimum(c + 1, tnw - 1)

        src = jax.lax.dynamic_slice(src_y_rows, (r, 0, c, 0, 0),
                                    (1, B, 1, 16, 16)).reshape(B, 16, 16)
        top16 = jax.lax.dynamic_slice(state["top_y"], (0, c * 16), (B, 16))
        tr16 = jax.lax.dynamic_slice(state["top_y"], (0, cclamp * 16), (B, 16))
        left16 = state["left_y"]
        corner = state["corner_y"]

        # ---- 2Nx2N candidate ----
        ref2n = _assemble_ref(zeros8.repeat(2, 1), left16, corner,
                              top16, tr16, F, al, ac, aa, aar, 16, bit_depth)
        a2n = jnp.where(al, state["left_modes"][:, 0], DC)
        c0, c1, c2 = _mpm_jax(a2n, DC)
        mode2n, pred2n, cost2n = _search_select(src, ref2n, 16, lam_bits,
                                                c0, c1, c2, maxv)

        # ---- NxN candidate: 4 sequential 8x8 sub-searches ----
        # CTU-local luma recon buffer for sub-block refs
        sub_modes = []
        sub_out = []
        cost_nxn = jnp.zeros((B,), I32)
        ctu_rec = jnp.zeros((B, 16, 16), I32)
        for i in range(4 if enable_nxn else 0):
            dx, dy = (i & 1) * 8, (i >> 1) * 8
            sub = src[:, dy:dy + 8, dx:dx + 8]
            if i == 0:
                bl = left16[:, 8:16]
                lf = left16[:, 0:8]
                cor = corner
                tp = top16[:, 0:8]
                trr = top16[:, 8:16]
                flags = (al, al, ac, aa, aa)
                a_m = jnp.where(al, state["left_modes"][:, 0], DC)
                b_m = DC
            elif i == 1:
                bl = zeros8
                lf = ctu_rec[:, 0:8, 7]
                cor = top16[:, 7]
                tp = top16[:, 8:16]
                trr = tr16[:, 0:8]
                flags = (F, Tr, aa, aa, aar)
                a_m = sub_modes[0]
                b_m = DC
            elif i == 2:
                bl = zeros8
                lf = left16[:, 8:16]
                cor = left16[:, 7]
                tp = ctu_rec[:, 7, 0:8]
                trr = ctu_rec[:, 7, 8:16]
                flags = (F, al, al, Tr, Tr)
                a_m = jnp.where(al, state["left_modes"][:, 1], DC)
                b_m = sub_modes[0]
            else:
                bl = zeros8
                lf = ctu_rec[:, 8:16, 7]
                cor = ctu_rec[:, 7, 7]
                tp = ctu_rec[:, 7, 8:16]
                trr = zeros8
                flags = (F, Tr, Tr, Tr, F)
                a_m = sub_modes[2]
                b_m = sub_modes[1]
            ref = _assemble_ref(bl, lf, cor, tp, trr, *flags, 8, bit_depth)
            s0, s1, s2 = _mpm_jax(a_m, b_m)
            m, p, cst = _search_select(sub, ref, 8, lam_bits, s0, s1, s2, maxv)
            lvl, cbf, rec = _tu(sub, p, qp_eff, 8, bit_depth, maxv)
            ctu_rec = ctu_rec.at[:, dy:dy + 8, dx:dx + 8].set(rec)
            sub_modes.append(m)
            sub_out.append((lvl, cbf))
            cost_nxn = cost_nxn + cst

        if enable_nxn:
            part = cost_nxn < cost2n                      # (B,)
        else:
            part = jnp.zeros((B,), jnp.bool_)
            sub_modes = [mode2n] * 4
            sub_out = [(jnp.zeros((B, 8, 8), I32),
                        jnp.zeros((B,), jnp.bool_))] * 4

        # ---- luma selection ----
        lvl2n, cbf2n, rec2n = _tu(src, pred2n, qp_eff, 16, bit_depth, maxv)
        lvl_nxn = jnp.zeros((B, 16, 16), I32)
        for i in range(4):
            dx, dy = (i & 1) * 8, (i >> 1) * 8
            lvl_nxn = lvl_nxn.at[:, dy:dy + 8, dx:dx + 8].set(sub_out[i][0])
        pm = part[:, None, None]
        lvl_y = jnp.where(pm, lvl_nxn, lvl2n)
        rec_y = jnp.where(pm, ctu_rec, rec2n)
        modes4 = jnp.stack([jnp.where(part, sub_modes[i], mode2n)
                            for i in range(4)], axis=1)
        cbf_y4 = jnp.stack([jnp.where(part, sub_out[i][1], cbf2n)
                            for i in range(4)], axis=1)
        chroma_mode = jnp.where(part, sub_modes[0], mode2n)

        # ---- chroma: both variants ----
        ch = {}
        src_c = {}
        for (rows, tkey, lkey, ckey, name) in (
                (src_cb_rows, "top_cb", "left_cb", "corner_cb", "cb"),
                (src_cr_rows, "top_cr", "left_cr", "corner_cr", "cr")):
            sc = jax.lax.dynamic_slice(rows, (r, 0, c, 0, 0),
                                       (1, B, 1, 8, 8)).reshape(B, 8, 8)
            src_c[name] = sc
            topc = jax.lax.dynamic_slice(state[tkey], (0, c * 8), (B, 8))
            trc = jax.lax.dynamic_slice(state[tkey], (0, cclamp * 8), (B, 8))
            lfc = state[lkey]
            corc = state[ckey]
            # variant A: single 8x8 TB
            refc = _assemble_ref(zeros4.repeat(2, 1), lfc, corc, topc, trc,
                                 F, al, ac, aa, aar, 8, bit_depth)
            pallc = _predict_all(refc, 8, maxv, fixups=False, luma=False)
            pc = jnp.take_along_axis(pallc, chroma_mode[:, None, None],
                                     axis=1).reshape(B, 8, 8)
            lvl_a, cbf_a, rec_a = _tu(sc, pc, qpc, 8, bit_depth, maxv)
            # variant B: four sequential 4x4 TBs
            crec = jnp.zeros((B, 8, 8), I32)
            lvl_b = jnp.zeros((B, 8, 8), I32)
            cbfs_b = []
            if not enable_nxn:
                crec, lvl_b = rec_a, lvl_a
                cbfs_b = [cbf_a] * 4
            for i in range(4 if enable_nxn else 0):
                dx, dy = (i & 1) * 4, (i >> 1) * 4
                subc = sc[:, dy:dy + 4, dx:dx + 4]
                if i == 0:
                    seg = (lfc[:, 4:8], lfc[:, 0:4], corc, topc[:, 0:4],
                           topc[:, 4:8])
                    fl = (al, al, ac, aa, aa)
                elif i == 1:
                    seg = (zeros4, crec[:, 0:4, 3], topc[:, 3],
                           topc[:, 4:8], trc[:, 0:4])
                    fl = (F, Tr, aa, aa, aar)
                elif i == 2:
                    seg = (zeros4, lfc[:, 4:8], lfc[:, 3],
                           crec[:, 3, 0:4], crec[:, 3, 4:8])
                    fl = (F, al, al, Tr, Tr)
                else:
                    seg = (zeros4, crec[:, 4:8, 3], crec[:, 3, 3],
                           crec[:, 3, 4:8], zeros4)
                    fl = (F, Tr, Tr, Tr, F)
                refq = _assemble_ref(*seg, *fl, 4, bit_depth)
                pall4 = _predict_all(refq, 4, maxv, fixups=False, luma=False)
                pq = jnp.take_along_axis(pall4, chroma_mode[:, None, None],
                                         axis=1).reshape(B, 4, 4)
                lq, cq_, rq = _tu(subc, pq, qpc, 4, bit_depth, maxv)
                crec = crec.at[:, dy:dy + 4, dx:dx + 4].set(rq)
                lvl_b = lvl_b.at[:, dy:dy + 4, dx:dx + 4].set(lq)
                cbfs_b.append(cq_)
            lvl_c = jnp.where(pm, lvl_b, lvl_a)
            rec_c = jnp.where(pm, crec, rec_a)
            cbf4 = jnp.stack([jnp.where(part, cbfs_b[i], cbf_a)
                              for i in range(4)], axis=1)
            cbf_parent = jnp.where(part, jnp.any(jnp.stack(cbfs_b, 1), axis=1),
                                   cbf_a)
            ch[name] = (lvl_c, rec_c, cbf4, cbf_parent)

        rec_cb, rec_cr = ch["cb"][1], ch["cr"][1]
        lmodes = jnp.stack(
            [jnp.where(part, sub_modes[1], mode2n),
             jnp.where(part, sub_modes[3], mode2n)], axis=1)

        # ---- P slice: zero-MV skip candidate vs the intra result ----
        if p_mode:
            refy = jax.lax.dynamic_slice(ref_y_rows, (r, 0, c, 0, 0),
                                         (1, B, 1, 16, 16)).reshape(B, 16, 16)
            refcb = jax.lax.dynamic_slice(ref_cb_rows, (r, 0, c, 0, 0),
                                          (1, B, 1, 8, 8)).reshape(B, 8, 8)
            refcr = jax.lax.dynamic_slice(ref_cr_rows, (r, 0, c, 0, 0),
                                          (1, B, 1, 8, 8)).reshape(B, 8, 8)
            sse_skip = _sse_j(src, refy) + _sse_j(src_c["cb"], refcb) \
                + _sse_j(src_c["cr"], refcr)
            sse_intra = _sse_j(src, rec_y) + _sse_j(src_c["cb"], rec_cb) \
                + _sse_j(src_c["cr"], rec_cr)
            bits = 8 + _level_bits(lvl_y) + _level_bits(ch["cb"][0]) \
                + _level_bits(ch["cr"][0])
            bits = jnp.minimum(bits, 2048)
            j_skip = sse_skip + (lam16 >> 4)
            j_intra = sse_intra + ((lam16 * bits) >> 4)
            skip = j_skip <= j_intra                      # (B,)
            sm = skip[:, None, None]
            rec_y = jnp.where(sm, refy, rec_y)
            rec_cb = jnp.where(sm, refcb, rec_cb)
            rec_cr = jnp.where(sm, refcr, rec_cr)
            lmodes = jnp.where(skip[:, None], jnp.ones_like(lmodes), lmodes)

        # ---- state updates ----
        nxt = dict(state)
        nxt["corner_y"] = jax.lax.dynamic_slice(
            state["top_y"], (0, c * 16 + 15), (B, 1)).reshape(B)
        nxt["corner_cb"] = jax.lax.dynamic_slice(
            state["top_cb"], (0, c * 8 + 7), (B, 1)).reshape(B)
        nxt["corner_cr"] = jax.lax.dynamic_slice(
            state["top_cr"], (0, c * 8 + 7), (B, 1)).reshape(B)
        nxt["top_y"] = jax.lax.dynamic_update_slice(
            state["top_y"], rec_y[:, 15, :], (0, c * 16))
        nxt["top_cb"] = jax.lax.dynamic_update_slice(
            state["top_cb"], rec_cb[:, 7, :], (0, c * 8))
        nxt["top_cr"] = jax.lax.dynamic_update_slice(
            state["top_cr"], rec_cr[:, 7, :], (0, c * 8))
        nxt["left_y"] = rec_y[:, :, 15]
        nxt["left_cb"] = rec_cb[:, :, 7]
        nxt["left_cr"] = rec_cr[:, :, 7]
        nxt["left_modes"] = lmodes

        rdt = jnp.uint8 if bit_depth == 8 else jnp.uint16
        out = (part, modes4.astype(jnp.int8), cbf_y4,
               ch["cb"][3], ch["cr"][3], ch["cb"][2], ch["cr"][2],
               lvl_y.astype(jnp.int16),
               ch["cb"][0].astype(jnp.int16), ch["cr"][0].astype(jnp.int16),
               rec_y.astype(rdt), rec_cb.astype(rdt), rec_cr.astype(rdt))
        if p_mode:
            out = out + (skip,)
        return nxt, out

    _, outs = jax.lax.scan(step, state, jnp.arange(tnh * tnw, dtype=I32))
    return outs


@partial(jax.jit, static_argnames=("tnh", "tnw", "bit_depth", "enable_nxn"))
def encode_tiles_rowscan_v1_jit(src_y, src_cb, src_cr, qp, lam_bits,
                                tnh, tnw, bit_depth=8, enable_nxn=True):
    return _rowscan_v1_scan(src_y, src_cb, src_cr, qp, lam_bits, tnh, tnw,
                            bit_depth, enable_nxn=enable_nxn)


@partial(jax.jit, static_argnames=("tnh", "tnw", "bit_depth", "enable_nxn"))
def encode_tiles_rowscan_p_jit(src_y, src_cb, src_cr, ref_y, ref_cb, ref_cr,
                               qp, lam_bits, lam16, tnh, tnw, bit_depth=8,
                               enable_nxn=True):
    """P-frame row-scan: v1 intra search + zero-MV skip per CTU.

    ref planes are the previous picture's DEBLOCKED reconstruction in the
    same (B, tnh, tnw, n, n) block layout.  Returns the v1 outputs plus a
    (steps, B) skip flag; recons reflect the skip selection.
    """
    return _rowscan_v1_scan(src_y, src_cb, src_cr, qp, lam_bits, tnh, tnw,
                            bit_depth, refs=(ref_y, ref_cb, ref_cr),
                            lam16=lam16, enable_nxn=enable_nxn)


class RowScanEncoderV1:
    """Host wrapper for the v1 (NxN-capable) row-scan graph."""

    def __init__(self, qp: int, bit_depth: int = 8):
        self.qp = qp
        self.bit_depth = bit_depth
        qp_eff = qp + 6 * (bit_depth - 8)
        lam = 0.85 * 2.0 ** ((qp_eff - 12) / 3.0)
        sl = float(np.sqrt(lam))
        self.lam_bits = jnp.asarray([int(sl * b) for b in (2, 3, 6)],
                                    dtype=np.int32)

    def encode_frames_tiled(self, frames, tile_cols, tile_rows,
                            want_recon: bool = True):
        from hevc_tpu.encoder.frame_jax import JaxIntraEncoder
        F = len(frames)
        blocks = [JaxIntraEncoder._to_blocks(*f) for f in frames]
        nh, nw, H, W = blocks[0][3:]
        assert nh % tile_rows == 0 and nw % tile_cols == 0
        tnh, tnw = nh // tile_rows, nw // tile_cols
        T = tile_cols * tile_rows

        def tsplit(b, bs):
            return (b.reshape(tile_rows, tnh, tile_cols, tnw, bs, bs)
                     .swapaxes(1, 2).reshape(T, tnh, tnw, bs, bs))

        yb = jnp.asarray(np.concatenate([tsplit(b[0], 16) for b in blocks]))
        cbb = jnp.asarray(np.concatenate([tsplit(b[1], 8) for b in blocks]))
        crb = jnp.asarray(np.concatenate([tsplit(b[2], 8) for b in blocks]))
        outs = encode_tiles_rowscan_v1_jit(
            yb, cbb, crb, jnp.asarray(self.qp), self.lam_bits, tnh, tnw,
            self.bit_depth)
        outs = [np.asarray(o) for o in outs]

        def unstep(a, to=None):
            s = a.shape
            x = np.moveaxis(a.reshape(tnh, tnw, F, T, *s[2:]), (2, 3), (0, 1))
            x = x.reshape(F, tile_rows, tile_cols, tnh, tnw, *s[2:])
            x = x.swapaxes(2, 3).reshape(F, nh, nw, *s[2:])
            return x.astype(to) if to is not None else x

        (part, modes4, cbf_y4, cbf_cb, cbf_cr, cbf_cb4, cbf_cr4,
         lvl_y, lvl_cb, lvl_cr, rec_y, rec_cb, rec_cr) = outs
        full = {
            "part_nxn": unstep(part),
            "modes4": unstep(modes4, np.int32),
            "cbf_y4": unstep(cbf_y4),
            "cbf_cb": unstep(cbf_cb), "cbf_cr": unstep(cbf_cr),
            "cbf_cb4": unstep(cbf_cb4), "cbf_cr4": unstep(cbf_cr4),
            "lvl_y": unstep(lvl_y, np.int32),
            "lvl_cb": unstep(lvl_cb, np.int32),
            "lvl_cr": unstep(lvl_cr, np.int32),
        }
        results = []
        if want_recon:
            ry = unstep(rec_y, np.int32)
            rcb = unstep(rec_cb, np.int32)
            rcr = unstep(rec_cr, np.int32)
        for f in range(F):
            d = {k: v[f] for k, v in full.items()}
            if want_recon:
                d["recon"] = {
                    "y": ry[f].swapaxes(1, 2).reshape(H, W),
                    "cb": rcb[f].swapaxes(1, 2).reshape(H // 2, W // 2),
                    "cr": rcr[f].swapaxes(1, 2).reshape(H // 2, W // 2),
                }
            results.append(d)
        return results
