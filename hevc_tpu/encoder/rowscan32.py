"""CTB-32 device kernel: two-level quadtree row scan (JAX, bit-exact).

Device mirror of encoder/ctb32_ref.py (the numpy spec): a lax.scan over
32x32 CTBs in raster order; each step evaluates the four 16x16 quadrant
CUs sequentially in z-order (intra 2Nx2N + P skip/merge/explicit RD, no
PART_NxN) plus the 32-level candidates (P: skip32/merge32/explicit32;
I: intra32 with forced TU16 split), then selects split vs 32 by the
summed RD costs.  All tie-break rules replicate the numpy encoder.

Motion state lives at 16-cell granularity (left column / top row /
above-left lag registers) so the sized spatial-neighbor rules — including
the A0 below-left candidate reachable in z-order — match ops/inter.py.

Outputs are per-CELL (16-grid) field stacks in z-order plus per-CTB
32-level fields; `z_to_raster` converts cell stacks to the raster layout
the shared deblock/pad assembler consumes.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hevc_tpu.encoder.rowscan_v1 import (
    MARGIN, MARGIN_C, _CQP, _assemble_ref, _chroma_val_ref, _level_bits,
    _merge_luma_val_ref, _mode_bits, _mpm_jax, _mvd_bits_j, _predict_all,
    _scale_mv_j, _search_explicit_ref, _search_select, _sse_j, _tu_q,
    _weight_bi_j, _weight_explicit_j, _weight_uni_j)

I32 = jnp.int32
INF32 = jnp.asarray(2**31 - 1, I32)


def _first_avail_mv(cands):
    """where-chain: first available (av, mv) in priority order."""
    mv = jnp.zeros_like(cands[0][1])
    for av, m in reversed(cands):
        mv = jnp.where(av[:, None], m, mv)
    return mv


def _amvp_p(a_list, b_list):
    """P-slice AMVP from (av, mv) lists: A = first of a_list (A0, A1),
    B = first of b_list (B0, B1, B2); dedupe; zero-fill."""
    a_av = jnp.zeros(a_list[0][0].shape, bool)
    a_mv = jnp.zeros_like(a_list[0][1])
    for av, m in reversed(a_list):
        a_mv = jnp.where(av[:, None], m, a_mv)
        a_av = a_av | av
    b_av = jnp.zeros_like(a_av)
    b_mv = jnp.zeros_like(a_mv)
    for av, m in reversed(b_list):
        b_mv = jnp.where(av[:, None], m, b_mv)
        b_av = b_av | av
    dup = a_av & b_av & jnp.all(a_mv == b_mv, -1)
    c0 = jnp.where(a_av[:, None], a_mv, jnp.where(b_av[:, None], b_mv, 0))
    c1 = jnp.where((a_av & b_av & ~dup)[:, None], b_mv, 0)
    return c0, c1


@partial(jax.jit, static_argnames=("tnh32", "tnw32", "bit_depth", "subpel",
                                   "i_slice", "sdh", "rdoq"))
def rowscan32_scan_jit(src_y, src_cb, src_cr, qp, lam_bits, lam16, sl16,
                       pad_y, pad_cb, pad_cr, tnh32, tnw32, bit_depth,
                       subpel=True, i_slice=False, sdh=False, rdoq=False,
                       wp=None):
    return _rowscan32_scan(src_y, src_cb, src_cr, qp, lam_bits, tnh32,
                           tnw32, bit_depth, lam16=lam16, sl16=sl16,
                           ref_pads=None if i_slice
                           else (pad_y, pad_cb, pad_cr), subpel=subpel,
                           sdh=sdh, rdoq=rdoq, wp=wp)


@partial(jax.jit, static_argnames=("tnh32", "tnw32", "bit_depth", "subpel",
                                   "sdh", "rdoq"))
def rowscan32_scan_b_jit(src_y, src_cb, src_cr, qp, lam_bits, lam16, sl16,
                         pad0_y, pad0_cb, pad0_cr, pad1_y, pad1_cb, pad1_cr,
                         dsf, tnh32, tnw32, bit_depth, subpel=True,
                         sdh=False, rdoq=False):
    """B-slice ctb32 scan: two reference pad sets + cross-list MV scale
    factors (host-precomputed from the POC deltas, rowscan_v1.dsf_pair)."""
    return _rowscan32_scan(src_y, src_cb, src_cr, qp, lam_bits, tnh32,
                           tnw32, bit_depth, lam16=lam16, sl16=sl16,
                           ref_pads=(pad0_y, pad0_cb, pad0_cr),
                           ref_pads1=(pad1_y, pad1_cb, pad1_cr), dsf=dsf,
                           subpel=subpel, sdh=sdh, rdoq=rdoq)


def _rowscan32_scan(src_y, src_cb, src_cr, qp, lam_bits, tnh32, tnw32,
                    bit_depth, lam16=None, sl16=None, ref_pads=None,
                    ref_pads1=None, dsf=None, subpel=True, sdh=False,
                    rdoq=False, wp=None):
    """Shared ctb32 scan body.  src_y: (B, tnh32, tnw32, 32, 32); chroma
    (B, tnh32, tnw32, 16, 16).  ref_pads enables the P step; ref_pads1
    additionally enables the B step (two lists, skip / merge / L0 / L1 /
    BI / intra RD — bit-exact with ctb32_ref.encode_frame_p(ref1=...));
    dsf: (2,) cross-list MV scale factors from the POC deltas."""
    B = src_y.shape[0]
    b_mode = ref_pads1 is not None
    p_mode = ref_pads is not None
    maxv = (1 << bit_depth) - 1
    # wp: (6,) traced vector (wy, oy, wcb, ocb, wcr, ocr) -> explicit
    # P-slice weighted prediction (spec 8.5.3.2.9.3); None compiles the
    # default-weighting graph.  Same contract as _rowscan_v1_scan.
    if wp is not None:
        assert p_mode and not b_mode, "ctb32 weightp is a P-slice tool"
        _wl = (wp[0], wp[1])

        def _wu_y(v):
            return _weight_explicit_j(v, wp[0], wp[1], bit_depth)

        def _wu_cb(v):
            return _weight_explicit_j(v, wp[2], wp[3], bit_depth)

        def _wu_cr(v):
            return _weight_explicit_j(v, wp[4], wp[5], bit_depth)
    else:
        _wl = None
        _wu_y = _wu_cb = _wu_cr = lambda v: _weight_uni_j(v, bit_depth)
    # every ctb32-profile TB is diag-scanned; one static sdh_scan arg
    shs0 = 0 if sdh else None
    _tu = partial(_tu_q, rdoq=rdoq)
    qp_bd = 6 * (bit_depth - 8)
    qp_eff = qp + qp_bd
    qpc = jnp.asarray(_CQP)[jnp.clip(qp, 0, 57)] + qp_bd
    DC = jnp.full((B,), 1, I32)
    nw16 = 2 * tnw32

    src_y_rows = src_y.transpose(1, 0, 2, 3, 4)
    src_cb_rows = src_cb.transpose(1, 0, 2, 3, 4)
    src_cr_rows = src_cr.transpose(1, 0, 2, 3, 4)

    state = dict(
        top_y=jnp.zeros((B, tnw32 * 32), I32),
        top_cb=jnp.zeros((B, tnw32 * 16), I32),
        top_cr=jnp.zeros((B, tnw32 * 16), I32),
        left_y=jnp.zeros((B, 32), I32),
        left_cb=jnp.zeros((B, 16), I32),
        left_cr=jnp.zeros((B, 16), I32),
        corner_y=jnp.zeros((B,), I32),
        corner_cb=jnp.zeros((B,), I32),
        corner_cr=jnp.zeros((B,), I32),
        left_modes=jnp.full((B, 2), -1, I32),     # right cells of left CTB
    )
    if b_mode:
        # full motion records per 16-cell: prediction flags + MV per list
        state.update(
            left_pf=jnp.zeros((B, 2, 2), bool),
            left_mv2=jnp.zeros((B, 2, 2, 2), I32),
            top_pf=jnp.zeros((B, nw16, 2), bool),
            top_mv2=jnp.zeros((B, nw16, 2, 2), I32),
            al_pf=jnp.zeros((B, 2), bool),        # above-left cell lag
            al_mv2=jnp.zeros((B, 2, 2), I32),
        )
    elif p_mode:
        state.update(
            left_inter=jnp.zeros((B, 2), bool),
            left_mv=jnp.zeros((B, 2, 2), I32),
            top_inter=jnp.zeros((B, nw16), bool),
            top_mv=jnp.zeros((B, nw16, 2), I32),
            al_inter=jnp.zeros((B,), bool),       # above-left cell lag
            al_mv=jnp.zeros((B, 2), I32),
            left_skip=jnp.zeros((B, 2), I32),
            top_skip=jnp.zeros((B, nw16), I32),
        )
    state.update(
        left_depth=jnp.zeros((B,), I32),
        top_depth=jnp.zeros((B, nw16), I32),
    )

    zeros16 = jnp.zeros((B, 16), I32)
    zeros8 = jnp.zeros((B, 8), I32)
    F = jnp.asarray(False)
    Tr = jnp.asarray(True)

    if p_mode:
        pad_py, pad_pcb, pad_pcr = ref_pads
    if b_mode:
        pad1_py, pad1_pcb, pad1_pcr = ref_pads1
        # Stacked reference pads, hoisted out of the scan: L0 lanes then
        # L1 lanes (2B) for luma, [cb0, cb1, cr0, cr1] (4B) for chroma.
        # One batched search / MC gather then serves BOTH lists (and both
        # chroma planes), cutting the per-step kernel count ~2-4x — the
        # 1080p scan is latency-bound on many small kernels, not FLOPs.
        pad2_py = jnp.concatenate([pad_py, pad1_py])
        pad4_c = jnp.concatenate([pad_pcb, pad1_pcb, pad_pcr, pad1_pcr])
    elif p_mode:
        # [cb, cr, cb, cr]: merge-MV and explicit-MV chroma gathers for
        # both planes ride one batched call
        pad4_c = jnp.concatenate([pad_pcb, pad_pcr, pad_pcb, pad_pcr])

    def step(state, d):
        r32 = d // tnw32
        c32 = d % tnw32
        al = c32 > 0
        aa = r32 > 0
        aar = aa & (c32 < tnw32 - 1)
        cclamp = jnp.minimum(c32 + 1, tnw32 - 1)

        s32 = jax.lax.dynamic_slice(src_y_rows, (r32, 0, c32, 0, 0),
                                    (1, B, 1, 32, 32)).reshape(B, 32, 32)
        s32cb = jax.lax.dynamic_slice(src_cb_rows, (r32, 0, c32, 0, 0),
                                      (1, B, 1, 16, 16)).reshape(B, 16, 16)
        s32cr = jax.lax.dynamic_slice(src_cr_rows, (r32, 0, c32, 0, 0),
                                      (1, B, 1, 16, 16)).reshape(B, 16, 16)
        t_y = jax.lax.dynamic_slice(state["top_y"], (0, c32 * 32), (B, 32))
        tr_y = jax.lax.dynamic_slice(state["top_y"], (0, cclamp * 32),
                                     (B, 32))
        t_cb = jax.lax.dynamic_slice(state["top_cb"], (0, c32 * 16), (B, 16))
        trcb = jax.lax.dynamic_slice(state["top_cb"], (0, cclamp * 16),
                                     (B, 16))
        t_cr = jax.lax.dynamic_slice(state["top_cr"], (0, c32 * 16), (B, 16))
        trcr = jax.lax.dynamic_slice(state["top_cr"], (0, cclamp * 16),
                                     (B, 16))
        if b_mode:
            def top_rec(k0):
                pf = jax.lax.dynamic_slice(state["top_pf"], (0, k0, 0),
                                           (B, 1, 2)).reshape(B, 2)
                mv2 = jax.lax.dynamic_slice(
                    state["top_mv2"], (0, k0, 0, 0),
                    (B, 1, 2, 2)).reshape(B, 2, 2)
                return pf[:, 0] | pf[:, 1], pf, mv2
            top2 = [top_rec(2 * c32), top_rec(2 * c32 + 1)]
            top_b0 = top_rec(jnp.minimum(2 * c32 + 2, nw16 - 1))
        elif p_mode:
            top2 = [
                (jax.lax.dynamic_slice(state["top_inter"], (0, k0),
                                       (B, 1)).reshape(B),
                 jax.lax.dynamic_slice(state["top_mv"], (0, k0, 0),
                                       (B, 1, 2)).reshape(B, 2))
                for k0 in (2 * c32, 2 * c32 + 1)]
            k2 = jnp.minimum(2 * c32 + 2, nw16 - 1)
            top_b0 = (jax.lax.dynamic_slice(state["top_inter"], (0, k2),
                                            (B, 1)).reshape(B),
                      jax.lax.dynamic_slice(state["top_mv"], (0, k2, 0),
                                            (B, 1, 2)).reshape(B, 2))
        tdep = [jax.lax.dynamic_slice(state["top_depth"], (0, k0),
                                      (B, 1)).reshape(B)
                for k0 in (2 * c32, 2 * c32 + 1)]

        ctb_y = jnp.zeros((B, 32, 32), I32)
        ctb_cb = jnp.zeros((B, 16, 16), I32)
        ctb_cr = jnp.zeros((B, 16, 16), I32)

        # per-quadrant provisional records
        q_mode = []          # (B,) int32, -1 = not intra
        q_skip = []          # (B,) bool
        q_inter = []         # (B,) bool (inter incl. skip)
        q_mv = []            # (B, 2)
        q_pf = []            # (B, 2) b_mode: per-list prediction flags
        q_mv2 = []           # (B, 2, 2) b_mode: per-list MVs
        q_fields = []
        q_j = []

        def vs(a, v):
            """Variant slice v of a lane-stacked (V*B, ...) array."""
            return a[v * B:(v + 1) * B]

        def uni_bi(v4, pf=None):
            """[cb0, cb1, cr0, cr1] stacked chroma MC vals (4B) -> per
            plane: (uni-L0, uni-L1, bi) triple, or the pf-combined merge
            prediction when pf is given (spec 8.5.4.2.4 selection)."""
            out = []
            for pi in range(2):
                v0 = v4[2 * pi * B:(2 * pi + 1) * B]
                v1 = v4[(2 * pi + 1) * B:(2 * pi + 2) * B]
                if pf is None:
                    out.append((_weight_uni_j(v0, bit_depth),
                                _weight_uni_j(v1, bit_depth),
                                _weight_bi_j(v0, v1, bit_depth)))
                else:
                    vu = jnp.where(pf[:, 0][:, None, None], v0, v1)
                    out.append(jnp.where(
                        (pf[:, 0] & pf[:, 1])[:, None, None],
                        _weight_bi_j(v0, v1, bit_depth),
                        _weight_uni_j(vu, bit_depth)))
            return out

        def tu32_v(preds_y, preds_cb, preds_cr):
            """Forced-split TU16 chain of V whole-32 CU candidates in ONE
            batched _tu call per plane group: the 4 quadrants and the V
            candidate kinds all become batch lanes ((q, v, b) order), so
            the V*12 unrolled transform/quant instances of the previous
            per-variant tu32 collapse to 2.  Returns the per-variant
            (rec_y, rec_cb, rec_cr, lvls[4], cbfs[4], bits, any_cbf)
            tuples of the original tu32 contract, bit-identically."""
            V = len(preds_y)
            VB = V * B

            def quads(a, h):
                x = a.reshape(VB, 2, h, 2, h).transpose(1, 3, 0, 2, 4)
                return x.reshape(4 * VB, h, h)

            def unquads(a, h):
                x = a.reshape(2, 2, VB, h, h).transpose(2, 0, 3, 1, 4)
                return x.reshape(VB, 2 * h, 2 * h)

            py = quads(jnp.concatenate(preds_y), 16)
            sy = quads(jnp.concatenate([s32] * V), 16)
            ly_, cy_, ry_ = _tu(sy, py, qp_eff, 16, bit_depth, maxv,
                                sdh_scan=shs0)
            pc = jnp.concatenate([quads(jnp.concatenate(preds_cb), 8),
                                  quads(jnp.concatenate(preds_cr), 8)])
            sc = jnp.concatenate([quads(jnp.concatenate([s32cb] * V), 8),
                                  quads(jnp.concatenate([s32cr] * V), 8)])
            lc_, cc_, rc_ = _tu(sc, pc, qpc, 8, bit_depth, maxv,
                                sdh_scan=shs0)
            lcb_, lcr_ = lc_[:4 * VB], lc_[4 * VB:]
            ccb_, ccr_ = cc_[:4 * VB], cc_[4 * VB:]
            ry = unquads(ry_, 16)
            rcb = unquads(rc_[:4 * VB], 8)
            rcr = unquads(rc_[4 * VB:], 8)
            lb = _level_bits(ly_) + _level_bits(lcb_) + _level_bits(lcr_)
            bits = lb.reshape(4, VB).sum(0)
            anyc = jnp.any((cy_ | ccb_ | ccr_).reshape(4, VB), 0)
            res = []
            for v in range(V):
                sl = slice(v * B, (v + 1) * B)

                def qv(a, q, v=v):
                    return a[(q * V + v) * B:(q * V + v + 1) * B]

                lvls = [(qv(ly_, q), qv(lcb_, q), qv(lcr_, q))
                        for q in range(4)]
                cbfs = [(qv(cy_, q), qv(ccb_, q), qv(ccr_, q))
                        for q in range(4)]
                res.append((ry[sl], rcb[sl], rcr[sl], lvls, cbfs,
                            bits[sl], anyc[sl]))
            return res

        def intra_segs(q, buf_y, buf_cb, buf_cr):
            """Reference segments + avail flags for quadrant q."""
            if q == 0:
                y = (state["left_y"][:, 16:32], state["left_y"][:, 0:16],
                     state["corner_y"], t_y[:, 0:16], t_y[:, 16:32],
                     al, al, al & aa, aa, aa)
                cb = (state["left_cb"][:, 8:16], state["left_cb"][:, 0:8],
                      state["corner_cb"], t_cb[:, 0:8], t_cb[:, 8:16],
                      al, al, al & aa, aa, aa)
                cr = (state["left_cr"][:, 8:16], state["left_cr"][:, 0:8],
                      state["corner_cr"], t_cr[:, 0:8], t_cr[:, 8:16],
                      al, al, al & aa, aa, aa)
            elif q == 1:
                y = (zeros16, buf_y[:, 0:16, 15], t_y[:, 15],
                     t_y[:, 16:32], tr_y[:, 0:16], F, Tr, aa, aa, aar)
                cb = (zeros8, buf_cb[:, 0:8, 7], t_cb[:, 7],
                      t_cb[:, 8:16], trcb[:, 0:8], F, Tr, aa, aa, aar)
                cr = (zeros8, buf_cr[:, 0:8, 7], t_cr[:, 7],
                      t_cr[:, 8:16], trcr[:, 0:8], F, Tr, aa, aa, aar)
            elif q == 2:
                y = (zeros16, state["left_y"][:, 16:32],
                     state["left_y"][:, 15], buf_y[:, 15, 0:16],
                     buf_y[:, 15, 16:32], F, al, al, Tr, Tr)
                cb = (zeros8, state["left_cb"][:, 8:16],
                      state["left_cb"][:, 7], buf_cb[:, 7, 0:8],
                      buf_cb[:, 7, 8:16], F, al, al, Tr, Tr)
                cr = (zeros8, state["left_cr"][:, 8:16],
                      state["left_cr"][:, 7], buf_cr[:, 7, 0:8],
                      buf_cr[:, 7, 8:16], F, al, al, Tr, Tr)
            else:
                y = (zeros16, buf_y[:, 16:32, 15], buf_y[:, 15, 15],
                     buf_y[:, 15, 16:32], zeros16, F, Tr, Tr, Tr, F)
                cb = (zeros8, buf_cb[:, 8:16, 7], buf_cb[:, 7, 7],
                      buf_cb[:, 7, 8:16], zeros8, F, Tr, Tr, Tr, F)
                cr = (zeros8, buf_cr[:, 8:16, 7], buf_cr[:, 7, 7],
                      buf_cr[:, 7, 8:16], zeros8, F, Tr, Tr, Tr, F)
            return y, cb, cr

        def mot_nbrs(q):
            """{a1,a0,b1,b0,b2}: (avail, mv) per neighbor for quadrant q."""
            li, lmv = state["left_inter"], state["left_mv"]
            none = (jnp.zeros((B,), bool), jnp.zeros((B, 2), I32))
            if q == 0:
                return dict(
                    a1=(li[:, 0] & al, lmv[:, 0]),
                    a0=(li[:, 1] & al, lmv[:, 1]),
                    b1=(top2[0][0] & aa, top2[0][1]),
                    b0=(top2[1][0] & aa, top2[1][1]),
                    b2=(state["al_inter"] & al & aa, state["al_mv"]))
            if q == 1:
                return dict(
                    a1=(q_inter[0], q_mv[0]), a0=none,
                    b1=(top2[1][0] & aa, top2[1][1]),
                    b0=(top_b0[0] & aar, top_b0[1]),
                    b2=(top2[0][0] & aa, top2[0][1]))
            if q == 2:
                return dict(
                    a1=(li[:, 1] & al, lmv[:, 1]), a0=none,
                    b1=(q_inter[0], q_mv[0]),
                    b0=(q_inter[1], q_mv[1]),
                    b2=(li[:, 0] & al, lmv[:, 0]))
            return dict(
                a1=(q_inter[2], q_mv[2]), a0=none,
                b1=(q_inter[1], q_mv[1]), b0=none,
                b2=(q_inter[0], q_mv[0]))

        def mot_nbrs_b(q):
            """{a1,a0,b1,b0,b2}: (avail, pf, mv2) full records, b_mode."""
            lpf, lmv2 = state["left_pf"], state["left_mv2"]
            none = (jnp.zeros((B,), bool), jnp.zeros((B, 2), bool),
                    jnp.zeros((B, 2, 2), I32))

            def lrec(i, gate):
                av = (lpf[:, i, 0] | lpf[:, i, 1]) & gate
                return av, lpf[:, i], lmv2[:, i]

            def trec(e, gate):
                return e[0] & gate, e[1], e[2]

            def qrec(i):
                return q_inter[i], q_pf[i], q_mv2[i]

            if q == 0:
                al_av = (state["al_pf"][:, 0] | state["al_pf"][:, 1]) \
                    & al & aa
                return dict(
                    a1=lrec(0, al), a0=lrec(1, al),
                    b1=trec(top2[0], aa), b0=trec(top2[1], aa),
                    b2=(al_av, state["al_pf"], state["al_mv2"]))
            if q == 1:
                return dict(
                    a1=qrec(0), a0=none,
                    b1=trec(top2[1], aa), b0=trec(top_b0, aar),
                    b2=trec(top2[0], aa))
            if q == 2:
                return dict(
                    a1=lrec(1, al), a0=none,
                    b1=qrec(0), b0=qrec(1), b2=lrec(0, al))
            return dict(
                a1=qrec(2), a0=none, b1=qrec(1), b0=none, b2=qrec(0))

        def merge0_b(nb):
            """First-available full record (A1, B1, B0, A0, B2), else the
            zero-bi candidate (ops.inter.merge_cand0_b)."""
            mg_pf = jnp.ones((B, 2), bool)
            mg_mv2 = jnp.zeros((B, 2, 2), I32)
            for key in ("b2", "a0", "b0", "b1", "a1"):   # reversed priority
                av_, pf_, mv_ = nb[key]
                mg_pf = jnp.where(av_[:, None], pf_, mg_pf)
                mg_mv2 = jnp.where(av_[:, None, None], mv_, mg_mv2)
            return mg_pf, mg_mv2

        def amvp_b(lx, nb):
            """Device mirror of ops.inter.amvp_list_b with the A0 slot
            (reachable inside the z-order) and cross-list POC scaling.
            dsf: (2,) batch-uniform or (B, 2) per-lane factors (the
            b2-batched dispatch stacks pictures with different POC
            geometry as lane groups)."""
            ly = 1 - lx
            d_ = dsf[lx] if dsf.ndim == 1 else dsf[:, lx][:, None]

            def uns(e):
                av_, pf_, mv_ = e
                return av_ & pf_[:, lx], mv_[:, lx]

            def scl(e):
                av_, pf_, mv_ = e
                mv = jnp.where(pf_[:, lx][:, None], mv_[:, lx],
                               _scale_mv_j(mv_[:, ly], d_))
                return av_, mv          # an inter record always scales

            u0h, u0m = uns(nb["a0"])
            u1h, u1m = uns(nb["a1"])
            au_h = u0h | u1h
            au_m = jnp.where(u0h[:, None], u0m, u1m)
            s0h, s0m = scl(nb["a0"])
            s1h, s1m = scl(nb["a1"])
            as_h = s0h | s1h
            as_m = jnp.where(s0h[:, None], s0m, s1m)
            ca_h = au_h | as_h
            ca_mv = jnp.where(au_h[:, None], au_m, as_m)
            is_sc = nb["a0"][0] | nb["a1"][0]
            ub_h = jnp.zeros((B,), bool)
            ub_mv = jnp.zeros((B, 2), I32)
            sb_h = jnp.zeros((B,), bool)
            sb_mv = jnp.zeros((B, 2), I32)
            for key in ("b2", "b1", "b0"):               # reversed priority
                h, m = uns(nb[key])
                ub_mv = jnp.where(h[:, None], m, ub_mv)
                ub_h = ub_h | h
                h, m = scl(nb[key])
                sb_mv = jnp.where(h[:, None], m, sb_mv)
                sb_h = sb_h | h
            # isScaledFlag dance: without a coded-inter A neighbor, the
            # unscaled B takes A's slot and the scaled B search fills B
            A_h = jnp.where(is_sc, ca_h, ub_h)
            A_mv = jnp.where(is_sc[:, None], ca_mv, ub_mv)
            B_h = jnp.where(is_sc, ub_h, sb_h)
            B_mv = jnp.where(is_sc[:, None], ub_mv, sb_mv)
            dup = A_h & B_h & jnp.all(A_mv == B_mv, -1)
            c0_ = jnp.where(A_h[:, None], A_mv,
                            jnp.where(B_h[:, None], B_mv, 0))
            c1_ = jnp.where((A_h & B_h & ~dup)[:, None], B_mv, 0)
            return c0_, c1_

        for q in range(4):
            qx, qy = q & 1, q >> 1
            src = s32[:, 16 * qy:16 * qy + 16, 16 * qx:16 * qx + 16]
            scb = s32cb[:, 8 * qy:8 * qy + 8, 8 * qx:8 * qx + 8]
            scr = s32cr[:, 8 * qy:8 * qy + 8, 8 * qx:8 * qx + 8]
            segs_y, segs_cb, segs_cr = intra_segs(q, ctb_y, ctb_cb, ctb_cr)

            # ---- intra 2Nx2N candidate ----
            ref = _assemble_ref(*segs_y[:5], *segs_y[5:], 16, bit_depth)
            if q == 0:
                a_m = jnp.where(al, state["left_modes"][:, 0], -1)
                b_m = jnp.full((B,), -1, I32)
            elif q == 1:
                a_m = q_mode[0]
                b_m = jnp.full((B,), -1, I32)
            elif q == 2:
                a_m = jnp.where(al, state["left_modes"][:, 1], -1)
                b_m = q_mode[0]
            else:
                a_m = q_mode[2]
                b_m = q_mode[1]
            c0, c1, c2 = _mpm_jax(jnp.where(a_m >= 0, a_m, DC),
                                  jnp.where(b_m >= 0, b_m, DC))
            mode, pred, _ = _search_select(src, ref, 16, lam_bits,
                                           c0, c1, c2, maxv)
            lvl_y, cbf_y, rec_y = _tu(src, pred, qp_eff, 16, bit_depth, maxv, sdh_scan=shs0)
            refcb = _assemble_ref(*segs_cb[:5], *segs_cb[5:], 8, bit_depth)
            refcr = _assemble_ref(*segs_cr[:5], *segs_cr[5:], 8, bit_depth)
            pcb = jnp.take_along_axis(
                _predict_all(refcb, 8, maxv, fixups=False, luma=False),
                mode[:, None, None], axis=1).reshape(B, 8, 8)
            pcr = jnp.take_along_axis(
                _predict_all(refcr, 8, maxv, fixups=False, luma=False),
                mode[:, None, None], axis=1).reshape(B, 8, 8)
            lvl_cb, cbf_cb, rec_cb = _tu(scb, pcb, qpc, 8, bit_depth, maxv, sdh_scan=shs0)
            lvl_cr, cbf_cr, rec_cr = _tu(scr, pcr, qpc, 8, bit_depth, maxv, sdh_scan=shs0)
            sse_i = _sse_j(src, rec_y) + _sse_j(scb, rec_cb) \
                + _sse_j(scr, rec_cr)
            bits_i = jnp.minimum(8 + _level_bits(lvl_y) + _level_bits(lvl_cb)
                                 + _level_bits(lvl_cr), 2048)
            j_i = sse_i + ((lam16 * bits_i) >> 4)

            fields = dict(mode=mode, lvl_y=lvl_y, lvl_cb=lvl_cb,
                          lvl_cr=lvl_cr, cbf_y=cbf_y, cbf_cb=cbf_cb,
                          cbf_cr=cbf_cr)
            if not p_mode:
                q_mode.append(mode)
                q_j.append(j_i)
                q_fields.append(fields)
                ctb_y = ctb_y.at[:, 16 * qy:16 * qy + 16,
                                 16 * qx:16 * qx + 16].set(rec_y)
                ctb_cb = ctb_cb.at[:, 8 * qy:8 * qy + 8,
                                   8 * qx:8 * qx + 8].set(rec_cb)
                ctb_cr = ctb_cr.at[:, 8 * qy:8 * qy + 8,
                                   8 * qx:8 * qx + 8].set(rec_cr)
                continue

            # ---- B candidates: skip / merge / L0 / L1 / BI / intra ----
            # (L0 + L1 work rides the stacked pads as 2B/4B lanes: one
            # search, one merge fetch, one chroma gather per MV set, and
            # the four candidate kinds' TUs in one batched call)
            if b_mode:
                nb = mot_nbrs_b(q)
                mg_pf, mg_mv2 = merge0_b(nb)
                c0mv0, c1mv0 = amvp_b(0, nb)
                c0mv1, c1mv1 = amvp_b(1, nb)
                r16 = 2 * r32 + qy
                c16 = 2 * c32 + qx
                mv_e2, mba, mbb, val_e2 = _search_explicit_ref(
                    jnp.concatenate([src, src]), pad2_py, r16, c16,
                    jnp.concatenate([c0mv0, c0mv1]),
                    jnp.concatenate([c1mv0, c1mv1]), sl16, bit_depth,
                    subpel, maxv)
                mv_e0, mv_e1 = vs(mv_e2, 0), vs(mv_e2, 1)
                val_e0, val_e1 = vs(val_e2, 0), vs(val_e2, 1)
                mvp_e0 = (vs(mba, 0) > vs(mbb, 0)).astype(I32)
                mbits0 = jnp.minimum(vs(mba, 0), vs(mbb, 0))
                mvp_e1 = (vs(mba, 1) > vs(mbb, 1)).astype(I32)
                mbits1 = jnp.minimum(vs(mba, 1), vs(mbb, 1))
                pred_l0 = _weight_uni_j(val_e0, bit_depth)
                pred_l1 = _weight_uni_j(val_e1, bit_depth)
                pred_bi = _weight_bi_j(val_e0, val_e1, bit_depth)

                valm2 = _merge_luma_val_ref(
                    pad2_py, r16, c16,
                    jnp.concatenate([mg_mv2[:, 0], mg_mv2[:, 1]]),
                    bit_depth, subpel)
                valm0, valm1 = vs(valm2, 0), vs(valm2, 1)
                both_m = mg_pf[:, 0] & mg_pf[:, 1]
                valm_u = jnp.where(mg_pf[:, 0][:, None, None], valm0, valm1)
                pred_m = jnp.where(both_m[:, None, None],
                                   _weight_bi_j(valm0, valm1, bit_depth),
                                   _weight_uni_j(valm_u, bit_depth))

                vm4 = _chroma_val_ref(
                    pad4_c, r16, c16,
                    jnp.concatenate([mg_mv2[:, 0], mg_mv2[:, 1]] * 2),
                    bit_depth)
                pm_cb, pm_cr = uni_bi(vm4, mg_pf)
                ve4 = _chroma_val_ref(
                    pad4_c, r16, c16,
                    jnp.concatenate([mv_e0, mv_e1] * 2), bit_depth)
                (pl0_cb, pl1_cb, pbi_cb), (pl0_cr, pl1_cr, pbi_cr) = \
                    uni_bi(ve4)

                la, ca, ra = _tu(
                    jnp.concatenate([src] * 4),
                    jnp.concatenate([pred_m, pred_l0, pred_l1, pred_bi]),
                    qp_eff, 16, bit_depth, maxv, sdh_scan=shs0)
                lc, cc, rc = _tu(
                    jnp.concatenate([scb] * 4 + [scr] * 4),
                    jnp.concatenate([pm_cb, pl0_cb, pl1_cb, pbi_cb,
                                     pm_cr, pl0_cr, pl1_cr, pbi_cr]),
                    qpc, 8, bit_depth, maxv, sdh_scan=shs0)

                def tri(v):
                    return ((vs(la, v), vs(lc, v), vs(lc, v + 4)),
                            (vs(ca, v), vs(cc, v), vs(cc, v + 4)),
                            (vs(ra, v), vs(rc, v), vs(rc, v + 4)))

                lv_m, cb_m, rc_m = tri(0)
                lv_0, cb_0, rc_0 = tri(1)
                lv_1, cb_1, rc_1 = tri(2)
                lv_b, cb_b, rc_b = tri(3)

                sse_c = _sse_j(jnp.concatenate([scb] * 4 + [scr] * 4), rc)
                sse_r = _sse_j(jnp.concatenate([src] * 4), ra) \
                    + sse_c[:4 * B] + sse_c[4 * B:]
                lb_c = _level_bits(lc)
                lvb = _level_bits(la) + lb_c[:4 * B] + lb_c[4 * B:]

                j_skip = _sse_j(src, pred_m) + _sse_j(scb, pm_cb) \
                    + _sse_j(scr, pm_cr) + ((lam16 * 2) >> 4)
                any_m = cb_m[0] | cb_m[1] | cb_m[2]
                j_m = jnp.where(
                    any_m,
                    vs(sse_r, 0) + ((lam16 * jnp.minimum(
                        12 + vs(lvb, 0), 2048)) >> 4), INF32)
                j_0 = vs(sse_r, 1) + ((lam16 * jnp.minimum(
                    16 + mbits0 + vs(lvb, 1), 2048)) >> 4)
                j_1 = vs(sse_r, 2) + ((lam16 * jnp.minimum(
                    16 + mbits1 + vs(lvb, 2), 2048)) >> 4)
                j_bi2 = vs(sse_r, 3) + ((lam16 * jnp.minimum(
                    24 + mbits0 + mbits1 + vs(lvb, 3), 2048)) >> 4)

                kind = jnp.argmin(jnp.stack(
                    [j_skip, j_m, j_0, j_1, j_bi2, j_i], 1),
                    axis=1).astype(I32)       # first-min = priority order
                skipf = kind == 0
                is_m = kind == 1
                is_e = (kind >= 2) & (kind <= 4)
                inter_sel = kind != 5
                dir_e = jnp.clip(kind - 2, 0, 2)

                def sel6(a_s, a_m_, a_0, a_1, a_b, a_i, nd):
                    k = kind.reshape(kind.shape + (1,) * nd)
                    return jnp.where(
                        k == 0, a_s,
                        jnp.where(k == 1, a_m_,
                                  jnp.where(k == 2, a_0,
                                            jnp.where(k == 3, a_1,
                                                      jnp.where(k == 4,
                                                                a_b,
                                                                a_i)))))

                rec_y_f = sel6(pred_m, rc_m[0], rc_0[0], rc_1[0], rc_b[0],
                               rec_y, 2)
                rec_cb_f = sel6(pm_cb, rc_m[1], rc_0[1], rc_1[1], rc_b[1],
                                rec_cb, 2)
                rec_cr_f = sel6(pm_cr, rc_m[2], rc_0[2], rc_1[2], rc_b[2],
                                rec_cr, 2)
                cbfi_y = sel6(cb_m[0], cb_m[0], cb_0[0], cb_1[0], cb_b[0],
                              F, 0) & inter_sel & ~skipf
                cbfi_cb = sel6(cb_m[1], cb_m[1], cb_0[1], cb_1[1], cb_b[1],
                               F, 0) & inter_sel & ~skipf
                cbfi_cr = sel6(cb_m[2], cb_m[2], cb_0[2], cb_1[2], cb_b[2],
                               F, 0) & inter_sel & ~skipf
                rqt_e = (cbfi_y | cbfi_cb | cbfi_cr).astype(I32)
                mvp_sel0 = jnp.where(mvp_e0[:, None] == 0, c0mv0, c1mv0)
                mvd0 = mv_e0 - mvp_sel0
                mvp_sel1 = jnp.where(mvp_e1[:, None] == 0, c0mv1, c1mv1)
                mvd1_ = mv_e1 - mvp_sel1
                use0 = (kind == 2) | (kind == 4)
                use1 = (kind == 3) | (kind == 4)
                pf_sel = jnp.where(is_e[:, None],
                                   jnp.stack([use0, use1], 1),
                                   jnp.where((skipf | is_m)[:, None],
                                             mg_pf,
                                             jnp.zeros((B, 2), bool)))
                mv2_sel = jnp.where(
                    is_e[:, None, None], jnp.stack([mv_e0, mv_e1], 1),
                    jnp.where((skipf | is_m)[:, None, None], mg_mv2, 0))
                mv_f = jnp.where(pf_sel[:, 0][:, None], mv2_sel[:, 0],
                                 jnp.where(pf_sel[:, 1][:, None],
                                           mv2_sel[:, 1], 0))
                mv1_f = jnp.where(pf_sel[:, 1][:, None], mv2_sel[:, 1], 0)
                fields.update(
                    mode=jnp.where(inter_sel, -1, mode),
                    lvl_y=sel6(lv_m[0], lv_m[0], lv_0[0], lv_1[0],
                               lv_b[0], lvl_y, 2),
                    lvl_cb=sel6(lv_m[1], lv_m[1], lv_0[1], lv_1[1],
                                lv_b[1], lvl_cb, 2),
                    lvl_cr=sel6(lv_m[2], lv_m[2], lv_0[2], lv_1[2],
                                lv_b[2], lvl_cr, 2),
                    cbf_y=jnp.where(inter_sel, F, cbf_y),
                    cbf_cb=jnp.where(inter_sel, F, cbf_cb),
                    cbf_cr=jnp.where(inter_sel, F, cbf_cr),
                    skip=skipf, inter=inter_sel & ~skipf, merge=is_m,
                    mvd=mvd0.astype(jnp.int16),
                    mvp=mvp_e0.astype(jnp.int8),
                    mvd1=mvd1_.astype(jnp.int16),
                    mvp1=mvp_e1.astype(jnp.int8),
                    dir=dir_e.astype(jnp.int8),
                    rqt=jnp.where(is_e, rqt_e, 1).astype(jnp.int8),
                    cbf_yi=cbfi_y, cbf_cbi=cbfi_cb, cbf_cri=cbfi_cr,
                    mv=mv_f.astype(jnp.int16),
                    mv1=mv1_f.astype(jnp.int16),
                    pf=pf_sel)
                q_mode.append(jnp.where(inter_sel, -1, mode))
                q_skip.append(skipf)
                q_inter.append(inter_sel)
                q_mv.append(mv_f)
                q_pf.append(pf_sel)
                q_mv2.append(mv2_sel)
                q_j.append(sel6(j_skip, j_m, j_0, j_1, j_bi2, j_i, 0))
                q_fields.append(fields)
                ctb_y = ctb_y.at[:, 16 * qy:16 * qy + 16,
                                 16 * qx:16 * qx + 16].set(rec_y_f)
                ctb_cb = ctb_cb.at[:, 8 * qy:8 * qy + 8,
                                   8 * qx:8 * qx + 8].set(rec_cb_f)
                ctb_cr = ctb_cr.at[:, 8 * qy:8 * qy + 8,
                                   8 * qx:8 * qx + 8].set(rec_cr_f)
                continue

            # ---- P candidates ----
            nb = mot_nbrs(q)
            mg_mv = _first_avail_mv([nb["a1"], nb["b1"], nb["b0"],
                                     nb["a0"], nb["b2"]])
            c0mv, c1mv = _amvp_p([nb["a0"], nb["a1"]],
                                 [nb["b0"], nb["b1"], nb["b2"]])
            r16 = 2 * r32 + qy
            c16 = 2 * c32 + qx
            mv_e, mb0b, mb1b, val_e = _search_explicit_ref(
                src, pad_py, r16, c16, c0mv, c1mv, sl16, bit_depth,
                subpel, maxv, wl=_wl)
            mvp_e = (mb0b > mb1b).astype(I32)
            mbits_e = jnp.minimum(mb0b, mb1b)
            pred_e = _wu_y(val_e)
            valm = _merge_luma_val_ref(pad_py, r16, c16, mg_mv, bit_depth,
                                       subpel)
            pred_m = _wu_y(valm)
            # merge-MV and explicit-MV chroma for both planes: ONE
            # batched gather on the [cb, cr, cb, cr] stacked pads
            vc4 = _chroma_val_ref(
                pad4_c, r16, c16,
                jnp.concatenate([mg_mv, mg_mv, mv_e, mv_e]), bit_depth)
            pm_cb = _wu_cb(vs(vc4, 0))
            pm_cr = _wu_cr(vs(vc4, 1))
            pe_cb = _wu_cb(vs(vc4, 2))
            pe_cr = _wu_cr(vs(vc4, 3))

            # merge + explicit TUs batched (V=2 luma; chroma planes fold)
            la, ca, ra = _tu(jnp.concatenate([src, src]),
                             jnp.concatenate([pred_m, pred_e]),
                             qp_eff, 16, bit_depth, maxv, sdh_scan=shs0)
            lc, cc, rc = _tu(jnp.concatenate([scb, scb, scr, scr]),
                             jnp.concatenate([pm_cb, pe_cb, pm_cr, pe_cr]),
                             qpc, 8, bit_depth, maxv, sdh_scan=shs0)
            lvlm_y, lvle_y = vs(la, 0), vs(la, 1)
            cbfm_y, cbfe_y = vs(ca, 0), vs(ca, 1)
            recm_y, rece_y = vs(ra, 0), vs(ra, 1)
            lvlm_cb, lvle_cb = vs(lc, 0), vs(lc, 1)
            lvlm_cr, lvle_cr = vs(lc, 2), vs(lc, 3)
            cbfm_cb, cbfe_cb = vs(cc, 0), vs(cc, 1)
            cbfm_cr, cbfe_cr = vs(cc, 2), vs(cc, 3)
            recm_cb, rece_cb = vs(rc, 0), vs(rc, 1)
            recm_cr, rece_cr = vs(rc, 2), vs(rc, 3)

            j_skip = _sse_j(src, pred_m) + _sse_j(scb, pm_cb) \
                + _sse_j(scr, pm_cr) + ((lam16 * 2) >> 4)
            any_m = cbfm_y | cbfm_cb | cbfm_cr
            bits_m = jnp.minimum(12 + _level_bits(lvlm_y)
                                 + _level_bits(lvlm_cb)
                                 + _level_bits(lvlm_cr), 2048)
            j_m = jnp.where(any_m, _sse_j(src, recm_y) + _sse_j(scb, recm_cb)
                            + _sse_j(scr, recm_cr)
                            + ((lam16 * bits_m) >> 4), INF32)
            bits_e = jnp.minimum(16 + mbits_e + _level_bits(lvle_y)
                                 + _level_bits(lvle_cb)
                                 + _level_bits(lvle_cr), 2048)
            j_e = _sse_j(src, rece_y) + _sse_j(scb, rece_cb) \
                + _sse_j(scr, rece_cr) + ((lam16 * bits_e) >> 4)

            kind = jnp.argmin(jnp.stack([j_skip, j_m, j_e, j_i], 1),
                              axis=1).astype(I32)
            skipf = kind == 0
            is_m = kind == 1
            is_e = kind == 2
            inter_sel = kind != 3

            def sel4(a_s, a_m_, a_e, a_i, nd):
                k = kind.reshape(kind.shape + (1,) * nd)
                return jnp.where(k == 0, a_s,
                                 jnp.where(k == 1, a_m_,
                                           jnp.where(k == 2, a_e, a_i)))

            rec_y_f = sel4(pred_m, recm_y, rece_y, rec_y, 2)
            rec_cb_f = sel4(pm_cb, recm_cb, rece_cb, rec_cb, 2)
            rec_cr_f = sel4(pm_cr, recm_cr, rece_cr, rec_cr, 2)
            mvp_sel = jnp.where(mvp_e[:, None] == 0, c0mv, c1mv)
            mvd = mv_e - mvp_sel
            mv_f = jnp.where(is_e[:, None], mv_e,
                             jnp.where(inter_sel[:, None], mg_mv, 0))
            rqt_e = (cbfe_y | cbfe_cb | cbfe_cr).astype(I32)
            fields.update(
                mode=jnp.where(inter_sel, -1, mode),
                lvl_y=sel4(lvlm_y, lvlm_y, lvle_y, lvl_y, 2),
                lvl_cb=sel4(lvlm_cb, lvlm_cb, lvle_cb, lvl_cb, 2),
                lvl_cr=sel4(lvlm_cr, lvlm_cr, lvle_cr, lvl_cr, 2),
                cbf_y=jnp.where(inter_sel, F, cbf_y),
                cbf_cb=jnp.where(inter_sel, F, cbf_cb),
                cbf_cr=jnp.where(inter_sel, F, cbf_cr),
                skip=skipf, inter=inter_sel & ~skipf, merge=is_m,
                mvd=mvd.astype(jnp.int16), mvp=mvp_e.astype(jnp.int8),
                rqt=jnp.where(is_e, rqt_e, 1).astype(jnp.int8),
                cbf_yi=jnp.where(is_e, cbfe_y, cbfm_y) & ~skipf
                & inter_sel,
                cbf_cbi=jnp.where(is_e, cbfe_cb, cbfm_cb) & ~skipf
                & inter_sel,
                cbf_cri=jnp.where(is_e, cbfe_cr, cbfm_cr) & ~skipf
                & inter_sel,
                mv=mv_f.astype(jnp.int16))
            q_mode.append(jnp.where(inter_sel, -1, mode))
            q_skip.append(skipf)
            q_inter.append(inter_sel)
            q_mv.append(mv_f)
            q_j.append(sel4(j_skip, j_m, j_e, j_i, 0))
            q_fields.append(fields)
            ctb_y = ctb_y.at[:, 16 * qy:16 * qy + 16,
                             16 * qx:16 * qx + 16].set(rec_y_f)
            ctb_cb = ctb_cb.at[:, 8 * qy:8 * qy + 8,
                               8 * qx:8 * qx + 8].set(rec_cb_f)
            ctb_cr = ctb_cr.at[:, 8 * qy:8 * qy + 8,
                               8 * qx:8 * qx + 8].set(rec_cr_f)

        j16 = sum(q_j)

        # ---- 32-level candidates ----
        if not p_mode:
            # intra32: mode by whole-32 SATD on CTB-boundary refs, then
            # the normative forced-split TU16 chain (sequential refs)
            tr32 = jax.lax.dynamic_slice(state["top_y"], (0, cclamp * 32),
                                         (B, 32))
            ref32 = _assemble_ref(
                jnp.zeros((B, 32), I32), state["left_y"], state["corner_y"],
                t_y, tr32, F, al, al & aa, aa, aar, 32, bit_depth)
            a32 = jnp.where(al, state["left_modes"][:, 0], -1)
            c0, c1, c2 = _mpm_jax(jnp.where(a32 >= 0, a32, DC), DC)
            # no DC/edge fixups at nTbS=32 (spec 8.4.4.2.6 gates on n<32)
            mode32, _, _ = _search_select(s32, ref32, 32, lam_bits,
                                          c0, c1, c2, maxv, fixups=False)
            rec32_y = jnp.zeros((B, 32, 32), I32)
            rec32_cb = jnp.zeros((B, 16, 16), I32)
            rec32_cr = jnp.zeros((B, 16, 16), I32)
            lvl32 = []
            cbf32 = []
            for q in range(4):
                qx, qy = q & 1, q >> 1
                segs_y, segs_cb, segs_cr = intra_segs(q, rec32_y, rec32_cb,
                                                      rec32_cr)
                src = s32[:, 16 * qy:16 * qy + 16, 16 * qx:16 * qx + 16]
                scb = s32cb[:, 8 * qy:8 * qy + 8, 8 * qx:8 * qx + 8]
                scr = s32cr[:, 8 * qy:8 * qy + 8, 8 * qx:8 * qx + 8]
                ref = _assemble_ref(*segs_y[:5], *segs_y[5:], 16, bit_depth)
                pred = jnp.take_along_axis(
                    _predict_all(ref, 16, maxv, fixups=True),
                    mode32[:, None, None], axis=1).reshape(B, 16, 16)
                lvl_y, cbf_y, rec_y = _tu(src, pred, qp_eff, 16,
                                          bit_depth, maxv, sdh_scan=shs0)
                refcb = _assemble_ref(*segs_cb[:5], *segs_cb[5:], 8,
                                      bit_depth)
                refcr = _assemble_ref(*segs_cr[:5], *segs_cr[5:], 8,
                                      bit_depth)
                pcb = jnp.take_along_axis(
                    _predict_all(refcb, 8, maxv, fixups=False, luma=False),
                    mode32[:, None, None], axis=1).reshape(B, 8, 8)
                pcr = jnp.take_along_axis(
                    _predict_all(refcr, 8, maxv, fixups=False, luma=False),
                    mode32[:, None, None], axis=1).reshape(B, 8, 8)
                lvl_cb, cbf_cb, rec_cb = _tu(scb, pcb, qpc, 8, bit_depth,
                                             maxv, sdh_scan=shs0)
                lvl_cr, cbf_cr, rec_cr = _tu(scr, pcr, qpc, 8, bit_depth,
                                             maxv, sdh_scan=shs0)
                rec32_y = rec32_y.at[:, 16 * qy:16 * qy + 16,
                                     16 * qx:16 * qx + 16].set(rec_y)
                rec32_cb = rec32_cb.at[:, 8 * qy:8 * qy + 8,
                                       8 * qx:8 * qx + 8].set(rec_cb)
                rec32_cr = rec32_cr.at[:, 8 * qy:8 * qy + 8,
                                       8 * qx:8 * qx + 8].set(rec_cr)
                lvl32.append((lvl_y, lvl_cb, lvl_cr))
                cbf32.append((cbf_y, cbf_cb, cbf_cr))
            bits32 = 8
            for (ly, lcb, lcr) in lvl32:
                bits32 = bits32 + _level_bits(ly) + _level_bits(lcb) \
                    + _level_bits(lcr)
            bits32 = jnp.minimum(bits32, 8192)
            j32 = _sse_j(s32, rec32_y) + _sse_j(s32cb, rec32_cb) \
                + _sse_j(s32cr, rec32_cr) + ((lam16 * bits32) >> 4)
            split = j16 < j32
            kind32 = jnp.zeros((B,), I32)       # 0 = intra32
        elif b_mode:
            # ---- 32-level B: skip32 / merge32 / L0 / L1 / BI ----
            lpf, lmv2 = state["left_pf"], state["left_mv2"]
            none3 = (jnp.zeros((B,), bool), jnp.zeros((B, 2), bool),
                     jnp.zeros((B, 2, 2), I32))
            al32_av = (state["al_pf"][:, 0] | state["al_pf"][:, 1]) \
                & al & aa
            nb32 = dict(
                a1=((lpf[:, 1, 0] | lpf[:, 1, 1]) & al, lpf[:, 1],
                    lmv2[:, 1]),
                a0=none3,
                b1=(top2[1][0] & aa, top2[1][1], top2[1][2]),
                b0=(top_b0[0] & aar, top_b0[1], top_b0[2]),
                b2=(al32_av, state["al_pf"], state["al_mv2"]))
            mg32_pf, mg32_mv2 = merge0_b(nb32)
            c0mv0_3, c1mv0_3 = amvp_b(0, nb32)
            c0mv1_3, c1mv1_3 = amvp_b(1, nb32)
            # one batched 32-CU search / merge fetch / chroma gather for
            # both lists (same stacked-pad scheme as the quadrant body)
            mv32v, m32a, m32b, val32v = _search_explicit_ref(
                jnp.concatenate([s32, s32]), pad2_py, r32, c32,
                jnp.concatenate([c0mv0_3, c0mv1_3]),
                jnp.concatenate([c1mv0_3, c1mv1_3]), sl16, bit_depth,
                subpel, maxv, n=32)
            mv_e320, mv_e321 = vs(mv32v, 0), vs(mv32v, 1)
            val_e320, val_e321 = vs(val32v, 0), vs(val32v, 1)
            mvp32_e0 = (vs(m32a, 0) > vs(m32b, 0)).astype(I32)
            mbits32_0 = jnp.minimum(vs(m32a, 0), vs(m32b, 0))
            mvp32_e1 = (vs(m32a, 1) > vs(m32b, 1)).astype(I32)
            mbits32_1 = jnp.minimum(vs(m32a, 1), vs(m32b, 1))
            pred32_l0 = _weight_uni_j(val_e320, bit_depth)
            pred32_l1 = _weight_uni_j(val_e321, bit_depth)
            pred32_bi = _weight_bi_j(val_e320, val_e321, bit_depth)
            valm32v = _merge_luma_val_ref(
                pad2_py, r32, c32,
                jnp.concatenate([mg32_mv2[:, 0], mg32_mv2[:, 1]]),
                bit_depth, subpel, n=32)
            valm32_0, valm32_1 = vs(valm32v, 0), vs(valm32v, 1)
            both32 = mg32_pf[:, 0] & mg32_pf[:, 1]
            valm32_u = jnp.where(mg32_pf[:, 0][:, None, None], valm32_0,
                                 valm32_1)
            pred_m32 = jnp.where(both32[:, None, None],
                                 _weight_bi_j(valm32_0, valm32_1,
                                              bit_depth),
                                 _weight_uni_j(valm32_u, bit_depth))

            vm32 = _chroma_val_ref(
                pad4_c, r32, c32,
                jnp.concatenate([mg32_mv2[:, 0], mg32_mv2[:, 1]] * 2),
                bit_depth, nc=16)
            pm32_cb, pm32_cr = uni_bi(vm32, mg32_pf)
            ve32 = _chroma_val_ref(
                pad4_c, r32, c32,
                jnp.concatenate([mv_e320, mv_e321] * 2), bit_depth, nc=16)
            (p0_32cb, p1_32cb, pbi_32cb), (p0_32cr, p1_32cr, pbi_32cr) = \
                uni_bi(ve32)

            (m_ry, m_rcb, m_rcr, m_lvls, m_cbfs, m_bits, m_any), \
                (e0_ry, e0_rcb, e0_rcr, e0_lvls, e0_cbfs, e0_bits,
                 e0_any), \
                (e1_ry, e1_rcb, e1_rcr, e1_lvls, e1_cbfs, e1_bits,
                 e1_any), \
                (bi_ry, bi_rcb, bi_rcr, bi_lvls, bi_cbfs, bi_bits,
                 bi_any) = tu32_v(
                    [pred_m32, pred32_l0, pred32_l1, pred32_bi],
                    [pm32_cb, p0_32cb, p1_32cb, pbi_32cb],
                    [pm32_cr, p0_32cr, p1_32cr, pbi_32cr])

            j_skip32 = _sse_j(s32, pred_m32) + _sse_j(s32cb, pm32_cb) \
                + _sse_j(s32cr, pm32_cr) + ((lam16 * 2) >> 4)
            j_m32 = jnp.where(
                m_any,
                _sse_j(s32, m_ry) + _sse_j(s32cb, m_rcb)
                + _sse_j(s32cr, m_rcr)
                + ((lam16 * jnp.minimum(12 + m_bits, 8192)) >> 4), INF32)
            j_e032 = _sse_j(s32, e0_ry) + _sse_j(s32cb, e0_rcb) \
                + _sse_j(s32cr, e0_rcr) \
                + ((lam16 * jnp.minimum(16 + mbits32_0 + e0_bits,
                                        8192)) >> 4)
            j_e132 = _sse_j(s32, e1_ry) + _sse_j(s32cb, e1_rcb) \
                + _sse_j(s32cr, e1_rcr) \
                + ((lam16 * jnp.minimum(16 + mbits32_1 + e1_bits,
                                        8192)) >> 4)
            j_bi32 = _sse_j(s32, bi_ry) + _sse_j(s32cb, bi_rcb) \
                + _sse_j(s32cr, bi_rcr) \
                + ((lam16 * jnp.minimum(
                    24 + mbits32_0 + mbits32_1 + bi_bits, 8192)) >> 4)
            kind32 = jnp.argmin(jnp.stack(
                [j_skip32, j_m32, j_e032, j_e132, j_bi32], 1),
                axis=1).astype(I32)
            j32 = jnp.minimum(jnp.minimum(j_skip32, j_m32),
                              jnp.minimum(jnp.minimum(j_e032, j_e132),
                                          j_bi32))
            split = j16 < j32

            def sel5(a_s, a_m_, a_0, a_1, a_b, nd):
                k = kind32.reshape(kind32.shape + (1,) * nd)
                return jnp.where(
                    k == 0, a_s,
                    jnp.where(k == 1, a_m_,
                              jnp.where(k == 2, a_0,
                                        jnp.where(k == 3, a_1, a_b))))

            rec32_y = sel5(pred_m32, m_ry, e0_ry, e1_ry, bi_ry, 2)
            rec32_cb = sel5(pm32_cb, m_rcb, e0_rcb, e1_rcb, bi_rcb, 2)
            rec32_cr = sel5(pm32_cr, m_rcr, e0_rcr, e1_rcr, bi_rcr, 2)
            mvp_s320 = jnp.where(mvp32_e0[:, None] == 0, c0mv0_3, c1mv0_3)
            mvd32_0 = mv_e320 - mvp_s320
            mvp_s321 = jnp.where(mvp32_e1[:, None] == 0, c0mv1_3, c1mv1_3)
            mvd32_1v = mv_e321 - mvp_s321
            dir32_e = jnp.clip(kind32 - 2, 0, 2)
            is_e32 = kind32 >= 2
            use0_32 = (kind32 == 2) | (kind32 == 4)
            use1_32 = (kind32 == 3) | (kind32 == 4)
            pf32_sel = jnp.where(is_e32[:, None],
                                 jnp.stack([use0_32, use1_32], 1), mg32_pf)
            mv32_2sel = jnp.where(is_e32[:, None, None],
                                  jnp.stack([mv_e320, mv_e321], 1),
                                  mg32_mv2)
            mv32_f = jnp.where(pf32_sel[:, 0][:, None], mv32_2sel[:, 0],
                               mv32_2sel[:, 1])
            mv32_1f = jnp.where(pf32_sel[:, 1][:, None], mv32_2sel[:, 1],
                                0)
            lvl32 = [tuple(sel5(m_lvls[q][pi], m_lvls[q][pi],
                                e0_lvls[q][pi], e1_lvls[q][pi],
                                bi_lvls[q][pi], 2) for pi in range(3))
                     for q in range(4)]
            cbf32 = [tuple(jnp.where(kind32 == 0, F,
                                     sel5(m_cbfs[q][pi], m_cbfs[q][pi],
                                          e0_cbfs[q][pi], e1_cbfs[q][pi],
                                          bi_cbfs[q][pi], 0))
                           for pi in range(3)) for q in range(4)]
            rqt32 = jnp.where(kind32 == 2, e0_any,
                              jnp.where(kind32 == 3, e1_any,
                                        bi_any)).astype(jnp.int8)
        else:
            li, lmv = state["left_inter"], state["left_mv"]
            nb32 = dict(
                a1=(li[:, 1] & al, lmv[:, 1]),
                b1=(top2[1][0] & aa, top2[1][1]),
                b0=(top_b0[0] & aar, top_b0[1]),
                b2=(state["al_inter"] & al & aa, state["al_mv"]))
            mg32 = _first_avail_mv([nb32["a1"], nb32["b1"], nb32["b0"],
                                    nb32["b2"]])
            c0mv, c1mv = _amvp_p([nb32["a1"]],
                                 [nb32["b0"], nb32["b1"], nb32["b2"]])
            mv_e32, mb0b, mb1b, val_e32 = _search_explicit_ref(
                s32, pad_py, r32, c32, c0mv, c1mv, sl16, bit_depth,
                subpel, maxv, n=32, wl=_wl)
            mvp_e32 = (mb0b > mb1b).astype(I32)
            mbits32 = jnp.minimum(mb0b, mb1b)
            pred_e32 = _wu_y(val_e32)
            valm32 = _merge_luma_val_ref(pad_py, r32, c32, mg32, bit_depth,
                                         subpel, n=32)
            pred_m32 = _wu_y(valm32)
            vc32 = _chroma_val_ref(
                pad4_c, r32, c32,
                jnp.concatenate([mg32, mg32, mv_e32, mv_e32]), bit_depth,
                nc=16)
            pm32_cb = _wu_cb(vs(vc32, 0))
            pm32_cr = _wu_cr(vs(vc32, 1))
            pe32_cb = _wu_cb(vs(vc32, 2))
            pe32_cr = _wu_cr(vs(vc32, 3))

            (m_ry, m_rcb, m_rcr, m_lvls, m_cbfs, m_bits, m_any), \
                (e_ry, e_rcb, e_rcr, e_lvls, e_cbfs, e_bits, e_any) = \
                tu32_v([pred_m32, pred_e32], [pm32_cb, pe32_cb],
                       [pm32_cr, pe32_cr])

            j_skip32 = _sse_j(s32, pred_m32) + _sse_j(s32cb, pm32_cb) \
                + _sse_j(s32cr, pm32_cr) + ((lam16 * 2) >> 4)
            j_m32 = jnp.where(
                m_any,
                _sse_j(s32, m_ry) + _sse_j(s32cb, m_rcb)
                + _sse_j(s32cr, m_rcr)
                + ((lam16 * jnp.minimum(12 + m_bits, 8192)) >> 4), INF32)
            j_e32 = _sse_j(s32, e_ry) + _sse_j(s32cb, e_rcb) \
                + _sse_j(s32cr, e_rcr) \
                + ((lam16 * jnp.minimum(16 + mbits32 + e_bits, 8192)) >> 4)
            kind32 = jnp.argmin(jnp.stack([j_skip32, j_m32, j_e32], 1),
                                axis=1).astype(I32)
            j32 = jnp.minimum(jnp.minimum(j_skip32, j_m32), j_e32)
            split = j16 < j32

            def sel3(a_s, a_m_, a_e, nd):
                k = kind32.reshape(kind32.shape + (1,) * nd)
                return jnp.where(k == 0, a_s,
                                 jnp.where(k == 1, a_m_, a_e))

            rec32_y = sel3(pred_m32, m_ry, e_ry, 2)
            rec32_cb = sel3(pm32_cb, m_rcb, e_rcb, 2)
            rec32_cr = sel3(pm32_cr, m_rcr, e_rcr, 2)
            mvp_sel32 = jnp.where(mvp_e32[:, None] == 0, c0mv, c1mv)
            mvd32 = mv_e32 - mvp_sel32
            mv32_f = jnp.where((kind32 == 2)[:, None], mv_e32, mg32)
            lvl32 = [tuple(sel3(m_lvls[q][pi], m_lvls[q][pi],
                                e_lvls[q][pi], 2) for pi in range(3))
                     for q in range(4)]
            cbf32 = [tuple(jnp.where(kind32 == 0, F,
                                     jnp.where(kind32 == 1, m_cbfs[q][pi],
                                               e_cbfs[q][pi]))
                           for pi in range(3)) for q in range(4)]
            rqt32 = (e_any).astype(jnp.int8)

        # ---- final select + state update ----
        sm = split[:, None, None]
        fin_y = jnp.where(sm, ctb_y, rec32_y)
        fin_cb = jnp.where(sm, ctb_cb, rec32_cb)
        fin_cr = jnp.where(sm, ctb_cr, rec32_cr)

        nxt = dict(state)
        nxt["corner_y"] = jax.lax.dynamic_slice(
            state["top_y"], (0, c32 * 32 + 31), (B, 1)).reshape(B)
        nxt["corner_cb"] = jax.lax.dynamic_slice(
            state["top_cb"], (0, c32 * 16 + 15), (B, 1)).reshape(B)
        nxt["corner_cr"] = jax.lax.dynamic_slice(
            state["top_cr"], (0, c32 * 16 + 15), (B, 1)).reshape(B)
        nxt["top_y"] = jax.lax.dynamic_update_slice(
            state["top_y"], fin_y[:, 31, :], (0, c32 * 32))
        nxt["top_cb"] = jax.lax.dynamic_update_slice(
            state["top_cb"], fin_cb[:, 15, :], (0, c32 * 16))
        nxt["top_cr"] = jax.lax.dynamic_update_slice(
            state["top_cr"], fin_cr[:, 15, :], (0, c32 * 16))
        nxt["left_y"] = fin_y[:, :, 31]
        nxt["left_cb"] = fin_cb[:, :, 15]
        nxt["left_cr"] = fin_cr[:, :, 15]
        if not p_mode:
            m32 = mode32
            lm = jnp.stack([jnp.where(split, q_mode[1], m32),
                            jnp.where(split, q_mode[3], m32)], 1)
        else:
            lm = jnp.stack([jnp.where(split, q_mode[1], -1),
                            jnp.where(split, q_mode[3], -1)], 1)
        nxt["left_modes"] = lm
        nxt["left_depth"] = split.astype(I32)
        nxt["top_depth"] = jax.lax.dynamic_update_slice(
            state["top_depth"],
            jnp.broadcast_to(split.astype(I32)[:, None], (B, 2)),
            (0, 2 * c32))
        if b_mode:
            cell_pf = [jnp.where(split[:, None], q_pf[q], pf32_sel)
                       for q in range(4)]
            cell_mv2 = [jnp.where(split[:, None, None], q_mv2[q],
                                  mv32_2sel) for q in range(4)]
            k1 = 2 * c32 + 1
            nxt["al_pf"] = jax.lax.dynamic_slice(
                state["top_pf"], (0, k1, 0), (B, 1, 2)).reshape(B, 2)
            nxt["al_mv2"] = jax.lax.dynamic_slice(
                state["top_mv2"], (0, k1, 0, 0),
                (B, 1, 2, 2)).reshape(B, 2, 2)
            nxt["top_pf"] = jax.lax.dynamic_update_slice(
                state["top_pf"], jnp.stack([cell_pf[2], cell_pf[3]], 1),
                (0, 2 * c32, 0))
            nxt["top_mv2"] = jax.lax.dynamic_update_slice(
                state["top_mv2"],
                jnp.stack([cell_mv2[2], cell_mv2[3]], 1),
                (0, 2 * c32, 0, 0))
            nxt["left_pf"] = jnp.stack([cell_pf[1], cell_pf[3]], 1)
            nxt["left_mv2"] = jnp.stack([cell_mv2[1], cell_mv2[3]], 1)
        elif p_mode:
            cell_inter = [jnp.where(split, q_inter[q] | q_skip[q],
                                    kind32 < 3) for q in range(4)]
            cell_mv = [jnp.where(sm[:, :, 0], q_mv[q], mv32_f)
                       for q in range(4)]
            cell_skip = [jnp.where(split, q_skip[q],
                                   kind32 == 0).astype(I32)
                         for q in range(4)]
            # lag register: the next CTB's above-left cell record
            k1 = 2 * c32 + 1
            nxt["al_inter"] = jax.lax.dynamic_slice(
                state["top_inter"], (0, k1), (B, 1)).reshape(B)
            nxt["al_mv"] = jax.lax.dynamic_slice(
                state["top_mv"], (0, k1, 0), (B, 1, 2)).reshape(B, 2)
            nxt["top_inter"] = jax.lax.dynamic_update_slice(
                state["top_inter"],
                jnp.stack([cell_inter[2], cell_inter[3]], 1), (0, 2 * c32))
            nxt["top_mv"] = jax.lax.dynamic_update_slice(
                state["top_mv"], jnp.stack([cell_mv[2], cell_mv[3]], 1),
                (0, 2 * c32, 0))
            nxt["left_inter"] = jnp.stack([cell_inter[1], cell_inter[3]], 1)
            nxt["left_mv"] = jnp.stack([cell_mv[1], cell_mv[3]], 1)
            nxt["top_skip"] = jax.lax.dynamic_update_slice(
                state["top_skip"],
                jnp.stack([cell_skip[2], cell_skip[3]], 1), (0, 2 * c32))
            nxt["left_skip"] = jnp.stack([cell_skip[1], cell_skip[3]], 1)

        # ---- per-step outputs ----
        rdt = jnp.uint8 if bit_depth == 8 else jnp.uint16
        cells = []
        for q in range(4):
            qx, qy = q & 1, q >> 1
            f = q_fields[q]
            lvl_y_c = jnp.where(sm, f["lvl_y"], lvl32[q][0])
            lvl_cb_c = jnp.where(sm, f["lvl_cb"], lvl32[q][1])
            lvl_cr_c = jnp.where(sm, f["lvl_cr"], lvl32[q][2])
            cbf_y_c = jnp.where(split, f["cbf_y"], cbf32[q][0])
            cbf_cb_c = jnp.where(split, f["cbf_cb"], cbf32[q][1])
            cbf_cr_c = jnp.where(split, f["cbf_cr"], cbf32[q][2])
            cell = dict(
                mode=jnp.where(split, f["mode"],
                               -1 if p_mode else mode32).astype(jnp.int8),
                cbf_y=cbf_y_c, cbf_cb=cbf_cb_c, cbf_cr=cbf_cr_c,
                lvl_y=lvl_y_c.astype(jnp.int16),
                lvl_cb=lvl_cb_c.astype(jnp.int16),
                lvl_cr=lvl_cr_c.astype(jnp.int16),
                rec_y=fin_y[:, 16 * qy:16 * qy + 16,
                            16 * qx:16 * qx + 16].astype(rdt),
                rec_cb=fin_cb[:, 8 * qy:8 * qy + 8,
                              8 * qx:8 * qx + 8].astype(rdt),
                rec_cr=fin_cr[:, 8 * qy:8 * qy + 8,
                              8 * qx:8 * qx + 8].astype(rdt),
            )
            if b_mode:
                cell.update(
                    skip=jnp.where(split, f["skip"], kind32 == 0),
                    inter=jnp.where(split, f["inter"], kind32 > 0),
                    merge=jnp.where(split, f["merge"], kind32 == 1),
                    mvd=jnp.where(sm[:, :, 0], f["mvd"],
                                  mvd32_0).astype(jnp.int16),
                    mvp=jnp.where(split, f["mvp"],
                                  mvp32_e0.astype(jnp.int8)),
                    mvd1=jnp.where(sm[:, :, 0], f["mvd1"],
                                   mvd32_1v).astype(jnp.int16),
                    mvp1=jnp.where(split, f["mvp1"],
                                   mvp32_e1.astype(jnp.int8)),
                    dir=jnp.where(split, f["dir"],
                                  dir32_e.astype(jnp.int8)),
                    rqt=jnp.where(split, f["rqt"],
                                  jnp.where(kind32 == 1, 1,
                                            rqt32)).astype(jnp.int8),
                    cbf_yi=jnp.where(split, f["cbf_yi"], cbf32[q][0]),
                    cbf_cbi=jnp.where(split, f["cbf_cbi"], cbf32[q][1]),
                    cbf_cri=jnp.where(split, f["cbf_cri"], cbf32[q][2]),
                    mv=jnp.where(sm[:, :, 0], f["mv"],
                                 mv32_f).astype(jnp.int16),
                    mv1=jnp.where(sm[:, :, 0], f["mv1"],
                                  mv32_1f).astype(jnp.int16),
                    pf=jnp.where(sm[:, :, 0], f["pf"], pf32_sel),
                    intra_cell=split & ~(f["inter"] | f["skip"]),
                )
            elif p_mode:
                cell.update(
                    skip=jnp.where(split, f["skip"], kind32 == 0),
                    inter=jnp.where(split, f["inter"], kind32 > 0),
                    merge=jnp.where(split, f["merge"], kind32 == 1),
                    mvd=jnp.where(sm[:, :, 0], f["mvd"],
                                  mvd32).astype(jnp.int16),
                    mvp=jnp.where(split, f["mvp"],
                                  mvp_e32.astype(jnp.int8)),
                    rqt=jnp.where(split, f["rqt"],
                                  jnp.where(kind32 == 1, 1,
                                            rqt32)).astype(jnp.int8),
                    cbf_yi=jnp.where(split, f["cbf_yi"], cbf32[q][0]),
                    cbf_cbi=jnp.where(split, f["cbf_cbi"], cbf32[q][1]),
                    cbf_cri=jnp.where(split, f["cbf_cri"], cbf32[q][2]),
                    mv=jnp.where(sm[:, :, 0], f["mv"],
                                 mv32_f).astype(jnp.int16),
                    intra_cell=split & ~(f["inter"] | f["skip"]),
                )
            else:
                cell["intra_cell"] = jnp.ones((B,), bool)
            cells.append(cell)

        out32 = dict(split32=split)
        if b_mode:
            out32.update(skip32=~split & (kind32 == 0),
                         inter32=~split & (kind32 > 0),
                         merge32=~split & (kind32 == 1),
                         mvd32=mvd32_0.astype(jnp.int16),
                         mvp32=mvp32_e0.astype(jnp.int8),
                         mvd32_1=mvd32_1v.astype(jnp.int16),
                         mvp32_1=mvp32_e1.astype(jnp.int8),
                         dir32=dir32_e.astype(jnp.int8),
                         rqt32=rqt32,
                         cbf32_cb=(cbf32[0][1] | cbf32[1][1] | cbf32[2][1]
                                   | cbf32[3][1]),
                         cbf32_cr=(cbf32[0][2] | cbf32[1][2] | cbf32[2][2]
                                   | cbf32[3][2]))
        elif p_mode:
            out32.update(skip32=~split & (kind32 == 0),
                         inter32=~split & (kind32 > 0),
                         merge32=~split & (kind32 == 1),
                         mvd32=mvd32.astype(jnp.int16),
                         mvp32=mvp_e32.astype(jnp.int8),
                         rqt32=rqt32,
                         cbf32_cb=(cbf32[0][1] | cbf32[1][1] | cbf32[2][1]
                                   | cbf32[3][1]),
                         cbf32_cr=(cbf32[0][2] | cbf32[1][2] | cbf32[2][2]
                                   | cbf32[3][2]))
        else:
            out32.update(mode32=mode32.astype(jnp.int8),
                         cbf32_cb=(cbf32[0][1] | cbf32[1][1] | cbf32[2][1]
                                   | cbf32[3][1]),
                         cbf32_cr=(cbf32[0][2] | cbf32[1][2] | cbf32[2][2]
                                   | cbf32[3][2]))

        out_cells = {k: jnp.stack([c[k] for c in cells], 0)
                     for k in cells[0]}
        return nxt, (out_cells, out32)

    _, outs = jax.lax.scan(step, state, jnp.arange(tnh32 * tnw32, dtype=I32))
    return outs


def z_to_raster(a, tnh32, tnw32):
    """(S32, 4, B, ...) z-ordered cell stack -> (nh16, nw16, B, ...)."""
    a = np.asarray(a)
    x = a.reshape((tnh32, tnw32, 2, 2) + a.shape[2:])
    x = np.swapaxes(x, 1, 2)               # (tnh32, 2, tnw32, 2, ...)
    return x.reshape((2 * tnh32, 2 * tnw32) + a.shape[2:])


def zr_j(a, tnh32, tnw32):
    """Device z->raster: (S32, 4, B, ...) -> (S16, B, ...) 16-raster."""
    x = a.reshape((tnh32, tnw32, 2, 2) + a.shape[2:])
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape((4 * tnh32 * tnw32,) + a.shape[2:])
