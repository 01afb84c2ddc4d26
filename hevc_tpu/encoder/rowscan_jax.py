"""Row-scan tiled intra encoder — the TPU fast path.

Key insight vs the wavefront formulation (frame_jax): with HEVC tiles, every
tile is an independent mini-frame and all tiles share the SAME CTU schedule.
Scanning CTUs in raster order *within* the tile and batching over
(frames x tiles) means every step touches the same (row, col) in every lane:

  * all state reads/writes are dynamic slices at SCALAR indices (no gathers,
    no scatters -- the ops that crippled the vmapped wavefront on TPU)
  * the 35-mode intra search is one (B, 65) @ (65, 35*256) MXU matmul
  * carried state is one CTU row of bottom edges + one left column per lane

Step count = CTUs per tile (64-80 with production tile grids), independent of
resolution; per-step batch = frames x tiles (hundreds to thousands of CTUs).

Decisions replicate encoder.reference_encoder / frame_jax bit-exactly.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from hevc_tpu.ops import jax_ops as J
from hevc_tpu.ops import reference as R
from hevc_tpu.ops.intra_matrices import intra_weights, use_filtered_mask

I32 = jnp.int32
CTB = 16
NC = 8

_CQP = np.array([R.chroma_qp(q) for q in range(58)], dtype=np.int32)


@lru_cache(maxsize=None)
def _fused_luma_weights():
    """(Wcat (65, 35*256) f32 ordered raw-then-filt, perm (35,), shifts)."""
    w, shifts = intra_weights(CTB)              # (35, 256, 65)
    filt = use_filtered_mask(CTB)
    raw_ids = [m for m in range(35) if not filt[m]]
    filt_ids = [m for m in range(35) if filt[m]]
    order = raw_ids + filt_ids
    wcat = np.concatenate([w[order]], axis=0)   # (35, 256, 65)
    wmat = wcat.reshape(35 * 256, 65).T.astype(np.float32)  # (65, 35*256)
    perm = np.argsort(np.array(order))          # ordered -> mode index
    return wmat, np.array(order), perm, shifts, len(raw_ids)


@lru_cache(maxsize=None)
def _chroma_weights():
    w, shifts = intra_weights(NC)               # (35, 64, 33)
    return (w.reshape(35 * 64, 33).T.astype(np.float32), shifts)


def _predict_luma_all(ref_raw, ref_filt):
    """-> (B, 35, 256) int32 predictions in mode order (pre-fixup)."""
    wmat, order, perm, shifts, n_raw = _fused_luma_weights()
    wm = jnp.asarray(wmat)
    B = ref_raw.shape[0]
    # rows of wm beyond n_raw*256 belong to filtered modes
    p_raw = J.exact_matmul_small(ref_raw.astype(jnp.float32),
                                 wm[:, :n_raw * 256])
    p_filt = J.exact_matmul_small(ref_filt.astype(jnp.float32),
                                  wm[:, n_raw * 256:])
    p = jnp.concatenate([p_raw, p_filt], axis=1).astype(I32)
    p = p.reshape(B, 35, 256)[:, jnp.asarray(perm)]
    sh = jnp.asarray(shifts)[None, :, None]
    return jnp.right_shift(p + (1 << (sh - 1)), sh)


def _luma_fixups(preds, ref, maxv):
    from hevc_tpu.encoder.frame_jax import _luma_fixups as fx
    return fx(preds, ref, CTB, maxv)


def _build_ref(left, top, topright, corner, al, aa, aar, ac, n,
               bit_depth=8):
    """Scalar availability flags (shared across batch); returns (B, 4n+1)."""
    B = left.shape[0]
    n2 = 2 * n
    vals = jnp.concatenate([
        jnp.zeros((B, n), I32),
        left[:, ::-1],
        corner[:, None],
        top,
        topright,
    ], axis=-1)
    def bb(flag, k):
        return jnp.broadcast_to(flag, (B, k))
    avail = jnp.concatenate([
        jnp.zeros((B, n), bool),
        bb(al, n), bb(ac, 1), bb(aa, n), bb(aar, n)], axis=-1)
    return J.substitute_refs(vals, avail, bit_depth)


@partial(jax.jit, static_argnames=("tnh", "tnw", "bit_depth"))
def encode_tiles_rowscan_jit(src_y, src_cb, src_cr, qp, lam_bits, tnh, tnw,
                             bit_depth=8):
    """src_y: (B, tnh, tnw, 16, 16) int32; returns step-major outputs.

    Output arrays have shape (steps=tnh*tnw, B, ...) in raster order.
    """
    B = src_y.shape[0]
    maxv = (1 << bit_depth) - 1
    qp_bd = 6 * (bit_depth - 8)          # QpBdOffset (spec 8.6.3: Qp' = Qp + off)
    qp_eff = qp + qp_bd
    qpc = jnp.asarray(_CQP)[jnp.clip(qp, 0, 57)] + qp_bd
    wc, sh8 = _chroma_weights()
    wc = jnp.asarray(wc)
    sh8 = jnp.asarray(sh8)

    src_y_rows = src_y.transpose(1, 0, 2, 3, 4).reshape(
        tnh, B, tnw, CTB, CTB)
    src_cb_rows = src_cb.transpose(1, 0, 2, 3, 4).reshape(tnh, B, tnw, NC, NC)
    src_cr_rows = src_cr.transpose(1, 0, 2, 3, 4).reshape(tnh, B, tnw, NC, NC)

    state = dict(
        top_y=jnp.zeros((B, tnw * CTB), I32),
        top_cb=jnp.zeros((B, tnw * NC), I32),
        top_cr=jnp.zeros((B, tnw * NC), I32),
        left_y=jnp.zeros((B, CTB), I32),
        left_cb=jnp.zeros((B, NC), I32),
        left_cr=jnp.zeros((B, NC), I32),
        corner_y=jnp.zeros((B,), I32),
        corner_cb=jnp.zeros((B,), I32),
        corner_cr=jnp.zeros((B,), I32),
        left_mode=jnp.full((B,), 1, I32),
    )

    def step(state, d):
        r = d // tnw
        c = d % tnw
        al = c > 0
        aa = r > 0
        aar = aa & (c < tnw - 1)
        ac = al & aa

        src = jax.lax.dynamic_slice(
            src_y_rows, (r, 0, c, 0, 0), (1, B, 1, CTB, CTB)
        ).reshape(B, CTB, CTB)
        top = jax.lax.dynamic_slice(state["top_y"], (0, c * CTB), (B, CTB))
        cclamp = jnp.minimum(c + 1, tnw - 1)
        tr = jax.lax.dynamic_slice(state["top_y"], (0, cclamp * CTB), (B, CTB))
        ref_raw = _build_ref(state["left_y"], top, tr, state["corner_y"],
                             al, aa, aar, ac, CTB, bit_depth)
        ref_filt = J.filter_refs(ref_raw)
        preds = _predict_luma_all(ref_raw, ref_filt)
        preds = _luma_fixups(preds, ref_raw, maxv)

        diff = src.reshape(B, 1, CTB, CTB) - preds.reshape(B, 35, CTB, CTB)
        costs = J.satd(diff, CTB)
        cand_a = jnp.where(al, state["left_mode"], 1)
        c0 = jnp.where(cand_a < 2, 0, cand_a)
        c2 = jnp.where(cand_a < 2, 26, 0)
        m_ids = jnp.arange(35, dtype=I32)[None, :]
        bits = jnp.where(m_ids == c0[:, None], lam_bits[0],
                         jnp.where((m_ids == 1) | (m_ids == c2[:, None]),
                                   lam_bits[1], lam_bits[2]))
        mode = jnp.argmin(costs + bits, axis=1).astype(I32)
        pred = jnp.take_along_axis(
            preds, mode[:, None, None], axis=1).reshape(B, CTB, CTB)

        resi = src - pred
        lvl = J.quantize(J.forward_transform(resi, CTB, bit_depth=bit_depth),
                         qp_eff, CTB, bit_depth)
        cbf_y = jnp.any(lvl != 0, axis=(-2, -1))
        rin = J.inverse_transform(J.dequantize(lvl, qp_eff, CTB, bit_depth),
                                  CTB, bit_depth=bit_depth)
        rec = jnp.where(cbf_y[:, None, None], jnp.clip(pred + rin, 0, maxv),
                        pred)

        # chroma: all-mode matmul then select DM mode
        outs_c = []
        for (rows, tkey, lkey, ckey) in ((src_cb_rows, "top_cb", "left_cb",
                                          "corner_cb"),
                                         (src_cr_rows, "top_cr", "left_cr",
                                          "corner_cr")):
            sc = jax.lax.dynamic_slice(rows, (r, 0, c, 0, 0),
                                       (1, B, 1, NC, NC)).reshape(B, NC, NC)
            topc = jax.lax.dynamic_slice(state[tkey], (0, c * NC), (B, NC))
            trc = jax.lax.dynamic_slice(state[tkey], (0, cclamp * NC), (B, NC))
            refc = _build_ref(state[lkey], topc, trc, state[ckey],
                              al, aa, aar, ac, NC, bit_depth)
            pall = J.exact_matmul_small(refc.astype(jnp.float32), wc)
            pall = pall.astype(I32).reshape(B, 35, NC * NC)
            shm = sh8[None, :, None]
            pall = jnp.right_shift(pall + (1 << (shm - 1)), shm)
            pc = jnp.take_along_axis(pall, mode[:, None, None],
                                     axis=1).reshape(B, NC, NC)
            lvlc = J.quantize(J.forward_transform(sc - pc, NC,
                                                  bit_depth=bit_depth),
                              qpc, NC, bit_depth)
            cbfc = jnp.any(lvlc != 0, axis=(-2, -1))
            rinc = J.inverse_transform(J.dequantize(lvlc, qpc, NC, bit_depth),
                                       NC, bit_depth=bit_depth)
            recc = jnp.where(cbfc[:, None, None],
                             jnp.clip(pc + rinc, 0, maxv), pc)
            outs_c.append((lvlc, cbfc, recc))
        (lvl_cb, cbf_cb, rec_cb), (lvl_cr, cbf_cr, rec_cr) = outs_c

        # state updates: save next corners BEFORE overwriting the top edges
        nxt = dict(state)
        nxt["corner_y"] = jax.lax.dynamic_slice(
            state["top_y"], (0, c * CTB + CTB - 1), (B, 1)).reshape(B)
        nxt["corner_cb"] = jax.lax.dynamic_slice(
            state["top_cb"], (0, c * NC + NC - 1), (B, 1)).reshape(B)
        nxt["corner_cr"] = jax.lax.dynamic_slice(
            state["top_cr"], (0, c * NC + NC - 1), (B, 1)).reshape(B)
        nxt["top_y"] = jax.lax.dynamic_update_slice(
            state["top_y"], rec[:, CTB - 1, :], (0, c * CTB))
        nxt["top_cb"] = jax.lax.dynamic_update_slice(
            state["top_cb"], rec_cb[:, NC - 1, :], (0, c * NC))
        nxt["top_cr"] = jax.lax.dynamic_update_slice(
            state["top_cr"], rec_cr[:, NC - 1, :], (0, c * NC))
        nxt["left_y"] = rec[:, :, CTB - 1]
        nxt["left_cb"] = rec_cb[:, :, NC - 1]
        nxt["left_cr"] = rec_cr[:, :, NC - 1]
        nxt["left_mode"] = mode

        rdt = jnp.uint8 if bit_depth == 8 else jnp.uint16
        out = (mode.astype(jnp.int8),
               cbf_y, cbf_cb, cbf_cr,
               lvl.astype(jnp.int16), lvl_cb.astype(jnp.int16),
               lvl_cr.astype(jnp.int16),
               rec.astype(rdt), rec_cb.astype(rdt), rec_cr.astype(rdt))
        return nxt, out

    _, outs = jax.lax.scan(step, state, jnp.arange(tnh * tnw, dtype=I32))
    return outs


class RowScanEncoder:
    """Host wrapper over the row-scan tiled encode graph."""

    def __init__(self, qp: int, bit_depth: int = 8):
        self.qp = qp
        self.bit_depth = bit_depth
        qp_eff = qp + 6 * (bit_depth - 8)    # lambda follows Qp'
        lam = 0.85 * 2.0 ** ((qp_eff - 12) / 3.0)
        sl = float(np.sqrt(lam))
        self.lam_bits = jnp.asarray([int(sl * b) for b in (2, 3, 6)],
                                    dtype=np.int32)

    def encode_frames_tiled(self, frames: list, tile_cols: int,
                            tile_rows: int, want_recon: bool = True
                            ) -> list[dict]:
        from hevc_tpu.encoder.frame_jax import JaxIntraEncoder
        F = len(frames)
        blocks = [JaxIntraEncoder._to_blocks(*f) for f in frames]
        nh, nw, H, W = blocks[0][3:]
        assert nh % tile_rows == 0 and nw % tile_cols == 0
        tnh, tnw = nh // tile_rows, nw // tile_cols
        T = tile_cols * tile_rows

        def tile_split(b, bs):
            return (b.reshape(tile_rows, tnh, tile_cols, tnw, bs, bs)
                     .swapaxes(1, 2).reshape(T, tnh, tnw, bs, bs))

        yb = jnp.asarray(np.concatenate([tile_split(b[0], CTB) for b in blocks]))
        cbb = jnp.asarray(np.concatenate([tile_split(b[1], NC) for b in blocks]))
        crb = jnp.asarray(np.concatenate([tile_split(b[2], NC) for b in blocks]))
        outs = encode_tiles_rowscan_jit(yb, cbb, crb, jnp.asarray(self.qp),
                                        self.lam_bits, tnh, tnw,
                                        self.bit_depth)
        outs = [np.asarray(o) for o in outs]

        def unstep(a, to=None):
            # (steps=tnh*tnw, B=F*T, ...) -> (F, T, nh, nw, ...) frame-major
            s = a.shape
            x = np.moveaxis(a.reshape(tnh, tnw, F, T, *s[2:]), (2, 3), (0, 1))
            # (F, T, tnh, tnw, ...) -> (F, tile_rows, tile_cols, tnh, tnw, ..)
            x = x.reshape(F, tile_rows, tile_cols, tnh, tnw, *s[2:])
            x = x.swapaxes(2, 3).reshape(F, nh, nw, *s[2:])
            return x.astype(to) if to is not None else x

        (mode, cbf_y, cbf_cb, cbf_cr, lvl, lvl_cb, lvl_cr,
         rec, rec_cb, rec_cr) = outs
        modes = unstep(mode, np.int32)
        results = []
        full = {
            "modes": modes,
            "cbf_y": unstep(cbf_y), "cbf_cb": unstep(cbf_cb),
            "cbf_cr": unstep(cbf_cr),
            "lvl_y": unstep(lvl, np.int32), "lvl_cb": unstep(lvl_cb, np.int32),
            "lvl_cr": unstep(lvl_cr, np.int32),
        }
        if want_recon:
            ry = unstep(rec, np.int32)      # (F, nh, nw, 16, 16)
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
