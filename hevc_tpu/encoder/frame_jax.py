"""TPU-native intra frame encoder: wavefront scan over the CTU grid.

Replaces the reference's ffmpeg/libx265 subprocess encode (reference
core/transcoder.py:497-535) with an in-framework jit-compiled encode graph.

Design (idiomatic XLA, see SURVEY.md section 7):
  * The intra reconstruction dependency (left / above / above-right
    reconstructed neighbors) is honored with a slope-2 wavefront
    d = cx + 2*cy: every dependency of a CTU on diagonal d lives on d-1/d-2.
    lax.scan over diagonals, vmap over the CTUs of a diagonal.
  * Carried state is only CTU *edges* (bottom rows / right columns) plus the
    intra-mode map -- O(W) not O(W*H) per row of state touched per step.
  * All 35 intra predictions are one batched matmul against constant weight
    matrices (ops.intra_matrices); SATD mode decision is batched Hadamard
    matmuls; transforms are exact hi/lo-split matmuls (ops.jax_ops).
  * Static shapes throughout; per-(resolution, qp-independent) compilation.

v0 encode profile: CTB = CU = TU = 16 luma / 8 chroma, PART_2Nx2N,
35-mode search. Decisions replicate encoder.reference_encoder bit-exactly.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from hevc_tpu.ops import jax_ops as J
from hevc_tpu.ops import reference as R
from hevc_tpu.ops.intra_matrices import intra_weights, use_filtered_mask

I32 = jnp.int32

CTB = 16
NC = 8          # chroma block size

# chroma QP mapping table (reference.chroma_qp) as a dense lookup
_CQP = np.array([R.chroma_qp(q) for q in range(58)], dtype=np.int32)


def _mode_constants():
    w16, sh16 = intra_weights(16)
    w8, sh8 = intra_weights(8)
    filt16 = use_filtered_mask(16)
    return (jnp.asarray(w16.astype(np.float32)), jnp.asarray(sh16),
            jnp.asarray(w8.astype(np.float32)), jnp.asarray(sh8),
            jnp.asarray(filt16))


def _build_ref_vec(left, top, topright, corner, al, aa, aar, ac, n):
    """Assemble + substitute the (..., 4n+1) reference vector.

    left: (..., n) p[-1][0..n-1] top-down; top: (..., n); topright: (..., n);
    corner: (...,); a*: availability booleans (...,).
    """
    B = left.shape[:-1]
    zeros_n = jnp.zeros(B + (n,), I32)
    vals = jnp.concatenate([
        zeros_n,                        # below-left: never available
        left[..., ::-1],                # ref[n..2n-1] = p[-1][n-1..0]
        corner[..., None],
        top,
        topright,
    ], axis=-1)
    f = jnp.zeros(B + (n,), bool)
    t = jnp.ones((n,), bool)
    avail = jnp.concatenate([
        f,
        jnp.broadcast_to(al[..., None], B + (n,)),
        ac[..., None],
        jnp.broadcast_to(aa[..., None], B + (n,)),
        jnp.broadcast_to(aar[..., None], B + (n,)),
    ], axis=-1)
    return J.substitute_refs(vals, avail)


def _predict_all_modes(ref, w, shifts, filt_mask):
    """ref (B, 4n+1) -> (B, 35, n*n) predictions (pre-fixup)."""
    ref_f = J.filter_refs(ref)
    refs = jnp.where(filt_mask[None, :, None], ref_f[:, None, :],
                     ref[:, None, :])                       # (B, 35, 4n+1)
    p = jnp.einsum("bmr,mpr->bmp", refs.astype(jnp.float32), w,
                   precision=J.EXACT).astype(I32)
    half = (1 << (shifts - 1))[None, :, None]
    return jnp.right_shift(p + half, shifts[None, :, None])


def _luma_fixups(preds, ref, n, maxv=255):
    """DC boundary smoothing (mode 1) + edge filters (modes 10/26), luma n<32."""
    B = preds.shape[0]
    n2 = 2 * n
    left = ref[:, n2 - 1:n - 1:-1]      # p[-1][0..n-1]
    corner = ref[:, n2]
    top = ref[:, n2 + 1:n2 + 1 + n]
    p = preds.reshape(B, 35, n, n)

    dc = p[:, 1, n - 1, n - 1]          # base DC value (safe: unfixed corner)
    row = (top + 3 * dc[:, None] + 2) >> 2
    col = (left + 3 * dc[:, None] + 2) >> 2
    cor = (left[:, 0] + 2 * dc + top[:, 0] + 2) >> 2
    p = p.at[:, 1, 0, :].set(row)
    p = p.at[:, 1, :, 0].set(col)
    p = p.at[:, 1, 0, 0].set(cor)

    # mode 26 (vertical): first column adjust
    col26 = jnp.clip(top[:, 0:1] + ((left - corner[:, None]) >> 1), 0, maxv)
    p = p.at[:, 26, :, 0].set(col26)
    # mode 10 (horizontal): first row adjust
    row10 = jnp.clip(left[:, 0:1] + ((top - corner[:, None]) >> 1), 0, maxv)
    p = p.at[:, 10, 0, :].set(row10)
    return p.reshape(B, 35, n * n)


@partial(jax.jit, static_argnames=("nh", "nw"))
def encode_frame_jit(src_y, src_cb, src_cr, qp, lam_bits, nh, nw):
    """Encode one intra frame.

    src_y: (nh, nw, 16, 16) int32 blocks; src_cb/cr: (nh, nw, 8, 8).
    qp: () int32; lam_bits: (3,) int32 = int(sqrt_lambda * [2, 3, 6]).
    Returns stacked per-wavefront outputs + validity/positions.
    """
    w16, sh16, w8, sh8, filt16 = _mode_constants()
    cqp = jnp.asarray(_CQP)
    qpc = cqp[jnp.clip(qp, 0, 57)]

    maxw = min(nh, (nw + 1) // 2)
    n_steps = nw + 2 * nh - 2

    # edge states padded with a dump row/col for masked scatters
    bot_y = jnp.zeros((nh + 1, nw + 1, CTB), I32)
    right_y = jnp.zeros((nh + 1, nw + 1, CTB), I32)
    bot_cb = jnp.zeros((nh + 1, nw + 1, NC), I32)
    right_cb = jnp.zeros((nh + 1, nw + 1, NC), I32)
    bot_cr = jnp.zeros((nh + 1, nw + 1, NC), I32)
    right_cr = jnp.zeros((nh + 1, nw + 1, NC), I32)
    modes_st = jnp.full((nh + 1, nw + 1), 1, I32)   # INTRA_DC default

    def step(state, d):
        (bot_y, right_y, bot_cb, right_cb, bot_cr, right_cr, modes_st) = state
        cy_min = jnp.maximum(0, (d - nw + 2) // 2)
        cys = cy_min + jnp.arange(maxw, dtype=I32)
        cxs = d - 2 * cys
        valid = (cys < nh) & (cxs >= 0) & (cxs < nw)
        cyc = jnp.clip(cys, 0, nh - 1)
        cxc = jnp.clip(cxs, 0, nw - 1)

        al = cxs > 0
        aa = cys > 0
        aar = aa & (cxs + 1 < nw)
        ac = al & aa

        # ---- luma ----
        src = src_y[cyc, cxc]                                  # (B,16,16)
        top = bot_y[cyc - 1, cxc]
        topright = bot_y[cyc - 1, cxc + 1]
        corner = bot_y[cyc - 1, cxc - 1, CTB - 1]
        left = right_y[cyc, cxc - 1]
        ref = _build_ref_vec(left, top, topright, corner, al, aa, aar, ac, CTB)
        preds = _predict_all_modes(ref, w16, sh16, filt16)
        preds = _luma_fixups(preds, ref, CTB)

        diff = src.reshape(-1, 1, CTB, CTB) - preds.reshape(-1, 35, CTB, CTB)
        costs = J.satd(diff, CTB)                              # (B,35)
        cand_a = jnp.where(al, modes_st[cyc, cxc - 1], 1)
        c0 = jnp.where(cand_a < 2, 0, cand_a)
        c2 = jnp.where(cand_a < 2, 26, 0)
        m_ids = jnp.arange(35, dtype=I32)[None, :]
        bits = jnp.where(m_ids == c0[:, None], lam_bits[0],
                         jnp.where((m_ids == 1) | (m_ids == c2[:, None]),
                                   lam_bits[1], lam_bits[2]))
        total = costs + bits
        mode = jnp.argmin(total, axis=1).astype(I32)

        bidx = jnp.arange(preds.shape[0])
        pred = preds[bidx, mode].reshape(-1, CTB, CTB)
        resi = src - pred
        coef = J.forward_transform(resi, CTB)
        lvl = J.quantize(coef, qp, CTB)
        cbf_y = jnp.any(lvl != 0, axis=(-2, -1))
        rin = J.inverse_transform(J.dequantize(lvl, qp, CTB), CTB)
        rec = jnp.where(cbf_y[:, None, None],
                        jnp.clip(pred + rin, 0, 255), pred)

        # ---- chroma (derived mode) ----
        w8m = w8[mode]                                         # (B,64,33)
        sh8m = sh8[mode]
        outs_c = []
        for (srcp, botp, rightp) in ((src_cb, bot_cb, right_cb),
                                     (src_cr, bot_cr, right_cr)):
            sc = srcp[cyc, cxc]
            topc = botp[cyc - 1, cxc]
            trc = botp[cyc - 1, cxc + 1]
            corc = botp[cyc - 1, cxc - 1, NC - 1]
            lfc = rightp[cyc, cxc - 1]
            refc = _build_ref_vec(lfc, topc, trc, corc, al, aa, aar, ac, NC)
            pc = jnp.einsum("br,bpr->bp", refc.astype(jnp.float32), w8m,
                            precision=J.EXACT).astype(I32)
            pc = jnp.right_shift(pc + (1 << (sh8m[:, None] - 1)),
                                 sh8m[:, None]).reshape(-1, NC, NC)
            resc = sc - pc
            coefc = J.forward_transform(resc, NC)
            lvlc = J.quantize(coefc, qpc, NC)
            cbfc = jnp.any(lvlc != 0, axis=(-2, -1))
            rinc = J.inverse_transform(J.dequantize(lvlc, qpc, NC), NC)
            recc = jnp.where(cbfc[:, None, None],
                             jnp.clip(pc + rinc, 0, 255), pc)
            outs_c.append((lvlc, cbfc, recc))
        (lvl_cb, cbf_cb, rec_cb), (lvl_cr, cbf_cr, rec_cr) = outs_c

        # ---- scatter state updates (invalid lanes -> dump row/col) ----
        sy = jnp.where(valid, cyc, nh)
        sx = jnp.where(valid, cxc, nw)
        bot_y = bot_y.at[sy, sx].set(rec[:, CTB - 1, :])
        right_y = right_y.at[sy, sx].set(rec[:, :, CTB - 1])
        bot_cb = bot_cb.at[sy, sx].set(rec_cb[:, NC - 1, :])
        right_cb = right_cb.at[sy, sx].set(rec_cb[:, :, NC - 1])
        bot_cr = bot_cr.at[sy, sx].set(rec_cr[:, NC - 1, :])
        right_cr = right_cr.at[sy, sx].set(rec_cr[:, :, NC - 1])
        modes_st = modes_st.at[sy, sx].set(mode)

        out = (mode, cbf_y, cbf_cb, cbf_cr, lvl, lvl_cb, lvl_cr,
               rec, rec_cb, rec_cr, cys, cxs, valid)
        return (bot_y, right_y, bot_cb, right_cb, bot_cr, right_cr,
                modes_st), out

    state = (bot_y, right_y, bot_cb, right_cb, bot_cr, right_cr, modes_st)
    _, outs = jax.lax.scan(step, state, jnp.arange(n_steps, dtype=I32))
    return outs


@partial(jax.jit, static_argnames=("nh", "nw"))
def encode_frames_batch_jit(src_y, src_cb, src_cr, qp, lam_bits, nh, nw):
    """Batched variant: leading frame axis F on all srcs (frames independent
    in all-intra coding -> vmap multiplies per-wavefront-step work by F,
    which is the main TPU utilization lever)."""
    f = jax.vmap(lambda y, cb, cr: encode_frame_jit.__wrapped__(
        y, cb, cr, qp, lam_bits, nh, nw))
    return f(src_y, src_cb, src_cr)


class JaxIntraEncoder:
    """Host wrapper: frame planes in, per-CTU decisions + recon out."""

    def __init__(self, qp: int, bit_depth: int = 8):
        self.qp = qp
        lam = 0.85 * 2.0 ** ((qp - 12) / 3.0)
        sl = float(np.sqrt(lam))
        self.lam_bits = jnp.asarray([int(sl * b) for b in (2, 3, 6)],
                                    dtype=np.int32)

    @staticmethod
    def _to_blocks(y, cb, cr):
        from hevc_tpu.encoder.reference_encoder import pad_to_ctb
        ys = pad_to_ctb(np.asarray(y), CTB)
        cbs = pad_to_ctb(np.asarray(cb), NC)
        crs = pad_to_ctb(np.asarray(cr), NC)
        H, W = ys.shape
        nh, nw = H // CTB, W // CTB
        yb = ys.reshape(nh, CTB, nw, CTB).swapaxes(1, 2)
        cbb = cbs.reshape(nh, NC, nw, NC).swapaxes(1, 2)
        crb = crs.reshape(nh, NC, nw, NC).swapaxes(1, 2)
        return yb, cbb, crb, nh, nw, H, W

    def _unpack(self, outs, nh, nw, H, W):
        (mode, cbf_y, cbf_cb, cbf_cr, lvl, lvl_cb, lvl_cr,
         rec, rec_cb, rec_cr, cys, cxs, valid) = [np.asarray(o) for o in outs]
        v = valid.reshape(-1)
        iy = cys.reshape(-1)[v]
        ix = cxs.reshape(-1)[v]

        def scat(shape, flat_steps):
            out = np.zeros(shape, flat_steps.dtype)
            out[iy, ix] = flat_steps.reshape((-1,) + flat_steps.shape[2:])[v]
            return out

        res = {
            "modes": scat((nh, nw), mode),
            "cbf_y": scat((nh, nw), cbf_y),
            "cbf_cb": scat((nh, nw), cbf_cb),
            "cbf_cr": scat((nh, nw), cbf_cr),
            "lvl_y": scat((nh, nw, CTB, CTB), lvl),
            "lvl_cb": scat((nh, nw, NC, NC), lvl_cb),
            "lvl_cr": scat((nh, nw, NC, NC), lvl_cr),
        }
        rec_y = scat((nh, nw, CTB, CTB), rec).swapaxes(1, 2).reshape(H, W)
        rcb = scat((nh, nw, NC, NC), rec_cb).swapaxes(1, 2).reshape(H // 2, W // 2)
        rcr = scat((nh, nw, NC, NC), rec_cr).swapaxes(1, 2).reshape(H // 2, W // 2)
        res["recon"] = {"y": rec_y, "cb": rcb, "cr": rcr}
        return res

    def encode_frame(self, y: np.ndarray, cb: np.ndarray, cr: np.ndarray):
        yb, cbb, crb, nh, nw, H, W = self._to_blocks(y, cb, cr)
        outs = encode_frame_jit(jnp.asarray(yb), jnp.asarray(cbb),
                                jnp.asarray(crb), jnp.asarray(self.qp),
                                self.lam_bits, nh, nw)
        return self._unpack(outs, nh, nw, H, W)

    def encode_frames(self, frames: list[tuple]) -> list[dict]:
        """Batched encode of F frames (same resolution)."""
        blocks = [self._to_blocks(*f) for f in frames]
        nh, nw, H, W = blocks[0][3:]
        yb = jnp.asarray(np.stack([b[0] for b in blocks]))
        cbb = jnp.asarray(np.stack([b[1] for b in blocks]))
        crb = jnp.asarray(np.stack([b[2] for b in blocks]))
        outs = encode_frames_batch_jit(yb, cbb, crb, jnp.asarray(self.qp),
                                       self.lam_bits, nh, nw)
        results = []
        for i in range(len(frames)):
            per = [o[i] for o in outs]
            results.append(self._unpack(per, nh, nw, H, W))
        return results

    def encode_frames_tiled(self, frames: list[tuple], tile_cols: int,
                            tile_rows: int) -> list[dict]:
        """Tiled batched encode: every tile of every frame is an independent
        mini-frame in one big vmap batch (tile grid must divide the CTU grid
        evenly -- see pick_tile_grid)."""
        F = len(frames)
        blocks = [self._to_blocks(*f) for f in frames]
        nh, nw, H, W = blocks[0][3:]
        assert nh % tile_rows == 0 and nw % tile_cols == 0, \
            (nh, nw, tile_rows, tile_cols)
        tnh, tnw = nh // tile_rows, nw // tile_cols
        T = tile_cols * tile_rows

        def tile_split(b, bs):     # (nh, nw, bs, bs) -> (T, tnh, tnw, bs, bs)
            return (b.reshape(tile_rows, tnh, tile_cols, tnw, bs, bs)
                     .swapaxes(1, 2).reshape(T, tnh, tnw, bs, bs))

        yb = jnp.asarray(np.concatenate([tile_split(b[0], CTB) for b in blocks]))
        cbb = jnp.asarray(np.concatenate([tile_split(b[1], NC) for b in blocks]))
        crb = jnp.asarray(np.concatenate([tile_split(b[2], NC) for b in blocks]))
        outs = encode_frames_batch_jit(yb, cbb, crb, jnp.asarray(self.qp),
                                       self.lam_bits, tnh, tnw)
        results = []
        for f in range(F):
            tiles = []
            for t in range(T):
                per = [o[f * T + t] for o in outs]
                tiles.append(self._unpack(per, tnh, tnw, tnh * CTB, tnw * CTB))
            results.append(_merge_tiles(tiles, tile_cols, tile_rows,
                                        nh, nw, H, W))
        return results


def _merge_tiles(tiles: list[dict], tile_cols: int, tile_rows: int,
                 nh: int, nw: int, H: int, W: int) -> dict:
    tnh, tnw = nh // tile_rows, nw // tile_cols
    out = {}
    for k in ("modes", "cbf_y", "cbf_cb", "cbf_cr", "lvl_y", "lvl_cb",
              "lvl_cr"):
        sample = tiles[0][k]
        full = np.zeros((nh, nw) + sample.shape[2:], sample.dtype)
        for j in range(tile_rows):
            for i in range(tile_cols):
                t = tiles[j * tile_cols + i]
                full[j * tnh:(j + 1) * tnh, i * tnw:(i + 1) * tnw] = t[k]
        out[k] = full
    rec = {}
    for k, bs in (("y", CTB), ("cb", NC), ("cr", NC)):
        full = np.zeros((nh * bs, nw * bs), np.int32)
        for j in range(tile_rows):
            for i in range(tile_cols):
                t = tiles[j * tile_cols + i]["recon"][k]
                full[j * tnh * bs:(j + 1) * tnh * bs,
                     i * tnw * bs:(i + 1) * tnw * bs] = t
        rec[k] = full
    out["recon"] = rec
    return out


def pick_tile_grid(nh: int, nw: int, ctb: int = CTB) -> tuple[int, int]:
    """Largest even tile grid obeying Main-profile minima (tiles >= 256 luma
    wide, >= 64 tall), the level-6 tile-count maxima (Table A.1: 20 cols x
    22 rows — StreamConfig auto-raises level_idc to match the grid), with
    tile dims dividing the CTU grid."""
    max_cols = min(20, max(1, (nw * ctb) // 256))
    max_rows = min(22, max(1, (nh * ctb) // 64))

    def best_divisor(n, cap):
        for d in range(min(cap, n), 0, -1):
            if n % d == 0:
                return d
        return 1

    return best_divisor(nw, max_cols), best_divisor(nh, max_rows)
