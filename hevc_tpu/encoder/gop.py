"""GOP-structured device encoding: IDR + zero-MV-skip P frames.

Drives the v1 row-scan graphs frame by frame (P frames depend on the previous
picture's deblocked reconstruction, so frames are sequential within a GOP;
tiles remain the device batch dimension).  Entropy (host CABAC) consumes the
array-format decisions including the per-CTU skip flags.

Replaces the reference's x265 `keyint/min-keyint` GOP handling (reference
core/transcoder.py:452-535) with a first-party encode loop.
"""
from __future__ import annotations

import time

import numpy as np
import jax.numpy as jnp

from functools import partial

import jax

from hevc_tpu.encoder.ctu_modes import skip_lambda16
from hevc_tpu.encoder.rowscan_v1 import (RowScanEncoderV1, MARGIN, MARGIN_C,
                                         _rowscan_v1_scan,
                                         encode_tiles_rowscan_v1_jit,
                                         encode_tiles_rowscan_p_jit,
                                         encode_tiles_rowscan_pmc_jit)
from hevc_tpu.entropy.headers import StreamConfig, write_vps, write_sps, \
    write_pps
from hevc_tpu.entropy.tiled_v1 import entropy_encode_frame_v1
from hevc_tpu.ops.deblock import deblock_frame
from hevc_tpu.utils.bitio import annexb


@partial(jax.jit, static_argnames=("tnh", "tnw", "tr", "tc_", "bit_depth",
                                   "enable_nxn", "deblock", "idr", "sao",
                                   "subpel", "sdh", "rdoq"))
def _gop_step_jit(ya, cba, cra, pad_y, pad_cb, pad_cr, qp, lam_bits,
                  lam16, sl16, tnh, tnw, tr, tc_, bit_depth,
                  enable_nxn, deblock, idr, sao=False, subpel=True,
                  sdh=False, rdoq=False):
    """One fused GOP step: encode kernel + deblock (+ SAO) + ref padding.

    A single device dispatch per frame — on hosts with high dispatch
    latency the split kernel/deblock graphs each pay a round trip.
    Returns (kernel outputs..., dy, dcb, dcr, pad_y, pad_cb, pad_cr
    [, 9 SAO param arrays when sao]).
    """
    from hevc_tpu.ops.deblock_jax import assemble_deblock_pad_jit
    import jax.numpy as jnp
    if idr:
        outs = _rowscan_v1_scan(ya, cba, cra, qp, lam_bits, tnh, tnw,
                                bit_depth, enable_nxn=enable_nxn, sdh=sdh,
                                rdoq=rdoq)
        st = outs[0].shape
        intra_s = jnp.ones(st, bool)
        cbf_s = jnp.zeros(st, bool)
        mv_s = jnp.zeros(st + (2,), jnp.int16)
        nxn_s = outs[0]
    else:
        outs = _rowscan_v1_scan(ya, cba, cra, qp, lam_bits, tnh, tnw,
                                bit_depth, lam16=lam16,
                                ref_pads=(pad_y, pad_cb, pad_cr), sl16=sl16,
                                enable_nxn=enable_nxn, subpel=subpel,
                                sdh=sdh, rdoq=rdoq)
        inter_s = outs[13] | outs[14]
        intra_s = ~inter_s
        cbf_s = outs[14] & outs[19]
        mv_s = outs[22]
        nxn_s = outs[0] & intra_s
    # with SAO on, stop after deblocking: SAO + padding run as a SECOND
    # dispatch (sao_pad_jit) — fusing them into this graph de-optimizes the
    # encode scan by ~40 ms/frame at 1080p (XLA layout/scheduling)
    d = assemble_deblock_pad_jit.__wrapped__(
        outs[10], outs[11], outs[12], qp, intra_s, cbf_s, mv_s, nxn_s,
        tnh, tnw, tr, tc_, bit_depth, deblock, do_pad=not sao)
    return tuple(outs) + tuple(d)


def _split_tiles_j(p, tr, tc_, tnh, tnw, bs):
    """(K, Hp, Wp) planes -> (K, T, tnh, tnw, bs, bs) tile blocks.

    Equivalent to the host _to_blocks + _tsplit composition; done on
    device so the host->device copy is a plain dense plane (TPU pads a
    16x16-minor block layout during transfer — measured ~8x inflation
    through the dev tunnel)."""
    K = p.shape[0]
    x = p.reshape(K, tr, tnh, bs, tc_, tnw, bs)
    x = x.transpose(0, 1, 4, 2, 5, 3, 6)
    return x.reshape(K, tr * tc_, tnh, tnw, bs, bs)


@partial(jax.jit, static_argnames=("secs",))
def _stage_sources_jit(flat, secs):
    """One flat 1-D upload -> per-section plane arrays on device.

    secs: tuple of (k, h, w) per section.  1-D host->device copies run
    ~10x faster than 3-D plane arrays through the dev tunnel (466 vs 43
    MB/s measured), so all of a group's sources ship as one buffer.
    """
    out = []
    off = 0
    for (k, h, w) in secs:
        n = k * h * w
        out.append(jax.lax.dynamic_slice(flat, (off,), (n,)).reshape(k, h, w))
        off += n
    return tuple(out)


def _zfields_j(S, T):
    def z1(dt):
        return jnp.zeros((S, T), dt)
    return dict(skip=z1(bool), inter=z1(bool), merge=z1(bool),
                mvd=jnp.zeros((S, T, 2), jnp.int16),
                mvp=z1(jnp.int8), rqt=z1(jnp.int8),
                cbf_yi=z1(bool), cbf_cbi=z1(bool), cbf_cri=z1(bool),
                mv=jnp.zeros((S, T, 2), jnp.int16),
                dir=z1(jnp.int8),
                mvd1=jnp.zeros((S, T, 2), jnp.int16),
                mvp1=z1(jnp.int8))


def _intra_fields_j(outs):
    return dict(part=outs[0], modes4=outs[1], cbf_y4=outs[2],
                cbf_cb=outs[3], cbf_cr=outs[4], cbf_cb4=outs[5],
                cbf_cr4=outs[6])


@partial(jax.jit, static_argnames=("tnh", "tnw", "tr", "tc_", "bit_depth",
                                   "enable_nxn", "nxn_p", "deblock",
                                   "subpel", "sdh", "rdoq", "sao",
                                   "weightp"))
def _gop_chunk_jit(yp, cbp, crp, kinds, active, prev_pads, cur_pads,
                   qp_v, lam_bits_v, lam16_v, sl16_v,
                   tnh, tnw, tr, tc_,
                   bit_depth, enable_nxn, nxn_p, deblock, subpel,
                   sdh=False, rdoq=False, sao=False,
                   weightp=False, wp_v=None):
    """Encode a chunk of REFERENCE frames (IDR/P, decode order) in one
    device dispatch.

    lax.scan over frames; the DPB feedback — deblocked, padded reference
    tiles — is the scan carry, so P dependencies never leave the chip;
    each step lax.cond's IDR vs P (kinds: (K,) 0/1), so chunks may cross
    GOP boundaries.  B pictures are handled by the separate batched
    _b_batch_jit dispatch: including the B graph as a third branch here
    poisons the XLA schedule of the whole conditional (measured 6x on
    the full scan), and B pictures batch across lanes anyway since they
    are mutually independent non-reference pictures.

    Returns (flat packed heads, (K, Ntot) int16 dense levels, per-step
    pad stacks (K, T, h, w) x3 for the B batch's reference gather, final
    (prev, cur) pads).  Host-bound syntax is packed on device (see
    encoder/pack.py): two packed fetches per chunk instead of ~26 arrays
    per frame — SURVEY §2's GOP-segment pipelining.
    """
    ya = _split_tiles_j(yp, tr, tc_, tnh, tnw, 16)
    cba = _split_tiles_j(cbp, tr, tc_, tnh, tnw, 8)
    cra = _split_tiles_j(crp, tr, tc_, tnh, tnw, 8)
    return _gop_chunk_blocks(ya, cba, cra, kinds, active, prev_pads,
                             cur_pads, qp_v, lam_bits_v, lam16_v, sl16_v,
                             tnh, tnw, tr, tc_, bit_depth, enable_nxn,
                             nxn_p, deblock, subpel, sdh=sdh, rdoq=rdoq,
                             sao=sao, weightp=weightp, wp_v=wp_v)


def _gop_chunk_blocks(ya, cba, cra, kinds, active, prev_pads, cur_pads,
                      qp_v, lam_bits_v, lam16_v, sl16_v,
                      tnh, tnw, tr, tc_, bit_depth, enable_nxn, nxn_p,
                      deblock, subpel, streams=1, sdh=False, rdoq=False,
                      sao=False, weightp=False, wp_v=None):
    """Traceable chunk-scan body over pre-split tile blocks (K, T, ...)
    with T = streams * tr * tc_.

    Lanes never interact in the scan — the DPB carry is per-lane — so
    this body shards cleanly over a device mesh (encode_chunk_sharded):
    multi-stream production encoding IS lane-axis data parallelism.  The
    deblock/pad assembly is per-STREAM (vmapped over the stream axis) so
    MC halos only ever carry a stream's own picture pixels.
    """
    from hevc_tpu.encoder.pack import FramePackSpec, _SAO_FIELDS
    from hevc_tpu.ops.deblock_jax import assemble_deblock_pad_jit
    T1 = tr * tc_
    T = streams * T1
    spec = FramePackSpec(tnh, tnw, T, sao=sao)
    S = tnh * tnw

    def _asm_src(a):
        # (T1, tnh, tnw, n, n) tile blocks -> the assembled source plane
        # (SAO estimates offsets against the source)
        n = a.shape[-1]
        x = a.reshape(tr, tc_, tnh, tnw, n, n)
        return x.transpose(0, 2, 4, 1, 3, 5).reshape(tr * tnh * n,
                                                     tc_ * tnw * n)

    def _finish(ry, rcb, rcr, qp, lam16, intra, cbf, mv, nxn, srcs):
        """Deblock [+ SAO] + halo-pad the step's reconstruction.

        Returns (pads3, sao_fields): sao_fields {} unless sao, else the
        9 per-CTU parameter grids keyed by pack._SAO_FIELDS names
        ((streams,) leading axis folded into the frame-grid rows)."""
        if streams == 1:
            srcs3 = tuple(_asm_src(s.astype(jnp.int32))
                          for s in srcs) if sao else None
            d = assemble_deblock_pad_jit.__wrapped__(
                ry, rcb, rcr, qp, intra, cbf, mv, nxn,
                tnh, tnw, tr, tc_, bit_depth, deblock,
                sao_srcs=srcs3, lam16=lam16, do_pad=True)
            params = {nm: d[6 + i] for i, (nm, _) in enumerate(_SAO_FIELDS)} \
                if sao else {}
            return tuple(d[3:6]), params

        def split(a):     # (steps, S*T1, ...) -> (S, steps, T1, ...)
            x = a.reshape((a.shape[0], streams, T1) + a.shape[2:])
            return jnp.moveaxis(x, 1, 0)

        def split_src(a):  # (streams*T1, tnh, tnw, n, n) -> per-stream
            return a.reshape((streams, T1) + a.shape[1:])

        def one(args):
            ry_, rcb_, rcr_, it_, cb_, mv_, nx_, sy_, scb_, scr_ = args
            srcs3 = (_asm_src(sy_.astype(jnp.int32)),
                     _asm_src(scb_.astype(jnp.int32)),
                     _asm_src(scr_.astype(jnp.int32))) if sao else None
            d = assemble_deblock_pad_jit.__wrapped__(
                ry_, rcb_, rcr_, qp, it_, cb_, mv_, nx_,
                tnh, tnw, tr, tc_, bit_depth, deblock,
                sao_srcs=srcs3, lam16=lam16, do_pad=True)
            return tuple(d[3:6]) + (tuple(d[6:15]) if sao else ())

        outs = jax.vmap(one)((split(ry), split(rcb), split(rcr),
                              split(intra), split(cbf), split(mv),
                              split(nxn), split_src(srcs[0]),
                              split_src(srcs[1]), split_src(srcs[2])))
        # pads: (S, T1, h, w) -> (S*T1, h, w)
        pads = tuple(p.reshape((T,) + p.shape[2:]) for p in outs[:3])
        params = {}
        if sao:
            # (streams, nh1, nw1[, 4]) -> (streams*nh1, nw1[, 4]):
            # stream-major raster, matching the host's per-stream split
            params = {nm: a.reshape((-1,) + a.shape[2:])
                      for (nm, _), a in zip(_SAO_FIELDS, outs[3:12])}
        return pads, params

    def body(carry, xs):
        sy, scb, scr, kind, act, qp, lam_bits, lam16, sl16, wpf = xs
        fy, fcb, fcr = (sy.astype(jnp.int32), scb.astype(jnp.int32),
                        scr.astype(jnp.int32))

        def idr_branch(carry):
            prev3, cur3 = carry
            outs = _rowscan_v1_scan(fy, fcb, fcr, qp, lam_bits, tnh, tnw,
                                    bit_depth, enable_nxn=enable_nxn,
                                    sdh=sdh, rdoq=rdoq)
            st = outs[0].shape
            pads, sao_f = _finish(
                outs[10], outs[11], outs[12], qp, lam16, jnp.ones(st, bool),
                jnp.zeros(st, bool), jnp.zeros(st + (2,), jnp.int16),
                outs[0], (sy, scb, scr))
            fields = dict(_zfields_j(S, T), **_intra_fields_j(outs),
                          **sao_f)
            return fields, (outs[7], outs[8], outs[9]), (cur3, pads)

        def p_branch(carry):
            prev3, cur3 = carry
            outs = _rowscan_v1_scan(fy, fcb, fcr, qp, lam_bits, tnh, tnw,
                                    bit_depth, lam16=lam16, ref_pads=cur3,
                                    sl16=sl16, enable_nxn=nxn_p,
                                    subpel=subpel, sdh=sdh, rdoq=rdoq,
                                    wp=wpf if weightp else None)
            inter_s = outs[13] | outs[14]
            pads, sao_f = _finish(
                outs[10], outs[11], outs[12], qp, lam16, ~inter_s,
                outs[14] & outs[19], outs[22], outs[0] & ~inter_s,
                (sy, scb, scr))
            fields = dict(_zfields_j(S, T), **_intra_fields_j(outs),
                          **sao_f)
            fields.update(skip=outs[13], inter=outs[14], merge=outs[15],
                          mvd=outs[16], mvp=outs[17], rqt=outs[18],
                          cbf_yi=outs[19], cbf_cbi=outs[20],
                          cbf_cri=outs[21], mv=outs[22])
            return fields, (outs[7], outs[8], outs[9]), (cur3, pads)

        fields, lvls, new_carry = jax.lax.cond(
            kind == 0, idr_branch, p_branch, carry)
        flat = jnp.where(act, FramePackSpec.coef_flat(*lvls), 0)
        nnz = (flat != 0).sum(dtype=jnp.int32)
        head = spec.pack_head(fields, nnz)
        carry = jax.tree.map(lambda n, o: jnp.where(act, n, o),
                             new_carry, carry)
        return carry, (head, flat) + carry[1]

    if wp_v is None:
        wp_v = jnp.tile(jnp.asarray([64, 0, 64, 0, 64, 0], jnp.int32),
                        (ya.shape[0], 1))
    carry, ys = jax.lax.scan(
        body, (prev_pads, cur_pads),
        (ya, cba, cra, kinds, active, qp_v, lam_bits_v, lam16_v, sl16_v,
         wp_v))
    heads, coefs, pads_y, pads_cb, pads_cr = ys
    # flatten the head stack: 1-D outputs transfer at full link speed
    return heads.reshape(-1), coefs, (pads_y, pads_cb, pads_cr), carry


@partial(jax.jit, static_argnames=("cap",))
def _finalize_chunk_jit(heads_r, coefs_r, heads_b, coefs_b, cap):
    """Single post-encode dispatch: concat heads/coefs (ref + B), build
    the bitpacked significance map + compacted value stream, and emit the
    one flat fetch buffer.  Folding these into one jit saves 4 separate
    device round trips per group — each dispatch on the tunnel is a
    blocking RPC (see encode_groups_pipelined)."""
    from hevc_tpu.encoder.pack import coef_stream
    if heads_b is not None:
        heads = jnp.concatenate([heads_r, heads_b])
        coefs = jnp.concatenate([coefs_r, coefs_b])
    else:
        heads, coefs = heads_r, coefs_r
    bits, vbuf, _ = coef_stream(coefs)
    return jnp.concatenate([heads, bits]), vbuf[:cap], vbuf


@partial(jax.jit, static_argnames=("tr", "tc_", "hc", "wc"))
def _digest_stack_jit(py, pcb, pcr, tr, tc_, hc, wc):
    """Per-frame display digests from the chunk scan's padded DPB stack
    (validate/digest.py): stitch the tile interiors back into full
    frames, crop to the conformance window, reduce to (K, 6) int32.
    24 bytes/frame of fetch buys whole-stream pixel verification in the
    validator — the reconstructions themselves never leave the device."""
    from hevc_tpu.encoder.rowscan_v1 import MARGIN, MARGIN_C
    from hevc_tpu.validate.digest import digest_frame_j

    def stitch(p, m):
        K, T, hp, wp = p.shape
        th, tw = hp - 2 * m, wp - 2 * m
        x = p[:, :, m:m + th, m:m + tw].reshape(K, tr, tc_, th, tw)
        return x.transpose(0, 1, 3, 2, 4).reshape(K, tr * th, tc_ * tw)

    y = stitch(py, MARGIN)[:, :hc, :wc]
    cb = stitch(pcb, MARGIN_C)[:, :(hc + 1) // 2, :(wc + 1) // 2]
    cr = stitch(pcr, MARGIN_C)[:, :(hc + 1) // 2, :(wc + 1) // 2]
    return jax.vmap(digest_frame_j)(y, cb, cr)


@partial(jax.jit, static_argnames=("tnh", "tnw", "tr", "tc_", "bit_depth",
                                   "nxn_p", "subpel", "sdh", "rdoq", "sao"))
def _b_batch_jit(yp, cbp, crp, stack_y, stack_cb, stack_cr,
                 idx0, idx1, act, qp, lam_bits, lam16, sl16, dsf,
                 tnh, tnw, tr, tc_, bit_depth, nxn_p, subpel, sdh=False,
                 rdoq=False, sao=False):
    """Encode Kb non-reference B pictures in ONE batched dispatch.

    B pictures are mutually independent, so frames fold into the lane
    dimension (Kb*T lanes through one row scan — lane scaling is much
    cheaper than sequential steps).  stack_*: (M, T, h, w) padded ref
    planes (carry-in refs + this chunk's per-step pads); idx0/idx1:
    (Kb,) row indices selecting each picture's L0/L1 reference; dsf:
    (Kb, 2) per-picture cross-list MV scaling factors (IbbP mini-GOPs
    mix (1,2)/(2,1)/(1,1) anchor distances).
    """
    ya = _split_tiles_j(yp, tr, tc_, tnh, tnw, 16)
    cba = _split_tiles_j(cbp, tr, tc_, tnh, tnw, 8)
    cra = _split_tiles_j(crp, tr, tc_, tnh, tnw, 8)
    return _b_batch_blocks(ya, cba, cra, stack_y, stack_cb, stack_cr,
                           idx0, idx1, act, qp, lam_bits, lam16, sl16,
                           dsf, tnh, tnw, tr, tc_, bit_depth, nxn_p,
                           subpel, sdh=sdh, rdoq=rdoq, sao=sao)


def _b_batch_blocks(ya, cba, cra, stack_y, stack_cb, stack_cr,
                    idx0, idx1, act, qp, lam_bits, lam16, sl16, dsf,
                    tnh, tnw, tr, tc_, bit_depth, nxn_p, subpel,
                    streams=1, sdh=False, rdoq=False, sao=False):
    """Traceable B-batch body over pre-split tile blocks
    (Kb, T, tnh, tnw, n, n) with T = streams * tr * tc_ — the
    shard-friendly entry (parallel.streams.encode_b_batch_sharded), the
    lane axis carries streams x tiles exactly like _gop_chunk_blocks."""
    from hevc_tpu.encoder.pack import FramePackSpec, _SAO_FIELDS
    T1 = streams * tr * tc_
    spec = FramePackSpec(tnh, tnw, T1, sao=sao)
    S, T = tnh * tnw, T1
    Kb = ya.shape[0]
    ya = ya.astype(jnp.int32)
    cba = cba.astype(jnp.int32)
    cra = cra.astype(jnp.int32)

    def lanes(a):
        return a.reshape((Kb * T,) + a.shape[2:])

    def gather(stack, idx):
        return lanes(jnp.take(stack, idx, axis=0))

    pads0 = (gather(stack_y, idx0), gather(stack_cb, idx0),
             gather(stack_cr, idx0))
    pads1 = (gather(stack_y, idx1), gather(stack_cb, idx1),
             gather(stack_cr, idx1))
    dsf_l = jnp.repeat(dsf, T, axis=0) if dsf.ndim == 2 else dsf
    outs = _rowscan_v1_scan(lanes(ya), lanes(cba), lanes(cra), qp, lam_bits,
                            tnh, tnw, bit_depth, lam16=lam16,
                            ref_pads=pads0, ref_pads1=pads1, sl16=sl16,
                            dsf=dsf_l, enable_nxn=nxn_p, subpel=subpel,
                            sdh=sdh, rdoq=rdoq)

    def unlane(a):
        # (S, Kb*T, ...) -> (Kb, S, T, ...)
        x = a.reshape((S, Kb, T) + a.shape[2:])
        return jnp.moveaxis(x, 1, 0)

    fields = dict(_zfields_j(S, T), **_intra_fields_j(outs))
    fields.update(skip=outs[13], inter=outs[14], merge=outs[15],
                  mvd=outs[16], mvp=outs[17], rqt=outs[18],
                  cbf_yi=outs[19], cbf_cbi=outs[20], cbf_cri=outs[21],
                  mv=outs[22], dir=outs[23], mvd1=outs[24], mvp1=outs[25])
    # broadcast the zero-filled fields (intra-only names) to Kb, unlane
    # the real outputs
    bfields = {}
    for k, v in fields.items():
        if v.shape[1] == Kb * T:
            bfields[k] = unlane(v)
        else:
            bfields[k] = jnp.broadcast_to(v[None], (Kb,) + v.shape)
    if sao:
        # non-reference B slices code with slice_sao_*_flag=0 (see
        # _finish_pic): the sao head section is zero-filled so ref and B
        # rows share one head layout in the combined fetch
        for nm, k in _SAO_FIELDS:
            shp = (Kb, S * T) if k == 1 else (Kb, S * T, k)
            bfields[nm] = jnp.zeros(shp, jnp.int8)
    lvls = (unlane(outs[7]), unlane(outs[8]), unlane(outs[9]))
    flat = jax.vmap(FramePackSpec.coef_flat)(*lvls)       # (Kb, Ntot)
    flat = jnp.where(act[:, None], flat, 0)   # masked tail slots
    nnz = (flat != 0).sum(axis=1, dtype=jnp.int32)
    heads = jax.vmap(spec.pack_head)(bfields, nnz)        # (Kb, Ph)
    return heads.reshape(-1), flat


def b_schedule(n: int, gop: int = 0, bframes: bool = True, nb: int = 1):
    """Decode-order schedule: [(display_idx, kind, poc, rps_idx)].

    kind: 0 IDR, 1 P, 2 non-reference B.  bframes=True -> nb non-ref B
    pictures between anchors (nb=1: IbPbP, decode order I P2 B1 P4 B3;
    nb=2: IbbPbbP, anchors 3 apart, decode order I P3 b1 b2 P6 b4 b5 —
    x265's `bframes` without the pyramid).  rps_idx indexes
    entropy.headers.rps_sets; B entries carry the set matching their
    (past, future) anchor distances.  bframes=False -> plain IPPP.
    """
    if not bframes:
        return [(k, 0 if (k == 0 or (gop and k % gop == 0)) else 1,
                 None if (k == 0 or (gop and k % gop == 0))
                 else k - (k // gop) * gop if gop else k, 0)
                for k in range(n)]
    starts = [k for k in range(n) if k == 0 or (gop and k % gop == 0)]
    segments = [(s, (starts + [n])[i + 1]) for i, s in enumerate(starts)]
    step = nb + 1
    # rps set ids per anchor distance / b position (headers.rps_sets)
    p_rps = {2: 0, 1: 2} if nb == 1 else {3: 0, 2: 4, 1: 2}
    b_rps = {(1, 1): 1} if nb == 1 else {(1, 2): 1, (2, 1): 3, (1, 1): 5}
    sched = []
    for (s, e) in segments:
        sched.append((s, 0, None, 0))
        prev = s
        k = s + step
        while prev < e - 1:
            r = min(k, e - 1)
            d = r - prev
            sched.append((r, 1, r - s, p_rps[d]))
            for b in range(prev + 1, r):
                sched.append((b, 2, b - s, b_rps[(b - prev, r - b)]))
            prev = r
            k = r + step
    return sched


def chunk_groups(sched, bframes: bool, chunk: int = 8):
    """Split a decode-order schedule into encode groups.

    With bframes: up to `chunk` reference slots plus their trailing B
    pictures (matching encode_chunk_async's fixed KR=KB=chunk graph
    shapes — bigger groups amortize the per-dispatch tunnel round trip);
    B pictures always land in the same group as their L1 reference.
    Without: plain fixed-size chunks."""
    if not bframes:
        return [sched[i:i + chunk] for i in range(0, len(sched), chunk)]
    groups, cur, nref = [], [], 0
    cap = min(chunk, 4)
    for e in sched:
        if e[1] != 2 and nref == cap:
            groups.append(cur)
            cur, nref = [], 0
        cur.append(e)
        if e[1] != 2:
            nref += 1
    if cur:
        groups.append(cur)
    return groups


def _sao_param_lists(arrs):
    """Device SAO param arrays -> the entropy layer's per-CTU lists."""
    ty_y, aux_y, off_y, ty_c, cls_c, pos_cb, pos_cr, off_cb, off_cr = arrs
    nh, nw = ty_y.shape
    py, pc = [], []
    for cy in range(nh):
        ry, rc = [], []
        for cx in range(nw):
            t = int(ty_y[cy, cx])
            ry.append(None if t == 0 else
                      (t, int(aux_y[cy, cx]),
                       [int(v) for v in off_y[cy, cx]]))
            t = int(ty_c[cy, cx])
            if t == 0:
                rc.append(None)
            else:
                aux = (int(pos_cb[cy, cx]), int(pos_cr[cy, cx])) \
                    if t == 1 else int(cls_c[cy, cx])
                rc.append((t, aux, [int(v) for v in off_cb[cy, cx]],
                           [int(v) for v in off_cr[cy, cx]]))
        py.append(ry)
        pc.append(rc)
    return py, pc


class GopEncoder:
    """Device (JAX) GOP encoder for one stream configuration."""

    def __init__(self, cfg: StreamConfig, enable_nxn: bool = True,
                 mc: bool = True, nxn_p: bool | None = None,
                 subpel: bool = True):
        assert cfg.inter, "GopEncoder requires cfg.inter"
        from hevc_tpu.utils.jaxcfg import ensure_compile_cache
        ensure_compile_cache()
        self.cfg = cfg
        self.enable_nxn = enable_nxn
        self.mc = mc        # motion search (False: zero-MV skip only)
        # NxN intra in P frames: off by default in MC mode (I frames keep it)
        self.nxn_p = (False if mc else enable_nxn) if nxn_p is None else nxn_p
        self.subpel = subpel
        self.reset()

    def reset(self) -> None:
        """Drop DPB state; the next frame must be an IDR."""
        self._ref_blocks = None
        self._poc = 0
        self._pool = None
        self._last_host = None
        self._prev_ref_src = None   # last ref picture's SOURCE planes
                                    # (weightp estimation signal)
        # decode-order per-frame recon digests (None for rows without one,
        # e.g. non-reference B); filled by the chunked path's entropy
        # worker, consumed by convert_video -> validate_mp4
        self.recon_digests: list = []

    def parameter_sets(self) -> list[bytes]:
        return [write_vps(self.cfg), write_sps(self.cfg), write_pps(self.cfg)]

    # ---- block layout helpers (tile-major batch) ------------------------------
    def _to_blocks(self, y, cb, cr):
        from hevc_tpu.encoder.frame_jax import JaxIntraEncoder
        yb, cbb, crb, nh, nw, H, W = JaxIntraEncoder._to_blocks(y, cb, cr)
        self._geom = (nh, nw, H, W)
        return yb, cbb, crb

    def _tsplit(self, b, bs):
        nh, nw, _, _ = self._geom
        tc, tr = self.cfg.tile_cols, self.cfg.tile_rows
        tnh, tnw = nh // tr, nw // tc
        return (b.reshape(tr, tnh, tc, tnw, bs, bs)
                 .swapaxes(1, 2).reshape(tr * tc, tnh, tnw, bs, bs))

    def _unstep(self, a, to=None):
        nh, nw, _, _ = self._geom
        tc, tr = self.cfg.tile_cols, self.cfg.tile_rows
        tnh, tnw = nh // tr, nw // tc
        s = a.shape                       # (steps, T, ...)
        x = np.moveaxis(a.reshape(tnh, tnw, 1, tr * tc, *s[2:]), (2, 3), (0, 1))
        x = x.reshape(tr, tc, tnh, tnw, *s[2:])
        x = x.swapaxes(1, 2).reshape(nh, nw, *s[2:])
        return x.astype(to) if to is not None else x

    def _plane(self, blocks, bs):
        nh, nw, H, W = self._geom
        scale = 16 // bs
        return blocks.swapaxes(1, 2).reshape(H // scale, W // scale)

    def _frame_decisions(self, y, cb, cr, ref_blocks, qp):
        """One frame through the device graph -> (array decisions, recon)."""
        cfg = self.cfg
        rs = RowScanEncoderV1(qp, cfg.bit_depth)
        lam16 = skip_lambda16(qp + 6 * (cfg.bit_depth - 8))
        yb, cbb, crb = self._to_blocks(np.asarray(y, np.int32),
                                       np.asarray(cb, np.int32),
                                       np.asarray(cr, np.int32))
        nh, nw, H, W = self._geom
        tc, tr = cfg.tile_cols, cfg.tile_rows
        tnh, tnw = nh // tr, nw // tc
        ya = jnp.asarray(self._tsplit(yb, 16))
        cba = jnp.asarray(self._tsplit(cbb, 8))
        cra = jnp.asarray(self._tsplit(crb, 8))
        if ref_blocks is None:
            outs = encode_tiles_rowscan_v1_jit(
                ya, cba, cra, jnp.asarray(qp), rs.lam_bits,
                tnh, tnw, cfg.bit_depth, self.enable_nxn, sdh=cfg.sdh, rdoq=cfg.rdoq)
        elif self.mc:
            sl16 = int(np.sqrt(0.85 * 2.0 ** (
                (qp + 6 * (cfg.bit_depth - 8) - 12) / 3.0)) * 16)
            outs = encode_tiles_rowscan_pmc_jit(
                ya, cba, cra, *ref_blocks, jnp.asarray(qp),
                rs.lam_bits, jnp.asarray(lam16, jnp.int32),
                jnp.asarray(sl16, jnp.int32),
                tnh, tnw, cfg.bit_depth, self.nxn_p, self.subpel,
                sdh=cfg.sdh, rdoq=cfg.rdoq)
        else:
            outs = encode_tiles_rowscan_p_jit(
                ya, cba, cra, *ref_blocks, jnp.asarray(qp),
                rs.lam_bits, jnp.asarray(lam16, jnp.int32),
                tnh, tnw, cfg.bit_depth, self.enable_nxn, sdh=cfg.sdh, rdoq=cfg.rdoq)
        dev = {"rec_y": outs[10], "rec_cb": outs[11], "rec_cr": outs[12],
               "part": outs[0]}
        if ref_blocks is not None and self.mc:
            dev.update(skip=outs[13], inter=outs[14], cbf_yi=outs[19],
                       mv=outs[22])
        outs = jax.device_get(list(outs))
        dec = self._dec_from_outs(outs,
                                  p_mc=ref_blocks is not None and self.mc,
                                  p_zmv=ref_blocks is not None and not self.mc)
        recon = {
            "y": self._plane(self._unstep(outs[10], np.int32), 16),
            "cb": self._plane(self._unstep(outs[11], np.int32), 8),
            "cr": self._plane(self._unstep(outs[12], np.int32), 8),
        }
        return dec, recon, dev

    def _dec_from_outs(self, outs, p_mc: bool, p_zmv: bool = False,
                       p_b: bool = False) -> dict:
        """Host decision dict from (host-fetched) kernel outputs."""
        (part, modes4, cbf_y4, cbf_cb, cbf_cr, cbf_cb4, cbf_cr4,
         lvl_y, lvl_cb, lvl_cr) = outs[:10]
        dec = {
            "part_nxn": self._unstep(part),
            "modes4": self._unstep(modes4, np.int32),
            "cbf_y4": self._unstep(cbf_y4),
            "cbf_cb": self._unstep(cbf_cb), "cbf_cr": self._unstep(cbf_cr),
            "cbf_cb4": self._unstep(cbf_cb4), "cbf_cr4": self._unstep(cbf_cr4),
            "lvl_y": self._unstep(lvl_y, np.int32),
            "lvl_cb": self._unstep(lvl_cb, np.int32),
            "lvl_cr": self._unstep(lvl_cr, np.int32),
        }
        if p_b:
            (skipf, interf, mergef, mvd, mvp, rqt,
             cbf_yi, cbf_cbi, cbf_cri, mv,
             dir_e, mvd1, mvp1, pf, mv1) = outs[13:28]
            dec.update(
                skip=self._unstep(skipf),
                inter=self._unstep(interf),
                merge=self._unstep(mergef),
                mvd=self._unstep(mvd, np.int32),
                mvp=self._unstep(mvp, np.int32),
                rqt=self._unstep(rqt, np.int32),
                cbf_yi=self._unstep(cbf_yi), cbf_cbi=self._unstep(cbf_cbi),
                cbf_cri=self._unstep(cbf_cri),
                mv=self._unstep(mv, np.int32),
                dir=self._unstep(dir_e, np.int32),
                mvd1=self._unstep(mvd1, np.int32),
                mvp1=self._unstep(mvp1, np.int32),
                pf=self._unstep(pf),
                mv1=self._unstep(mv1, np.int32),
            )
            return dec
        if p_mc:
            (skipf, interf, mergef, mvd, mvp, rqt,
             cbf_yi, cbf_cbi, cbf_cri, mv) = outs[13:23]
            dec.update(
                skip=self._unstep(skipf),
                inter=self._unstep(interf),
                merge=self._unstep(mergef),
                mvd=self._unstep(mvd, np.int32),
                mvp=self._unstep(mvp, np.int32),
                rqt=self._unstep(rqt, np.int32),
                cbf_yi=self._unstep(cbf_yi), cbf_cbi=self._unstep(cbf_cbi),
                cbf_cri=self._unstep(cbf_cri),
                mv=self._unstep(mv, np.int32),
            )
        elif p_zmv:
            dec["skip"] = self._unstep(outs[13])
        return dec

    def _deblocked(self, recon, dec, qp=None):
        cfg = self.cfg
        qp = cfg.qp if qp is None else qp
        dy = recon["y"].copy()
        dcb = recon["cb"].copy()
        dcr = recon["cr"].copy()
        if cfg.deblock:
            cols, rows = cfg.tile_grid()
            tx = list(np.cumsum(cols)[:-1] * cfg.ctb) \
                if cfg.tiles_enabled else None
            ty = list(np.cumsum(rows)[:-1] * cfg.ctb) \
                if cfg.tiles_enabled else None
            skip = dec.get("skip")
            cu_maps = None
            # part_nxn from the device graph is the INTRA candidate's flag;
            # only CTUs that actually selected intra create NxN inner edges
            nxn = np.asarray(dec["part_nxn"], bool)
            if "pf" in dec:                   # B slice
                inter = np.asarray(dec["skip"], bool) \
                    | np.asarray(dec["inter"], bool)
                intra = ~inter
                cu_maps = {
                    "intra": intra,
                    "cbf": (np.asarray(dec["inter"], bool)
                            & np.asarray(dec["cbf_yi"], bool))
                    | (intra & np.asarray(dec["cbf_y4"], bool).any(-1)),
                    "mv": np.asarray(dec["mv"], np.int32),
                    "mv1": np.asarray(dec["mv1"], np.int32),
                    "pf": np.asarray(dec["pf"], bool)}
                nxn = nxn & intra
                skip = None
            elif "inter" in dec:
                inter = np.asarray(dec["skip"], bool) \
                    | np.asarray(dec["inter"], bool)
                cu_maps = {
                    "intra": ~inter,
                    "cbf": np.asarray(dec["inter"], bool)
                    & np.asarray(dec["cbf_yi"], bool),
                    "mv": np.asarray(dec["mv"], np.int32)}
                nxn = nxn & ~inter
                skip = None
            elif skip is not None:
                nxn = nxn & ~np.asarray(skip, bool)
            deblock_frame(dy, dcb, dcr, qp, ctb=cfg.ctb,
                          bit_depth=cfg.bit_depth,
                          tile_cols_px=tx, tile_rows_px=ty,
                          nxn_map=nxn,
                          skip_map=np.asarray(skip, bool)
                          if skip is not None else None,
                          cu_maps=cu_maps)
        return {"y": dy, "cb": dcb, "cr": dcr}

    def encode_next(self, y, cb, cr, idr: bool = False,
                    qp: int | None = None) -> tuple[bytes, dict]:
        """Encode one frame (streaming).  Returns (slice NAL, deblocked recon).

        idr forces an IDR; otherwise P against the previous picture.  qp
        overrides cfg.qp for this frame (per-slice rate control).
        """
        fut = self.encode_next_async(y, cb, cr, idr=idr, qp=qp)
        if fut is None:
            return self._encode_next_sync(y, cb, cr, idr=idr, qp=qp)
        nal = fut.result()
        ref = {"y": self._last_host[0], "cb": self._last_host[1],
               "cr": self._last_host[2]}
        return nal, ref

    def encode_next_async(self, y, cb, cr, idr: bool = False,
                          qp: int | None = None):
        """Pipelined encode: dispatches this frame's fused device step NOW and
        returns a Future of the slice NAL; the host stage (decision fetch +
        CABAC) runs on a worker thread, overlapping the device encode of the
        NEXT frame (SURVEY §2: 'CABAC host stage overlaps with on-chip
        encode').  Returns None in non-MC mode (the robust path is serial).

        The dependency chain stays correct: the next dispatch consumes
        `self._ref_blocks`, which are device arrays produced by THIS dispatch
        (XLA queues them in order); only decision arrays cross to the host.
        """
        if not self.mc:
            return None
        import dataclasses
        qp = self.cfg.qp if qp is None else qp
        cfg_f = dataclasses.replace(self.cfg, qp=qp) \
            if qp != self.cfg.qp else self.cfg
        outs, nk, is_idr = self._dispatch_frame(y, cb, cr, idr, qp)
        self._poc = 0 if is_idr else self._poc + 1
        poc = None if is_idr else self._poc
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(1, "gop-entropy")

        def host_stage():
            from hevc_tpu.utils.metrics import GLOBAL_TIMERS
            with GLOBAL_TIMERS.stage("host_fetch"):
                host = jax.device_get(list(outs[:nk])
                                      + list(outs[nk:nk + 3])
                                      + list(outs[nk + 6:]))
            dec = self._dec_from_outs(host[:nk], p_mc=not is_idr)
            sao_lists = _sao_param_lists(host[nk + 3:nk + 12]) \
                if self.cfg.sao else None
            with GLOBAL_TIMERS.stage("entropy"):
                nal = entropy_encode_frame_v1(cfg_f, dec, sao=sao_lists,
                                              poc=poc)
            self._last_dec = dec
            self._last_host = (host[nk], host[nk + 1], host[nk + 2])
            return nal

        return self._pool.submit(host_stage)

    def stage_chunk(self, frames, metas, chunk: int = 8):
        """Host prep + flat device upload for one chunk group.

        THREAD-SAFE (touches no DPB state): the production loop runs this
        on a staging worker thread so group N+1's ~25 MB source upload
        overlaps group N's device compute — without the overlap the
        upload sits serially in the loop and dominates e2e (VERDICT r2:
        ~200 of 320 ms/frame was link time).  Returns an opaque dict for
        encode_chunk_async(staged=...).
        """
        cfg = self.cfg
        # 4-ref groups measured best end-to-end: the 8-ref variant made
        # the B batch a 2.2 s serial block on the tunnel and pushed the
        # 16-frame 4K graph past the remote compiler's limits
        KR = min(chunk, 4) if cfg.bframes else chunk
        KB = cfg.bframes_n * min(chunk, 4) if cfg.bframes else 0
        refs_pos = [j for j, m in enumerate(metas) if m[0] != 2]
        bees_pos = [j for j, m in enumerate(metas) if m[0] == 2]
        assert 0 < len(refs_pos) <= KR and len(bees_pos) <= max(KB, 0), \
            (len(refs_pos), len(bees_pos), KR, KB)
        sdt = np.uint8 if cfg.bit_depth == 8 else np.uint16
        from hevc_tpu.encoder.reference_encoder import pad_to_ctb
        from hevc_tpu.utils.metrics import GLOBAL_TIMERS

        def planes(fr):
            # dense edge-padded planes; tile/block split happens on device
            # (block-layout host arrays transfer ~8x slower: TPU tiling)
            return (pad_to_ctb(np.asarray(fr[0]), 16).astype(sdt),
                    pad_to_ctb(np.asarray(fr[1]), 8).astype(sdt),
                    pad_to_ctb(np.asarray(fr[2]), 8).astype(sdt))

        _t_prep = time.perf_counter()
        rp = [planes(frames[j]) for j in refs_pos]
        H, W = rp[0][0].shape
        while len(rp) < KR:
            rp.append(rp[-1])
        nref = len(refs_pos)
        nbee = len(bees_pos)
        bp = []
        if nbee:
            bp = [planes(frames[j]) for j in bees_pos]
            while len(bp) < KB:
                bp.append(bp[-1])
        # ship ALL of the group's sources as ONE flat buffer: 1-D
        # host->device copies run ~10x faster than shaped plane arrays
        # through the dev tunnel (466 vs 43 MB/s measured)
        Hc, Wc = rp[0][1].shape
        sections = [(KR, H, W), (KR, Hc, Wc), (KR, Hc, Wc)]
        parts = [np.stack([x[0] for x in rp]).ravel(),
                 np.stack([x[1] for x in rp]).ravel(),
                 np.stack([x[2] for x in rp]).ravel()]
        if nbee:
            sections += [(KB, H, W), (KB, Hc, Wc), (KB, Hc, Wc)]
            parts += [np.stack([x[0] for x in bp]).ravel(),
                      np.stack([x[1] for x in bp]).ravel(),
                      np.stack([x[2] for x in bp]).ravel()]
        flat_host = np.concatenate(parts)
        GLOBAL_TIMERS.add("stage_prep", time.perf_counter() - _t_prep)
        _t_up = time.perf_counter()
        flat_dev = jnp.asarray(flat_host)
        staged = _stage_sources_jit(flat_dev, tuple(sections))
        try:
            jax.block_until_ready(staged)   # absorb the link time HERE,
        except Exception:                   # off the dispatch thread
            pass
        GLOBAL_TIMERS.add("stage_upload", time.perf_counter() - _t_up)
        return {"staged": staged, "H": H, "W": W, "nref": nref,
                "nbee": nbee, "refs_pos": refs_pos, "bees_pos": bees_pos,
                "KR": KR, "KB": KB}

    def encode_chunk_async(self, frames, metas, qp: int | None = None,
                           chunk: int = 8, staged: dict | None = None):
        """Encode one decode-order chunk group — up to KR reference
        pictures (IDR/P) plus their non-reference B pictures — with two
        device dispatches: the reference scan (_gop_chunk_jit) and the
        batched B encode (_b_batch_jit).  frames: [(y, cb, cr)] host
        planes in decode order; metas: [(kind, poc, rps_idx)] with kind
        0=IDR, 1=P, 2=B (refs at poc-1/poc+1).  Returns a Future of the
        slice NALs in decode order.

        Group shapes are fixed per config (KR=4 ref slots + KB=4 B slots
        with bframes, KR=chunk P-only otherwise); short groups pad with
        masked steps.  QP is per-group (rate control quantizes to group
        granularity); B pictures code at QP + B_QP_OFFSET.

        staged: a stage_chunk() result for THESE frames/metas (upload
        already done, possibly on another thread); None stages inline.
        """
        assert self.mc, "chunked path requires MC mode"
        import dataclasses
        from hevc_tpu.encoder.rowscan_v1 import dsf_pair
        from hevc_tpu.encoder.reference_encoder_v1 import RefIntraEncoderV1
        from hevc_tpu.utils.metrics import GLOBAL_TIMERS
        cfg = self.cfg
        qp = cfg.qp if qp is None else qp
        qp_b = min(qp + RefIntraEncoderV1.B_QP_OFFSET, 51)
        metas = list(metas)
        if self._ref_blocks is None and metas[0][0] != 0:
            metas[0] = (0, None, 0)
        if staged is None:
            staged = self.stage_chunk(frames, metas, chunk)
        KR, KB = staged["KR"], staged["KB"]
        refs_pos, bees_pos = staged["refs_pos"], staged["bees_pos"]
        nref, nbee = staged["nref"], staged["nbee"]
        H, W = staged["H"], staged["W"]
        self._geom = (H // 16, W // 16, H, W)
        nh, nw, H, W = self._geom
        tc, tr = cfg.tile_cols, cfg.tile_rows
        tnh, tnw = nh // tr, nw // tc
        _t_st = time.perf_counter()
        staged = staged["staged"]
        kinds = np.array([metas[j][0] for j in refs_pos]
                         + [1] * (KR - nref), np.int32)
        active = np.arange(KR) < nref
        if self._ref_blocks is None:
            T = tr * tc

            def zp():
                return (jnp.zeros((T, tnh * 16 + 2 * MARGIN,
                                   tnw * 16 + 2 * MARGIN), jnp.int32),
                        jnp.zeros((T, tnh * 8 + 2 * MARGIN_C,
                                   tnw * 8 + 2 * MARGIN_C), jnp.int32),
                        jnp.zeros((T, tnh * 8 + 2 * MARGIN_C,
                                   tnw * 8 + 2 * MARGIN_C), jnp.int32))
            self._ref_blocks = (zp(), zp())
        bd_off = 6 * (cfg.bit_depth - 8)

        def lam3(q):
            return (np.asarray(RowScanEncoderV1(q, cfg.bit_depth).lam_bits),
                    skip_lambda16(q + bd_off),
                    int(np.sqrt(0.85 * 2.0 ** ((q + bd_off - 12) / 3.0))
                        * 16))

        lbr, l16r, s16r = lam3(qp)
        # weightp: per-P-frame explicit weights estimated host-side from
        # the source planes (cur vs its reference's source) — the same
        # values the slice pred_weight_table signals (x265 `weightp`)
        wp_rows = np.tile(np.asarray([64, 0, 64, 0, 64, 0], np.int32),
                          (KR, 1))
        wps = {}
        if cfg.weightp:
            from hevc_tpu.ops.inter import estimate_weights_p
            sh = cfg.bit_depth - 8
            for i, j in enumerate(refs_pos):
                cur3 = [np.asarray(pl) for pl in frames[j]]
                if metas[j][0] != 0 and self._prev_ref_src is not None:
                    args = []
                    for cpl, rpl in zip(cur3, self._prev_ref_src):
                        args += [cpl >> sh if sh else cpl,
                                 rpl >> sh if sh else rpl]
                    wp = estimate_weights_p(*args)
                    wp_rows[i] = wp
                    wps[j] = wp
                self._prev_ref_src = cur3
        prev_in, cur_in = self._ref_blocks
        _t_g = time.perf_counter()
        heads_r, coefs_r, pad_stack, carry = _gop_chunk_jit(
            staged[0], staged[1], staged[2],
            jnp.asarray(kinds), jnp.asarray(active), prev_in, cur_in,
            jnp.full(KR, qp, jnp.int32),
            jnp.asarray(np.tile(lbr[None], (KR, 1))),
            jnp.full(KR, l16r, jnp.int32), jnp.full(KR, s16r, jnp.int32),
            tnh, tnw, tr, tc, cfg.bit_depth,
            self.enable_nxn, self.nxn_p, cfg.deblock, self.subpel,
            sdh=cfg.sdh, rdoq=cfg.rdoq, sao=cfg.sao,
            weightp=cfg.weightp,
            wp_v=jnp.asarray(wp_rows) if cfg.weightp else None)
        self._ref_blocks = carry
        # per-frame recon digests of the reference pictures (their padded
        # display planes are already in pad_stack); B digests need the
        # in-graph B deblock and land with the B-pyramid work
        digs = _digest_stack_jit(*pad_stack, tr, tc, cfg.height, cfg.width)
        try:
            digs.copy_to_host_async()
        except Exception:
            pass
        GLOBAL_TIMERS.add("disp_gop_call", time.perf_counter() - _t_g)
        _t_b = time.perf_counter()

        if nbee:
            # b's L1 = nearest preceding ref in decode order; L0 = the ref
            # before that.  Stack rows: 0 = prev carry-in, 1 = cur
            # carry-in, 2+i = this group's i-th ref.
            idx0, idx1 = [], []
            for j in bees_pos:
                n_prec = sum(1 for r in refs_pos if r < j)
                idx0.append(n_prec)
                idx1.append(n_prec + 1)
            idx0 += [0] * (KB - nbee)
            idx1 += [1] * (KB - nbee)
            stacks = tuple(
                jnp.concatenate([prev_in[pl][None], cur_in[pl][None],
                                 pad_stack[pl]])
                for pl in range(3))
            lbb, l16b, s16b = lam3(qp_b)
            # per-picture cross-list scaling factors from each B's RPS
            # set (anchor distances differ inside an IbbP mini-GOP)
            from hevc_tpu.entropy.headers import rps_sets
            sets = rps_sets(cfg)
            dsf_rows = []
            for j in bees_pos:
                poc_b = metas[j][1]
                neg, pos = sets[metas[j][2]]
                dsf_rows.append(dsf_pair(poc_b, poc_b - neg[0],
                                         poc_b + pos[0]))
            dsf_rows += [dsf_rows[-1]] * (KB - nbee)
            heads_b, coefs_b = _b_batch_jit(
                staged[3], staged[4], staged[5],
                *stacks, jnp.asarray(idx0, jnp.int32),
                jnp.asarray(idx1, jnp.int32),
                jnp.asarray(np.arange(KB) < nbee),
                jnp.asarray(qp_b), jnp.asarray(lbb),
                jnp.asarray(l16b, jnp.int32), jnp.asarray(s16b, jnp.int32),
                jnp.asarray(np.stack(dsf_rows)),
                tnh, tnw, tr, tc, cfg.bit_depth, self.nxn_p, self.subpel,
                sdh=cfg.sdh, rdoq=cfg.rdoq, sao=cfg.sao)
        else:
            heads_b = coefs_b = None
        GLOBAL_TIMERS.add("disp_b_call", time.perf_counter() - _t_b)
        nrows = KR + (KB if nbee else 0)
        from hevc_tpu.encoder.pack import (FramePackSpec, split_coef_bitmap,
                                           _SAO_FIELDS)
        spec = FramePackSpec(tnh, tnw, tr * tc, sao=cfg.sao,
                             sao_grid=(nh, nw))
        vhalf = nrows * spec.coef_elems // 2
        cap_hint = min(getattr(self, "_cap_hint", 262144), vhalf)
        # ONE finalize dispatch, then start the host copies NOW, in stream
        # order right behind this chunk's compute — a plain device_get in
        # the worker thread would queue behind the NEXT chunk's dispatch
        # and serialize the pipeline.  The value-stream length isn't known
        # host-side yet, so copy a running-capacity prefix and fall back
        # to a second fetch on rare growth.
        fetch1, vpre, vbuf = _finalize_chunk_jit(heads_r, coefs_r, heads_b,
                                                 coefs_b, cap_hint)
        try:
            fetch1.copy_to_host_async()
            vpre.copy_to_host_async()
        except Exception:
            pass
        GLOBAL_TIMERS.add("disp_dispatch", time.perf_counter() - _t_st)
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor
            self._pool = ThreadPoolExecutor(1, "gop-entropy")
        cfg_base = dataclasses.replace(cfg, qp=qp) if qp != cfg.qp else cfg
        cfg_b = dataclasses.replace(cfg, qp=qp_b)
        # decode-order row mapping: refs row i, bees row KR + i
        rowmap = {}
        for i, j in enumerate(refs_pos):
            rowmap[j] = i
        for i, j in enumerate(bees_pos):
            rowmap[j] = KR + i

        def host_stage():
            from hevc_tpu.utils.metrics import GLOBAL_TIMERS
            with GLOBAL_TIMERS.stage("host_fetch"):
                f1 = np.asarray(jax.device_get(fetch1))
                nhead = nrows * spec.head_bytes
                hn = f1[:nhead].reshape(nrows, spec.head_bytes)
                fields, nnz = zip(*(spec.unpack_head(hn[k])
                                    for k in range(nrows)))
                total = int(sum(nnz))
                nbits = nrows * (spec.coef_elems // 8)
                bmap = f1[nhead:nhead + nbits]
                if total <= cap_hint:
                    vb = np.asarray(jax.device_get(vpre))[:total]
                else:
                    # capacity miss: fetch the tail (slow path; bucketed
                    # so the slice-program cache stays small)
                    cap = min(-(-total // 131072) * 131072,
                              vbuf.shape[0])
                    vb = np.concatenate(
                        [np.asarray(jax.device_get(vpre)),
                         np.asarray(jax.device_get(
                             vbuf[cap_hint:cap]))])[:total]
                # leave ~25% headroom for the next chunk's stream
                self._cap_hint = min(
                    max(-(-total * 5 // (4 * 65536)) * 65536, 131072),
                    vbuf.shape[0])
            coef = split_coef_bitmap(bmap, vb, spec.coef_elems, nnz)
            nals = []
            with GLOBAL_TIMERS.stage("entropy"):
                for j, (kind, poc, rps) in enumerate(metas):
                    row = rowmap[j]
                    is_b = kind == 2
                    lvls = spec.unpack_coefs(*coef[row])
                    dec = self._dec_from_outs(
                        spec.outs_list(fields[row], lvls, b_slice=is_b),
                        p_mc=kind == 1, p_b=is_b)
                    sao_lists = None
                    if cfg.sao and not is_b:
                        sao_lists = _sao_param_lists(
                            [fields[row][nm] for nm, _ in _SAO_FIELDS])
                    nals.append(entropy_encode_frame_v1(
                        cfg_b if is_b else cfg_base, dec,
                        poc=None if kind == 0 else poc,
                        b_slice=is_b, rps_idx=rps, sao=sao_lists,
                        wp=wps.get(j)))
                    self._last_dec = dec
            d = np.asarray(jax.device_get(digs))
            self.recon_digests.extend(
                None if kind == 2 else d[rowmap[j]]
                for j, (kind, poc, rps) in enumerate(metas))
            return nals

        return self._pool.submit(host_stage)

    def _stage_pool(self):
        if getattr(self, "_spool", None) is None:
            from concurrent.futures import ThreadPoolExecutor
            self._spool = ThreadPoolExecutor(1, "gop-stage")
        return self._spool

    def _dispatch_pool(self):
        if getattr(self, "_dpool", None) is None:
            from concurrent.futures import ThreadPoolExecutor
            self._dpool = ThreadPoolExecutor(1, "gop-dispatch")
        return self._dpool

    def encode_groups_pipelined(self, frames, groups, chunk: int = 8,
                                qp_for_group=None, lookahead: int = 2):
        """Drive the chunked path with upload/compute/entropy overlap.

        Generator yielding (group, Future of NALs) in order — a 3-stage
        thread pipeline:
          stage  (gop-stage thread):    host prep + flat source upload
          dispatch (gop-dispatch thread): the jit calls — on the axon
            tunnel an execute() BLOCKS until the remote computation
            finishes (measured ~1.9 s/group serial on whatever thread
            issues it), so the dispatch must own its own thread or it
            becomes the pipeline wall
          entropy (gop-entropy thread): packed fetch + host CABAC
        The single dispatch thread preserves group order, which the DPB
        carry requires.  qp_for_group(): optional callable giving the QP
        for the next dispatch (rate control hook, read at dispatch
        time)."""
        pool = self._stage_pool()
        dpool = self._dispatch_pool()
        from collections import deque
        stage_q: deque = deque()
        gi = 0

        class _Chained:
            """Future-of-(entropy Future) flattened for callers."""

            def __init__(self, outer):
                self._outer = outer

            def result(self, timeout=None):
                return self._outer.result(timeout).result(timeout)

            def cancel(self):
                return self._outer.cancel()

        def refill():
            nonlocal gi
            while gi < len(groups) and len(stage_q) < lookahead:
                grp = groups[gi]
                gi += 1
                stage_q.append((grp, pool.submit(
                    self.stage_chunk, [frames[e[0]] for e in grp],
                    [e[1:] for e in grp], chunk)))

        def dispatch(grp, staged, qp):
            return self.encode_chunk_async(
                [frames[e[0]] for e in grp], [e[1:] for e in grp],
                qp=qp, chunk=chunk, staged=staged)

        while gi < len(groups) or stage_q:
            refill()
            grp, sf = stage_q.popleft()
            qp = qp_for_group() if qp_for_group is not None else None
            fut = _Chained(dpool.submit(dispatch, grp, sf.result(), qp))
            refill()
            yield grp, fut

    def encode_video_chunked(self, frames, gop: int = 0, chunk: int = 8):
        """Chunked-path counterpart of encode_video (no recons returned).

        With cfg.bframes the stream is IbPbP in decode order (the NAL
        sequence matches encode_video_b / the numpy reference)."""
        self.reset()
        out = annexb(self.parameter_sets())
        sched = b_schedule(len(frames), gop, self.cfg.bframes,
                           self.cfg.bframes_n)
        futs = [fut for _, fut in self.encode_groups_pipelined(
            frames, chunk_groups(sched, self.cfg.bframes, chunk), chunk)]
        for fut in futs:
            for nal in fut.result():
                out += b"\x00\x00\x00\x01" + nal
        return out

    def _dispatch_frame(self, y, cb, cr, idr: bool, qp: int):
        """One fused device dispatch (kernel + deblock [+ SAO] + ref pad);
        updates the device-side DPB and returns (outs, nk, is_idr)."""
        cfg = self.cfg
        yb, cbb, crb = self._to_blocks(np.asarray(y, np.int32),
                                       np.asarray(cb, np.int32),
                                       np.asarray(cr, np.int32))
        nh, nw, H, W = self._geom
        tc, tr = cfg.tile_cols, cfg.tile_rows
        tnh, tnw = nh // tr, nw // tc
        ya = jnp.asarray(self._tsplit(yb, 16))
        cba = jnp.asarray(self._tsplit(cbb, 8))
        cra = jnp.asarray(self._tsplit(crb, 8))
        is_idr = idr or self._ref_blocks is None
        if self._ref_blocks is None:
            T = tr * tc
            self._ref_blocks = (
                jnp.zeros((T, tnh * 16 + 2 * MARGIN,
                           tnw * 16 + 2 * MARGIN), jnp.int32),
                jnp.zeros((T, tnh * 8 + 2 * MARGIN_C,
                           tnw * 8 + 2 * MARGIN_C), jnp.int32),
                jnp.zeros((T, tnh * 8 + 2 * MARGIN_C,
                           tnw * 8 + 2 * MARGIN_C), jnp.int32))
        rs = RowScanEncoderV1(qp, cfg.bit_depth)
        lam16 = skip_lambda16(qp + 6 * (cfg.bit_depth - 8))
        sl16 = int(np.sqrt(0.85 * 2.0 ** (
            (qp + 6 * (cfg.bit_depth - 8) - 12) / 3.0)) * 16)
        outs = _gop_step_jit(
            ya, cba, cra, *self._ref_blocks, jnp.asarray(qp), rs.lam_bits,
            jnp.asarray(lam16, jnp.int32), jnp.asarray(sl16, jnp.int32),
            tnh, tnw, tr, tc, cfg.bit_depth,
            self.enable_nxn if is_idr else self.nxn_p, cfg.deblock, is_idr,
            cfg.sao, self.subpel, sdh=cfg.sdh, rdoq=cfg.rdoq)
        nk = 13 if is_idr else 23
        if cfg.sao:
            from hevc_tpu.ops.deblock_jax import sao_pad_jit
            souts = sao_pad_jit(outs[nk], outs[nk + 1], outs[nk + 2],
                                ya, cba, cra, jnp.asarray(qp),
                                jnp.asarray(lam16, jnp.int32),
                                tnh, tnw, tr, tc, cfg.bit_depth)
            outs = tuple(outs[:nk]) + tuple(souts)
        self._ref_blocks = outs[nk + 3:nk + 6]
        return outs, nk, is_idr

    def _encode_next_sync(self, y, cb, cr, idr: bool = False,
                          qp: int | None = None) -> tuple[bytes, dict]:
        import dataclasses
        qp = self.cfg.qp if qp is None else qp
        cfg_f = dataclasses.replace(self.cfg, qp=qp) \
            if qp != self.cfg.qp else self.cfg
        if not self.mc:
            if idr or self._ref_blocks is None:
                dec, recon, dev = self._frame_decisions(y, cb, cr, None, qp)
                self._poc = 0
                nal = entropy_encode_frame_v1(cfg_f, dec)
            else:
                dec, recon, dev = self._frame_decisions(
                    y, cb, cr, self._ref_blocks, qp)
                self._poc += 1
                nal = entropy_encode_frame_v1(cfg_f, dec, poc=self._poc)
            self._last_dec = dec
            ref = self._deblocked(recon, dec, qp)
            yb, cbb, crb = self._to_blocks(ref["y"], ref["cb"], ref["cr"])
            self._ref_blocks = (jnp.asarray(self._tsplit(yb, 16)),
                                jnp.asarray(self._tsplit(cbb, 8)),
                                jnp.asarray(self._tsplit(crb, 8)))
            return nal, ref
        raise AssertionError("MC mode is handled by encode_next_async")

    def encode_video(self, frames, gop: int = 0):
        """frames: [(y, cb, cr)] -> (annexb bytes, deblocked recons)."""
        if self.cfg.bframes:
            return self.encode_video_b(frames, gop)
        self.reset()
        out = annexb(self.parameter_sets())
        recons = []
        for i, f in enumerate(frames):
            nal, ref = self.encode_next(*f, idr=bool(gop and i % gop == 0))
            out += b"\x00\x00\x00\x01" + nal
            recons.append(ref)
        return out, recons

    def _host_pads(self, disp):
        """Padded tile planes (device) from host display planes."""
        from hevc_tpu.ops.deblock_jax import _pad_tiles_j
        cfg = self.cfg
        if not hasattr(GopEncoder, "_padj"):
            GopEncoder._padj = jax.jit(_pad_tiles_j,
                                       static_argnums=(1, 2, 3))
        return (GopEncoder._padj(jnp.asarray(disp["y"]), cfg.tile_rows,
                                 cfg.tile_cols, MARGIN),
                GopEncoder._padj(jnp.asarray(disp["cb"]), cfg.tile_rows,
                                 cfg.tile_cols, MARGIN_C),
                GopEncoder._padj(jnp.asarray(disp["cr"]), cfg.tile_rows,
                                 cfg.tile_cols, MARGIN_C))

    def encode_video_b(self, frames, gop: int = 0):
        """IbPbP GOP on device (mirror of the numpy _encode_video_b,
        reference_encoder_v1.py:673): reference pictures at even display
        offsets, one non-reference B between each pair.  Decode order
        I P2 B1 P4 B3...; returns (annexb bytes, recons in DISPLAY order).
        """
        import dataclasses
        from hevc_tpu.encoder.rowscan_v1 import (
            encode_tiles_rowscan_bmc_jit, dsf_pair)
        from hevc_tpu.encoder.reference_encoder_v1 import RefIntraEncoderV1
        cfg = self.cfg
        assert not cfg.sao, \
            "SAO + B: use encode_video_chunked (SAO runs in the chunk scan)"
        self.reset()
        out = annexb(self.parameter_sets())
        n = len(frames)
        recons = [None] * n
        starts = [k for k in range(n) if k == 0 or (gop and k % gop == 0)]
        segments = [(s, (starts + [n])[i + 1])
                    for i, s in enumerate(starts)]
        qp_b = min(cfg.qp + RefIntraEncoderV1.B_QP_OFFSET, 51)
        cfg_b = dataclasses.replace(cfg, qp=qp_b)

        def encode_b(fr, pads0, pads1, pocs):
            rs = RowScanEncoderV1(qp_b, cfg.bit_depth)
            lam16 = skip_lambda16(qp_b + 6 * (cfg.bit_depth - 8))
            sl16 = int(np.sqrt(0.85 * 2.0 ** (
                (qp_b + 6 * (cfg.bit_depth - 8) - 12) / 3.0)) * 16)
            yb, cbb, crb = self._to_blocks(np.asarray(fr[0], np.int32),
                                           np.asarray(fr[1], np.int32),
                                           np.asarray(fr[2], np.int32))
            nh, nw, H, W = self._geom
            tc, tr = cfg.tile_cols, cfg.tile_rows
            outs = encode_tiles_rowscan_bmc_jit(
                jnp.asarray(self._tsplit(yb, 16)),
                jnp.asarray(self._tsplit(cbb, 8)),
                jnp.asarray(self._tsplit(crb, 8)),
                *pads0, *pads1, jnp.asarray(qp_b), rs.lam_bits,
                jnp.asarray(lam16, jnp.int32), jnp.asarray(sl16, jnp.int32),
                jnp.asarray(dsf_pair(*pocs)),
                nh // tr, nw // tc, cfg.bit_depth, self.nxn_p, self.subpel,
                sdh=cfg.sdh, rdoq=cfg.rdoq)
            host = jax.device_get(list(outs))
            dec = self._dec_from_outs(host, p_mc=False, p_b=True)
            recon = {
                "y": self._plane(self._unstep(host[10], np.int32), 16),
                "cb": self._plane(self._unstep(host[11], np.int32), 8),
                "cr": self._plane(self._unstep(host[12], np.int32), 8),
            }
            return dec, recon

        for (s, e) in segments:
            self.reset()
            # IDR at s
            dec, recon, _ = self._frame_decisions(*frames[s], None, cfg.qp)
            disp = self._deblocked(recon, dec)
            out += b"\x00\x00\x00\x01" + entropy_encode_frame_v1(cfg, dec)
            recons[s] = disp
            prev_pads = self._host_pads(disp)
            prev_ref = s
            k = s + 2
            while prev_ref < e - 1:
                r_ = min(k, e - 1)
                poc_r = r_ - s
                dec, recon, _ = self._frame_decisions(
                    *frames[r_], prev_pads, cfg.qp)
                disp = self._deblocked(recon, dec)
                out += b"\x00\x00\x00\x01" + entropy_encode_frame_v1(
                    cfg, dec, poc=poc_r,
                    rps_idx=0 if r_ - prev_ref == 2 else 2)
                recons[r_] = disp
                cur_pads = self._host_pads(disp)
                if r_ - prev_ref == 2:
                    bidx = prev_ref + 1
                    decb, reconb = encode_b(
                        frames[bidx], prev_pads, cur_pads,
                        (bidx - s, prev_ref - s, r_ - s))
                    dispb = self._deblocked(reconb, decb, qp=qp_b)
                    out += b"\x00\x00\x00\x01" + entropy_encode_frame_v1(
                        cfg_b, decb, poc=bidx - s, b_slice=True)
                    recons[bidx] = dispb
                prev_pads = cur_pads
                prev_ref = r_
                k = r_ + 2
        return out, recons
