"""Host driver for the ctb32 device kernel (per-frame, correctness-first).

Runs rowscan32_scan_jit frame by frame, converts the z-ordered cell
outputs into the entropy array format (entropy/ctb32.py), deblocks on
host, and chains deblocked references — mirroring Ctb32RefEncoder's
encode_video exactly (tests assert bit-identical streams).  The chunked
multi-frame dispatch and the B kernel land on top of this.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from hevc_tpu.encoder.ctb32_ref import make_ctb32_config  # noqa: F401
from hevc_tpu.encoder.reference_encoder import pad_to_ctb
from hevc_tpu.encoder.ctu_modes import skip_lambda16
from hevc_tpu.encoder.rowscan_v1 import MARGIN, MARGIN_C, RowScanEncoderV1
from hevc_tpu.encoder.rowscan32 import rowscan32_scan_jit, z_to_raster
from hevc_tpu.entropy.ctb32 import entropy_encode_frame_ctb32
from hevc_tpu.entropy.headers import StreamConfig, write_vps, write_sps, \
    write_pps
from hevc_tpu.utils.bitio import annexb


class Ctb32DeviceEncoder:
    """Device (JAX) ctb32 encoder for one stream configuration."""

    def __init__(self, cfg: StreamConfig, subpel: bool = True):
        assert cfg.log2_ctb == 5 and cfg.log2_min_cb == 4 and not cfg.sao
        assert not cfg.tiles_enabled, "ctb32 tiling lands with the chunk path"
        from hevc_tpu.utils.jaxcfg import ensure_compile_cache
        ensure_compile_cache()
        self.cfg = cfg
        self.subpel = subpel

    def parameter_sets(self):
        return [write_vps(self.cfg), write_sps(self.cfg),
                write_pps(self.cfg)]

    def _blocks(self, y, cb, cr):
        ys = pad_to_ctb(np.asarray(y), 32).astype(np.int32)
        cbs = pad_to_ctb(np.asarray(cb), 16).astype(np.int32)
        crs = pad_to_ctb(np.asarray(cr), 16).astype(np.int32)
        H, W = ys.shape
        t32h, t32w = H // 32, W // 32

        def blk(p, bs):
            hh, ww = p.shape
            return p.reshape(1, hh // bs, bs, ww // bs, bs).transpose(
                0, 1, 3, 2, 4)

        return (jnp.asarray(blk(ys, 32)), jnp.asarray(blk(cbs, 16)),
                jnp.asarray(blk(crs, 16)), t32h, t32w, H, W)

    def _pads(self, disp):
        from hevc_tpu.ops.deblock_jax import _pad_tiles_j
        pj = jax.jit(_pad_tiles_j, static_argnums=(1, 2, 3))
        return (pj(jnp.asarray(disp["y"]), 1, 1, MARGIN),
                pj(jnp.asarray(disp["cb"]), 1, 1, MARGIN_C),
                pj(jnp.asarray(disp["cr"]), 1, 1, MARGIN_C))

    def encode_frame_arrays(self, y, cb, cr, ref=None):
        """One frame through the device graph -> (dec arrays, recon,
        cu_maps) in the entropy/ctb32 format."""
        cfg = self.cfg
        ya, cba, cra, t32h, t32w, H, W = self._blocks(y, cb, cr)
        qp_eff = cfg.qp + 6 * (cfg.bit_depth - 8)
        rs = RowScanEncoderV1(cfg.qp, cfg.bit_depth)
        lam16 = jnp.asarray(skip_lambda16(qp_eff), jnp.int32)
        sl16 = jnp.asarray(int(np.sqrt(0.85 * 2.0 ** ((qp_eff - 12) / 3.0))
                               * 16), jnp.int32)
        i_slice = ref is None
        if i_slice:
            zp = jnp.zeros((1, 1, 1), jnp.int32)
            pads = (zp, zp, zp)
        else:
            pads = self._pads(ref)
        cells, o32 = rowscan32_scan_jit(
            ya, cba, cra, jnp.asarray(cfg.qp), rs.lam_bits, lam16, sl16,
            *pads, t32h, t32w, cfg.bit_depth, self.subpel, i_slice)
        cells = {k: np.asarray(v) for k, v in cells.items()}
        o32 = {k: np.asarray(v) for k, v in o32.items()}
        nh16, nw16 = 2 * t32h, 2 * t32w

        def cell(k, to=None):
            a = z_to_raster(cells[k], t32h, t32w)[:, :, 0]   # (nh16, nw16,..)
            return a.astype(to) if to is not None else a

        def c32(k, to=None):
            a = o32[k].reshape(t32h, t32w, *o32[k].shape[2:])
            return a.astype(to) if to is not None else a

        z = np.zeros
        mode = cell("mode", np.int32)
        split16 = np.repeat(np.repeat(c32("split32", bool), 2, 0), 2, 1)
        cbf_y4 = z((nh16, nw16, 4), bool)
        cbf_y4[:, :, 0] = cell("cbf_y", bool)
        dec = {
            # match the numpy encoder's storage conventions exactly:
            # modes4 filled only for split intra cells; cbf_y4 index 0 only
            "modes4": np.repeat(
                np.where(split16 & (mode >= 0), mode, 0)[:, :, None], 4, 2),
            "cbf_y4": cbf_y4,
            "cbf_cb": cell("cbf_cb", bool), "cbf_cr": cell("cbf_cr", bool),
            "cbf_cb4": z((nh16, nw16, 4), bool),
            "cbf_cr4": z((nh16, nw16, 4), bool),
            "part_nxn": z((nh16, nw16), bool),
            "lvl_y": cell("lvl_y", np.int32),
            "lvl_cb": cell("lvl_cb", np.int32),
            "lvl_cr": cell("lvl_cr", np.int32),
            "split32": c32("split32", bool),
            "mvd32_1": z((t32h, t32w, 2), np.int32),
            "mvp32_1": z((t32h, t32w), np.int32),
            "dir32": z((t32h, t32w), np.int32),
            "dir": z((nh16, nw16), np.int32),
            "mvd1": z((nh16, nw16, 2), np.int32),
            "mvp1": z((nh16, nw16), np.int32),
        }
        uns = ~c32("split32", bool)        # numpy stores 32 fields only
        if i_slice:                        # for unsplit CTBs
            dec.update(
                mode32=np.where(uns, c32("mode32", np.int32), 0),
                cbf32_cb=c32("cbf32_cb", bool) & uns,
                cbf32_cr=c32("cbf32_cr", bool) & uns,
                skip32=z((t32h, t32w), bool), inter32=z((t32h, t32w), bool),
                merge32=z((t32h, t32w), bool),
                mvd32=z((t32h, t32w, 2), np.int32),
                mvp32=z((t32h, t32w), np.int32),
                rqt32=z((t32h, t32w), np.int32),
                skip=z((nh16, nw16), bool), inter=z((nh16, nw16), bool),
                merge=z((nh16, nw16), bool),
                mvd=z((nh16, nw16, 2), np.int32),
                mvp=z((nh16, nw16), np.int32),
                rqt=z((nh16, nw16), np.int32),
                cbf_yi=z((nh16, nw16), bool),
                cbf_cbi=z((nh16, nw16), bool),
                cbf_cri=z((nh16, nw16), bool),
            )
        else:
            expl32 = c32("inter32", bool) & ~c32("merge32", bool)
            dec.update(
                mode32=z((t32h, t32w), np.int32),
                cbf32_cb=c32("cbf32_cb", bool) & uns,
                cbf32_cr=c32("cbf32_cr", bool) & uns,
                skip32=c32("skip32", bool), inter32=c32("inter32", bool),
                merge32=c32("merge32", bool),
                mvd32=np.where(expl32[:, :, None], c32("mvd32", np.int32),
                               0),
                mvp32=np.where(expl32, c32("mvp32", np.int32), 0),
                rqt32=np.where(expl32, c32("rqt32", np.int32), 0),
                skip=cell("skip", bool), inter=cell("inter", bool),
                merge=cell("merge", bool),
                mvd=cell("mvd", np.int32), mvp=cell("mvp", np.int32),
                rqt=cell("rqt", np.int32),
                cbf_yi=cell("cbf_yi", bool), cbf_cbi=cell("cbf_cbi", bool),
                cbf_cri=cell("cbf_cri", bool),
            )

        if not i_slice:
            # numpy stores no levels for skip CUs, and mvd/mvp/rqt only on
            # explicit CU16 cells (the device graph routes candidate values
            # everywhere; entropy reads neither)
            sk16 = dec["skip"] | np.repeat(np.repeat(dec["skip32"], 2, 0),
                                           2, 1)
            for k in ("lvl_y", "lvl_cb", "lvl_cr"):
                dec[k] = np.where(sk16[:, :, None, None], 0, dec[k])
            expl16 = split16 & dec["inter"] & ~dec["merge"]
            dec["mvd"] = np.where(expl16[:, :, None], dec["mvd"], 0)
            dec["mvp"] = np.where(expl16, dec["mvp"], 0)
            dec["rqt"] = np.where(expl16, dec["rqt"], 0)

        def plane(k, bs):
            a = z_to_raster(cells[k], t32h, t32w)[:, :, 0]
            return a.transpose(0, 2, 1, 3).reshape(nh16 * bs, nw16 * bs) \
                .astype(np.int32)

        recon = {"y": plane("rec_y", 16), "cb": plane("rec_cb", 8),
                 "cr": plane("rec_cr", 8)}
        if i_slice:
            cu_maps = None
        else:
            intra_c = cell("intra_cell", bool)
            mv_c = cell("mv", np.int32)
            cu_maps = {
                "intra": intra_c,
                "cbf": np.where(intra_c, cell("cbf_y", bool),
                                cell("cbf_yi", bool)),
                "mv": mv_c,
                "mv1": np.zeros_like(mv_c),
                "pf": np.stack([~intra_c, np.zeros_like(intra_c)],
                               -1).astype(np.int32),
            }
        return dec, recon, cu_maps

    def _finish(self, recon, cu_maps, qp=None):
        from hevc_tpu.ops.deblock import deblock_frame
        cfg = self.cfg
        qp = cfg.qp if qp is None else qp
        dy = recon["y"].copy()
        dcb = recon["cb"].copy()
        dcr = recon["cr"].copy()
        if cfg.deblock:
            deblock_frame(dy, dcb, dcr, qp, ctb=32, bit_depth=cfg.bit_depth,
                          cu_maps=cu_maps)
        return {"y": dy, "cb": dcb, "cr": dcr}

    def encode_video(self, frames, gop: int = 0):
        """IPPP ctb32 on device -> (annexb bytes, display recons)."""
        cfg = self.cfg
        assert not cfg.bframes, "ctb32 B kernel lands in a follow-up"
        out = annexb(self.parameter_sets())
        ref = None
        recons = []
        poc = 0
        for i, f in enumerate(frames):
            idr = ref is None or (gop and i % gop == 0)
            if idr:
                dec, recon, maps = self.encode_frame_arrays(*f)
                poc = 0
            else:
                poc += 1
                dec, recon, maps = self.encode_frame_arrays(*f, ref=ref)
            disp = self._finish(recon, maps)
            out += b"\x00\x00\x00\x01" + entropy_encode_frame_ctb32(
                cfg, dec, poc=None if idr else poc)
            ref = disp
            recons.append(disp)
        return out, recons
