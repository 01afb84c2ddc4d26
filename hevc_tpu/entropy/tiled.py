"""Tiled slice assembly: per-tile CABAC substreams + entry point offsets.

Tiles are THE TPU-native parallelism unit for this framework (SURVEY section
2 'intra-frame spatial parallelism'): each tile is an independently
decodable region, so the device encodes all tiles of all batched frames as
one big vmap batch, and host CABAC runs per-tile (parallelizable).

Entry point offsets are expressed in EBSP bytes (emulation-prevention bytes
count, spec 7.4.7.1).  Every substream ends byte-aligned with a nonzero final
byte (flush stop bit / alignment one bit), so emulation-prevention zero runs
never cross substream boundaries and per-substream EBSP sizes are computable
independently.
"""
from __future__ import annotations

import numpy as np

from hevc_tpu.entropy.headers import StreamConfig, write_slice_header_idr, \
    write_slice_header_p, write_slice_header_b
from hevc_tpu.utils.bitio import make_nal, rbsp_to_ebsp, NAL_IDR_W_RADL, \
    NAL_TRAIL_R, NAL_TRAIL_N


def _ebsp_len(payload: bytes) -> int:
    return len(rbsp_to_ebsp(payload))


def split_tiles(dec: dict, cfg: StreamConfig) -> list[dict]:
    """Split frame-level decision arrays into per-tile dicts (raster order)."""
    cols, rows = cfg.tile_grid()
    out = []
    y0 = 0
    for th in rows:
        x0 = 0
        for tw in cols:
            tile = {k: v[y0:y0 + th, x0:x0 + tw] for k, v in dec.items()
                    if isinstance(v, np.ndarray) and v.ndim >= 2
                    and v.shape[:2] == dec["modes"].shape}
            out.append(tile)
            x0 += tw
        y0 += th
    return out


def encode_tile_payload(cfg: StreamConfig, tile: dict, last_tile: bool,
                        use_cpp: bool = True) -> bytes:
    """One tile's CABAC substream (byte aligned)."""
    if use_cpp:
        from hevc_tpu.entropy import binding
        if binding.available():
            return binding.encode_tile_payload_v0(cfg.qp, tile, last_tile,
                                                  sdh=cfg.sdh)
    from hevc_tpu.entropy.syntax import SliceSyntaxEncoder, mpm_candidates, \
        INTRA_DC
    from hevc_tpu.entropy import tables as T
    nh, nw = tile["modes"].shape
    syn = SliceSyntaxEncoder(cfg.qp, sdh=cfg.sdh)
    modes = tile["modes"]
    for cy in range(nh):
        for cx in range(nw):
            mode = int(modes[cy, cx])
            cand_a = int(modes[cy, cx - 1]) if cx > 0 else INTRA_DC
            cands = mpm_candidates(cand_a, INTRA_DC)
            syn.encode_part_mode_intra(False)
            syn.encode_luma_mode(mode, cands)
            syn.encode_chroma_mode_dm()
            cbf_y = int(tile["cbf_y"][cy, cx])
            cbf_cb = int(tile["cbf_cb"][cy, cx])
            cbf_cr = int(tile["cbf_cr"][cy, cx])
            syn.encode_cbf_chroma(cbf_cb, 0)
            syn.encode_cbf_chroma(cbf_cr, 0)
            syn.encode_cbf_luma(cbf_y, 0)
            if cbf_y:
                syn.encode_residual(tile["lvl_y"][cy, cx], 4,
                                    T.intra_scan_idx(4, mode, 0), 0)
            if cbf_cb:
                syn.encode_residual(tile["lvl_cb"][cy, cx], 3,
                                    T.intra_scan_idx(3, mode, 1), 1)
            if cbf_cr:
                syn.encode_residual(tile["lvl_cr"][cy, cx], 3,
                                    T.intra_scan_idx(3, mode, 1), 2)
            is_last_ctu = (cy == nh - 1 and cx == nw - 1)
            syn.encode_end_of_slice(is_last_ctu and last_tile)
    if last_tile:
        return syn.cabac.bytes_aligned()
    # end_of_subset_one_bit (terminate=1): the flush's trailing '1' IS the
    # byte_alignment() alignment bit; pad zeros only (verified bit-exact
    # against libavcodec 59 sequential and 62 entry-point tile decoding).
    syn.cabac.encode_terminate(1)
    return syn.cabac.bytes_aligned()


def assemble_slice(cfg: StreamConfig, payloads: list[bytes],
                   poc: int | None = None, b_slice: bool = False,
                   rps_idx: int = 0, sao_on: bool | None = None,
                   wp=None) -> bytes:
    """Slice NAL from per-tile substreams (entry points in EBSP bytes).

    poc=None -> IDR (I slice); poc=N -> TRAIL_R P slice (or, with b_slice,
    a non-reference TRAIL_N B slice).  sao_on: per-slice SAO flags (None ->
    cfg.sao; the chunked path codes non-reference B slices with SAO off).
    """
    offs = [_ebsp_len(p) for p in payloads[:-1]] if len(payloads) > 1 else None
    if poc is None:
        hdr = write_slice_header_idr(cfg, offs, sao_on=sao_on).bytes()
        return make_nal(NAL_IDR_W_RADL, hdr + b"".join(payloads))
    if b_slice:
        hdr = write_slice_header_b(cfg, poc, offs, sao_on=sao_on,
                                   rps_idx=rps_idx or 1).bytes()
        return make_nal(NAL_TRAIL_N, hdr + b"".join(payloads))
    hdr = write_slice_header_p(cfg, poc, offs, rps_idx=rps_idx,
                               sao_on=sao_on, wp=wp).bytes()
    return make_nal(NAL_TRAIL_R, hdr + b"".join(payloads))


def entropy_encode_frame_tiled(cfg: StreamConfig, dec: dict,
                               use_cpp: bool = True) -> bytes:
    """Full tiled (or untiled) frame -> slice NAL."""
    if not cfg.tiles_enabled:
        payload = encode_tile_payload(cfg, dec, last_tile=True,
                                      use_cpp=use_cpp)
        return assemble_slice(cfg, [payload])
    tiles = split_tiles(dec, cfg)
    payloads = [encode_tile_payload(cfg, t, last_tile=(i == len(tiles) - 1),
                                    use_cpp=use_cpp)
                for i, t in enumerate(tiles)]
    return assemble_slice(cfg, payloads)
