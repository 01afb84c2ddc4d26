"""Top-level encode pipeline: TPU encode graph -> host entropy -> NAL stream.

encode_video() is the in-framework replacement for the reference's
`build_ffmpeg_command` + `run_ffmpeg` subprocess pair (reference
core/transcoder.py:452-535): frames go to the jit-compiled wavefront encoder
(device), per-CTU decisions come back, and CABAC + NAL packing run host-side.
"""
from __future__ import annotations

import numpy as np

from hevc_tpu.entropy.headers import StreamConfig, write_vps, write_sps, write_pps, \
    write_slice_header_idr
from hevc_tpu.entropy.syntax import SliceSyntaxEncoder, mpm_candidates, INTRA_DC
from hevc_tpu.entropy import tables as T
from hevc_tpu.utils.bitio import make_nal, NAL_IDR_W_RADL


def entropy_encode_frame(cfg: StreamConfig, dec: dict,
                         use_cpp: bool = True) -> bytes:
    """Serialize one frame's CTU decisions into an IDR slice NAL.

    dec: dict with modes (nh, nw), cbf_y/cb/cr (nh, nw), lvl_y (nh, nw, 16, 16),
    lvl_cb/cr (nh, nw, 8, 8) -- the output of the encode graph (v0 profile).
    Uses the C++ fast path when available (byte-identical, tested).
    """
    nh, nw = dec["modes"].shape
    qp = cfg.qp
    if use_cpp:
        from hevc_tpu.entropy import binding
        if binding.available():
            payload = binding.encode_slice_payload_v0(qp, dec, sdh=cfg.sdh)
            rbsp = write_slice_header_idr(cfg).bytes() + payload
            return make_nal(NAL_IDR_W_RADL, rbsp)
    syn = SliceSyntaxEncoder(qp, sdh=cfg.sdh)
    modes = dec["modes"]
    for cy in range(nh):
        for cx in range(nw):
            mode = int(modes[cy, cx])
            cand_a = int(modes[cy, cx - 1]) if cx > 0 else INTRA_DC
            cands = mpm_candidates(cand_a, INTRA_DC)
            syn.encode_part_mode_intra(False)
            syn.encode_luma_mode(mode, cands)
            syn.encode_chroma_mode_dm()
            cbf_y = int(dec["cbf_y"][cy, cx])
            cbf_cb = int(dec["cbf_cb"][cy, cx])
            cbf_cr = int(dec["cbf_cr"][cy, cx])
            syn.encode_cbf_chroma(cbf_cb, 0)
            syn.encode_cbf_chroma(cbf_cr, 0)
            syn.encode_cbf_luma(cbf_y, 0)
            if cbf_y:
                syn.encode_residual(dec["lvl_y"][cy, cx], 4,
                                    T.intra_scan_idx(4, mode, 0), 0)
            if cbf_cb:
                syn.encode_residual(dec["lvl_cb"][cy, cx], 3,
                                    T.intra_scan_idx(3, mode, 1), 1)
            if cbf_cr:
                syn.encode_residual(dec["lvl_cr"][cy, cx], 3,
                                    T.intra_scan_idx(3, mode, 1), 2)
            syn.encode_end_of_slice(cy == nh - 1 and cx == nw - 1)
    rbsp = write_slice_header_idr(cfg).bytes() + syn.cabac.bytes_aligned()
    return make_nal(NAL_IDR_W_RADL, rbsp)


class VideoEncoder:
    """Stateful per-stream encoder (v0: all-intra, fixed QP)."""

    def __init__(self, cfg: StreamConfig, backend: str = "jax"):
        self.cfg = cfg
        self.backend = backend
        if backend == "jax":
            from hevc_tpu.encoder.frame_jax import JaxIntraEncoder
            self._enc = JaxIntraEncoder(cfg.qp, cfg.bit_depth)
        else:
            from hevc_tpu.encoder.reference_encoder import RefIntraEncoder
            self._enc = RefIntraEncoder(cfg)

    def parameter_sets(self) -> list[bytes]:
        return [write_vps(self.cfg), write_sps(self.cfg), write_pps(self.cfg)]

    def encode_frame(self, y, cb, cr) -> tuple[bytes, dict]:
        """Returns (slice NAL, recon planes)."""
        if self.backend == "jax":
            from hevc_tpu.encoder.rowscan_jax import RowScanEncoder
            from hevc_tpu.entropy.tiled import entropy_encode_frame_tiled
            rs = RowScanEncoder(self.cfg.qp, self.cfg.bit_depth)
            res = rs.encode_frames_tiled(
                [(y, cb, cr)], self.cfg.tile_cols, self.cfg.tile_rows)[0]
            return entropy_encode_frame_tiled(self.cfg, res), res["recon"]
        assert not self.cfg.tiles_enabled, "reference backend: tiles via jax"
        return self._enc.encode_frame(y, cb, cr)
