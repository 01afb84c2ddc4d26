"""v1 tile entropy: 2Nx2N / NxN intra CUs (CTB16), IntraSplit transform trees.

Decision dicts come from encoder.ctu_modes.encode_ctu_v1 (or the JAX graph):
per CTU: part_nxn, modes[4], cbf_y4[4], lvl_y (16x16; NxN = 8x8 quadrants),
cbf_cb/cr (parent), cbf_cb4/cr4 (children), lvl_cb/cr (8x8; NxN = 4x4 quads).
"""
from __future__ import annotations

import numpy as np

from hevc_tpu.encoder.ctu_modes import nxn_mpm_cands
from hevc_tpu.entropy import tables as T
from hevc_tpu.entropy.headers import StreamConfig
from hevc_tpu.entropy.syntax import SliceSyntaxEncoder, mpm_candidates, INTRA_DC
from hevc_tpu.entropy.tiled import assemble_slice


_POOL = None


def _tile_pool():
    """Persistent tile-CABAC thread pool (creating/joining a pool per frame
    costs more than the CABAC itself at 1080p)."""
    global _POOL
    if _POOL is None:
        from concurrent.futures import ThreadPoolExecutor
        import os
        _POOL = ThreadPoolExecutor(min(os.cpu_count() or 4, 16),
                                   "tile-cabac")
    return _POOL


def encode_tile_payload_v1(cfg: StreamConfig, ctus: list[list[dict]],
                           last_tile: bool, p_slice: bool = False,
                           sao=None, b_slice: bool = False) -> bytes:
    """ctus: [row][col] decision dicts for one tile.

    p_slice: zero-MV-skip P slice — each CTU dict may carry skip=True
    (cu_skip_flag=1, no further syntax); non-skip CUs signal
    pred_mode_flag=1 then the usual intra syntax.  CABAC initType=1.
    sao: (params_y, params_c) tile-local grids (spec 7.3.8.3, signaled
    before the coding quadtree of every CTU).
    """
    init_type = 0 if not p_slice else (2 if b_slice else 1)
    syn = SliceSyntaxEncoder(cfg.qp, init_type=init_type, sdh=cfg.sdh)
    nh = len(ctus)
    nw = len(ctus[0])
    above_skip = [0] * nw
    for cy in range(nh):
        left_modes = (INTRA_DC, INTRA_DC)
        left_skip = 0
        for cx in range(nw):
            if sao is not None:
                syn.encode_sao_ctu(sao[0][cy][cx], sao[1][cy][cx],
                                   cx > 0, cy > 0, cfg.bit_depth)
            d = ctus[cy][cx]
            skip = bool(d.get("skip")) if p_slice else False
            if p_slice:
                syn.encode_cu_skip(int(skip),
                                   left_skip if cx > 0 else 0,
                                   above_skip[cx] if cy > 0 else 0)
            if skip:
                left_modes = (INTRA_DC, INTRA_DC)
                left_skip = 1
                above_skip[cx] = 1
            elif p_slice and d.get("inter"):
                _encode_inter_ctu(syn, d, b_slice)
                left_modes = (INTRA_DC, INTRA_DC)
                left_skip = 0
                above_skip[cx] = 0
            else:
                if p_slice:
                    syn.encode_pred_mode(True)
                _encode_ctu_v1(syn, d, left_modes, cx > 0)
                m = d["modes"]
                left_modes = (int(m[1]), int(m[3])) if d["part_nxn"] \
                    else (int(m[0]), int(m[0]))
                left_skip = 0
                above_skip[cx] = 0
            last_ctu = (cy == nh - 1 and cx == nw - 1)
            syn.encode_end_of_slice(last_ctu and last_tile)
    if not last_tile:
        syn.cabac.encode_terminate(1)
    return syn.cabac.bytes_aligned()


def _encode_inter_ctu(syn: SliceSyntaxEncoder, d: dict,
                      b_slice: bool = False) -> None:
    """Non-skip inter CU (PART_2Nx2N, one ref/list): spec 7.3.8.5/7.3.8.6.

    merge: rqt_root_cbf absent (inferred 1, else the encoder emits skip).
    explicit: [inter_pred_idc in B] + mvd_coding + mvp flag per used list,
    then rqt_root_cbf.  Inter residual always uses the diagonal scan;
    cbf_luma at depth 0 is inferred 1 when both chroma cbfs are 0 (7.4.9.8).
    """
    syn.encode_pred_mode(False)
    syn.encode_part_mode_inter_2nx2n()
    if d.get("merge"):
        syn.encode_merge_flag(True)
        rqt = 1
    else:
        syn.encode_merge_flag(False)
        direction = int(d.get("dir", 0))
        if b_slice:
            syn.encode_inter_pred_idc(direction)
        if direction in (0, 2):
            syn.encode_mvd(int(d["mvd"][0]), int(d["mvd"][1]))
            syn.encode_mvp_flag(int(d["mvp"]))
        if direction in (1, 2):
            syn.encode_mvd(int(d["mvd1"][0]), int(d["mvd1"][1]))
            syn.encode_mvp_flag(int(d["mvp1"]))
        rqt = int(d["rqt"])
        syn.encode_rqt_root_cbf(rqt)
    if not rqt:
        return
    cbf_y = int(d["cbf_y"])
    cbf_cb = int(d["cbf_cb"])
    cbf_cr = int(d["cbf_cr"])
    syn.encode_cbf_chroma(cbf_cb, 0)
    syn.encode_cbf_chroma(cbf_cr, 0)
    if cbf_cb or cbf_cr:
        syn.encode_cbf_luma(cbf_y, 0)
    else:
        assert cbf_y, "rqt_root_cbf=1 with no coded residual"
    if cbf_y:
        syn.encode_residual(np.asarray(d["lvl_y"]), 4, 0, 0)
    if cbf_cb:
        syn.encode_residual(np.asarray(d["lvl_cb"]), 3, 0, 1)
    if cbf_cr:
        syn.encode_residual(np.asarray(d["lvl_cr"]), 3, 0, 2)


def _encode_ctu_v1(syn: SliceSyntaxEncoder, d: dict, left_modes, left_avail):
    part_nxn = bool(d["part_nxn"])
    modes = [int(m) for m in d["modes"]]
    syn.encode_part_mode_intra(part_nxn)

    if not part_nxn:
        cands = mpm_candidates(left_modes[0] if left_avail else INTRA_DC,
                               INTRA_DC)
        syn.encode_luma_mode(modes[0], cands)
        syn.encode_chroma_mode_dm()
        syn.encode_cbf_chroma(int(d["cbf_cb"]), 0)
        syn.encode_cbf_chroma(int(d["cbf_cr"]), 0)
        syn.encode_cbf_luma(int(d["cbf_y4"][0]), 0)
        if d["cbf_y4"][0]:
            syn.encode_residual(np.asarray(d["lvl_y"]), 4,
                                T.intra_scan_idx(4, modes[0], 0), 0)
        if d["cbf_cb"]:
            syn.encode_residual(np.asarray(d["lvl_cb"]), 3,
                                T.intra_scan_idx(3, modes[0], 1), 1)
        if d["cbf_cr"]:
            syn.encode_residual(np.asarray(d["lvl_cr"]), 3,
                                T.intra_scan_idx(3, modes[0], 1), 2)
        return

    # NxN: all four prev flags first, then mpm data (spec 7.3.8.5)
    cand_lists = []
    sofar: list[int] = []
    for i in range(4):
        cand_lists.append(nxn_mpm_cands(i, sofar, left_modes, left_avail))
        sofar.append(modes[i])
    c = syn.cabac
    flags = [1 if modes[i] in cand_lists[i] else 0 for i in range(4)]
    for f in flags:
        c.encode_bin(T.CTX_OFF["prev_intra_luma_pred"], f)
    for i in range(4):
        if flags[i]:
            idx = cand_lists[i].index(modes[i])
            c.encode_bypass(0 if idx == 0 else 1)
            if idx > 0:
                c.encode_bypass(idx - 1)
        else:
            rem = modes[i] - sum(1 for x in cand_lists[i] if x < modes[i])
            c.encode_bypass_bits(rem, 5)
    syn.encode_chroma_mode_dm()
    chroma_mode = modes[0]

    # transform tree: parent chroma cbfs (depth 0), inferred split
    pcb, pcr = int(d["cbf_cb"]), int(d["cbf_cr"])
    syn.encode_cbf_chroma(pcb, 0)
    syn.encode_cbf_chroma(pcr, 0)
    lvl_y = np.asarray(d["lvl_y"])
    lvl_cb = np.asarray(d["lvl_cb"])
    lvl_cr = np.asarray(d["lvl_cr"])
    for i in range(4):
        dx, dy = (i & 1) * 8, (i >> 1) * 8
        cbf_cb_i = int(d["cbf_cb4"][i]) if pcb else 0
        cbf_cr_i = int(d["cbf_cr4"][i]) if pcr else 0
        if pcb:
            syn.encode_cbf_chroma(cbf_cb_i, 1)
        if pcr:
            syn.encode_cbf_chroma(cbf_cr_i, 1)
        cbf_l = int(d["cbf_y4"][i])
        syn.encode_cbf_luma(cbf_l, 1)
        if cbf_l:
            syn.encode_residual(lvl_y[dy:dy + 8, dx:dx + 8], 3,
                                T.intra_scan_idx(3, modes[i], 0), 0)
        cdx, cdy = (i & 1) * 4, (i >> 1) * 4
        if cbf_cb_i:
            syn.encode_residual(lvl_cb[cdy:cdy + 4, cdx:cdx + 4], 2,
                                T.intra_scan_idx(2, chroma_mode, 1), 1)
        if cbf_cr_i:
            syn.encode_residual(lvl_cr[cdy:cdy + 4, cdx:cdx + 4], 2,
                                T.intra_scan_idx(2, chroma_mode, 1), 2)


def _pack_sao(sao, nh: int, nw: int) -> np.ndarray:
    """Per-CTU SAO param lists -> (nh, nw, 18) int8 for the C++ fast path.

    Layout: [ty_y, aux_y, off_y*4, ty_c, cls_c, pos_cb, pos_cr,
             off_cb*4, off_cr*4].
    """
    arr = np.zeros((nh, nw, 18), np.int8)
    for cy in range(nh):
        for cx in range(nw):
            p = sao[0][cy][cx]
            if p is not None:
                arr[cy, cx, 0] = p[0]
                arr[cy, cx, 1] = p[1]
                arr[cy, cx, 2:6] = p[2]
            p = sao[1][cy][cx]
            if p is not None:
                arr[cy, cx, 6] = p[0]
                if p[0] == 1:
                    arr[cy, cx, 8] = p[1][0]
                    arr[cy, cx, 9] = p[1][1]
                else:
                    arr[cy, cx, 7] = p[1]
                arr[cy, cx, 10:14] = p[2]
                arr[cy, cx, 14:18] = p[3]
    return arr


def _arrays_to_ctus(dec: dict, y0: int, x0: int, th: int, tw: int
                    ) -> list[list[dict]]:
    """Array-format decisions (from the device graph) -> per-CTU dicts."""
    out = []
    skip = dec.get("skip")
    inter = dec.get("inter")
    for cy in range(y0, y0 + th):
        row = []
        for cx in range(x0, x0 + tw):
            if skip is not None and skip[cy, cx]:
                row.append({"skip": True})
                continue
            if inter is not None and inter[cy, cx]:
                merge = bool(dec["merge"][cy, cx])
                d = {"inter": True, "merge": merge}
                rqt = 1 if merge else int(dec["rqt"][cy, cx])
                if not merge:
                    d["dir"] = int(dec["dir"][cy, cx]) if "dir" in dec else 0
                    d["mvd"] = (int(dec["mvd"][cy, cx, 0]),
                                int(dec["mvd"][cy, cx, 1]))
                    d["mvp"] = int(dec["mvp"][cy, cx])
                    if "mvd1" in dec:
                        d["mvd1"] = (int(dec["mvd1"][cy, cx, 0]),
                                     int(dec["mvd1"][cy, cx, 1]))
                        d["mvp1"] = int(dec["mvp1"][cy, cx])
                    d["rqt"] = rqt
                if rqt:
                    d.update(cbf_y=int(dec["cbf_yi"][cy, cx]),
                             cbf_cb=int(dec["cbf_cbi"][cy, cx]),
                             cbf_cr=int(dec["cbf_cri"][cy, cx]),
                             lvl_y=dec["lvl_y"][cy, cx],
                             lvl_cb=dec["lvl_cb"][cy, cx],
                             lvl_cr=dec["lvl_cr"][cy, cx])
                row.append(d)
                continue
            row.append({
                "part_nxn": bool(dec["part_nxn"][cy, cx]),
                "modes": dec["modes4"][cy, cx],
                "cbf_y4": dec["cbf_y4"][cy, cx],
                "cbf_cb": dec["cbf_cb"][cy, cx],
                "cbf_cr": dec["cbf_cr"][cy, cx],
                "cbf_cb4": dec["cbf_cb4"][cy, cx],
                "cbf_cr4": dec["cbf_cr4"][cy, cx],
                "lvl_y": dec["lvl_y"][cy, cx],
                "lvl_cb": dec["lvl_cb"][cy, cx],
                "lvl_cr": dec["lvl_cr"][cy, cx],
            })
        out.append(row)
    return out


def entropy_encode_frame_v1(cfg: StreamConfig, ctus,
                            use_cpp: bool = True,
                            poc: int | None = None,
                            sao=None, b_slice: bool = False,
                            rps_idx: int = 0, wp=None) -> bytes:
    """Frame of decisions -> slice NAL. Accepts per-CTU dict grid (numpy
    reference encoder) or the device graph's array-dict format.

    poc=None -> IDR; poc=N -> P slice (TRAIL_R) with zero-MV-skip CUs.
    sao: full-frame (params_y, params_c) grids when cfg.sao.
    """
    p_slice = poc is not None
    cpp = None
    if isinstance(ctus, dict):
        nh, nw = ctus["part_nxn"].shape
        arrays = ctus
        if use_cpp:
            from hevc_tpu.entropy import binding
            if binding.available():
                sao_arr = _pack_sao(sao, nh, nw) if sao is not None else None

                def cpp(y0, x0, th, tw, last):
                    return binding.encode_tile_payload_v1(
                        cfg.qp, arrays, y0, x0, th, tw, last,
                        p_slice=p_slice, sao=sao_arr,
                        bit_depth=cfg.bit_depth, b_slice=b_slice,
                        sdh=cfg.sdh)
        def tile(y0, x0, th, tw):
            return _arrays_to_ctus(arrays, y0, x0, th, tw)
    else:
        def tile(y0, x0, th, tw):
            return [row[x0:x0 + tw] for row in ctus[y0:y0 + th]]
        nh, nw = len(ctus), len(ctus[0])

    def payload(y0, x0, th, tw, last):
        s = None
        if sao is not None:
            s = ([r[x0:x0 + tw] for r in sao[0][y0:y0 + th]],
                 [r[x0:x0 + tw] for r in sao[1][y0:y0 + th]])
        if cpp is not None:
            return cpp(y0, x0, th, tw, last)
        return encode_tile_payload_v1(cfg, tile(y0, x0, th, tw), last,
                                      p_slice=p_slice, sao=s,
                                      b_slice=b_slice)

    sao_on = (sao is not None) if cfg.sao else None
    if not cfg.tiles_enabled:
        return assemble_slice(cfg, [payload(0, 0, nh, nw, True)], poc=poc,
                              b_slice=b_slice, rps_idx=rps_idx, sao_on=sao_on,
                              wp=wp)
    cols, rows = cfg.tile_grid()
    jobs = []
    y0 = 0
    k = 0
    total = len(cols) * len(rows)
    for th in rows:
        x0 = 0
        for tw in cols:
            k += 1
            jobs.append((y0, x0, th, tw, k == total))
            x0 += tw
        y0 += th
    if cpp is not None and len(jobs) > 3:
        # per-tile substreams are independent; the C++ encoder releases the
        # GIL, so thread across tiles (the CABAC-parallelism payoff of tiles)
        payloads = list(_tile_pool().map(lambda j: payload(*j), jobs))
    else:
        payloads = [payload(*j) for j in jobs]
    return assemble_slice(cfg, payloads, poc=poc, b_slice=b_slice,
                          rps_idx=rps_idx, sao_on=sao_on, wp=wp)
