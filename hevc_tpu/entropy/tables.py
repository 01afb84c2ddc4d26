"""CABAC constant tables (H.265 spec 9.3) and coefficient scan orders (6.5.3).

These constants define the normative entropy layer.  They are shared by the
Python CABAC encoder (cabac.py), the conformance decoder (hevc_tpu.decoder),
and mirrored in the C++ fast path (hevc_tpu/cpp/entropy.cpp).  The reference
transcoder delegated all of this to libx265/NVENC (reference
core/transcoder.py:398-412); here it is first-party.
"""
from __future__ import annotations

import numpy as np

# --- Arithmetic-coder core tables (spec Tables 9-46, 9-47) -------------------

# rangeTabLps[pStateIdx][qRangeIdx], 64x4
RANGE_TAB_LPS = np.array([
    [128, 176, 208, 240], [128, 167, 197, 227], [128, 158, 187, 216],
    [123, 150, 178, 205], [116, 142, 169, 195], [111, 135, 160, 185],
    [105, 128, 152, 175], [100, 122, 144, 166], [95, 116, 137, 158],
    [90, 110, 130, 150], [85, 104, 123, 142], [81, 99, 117, 135],
    [77, 94, 111, 128], [73, 89, 105, 122], [69, 85, 100, 116],
    [66, 80, 95, 110], [62, 76, 90, 104], [59, 72, 86, 99],
    [56, 69, 81, 94], [53, 65, 77, 89], [51, 62, 73, 85],
    [48, 59, 69, 80], [46, 56, 66, 76], [43, 53, 63, 72],
    [41, 50, 59, 69], [39, 48, 56, 65], [37, 45, 54, 62],
    [35, 43, 51, 59], [33, 41, 48, 56], [32, 39, 46, 53],
    [30, 37, 43, 50], [29, 35, 41, 48], [27, 33, 39, 45],
    [26, 31, 37, 43], [24, 30, 35, 41], [23, 28, 33, 39],
    [22, 27, 32, 37], [21, 26, 30, 35], [20, 24, 29, 33],
    [19, 23, 27, 31], [18, 22, 26, 30], [17, 21, 25, 28],
    [16, 20, 23, 27], [15, 19, 22, 25], [14, 18, 21, 24],
    [14, 17, 20, 23], [13, 16, 19, 22], [12, 15, 18, 21],
    [12, 14, 17, 20], [11, 14, 16, 19], [11, 13, 15, 18],
    [10, 12, 15, 17], [10, 12, 14, 16], [9, 11, 13, 15],
    [9, 11, 12, 14], [8, 10, 12, 14], [8, 9, 11, 13],
    [7, 9, 11, 12], [7, 9, 10, 12], [7, 8, 10, 11],
    [6, 8, 9, 11], [6, 7, 9, 10], [6, 7, 8, 9],
    [2, 2, 2, 2],
], dtype=np.int32)

# transIdxLps[pStateIdx] (spec Table 9-47)
TRANS_IDX_LPS = np.array([
    0, 0, 1, 2, 2, 4, 4, 5, 6, 7, 8, 9, 9, 11, 11, 12,
    13, 13, 15, 15, 16, 16, 18, 18, 19, 19, 21, 21, 22, 22, 23, 24,
    24, 25, 26, 26, 27, 27, 28, 29, 29, 30, 30, 30, 31, 32, 32, 33,
    33, 33, 34, 34, 35, 35, 35, 36, 36, 36, 37, 37, 37, 38, 38, 63,
], dtype=np.int32)

# transIdxMps[pStateIdx]
TRANS_IDX_MPS = np.array(
    [min(i + 1, 62) for i in range(63)] + [63], dtype=np.int32)


def init_context(init_value: int, qp: int) -> tuple[int, int]:
    """Spec 9.3.2.2: initValue + SliceQpY -> (pStateIdx, valMps)."""
    slope = (init_value >> 4) * 5 - 45
    offset = ((init_value & 15) << 3) - 16
    pre = min(max(1, ((slope * min(max(qp, 0), 51)) >> 4) + offset), 126)
    if pre <= 63:
        return 63 - pre, 0
    return pre - 64, 1


# --- Context-variable layout & init values (initType 0 = I-slice) -----------
# Flat context index space. Offsets below are this framework's own layout.

CTX_OFF = {}
_INIT_I: list[int] = []


def _reg(name: str, init_values: list[int]) -> None:
    CTX_OFF[name] = len(_INIT_I)
    _INIT_I.extend(init_values)


CNU = 154  # "context not used" filler

_reg("sao_merge", [153])
_reg("sao_type_idx", [200])
_reg("split_cu", [139, 141, 157])
_reg("cu_transquant_bypass", [154])
_reg("cu_skip", [CNU, CNU, CNU])            # P/B only
_reg("pred_mode", [CNU])                    # P/B only
_reg("part_mode", [184, CNU, CNU, CNU])
_reg("prev_intra_luma_pred", [184])
_reg("intra_chroma_pred_mode", [63])
_reg("rqt_root_cbf", [CNU])                 # inter only
_reg("merge_flag", [CNU])
_reg("merge_idx", [CNU])
_reg("inter_pred_idc", [CNU] * 5)
_reg("ref_idx", [CNU, CNU])
_reg("mvd", [CNU, CNU])
_reg("mvp_flag", [CNU])
_reg("split_transform", [153, 138, 138])
_reg("cbf_luma", [111, 141])
_reg("cbf_chroma", [94, 138, 182, 154, 154])
_reg("transform_skip", [139, 139])          # [luma, chroma]
_reg("cu_qp_delta_abs", [154, 154])
# last_sig_coeff prefix: 15 luma + 3 chroma contexts, x and y separate
_LAST_I = [110, 110, 124, 125, 140, 153, 125, 127, 140,
           109, 111, 143, 127, 111, 79, 108, 123, 63]
_reg("last_x", _LAST_I)
_reg("last_y", list(_LAST_I))
_reg("csbf", [91, 171, 134, 141])
_reg("sig", [111, 111, 125, 110, 110, 94, 124, 108, 124,
             107, 125, 141, 179, 153, 125,
             107, 125, 141, 179, 153, 125,
             107, 125, 141, 179, 153, 125,
             140, 139, 182, 182, 152, 136, 152, 136, 153,
             136, 139, 111, 136, 139, 111])
_reg("gt1", [140, 92, 137, 138, 140, 152, 138, 139,
             153, 74, 149, 92, 139, 107, 122, 152,
             140, 179, 166, 182, 140, 227, 122, 197])
_reg("gt2", [138, 153, 136, 167, 152, 152])

INIT_VALUES_I = np.array(_INIT_I, dtype=np.int32)
NUM_CTX = len(_INIT_I)


def init_states(qp: int) -> tuple[np.ndarray, np.ndarray]:
    """All context states for an I slice at the given SliceQpY."""
    states = np.empty(NUM_CTX, dtype=np.int32)
    mps = np.empty(NUM_CTX, dtype=np.int32)
    for i, iv in enumerate(INIT_VALUES_I):
        states[i], mps[i] = init_context(int(iv), qp)
    return states, mps


# --- Scan orders (spec 6.5.3) ------------------------------------------------

SCAN_DIAG, SCAN_HORIZ, SCAN_VERT = 0, 1, 2


def _diag_scan(n: int) -> np.ndarray:
    """Up-right diagonal scan: list of (x, y) in scan order."""
    out = []
    x = y = 0
    while len(out) < n * n:
        while y >= 0:
            if x < n and y < n:
                out.append((x, y))
            y -= 1
            x += 1
        y = x
        x = 0
    return np.array(out, dtype=np.int32)


def _horiz_scan(n: int) -> np.ndarray:
    return np.array([(x, y) for y in range(n) for x in range(n)], dtype=np.int32)


def _vert_scan(n: int) -> np.ndarray:
    return np.array([(x, y) for x in range(n) for y in range(n)], dtype=np.int32)


def _flat_scan(scan_idx: int, n: int) -> np.ndarray:
    if scan_idx == SCAN_HORIZ:
        return _horiz_scan(n)
    if scan_idx == SCAN_VERT:
        return _vert_scan(n)
    return _diag_scan(n)


def scan_order(scan_idx: int, n: int) -> np.ndarray:
    """(n*n, 2) array of (x, y) positions in coefficient scan order.

    For n > 4 the scan is hierarchical (spec 6.5.1): 4x4 sub-blocks are
    visited in scan order, and positions within each sub-block use the same
    scan.  For n <= 4 it is the plain scan.
    """
    if n <= 4:
        return _flat_scan(scan_idx, n)
    inner = _flat_scan(scan_idx, 4)
    sbs = _flat_scan(scan_idx, n >> 2)
    out = np.empty((n * n, 2), dtype=np.int32)
    k = 0
    for xs, ys in sbs:
        for x4, y4 in inner:
            out[k, 0] = xs * 4 + x4
            out[k, 1] = ys * 4 + y4
            k += 1
    return out


def intra_scan_idx(log2_size: int, pred_mode: int, c_idx: int,
                   chroma_array_type: int = 1) -> int:
    """Spec 7.4.9.11: mode-dependent scan for small intra TBs.

    Applies to log2 size 2 (any plane) and size 3 for luma (or any plane in
    4:4:4).  Chroma 8x8 at 4:2:0 always uses the diagonal scan.
    """
    if log2_size == 2 or (log2_size == 3 and (c_idx == 0 or chroma_array_type == 3)):
        if 6 <= pred_mode <= 14:
            return SCAN_VERT
        if 22 <= pred_mode <= 30:
            return SCAN_HORIZ
    return SCAN_DIAG


# sig_coeff_flag ctxIdxMap for 4x4 TBs (spec 9.3.4.2.5), indexed (y<<2)|x
SIG_CTX_MAP_4x4 = np.array(
    [0, 1, 4, 5,
     2, 3, 4, 5,
     6, 6, 8, 8,
     7, 7, 8, 8], dtype=np.int32)


def sig_ctx_inc(log2_size: int, scan_idx: int, xc: int, yc: int,
                c_idx: int, csbf_right: int, csbf_below: int) -> int:
    """Spec 9.3.4.2.5 context derivation for sig_coeff_flag."""
    if log2_size == 2:
        sig = int(SIG_CTX_MAP_4x4[(yc << 2) | xc])
    elif xc + yc == 0:
        sig = 0
    else:
        xp, yp = xc & 3, yc & 3
        prev = csbf_right + 2 * csbf_below
        if prev == 0:
            sig = 2 if xp + yp == 0 else (1 if xp + yp < 3 else 0)
        elif prev == 1:
            sig = 2 if yp == 0 else (1 if yp == 1 else 0)
        elif prev == 2:
            sig = 2 if xp == 0 else (1 if xp == 1 else 0)
        else:
            sig = 2
        if c_idx == 0:
            if (xc >> 2) + (yc >> 2) > 0:
                sig += 3
            sig += (9 if scan_idx == SCAN_DIAG else 15) if log2_size == 3 else 21
        else:
            sig += 9 if log2_size == 3 else 12
    return sig if c_idx == 0 else 27 + sig


def last_prefix_ctx(log2_size: int, c_idx: int, bin_idx: int) -> int:
    """Spec 9.3.4.2.3: ctxInc for last_sig_coeff_{x,y}_prefix bins."""
    if c_idx == 0:
        offset = 3 * (log2_size - 2) + ((log2_size - 1) >> 2)
        shift = (log2_size + 1) >> 2
    else:
        offset = 15
        shift = log2_size - 2
    return (bin_idx >> shift) + offset
