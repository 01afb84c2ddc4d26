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


# --- Context-variable layout & init values (initType 0/1/2 = I/P/B) ----------
# Layout and values follow the spec's context grouping; all three init arrays
# were verified byte-for-byte against the tables compiled into libavcodec.

CTX_OFF = {
    "sao_merge": 0,
    "sao_type_idx": 1,
    "split_cu": 2,                  # 3
    "cu_transquant_bypass": 5,
    "cu_skip": 6,                   # 3
    "cu_qp_delta_abs": 9,           # 3
    "pred_mode": 12,
    "part_mode": 13,                # 4
    "prev_intra_luma_pred": 17,
    "intra_chroma_pred_mode": 18,   # 2 (second unused)
    "merge_flag": 20,
    "merge_idx": 21,
    "inter_pred_idc": 22,           # 5
    "ref_idx": 27,                  # 4 (l0 + l1)
    "mvd": 31,                      # 4 (greater0/greater1 x2)
    "mvp_flag": 35,
    "rqt_root_cbf": 36,
    "split_transform": 37,          # 3
    "cbf_luma": 40,                 # 2
    "cbf_chroma": 42,               # 5
    "transform_skip": 47,           # 2 (+4 rdpcm)
    "last_x": 53,                   # 18
    "last_y": 71,                   # 18
    "csbf": 89,                     # 4
    "sig": 93,                      # 44 (42 + 2 transform-skip)
    "gt1": 137,                     # 24
    "gt2": 161,                     # 6
}
NUM_CTX = 179

INIT_VALUES = np.array([
    # initType 0 (I slices)
    [153, 200, 139, 141, 157, 154, 154, 154, 154, 154, 154, 154, 154, 184,
     154, 154, 154, 184, 63, 139, 154, 154, 154, 154, 154, 154, 154, 154,
     154, 154, 154, 154, 154, 154, 154, 154, 154, 153, 138, 138, 111, 141,
     94, 138, 182, 154, 154, 139, 139, 139, 139, 139, 139, 110, 110, 124,
     125, 140, 153, 125, 127, 140, 109, 111, 143, 127, 111, 79, 108, 123,
     63, 110, 110, 124, 125, 140, 153, 125, 127, 140, 109, 111, 143, 127,
     111, 79, 108, 123, 63, 91, 171, 134, 141, 111, 111, 125, 110, 110, 94,
     124, 108, 124, 107, 125, 141, 179, 153, 125, 107, 125, 141, 179, 153,
     125, 107, 125, 141, 179, 153, 125, 140, 139, 182, 182, 152, 136, 152,
     136, 153, 136, 139, 111, 136, 139, 111, 141, 111, 140, 92, 137, 138,
     140, 152, 138, 139, 153, 74, 149, 92, 139, 107, 122, 152, 140, 179,
     166, 182, 140, 227, 122, 197, 138, 153, 136, 167, 152, 152, 154, 154,
     154, 154, 154, 154, 154, 154, 154, 154, 154, 154],
    # initType 1 (P slices)
    [153, 185, 107, 139, 126, 154, 197, 185, 201, 154, 154, 154, 149, 154,
     139, 154, 154, 154, 152, 139, 110, 122, 95, 79, 63, 31, 31, 153, 153,
     153, 153, 140, 198, 140, 198, 168, 79, 124, 138, 94, 153, 111, 149,
     107, 167, 154, 154, 139, 139, 139, 139, 139, 139, 125, 110, 94, 110,
     95, 79, 125, 111, 110, 78, 110, 111, 111, 95, 94, 108, 123, 108, 125,
     110, 94, 110, 95, 79, 125, 111, 110, 78, 110, 111, 111, 95, 94, 108,
     123, 108, 121, 140, 61, 154, 155, 154, 139, 153, 139, 123, 123, 63,
     153, 166, 183, 140, 136, 153, 154, 166, 183, 140, 136, 153, 154, 166,
     183, 140, 136, 153, 154, 170, 153, 123, 123, 107, 121, 107, 121, 167,
     151, 183, 140, 151, 183, 140, 140, 140, 154, 196, 196, 167, 154, 152,
     167, 182, 182, 134, 149, 136, 153, 121, 136, 137, 169, 194, 166, 167,
     154, 167, 137, 182, 107, 167, 91, 122, 107, 167, 154, 154, 154, 154,
     154, 154, 154, 154, 154, 154, 154, 154],
    # initType 2 (B slices)
    [153, 160, 107, 139, 126, 154, 197, 185, 201, 154, 154, 154, 134, 154,
     139, 154, 154, 183, 152, 139, 154, 137, 95, 79, 63, 31, 31, 153, 153,
     153, 153, 169, 198, 169, 198, 168, 79, 224, 167, 122, 153, 111, 149,
     92, 167, 154, 154, 139, 139, 139, 139, 139, 139, 125, 110, 124, 110,
     95, 94, 125, 111, 111, 79, 125, 126, 111, 111, 79, 108, 123, 93, 125,
     110, 124, 110, 95, 94, 125, 111, 111, 79, 125, 126, 111, 111, 79, 108,
     123, 93, 121, 140, 61, 154, 170, 154, 139, 153, 139, 123, 123, 63,
     124, 166, 183, 140, 136, 153, 154, 166, 183, 140, 136, 153, 154, 166,
     183, 140, 136, 153, 154, 170, 153, 138, 138, 122, 121, 122, 121, 167,
     151, 183, 140, 151, 183, 140, 140, 140, 154, 196, 167, 167, 154, 152,
     167, 182, 182, 134, 149, 136, 153, 121, 136, 122, 169, 208, 166, 167,
     154, 152, 167, 182, 107, 167, 91, 107, 107, 167, 154, 154, 154, 154,
     154, 154, 154, 154, 154, 154, 154, 154],
], dtype=np.int32)

INIT_VALUES_I = INIT_VALUES[0]


def init_states(qp: int, init_type: int = 0) -> tuple[np.ndarray, np.ndarray]:
    """All context states for a slice at the given SliceQpY and initType
    (0=I, 1=P, 2=B)."""
    states = np.empty(NUM_CTX, dtype=np.int32)
    mps = np.empty(NUM_CTX, dtype=np.int32)
    for i, iv in enumerate(INIT_VALUES[init_type]):
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
