"""ctypes binding to the C++ entropy fast path (hevc_tpu/cpp/entropy.cpp).

Falls back to the pure-Python encoder (hevc_tpu.entropy.syntax) when the
shared library cannot be built.  Output bytes are asserted identical between
the two in tests/test_entropy_cpp.py.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_LIB_DIR = Path(__file__).resolve().parent.parent / "cpp"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    so = _LIB_DIR / "libhevc_entropy.so"
    if not so.exists():
        try:
            subprocess.run(["make", "-C", str(_LIB_DIR), so.name],
                           check=True, capture_output=True, timeout=120)
        except Exception:
            _lib = False
            return False
    try:
        lib = ctypes.CDLL(str(so))
    except OSError:
        _lib = False
        return False
    lib.hevc_entropy_encode_slice_v0.restype = ctypes.c_long
    lib.hevc_entropy_encode_slice_v0.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_long]
    lib.hevc_entropy_encode_tile_v0.restype = ctypes.c_long
    lib.hevc_entropy_encode_tile_v0.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_long]
    lib.hevc_entropy_encode_tile_v1.restype = ctypes.c_long
    lib.hevc_entropy_encode_tile_v1.argtypes = (
        [ctypes.c_int] * 4 + [ctypes.c_int] + [ctypes.c_void_p] * 9
        + [ctypes.c_int, ctypes.c_void_p]
        + [ctypes.c_int] + [ctypes.c_void_p] * 3
        + [ctypes.c_void_p] * 10
        + [ctypes.c_int, ctypes.c_void_p, ctypes.c_long])
    try:
        lib.hevc_entropy_encode_tile_ctb32.restype = ctypes.c_long
        lib.hevc_entropy_encode_tile_ctb32.argtypes = (
            [ctypes.c_int] * 7 + [ctypes.c_void_p] * 33
            + [ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p,
               ctypes.c_int, ctypes.c_void_p, ctypes.c_long])
    except AttributeError:
        pass                      # stale .so without the ctb32 entry point
    _lib = lib
    return lib


def encode_tile_payload_v1(qp: int, dec: dict, y0: int, x0: int,
                           th: int, tw: int, last_tile: bool,
                           p_slice: bool = False, sao=None,
                           bit_depth: int = 8,
                           b_slice: bool = False,
                           sdh: bool = False) -> bytes | None:
    """v1 tile substream from array-format decisions (device graph output)."""
    lib = _load()
    if not lib:
        return None
    sl = np.s_[y0:y0 + th, x0:x0 + tw]
    keep = []                       # keep contiguous copies alive

    def ptr(key, dt):
        if key not in dec:
            return 0
        a = np.ascontiguousarray(dec[key][sl], dtype=dt)
        keep.append(a)
        return a.ctypes.data

    skip_ptr = ptr("skip", np.uint8) if p_slice else 0
    inter_ptr = ptr("inter", np.uint8) if p_slice else 0
    merge_ptr = ptr("merge", np.uint8) if p_slice else 0
    mvd_ptr = ptr("mvd", np.int16) if p_slice else 0
    mvp_ptr = ptr("mvp", np.uint8) if p_slice else 0
    rqt_ptr = ptr("rqt", np.uint8) if p_slice else 0
    cbf_yi_ptr = ptr("cbf_yi", np.uint8) if p_slice else 0
    cbf_cbi_ptr = ptr("cbf_cbi", np.uint8) if p_slice else 0
    cbf_cri_ptr = ptr("cbf_cri", np.uint8) if p_slice else 0
    dir_ptr = ptr("dir", np.uint8) if b_slice else 0
    mvd1_ptr = ptr("mvd1", np.int16) if b_slice else 0
    mvp1_ptr = ptr("mvp1", np.uint8) if b_slice else 0
    sao_ptr = 0
    if sao is not None:
        s = np.ascontiguousarray(sao[y0:y0 + th, x0:x0 + tw], dtype=np.int8)
        keep.append(s)
        sao_ptr = s.ctypes.data
    part = np.ascontiguousarray(dec["part_nxn"][sl], dtype=np.uint8)
    modes4 = np.ascontiguousarray(dec["modes4"][sl], dtype=np.int32)
    cbf_y4 = np.ascontiguousarray(dec["cbf_y4"][sl], dtype=np.uint8)
    cbf_cb = np.ascontiguousarray(dec["cbf_cb"][sl], dtype=np.uint8)
    cbf_cr = np.ascontiguousarray(dec["cbf_cr"][sl], dtype=np.uint8)
    cbf_cb4 = np.ascontiguousarray(dec["cbf_cb4"][sl], dtype=np.uint8)
    cbf_cr4 = np.ascontiguousarray(dec["cbf_cr4"][sl], dtype=np.uint8)
    lvl_y = np.ascontiguousarray(dec["lvl_y"][sl], dtype=np.int16)
    lvl_cb = np.ascontiguousarray(dec["lvl_cb"][sl], dtype=np.int16)
    lvl_cr = np.ascontiguousarray(dec["lvl_cr"][sl], dtype=np.int16)
    cap = max(1 << 16, lvl_y.nbytes * 2)
    out = (ctypes.c_ubyte * cap)()
    n = lib.hevc_entropy_encode_tile_v1(
        qp, th, tw, 1 if last_tile else 0,
        1 if p_slice else 0, skip_ptr, inter_ptr, merge_ptr, mvd_ptr,
        mvp_ptr, rqt_ptr, cbf_yi_ptr, cbf_cbi_ptr, cbf_cri_ptr,
        bit_depth, sao_ptr,
        1 if b_slice else 0, dir_ptr, mvd1_ptr, mvp1_ptr,
        part.ctypes.data, modes4.ctypes.data, cbf_y4.ctypes.data,
        cbf_cb.ctypes.data, cbf_cr.ctypes.data, cbf_cb4.ctypes.data,
        cbf_cr4.ctypes.data, lvl_y.ctypes.data, lvl_cb.ctypes.data,
        lvl_cr.ctypes.data, 1 if sdh else 0, out, cap)
    if n < 0:
        raise RuntimeError(f"entropy v1 fast path error {n}")
    return bytes(bytearray(out[:n]))


CTB32_HAS_MERGE_IDX = True     # fast path codes merge_idx (max_merge > 1)


def encode_tile_payload_ctb32(qp: int, dec: dict, y320: int, x320: int,
                              th32: int, tw32: int, last_tile: bool,
                              p_slice: bool = False, bit_depth: int = 8,
                              b_slice: bool = False,
                              sdh: bool = False, sao=None,
                              max_merge: int = 1) -> bytes | None:
    """ctb32 tile substream from the entropy/ctb32.py array format."""
    lib = _load()
    if not lib or not hasattr(lib, "hevc_entropy_encode_tile_ctb32"):
        return None
    s16 = np.s_[2 * y320:2 * (y320 + th32), 2 * x320:2 * (x320 + tw32)]
    s32 = np.s_[y320:y320 + th32, x320:x320 + tw32]
    keep = []

    def ptr(key, dt, sl):
        a = np.ascontiguousarray(dec[key][sl], dtype=dt)
        keep.append(a)
        return a.ctypes.data

    args = [qp, th32, tw32, 1 if last_tile else 0, 1 if p_slice else 0,
            1 if b_slice else 0, bit_depth]
    for key, dt in (("skip", np.uint8), ("inter", np.uint8),
                    ("merge", np.uint8), ("mvd", np.int16),
                    ("mvp", np.uint8), ("rqt", np.uint8),
                    ("cbf_yi", np.uint8), ("cbf_cbi", np.uint8),
                    ("cbf_cri", np.uint8), ("dir", np.uint8),
                    ("mvd1", np.int16), ("mvp1", np.uint8),
                    ("modes4", np.int32), ("cbf_y4", np.uint8),
                    ("cbf_cb", np.uint8), ("cbf_cr", np.uint8),
                    ("lvl_y", np.int16), ("lvl_cb", np.int16),
                    ("lvl_cr", np.int16)):
        args.append(ptr(key, dt, s16))
    for key, dt in (("split32", np.uint8), ("skip32", np.uint8),
                    ("inter32", np.uint8), ("merge32", np.uint8),
                    ("dir32", np.int32), ("mvd32", np.int16),
                    ("mvp32", np.uint8), ("mvd32_1", np.int16),
                    ("mvp32_1", np.uint8), ("rqt32", np.uint8),
                    ("mode32", np.int32), ("cbf32_cb", np.uint8),
                    ("cbf32_cr", np.uint8)):
        args.append(ptr(key, dt, s32))
    sao_ptr = 0
    if sao is not None:
        s = np.ascontiguousarray(sao[s32], dtype=np.int8)
        keep.append(s)
        sao_ptr = s.ctypes.data
    args.append(sao_ptr)
    args.append(1 if sdh else 0)
    if max_merge > 1 and "midx" in dec:
        args.append(ptr("midx", np.uint8, s16))
        args.append(ptr("midx32", np.uint8, s32))
    else:
        args.append(0)
        args.append(0)
    args.append(max_merge)
    cap = max(1 << 16, int(np.asarray(dec["lvl_y"][s16]).nbytes * 2))
    out = (ctypes.c_ubyte * cap)()
    n = lib.hevc_entropy_encode_tile_ctb32(*args, out, cap)
    if n < 0:
        raise RuntimeError(f"entropy ctb32 fast path error {n}")
    return bytes(bytearray(out[:n]))


def available() -> bool:
    return bool(_load())


def encode_tile_payload_v0(qp: int, dec: dict, last_tile: bool = True,
                           sdh: bool = False) -> bytes | None:
    """CABAC substream for one tile's (or whole frame's) decisions."""
    lib = _load()
    if not lib:
        return None
    nh, nw = dec["modes"].shape
    modes = np.ascontiguousarray(dec["modes"], dtype=np.int32)
    cbf_y = np.ascontiguousarray(dec["cbf_y"], dtype=np.uint8)
    cbf_cb = np.ascontiguousarray(dec["cbf_cb"], dtype=np.uint8)
    cbf_cr = np.ascontiguousarray(dec["cbf_cr"], dtype=np.uint8)
    lvl_y = np.ascontiguousarray(dec["lvl_y"], dtype=np.int16)
    lvl_cb = np.ascontiguousarray(dec["lvl_cb"], dtype=np.int16)
    lvl_cr = np.ascontiguousarray(dec["lvl_cr"], dtype=np.int16)
    cap = max(1 << 16, lvl_y.nbytes * 2)
    out = (ctypes.c_ubyte * cap)()
    n = lib.hevc_entropy_encode_tile_v0(
        qp, nh, nw, 1 if last_tile else 0,
        modes.ctypes.data, cbf_y.ctypes.data, cbf_cb.ctypes.data,
        cbf_cr.ctypes.data, lvl_y.ctypes.data, lvl_cb.ctypes.data,
        lvl_cr.ctypes.data, 1 if sdh else 0, out, cap)
    if n < 0:
        raise RuntimeError(f"entropy fast path error {n}")
    return bytes(bytearray(out[:n]))


def encode_slice_payload_v0(qp: int, dec: dict,
                            sdh: bool = False) -> bytes | None:
    return encode_tile_payload_v0(qp, dec, last_tile=True, sdh=sdh)
