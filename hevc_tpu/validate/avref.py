"""ctypes wrapper over the avref test/bench harness (hevc_tpu/cpp/avref.c).

Conformance oracle (independent HEVC decode) + libx265 baseline encoder.
Gracefully degrades to None when the shared library or system ffmpeg libs are
absent — the framework itself never depends on this module.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_LIB_DIR = Path(__file__).resolve().parent.parent / "cpp"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    so = _LIB_DIR / "libavref.so"
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
    lib.avref_decode_file.restype = ctypes.c_int
    lib.avref_decode_file.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.avref_decode_audio.restype = ctypes.c_long
    lib.avref_decode_audio.argtypes = [
        ctypes.c_char_p, ctypes.c_void_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.avref_encode_aac.restype = ctypes.c_long
    lib.avref_encode_aac.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_void_p, ctypes.c_long]
    lib.avref_encode.restype = ctypes.c_long
    lib.avref_encode.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_void_p, ctypes.c_long]
    _lib = lib
    return lib


def available() -> bool:
    return bool(_load())


def decode_hevc(stream: bytes, max_frames: int = 512):
    """Decode an Annex-B HEVC stream -> list of (y, cb, cr) uint8 arrays."""
    import tempfile
    with tempfile.NamedTemporaryFile(suffix=".hevc", delete=False) as f:
        f.write(stream)
        path = f.name
    try:
        return decode_file(path, max_frames)
    finally:
        os.unlink(path)


def decode_file(path: str, max_frames: int = 512):
    """Decode the first video stream of any file -> [(y, cb, cr)] uint8."""
    lib = _load()
    if not lib:
        return None
    cap = 1 << 28
    out = (ctypes.c_ubyte * cap)()
    w = ctypes.c_int(0)
    h = ctypes.c_int(0)
    n = lib.avref_decode_file(str(path).encode(), out, cap,
                              ctypes.byref(w), ctypes.byref(h), max_frames)
    if n < 0:
        raise RuntimeError(f"avref_decode_file error {n}")
    W = w.value
    H = h.value & 0xFFFF
    bits = (h.value >> 16) or 8
    dt = np.uint16 if bits > 8 else np.uint8
    buf = np.ctypeslib.as_array(out, (cap,)).view(dt)
    fsz = W * H * 3 // 2
    frames = []
    for i in range(n):
        base = i * fsz
        y = buf[base:base + W * H].reshape(H, W).copy()
        cb = buf[base + W * H:base + W * H + W * H // 4].reshape(H // 2, W // 2).copy()
        cr = buf[base + W * H + W * H // 4:base + fsz].reshape(H // 2, W // 2).copy()
        frames.append((y, cb, cr))
    return frames


def decode_audio(path, max_samples: int = 48000 * 3600):
    """Decode the first audio stream -> (np.int16 (n, ch), rate) or None."""
    lib = _load()
    if not lib:
        return None
    cap = min(max_samples, 48000 * 3600)
    buf = np.zeros(cap * 8, dtype=np.int16)
    rate = ctypes.c_int(0)
    ch = ctypes.c_int(0)
    n = lib.avref_decode_audio(str(path).encode(),
                               buf.ctypes.data, cap,
                               ctypes.byref(rate), ctypes.byref(ch))
    if n <= 0 or ch.value == 0:
        return None
    pcm = buf[:n * ch.value].reshape(n, ch.value).copy()
    return pcm, rate.value


def encode_aac(pcm: np.ndarray, rate: int, bitrate: int = 128_000):
    """Encode interleaved s16 PCM (n, ch) -> list of AAC packets."""
    lib = _load()
    if not lib:
        return None
    pcm = np.ascontiguousarray(pcm, dtype=np.int16)
    n, ch = pcm.shape
    cap = max(1 << 20, n * ch * 2)
    out = (ctypes.c_ubyte * cap)()
    sz = lib.avref_encode_aac(pcm.ctypes.data, n, rate, ch, bitrate, out, cap)
    if sz < 0:
        raise RuntimeError(f"avref_encode_aac error {sz}")
    data = bytes(bytearray(out[:sz]))
    packets = []
    off = 0
    while off + 4 <= len(data):
        ln = int.from_bytes(data[off:off + 4], "little")
        packets.append(data[off + 4:off + 4 + ln])
        off += 4 + ln
    return packets


def encode(frames, encoder: str = "libx265", fps=(30, 1), crf: int = 23,
           preset: str = "medium", opts: str = "") -> bytes | None:
    """Encode [(y, cb, cr)] uint8 planes -> Annex-B bitstream (baseline only)."""
    lib = _load()
    if not lib:
        return None
    h, w = frames[0][0].shape
    yuv = b"".join(
        y.astype(np.uint8).tobytes() + cb.astype(np.uint8).tobytes() +
        cr.astype(np.uint8).tobytes() for (y, cb, cr) in frames)
    cap = max(len(yuv), 1 << 22)
    out = (ctypes.c_ubyte * cap)()
    sz = lib.avref_encode(encoder.encode(), yuv, w, h, len(frames),
                          fps[0], fps[1], crf, preset.encode(), opts.encode(),
                          out, cap)
    if sz < 0:
        raise RuntimeError(f"avref_encode error {sz}")
    return bytes(bytearray(out[:sz]))
