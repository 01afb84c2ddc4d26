"""Bit-level I/O for HEVC RBSP syntax (headers, Exp-Golomb) + NAL packing.

Host-side utility layer.  The heavy entropy coding (CABAC over residuals) lives
in hevc_tpu.entropy; this module covers fixed/ue(v)/se(v) header fields and NAL
unit framing (emulation prevention, Annex-B start codes, MP4 length prefixes).
"""
from __future__ import annotations


class BitWriter:
    """MSB-first bit writer producing an RBSP byte string."""

    __slots__ = ("_bytes", "_cur", "_nbits")

    def __init__(self):
        self._bytes = bytearray()
        self._cur = 0        # partial byte accumulator
        self._nbits = 0      # bits currently in _cur (0..7)

    def u(self, value: int, nbits: int) -> None:
        """Write `value` as an unsigned fixed-width field of `nbits` bits."""
        if nbits < 0 or (nbits < 64 and value >> nbits):
            raise ValueError(f"value {value} does not fit in {nbits} bits")
        for i in range(nbits - 1, -1, -1):
            self.bit((value >> i) & 1)

    def bit(self, b: int) -> None:
        self._cur = (self._cur << 1) | (b & 1)
        self._nbits += 1
        if self._nbits == 8:
            self._bytes.append(self._cur)
            self._cur = 0
            self._nbits = 0

    def ue(self, value: int) -> None:
        """Exp-Golomb unsigned (ue(v))."""
        if value < 0:
            raise ValueError("ue(v) requires value >= 0")
        code = value + 1
        nbits = code.bit_length()
        self.u(0, nbits - 1)
        self.u(code, nbits)

    def se(self, value: int) -> None:
        """Exp-Golomb signed (se(v)): 0,1,-1,2,-2,... -> 0,1,2,3,4,..."""
        self.ue(2 * value - 1 if value > 0 else -2 * value)

    def byte_align(self, bit: int = 0) -> None:
        while self._nbits:
            self.bit(bit)

    def rbsp_trailing_bits(self) -> None:
        self.bit(1)
        self.byte_align(0)

    @property
    def bitpos(self) -> int:
        return len(self._bytes) * 8 + self._nbits

    def bytes(self) -> bytes:
        if self._nbits:
            raise ValueError("stream not byte-aligned; call byte_align() first")
        return bytes(self._bytes)


class BitReader:
    """MSB-first bit reader over an RBSP byte string."""

    __slots__ = ("_data", "_pos")

    def __init__(self, data: bytes):
        self._data = data
        self._pos = 0  # bit position

    def u(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.bit()
        return v

    def bit(self) -> int:
        byte = self._data[self._pos >> 3]
        b = (byte >> (7 - (self._pos & 7))) & 1
        self._pos += 1
        return b

    def ue(self) -> int:
        nzeros = 0
        while self.bit() == 0:
            nzeros += 1
            if nzeros > 32:
                raise ValueError("corrupt ue(v)")
        return ((1 << nzeros) | self.u(nzeros)) - 1

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if (k & 1) else -(k // 2)

    def byte_align(self) -> None:
        self._pos = (self._pos + 7) & ~7

    @property
    def bitpos(self) -> int:
        return self._pos

    def more_data(self) -> bool:
        return self._pos < len(self._data) * 8


def rbsp_to_ebsp(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes (0x03 after 00 00 before 00/01/02/03).

    HEVC spec 7.4.2 / reference behavior of every NAL the reference's ffmpeg
    emitted.  Vectorized for large payloads: candidate positions come from a
    numpy scan of the original bytes; an accepted escape at i resets the
    zero run, so the next escapable position is >= i + 2 (greedy left-to-
    right matches the scalar state machine exactly).
    """
    n = len(rbsp)
    if n >= 256:
        import numpy as np
        d = np.frombuffer(rbsp, np.uint8)
        cand = np.nonzero((d[2:] <= 3) & (d[1:-1] == 0) & (d[:-2] == 0))[0]
        if not len(cand):
            return rbsp
        accepted = []
        last = -2
        for i in cand:
            if i >= last + 2:
                accepted.append(i + 2)
                last = i
        return np.insert(d, accepted, 3).tobytes()
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def ebsp_to_rbsp(ebsp: bytes) -> bytes:
    """Remove emulation-prevention bytes."""
    out = bytearray()
    zeros = 0
    i = 0
    n = len(ebsp)
    while i < n:
        b = ebsp[i]
        if zeros >= 2 and b == 3 and i + 1 < n and ebsp[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


# HEVC NAL unit types (spec Table 7-1) — subset this framework emits/parses.
NAL_TRAIL_N = 0
NAL_TRAIL_R = 1
NAL_IDR_W_RADL = 19
NAL_IDR_N_LP = 20
NAL_CRA = 21
NAL_VPS = 32
NAL_SPS = 33
NAL_PPS = 34
NAL_AUD = 35
NAL_SEI_PREFIX = 39


def make_nal(nal_type: int, rbsp: bytes, layer_id: int = 0, tid: int = 0) -> bytes:
    """Wrap an RBSP payload into a NAL unit (2-byte header + EBSP)."""
    header = bytes([(nal_type << 1) | (layer_id >> 5),
                    ((layer_id & 0x1F) << 3) | (tid + 1)])
    return header + rbsp_to_ebsp(rbsp)


def annexb(nals: list[bytes]) -> bytes:
    """Join NAL units with 4-byte start codes (debug .hevc elementary stream)."""
    return b"".join(b"\x00\x00\x00\x01" + n for n in nals)


def length_prefixed(nals: list[bytes], length_size: int = 4) -> bytes:
    """Join NAL units with length prefixes (MP4 hvc1 sample format)."""
    out = bytearray()
    for n in nals:
        out += len(n).to_bytes(length_size, "big")
        out += n
    return bytes(out)


def split_annexb(data: bytes) -> list[bytes]:
    """Split an Annex-B elementary stream into NAL units (no start codes)."""
    nals = []
    i = 0
    n = len(data)
    starts = []
    while i < n - 2:
        if data[i] == 0 and data[i + 1] == 0:
            if data[i + 2] == 1:
                starts.append((i, i + 3))
                i += 3
                continue
            if i < n - 3 and data[i + 2] == 0 and data[i + 3] == 1:
                starts.append((i, i + 4))
                i += 4
                continue
        i += 1
    for k, (s, payload) in enumerate(starts):
        end = starts[k + 1][0] if k + 1 < len(starts) else n
        nals.append(data[payload:end])
    return nals
