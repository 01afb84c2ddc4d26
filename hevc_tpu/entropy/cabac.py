"""CABAC arithmetic coding engine (H.265 spec 9.3.4), encoder and decoder.

Pure-Python reference implementation following the spec flowcharts
(EncodeDecision / EncodeBypass / EncodeTerminate / RenormE / PutBit and the
decoder mirrors).  The C++ fast path (hevc_tpu/cpp/entropy.cpp) implements the
same algorithm; this module is the ground truth for tests.

The reference transcoder never touched entropy coding (it delegated to
libx265/NVENC subprocesses, reference core/transcoder.py:398-412); this is new
first-party surface required by the TPU-native design.
"""
from __future__ import annotations

from hevc_tpu.entropy import tables as T


class CabacEncoder:
    """Binary arithmetic encoder over a flat context-state array."""

    def __init__(self, qp: int, init_type: int = 0):
        self.states, self.mps = T.init_states(qp, init_type)
        self.low = 0
        self.range = 510
        self.bits_outstanding = 0
        self.first_bit = True
        self._bits = []          # list of 0/1 output bits (MSB first)

    # -- bit plumbing ---------------------------------------------------------
    def _put_bit(self, b: int) -> None:
        if self.first_bit:
            self.first_bit = False
        else:
            self._bits.append(b)
        while self.bits_outstanding > 0:
            self._bits.append(1 - b)
            self.bits_outstanding -= 1

    def _renorm(self) -> None:
        while self.range < 256:
            if self.low >= 512:
                self.low -= 512
                self._put_bit(1)
            elif self.low < 256:
                self._put_bit(0)
            else:
                self.low -= 256
                self.bits_outstanding += 1
            self.range <<= 1
            self.low <<= 1

    # -- coding primitives ----------------------------------------------------
    def encode_bin(self, ctx: int, binval: int) -> None:
        state = self.states[ctx]
        lps = int(T.RANGE_TAB_LPS[state, (self.range >> 6) & 3])
        self.range -= lps
        if binval != self.mps[ctx]:
            self.low += self.range
            self.range = lps
            if state == 0:
                self.mps[ctx] = 1 - self.mps[ctx]
            self.states[ctx] = T.TRANS_IDX_LPS[state]
        else:
            self.states[ctx] = T.TRANS_IDX_MPS[state]
        self._renorm()

    def encode_bypass(self, binval: int) -> None:
        self.low <<= 1
        if binval:
            self.low += self.range
        if self.low >= 1024:
            self.low -= 1024
            self._put_bit(1)
        elif self.low < 512:
            self._put_bit(0)
        else:
            self.low -= 512
            self.bits_outstanding += 1

    def encode_bypass_bits(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.encode_bypass((value >> i) & 1)

    def encode_terminate(self, binval: int) -> None:
        self.range -= 2
        if binval:
            self.low += self.range
            # EncodeFlush
            self.range = 2
            self._renorm()
            self._put_bit((self.low >> 9) & 1)
            # last two bits of low, with rbsp_stop_one_bit folded in
            self._bits.append((self.low >> 8) & 1)
            self._bits.append(1)
        else:
            self._renorm()

    def bytes_aligned(self, alignment_one: bool = False) -> bytes:
        """Output bits padded to a byte boundary.

        alignment_one=True appends the byte_alignment() syntax ('1' + zeros)
        used after end_of_subset_one_bit at tile/substream boundaries
        (spec 7.3.8.1); the default zero padding is the RBSP tail case where
        the terminate flush already carried the stop bit.
        """
        bits = list(self._bits)
        if alignment_one:
            bits.append(1)
        while len(bits) % 8:
            bits.append(0)
        out = bytearray()
        for i in range(0, len(bits), 8):
            v = 0
            for b in bits[i:i + 8]:
                v = (v << 1) | b
            out.append(v)
        return bytes(out)

    @property
    def bitcount(self) -> int:
        return len(self._bits)


class CabacDecoder:
    """Binary arithmetic decoder (spec 9.3.4.3), mirror of CabacEncoder."""

    def __init__(self, data: bytes, qp: int, init_type: int = 0):
        self.states, self.mps = T.init_states(qp, init_type)
        self._data = data
        self._bitpos = 0
        self.range = 510
        self.offset = self._read_bits(9)

    def _read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self._data[self._bitpos >> 3] if (self._bitpos >> 3) < len(self._data) else 0
            v = (v << 1) | ((byte >> (7 - (self._bitpos & 7))) & 1)
            self._bitpos += 1
        return v

    def decode_bin(self, ctx: int) -> int:
        state = self.states[ctx]
        lps = int(T.RANGE_TAB_LPS[state, (self.range >> 6) & 3])
        self.range -= lps
        if self.offset >= self.range:
            binval = 1 - self.mps[ctx]
            self.offset -= self.range
            self.range = lps
            if state == 0:
                self.mps[ctx] = 1 - self.mps[ctx]
            self.states[ctx] = T.TRANS_IDX_LPS[state]
        else:
            binval = self.mps[ctx]
            self.states[ctx] = T.TRANS_IDX_MPS[state]
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._read_bits(1)
        return int(binval)

    def decode_bypass(self) -> int:
        self.offset = (self.offset << 1) | self._read_bits(1)
        if self.offset >= self.range:
            self.offset -= self.range
            return 1
        return 0

    def decode_bypass_bits(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.decode_bypass()
        return v

    def decode_terminate(self) -> int:
        self.range -= 2
        if self.offset >= self.range:
            return 1
        while self.range < 256:
            self.range <<= 1
            self.offset = (self.offset << 1) | self._read_bits(1)
        return 0
