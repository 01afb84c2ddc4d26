import numpy as np
import pytest

from hevc_tpu.utils.bitio import (BitReader, BitWriter, annexb, ebsp_to_rbsp,
                                  make_nal, rbsp_to_ebsp, split_annexb)


def test_u_roundtrip():
    w = BitWriter()
    vals = [(5, 3), (0, 1), (1, 1), (1023, 10), (0xDEADBEEF, 32)]
    for v, n in vals:
        w.u(v, n)
    w.byte_align()
    r = BitReader(w.bytes())
    for v, n in vals:
        assert r.u(n) == v


def test_ue_se_roundtrip():
    w = BitWriter()
    ues = [0, 1, 2, 3, 7, 8, 255, 65535]
    ses = [0, 1, -1, 2, -2, 100, -100]
    for v in ues:
        w.ue(v)
    for v in ses:
        w.se(v)
    w.byte_align()
    r = BitReader(w.bytes())
    for v in ues:
        assert r.ue() == v
    for v in ses:
        assert r.se() == v


def test_emulation_prevention():
    cases = [b"\x00\x00\x00", b"\x00\x00\x01\x02", b"\x00\x00\x02",
             b"\x00\x00\x03\x00\x00\x00", b"abc", b"", b"\x00" * 10]
    for rbsp in cases:
        ebsp = rbsp_to_ebsp(rbsp)
        # no start-code emulation in ebsp body
        assert b"\x00\x00\x00" not in ebsp
        assert b"\x00\x00\x01" not in ebsp
        assert b"\x00\x00\x02" not in ebsp
        assert ebsp_to_rbsp(ebsp) == rbsp


def test_annexb_split():
    nals = [make_nal(33, b"\x01\x02"), make_nal(34, b"\x03"),
            make_nal(19, bytes(range(50)))]
    stream = annexb(nals)
    assert split_annexb(stream) == nals
