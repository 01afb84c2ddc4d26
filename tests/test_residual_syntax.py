import numpy as np
import pytest

from hevc_tpu.decoder.syntax import SliceSyntaxDecoder
from hevc_tpu.entropy.syntax import SliceSyntaxEncoder, mpm_candidates


@pytest.mark.parametrize("seed", range(4))
def test_residual_roundtrip_fuzz(seed):
    rng = np.random.default_rng(seed)
    for _ in range(60):
        qp = int(rng.integers(0, 52))
        tbs = []
        for _ in range(int(rng.integers(1, 6))):
            log2 = int(rng.integers(2, 6))
            n = 1 << log2
            scan = int(rng.integers(0, 3)) if log2 <= 3 else 0
            c_idx = int(rng.integers(0, 3))
            density = rng.uniform(0.01, 0.9)
            mag = int(rng.integers(1, 200))
            coeffs = ((rng.random((n, n)) < density)
                      * rng.integers(-mag, mag + 1, (n, n))).astype(np.int32)
            if not coeffs.any():
                coeffs[0, 0] = 1
            tbs.append((coeffs, log2, scan, c_idx))
        enc = SliceSyntaxEncoder(qp)
        for coeffs, log2, scan, c_idx in tbs:
            enc.encode_residual(coeffs, log2, scan, c_idx)
        enc.encode_end_of_slice(True)
        dec = SliceSyntaxDecoder(enc.cabac.bytes_aligned(), qp)
        for coeffs, log2, scan, c_idx in tbs:
            assert np.array_equal(dec.decode_residual(log2, scan, c_idx), coeffs)
        assert dec.decode_end_of_slice() == 1


def test_mpm_candidates():
    # spec 8.4.2 examples
    assert mpm_candidates(1, 1) == [0, 1, 26]       # both DC
    assert mpm_candidates(0, 0) == [0, 1, 26]
    assert mpm_candidates(10, 10) == [10, 9, 11]    # angular +/- neighbors
    assert mpm_candidates(2, 2) == [2, 33, 3]
    assert mpm_candidates(34, 34) == [34, 33, 3]
    assert mpm_candidates(10, 26) == [10, 26, 0]
    assert mpm_candidates(0, 1) == [0, 1, 26]
    assert mpm_candidates(0, 26) == [0, 26, 1]


def test_mode_signaling_roundtrip():
    enc = SliceSyntaxEncoder(30)
    cases = []
    rng = np.random.default_rng(0)
    for _ in range(200):
        ca, cb = int(rng.integers(0, 35)), int(rng.integers(0, 35))
        mode = int(rng.integers(0, 35))
        cands = mpm_candidates(ca, cb)
        enc.encode_luma_mode(mode, cands)
        cases.append((mode, cands))
    enc.encode_end_of_slice(True)
    dec = SliceSyntaxDecoder(enc.cabac.bytes_aligned(), 30)
    for mode, cands in cases:
        assert dec.decode_luma_mode(cands) == mode
