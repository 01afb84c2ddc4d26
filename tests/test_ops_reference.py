import numpy as np
import pytest

from hevc_tpu.ops import reference as R


def test_dct_matrices_known_values():
    t4 = R.dct_matrix(4)
    assert (t4 == np.array([[64, 64, 64, 64], [83, 36, -36, -83],
                            [64, -64, -64, 64], [36, -83, 83, -36]])).all()
    t8 = R.dct_matrix(8)
    assert (t8[1] == [89, 75, 50, 18, -18, -50, -75, -89]).all()
    t16 = R.dct_matrix(16)
    assert (t16[1][:4] == [90, 87, 80, 70]).all()
    t32 = R.dct_matrix(32)
    assert (t32[1][:8] == [90, 90, 88, 85, 82, 78, 73, 67]).all()
    # anti-symmetry of odd rows, symmetry of even rows
    for n in (4, 8, 16, 32):
        t = R.dct_matrix(n)
        for k in range(n):
            sign = 1 if k % 2 == 0 else -1
            assert (t[k, ::-1] == sign * t[k]).all()


def test_transform_quant_roundtrip():
    rng = np.random.default_rng(0)
    for n in (4, 8, 16, 32):
        for qp in (0, 10, 22, 30, 40, 51):
            x = rng.integers(-255, 256, (n, n)).astype(np.int32)
            c = R.forward_transform(x)
            lvl = R.quantize(c, qp)
            y = R.inverse_transform(R.dequantize(lvl, qp))
            qstep = 2 ** ((qp - 4) / 6)
            assert np.abs(y - x).max() <= max(4, qstep * 1.5), (n, qp)


def test_dst_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.integers(-255, 256, (4, 4)).astype(np.int32)
    c = R.forward_transform(x, dst=True)
    y = R.inverse_transform(R.dequantize(R.quantize(c, 4), 4), dst=True)
    assert np.abs(y - x).max() <= 2


def test_chroma_qp_table():
    assert R.chroma_qp(20) == 20
    assert R.chroma_qp(29) == 29
    assert R.chroma_qp(30) == 29
    assert R.chroma_qp(33) == 32
    assert R.chroma_qp(43) == 37
    assert R.chroma_qp(44) == 38
    assert R.chroma_qp(51) == 45


def test_intra_pred_basic():
    # all-unavailable: every mode predicts 128
    ref = R.build_reference(np.zeros((16, 16), np.int32), 0, 0, 16,
                            avail_left=False, avail_above=False)
    assert (ref == 128).all()
    for mode in range(35):
        pred = R.predict_intra(ref, mode, 16, 0)
        assert (pred == 128).all(), mode


def test_intra_pred_vertical_horizontal():
    recon = np.zeros((32, 32), np.int32)
    recon[7, 8:24] = np.arange(16) + 50      # row above block at (8,8)
    recon[8:24, 7] = np.arange(16) + 100     # col left
    recon[7, 7] = 77
    recon[7, 24:] = 200
    ref = R.build_reference(recon, 8, 8, 16, True, True)
    vert = R.predict_intra(ref, 26, 16, 1)   # chroma: no edge filter
    assert (vert == (np.arange(16) + 50)[None, :].repeat(16, 0)).all()
    horiz = R.predict_intra(ref, 10, 16, 1)
    assert (horiz == (np.arange(16) + 100)[:, None].repeat(16, 1)).all()
