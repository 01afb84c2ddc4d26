import random

import numpy as np
import pytest

from hevc_tpu.entropy import tables as T
from hevc_tpu.entropy.cabac import CabacDecoder, CabacEncoder


def test_engine_tables_shape():
    assert T.RANGE_TAB_LPS.shape == (64, 4)
    # spec: monotone decreasing down the state axis
    assert (np.diff(T.RANGE_TAB_LPS[:-1], axis=0) <= 0).all()
    assert T.TRANS_IDX_LPS.shape == (64,)
    assert T.TRANS_IDX_MPS[62] == 62 and T.TRANS_IDX_MPS[63] == 63


@pytest.mark.parametrize("seed", range(5))
def test_roundtrip_fuzz(seed):
    random.seed(seed)
    qp = random.randint(0, 51)
    ops = []
    for _ in range(random.randint(1, 600)):
        k = random.random()
        if k < 0.6:
            ops.append(("bin", random.randrange(T.NUM_CTX), random.randint(0, 1)))
        elif k < 0.9:
            ops.append(("byp", random.randint(0, 1)))
        else:
            ops.append(("bits", random.randint(0, 255), 8))
    enc = CabacEncoder(qp)
    for op in ops:
        if op[0] == "bin":
            enc.encode_bin(op[1], op[2])
        elif op[0] == "byp":
            enc.encode_bypass(op[1])
        else:
            enc.encode_bypass_bits(op[1], op[2])
    enc.encode_terminate(1)
    dec = CabacDecoder(enc.bytes_aligned(), qp)
    for op in ops:
        if op[0] == "bin":
            assert dec.decode_bin(op[1]) == op[2]
        elif op[0] == "byp":
            assert dec.decode_bypass() == op[1]
        else:
            assert dec.decode_bypass_bits(op[2]) == op[1]
    assert dec.decode_terminate() == 1


def test_mid_stream_terminate_zero():
    enc = CabacEncoder(30)
    for i in range(50):
        enc.encode_bin(i % T.NUM_CTX, i & 1)
        enc.encode_terminate(0)
    enc.encode_terminate(1)
    dec = CabacDecoder(enc.bytes_aligned(), 30)
    for i in range(50):
        assert dec.decode_bin(i % T.NUM_CTX) == (i & 1)
        assert dec.decode_terminate() == 0
    assert dec.decode_terminate() == 1
