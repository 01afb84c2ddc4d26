"""Chunked GOP path: device-packed transfers + multi-frame scan dispatch.

The chunked encoder (GopEncoder.encode_chunk_async / _gop_chunk_jit) must
produce byte-identical bitstreams to the per-frame pipeline; the pack
layer (encoder/pack.py) must round-trip every field bit-exactly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from hevc_tpu.encoder.pack import (FramePackSpec, coef_stream_jit,
                                   split_coef_bitmap)


def _rand_fields(rng, S, T):
    f = {
        "modes4": rng.integers(-128, 128, (S, T, 4)).astype(np.int8),
        "mvp": rng.integers(-128, 128, (S, T)).astype(np.int8),
        "rqt": rng.integers(-128, 128, (S, T)).astype(np.int8),
        "dir": rng.integers(0, 3, (S, T)).astype(np.int8),
        "mvp1": rng.integers(-128, 128, (S, T)).astype(np.int8),
        "mvd": rng.integers(-3000, 3000, (S, T, 2)).astype(np.int16),
        "mv": rng.integers(-3000, 3000, (S, T, 2)).astype(np.int16),
        "mvd1": rng.integers(-3000, 3000, (S, T, 2)).astype(np.int16),
    }
    for nm, k in [("part", 1), ("cbf_y4", 4), ("cbf_cb", 1), ("cbf_cr", 1),
                  ("cbf_cb4", 4), ("cbf_cr4", 4), ("skip", 1), ("inter", 1),
                  ("merge", 1), ("cbf_yi", 1), ("cbf_cbi", 1),
                  ("cbf_cri", 1)]:
        shape = (S, T) if k == 1 else (S, T, k)
        f[nm] = rng.random(shape) < 0.4
    return f


def test_pack_head_roundtrip():
    rng = np.random.default_rng(11)
    tnh, tnw, T = 3, 5, 4
    spec = FramePackSpec(tnh, tnw, T)
    fields = _rand_fields(rng, tnh * tnw, T)
    dev = {k: jnp.asarray(v) for k, v in fields.items()}
    head = np.asarray(jax.jit(spec.pack_head)(dev, jnp.asarray(123)))
    assert head.shape == (spec.head_bytes,)
    out, nnz = spec.unpack_head(head)
    assert nnz == 123
    for k, v in fields.items():
        assert np.array_equal(out[k], v), k


def test_coef_stream_roundtrip():
    rng = np.random.default_rng(5)
    tnh, tnw, T, K = 2, 3, 2, 4
    spec = FramePackSpec(tnh, tnw, T)
    S = tnh * tnw
    dense = rng.integers(-300, 300, (K, spec.coef_elems)).astype(np.int16)
    dense[rng.random(dense.shape) < 0.9] = 0      # realistic sparsity
    bits, vbuf, total = coef_stream_jit(jnp.asarray(dense))
    total = int(total)
    nnz = [(dense[k] != 0).sum() for k in range(K)]
    assert total == sum(nnz)
    per = split_coef_bitmap(np.asarray(bits),
                            np.asarray(vbuf[:total * 2]),
                            spec.coef_elems, nnz)
    for k in range(K):
        ly, lcb, lcr = spec.unpack_coefs(*per[k])
        ny, nc = S * T * 256, S * T * 64
        assert np.array_equal(ly.reshape(-1), dense[k][:ny])
        assert np.array_equal(lcb.reshape(-1), dense[k][ny:ny + nc])
        assert np.array_equal(lcr.reshape(-1), dense[k][ny + nc:])


@pytest.mark.slow
def test_chunked_equals_per_frame():
    from hevc_tpu.entropy.headers import StreamConfig
    from hevc_tpu.encoder.gop import GopEncoder
    rng = np.random.default_rng(3)
    W, H, N = 96, 64, 11
    base = rng.integers(0, 256, (H, W), np.int32)
    frames = []
    for i in range(N):
        y = np.clip(np.roll(base, i * 2, axis=1)
                    + rng.integers(-3, 4, (H, W)), 0, 255).astype(np.int32)
        cb = rng.integers(110, 146, (H // 2, W // 2)).astype(np.int32)
        cr = rng.integers(110, 146, (H // 2, W // 2)).astype(np.int32)
        frames.append((y, cb, cr))
    cfg = StreamConfig(width=W, height=H, qp=27, inter=True)
    s1, _ = GopEncoder(cfg).encode_video(frames, gop=5)
    s2 = GopEncoder(cfg).encode_video_chunked(frames, gop=5, chunk=4)
    assert s1 == s2

@pytest.mark.slow
def test_chunked_bframes_equals_per_frame():
    """Chunked IbPbP (3-way switch scan) == sync device B path, which is
    byte-identical to the numpy reference (test_device_bframes...)."""
    from hevc_tpu.entropy.headers import StreamConfig
    from hevc_tpu.encoder.gop import GopEncoder
    rng = np.random.default_rng(9)
    W, H, N = 96, 64, 11
    base = rng.integers(0, 256, (H, W), np.int32)
    frames = []
    for i in range(N):
        y = np.clip(np.roll(base, i * 3, axis=1)
                    + rng.integers(-4, 5, (H, W)), 0, 255).astype(np.int32)
        cb = rng.integers(110, 146, (H // 2, W // 2)).astype(np.int32)
        cr = rng.integers(110, 146, (H // 2, W // 2)).astype(np.int32)
        frames.append((y, cb, cr))
    cfg = StreamConfig(width=W, height=H, qp=27, inter=True, bframes=True)
    s_sync, _ = GopEncoder(cfg).encode_video(frames, gop=6)
    s_chunk = GopEncoder(cfg).encode_video_chunked(frames, gop=6, chunk=4)
    assert s_sync == s_chunk
