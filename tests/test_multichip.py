"""Multi-chip sharding on the virtual 8-device CPU mesh (conftest forces it)."""
import sys
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")

sys.path.insert(0, str(Path(__file__).parent.parent))


def test_virtual_mesh_present():
    assert len(jax.devices()) == 8, jax.devices()


@pytest.mark.slow
def test_graft_entry():
    import __graft_entry__ as G
    fn, args = G.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert len(out) == 29          # fused GOP P-step outputs


@pytest.mark.slow
def test_dryrun_multichip():
    import __graft_entry__ as G
    G.dryrun_multichip(8)


def test_sharded_equals_local():
    import jax.numpy as jnp
    from hevc_tpu.parallel.streams import make_stream_mesh, \
        encode_frames_sharded
    from hevc_tpu.encoder.frame_jax import encode_frames_batch_jit

    nh, nw = 2, 3
    F = 8
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.integers(0, 256, (F, nh, nw, 16, 16)).astype(np.int32))
    cb = jnp.asarray(rng.integers(0, 256, (F, nh, nw, 8, 8)).astype(np.int32))
    cr = jnp.asarray(rng.integers(0, 256, (F, nh, nw, 8, 8)).astype(np.int32))
    qp = jnp.asarray(30, jnp.int32)
    lb = jnp.asarray([13, 20, 40], jnp.int32)
    mesh = make_stream_mesh()
    sharded = encode_frames_sharded(mesh, y, cb, cr, qp, lb, nh, nw)
    local = encode_frames_batch_jit(y, cb, cr, qp, lb, nh, nw)
    for s, l in zip(sharded, local):
        assert np.array_equal(np.asarray(s), np.asarray(l))


@pytest.mark.slow
def test_sharded_p_equals_local():
    import jax.numpy as jnp
    from hevc_tpu.parallel.streams import make_stream_mesh, \
        encode_tiles_sharded_p
    from hevc_tpu.encoder.rowscan_v1 import encode_tiles_rowscan_p_jit

    tnh, tnw = 2, 2
    B = 8
    rng = np.random.default_rng(4)
    mk = lambda n: jnp.asarray(
        rng.integers(0, 256, (B, tnh, tnw, n, n)).astype(np.int32))
    y, cb, cr = mk(16), mk(8), mk(8)
    ry, rcb, rcr = mk(16), mk(8), mk(8)
    qp = jnp.asarray(32, jnp.int32)
    lb = jnp.asarray([13, 20, 40], jnp.int32)
    lam16 = jnp.asarray(1370, jnp.int32)
    mesh = make_stream_mesh()
    sharded = encode_tiles_sharded_p(mesh, y, cb, cr, ry, rcb, rcr, qp, lb,
                                     lam16, tnh, tnw)
    local = encode_tiles_rowscan_p_jit(y, cb, cr, ry, rcb, rcr, qp, lb,
                                       lam16, tnh, tnw)
    assert len(sharded) == 14
    for s, l in zip(sharded, local):
        assert np.array_equal(np.asarray(s), np.asarray(l))


def test_streams8_end_to_end():
    """Stream-DP north-star shape (BASELINE config 2): 8 independent
    streams encoded in one sharded dispatch on the 8-device mesh, each
    stream's bitstream assembled and decoded back bit-exactly."""
    import time
    import jax.numpy as jnp
    from hevc_tpu.parallel.streams import make_stream_mesh, \
        encode_tiles_sharded_v1
    from hevc_tpu.entropy.headers import StreamConfig, write_vps, \
        write_sps, write_pps
    from hevc_tpu.entropy.tiled_v1 import entropy_encode_frame_v1
    from hevc_tpu.decoder.decode import decode_annexb
    from hevc_tpu.utils.bitio import annexb

    S, tnh, tnw = 8, 2, 3
    W, H = tnw * 16, tnh * 16
    rng = np.random.default_rng(5)
    y = rng.integers(0, 256, (S, tnh, tnw, 16, 16)).astype(np.int32)
    cb = rng.integers(0, 256, (S, tnh, tnw, 8, 8)).astype(np.int32)
    cr = rng.integers(0, 256, (S, tnh, tnw, 8, 8)).astype(np.int32)
    mesh = make_stream_mesh()
    qp = jnp.asarray(30, jnp.int32)
    lb = jnp.asarray([13, 20, 40], jnp.int32)
    t0 = time.time()
    outs = encode_tiles_sharded_v1(mesh, jnp.asarray(y), jnp.asarray(cb),
                                   jnp.asarray(cr), qp, lb, tnh, tnw)
    outs = [np.asarray(o) for o in outs]
    dt = time.time() - t0
    cfg = StreamConfig(width=W, height=H, qp=30)
    names = ["part_nxn", "modes4", "cbf_y4", "cbf_cb", "cbf_cr",
             "cbf_cb4", "cbf_cr4", "lvl_y", "lvl_cb", "lvl_cr"]
    for s in range(S):
        dec = {}
        for i, nm in enumerate(names):
            a = outs[i][:, s]                     # (steps, ...)
            dec[nm] = a.reshape((tnh, tnw) + a.shape[1:]).astype(np.int32)
        nal = entropy_encode_frame_v1(cfg, dec)
        stream = annexb([write_vps(cfg), write_sps(cfg), write_pps(cfg),
                         nal])
        rec = decode_annexb(stream)[0]
        ry = outs[10][:, s].reshape(tnh, tnw, 16, 16).transpose(
            0, 2, 1, 3).reshape(H, W)
        assert np.array_equal(rec["y"], ry), f"stream {s}"
    print(f"streams8: {S} streams, one dispatch, {S/dt:.1f} frames/s "
          "aggregate (virtual mesh)")
