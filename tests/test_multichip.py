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
    assert len(out) == 13          # v1 step outputs


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
