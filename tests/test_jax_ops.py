"""Bit-exactness of JAX ops vs the numpy normative reference."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from hevc_tpu.ops import jax_ops as J  # noqa: E402
from hevc_tpu.ops import reference as R  # noqa: E402


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("dst", [False, True])
def test_transforms_bit_exact(n, dst):
    if dst and n != 4:
        pytest.skip("DST only 4x4")
    rng = np.random.default_rng(n)
    x = rng.integers(-255, 256, (6, n, n)).astype(np.int32)
    fwd = np.asarray(J.forward_transform(jnp.asarray(x), n, dst))
    for i in range(6):
        assert np.array_equal(fwd[i], R.forward_transform(x[i], dst)), i
    # inverse on worst-case 16-bit coefficients
    c = rng.integers(-32768, 32768, (6, n, n)).astype(np.int32)
    inv = np.asarray(J.inverse_transform(jnp.asarray(c), n, dst))
    for i in range(6):
        assert np.array_equal(inv[i], R.inverse_transform(c[i], dst)), i


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_quant_dequant_bit_exact(n):
    rng = np.random.default_rng(n)
    for qp in (0, 7, 19, 27, 38, 51):
        c = rng.integers(-32768, 32768, (4, n, n)).astype(np.int32)
        q = np.asarray(J.quantize(jnp.asarray(c), jnp.asarray(qp), n))
        lvl = rng.integers(-3000, 3000, (4, n, n)).astype(np.int32)
        d = np.asarray(J.dequantize(jnp.asarray(lvl), jnp.asarray(qp), n))
        for i in range(4):
            assert np.array_equal(q[i], R.quantize(c[i], qp)), (qp, "q")
            assert np.array_equal(d[i], R.dequantize(lvl[i], qp)), (qp, "d")


@pytest.mark.parametrize("n", [4, 8, 16])
def test_satd_matches_reference(n):
    from hevc_tpu.encoder.reference_encoder import hadamard_satd
    rng = np.random.default_rng(1)
    d = rng.integers(-400, 400, (5, n, n)).astype(np.int32)
    got = np.asarray(J.satd(jnp.asarray(d), n))
    for i in range(5):
        assert got[i] == hadamard_satd(d[i]), i


def test_substitute_refs():
    rng = np.random.default_rng(0)
    for m in (17, 33, 65):
        for _ in range(30):
            vals = rng.integers(0, 256, (m,)).astype(np.int32)
            avail = rng.random(m) < rng.uniform(0, 1)
            # numpy reference behavior
            exp = vals.astype(np.int64).copy()
            exp[~avail] = -1
            if (exp < 0).all():
                exp[:] = 128
            else:
                if exp[0] < 0:
                    exp[0] = exp[exp >= 0][0]
                for k in range(1, m):
                    if exp[k] < 0:
                        exp[k] = exp[k - 1]
            got = np.asarray(J.substitute_refs(jnp.asarray(vals),
                                               jnp.asarray(avail)))
            assert np.array_equal(got, exp)


def test_filter_refs():
    rng = np.random.default_rng(2)
    for n in (4, 8, 16, 32):
        ref = rng.integers(0, 256, (4 * n + 1,)).astype(np.int32)
        got = np.asarray(J.filter_refs(jnp.asarray(ref)))
        assert np.array_equal(got, R.filter_reference(ref, n))


def test_intra_weight_matrices():
    from hevc_tpu.ops.intra_matrices import intra_weights
    rng = np.random.default_rng(3)
    for n in (4, 8, 16, 32):
        W, shifts = intra_weights(n)
        ref = rng.integers(0, 256, (4 * n + 1,)).astype(np.int32)
        for mode in range(35):
            pred = ((W[mode] @ ref + (1 << (shifts[mode] - 1)))
                    >> shifts[mode]).reshape(n, n)
            assert np.array_equal(pred, R.predict_intra(ref, mode, n, 1)), \
                (n, mode)
