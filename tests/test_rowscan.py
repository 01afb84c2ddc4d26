"""Row-scan tiled encoder must match the wavefront encoder bit-exactly."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")

from hevc_tpu.encoder.frame_jax import JaxIntraEncoder  # noqa: E402
from hevc_tpu.encoder.rowscan_jax import RowScanEncoder  # noqa: E402

KEYS = ("modes", "cbf_y", "cbf_cb", "cbf_cr", "lvl_y", "lvl_cb", "lvl_cr")


def _frames(n=2, W=128, H=96, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        y = np.clip(128 + rng.integers(-60, 60, (H, W)), 0, 255).astype(np.int32)
        cb = np.clip(128 + rng.integers(-25, 25, (H // 2, W // 2)), 0, 255).astype(np.int32)
        cr = np.clip(128 + rng.integers(-25, 25, (H // 2, W // 2)), 0, 255).astype(np.int32)
        out.append((y, cb, cr))
    return out


@pytest.mark.slow
@pytest.mark.parametrize("tc,tr", [(2, 2), (4, 3), (1, 1)])
@pytest.mark.parametrize("qp", [22, 35])
def test_rowscan_matches_wavefront(tc, tr, qp):
    frames = _frames()
    a = JaxIntraEncoder(qp).encode_frames_tiled(frames, tc, tr)
    b = RowScanEncoder(qp).encode_frames_tiled(frames, tc, tr)
    for x, z in zip(a, b):
        for k in KEYS:
            assert np.array_equal(x[k], z[k]), k
        for k in ("y", "cb", "cr"):
            assert np.array_equal(x["recon"][k], z["recon"][k]), k


def test_rowscan_no_recon_flag():
    frames = _frames(1)
    r = RowScanEncoder(30).encode_frames_tiled(frames, 2, 2, want_recon=False)
    assert "recon" not in r[0]
    assert r[0]["modes"].shape == (6, 8)
