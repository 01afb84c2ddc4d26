"""Upscaler (C20 parity) and audio policy (C8 parity) tests."""
import sys
from fractions import Fraction
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
sys.path.insert(0, str(Path(__file__).parent))
from generate_test_videos import generate_clip, synth_frame  # noqa: E402

from hevc_tpu.models.upscale import auto_target_height, \
    upscale_frames_lanczos, upscale_video, init_rrdb_params, rrdb_forward  # noqa: E402
from hevc_tpu.planner.audio import plan_audio  # noqa: E402
from hevc_tpu.validate import avref  # noqa: E402


def test_auto_target_height():
    assert auto_target_height(480) == 1080
    assert auto_target_height(720) == 1080
    assert auto_target_height(1080) == 2160
    assert auto_target_height(1440) == 2160
    assert auto_target_height(2160) == 2160
    assert auto_target_height(4320) == 4320


def test_lanczos_upscale_shapes():
    frames = [synth_frame(96, 64, t) for t in range(2)]
    up = upscale_frames_lanczos(frames, 128)
    assert up[0][0].shape == (128, 192)
    assert up[0][1].shape == (64, 96)
    # no-op when target <= source
    same = upscale_frames_lanczos(frames, 64)
    assert same[0][0].shape == (64, 96)


def test_upscale_video_end_to_end(tmp_path):
    clip = generate_clip(tmp_path / "c.y4m", 96, 64, 4)
    res = upscale_video(clip, tmp_path / "up.mp4", target_height=128, batch=2)
    assert res["status"] == "SUCCESS" and res["frames"] == 4
    from hevc_tpu.io.probe import probe_media
    info = probe_media(tmp_path / "up.mp4")
    assert (info.width, info.height) == (192, 128)


def test_rrdb_forward_shape():
    params = init_rrdb_params(np.random.default_rng(0), nf=16, nb=1, gc=8)
    import jax.numpy as jnp
    out = rrdb_forward(params, jnp.ones((1, 1, 16, 16), jnp.float32))
    assert out.shape == (1, 1, 32, 32)


def test_audio_policy():
    assert plan_audio(1).bitrate == 128_000
    assert plan_audio(2).bitrate == 128_000
    assert plan_audio(6).bitrate == 384_000
    assert plan_audio(8).bitrate == 512_000
    assert plan_audio(6).layout == "5.1"
    assert plan_audio(2).sample_rate == 48000


@pytest.mark.skipif(not avref.available(), reason="avref unavailable")
def test_aac_roundtrip(tmp_path):
    t = np.arange(48000) / 48000.0
    pcm = (np.stack([np.sin(2 * np.pi * 440 * t)] * 2, 1) * 12000).astype(np.int16)
    pkts = avref.encode_aac(pcm, 48000, 128_000)
    assert pkts and sum(map(len, pkts)) > 1000
    # mux with video and read back both streams
    from hevc_tpu.entropy.headers import StreamConfig, write_vps, write_sps, \
        write_pps
    from hevc_tpu.encoder.toplevel import VideoEncoder
    from hevc_tpu.io.mp4 import mux_mp4
    from hevc_tpu.utils.bitio import length_prefixed
    cfg = StreamConfig(width=96, height=64, qp=30)
    enc = VideoEncoder(cfg, backend="jax")
    samples = []
    for tt in range(4):
        y, cb, cr = [np.asarray(p, np.int32) for p in synth_frame(96, 64, tt)]
        nal, _ = enc.encode_frame(y, cb, cr)
        samples.append(length_prefixed([nal]))
    mux_mp4(tmp_path / "av.mp4", samples, cfg, fps=Fraction(30),
            vps=write_vps(cfg), sps=write_sps(cfg), pps=write_pps(cfg),
            audio={"packets": pkts, "rate": 48000, "channels": 2,
                   "bitrate": 128_000})
    assert len(avref.decode_file(tmp_path / "av.mp4")) == 4
    aud = avref.decode_audio(tmp_path / "av.mp4")
    assert aud is not None and aud[1] == 48000 and aud[0].shape[1] == 2


def test_mc_interpolation_beats_blend_on_pan():
    """The fps doubler uses motion-compensated interpolation (reference
    minterpolate mci/aobmc parity), not a frame blend: on panning content
    the MC midpoint must beat the blend midpoint by several dB."""
    from numpy.lib.stride_tricks import sliding_window_view
    from hevc_tpu.ops.minterp import mc_interpolate_pair
    rng = np.random.default_rng(2)
    H, W = 64, 96
    base = rng.integers(0, 256, (H + 36, W + 68)).astype(float)
    base = np.pad(base, 2, mode="edge")
    base = (sliding_window_view(base, (5, 5)).reshape(H + 36, W + 68, 25)
            @ (np.ones(25) / 25)).astype(np.uint8)

    def frame(shift):
        return tuple(np.ascontiguousarray(p).astype(np.uint8) for p in (
            base[:H, shift:shift + W],
            base[:H:2, shift // 2: shift // 2 + W // 2],
            base[2:H + 2:2, shift // 2: shift // 2 + W // 2]))

    a, truth, b = frame(0), frame(6), frame(12)
    mc = mc_interpolate_pair(a, b)
    blend = tuple(((x.astype(np.uint16) + z.astype(np.uint16) + 1) // 2
                   ).astype(np.uint8) for x, z in zip(a, b))

    def psnr(x, t):
        mse = np.mean((x.astype(float) - t.astype(float)) ** 2)
        return 10 * np.log10(255 ** 2 / max(mse, 1e-9))

    assert psnr(mc[0], truth[0]) > psnr(blend[0], truth[0]) + 4
