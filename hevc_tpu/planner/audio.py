"""Audio policy (reference get_audio_flags parity, core/transcoder.py:423-450).

AAC-LC at 48 kHz; bitrate = clamp(64k per channel, [128k, 512k]), at least
256k for >2 channels; explicit channel layouts for mono/stereo/5.1/7.1.
"""
from __future__ import annotations

from dataclasses import dataclass

CHANNEL_LAYOUTS = {1: "mono", 2: "stereo", 6: "5.1", 8: "7.1"}


@dataclass
class AudioPlan:
    codec: str = "aac"
    sample_rate: int = 48000
    channels: int = 2
    bitrate: int = 128_000
    layout: str = "stereo"


def plan_audio(channels: int, sample_rate: int = 48000) -> AudioPlan:
    ch = max(1, channels)
    bitrate = min(max(64_000 * ch, 128_000), 512_000)
    if ch > 2:
        bitrate = max(bitrate, 256_000)
    return AudioPlan(sample_rate=48000, channels=ch, bitrate=bitrate,
                     layout=CHANNEL_LAYOUTS.get(ch, f"{ch}ch"))


def resample_pcm(pcm, rate_in: int, rate_out: int = 48000):
    """Rational polyphase resampler (Kaiser-windowed sinc), numpy.

    pcm: (samples, channels) int16/float; returns (samples', channels) of
    the same dtype family (float32 internally).  The reference reached its
    48 kHz policy target through ffmpeg's -ar; this is the first-party
    equivalent for the AAC path.
    """
    import math
    import numpy as np
    if rate_in == rate_out:
        return pcm
    g = math.gcd(rate_in, rate_out)
    L, M = rate_out // g, rate_in // g
    x = np.asarray(pcm, np.float32)
    n_taps_per_phase = 24
    cutoff = 0.45 / max(1, M / L) if L < M else 0.45
    n = n_taps_per_phase * L
    # integer-centered tap grid: h[k*L + p] evaluates the prototype at
    # t = k + p/L - n_taps/2 exactly on the polyphase lattice
    t = (np.arange(n) - n // 2) / L
    # per-output polyphase form uses real samples (no zero stuffing):
    # prototype gain 1, each phase's taps sum to ~1
    h = np.sinc(2 * cutoff * t) * 2 * cutoff
    h *= np.kaiser(n, 8.6)
    h = h.reshape(n_taps_per_phase, L)
    h /= h.sum(0, keepdims=True)           # exact unity DC gain per phase
    h = h.reshape(-1)
    # polyphase decomposition: output j uses phase (j*M) % L at input
    # offset (j*M) // L
    out_len = int(len(x) * L // M)
    idx = np.arange(out_len)
    phase = (idx * M) % L
    base = (idx * M) // L
    xp = np.pad(x, ((n_taps_per_phase, n_taps_per_phase), (0, 0)))
    taps = h.reshape(n_taps_per_phase, L)      # taps[k, phase]
    out = np.zeros((out_len, x.shape[1]), np.float32)
    half = n_taps_per_phase // 2
    for k in range(n_taps_per_phase):
        # y[j] = sum_k h[k*L + p] * x[base + half - k]
        out += taps[k, phase][:, None] * xp[base + n_taps_per_phase
                                            + half - k]
    if np.issubdtype(np.asarray(pcm).dtype, np.integer):
        return np.clip(np.round(out), -32768, 32767).astype(np.int16)
    return out
