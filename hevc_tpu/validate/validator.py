"""Output conformance validation — the AppleHEVCValidator equivalent.

The reference shelled out to a closed Apple binary (reference
core/transcoder.py:35-68) and *passed through with a warning* when it was
missing.  Here validation is first-party and always available:

  1. container checks: hvc1 sample entry, colr atom, brand mp42, faststart,
     mdcv/clli presence for HDR10 (the exact atom set from SURVEY C9)
  2. level/tier constraint checks against the HEVC level table (SURVEY C4)
  3. full normative decode of every sample with the in-framework decoder,
     optionally cross-checked with the independent libavcodec decoder
  4. whole-stream pixel verification against encoder recon digests when
     the encode path supplies them (validate/digest.py): every frame
     libavcodec decodes is reduced to a 6-word digest and compared with
     the digest the encoder computed on device at encode time

The pure-Python normative decode is bounded (DEEP_SELF_DECODE leading
samples + the final GOP); the digest check covers every frame that has
a digest, so late corruption cannot slip through on digested paths.

Returns (ok, messages).
"""
from __future__ import annotations

import logging
from pathlib import Path

import numpy as np

from hevc_tpu.planner.levels import HEVC_LEVEL_LIMITS

log = logging.getLogger(__name__)

# production validate runs the exact-but-slow pure-Python normative decoder
# on this many leading samples (libavcodec still decodes the WHOLE stream);
# tests that want a full self-decode use decode_annexb directly
DEEP_SELF_DECODE = 32


def validate_mp4(path, expect_hdr: bool = False, deep: bool = True,
                 cross_check: bool = True,
                 recon_digests=None) -> tuple[bool, list[str]]:
    """recon_digests: optional {display_index: (6,) int32} of encoder
    reconstruction digests (validate/digest.py) over the cropped frame;
    every covered frame of the libavcodec decode must match."""
    msgs: list[str] = []
    path = Path(path)
    try:
        from hevc_tpu.io.mp4parse import probe_mp4, extract_samples
        info = probe_mp4(path)
    except Exception as e:
        return False, [f"container parse failed: {e}"]

    if info.get("sample_entry") != "hvc1":
        msgs.append(f"sample entry is {info.get('sample_entry')} not hvc1")
    if info.get("brand") != "mp42":
        msgs.append(f"major brand {info.get('brand')} != mp42")
    if not info.get("faststart", False):
        msgs.append("moov after mdat (no faststart)")
    if "colr" not in info:
        msgs.append("missing colr atom")
    if expect_hdr and not info.get("mdcv"):
        msgs.append("HDR10 output missing mdcv atom")
    if expect_hdr and not info.get("clli"):
        msgs.append("HDR10 output missing clli atom")

    hvcc = info.get("hvcc")
    if not hvcc:
        msgs.append("missing hvcC configuration")
        return False, msgs

    # level constraints (SURVEY C4 table)
    level = hvcc["level_idc"] / 30.0
    lim = HEVC_LEVEL_LIMITS.get(round(level, 1))
    w, h = info.get("width", 0), info.get("height", 0)
    fps = float(info.get("fps", 30))
    if lim is None:
        msgs.append(f"unknown level_idc {hvcc['level_idc']}")
    else:
        if w * h > lim[0]:
            msgs.append(f"frame samples {w*h} exceed level {level} limit {lim[0]}")
        if w * h * fps > lim[1]:
            msgs.append(f"sample rate exceeds level {level} limit")

    if deep and not msgs:
        try:
            ok_deep, deep_msgs = _deep_decode(path, cross_check,
                                              recon_digests)
            msgs += deep_msgs
            if not ok_deep:
                return False, msgs
        except Exception as e:
            msgs.append(f"deep decode failed: {e}")
            return False, msgs
    return len(msgs) == 0, msgs


def _deep_decode(path, cross_check: bool,
                 recon_digests=None) -> tuple[bool, list[str]]:
    """Decode every sample with the in-framework decoder; optionally compare
    bit-exactly against libavcodec and against encoder recon digests."""
    from hevc_tpu.io.mp4parse import extract_samples
    from hevc_tpu.decoder.decode import decode_annexb
    from hevc_tpu.utils.bitio import annexb

    info, samples = extract_samples(path)
    hvcc = info["hvcc"]
    ps = [hvcc["nals"][t][0] for t in (32, 33, 34) if t in hvcc["nals"]]
    ln = hvcc.get("length_size", 4)
    nals = list(ps)
    missing_aud = 0
    for s in samples:
        off = 0
        first = True
        while off + ln <= len(s):
            sz = int.from_bytes(s[off:off + ln], "big")
            nal = s[off + ln:off + ln + sz]
            if first:
                # Apple compliance: every access unit starts with an AUD
                # (reference forces `-aud 1`, core/transcoder.py:148-153)
                if not nal or (nal[0] >> 1) & 0x3F != 35:
                    missing_aud += 1
                first = False
            nals.append(nal)
            off += ln + sz
    if missing_aud:
        return False, [f"{missing_aud} samples missing leading AUD NAL"]
    msgs = []

    # Full-stream decode with the independent libavcodec decoder (linked C,
    # fast): every sample of every output is independently decodable.
    ref = None
    if cross_check:
        from hevc_tpu.validate import avref
        if avref.available():
            ref = avref.decode_file(str(path), max_frames=len(samples))
            if ref is None or len(ref) != len(samples):
                return False, ["libavcodec frame count mismatch "
                               f"({0 if ref is None else len(ref)} vs "
                               f"{len(samples)})"]
        else:
            # cross-checker missing => warn and pass through (the reference's
            # validator-missing semantics, core/transcoder.py:52-54)
            log.warning("libavcodec unavailable; self-decode only")

    # Whole-stream pixel verification: every digested display frame of the
    # libavcodec decode must match the digest the encoder computed from its
    # own reconstruction at encode time (24 bytes/frame; validate/digest.py)
    if ref is not None and recon_digests:
        from hevc_tpu.validate.digest import digest_frame_np
        for idx, want in recon_digests.items():
            if not 0 <= idx < len(ref):
                return False, [f"digest index {idx} out of range"]
            got = digest_frame_np(*ref[idx])
            if not np.array_equal(got, np.asarray(want, np.int32)):
                return False, [f"frame {idx}: decoded pixels do not match "
                               "encoder reconstruction digest"]

    # Normative decode with the in-framework (pure-Python) decoder: exact but
    # slow, so bounded in production to the first DEEP_SELF_DECODE samples
    # plus (late-corruption coverage) the final GOP from its sync sample
    # (inter frames need the DPB chain from an IDR/sync).
    def _self_decode_run(first, count, ref_off):
        n_run = min(len(samples) - first, count)
        prefix = list(ps)
        for s in samples[first:first + n_run]:
            off = 0
            while off + ln <= len(s):
                sz = int.from_bytes(s[off:off + ln], "big")
                prefix.append(s[off + ln:off + ln + sz])
                off += ln + sz
        frames = decode_annexb(annexb(prefix))
        if len(frames) != n_run:
            return [f"decoded {len(frames)} frames, expected {n_run}"]
        # decode order runs ahead of display order (B reordering), so the
        # run's tail may miss display slot(s); compare only the contiguous
        # display prefix (epoch/poc bookkeeping from decode_annexb)
        k, exp = 0, None
        for f in frames:
            if exp is None or f["epoch"] != exp[0]:
                exp = (f["epoch"], 0)
            if f["poc"] != exp[1]:
                break
            exp = (exp[0], exp[1] + 1)
            k += 1
        if ref is None:
            return []
        for i, mine in enumerate(frames[:k]):
            ry, rcb, rcr = ref[ref_off + i]
            for a, kk in ((ry, "y"), (rcb, "cb"), (rcr, "cr")):
                m = mine[kk][:a.shape[0], :a.shape[1]]
                if not np.array_equal(a.astype(np.int32), m):
                    return [f"frame {ref_off + i} plane {kk}: "
                            "decoder mismatch"]
        return []

    bad = _self_decode_run(0, DEEP_SELF_DECODE, 0)
    if bad:
        return False, msgs + bad
    syncs = info.get("sync_samples") or []
    last_sync = max((s - 1 for s in syncs if s - 1 >= DEEP_SELF_DECODE),
                    default=None)
    if last_sync is not None:
        bad = _self_decode_run(last_sync, DEEP_SELF_DECODE, last_sync)
        if bad:
            return False, msgs + bad
    return True, msgs
