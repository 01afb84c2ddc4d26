"""Encoder-level RDOQ A/B: full v1 encode (I+P+B), real streams, BD-rate.

Complements tools/rdoq_calib.py (TU-level, real CABAC bits): this runs
the whole scalar v1 encoder with cfg.rdoq off/on across 4 QPs, decodes
each stream with libavcodec, and reports PSNR-Y / bytes / BD-rate so
the preset decision (RDOQ on/off) is tied to an end-to-end measurement
including intra-prediction feedback, SDH interaction, and mode-decision
coupling.

Run: python tools/rdoq_ab.py [--w 256 --h 128 --frames 4]
"""
from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))


def psnr_y(a, b):
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255 * 255 / mse)


def run(cfg_base, frames, rdoq, qps):
    from hevc_tpu.encoder.reference_encoder_v1 import RefIntraEncoderV1
    from hevc_tpu.validate import avref
    pts = []
    for qp in qps:
        cfg = dataclasses.replace(cfg_base, qp=qp, rdoq=rdoq)
        enc = RefIntraEncoderV1(cfg)
        t0 = time.time()
        bs, _ = enc.encode_video(frames, gop=0)
        dec = avref.decode_hevc(bs)
        ps = np.mean([psnr_y(frames[i][0], dec[i][0])
                      for i in range(len(frames))])
        pts.append((len(bs), ps))
        print(f"rdoq={int(rdoq)} qp{qp}: {len(bs):7d} B  psnr {ps:6.3f}  "
              f"({time.time()-t0:.0f}s)", flush=True)
    return pts


from bd import bd_rate  # shared PCHIP Bjontegaard fit (tools/bd.py)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--w", type=int, default=256)
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--qps", type=str, default="22,27,32,37")
    ap.add_argument("--bframes", action="store_true")
    args = ap.parse_args()
    from generate_test_videos import synth_frame
    from hevc_tpu.entropy.headers import StreamConfig

    frames = [tuple(np.asarray(p, np.int32)
                    for p in synth_frame(args.w, args.h, 3 * t))
              for t in range(args.frames)]
    qps = [int(q) for q in args.qps.split(",")]
    cfg = StreamConfig(width=args.w, height=args.h, qp=27, inter=True,
                       sdh=True, bframes=args.bframes)
    off = run(cfg, frames, False, qps)
    on = run(cfg, frames, True, qps)
    print(f"BD-rate rdoq-on vs off: {bd_rate(off, on):+.2f}%")


if __name__ == "__main__":
    main()
