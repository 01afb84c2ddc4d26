"""Quality harness: this encoder vs libx265 at matched bitrate (PSNR/SSIM).

VMAF is not available in this environment (no libvmaf); PSNR-Y and a simple
SSIM-Y stand in.  Produces a small rate-distortion table on the synthetic
fixture content.

Run: python tools/quality_report.py [--width 640 --height 384 --frames 4]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))


def psnr(a, b, peak=255.0):
    mse = np.mean((np.asarray(a, float) - np.asarray(b, float)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(peak * peak / mse)


def ssim_y(a, b):
    """Global simplified SSIM (8x8 block statistics)."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    H, W = a.shape
    H8, W8 = H // 8 * 8, W // 8 * 8
    a = a[:H8, :W8].reshape(H8 // 8, 8, W8 // 8, 8).transpose(0, 2, 1, 3)
    b = b[:H8, :W8].reshape(H8 // 8, 8, W8 // 8, 8).transpose(0, 2, 1, 3)
    mu_a = a.mean((2, 3))
    mu_b = b.mean((2, 3))
    va = a.var((2, 3))
    vb = b.var((2, 3))
    cov = (a * b).mean((2, 3)) - mu_a * mu_b
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2) /
         ((mu_a ** 2 + mu_b ** 2 + c1) * (va + vb + c2)))
    return float(s.mean())


def _downsample2(a):
    H, W = a.shape
    H2, W2 = H // 2 * 2, W // 2 * 2
    x = a[:H2, :W2]
    return (x[0::2, 0::2] + x[0::2, 1::2] + x[1::2, 0::2]
            + x[1::2, 1::2]) / 4.0


def ms_ssim_y(a, b, levels=5):
    """Multi-scale SSIM (Wang et al. 2003), luma, standard weights.

    The quality north-star proxy: VMAF needs libvmaf + its trained model
    (not available in this environment, no egress); MS-SSIM is the
    best-validated perceptual metric computable first-party, and the
    VMAF ~95 target corresponds to roughly MS-SSIM >= 0.99 on natural
    video (both map to 'visually indistinguishable').
    """
    weights = [0.0448, 0.2856, 0.3001, 0.2363, 0.1333][:levels]
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    vals = []
    for lv in range(levels):
        H, W = a.shape
        H8, W8 = H // 8 * 8, W // 8 * 8
        if H8 < 8 or W8 < 8:
            break
        ab = a[:H8, :W8].reshape(H8 // 8, 8, W8 // 8, 8).transpose(0, 2, 1, 3)
        bb = b[:H8, :W8].reshape(H8 // 8, 8, W8 // 8, 8).transpose(0, 2, 1, 3)
        mu_a = ab.mean((2, 3))
        mu_b = bb.mean((2, 3))
        va = ab.var((2, 3))
        vb = bb.var((2, 3))
        cov = (ab * bb).mean((2, 3)) - mu_a * mu_b
        cs = float(((2 * cov + c2) / (va + vb + c2)).mean())
        lum = float((((2 * mu_a * mu_b + c1)
                      / (mu_a ** 2 + mu_b ** 2 + c1))).mean())
        vals.append((lum, max(cs, 1e-6)))
        if lv < levels - 1:
            a = _downsample2(a)
            b = _downsample2(b)
    out = 1.0
    for i, (lum, cs) in enumerate(vals):
        w = weights[i]
        out *= (lum ** w if i == len(vals) - 1 else 1.0) * cs ** w
    return out


def run(width, height, n_frames, qps, crfs):
    from generate_test_videos import synth_frame
    from hevc_tpu.validate import avref
    from hevc_tpu.encoder.rowscan_v1 import RowScanEncoderV1
    from hevc_tpu.encoder.rowscan_jax import RowScanEncoder
    from hevc_tpu.encoder.frame_jax import pick_tile_grid
    from hevc_tpu.entropy.headers import StreamConfig, write_vps, write_sps, \
        write_pps
    from hevc_tpu.entropy.tiled_v1 import entropy_encode_frame_v1
    from hevc_tpu.entropy.tiled import entropy_encode_frame_tiled
    from hevc_tpu.utils.bitio import annexb

    frames = [tuple(np.asarray(p, np.int32) for p in synth_frame(width, height, t))
              for t in range(n_frames)]
    u8 = [tuple(np.asarray(p, np.uint8) for p in f) for f in frames]
    tc, tr = pick_tile_grid((height + 15) // 16, (width + 15) // 16)
    rows = []

    for tag, opts in (("libx265-medium", ""),
                      ("libx265-medium-intra",
                       "x265-params=keyint=1:no-scenecut=1")):
        for crf in crfs:
            t0 = time.time()
            bs = avref.encode(u8, "libx265", crf=crf, preset="medium",
                              opts=opts)
            enc_t = time.time() - t0
            dec = avref.decode_hevc(bs)
            p = np.mean([psnr(d[0], f[0]) for d, f in zip(dec, frames)])
            s = np.mean([ssim_y(d[0], f[0]) for d, f in zip(dec, frames)])
            ms = np.mean([ms_ssim_y(d[0], f[0]) for d, f in zip(dec, frames)])
            rows.append(dict(codec=tag, q=f"crf{crf}",
                             bytes=len(bs), psnr_y=round(p, 2),
                             ssim_y=round(s, 4), ms_ssim_y=round(ms, 5),
                             fps=round(n_frames / enc_t, 2)))

    for name, enc_cls, ent in (("ours-v1(NxN)", RowScanEncoderV1,
                                entropy_encode_frame_v1),
                               ("ours-v0(16x16)", RowScanEncoder,
                                entropy_encode_frame_tiled)):
        for qp in qps:
            cfg = StreamConfig(width=width, height=height, qp=qp,
                               tile_cols=tc, tile_rows=tr, deblock=True)
            enc = enc_cls(qp)
            t0 = time.time()
            res = enc.encode_frames_tiled(frames, tc, tr)
            nals = [ent(cfg, r) for r in res]
            enc_t = time.time() - t0
            stream = annexb([write_vps(cfg), write_sps(cfg), write_pps(cfg)]
                            + nals)
            dec = avref.decode_hevc(stream)
            p = np.mean([psnr(d[0], f[0]) for d, f in zip(dec, frames)])
            s = np.mean([ssim_y(d[0], f[0]) for d, f in zip(dec, frames)])
            ms = np.mean([ms_ssim_y(d[0], f[0]) for d, f in zip(dec, frames)])
            rows.append(dict(codec=name, q=f"qp{qp}", bytes=len(stream),
                             psnr_y=round(p, 2), ssim_y=round(s, 4),
                             ms_ssim_y=round(ms, 5),
                             fps=round(n_frames / enc_t, 2)))

    # inter GOP modes on the PRODUCTION device path (chunked scan; falls
    # back to the numpy reference encoder when no accelerator is usable)
    from hevc_tpu.encoder.gop import GopEncoder
    for name, bflag in (("ours-P(MC+subpel)", False), ("ours-B(IbPbP)", True)):
        for qp in qps:
            cfg = StreamConfig(width=width, height=height, qp=qp,
                               tile_cols=tc, tile_rows=tr, deblock=True,
                               inter=True, bframes=bflag)
            t0 = time.time()
            stream = GopEncoder(cfg).encode_video_chunked(frames, gop=0)
            enc_t = time.time() - t0
            dec = avref.decode_hevc(stream)
            p = np.mean([psnr(d[0], f[0]) for d, f in zip(dec, frames)])
            s = np.mean([ssim_y(d[0], f[0]) for d, f in zip(dec, frames)])
            ms = np.mean([ms_ssim_y(d[0], f[0]) for d, f in zip(dec, frames)])
            rows.append(dict(codec=name, q=f"qp{qp}", bytes=len(stream),
                             psnr_y=round(p, 2), ssim_y=round(s, 4),
                             ms_ssim_y=round(ms, 5),
                             fps=round(n_frames / enc_t, 2)))
    return rows


def bd_rate(rate1, psnr1, rate2, psnr2) -> float:
    """Bjontegaard delta-rate (%) of curve 2 vs curve 1 (negative = curve 2
    needs fewer bits at equal quality).  Cubic fit of log-rate over PSNR,
    integrated over the overlapping quality interval."""
    lr1, lr2 = np.log(np.asarray(rate1, float)), np.log(np.asarray(rate2,
                                                                   float))
    p1 = np.polyfit(psnr1, lr1, 3)
    p2 = np.polyfit(psnr2, lr2, 3)
    lo = max(min(psnr1), min(psnr2))
    hi = min(max(psnr1), max(psnr2))
    if hi <= lo:
        return float("nan")
    i1 = np.polyint(p1)
    i2 = np.polyint(p2)
    avg1 = (np.polyval(i1, hi) - np.polyval(i1, lo)) / (hi - lo)
    avg2 = (np.polyval(i2, hi) - np.polyval(i2, lo)) / (hi - lo)
    return float((np.exp(avg2 - avg1) - 1) * 100)


def run_bd(width, height, n_frames, qps, crfs, kinds, gop=30,
           encoder="ctb16"):
    """Production-path vs libx265-medium across content classes; prints
    per-point rows + one BD-rate summary per class (VERDICT r2 item 9:
    multi-content, multi-QP, BD-rate).  encoder: 'ctb16' = GopEncoder
    chunked IbPbP; 'ctb32' = Ctb32GopEncoder IbPbP+SDH (the ctb32
    preset)."""
    from generate_test_videos import synth_frame_kind
    from hevc_tpu.validate import avref
    from hevc_tpu.encoder.frame_jax import pick_tile_grid
    from hevc_tpu.encoder.gop import GopEncoder
    from hevc_tpu.entropy.headers import StreamConfig

    if encoder == "ctb32":
        from hevc_tpu.encoder.gop32 import Ctb32GopEncoder, \
            make_ctb32_config
        tc, tr = pick_tile_grid((height + 31) // 32, (width + 31) // 32,
                                ctb=32)
    else:
        tc, tr = pick_tile_grid((height + 15) // 16, (width + 15) // 16)
    summary = []
    for kind in kinds:
        frames = [tuple(np.asarray(p, np.int32)
                        for p in synth_frame_kind(width, height, t, kind))
                  for t in range(n_frames)]
        u8 = [tuple(np.asarray(p, np.uint8) for p in f) for f in frames]
        xr, xd = [], []
        for crf in crfs:
            bs = avref.encode(u8, "libx265", crf=crf, preset="medium",
                              opts=f"x265-params=keyint={gop}:no-scenecut=1")
            dec = avref.decode_hevc(bs)
            p = float(np.mean([psnr(d[0], f[0])
                               for d, f in zip(dec, frames)]))
            xr.append(len(bs) * 8.0)
            xd.append(p)
            print(json.dumps(dict(kind=kind, codec="libx265-medium",
                                  q=f"crf{crf}", bytes=len(bs),
                                  psnr_y=round(p, 2))))
        orate, od = [], []
        for qp in qps:
            t0 = time.time()
            if encoder == "ctb32":
                cfg = make_ctb32_config(width=width, height=height, qp=qp,
                                        tile_cols=tc, tile_rows=tr,
                                        inter=True, bframes=True, sdh=True,
                                        sao=True, weightp=True,
                                        bframes_n=2)
                stream = Ctb32GopEncoder(cfg).encode_video(frames, gop=gop)
            else:
                cfg = StreamConfig(width=width, height=height, qp=qp,
                                   tile_cols=tc, tile_rows=tr, deblock=True,
                                   inter=True, bframes=True, sdh=True,
                                   weightp=True, bframes_n=2)
                stream = GopEncoder(cfg).encode_video_chunked(frames,
                                                              gop=gop)
            enc_t = time.time() - t0
            dec = avref.decode_hevc(stream)
            p = float(np.mean([psnr(d[0], f[0])
                               for d, f in zip(dec, frames)]))
            orate.append(len(stream) * 8.0)
            od.append(p)
            print(json.dumps(dict(kind=kind, codec=f"ours-{encoder}",
                                  q=f"qp{qp}",
                                  bytes=len(stream), psnr_y=round(p, 2),
                                  fps=round(n_frames / enc_t, 2))))
        bd = bd_rate(xr, xd, orate, od)
        row = dict(kind=kind, encoder=encoder,
                   bd_rate_vs_x265_medium_pct=round(bd, 1))
        summary.append(row)
        print(json.dumps(row))
    return summary


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=384)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--bd", action="store_true",
                    help="BD-rate harness on the production path")
    ap.add_argument("--kinds", default="mixed,pan,detail")
    ap.add_argument("--encoder", default="ctb16",
                    choices=["ctb16", "ctb32"])
    args = ap.parse_args()
    if args.bd:
        run_bd(args.width, args.height, max(args.frames, 8),
               qps=(22, 27, 32, 37), crfs=(18, 23, 28, 33),
               kinds=args.kinds.split(","), encoder=args.encoder)
    else:
        rows = run(args.width, args.height, args.frames,
                   qps=(22, 27, 32, 37), crfs=(18, 23, 28, 33))
        for r in rows:
            print(json.dumps(r))
