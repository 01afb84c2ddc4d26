"""RDOQ lambda calibration against REAL CABAC bits (round-3 judge item 6).

RDOQ-lite (ops/reference.quantize_rdoq) was measured as a regression
(+3% bytes, -0.3 dB) and is OFF at every preset tier.  The judge's
diagnosis: the lambda/bits model is uncalibrated.  This harness measures
the truth on a TU corpus:

  * corpus: 16x16 luma transform blocks from synthetic content, both
    inter-like (frame difference with a 1px misregistration, i.e. what
    an imperfect MC leaves behind) and intra-like (block minus DC
    prediction) residuals;
  * rate: REAL CABAC bits from SliceSyntaxEncoder.encode_residual
    (context-coded, sequential over the corpus, so context adaptation
    is included) — not the quarter-bit estimate;
  * distortion: pixel-domain SSE of the dequant+inverse-transform
    reconstruction against the original residual.

It then prints, per QP and per quantizer variant, (kbits, MSE, psnr)
and a BD-rate-style delta of each variant vs the deadzone baseline, so
a lambda fix is judged by measurement, not by eye.

Run: python tools/rdoq_calib.py [--n 120]
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent.parent / "tests"))


def make_corpus(n_blocks: int, seed: int = 7):
    """16x16 residual blocks (pixel domain, int32) from synth content."""
    from generate_test_videos import synth_frame
    rng = np.random.default_rng(seed)
    blocks = []
    t = 0
    while len(blocks) < n_blocks:
        y0 = np.asarray(synth_frame(320, 192, t)[0], np.int32)
        y1 = np.asarray(synth_frame(320, 192, t + 1)[0], np.int32)
        # inter-like: 1px misregistered difference
        d = y1[1:, 1:] - y0[:-1, :-1]
        H, W = d.shape
        for by in range(0, H - 16, 48):
            for bx in range(0, W - 16, 48):
                blocks.append(d[by:by + 16, bx:bx + 16])
        # intra-like: DC-removed blocks
        for _ in range(4):
            by = int(rng.integers(0, 192 - 16))
            bx = int(rng.integers(0, 320 - 16))
            b = y0[by:by + 16, bx:bx + 16]
            blocks.append(b - int(b.mean()))
        t += 2
    return blocks[:n_blocks]


def measure(blocks, qp: int, quantizer, bit_depth: int = 8,
            log2n: int = 4):
    """(total real CABAC bits, total pixel SSE) for one quantizer fn.

    Bits are per-block cabac.bitcount deltas: renormalization carry and
    the final flush/termination bits are excluded, undercounting each
    variant by a near-constant few bits per run (ADVICE r4 item 5) —
    negligible for the A/B deltas this tool reports."""
    from hevc_tpu.entropy.syntax import SliceSyntaxEncoder
    from hevc_tpu.entropy import tables as T
    from hevc_tpu.ops import reference as R
    syn = SliceSyntaxEncoder(qp)
    scan = T.intra_scan_idx(log2n, 1, 0)        # diag
    bits = 0
    sse = 0
    nz_blocks = 0
    for resi in blocks:
        coef = R.forward_transform(resi, dst=False, bit_depth=bit_depth)
        lvl = quantizer(coef, qp)
        if np.any(lvl):
            b0 = syn.cabac.bitcount
            syn.encode_residual(lvl, log2n, scan, 0)
            bits += syn.cabac.bitcount - b0
            rec = R.inverse_transform(R.dequantize(lvl, qp, bit_depth),
                                      dst=False, bit_depth=bit_depth)
            nz_blocks += 1
        else:
            rec = np.zeros_like(resi)
        bits += 1   # cbf flag nominal
        e = resi.astype(np.int64) - rec
        sse += int((e * e).sum())
    return bits, sse, nz_blocks


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=120)
    ap.add_argument("--qps", type=str, default="22,27,32,37")
    ap.add_argument("--size", type=int, default=16)
    args = ap.parse_args()
    from hevc_tpu.ops import reference as R

    blocks = make_corpus(args.n)
    if args.size != 16:
        # tile every 16x16 residual into ALL native-size sub-blocks so
        # small-TU stats aren't biased to the low-frequency top-left
        # crop (ADVICE r4 item 3)
        s = args.size
        blocks = [b[r:r + s, c:c + s] for b in blocks
                  for r in range(0, 16, s) for c in range(0, 16, s)]
    qps = [int(q) for q in args.qps.split(",")]


    variants = {
        "deadzone": lambda c, q: R.quantize(c, q, 8, intra=False),
        "rdoq": lambda c, q: R.quantize_rdoq(c, q, 8, intra=False),
    }
    # optional variants registered by the sweep below
    if hasattr(R, "quantize_rdoq2"):
        variants["rdoq2"] = lambda c, q: R.quantize_rdoq2(c, q, 8,
                                                          intra=False)

    log2n = args.size.bit_length() - 1
    npx = args.n * args.size * args.size
    curves = {}
    for name, fn in variants.items():
        pts = []
        for qp in qps:
            bits, sse, nzb = measure(blocks, qp, fn, log2n=log2n)
            mse = sse / npx
            psnr = 99.0 if mse == 0 else 10 * np.log10(255 * 255 / mse)
            pts.append((bits, psnr))
            print(f"{name:10s} qp{qp}: {bits/1000:8.1f} kbits  "
                  f"psnr {psnr:6.3f}  nz_blocks {nzb}")
        curves[name] = pts

    from bd import bd_rate  # shared PCHIP Bjontegaard fit (tools/bd.py)

    base = curves["deadzone"]
    for name, pts in curves.items():
        if name == "deadzone":
            continue
        print(f"BD-rate {name} vs deadzone: {bd_rate(base, pts):+.2f}%")


if __name__ == "__main__":
    main()
