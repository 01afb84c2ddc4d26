"""Shared Bjontegaard BD-rate helper (ADVICE r4 items 1-2).

Standard BD-rate: integrate the difference of the two rate-distortion
curves in log-rate over the overlapping PSNR range, with a monotone
PCHIP fit (the form used by JCT-VC common-test-condition scripts).
Guards: requires >= 2 points per curve, strictly increasing PSNR after
sorting, and a non-empty shared PSNR range — returns NaN (with a
warning on stderr) instead of silently interpolating garbage.
"""
from __future__ import annotations

import sys

import numpy as np


def bd_rate(ref, test) -> float:
    """ref/test: sequences of (bytes_or_bitrate, psnr) points.
    Returns BD-rate of `test` vs `ref` in percent (+ = test spends more
    bits at equal quality), or NaN when the curves don't admit the
    standard computation."""
    try:
        from scipy.interpolate import PchipInterpolator
    except Exception:
        PchipInterpolator = None

    def prep(pts):
        pts = sorted((float(p[1]), np.log(float(p[0]))) for p in pts)
        ps = np.asarray([p[0] for p in pts])
        rs = np.asarray([p[1] for p in pts])
        return ps, rs

    p1, r1 = prep(ref)
    p2, r2 = prep(test)
    if len(p1) < 2 or len(p2) < 2:
        print("bd_rate: need >= 2 points per curve", file=sys.stderr)
        return float("nan")
    if np.any(np.diff(p1) <= 0) or np.any(np.diff(p2) <= 0):
        print("bd_rate: PSNR not strictly monotone (saturated curve?)",
              file=sys.stderr)
        return float("nan")
    lo = max(p1.min(), p2.min())
    hi = min(p1.max(), p2.max())
    if hi <= lo:
        print("bd_rate: no overlapping PSNR range", file=sys.stderr)
        return float("nan")
    xs = np.linspace(lo, hi, 100)
    if PchipInterpolator is not None:
        i1 = PchipInterpolator(p1, r1)(xs)
        i2 = PchipInterpolator(p2, r2)(xs)
    else:                                   # piecewise-linear fallback
        i1 = np.interp(xs, p1, r1)
        i2 = np.interp(xs, p2, r2)
    return float(np.exp(np.mean(i2 - i1)) - 1) * 100
