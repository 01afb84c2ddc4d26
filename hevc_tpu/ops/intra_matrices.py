"""Intra prediction as constant linear operators (TPU-native formulation).

Every HEVC intra mode except the DC/edge fixups is, per output sample, a
weighted sum of at most four reference samples followed by one rounding shift:
    pred = (W_mode @ ref + half) >> shift
with integer weights <= 32.  This module builds the constant weight tensors
(35, n*n, 4n+1) so the whole 35-mode search becomes one batched matmul on the
MXU (SURVEY.md section 7 'RD mode decision on SIMD hardware').

Reference sample vector layout (matches ops.reference.build_reference):
    ref[0]        = p[-1][2n-1]     (bottom of left column)
    ref[2n-1-y]   = p[-1][y]
    ref[2n]       = p[-1][-1]       (corner)
    ref[2n+1+x]   = p[x][-1]        (top row)

Nonlinear leftovers applied as elementwise fixups in the JAX encoder:
  * DC mode (luma, n<32): corner/first-row/first-col smoothing
  * modes 10/26 (luma, n<32): clipped edge adjustment
Spec: 8.4.4.2.4-8.4.4.2.6.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

from hevc_tpu.ops.reference import INTRA_ANGLE, INV_ANGLE


def _ref_index_left(y: int, n: int) -> int:
    return 2 * n - 1 - y


def _ref_index_top(x: int, n: int) -> int:
    return 2 * n + 1 + x


def _r_index(i: int, n: int, vertical: bool, mode: int) -> int:
    """Extended 1D ref r[i] (i in [-n, 2n]) -> base ref array index.

    vertical=True: main array from the top row, projections from the left.
    """
    if i == 0:
        return 2 * n
    if i > 0:
        return _ref_index_top(i - 1, n) if vertical else _ref_index_left(i - 1, n)
    # negative index: projection through the inverse angle (modes 11..25 only);
    # clamp the (never-read) k=-1 overshoot for small blocks
    proj = min(((i * INV_ANGLE[mode] + 128) >> 8) - 1, 2 * n - 1)
    return _ref_index_left(proj, n) if vertical else _ref_index_top(proj, n)


@lru_cache(maxsize=None)
def intra_weights(n: int) -> tuple[np.ndarray, np.ndarray]:
    """Build (W, shifts): W (35, n*n, 4n+1) int32, shifts (35,) int32.

    pred_flat[m] = (W[m] @ ref + (1 << (shifts[m]-1))) >> shifts[m]
    DC fixups / 10-26 edge fixups NOT included (apply separately for luma n<32).
    """
    log2n = n.bit_length() - 1
    nref = 4 * n + 1
    W = np.zeros((35, n * n, nref), dtype=np.int32)
    shifts = np.zeros(35, dtype=np.int32)

    # mode 0: planar
    shifts[0] = log2n + 1
    for y in range(n):
        for x in range(n):
            row = W[0, y * n + x]
            row[_ref_index_left(y, n)] += n - 1 - x
            row[_ref_index_top(n, n)] += x + 1
            row[_ref_index_top(x, n)] += n - 1 - y
            row[_ref_index_left(n, n)] += y + 1

    # mode 1: DC (base value everywhere; boundary smoothing is a fixup)
    shifts[1] = log2n + 1
    dc_row = np.zeros(nref, dtype=np.int32)
    for x in range(n):
        dc_row[_ref_index_top(x, n)] += 1
        dc_row[_ref_index_left(x, n)] += 1
    W[1, :, :] = dc_row[None, :]

    # modes 2..34: angular
    for mode in range(2, 35):
        angle = INTRA_ANGLE[mode]
        shifts[mode] = 5
        vertical = mode >= 18
        for a in range(n):          # a: the "distance" axis (y for vertical)
            idx = ((a + 1) * angle) >> 5
            fact = ((a + 1) * angle) & 31
            for b in range(n):      # b: the position along the edge
                i1 = b + idx + 1
                i2 = min(b + idx + 2, 2 * n)
                src1 = _r_index(i1, n, vertical, mode)
                src2 = _r_index(i2, n, vertical, mode)
                if vertical:
                    row = W[mode, a * n + b]    # (y=a, x=b)
                else:
                    row = W[mode, b * n + a]    # transposed: (y=b, x=a)
                row[src1] += 32 - fact
                row[src2] += fact
    return W, shifts


@lru_cache(maxsize=None)
def filter_matrix(n: int) -> np.ndarray:
    """[1 2 1]/4 reference smoothing as a matrix is NOT a pure matmul (it has
    its own >>2); instead expose the (4n+1, 4n+1) tap matrix; caller applies
    (F @ ref + 2) >> 2."""
    m = 4 * n + 1
    F = np.zeros((m, m), dtype=np.int32)
    F[0, 0] = 4
    F[m - 1, m - 1] = 4
    for i in range(1, m - 1):
        F[i, i - 1] = 1
        F[i, i] = 2
        F[i, i + 1] = 1
    return F


@lru_cache(maxsize=None)
def use_filtered_mask(n: int) -> np.ndarray:
    """(35,) bool: which modes use the filtered reference (luma, 8.4.4.2.3)."""
    from hevc_tpu.ops.reference import use_filtered_ref
    return np.array([use_filtered_ref(m, n, 0) for m in range(35)], dtype=bool)
