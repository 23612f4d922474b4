"""Vectorized host-side traceback for the batched SWG kernel.

Decodes the direction matrices produced by ``swg_batch`` into per-pair
op lists, matching the oracle traceback (reference src/swg.rs:170-207):
walk from the max cell to (0,0), then soft-clip the query suffix.

Works on the whole batch at once with numpy gathers; the walk length is
bounded by max_i + max_j <= XMAX + YMAX.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..align.types import Alignment, Op, xclip
from .swg_batch import DIR_DEL, DIR_INS

_OP_OF_DIR = np.array(["M", "S", "D", "I"])


def traceback_batch(
    dirs: np.ndarray,  # (B, Y+1, W) uint8
    band: np.ndarray,  # (B,) int
    max_i: np.ndarray,
    max_j: np.ndarray,
    xlen: np.ndarray,
    ylen: np.ndarray,
    score: np.ndarray,
) -> List[Alignment]:
    B = dirs.shape[0]
    i = max_i.astype(np.int64).copy()
    j = max_j.astype(np.int64).copy()
    band = band.astype(np.int64)
    # Real walks need at most max_i + max_j steps; the cap only guards
    # degenerate clamped walks (see swg_ref._traceback).
    cap = int((max_i + max_j).max(initial=0)) + 4

    # Record the walked dirs backwards into a (B, S) buffer.
    steps = np.zeros(B, dtype=np.int64)
    buf = np.zeros((B, cap), dtype=np.uint8)
    rows = np.arange(B)

    active = (i > 0) | (j > 0)
    remaining = cap
    while active.any() and remaining > 0:
        remaining -= 1
        # clamp to the band (see swg_ref._traceback for why)
        bi = np.clip(i - np.maximum(j - band, 0), 0, 2 * band)
        op = dirs[rows, j, bi]
        buf[rows[active], steps[active]] = op[active]
        steps[active] += 1
        is_diag = (op <= 1) & active
        is_ins = (op == DIR_INS) & active
        is_del = (op == DIR_DEL) & active
        i -= is_diag | is_ins
        j -= is_diag | is_del
        active = (i > 0) | (j > 0)

    out: List[Alignment] = []
    for k in range(B):
        n = int(steps[k])
        ops: List[Op] = []
        if int(max_i[k]) < int(xlen[k]):
            ops.append(xclip(int(xlen[k]) - int(max_i[k])))
        # buf holds the path backwards; reverse (matching the oracle's
        # push-then-reverse, which puts the Xclip last)
        ops_walk = _OP_OF_DIR[buf[k, :n]][::-1].tolist()
        out.append(
            Alignment(
                score=int(score[k]),
                ystart=0,
                xstart=0,
                yend=int(max_j[k]),
                xend=int(max_i[k]),
                ylen=int(ylen[k]),
                xlen=int(xlen[k]),
                operations=ops_walk + ops,
            )
        )
    return out
