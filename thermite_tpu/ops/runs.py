"""Decode on-device traceback RLE runs into Alignment op lists."""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..align.types import Alignment, Op, xclip
from .swg_pallas import RUN_OP_SHIFT

_OP_CHARS = ("M", "S", "D", "I")
_LEN_MASK = (1 << RUN_OP_SHIFT) - 1


def decode_runs_one(
    runs_row: np.ndarray,
    nruns: int,
    score: int,
    max_i: int,
    max_j: int,
    xlen: int,
    ylen: int,
) -> Optional[Alignment]:
    """One pair's runs -> Alignment; None if the device flagged overflow
    (nruns < 0) and the host must recompute via the oracle."""
    if nruns < 0:
        return None
    ops: List[Op] = []
    # runs were emitted in backward walk order
    for k in range(nruns - 1, -1, -1):
        r = int(runs_row[k])
        op = _OP_CHARS[r >> RUN_OP_SHIFT]
        ops.extend([op] * (r & _LEN_MASK))
    if max_i < xlen:
        ops.append(xclip(xlen - max_i))
    return Alignment(
        score=score,
        ystart=0,
        xstart=0,
        yend=max_j,
        xend=max_i,
        ylen=ylen,
        xlen=xlen,
        operations=ops,
    )
