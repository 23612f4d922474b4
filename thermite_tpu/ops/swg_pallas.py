"""Pallas TPU kernels for batched banded SWG extension.

Two kernels sharing one DP core (semantics identical to
``swg_ref``/``swg_batch``, i.e. reference src/swg.rs):

* **forward-scores**: whole batch, returns only (score, max_i, max_j)
  per pair — 12 bytes/task off-device.  Used for the scoring pass that
  feeds host-side arbitration.
* **forward+traceback**: recomputes winners *and walks the traceback
  on-device*, emitting run-length-encoded op runs (~128 B/pair) —
  avoiding the 20 KB/pair direction-matrix transfer entirely.

Both kernels run the full column loop inside a single ``pallas_call``
(one device launch per batch): on this deployment the host↔device link
has ~50 ms round-trip latency, so any per-column dispatch is fatal;
see BENCH notes in bench.py.

Key vectorisation choices (per block of BBLK pairs):
* DP state D/C/R is (BBLK, W) int32 living in vector registers across
  a ``fori_loop`` over y columns.
* Band slide, x-window advance and the y-column read are implemented
  with lane rolls (``pltpu.roll``) — no gathers in the inner loop.
* The within-column insertion chain is an exclusive lane prefix-max
  (log2(W) roll+max steps).
* Per-pair band width / X-drop supported by masking, so one compiled
  kernel serves mixed workloads.

The traceback walk is scalar per pair (bounded by XMAX+YMAX steps)
over a VMEM direction buffer laid out (Y+1, BBLK, W) so the column
write is a major-dim dynamic store.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import GAP_EXTEND, GAP_OPEN, MATCH_SCORE, MIN_SCORE, MISMATCH_SCORE

DIR_MATCH = 0
DIR_SUBST = 1
DIR_DEL = 2
DIR_INS = 3

_PAD = -(1 << 31) + (1 << 21)

# run encoding: (op << 28) | length
RUN_OP_SHIFT = 28


def _dp_column_step(
    j, D, C, R, xs, yb, max_s, max_i, max_j, stop1, stop2,
    xlen, ylen, band, x_drop, t, W,
):
    """One DP column update on (BBLK, W) state; returns new state and the
    direction row.  j is a traced scalar column index (1-based)."""
    e = jnp.int32(GAP_EXTEND)
    o = jnp.int32(GAP_OPEN)
    MIN = jnp.int32(MIN_SCORE)
    b2 = 2 * band  # (BBLK,1)

    in_p1 = j <= band  # (BBLK,1)
    sh = ~in_p1
    # stop1/stop2 are int32 0/1 (Mosaic cannot carry i1 vectors in loops)
    active = (j <= ylen) & (stop1 == 0) & (in_p1 | (stop2 == 0))  # (BBLK,1)

    row0 = jnp.maximum(j - band, 0)  # (BBLK,1)
    i_row = row0 + t  # (BBLK, W)
    computed = (t <= b2) & (i_row <= xlen)

    # shifted previous-column reads: lane roll by -1, MIN in the last lane
    last = t == W - 1
    D_l = jnp.where(last, MIN, pltpu.roll(D, W - 1, 1))
    C_l = jnp.where(last, MIN, pltpu.roll(C, W - 1, 1))
    D_r = jnp.where(t == 0, MIN, pltpu.roll(D, 1, 1))
    Dp = jnp.where(sh, D_l, D)
    Cp = jnp.where(sh, C_l, C)
    Dm = jnp.where(sh, D, D_r)

    # x window advance (xs[t] = x[row0 + t - 1]); pulls in xs[W..] lanes
    xs_l = pltpu.roll(xs, xs.shape[1] - 1, 1)  # left-by-1 (circular)
    xs = jnp.where(sh, xs_l, xs)
    win = xs[:, :W] if xs.shape[1] != W else xs

    # y column read + advance
    yj = yb[:, :1]  # (BBLK, 1)
    yb = pltpu.roll(yb, yb.shape[1] - 1, 1)  # left-by-1 (circular)

    c_val = jnp.maximum(Cp + e, Dp + e + o)
    c_val = jnp.where(sh & (t == b2), MIN, c_val)

    is_match = (i_row > 0) & (win == yj)
    s = jnp.where(is_match, MATCH_SCORE, MISMATCH_SCORE).astype(jnp.int32)
    d_val = jnp.where(i_row == 0, MIN, Dm + s)

    A = jnp.maximum(d_val, c_val)
    A_m = jnp.where(computed, A, MIN)

    # exclusive prefix max of (A - t*e) over lanes
    base = A_m - t * e
    pm = jnp.where(t == 0, _PAD, pltpu.roll(base, 1, 1))
    k = 1
    while k < W:
        shifted = jnp.where(t < k, _PAD, pltpu.roll(pm, k, 1))
        pm = jnp.maximum(pm, shifted)
        k *= 2
    r_val = jnp.where(t == 0, MIN, o + t * e + pm)

    D_new = jnp.maximum(A, r_val)
    # int32 dirs: Mosaic scalar extracts are 32-bit only
    dir_new = jnp.where(
        D_new == d_val,
        jnp.where(is_match, DIR_MATCH, DIR_SUBST),
        jnp.where(D_new == c_val, DIR_DEL, DIR_INS),
    )

    mask = computed & active
    D = jnp.where(mask, D_new, D)
    C = jnp.where(mask, c_val, C)
    R = jnp.where(mask, r_val, R)
    dir_row = jnp.where(mask, dir_new, DIR_MATCH)

    D_for_max = jnp.where(mask, D_new, MIN)
    band_max = jnp.max(D_for_max, axis=1, keepdims=True)  # (BBLK,1)
    tt = jnp.where(D_for_max == band_max, t, W)
    col_arg = jnp.min(tt, axis=1, keepdims=True)  # first max slot
    improved = active & (band_max > max_s)
    max_s = jnp.where(improved, band_max, max_s)
    max_i = jnp.where(improved, row0 + col_arg, max_i)
    max_j = jnp.where(improved, jnp.broadcast_to(j, max_j.shape), max_j)

    dropped = band_max < max_s - x_drop
    stop1 = jnp.maximum(stop1, (in_p1 & active & dropped).astype(jnp.int32))
    stop2 = jnp.maximum(stop2, ((~in_p1) & active & dropped).astype(jnp.int32))

    return D, C, R, xs, yb, max_s, max_i, max_j, stop1, stop2, dir_row


def _init_state(xs0, params, t, W, BBLK):
    """Initial column-0 state. params columns: xlen, ylen, band, x_drop.

    ``xs0`` is the host-pre-shifted x window: row = [0, x[0..XW-2]]
    (Mosaic has no dynamic_update_slice, so the 1-lane shift is done
    when packing the batch — see ``xwidth``/host packers)."""
    e = jnp.int32(GAP_EXTEND)
    o = jnp.int32(GAP_OPEN)
    MIN = jnp.int32(MIN_SCORE)
    band = params[:, 2:3]
    b2 = 2 * band
    ladder = t * e + o
    D0 = jnp.where(t == 0, 0, jnp.where(t <= b2, ladder, MIN))
    C0 = jnp.broadcast_to(jnp.where(t == 0, 0, MIN), (BBLK, W))
    R0 = D0
    return D0, C0, R0, xs0


def xwidth(XMAX: int, W: int) -> int:
    """Width of the host-packed, 1-shifted x array."""
    return max(W, XMAX + 1)


def make_forward_kernel(BBLK: int, XMAX: int, YMAX: int, W: int, interpret: bool = False):
    """Forward-scores kernel: dense x/y inputs, (score, max_i, max_j) out.

    Inputs (per call):
      x (N, XMAX) uint8, y (N, YMAX) uint8,
      params (N, 4) int32 [xlen, ylen, band, x_drop].
    Output: (N, 4) int32 [score, max_i, max_j, 0].
    """

    XW = xwidth(XMAX, W)

    def kernel(x_ref, y_ref, p_ref, out_ref):
        t = jax.lax.broadcasted_iota(jnp.int32, (BBLK, W), 1)
        xs0 = x_ref[:, :].astype(jnp.int32)
        params = p_ref[:, :]
        xlen = params[:, 0:1]
        ylen = params[:, 1:2]
        band = params[:, 2:3]
        x_drop = params[:, 3:4]
        D, C, R, xs = _init_state(xs0, params, t, W, BBLK)
        yb = y_ref[:, :].astype(jnp.int32)
        z = jnp.zeros((BBLK, 1), jnp.int32)

        def body(j, carry):
            D, C, R, xs, yb, ms, mi, mj, s1, s2 = carry
            D, C, R, xs, yb, ms, mi, mj, s1, s2, _ = _dp_column_step(
                j, D, C, R, xs, yb, ms, mi, mj, s1, s2,
                xlen, ylen, band, x_drop, t, W,
            )
            return (D, C, R, xs, yb, ms, mi, mj, s1, s2)

        carry = jax.lax.fori_loop(
            1, YMAX + 1, body, (D, C, R, xs, yb, z, z, z, z, z)
        )
        ms, mi, mj = carry[5], carry[6], carry[7]
        out_ref[:, :] = jnp.concatenate([ms, mi, mj, jnp.zeros_like(ms)], axis=1)

    def call(x, y, params):
        N = x.shape[0]
        assert N % BBLK == 0
        grid = (N // BBLK,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BBLK, XW), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BBLK, YMAX), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BBLK, 4), lambda g: (g, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (BBLK, 4), lambda g: (g, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((N, 4), jnp.int32),
            interpret=interpret,
        )(x, y, params)

    return jax.jit(call)


def make_traceback_kernel(
    BBLK: int, XMAX: int, YMAX: int, W: int, RMAX: int = 64, interpret: bool = False
):
    """Forward + on-device traceback kernel.

    Same inputs as the forward kernel.  Outputs per pair:
      meta (N, 4) int32 [score, max_i, max_j, nruns]  (nruns < 0 on
      run-buffer overflow: host must recompute that pair), and
      runs (N, RMAX) int32, each (op << 28) | run_length, emitted in
      *backward* walk order (host reverses; the query-suffix soft clip
      is appended host-side from xlen - max_i).
    """

    XW = xwidth(XMAX, W)

    def kernel(x_ref, y_ref, p_ref, ps_ref, meta_ref, runs_ref, nruns_ref, dirs_ref):
        t = jax.lax.broadcasted_iota(jnp.int32, (BBLK, W), 1)
        xs0 = x_ref[:, :].astype(jnp.int32)
        params = p_ref[:, :]
        xlen = params[:, 0:1]
        ylen = params[:, 1:2]
        band = params[:, 2:3]
        x_drop = params[:, 3:4]
        D, C, R, xs = _init_state(xs0, params, t, W, BBLK)
        yb = y_ref[:, :].astype(jnp.int32)
        z = jnp.zeros((BBLK, 1), jnp.int32)

        # column 0 dirs: Ins on slots <= 2b, Match beyond
        dirs_ref[0, :, :] = jnp.where(t <= 2 * band, DIR_INS, DIR_MATCH)

        def body(j, carry):
            D, C, R, xs, yb, ms, mi, mj, s1, s2 = carry
            D, C, R, xs, yb, ms, mi, mj, s1, s2, dir_row = _dp_column_step(
                j, D, C, R, xs, yb, ms, mi, mj, s1, s2,
                xlen, ylen, band, x_drop, t, W,
            )
            dirs_ref[pl.ds(j, 1), :, :] = dir_row[None]
            return (D, C, R, xs, yb, ms, mi, mj, s1, s2)

        carry = jax.lax.fori_loop(
            1, YMAX + 1, body, (D, C, R, xs, yb, z, z, z, z, z)
        )
        ms, mi, mj = carry[5], carry[6], carry[7]
        # Stage results through the output ref so the scalar walk can
        # read them (dynamic scalar indexing needs a memory ref).
        meta_ref[:, :] = jnp.concatenate([ms, mi, mj, jnp.zeros_like(ms)], axis=1)

        # ---- scalar traceback per pair (runs/nruns live in SMEM:
        # Mosaic only allows scalar stores to SMEM; scalar loads from
        # VMEM must be lane-aligned, so lane extraction goes through a
        # masked vector reduction instead) ----
        STEPS = XMAX + YMAX + 2
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        prow = jax.lax.broadcasted_iota(jnp.int32, (BBLK, 1), 0)

        def walk_pair(p, _):
            b = ps_ref[p, 2]
            psel = prow == p
            i0 = jnp.sum(jnp.where(psel, mi, 0))
            j0 = jnp.sum(jnp.where(psel, mj, 0))

            def step(s, st):
                i, j, cur_op, cur_len, nr = st
                alive = (i > 0) | (j > 0)
                bi = jnp.clip(i - jnp.maximum(j - b, 0), 0, 2 * b)
                row = dirs_ref[j, p].reshape(1, W)
                d = jnp.sum(jnp.where(lane == bi, row, 0))
                boundary = alive & (d != cur_op) & (cur_len > 0)

                @pl.when(boundary & (nr < RMAX))
                def _():
                    runs_ref[p, nr] = (cur_op << RUN_OP_SHIFT) | cur_len

                nr = jnp.where(boundary, nr + 1, nr)
                cur_len = jnp.where(boundary, 0, cur_len)
                cur_op = jnp.where(alive, d, cur_op)
                cur_len = jnp.where(alive, cur_len + 1, cur_len)
                di = jnp.where(alive & ((d <= 1) | (d == DIR_INS)), 1, 0)
                dj = jnp.where(alive & ((d <= 1) | (d == DIR_DEL)), 1, 0)
                return (i - di, j - dj, cur_op, cur_len, nr)

            i, j, cur_op, cur_len, nr = jax.lax.fori_loop(
                0, STEPS, step, (i0, j0, jnp.int32(-1), jnp.int32(0), jnp.int32(0))
            )

            @pl.when((cur_len > 0) & (nr < RMAX))
            def _():
                runs_ref[p, nr] = (cur_op << RUN_OP_SHIFT) | cur_len

            nr = jnp.where(cur_len > 0, nr + 1, nr)
            # overflow (or unterminated walk) -> negative nruns
            bad = (nr > RMAX) | (i > 0) | (j > 0)
            nruns_ref[p, 0] = jnp.where(bad, -1, nr)
            return 0

        jax.lax.fori_loop(0, BBLK, walk_pair, 0)

    def call(x, y, params):
        N = x.shape[0]
        assert N % BBLK == 0
        grid = (N // BBLK,)
        meta, runs, nruns = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BBLK, XW), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BBLK, YMAX), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BBLK, 4), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BBLK, 4), lambda g: (g, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((BBLK, 4), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BBLK, RMAX), lambda g: (g, 0), memory_space=pltpu.SMEM),
                pl.BlockSpec((BBLK, 1), lambda g: (g, 0), memory_space=pltpu.SMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, 4), jnp.int32),
                jax.ShapeDtypeStruct((N, RMAX), jnp.int32),
                jax.ShapeDtypeStruct((N, 1), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((YMAX + 1, BBLK, W), jnp.int32),
            ],
            interpret=interpret,
        )(x, y, params, params)
        # merge nruns into meta column 3 for the host API
        meta = meta.at[:, 3].set(nruns[:, 0])
        return meta, runs

    return jax.jit(call)


_FWD_CACHE = {}
_TB_CACHE = {}


def get_forward_kernel(BBLK, XMAX, YMAX, W, interpret=False):
    key = (BBLK, XMAX, YMAX, W, interpret)
    if key not in _FWD_CACHE:
        _FWD_CACHE[key] = make_forward_kernel(BBLK, XMAX, YMAX, W, interpret)
    return _FWD_CACHE[key]


def get_traceback_kernel(BBLK, XMAX, YMAX, W, RMAX=64, interpret=False):
    key = (BBLK, XMAX, YMAX, W, RMAX, interpret)
    if key not in _TB_CACHE:
        _TB_CACHE[key] = make_traceback_kernel(BBLK, XMAX, YMAX, W, RMAX, interpret)
    return _TB_CACHE[key]
