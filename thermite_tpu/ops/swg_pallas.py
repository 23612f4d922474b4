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


import jax
import jax.numpy as jnp
import numpy as np
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
    xlen, ylen, band, x_drop, t, W, want_dirs=True,
):
    """One DP column update on (BBLK, W) state; returns new state and the
    direction row.  j is a traced scalar column index (1-based).

    Loop-invariant lane masks / ladders (t*e, t<=2b, lane-0/last masks)
    are hoisted to module-level helpers of t so Mosaic computes them
    once; ``want_dirs=False`` (forward-scores kernel) skips the
    direction select chain entirely.  ``R`` is retained in the carry
    only for signature stability — it is never read across columns (the
    within-column insertion chain is the lane prefix-max)."""
    e = jnp.int32(GAP_EXTEND)
    o = jnp.int32(GAP_OPEN)
    MIN = jnp.int32(MIN_SCORE)

    # loop-invariant per-pair / per-lane masks (computed from carried
    # constants; XLA/Mosaic hoists them out of the fori_loop)
    tb2 = t <= 2 * band  # (BBLK, W), invariant
    tz = t == 0
    tlast = t == W - 1
    te = t * e  # invariant ladder

    in_p1 = j <= band  # (BBLK,1)
    sh = ~in_p1
    # stop1/stop2 are int32 0/1 (Mosaic cannot carry i1 vectors in loops)
    active = (j <= ylen) & (stop1 == 0) & (in_p1 | (stop2 == 0))  # (BBLK,1)

    row0 = jnp.maximum(j - band, 0)  # (BBLK,1)
    computed = tb2 & (t <= xlen - row0)

    # shifted previous-column reads: lane roll by -1, MIN in the last lane
    D_l = jnp.where(tlast, MIN, pltpu.roll(D, W - 1, 1))
    C_l = jnp.where(tlast, MIN, pltpu.roll(C, W - 1, 1))
    D_r = jnp.where(tz, MIN, pltpu.roll(D, 1, 1))
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
    c_val = jnp.where(sh & (t == 2 * band), MIN, c_val)

    # row 0 exists only in phase 1 at lane 0: i_row == 0 <=> tz & in_p1
    row_is0 = tz & in_p1
    is_match = (win == yj) & ~row_is0
    s = jnp.where(is_match, MATCH_SCORE, MISMATCH_SCORE).astype(jnp.int32)
    d_val = jnp.where(row_is0, MIN, Dm + s)

    A = jnp.maximum(d_val, c_val)
    A_m = jnp.where(computed, A, MIN)

    # exclusive prefix max of (A - t*e) over lanes
    base = A_m - te
    pm = jnp.where(tz, _PAD, pltpu.roll(base, 1, 1))
    k = 1
    while k < W:
        shifted = jnp.where(t < k, _PAD, pltpu.roll(pm, k, 1))
        pm = jnp.maximum(pm, shifted)
        k *= 2
    r_val = jnp.where(tz, MIN, o + te + pm)

    D_new = jnp.maximum(A, r_val)

    mask = computed & active
    D = jnp.where(mask, D_new, D)
    C = jnp.where(mask, c_val, C)

    if want_dirs:
        # int32 dirs: Mosaic scalar extracts are 32-bit only
        dir_new = jnp.where(
            D_new == d_val,
            jnp.where(is_match, DIR_MATCH, DIR_SUBST),
            jnp.where(D_new == c_val, DIR_DEL, DIR_INS),
        )
        dir_row = jnp.where(mask, dir_new, DIR_MATCH)
    else:
        dir_row = None

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

    return (
        D, C, R, xs, yb, max_s, max_i, max_j, stop1, stop2, dir_row,
        band_max, active, dropped,
    )


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
            D, C, R, xs, yb, ms, mi, mj, s1, s2, _, _, _, _ = _dp_column_step(
                j, D, C, R, xs, yb, ms, mi, mj, s1, s2,
                xlen, ylen, band, x_drop, t, W, want_dirs=False,
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
            D, C, R, xs, yb, ms, mi, mj, s1, s2, dir_row, _, _, _ = (
                _dp_column_step(
                    j, D, C, R, xs, yb, ms, mi, mj, s1, s2,
                    xlen, ylen, band, x_drop, t, W,
                )
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


def walk_packed_on() -> bool:
    """THERMITE_WALK_PACKED=1: the stream kernels accumulate walk codes
    directly into packed 16-codes/int32 words instead of one lane per
    step.  The per-step read-modify-write of the ops buffer is the walk
    loop's dominant vector op; packing shrinks it (SMAX -> SMAX/16
    lanes) and deletes the post-kernel XLA packing pass and its
    (N, SMAX) HBM intermediate.  Output bits are identical (the
    same little-endian 2-bit layout).  Default OFF until measured on
    the real device — flip the env to A/B."""
    import os

    return os.environ.get("THERMITE_WALK_PACKED", "0") not in ("", "0")


def _pow4(cm):
    """4**cm for cm in [0, 15], built from cm's bits with
    compare/select/multiply only (Mosaic variable-amount vector shifts
    are unproven on this toolchain; int32 wraparound at cm >= 14
    matches the ``<<`` packing this replaces bit for bit)."""
    p = jnp.where((cm & 1) > 0, jnp.int32(4), jnp.int32(1))
    p = p * jnp.where((cm & 2) > 0, jnp.int32(16), jnp.int32(1))
    p = p * jnp.where((cm & 4) > 0, jnp.int32(256), jnp.int32(1))
    return p * jnp.where((cm & 8) > 0, jnp.int32(65536), jnp.int32(1))


def smax_for(XMAX: int, YMAX: int) -> int:
    """Step capacity of the stream-traceback walk (padded to lanes)."""
    s = XMAX + YMAX + 2
    return ((s + 127) // 128) * 128


def make_stream_traceback_kernel(
    BBLK: int, XMAX: int, YMAX: int, W: int, interpret: bool = False,
    SMAX: int = 0, walk_packed=None, fuse: bool = True,
):
    """Forward + *vectorized* on-device traceback.

    The per-pair scalar walk of ``make_traceback_kernel`` costs
    BBLK×(XMAX+YMAX) sequential scalar iterations per block (~850 ms
    for 16k pairs at chrM bench shapes).  This kernel walks ALL pairs
    of a block simultaneously, synchronized by y-column: an outer
    ``while_loop`` holds a global column cursor ``jj`` that only
    decreases when no pair is mid-step in that column (Match/Subst/Del
    steps move a pair to column jj-1 where it waits; Ins steps keep it
    in jj for the next iteration).  Each iteration is a handful of
    (BBLK, W)/(BBLK, SMAX) vector ops, so the walk costs
    ~YMAX + max-ins-chain iterations instead of BBLK×STEPS.

    Per-pair op streams are emitted via one-hot accumulation into a
    (BBLK, SMAX) buffer (lane = per-pair step counter — an emulated
    row-wise scatter; each lane is written at most once), then packed
    16 codes/int32 in plain XLA after the pallas_call.

    Outputs: (N, 4 + SMAX/16) int32 rows:
      [score, max_i, max_j, nsteps, packed_codes...] — nsteps = -1
      flags an unterminated walk (host recomputes; not observed in
      practice).  Codes are DIR_* values in *backward* walk order,
      2 bits each, little-endian within each word.

    **Band-exactness certificate** (nsteps = -2 on failure): the kernel
    also proves, per pair, that running the SAME problem at ANY wider
    band (larger ``band``, ylen re-clamped accordingly, same x_drop)
    would produce a bit-identical output row.  This powers the adaptive
    narrow-band pass: the host submits problems at a narrow band and
    recomputes only certificate failures at full band (C++ oracle).

    Soundness sketch (constants M/o/e = MATCH/GAP_OPEN/GAP_EXTEND):
    any path that touches a cell outside the narrow band must contain
    at least band+1 gap extensions and one open, so its score prefix at
    column j is bounded by E(j) = min(j, xlen)*M + o + (band+1)*e.
    The certificate requires
      (a) every pre-stop column's band max exceeds E(j) - x_drop
          (tracked as ``cmin``): the wide DP can then never X-drop-stop
          earlier than the narrow one (in-band values only grow with
          band; excursion-inflated running maxima are offset by (a)),
      (b) final max_s strictly exceeds E(j_stop) + x_drop if the narrow
          pass stopped (the wide pass then stops at the same column,
          and no excursion value can beat or tie max_s), or strictly
          exceeds E(ylen) if it ran to completion,
    so the wide optimum, its first-attainment cell (max_i, max_j), and
    every traceback direction along the walk (any tie with an
    excursion-derived value would imply an out-of-band path scoring
    >= max_s, contradicting (b)) coincide with the narrow pass's.
    """
    XW = xwidth(XMAX, W)
    # SMAX bounds the per-pair step count; callers may pass a tighter
    # batch bound (max xlen + max ylen + 2, lane-rounded) to shrink the
    # ops buffer and the packed d2h payload
    SMAX = SMAX or smax_for(XMAX, YMAX)
    MAXIT = YMAX + 1 + XMAX + 2
    if walk_packed is None:
        walk_packed = walk_packed_on()
    PW = SMAX // 16
    OPS_W = PW if walk_packed else SMAX

    def kernel(x_ref, y_ref, p_ref, meta_ref, ops_ref, dirs_ref):
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

        dirs_ref[0, :, :] = jnp.where(t <= 2 * band, DIR_INS, DIR_MATCH)

        # band-exactness certificate state (see docstring): E(j) bounds
        # any path touching a cell outside this band.
        e_ladder = jnp.int32(GAP_OPEN) + (band + 1) * jnp.int32(GAP_EXTEND)
        ub_final = xlen * jnp.int32(MATCH_SCORE) + e_ladder
        big = jnp.full((BBLK, 1), 1 << 30, jnp.int32)

        def body(j, carry):
            D, C, R, xs, yb, ms, mi, mj, s1, s2, cmin, ecap, rstop = carry
            (D, C, R, xs, yb, ms, mi, mj, s1, s2, dir_row, bmax, active,
             dropped) = _dp_column_step(
                j, D, C, R, xs, yb, ms, mi, mj, s1, s2,
                xlen, ylen, band, x_drop, t, W,
            )
            dirs_ref[pl.ds(j, 1), :, :] = dir_row[None]
            ej = jnp.minimum(j, xlen) * jnp.int32(MATCH_SCORE) + e_ladder
            cmin = jnp.where(active & ~dropped, jnp.minimum(cmin, bmax - ej), cmin)
            # distinguish a REAL x-drop stop (computed cells fell x_drop
            # below the running max) from band exhaustion (the trailing
            # column past row xlen has no in-band cells, so band_max
            # stays MIN and the stop flag fires as a loop exit): only a
            # real drop forces the stronger stopped-case certificate —
            # an exhausted band is completion, and the wide pass's extra
            # cells there are all excursion-bounded below ub_final.
            real_drop = active & dropped & (bmax > jnp.int32(MIN_SCORE))
            ecap = jnp.where(real_drop, ej, ecap)
            rstop = jnp.maximum(rstop, real_drop.astype(jnp.int32))
            return (D, C, R, xs, yb, ms, mi, mj, s1, s2, cmin, ecap, rstop)

        # traced column bound: every column past the block's max ylen is
        # a fully-masked no-op (active == False everywhere), so skipping
        # them is bit-exact; the walk only reads dirs rows <= max alive
        # mj <= maxy.  fori_loop with a traced bound lowers to a
        # scalar-condition while (no vector reduce per column).
        maxy = jnp.max(jnp.minimum(ylen, YMAX))
        carry = jax.lax.fori_loop(
            1, maxy + 1, body,
            (D, C, R, xs, yb, z, z, z, z, z, big,
             jnp.broadcast_to(ub_final, (BBLK, 1)), z),
        )
        ms, mi, mj, cmin, ecap, rstop = (
            carry[5], carry[6], carry[7], carry[10], carry[11], carry[12],
        )
        cert_ub = jnp.where(rstop > 0, ecap + x_drop, ub_final)
        cert = (cmin > -x_drop) & (ms > cert_ub)

        # ---- vectorized walk ----
        ops_ref[:, :] = jnp.zeros((BBLK, OPS_W), jnp.int32)
        slane = jax.lax.broadcasted_iota(jnp.int32, (BBLK, OPS_W), 1)
        jj0 = jnp.max(jnp.where((mi > 0) | (mj > 0), mj, -1))

        def cond(st):
            jj, i, j, c, it = st
            # jj is kept == max column over alive lanes (or -1 when all
            # lanes finished), so the loop condition is scalar-only: no
            # per-iteration vector reduce on the critical path.
            return (jj >= 0) & (it < MAXIT)

        def substep(st):
            jj, i, j, c, it = st
            # jj may underrun -1 on unrolled sub-steps after the last
            # live column; the clamped read is dead then (stepping is
            # all-false below because no lane has j == jj < 0).
            row = dirs_ref[jnp.maximum(jj, 0), :, :]
            row0 = jnp.maximum(jj - band, 0)
            bi = jnp.clip(i - row0, 0, 2 * band)
            d = jnp.sum(jnp.where(t == bi, row, 0), axis=1, keepdims=True)
            alive = (i > 0) | (j > 0)
            stepping = alive & (j == jj)
            if walk_packed:
                # write step c's 2-bit code straight into packed word
                # c//16 at bit 2*(c%16) — each (step, bit) lands once,
                # so addition == OR
                ops_ref[:, :] = ops_ref[:, :] + jnp.where(
                    stepping & (slane == (c >> 4)), d * _pow4(c & 15), 0
                )
            else:
                ops_ref[:, :] = ops_ref[:, :] + jnp.where(
                    stepping & (slane == c), d, 0
                )
            consumes_x = (d <= DIR_SUBST) | (d == DIR_INS)
            consumes_y = (d <= DIR_SUBST) | (d == DIR_DEL)
            i = jnp.where(stepping & consumes_x, i - 1, i)
            j = jnp.where(stepping & consumes_y, j - 1, j)
            c = jnp.where(stepping, c + 1, c)
            # advance the cursor straight to the highest column any
            # still-alive lane occupies (== jj while an ins-chain or a
            # slower lane is mid-column; skips empty columns in one
            # hop; -1 once every lane finished).  Exactly the columns
            # the old jj-1 ladder visited with work pending — same
            # writes in the same order.
            alive = (i > 0) | (j > 0)
            jmax = jnp.max(jnp.where(alive, j, -1))
            jj = jnp.minimum(jj, jmax)
            return (jj, i, j, c, it + 1)

        def step(st):
            # 2x unrolled: the walk is bound by per-iteration scalar
            # latency (loop control + the jmax reduce), not vector
            # throughput; sub-steps past loop exit are no-ops.
            return substep(substep(st))

        jj, i, j, c, it = jax.lax.while_loop(
            cond, step, (jj0, mi, mj, z, jnp.int32(0))
        )
        bad = (i > 0) | (j > 0) | (c > SMAX)
        # cert failure encodes RECOVERABLY as -2 - nsteps (the walk
        # itself is valid at this band; only the any-wider-band
        # guarantee failed): callers that did not narrow recover the
        # walk via decode_stream_batch, the narrowing pipeline patches
        # every negative row with the full-band C++ oracle.  A bad
        # walk stays -1 in all cases.
        nsteps = jnp.where(bad, -1, jnp.where(cert, c, -2 - c))
        meta_ref[:, :] = jnp.concatenate([ms, mi, mj, nsteps], axis=1)

    def call(x, y, params):
        N = x.shape[0]
        assert N % BBLK == 0
        grid = (N // BBLK,)
        meta, ops = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((BBLK, XW), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BBLK, YMAX), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BBLK, 4), lambda g: (g, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((BBLK, 4), lambda g: (g, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((BBLK, OPS_W), lambda g: (g, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, 4), jnp.int32),
                jax.ShapeDtypeStruct((N, OPS_W), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((YMAX + 1, BBLK, W), jnp.int32),
            ],
            interpret=interpret,
        )(x, y, params)
        if walk_packed:
            # codes already packed in-kernel
            packed = ops
        else:
            # pack 16 2-bit codes per int32 word (XLA; stays on device)
            codes = ops.reshape(N, PW, 16)
            shifts = (2 * jnp.arange(16, dtype=jnp.int32))[None, None, :]
            packed = jnp.sum(codes << shifts, axis=2, dtype=jnp.int32)
        if not fuse:
            return meta, packed
        return jnp.concatenate([meta, packed], axis=1)

    return jax.jit(call)


def pack_stream_hdr(meta4):
    """Device epilogue: (N, 4) int32 [score, max_i, max_j, nsteps] ->
    (N, 2) int32 with int16 halves [score|max_i, max_j|nsteps] — every
    field fits int16 for reads under the _WPAD guard, so the always-
    transferred per-problem header halves.  Host: expand_stream_hdr."""
    ms, mi, mj, ns = (meta4[:, k : k + 1] for k in range(4))
    w0 = (ms & 0xFFFF) | (mi << 16)
    w1 = (mj & 0xFFFF) | (ns << 16)
    return jnp.concatenate([w0, w1], axis=1)


def expand_stream_hdr(sub2: "np.ndarray") -> "np.ndarray":
    """(n, 2) int32 packed headers -> (n, 4) int32 (sign-extended)."""
    return (
        np.ascontiguousarray(sub2).view(np.int16).astype(np.int32)
    ).reshape(len(sub2), 4)


def make_stream_traceback_gather_call(
    BBLK: int, XMAX: int, YMAX: int, W: int, interpret: bool = False,
    SMAX: int = 0, split: bool = False,
):
    """UNJITTED fn (ref_words, ref_lw, reads, meta) — the production
    single-pass gather+forward+traceback step.  Default (fused) form
    returns (N, 4 + SMAX/16) int32 rows; ``split=True`` returns
    ``(hdr (N, 2), streams (N, SMAX/16))`` so the pipeline can transfer
    the headers for every problem but gather/transfer op streams for
    WINNERS only (the d2h payload is the tunnel bottleneck here).
    Callers jit it directly (single device) or wrap it in shard_map
    (``parallel.mesh.sharded_stream_kernel``: meta sharded along
    ``data``, text/reads replicated)."""
    XW = xwidth(XMAX, W)
    # same precondition as the other gather front-ends: windows wider
    # than the text zero-padding would let reversed gathers index
    # before the padded region (reads >~380 bp once band is added)
    assert XMAX <= _WPAD and YMAX <= _WPAD, (
        f"window ({XMAX}, {YMAX}) exceeds the text padding {_WPAD}; "
        "long-read support needs a wider _WPAD"
    )
    inner = make_stream_traceback_kernel(
        BBLK, XMAX, YMAX, W, interpret, SMAX, fuse=not split
    )

    def call(ref_words, ref_lw, reads, meta):
        meta = _meta9(meta)
        x, y = _gather_windows_packed(
            ref_words, ref_lw, reads, meta, XMAX, XW, YMAX, shifted_x=True
        )
        out = inner(x, y, _params_from_meta(meta))
        if split:
            meta4, streams = out
            return pack_stream_hdr(meta4), streams
        return out

    return call


def make_stream_traceback_gather_kernel(
    BBLK: int, XMAX: int, YMAX: int, W: int, interpret: bool = False,
    SMAX: int = 0, split: bool = False,
):
    """jit fn (ref_words, ref_lw, reads, meta) -> (N, 4 + SMAX/16) int32
    (fused) or (hdr (N, 2), streams (N, SMAX/16)) with ``split``."""
    return jax.jit(
        make_stream_traceback_gather_call(
            BBLK, XMAX, YMAX, W, interpret, SMAX, split
        )
    )


_STB_CACHE = {}


def get_stream_traceback_gather_kernel(
    BBLK, XMAX, YMAX, W, interpret=False, SMAX=0, split=False
):
    key = (BBLK, XMAX, YMAX, W, interpret, SMAX, walk_packed_on(), split)
    if key not in _STB_CACHE:
        _STB_CACHE[key] = make_stream_traceback_gather_kernel(
            BBLK, XMAX, YMAX, W, interpret, SMAX, split
        )
    return _STB_CACHE[key]


# ---------------------------------------------------------------------------
# Device-resident gather front-ends.
#
# The host↔device link on this deployment is a tunnel (~40 MB/s, ~50 ms
# round-trip), so shipping materialised (N, XW)+(N, YMAX) window bytes
# dominates end-to-end time.  Instead the reference text (concatenated
# genome + all transcript spliced sequences) and the read batch live in
# HBM, and each extension problem is described by 9 int32s:
#
#   meta columns: [y_word, y_sub, y_dir, ylen, x_base, x_dir, xlen,
#                  band, x_drop]
#
# The y anchor is pre-split into (word, sub) of the nibble-packed text:
# anchor byte = 8*y_word + y_sub = text position + _WPAD.  Splitting on
# the host keeps every device-side quantity int32 for texts up to
# ~17 Gbp (word indices < 2^31) — whole-genome scale without enabling
# 64-bit JAX.  The window in forward text order is
#   [anchor, anchor+ylen)            for y_dir = +1
#   [anchor-(ylen-1), anchor] read reversed  for y_dir = -1,
# x likewise (byte offsets; the read block is always < 2 GiB).  Windows
# are built on-device with XLA gathers (HBM bandwidth, not tunnel
# bandwidth) inside the same jit as the Pallas kernel — the SURVEY §7
# "index resident in HBM + vectorized gather" design.
# ---------------------------------------------------------------------------

META_COLS = 9  # y_word, y_sub, y_dir, ylen, x_base, x_dir, xlen, band, x_drop

# packed upload form: 4 int32 cols [y_word, x_base,
#   ylen | xlen<<16,  y_sub | ydir_neg<<3 | xdir_neg<<4 | band<<5 | xd<<15]
# — 55% less h2d per chunk over the ~40 MB/s tunnel.  Kernels accept
# either form (unpacked on device, a handful of shifts).
META_PACKED_COLS = 4


def pack_meta_host(meta: "np.ndarray") -> "np.ndarray":
    """(N, 9) int32 problem meta -> (N, 4) packed upload form."""
    m = meta
    assert m.shape[1] == META_COLS
    ylen, xlen = m[:, 3], m[:, 6]
    band, xd = m[:, 7], m[:, 8]
    if len(m) and (
        int(ylen.max(initial=0)) > 0xFFFF or int(xlen.max(initial=0)) > 0xFFFF
        or int(band.max(initial=0)) > 0x3FF or int(xd.max(initial=0)) > 0xFFF
    ):
        raise ValueError("meta fields exceed packed-form ranges")
    c2 = ylen | (xlen << 16)
    c3 = (
        m[:, 1]
        | ((m[:, 2] < 0).astype(np.int32) << 3)
        | ((m[:, 5] < 0).astype(np.int32) << 4)
        | (band << 5)
        | (xd << 15)
    )
    return np.stack([m[:, 0], m[:, 4], c2, c3], axis=1).astype(np.int32)


def _meta9(meta):
    """Device-side: accept (N, 9) unpacked or (N, 4) packed meta and
    return the canonical 9-col layout (pad rows of zeros unpack to
    zeros except dir = +1, which only affects discarded pad outputs)."""
    if meta.shape[1] == META_COLS:
        return meta
    c0, c1, c2, c3 = (meta[:, k : k + 1] for k in range(META_PACKED_COLS))
    ylen = c2 & 0xFFFF
    xlen = (c2 >> 16) & 0xFFFF
    y_sub = c3 & 7
    y_dir = 1 - 2 * ((c3 >> 3) & 1)
    x_dir = 1 - 2 * ((c3 >> 4) & 1)
    band = (c3 >> 5) & 0x3FF
    xd = (c3 >> 15) & 0xFFF
    return jnp.concatenate(
        [c0, y_sub, y_dir, ylen, c1, x_dir, xlen, band, xd], axis=1
    )

# The resident reference text is nibble-packed: 8 bases per int32 word,
# 4-bit codes (below).  One copy, L/2 bytes — a 6.2 Gbp fwd+rc
# whole-genome text fits v5e HBM at 3.1 GB where the older
# 4-byte-shifted-copies layout needed 25 GB.  Word straddles are
# resolved on-device with a per-problem funnel shift (2 gathered words
# cover 16 bases vs 4 for the byte layout).  _WPAD zero BYTES pad both
# ends so reversed windows near position 0 never index out of range.
_WPAD = 512

# 4-bit text codes: 0 = padding, A/C/G/T/N/$ = 1..6, anything else = 7.
# Read bytes map through _read_codes (A..N = 1..5, other = 15), so a
# non-ACGTN read byte never matches any text code — same outcome as the
# reference's byte compare on a clean ACGTN$ text.  Texts containing
# other bytes must use the byte-path XLA backend (BatchAligner guards).
_NIB_LUT = np.full(256, 7, np.uint8)
_NIB_LUT[0] = 0
for _i, _b in enumerate(b"ACGTN$"):
    _NIB_LUT[_b] = _i + 1


def nib_lw(L: int) -> int:
    """Word count of the nibble-packed text for L bytes."""
    return (_WPAD + L + _WPAD + 7) // 8


def pack_text_nib_host(text_u8: "np.ndarray") -> "np.ndarray":
    """Host-side nibble pack: (L,) uint8 ASCII -> (nib_lw(L),) int32.

    Word w holds codes of text_padded[8w .. 8w+7], 4 bits each,
    little-endian (code i at bits 4i..4i+3), where
    text_padded = [0]*_WPAD + text + [0]*pad.  Packing on the host
    (numpy, ~8 strided passes) keeps the one-time upload at L/2 bytes.
    """
    L = int(text_u8.shape[0])
    Lw = nib_lw(L)
    padded = np.zeros(Lw * 8, np.uint8)
    padded[_WPAD : _WPAD + L] = text_u8
    w = np.zeros(Lw, np.uint32)
    for i in range(8):
        # per-slice LUT keeps the transient at Lw elements, not 8*Lw
        # (a whole-genome text would otherwise cost an extra ~6 GB)
        w |= _NIB_LUT[padded[i::8]].astype(np.uint32) << np.uint32(4 * i)
    return w.view(np.int32)


def iter_text_nib_words(text_u8: "np.ndarray", chunk_words: int = 1 << 26):
    """Yield ``pack_text_nib_host(text_u8)`` in int32 chunks.

    Streaming form for persisting a genome-scale packed text (the
    artifact's ``text_nib`` member): the whole-array pack transiently
    allocates ~2.5x the text in fresh pages, which throttled hosts pay
    in minutes; chunks keep the transient at ~0.6 GB.  Element-exact
    equality with the one-shot pack is pinned by test."""
    L = int(text_u8.shape[0])
    Lw = nib_lw(L)
    for a in range(0, Lw, chunk_words):
        b = min(a + chunk_words, Lw)
        padded = np.zeros((b - a) * 8, np.uint8)
        lo = 8 * a - _WPAD  # text coordinate of padded-chunk byte 0
        s = max(lo, 0)
        e = min(8 * b - _WPAD, L)
        if e > s:
            padded[s - lo : e - lo] = text_u8[s:e]
        w = np.zeros(b - a, np.uint32)
        for i in range(8):
            w |= _NIB_LUT[padded[i::8]].astype(np.uint32) << np.uint32(4 * i)
        yield w.view(np.int32)


def meta_row(y_base, y_dir, ylen, x_base, x_dir, xlen, band, x_drop):
    """Build one META_COLS row from a byte-coordinate y anchor (test /
    dry-run helper; the batch builders inline this)."""
    lo = y_base + _WPAD
    return (lo >> 3, lo & 7, y_dir, ylen, x_base, x_dir, xlen, band, x_drop)


def _gather_span_nib(words_flat, lw, w0, sub, dirp, SPAN):
    """(N,1) word/sub anchor + dir -> (N, SPAN) uint8 text codes.

    For dir=+1 the anchor is the window start; for dir=-1 it is the
    window END in forward order and the output is reversed (y[i] =
    text[anchor - i]), matching the old byte-path semantics.
    """
    q = jnp.where(dirp == 1, sub, sub - (SPAN - 1))
    adj = jnp.floor_divide(q, 8)  # floor: q may be negative
    ws = w0 + adj
    s = q - 8 * adj  # 0..7
    K = SPAN // 8
    k = jnp.arange(K + 1, dtype=jnp.int32)[None, :]
    idx = jnp.clip(ws + k, 0, lw - 1)
    words = jnp.take(words_flat, idx).astype(jnp.uint32)  # (N, K+1)
    sh = (4 * s).astype(jnp.uint32)
    lo = words[:, :K] >> sh
    hi_sh = ((32 - 4 * s) % 32).astype(jnp.uint32)
    hi = jnp.where(s == 0, jnp.uint32(0), words[:, 1:] << hi_sh)
    w = lo | hi  # (N, K): 8 window codes per word
    nib_sh = (4 * jnp.arange(8, dtype=jnp.uint32))[None, None, :]
    b = ((w[:, :, None] >> nib_sh) & 0xF).astype(jnp.uint8)
    b = b.reshape(b.shape[0], SPAN)
    return jnp.where(dirp == 1, b, jnp.flip(b, axis=1))


def _read_codes(win):
    """ASCII read bytes -> 4-bit-comparable codes (A..N = 1..5, pad
    0 -> 0, anything else 15: never equals a text code)."""
    b = win.astype(jnp.int32)
    c = jnp.where(b == 0, 0, 15)
    for val, code in ((65, 1), (67, 2), (71, 3), (84, 4), (78, 5)):
        c = jnp.where(b == val, code, c)
    return c.astype(jnp.uint8)


# read-block nibble LUT: same codes _read_codes produces on device, so
# a host-pre-packed read block is bit-identical to the on-device
# byte->code path (A..N = 1..5, pad 0 -> 0, anything else 15)
_READ_NIB_LUT = np.full(256, 15, np.uint8)
_READ_NIB_LUT[0] = 0
for _i, _b in enumerate(b"ACGTN"):
    _READ_NIB_LUT[_b] = _i + 1


def pack_reads_nib_host(reads_u8: "np.ndarray") -> "np.ndarray":
    """Host-side nibble pack of the (rows*RPAD,) flattened read block:
    uint8 ASCII -> (nib_lw(L),) int32, same word layout as
    ``pack_text_nib_host`` but through the READ code LUT.  Halves the
    per-chunk read upload (the host<->device link here is a ~40 MB/s
    tunnel) and removes the per-call on-device byte re-pack."""
    L = int(reads_u8.shape[0])
    Lw = nib_lw(L)
    padded = np.zeros(Lw * 8, np.uint8)
    padded[_WPAD : _WPAD + L] = reads_u8
    w = np.zeros(Lw, np.uint32)
    for i in range(8):
        w |= _READ_NIB_LUT[padded[i::8]].astype(np.uint32) << np.uint32(4 * i)
    return w.view(np.int32)


def packed_lw(L: int) -> int:
    """Word count per shifted copy for a text of L bytes (the gather
    stride; must match pack_text_words)."""
    return ((_WPAD + L + _WPAD + 3) // 4 * 4) // 4


def pack_text_words(text_u8):
    """(L,) uint8 -> ((4, Lw) int32 shifted word copies, Lw).

    copy s, word w holds bytes text_padded[4w+s .. 4w+s+3] little-endian,
    where text_padded = [0]*_WPAD + text + [0]*_WPAD.
    """
    L = int(text_u8.shape[0])
    Lw = packed_lw(L)
    total4 = Lw * 4
    padded = jnp.zeros((total4 + 4,), jnp.uint8)
    padded = jax.lax.dynamic_update_slice(padded, text_u8, (_WPAD,))
    outs = []
    for s in range(4):
        seg = jax.lax.slice(padded, (s,), (s + 4 * Lw,))
        # strided 1-D slices, NOT a (Lw, 4) reshape: TPU tiles the minor
        # dimension to 128, so a skinny 2-D intermediate transiently
        # blows HBM 32x (23 GB for a 90 Mbp text)
        b0 = jax.lax.slice(seg, (0,), (4 * Lw,), (4,)).astype(jnp.uint32)
        b1 = jax.lax.slice(seg, (1,), (4 * Lw,), (4,)).astype(jnp.uint32)
        b2 = jax.lax.slice(seg, (2,), (4 * Lw,), (4,)).astype(jnp.uint32)
        b3 = jax.lax.slice(seg, (3,), (4 * Lw,), (4,)).astype(jnp.uint32)
        outs.append(b0 | (b1 << 8) | (b2 << 16) | (b3 << 24))
    return jnp.stack(outs).astype(jnp.int32), Lw


def _gather_span_packed(words_flat, lw, base, dirp, SPAN):
    """(N,1) base/dir -> (N, SPAN) int32 window bytes (dir applied)."""
    lo = jnp.where(dirp == 1, base, base - (SPAN - 1)) + _WPAD
    s = lo & 3
    w0 = lo >> 2
    k = jnp.arange(SPAN // 4, dtype=jnp.int32)[None, :]
    idx = s * lw + jnp.clip(w0 + k, 0, lw - 1)
    words = jnp.take(words_flat, idx)
    sh = (jnp.arange(4, dtype=jnp.int32) * 8)[None, None, :]
    b = ((words[:, :, None] >> sh) & 0xFF).reshape(words.shape[0], SPAN)
    return jnp.where(dirp == 1, b, jnp.flip(b, axis=1))


def _gather_windows_packed(
    ref_nib, ref_lw, reads, meta, XMAX, XW, YMAX, shifted_x: bool
):
    """Device window builder (pallas path): x from the read block
    (either a host-pre-packed 1-D nibble array — production — or a 2-D
    uint8 block byte-packed on device), y from the nibble-packed
    resident text.  Both sides come out as comparable 4-bit codes,
    bit-identical between the two read forms."""
    ix = jnp.arange(XMAX, dtype=jnp.int32)[None, :]
    if reads.ndim == 1:  # host-pre-packed nibble read block
        rlw = reads.shape[0]
        lo = meta[:, 4:5] + _WPAD
        xb = _gather_span_nib(
            reads, rlw, lo >> 3, lo & 7, meta[:, 5:6], XMAX
        )
        win = jnp.where(ix < meta[:, 6:7], xb, 0).astype(jnp.uint8)
    else:
        rw, rlw = pack_text_words(reads.reshape(-1))
        xb = _gather_span_packed(
            rw.reshape(-1), rlw, meta[:, 4:5], meta[:, 5:6], XMAX
        )
        win = jnp.where(ix < meta[:, 6:7], _read_codes(xb), 0).astype(jnp.uint8)
    if shifted_x:
        x = jnp.pad(win, ((0, 0), (1, XW - XMAX - 1)))
    else:
        x = win
    yb = _gather_span_nib(
        ref_nib.reshape(-1), ref_lw, meta[:, 0:1], meta[:, 1:2],
        meta[:, 2:3], YMAX,
    )
    iy = jnp.arange(YMAX, dtype=jnp.int32)[None, :]
    y = jnp.where(iy < meta[:, 3:4], yb, 0).astype(jnp.uint8)
    return x, y


def _gather_windows(ref_text, reads, meta, XW, YMAX, shifted_x: bool):
    """ASCII-byte window builder (XLA/CPU test backend): y byte base is
    reconstructed from the (word, sub) anchor — int32 arithmetic, so
    this path is for sub-2-GiB texts (tests / dry-runs) only."""
    G = ref_text.shape[0]
    R = reads.size
    reads_flat = reads.reshape(-1)

    ix = jnp.arange(XW, dtype=jnp.int32)[None, :]
    off = ix - 1 if shifted_x else ix
    xi = meta[:, 4:5] + meta[:, 5:6] * off
    xv = (off >= 0) & (off < meta[:, 6:7])
    x = jnp.where(xv, jnp.take(reads_flat, jnp.clip(xi, 0, R - 1)), 0).astype(
        jnp.uint8
    )

    ybase = 8 * meta[:, 0:1] + meta[:, 1:2] - _WPAD
    iy = jnp.arange(YMAX, dtype=jnp.int32)[None, :]
    yi = ybase + meta[:, 2:3] * iy
    yv = iy < meta[:, 3:4]
    y = jnp.where(yv, jnp.take(ref_text, jnp.clip(yi, 0, G - 1)), 0).astype(
        jnp.uint8
    )
    return x, y


def _params_from_meta(meta):
    return jnp.concatenate(
        [meta[:, 6:7], meta[:, 3:4], meta[:, 7:8], meta[:, 8:9]], axis=1
    )


def make_forward_gather_kernel(BBLK, XMAX, YMAX, W, interpret=False):
    """jit fn (ref_words, ref_lw, reads, meta) -> (N, 4)
    [score, max_i, max_j, 0].  ref_words is the pack_text_words copy of
    the resident reference text."""
    XW = xwidth(XMAX, W)
    assert XMAX <= _WPAD and YMAX <= _WPAD
    inner = make_forward_kernel(BBLK, XMAX, YMAX, W, interpret)

    def call(ref_words, ref_lw, reads, meta):
        meta = _meta9(meta)
        x, y = _gather_windows_packed(
            ref_words, ref_lw, reads, meta, XMAX, XW, YMAX, shifted_x=True
        )
        return inner(x, y, _params_from_meta(meta))

    return jax.jit(call)


def make_traceback_gather_kernel(BBLK, XMAX, YMAX, W, RMAX=24, interpret=False):
    """jit fn (ref_words, ref_lw, reads, meta) -> (meta_out, runs)."""
    XW = xwidth(XMAX, W)
    assert XMAX <= _WPAD and YMAX <= _WPAD
    inner = make_traceback_kernel(BBLK, XMAX, YMAX, W, RMAX, interpret)

    def call(ref_words, ref_lw, reads, meta):
        meta = _meta9(meta)
        x, y = _gather_windows_packed(
            ref_words, ref_lw, reads, meta, XMAX, XW, YMAX, shifted_x=True
        )
        return inner(x, y, _params_from_meta(meta))

    return jax.jit(call)


_FWD_CACHE = {}
_TB_CACHE = {}
_FWDG_CACHE = {}
_TBG_CACHE = {}


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


def get_forward_gather_kernel(BBLK, XMAX, YMAX, W, interpret=False):
    key = (BBLK, XMAX, YMAX, W, interpret)
    if key not in _FWDG_CACHE:
        _FWDG_CACHE[key] = make_forward_gather_kernel(BBLK, XMAX, YMAX, W, interpret)
    return _FWDG_CACHE[key]


def get_traceback_gather_kernel(BBLK, XMAX, YMAX, W, RMAX=24, interpret=False):
    key = (BBLK, XMAX, YMAX, W, RMAX, interpret)
    if key not in _TBG_CACHE:
        _TBG_CACHE[key] = make_traceback_gather_kernel(
            BBLK, XMAX, YMAX, W, RMAX, interpret
        )
    return _TBG_CACHE[key]
