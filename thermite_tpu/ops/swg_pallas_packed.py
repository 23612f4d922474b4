"""Lane-packed Pallas stream kernel: TWO problems per 128-lane row.

The general kernel (``swg_pallas``) rounds the band register width W up
to 128 lanes; at the aligner's default scoring (-s0.66, 90 bp reads)
the band is 31, so 2b+1 = 63 active lanes leave ~50% of every vector
op idle.  This variant packs problem A into lanes 0..63 and problem B
into lanes 64..127 whenever every problem in the batch has band <=
``PACK_BAND_MAX``, halving the per-problem column work.

Same DP semantics as the general kernel (pinned by parity tests).
Mechanics:

* lane index ``t2 = lane & 63`` is segment-local; segment id
  ``g = lane >= 64``.  Per-problem parameters live as (BBLK, 2)
  vectors broadcast to lanes via a segment select, and the boundary
  masks (``t2 == 0`` / ``t2 == 63``) cut the cross-segment
  contamination of full-row lane rolls exactly where the general
  kernel masks its register edges.
* a 64-lane segment cannot hold a whole read flank, so the x state
  splits: the live band window ``xs`` (one 128-lane register, both
  segments) plus per-problem *suffix source* registers ``xsA/xsB``
  whose head lane refills ``xs``'s lane 63 as the band slides.  y
  needs only the current column symbol, so ``ybA/ybB`` stay plain
  rolling registers read at lane 0.
* the within-column insertion prefix-max stops at shift 32 — a shift
  of 64 only mixes segments and is fully masked anyway.  This is where
  the arithmetic halves: every DP vector op now serves two problems.
* outputs come back two-problems-per-row and are unscrambled to the
  standard ``(N, 4 + SMAX/16)`` row layout by plain XLA reshapes, so
  everything downstream (C++ finalize, stream decode, arbitration) is
  unchanged.

Problem-row mapping: within each grid block of 2*BBLK consecutive meta
rows, rows [0, BBLK) are segment A and [BBLK, 2*BBLK) segment B.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import GAP_EXTEND, GAP_OPEN, MATCH_SCORE, MIN_SCORE, MISMATCH_SCORE
from .swg_pallas import (
    DIR_DEL,
    DIR_INS,
    DIR_MATCH,
    DIR_SUBST,
    _PAD,
    _gather_span_nib,
    _gather_span_packed,
    _read_codes,
    pack_text_words,
)

PACK_BAND_MAX = 31  # 2b+1 <= 63 fits a 64-lane segment
SEG = 64
W = 128


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def make_packed_stream_call(BBLK: int, XSRC: int, YMAX: int, SMAX: int,
                            interpret: bool = False, walk: bool = True):
    """UNJITTED (xs0, xsA, xsB, ybA, ybB, params) -> (meta2, ops2).

    xs0     (N2, 128) int32 — initial x windows ([0, x[0..62]] per seg)
    xsA/xsB (N2, XSRC) int32 — x suffix sources (xs*[t] = x[t + 63])
    ybA/ybB (N2, YMAX) int32 — y windows
    params  (N2, 8) int32 — [xlenA ylenA bandA xdA xlenB ylenB bandB xdB]
    meta2   (N2, 8) int32 — [sA miA mjA nsA sB miB mjB nsB]
    ops2    (N2, 2*SMAX) int32 — walk dir codes, segment-major halves
    """
    MAXIT = YMAX + 1 + SMAX

    def kernel(xs0_ref, xsa_ref, xsb_ref, yba_ref, ybb_ref, p_ref,
               meta_ref, ops_ref, dirs_ref):
        e = jnp.int32(GAP_EXTEND)
        o = jnp.int32(GAP_OPEN)
        MIN = jnp.int32(MIN_SCORE)

        t = jax.lax.broadcasted_iota(jnp.int32, (BBLK, W), 1)
        t2 = t & (SEG - 1)
        gB = t >= SEG

        P = p_ref[:, :]

        def pair(col):  # (BBLK, 2) [A, B] of param column
            return jnp.concatenate(
                [P[:, col : col + 1], P[:, 4 + col : 5 + col]], axis=1
            )

        def seg_bcast(v2):  # (BBLK, 2) -> (BBLK, W) by segment
            return jnp.where(gB, v2[:, 1:2], v2[:, 0:1])

        xlen2, ylen2, band2, xd2 = pair(0), pair(1), pair(2), pair(3)
        xlen = seg_bcast(xlen2)
        ylen = seg_bcast(ylen2)
        band = seg_bcast(band2)
        x_drop = seg_bcast(xd2)

        b2 = 2 * band
        ladder = t2 * e + o
        D = jnp.where(t2 == 0, 0, jnp.where(t2 <= b2, ladder, MIN))
        C = jnp.broadcast_to(jnp.where(t2 == 0, 0, MIN), (BBLK, W))
        xs = xs0_ref[:, :]
        xsA = xsa_ref[:, :]
        xsB = xsb_ref[:, :]
        ybA = yba_ref[:, :]
        ybB = ybb_ref[:, :]

        dirs_ref[0, :, :] = jnp.where(t2 <= b2, DIR_INS, DIR_MATCH)

        z2 = jnp.zeros((BBLK, 2), jnp.int32)
        zW = jnp.zeros((BBLK, W), jnp.int32)
        tz = t2 == 0
        tlast = t2 == SEG - 1
        te = t2 * e

        def seg_allmax(v, init):
            # (BBLK, W) -> per-segment max broadcast to every lane of
            # the segment: masked reductions + a lane-space select (no
            # narrow intermediates survive into vector-op shapes)
            a = jnp.max(jnp.where(gB, init, v), axis=1, keepdims=True)
            b = jnp.max(jnp.where(gB, v, init), axis=1, keepdims=True)
            return jnp.where(gB, b, a)

        def seg_allmin(v, init):
            a = jnp.min(jnp.where(gB, init, v), axis=1, keepdims=True)
            b = jnp.min(jnp.where(gB, v, init), axis=1, keepdims=True)
            return jnp.where(gB, b, a)

        # band-exactness certificate state in lane space (uniform per
        # segment; see swg_pallas.make_stream_traceback_kernel docstring)
        e_ladder = jnp.int32(GAP_OPEN) + (band + 1) * jnp.int32(GAP_EXTEND)
        ub_final = xlen * jnp.int32(MATCH_SCORE) + e_ladder
        bigW = jnp.full((BBLK, W), 1 << 30, jnp.int32)

        def body(j, carry):
            # all per-problem tracking state lives in LANE space
            # (uniform within each 64-lane segment): narrow (BBLK, 2)
            # vector ops pad to full tiles anyway, and the per-column
            # lane<->pair concatenates were pure overhead
            (D, C, xs, xsA, xsB, ybA, ybB, ms, mi, mj, s1, s2, cmin, ecap,
             rstop) = carry
            in_p1 = j <= band
            sh = ~in_p1
            active = (j <= ylen) & (s1 == 0) & (in_p1 | (s2 == 0))
            sh2 = j > band2  # (BBLK, 2) only steers the suffix rolls
            row0 = jnp.maximum(j - band, 0)
            computed = (t2 <= b2) & (t2 <= xlen - row0)

            D_l = jnp.where(tlast, MIN, pltpu.roll(D, W - 1, 1))
            C_l = jnp.where(tlast, MIN, pltpu.roll(C, W - 1, 1))
            D_r = jnp.where(tz, MIN, pltpu.roll(D, 1, 1))
            Dp = jnp.where(sh, D_l, D)
            Cp = jnp.where(sh, C_l, C)
            Dm = jnp.where(sh, D, D_r)

            # x window slide + per-segment refill from the suffix heads
            refill = jnp.where(gB, xsB[:, :1], xsA[:, :1])
            xs_l = jnp.where(tlast, refill, pltpu.roll(xs, W - 1, 1))
            xs = jnp.where(sh, xs_l, xs)
            shA = sh2[:, 0:1]
            shB = sh2[:, 1:2]
            xsA = jnp.where(shA, pltpu.roll(xsA, XSRC - 1, 1), xsA)
            xsB = jnp.where(shB, pltpu.roll(xsB, XSRC - 1, 1), xsB)

            # y column symbols + advance
            yj = jnp.where(gB, ybB[:, :1], ybA[:, :1])
            ybA = pltpu.roll(ybA, YMAX - 1, 1)
            ybB = pltpu.roll(ybB, YMAX - 1, 1)

            c_val = jnp.maximum(Cp + e, Dp + e + o)
            c_val = jnp.where(sh & (t2 == b2), MIN, c_val)

            row_is0 = tz & in_p1
            is_match = (xs == yj) & ~row_is0
            s = jnp.where(is_match, MATCH_SCORE, MISMATCH_SCORE).astype(jnp.int32)
            d_val = jnp.where(row_is0, MIN, Dm + s)

            A = jnp.maximum(d_val, c_val)
            A_m = jnp.where(computed, A, MIN)

            base = A_m - te
            pm = jnp.where(tz, _PAD, pltpu.roll(base, 1, 1))
            k = 1
            while k < SEG:
                shifted = jnp.where(t2 < k, _PAD, pltpu.roll(pm, k, 1))
                pm = jnp.maximum(pm, shifted)
                k *= 2
            r_val = jnp.where(tz, MIN, o + te + pm)

            D_new = jnp.maximum(A, r_val)

            mask = computed & active
            D = jnp.where(mask, D_new, D)
            C = jnp.where(mask, c_val, C)

            dir_new = jnp.where(
                D_new == d_val,
                jnp.where(is_match, DIR_MATCH, DIR_SUBST),
                jnp.where(D_new == c_val, DIR_DEL, DIR_INS),
            )
            dirs_ref[pl.ds(j, 1), :, :] = jnp.where(mask, dir_new, DIR_MATCH)[None]

            D_for_max = jnp.where(mask, D_new, MIN)
            band_max = seg_allmax(D_for_max, MIN)  # lane space
            tt = jnp.where(D_for_max == band_max, t2, SEG)
            col_arg = seg_allmin(tt, jnp.int32(SEG))
            improved = active & (band_max > ms)
            ms = jnp.where(improved, band_max, ms)
            mi = jnp.where(improved, row0 + col_arg, mi)
            mj = jnp.where(improved, jnp.broadcast_to(j, mj.shape), mj)

            dropped = band_max < ms - x_drop
            s1 = jnp.maximum(s1, (in_p1 & active & dropped).astype(jnp.int32))
            s2 = jnp.maximum(s2, ((~in_p1) & active & dropped).astype(jnp.int32))
            ej = jnp.minimum(j, xlen) * jnp.int32(MATCH_SCORE) + e_ladder
            cmin = jnp.where(
                active & ~dropped, jnp.minimum(cmin, band_max - ej), cmin
            )
            # real x-drop vs band exhaustion: see the general kernel
            real_drop = active & dropped & (band_max > MIN)
            ecap = jnp.where(real_drop, ej, ecap)
            rstop = jnp.maximum(rstop, real_drop.astype(jnp.int32))
            return (D, C, xs, xsA, xsB, ybA, ybB, ms, mi, mj, s1, s2, cmin,
                    ecap, rstop)

        carry = jax.lax.fori_loop(
            1, YMAX + 1, body,
            (D, C, xs, xsA, xsB, ybA, ybB, zW, zW, zW, zW, zW, bigW,
             ub_final, zW),
        )
        msL, miL, mjL = carry[7], carry[8], carry[9]
        cminL, ecapL, rstopL = carry[12], carry[13], carry[14]
        cert_ubL = jnp.where(rstopL > 0, ecapL + x_drop, ub_final)
        certL = ((cminL > -x_drop) & (msL > cert_ubL)).astype(jnp.int32)

        def to_pair(v):  # lane-space per-segment scalar -> (BBLK, 2)
            a = jnp.max(jnp.where(gB, jnp.int32(-(1 << 30)), v), axis=1,
                        keepdims=True)
            b = jnp.max(jnp.where(gB, v, jnp.int32(-(1 << 30))), axis=1,
                        keepdims=True)
            return jnp.concatenate([a, b], axis=1)

        ms, mi, mj = to_pair(msL), to_pair(miL), to_pair(mjL)
        certp = to_pair(certL)
        band2v = pair(2)

        # ---- vectorized walk over both segments ----
        S2 = 2 * SMAX
        ops_ref[:, :] = jnp.zeros((BBLK, S2), jnp.int32)
        slane = jax.lax.broadcasted_iota(jnp.int32, (BBLK, S2), 1)
        sseg = slane >= SMAX
        jj0 = jnp.max(mj)

        def seg_bcast2(v2):
            return jnp.where(gB, v2[:, 1:2], v2[:, 0:1])

        def cond(st):
            jj, i, j, c, it = st
            any_alive = jnp.max(((i > 0) | (j > 0)).astype(jnp.int32)) > 0
            return (jj >= 0) & any_alive & (it < MAXIT)

        def step(st):
            jj, i, j, c, it = st
            row = dirs_ref[jj, :, :]
            row0 = jnp.maximum(jj - band2v, 0)  # (BBLK, 2)
            bi = jnp.clip(i - row0, 0, 2 * band2v)
            bil = seg_bcast2(bi)
            dA = jnp.sum(
                jnp.where((~gB) & (t2 == bil), row, 0), axis=1, keepdims=True
            )
            dB = jnp.sum(
                jnp.where(gB & (t2 == bil), row, 0), axis=1, keepdims=True
            )
            d = jnp.concatenate([dA, dB], axis=1)  # (BBLK, 2)
            alive = (i > 0) | (j > 0)
            stepping = alive & (j == jj)
            cl = jnp.where(sseg, SMAX + c[:, 1:2], c[:, 0:1])
            # int32 payloads only: a where() over i1 vectors lowers
            # through an i8->i1 truncation Mosaic rejects
            si = stepping.astype(jnp.int32)
            stl = jnp.where(sseg, si[:, 1:2], si[:, 0:1])
            dl = jnp.where(sseg, d[:, 1:2], d[:, 0:1])
            ops_ref[:, :] = ops_ref[:, :] + jnp.where(
                (stl > 0) & (slane == cl), dl, 0
            )
            consumes_x = (d <= DIR_SUBST) | (d == DIR_INS)
            consumes_y = (d <= DIR_SUBST) | (d == DIR_DEL)
            i = jnp.where(stepping & consumes_x, i - 1, i)
            j = jnp.where(stepping & consumes_y, j - 1, j)
            c = jnp.where(stepping, c + 1, c)
            stepped_any = jnp.max(stepping.astype(jnp.int32)) > 0
            jj = jnp.where(stepped_any, jj, jj - 1)
            return (jj, i, j, c, it + 1)

        if walk:
            jj, i, j, c, it = jax.lax.while_loop(
                cond, step, (jj0, mi, mj, z2, jnp.int32(0))
            )
            bad = (i > 0) | (j > 0) | (c > SMAX)
            # cert failure -> recoverable -2 - nsteps (see the general
            # kernel); bad walks stay -1
            ns = jnp.where(bad, -1, jnp.where(certp > 0, c, -2 - c))
        else:  # diagnostic forward-only mode (perf decomposition)
            ns = z2
        meta_ref[:, :] = jnp.concatenate(
            [ms[:, 0:1], mi[:, 0:1], mj[:, 0:1], ns[:, 0:1],
             ms[:, 1:2], mi[:, 1:2], mj[:, 1:2], ns[:, 1:2]], axis=1
        )

    def call(xs0, xsA, xsB, ybA, ybB, params):
        N2 = xs0.shape[0]
        assert N2 % BBLK == 0
        grid = (N2 // BBLK,)
        spec = lambda cols: pl.BlockSpec(  # noqa: E731
            (BBLK, cols), lambda g: (g, 0), memory_space=pltpu.VMEM
        )
        meta2, ops2 = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                spec(W), spec(XSRC), spec(XSRC), spec(YMAX), spec(YMAX),
                spec(8),
            ],
            out_specs=[spec(8), spec(2 * SMAX)],
            out_shape=[
                jax.ShapeDtypeStruct((N2, 8), jnp.int32),
                jax.ShapeDtypeStruct((N2, 2 * SMAX), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((YMAX + 1, BBLK, W), jnp.int32),
            ],
            interpret=interpret,
        )(xs0, xsA, xsB, ybA, ybB, params)
        return meta2, ops2

    return call


def make_packed_stream_gather_kernel(
    BBLK: int, XMAX: int, YMAX: int, SMAX: int, interpret: bool = False,
    walk: bool = True,
):
    """jit fn (ref_nib, ref_lw, reads, meta) -> (N, 4 + SMAX/16) int32.

    Drop-in replacement for the general stream gather kernel when every
    problem has band <= PACK_BAND_MAX.  N must be a multiple of 2*BBLK;
    meta rows [k*2B, k*2B + B) are segment A of block k, the next B
    rows segment B; the output is unscrambled back to meta row order.
    """
    XSRC = _round_up(max(XMAX - SEG + 2, 1), 128)
    inner = make_packed_stream_call(BBLK, XSRC, YMAX, SMAX, interpret, walk)

    def call(ref_nib, ref_lw, reads, meta):
        N = meta.shape[0]
        N2 = N // 2
        m = meta.reshape(N2 // BBLK, 2, BBLK, 9)
        ma = m[:, 0].reshape(N2, 9)
        mb = m[:, 1].reshape(N2, 9)

        rw, rlw = pack_text_words(reads.reshape(-1))
        rw_flat = rw.reshape(-1)

        def x_initial(mm):
            # [0, x[0..62]] codes
            xb = _gather_span_packed(rw_flat, rlw, mm[:, 4:5], mm[:, 5:6], SEG)
            ix = jnp.arange(SEG, dtype=jnp.int32)[None, :]
            win = jnp.where(ix < mm[:, 6:7], _read_codes(xb), 0)
            return jnp.pad(
                win[:, : SEG - 1], ((0, 0), (1, 0))
            ).astype(jnp.int32)

        xs0 = jnp.concatenate([x_initial(ma), x_initial(mb)], axis=1)

        def x_suffix(mm):
            # xsrc[t] = x[t + 63] (0 beyond xlen)
            base = mm[:, 4:5] + mm[:, 5:6] * (SEG - 1)
            xb = _gather_span_packed(rw_flat, rlw, base, mm[:, 5:6], XSRC)
            ix = jnp.arange(XSRC, dtype=jnp.int32)[None, :]
            ok = ix + (SEG - 1) < mm[:, 6:7]
            return jnp.where(ok, _read_codes(xb), 0).astype(jnp.int32)

        def y_win(mm):
            yb = _gather_span_nib(
                ref_nib.reshape(-1), ref_lw, mm[:, 0:1], mm[:, 1:2],
                mm[:, 2:3], YMAX,
            )
            iy = jnp.arange(YMAX, dtype=jnp.int32)[None, :]
            return jnp.where(iy < mm[:, 3:4], yb, 0).astype(jnp.int32)

        params = jnp.concatenate(
            [ma[:, 6:7], ma[:, 3:4], ma[:, 7:8], ma[:, 8:9],
             mb[:, 6:7], mb[:, 3:4], mb[:, 7:8], mb[:, 8:9]], axis=1
        )

        meta2, ops2 = inner(
            xs0, x_suffix(ma), x_suffix(mb), y_win(ma), y_win(mb), params
        )

        # unscramble to standard (N, 4 + PW) rows
        PW = SMAX // 16
        codes = ops2.reshape(N2, 2, PW, 16)
        shifts = (2 * jnp.arange(16, dtype=jnp.int32))[None, None, None, :]
        packed = jnp.sum(codes << shifts, axis=3, dtype=jnp.int32)  # (N2,2,PW)
        halves = jnp.concatenate([meta2.reshape(N2, 2, 4), packed], axis=2)
        out = halves.reshape(N2 // BBLK, BBLK, 2, 4 + PW)
        out = jnp.swapaxes(out, 1, 2).reshape(N, 4 + PW)
        return out

    return jax.jit(call), call


_PACKED_CACHE = {}


def get_packed_stream_gather_kernel(BBLK, XMAX, YMAX, SMAX, interpret=False):
    key = (BBLK, XMAX, YMAX, SMAX, interpret)
    if key not in _PACKED_CACHE:
        _PACKED_CACHE[key] = make_packed_stream_gather_kernel(
            BBLK, XMAX, YMAX, SMAX, interpret
        )[0]
    return _PACKED_CACHE[key]
