"""Differential tests: Pallas kernels (interpret mode on CPU) vs oracle."""

import numpy as np
import pytest

from thermite_tpu.ops.runs import decode_runs_one, decode_stream_batch
from thermite_tpu.ops.swg_pallas import (
    get_forward_kernel,
    get_traceback_kernel,
    make_stream_traceback_kernel,
)
from thermite_tpu.ops.swg_ref import SwgExtend


from thermite_tpu.ops.swg_pallas import xwidth


def pack_pairs(pairs, BBLK, XMAX, YMAX, W):
    N = ((len(pairs) + BBLK - 1) // BBLK) * BBLK
    XW = xwidth(XMAX, W)
    x = np.zeros((N, XW), np.uint8)  # pre-shifted: row = [0, x...]
    y = np.zeros((N, YMAX), np.uint8)
    params = np.zeros((N, 4), np.int32)
    for k, (xs, ys, b, d) in enumerate(pairs):
        x[k, 1 : min(len(xs), XW - 1) + 1] = np.frombuffer(
            xs[: XW - 1], np.uint8
        )
        y[k, : len(ys)] = np.frombuffer(ys, np.uint8)
        params[k] = (len(xs), len(ys), b, d)
    return x, y, params


def run_pallas(pairs, trace=True):
    BBLK = 8
    XMAX = max(8, max(len(p[0]) for p in pairs))
    YMAX = max(8, max(len(p[1]) for p in pairs))
    bmax = max(p[2] for p in pairs)
    W = 2 * bmax + 1
    x, y, params = pack_pairs(pairs, BBLK, XMAX, YMAX, W)
    if trace:
        kern = get_traceback_kernel(BBLK, XMAX, YMAX, W, RMAX=64, interpret=True)
        meta, runs = (np.asarray(v) for v in kern(x, y, params))
        out = []
        for k in range(len(pairs)):
            out.append(
                decode_runs_one(
                    runs[k], int(meta[k, 3]), int(meta[k, 0]), int(meta[k, 1]),
                    int(meta[k, 2]), int(params[k, 0]), int(params[k, 1]),
                )
            )
        return out
    kern = get_forward_kernel(BBLK, XMAX, YMAX, W, interpret=True)
    meta = np.asarray(kern(x, y, params))
    return meta[: len(pairs)]


def run_pallas_stream(pairs):
    BBLK = 8
    XMAX = max(8, max(len(p[0]) for p in pairs))
    YMAX = max(8, max(len(p[1]) for p in pairs))
    bmax = max(p[2] for p in pairs)
    W = 2 * bmax + 1
    x, y, params = pack_pairs(pairs, BBLK, XMAX, YMAX, W)
    kern = make_stream_traceback_kernel(BBLK, XMAX, YMAX, W, interpret=True)
    out = np.asarray(kern(x, y, params))[: len(pairs)]
    return decode_stream_batch(out, params[:, 0], params[:, 1])


def assert_matches_oracle(pairs):
    got = run_pallas(pairs, trace=True)
    fwd = run_pallas(pairs, trace=False)
    stream = run_pallas_stream(pairs)
    for (xs, ys, b, d), g, f, s in zip(pairs, got, fwd, stream):
        want = SwgExtend(b).extend(xs, ys, b, d)
        assert g is not None
        assert g == want, f"x={xs!r} y={ys!r} band={b} xdrop={d}\n got={g}\nwant={want}"
        assert (int(f[0]), int(f[1]), int(f[2])) == (want.score, want.xend, want.yend)
        assert s == want, (
            f"stream kernel: x={xs!r} y={ys!r} band={b} xdrop={d}\n got={s}\nwant={want}"
        )


def test_reference_cases():
    assert_matches_oracle(
        [
            (b"AAAAAAAA", b"AAAAAAAA", 1, 1),
            (b"AAAAATTT", b"AAAAAAAA", 1, 1),
            (b"AAATAAAA", b"AAAAAAAA", 1, 1),
            (b"AAATTTT", b"AAACCTTTT", 2, 3),
        ]
    )


def test_mixed_bands():
    assert_matches_oracle(
        [
            (b"ACGTACGT", b"ACGTACGT", 1, 1),
            (b"ACGTACGT", b"ACGGTACGT", 4, 8),
            (b"ACGT", b"TTTTTTTT", 2, 2),
            (b"A", b"A", 1, 1),
            (b"ACGTACGTACGT", b"ACG", 3, 3),
        ]
    )


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_vs_oracle(seed):
    rng = np.random.default_rng(seed + 100)
    alpha = b"ACGT"
    pairs = []
    for _ in range(24):
        xl = int(rng.integers(1, 32))
        yl = int(rng.integers(1, 48))
        if rng.random() < 0.6:
            base = bytes(alpha[c] for c in rng.integers(0, 4, max(xl, yl)))
            xs = bytearray(base[:xl])
            ys = bytearray(base[:yl])
            for _ in range(int(rng.integers(0, 5))):
                m = int(rng.integers(0, 3))
                if m == 0 and len(ys) > 1:
                    del ys[int(rng.integers(0, len(ys)))]
                elif m == 1:
                    ys.insert(int(rng.integers(0, len(ys))), alpha[int(rng.integers(0, 4))])
                elif len(ys) > 0:
                    ys[int(rng.integers(0, len(ys)))] = alpha[int(rng.integers(0, 4))]
            xs, ys = bytes(xs), bytes(ys)
        else:
            xs = bytes(alpha[c] for c in rng.integers(0, 4, xl))
            ys = bytes(alpha[c] for c in rng.integers(0, 4, yl))
        b = int(rng.integers(1, 10))
        d = int(rng.integers(1, 15))
        pairs.append((xs, ys, b, d))
    assert_matches_oracle(pairs)
