"""Kernel microbenchmark: packed vs general stream kernel on real TPU.

Measures the single-pass gather+forward+traceback kernel at the
aligner's DEFAULT shapes (-s0.66, 90 bp reads -> band 31, the regime
the lane-packed kernel exists for) and reports problems/s and
effective GCUPS for both kernels plus the speedup.

Usage: python tools/kernel_bench.py [n_problems] [trials]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    import jax

    from thermite_tpu.ops.swg_pallas import (
        get_stream_traceback_gather_kernel,
        meta_row,
        nib_lw,
        pack_text_nib_host,
    )
    from thermite_tpu.ops.swg_pallas_packed import (
        get_packed_stream_gather_kernel,
    )

    rng = np.random.default_rng(5)
    text = rng.choice(np.frombuffer(b"ACGT", np.uint8), 2_000_000)
    words = jax.device_put(pack_text_nib_host(text))
    lw = np.int32(nib_lw(len(text)))

    # default-config shapes: 90 bp reads, band 31 -> flank <= 70,
    # window <= flank + band + 1
    RPAD = 96
    NR = 4096
    reads = np.zeros((NR, RPAD), np.uint8)
    src = np.zeros(NR, np.int64)
    for i in range(NR):
        p = int(rng.integers(200, len(text) - 290))
        src[i] = p
        reads[i, :90] = text[p : p + 90]
    reads_dev = jax.device_put(reads)

    band, xd = 31, 31
    XMAX, YMAX, W = 96, 128, 128
    SMAX = 256
    meta = np.zeros((n, 9), np.int32)
    cells = 0
    for i in range(n):
        xlen = int(rng.integers(20, 71))
        ylen = min(xlen + band + 1, YMAX)
        ri = int(rng.integers(0, NR))
        q = int(rng.integers(0, 90 - xlen + 1))
        # y window tracks the read's true source, so extensions align
        meta[i] = meta_row(
            int(src[ri]) + q, 1, ylen, ri * RPAD + q, 1, xlen, band, xd
        )
        cells += ylen * (2 * band + 1)

    BBLK = int(os.environ.get("KB_BBLK", "64"))
    BBLKP = int(os.environ.get("KB_BBLKP", str(BBLK)))
    general = get_stream_traceback_gather_kernel(BBLK, XMAX, YMAX, W, SMAX=SMAX)
    packed = get_packed_stream_gather_kernel(BBLKP, XMAX, YMAX, SMAX)

    def bench(kern, name):
        out = np.asarray(kern(words, lw, reads_dev, meta))  # compile+check
        assert (out[:, 0] > 0).mean() > 0.9, f"{name}: scores look wrong"
        best = 0.0
        for _ in range(trials):
            t0 = time.time()
            r = kern(words, lw, reads_dev, meta)
            np.asarray(r)  # sync
            best = max(best, n / (time.time() - t0))
        return best, out

    g_rate, g_out = bench(general, "general")
    p_rate, p_out = bench(packed, "packed")
    assert (g_out == p_out).all(), "packed != general on device!"

    res = {
        "metric": "stream_kernel_problems_per_s_band31",
        "general": round(g_rate, 0),
        "packed": round(p_rate, 0),
        "speedup": round(p_rate / g_rate, 2),
        "general_gcups": round(g_rate * cells / n / 1e9, 2),
        "packed_gcups": round(p_rate * cells / n / 1e9, 2),
    }
    print(json.dumps(res))


if __name__ == "__main__":
    main()
