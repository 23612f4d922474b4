"""Decompose the stream kernel's XLA gather prelude on the real TPU.

The round-2 analysis showed the gather prelude (window building outside
the pallas kernel) costs ~half of kernel wall.  This tool times each
piece separately at bench shapes so the fix targets the real sink:

  take_y     gather of the nibble-text words (jnp.take)
  unpack_y   funnel shift + 4-bit unpack + mask + flip
  full_y     _gather_span_nib end to end
  pack_x     pack_text_words(reads) (runs on EVERY kernel call today)
  full_x     x-window build (pack + gather + read-code map)
  dp_only    the pallas DP+walk kernel on pre-gathered windows
  full       the production gather+DP kernel

Usage: python tools/gather_bench.py [n_problems] [trials]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    import jax
    import jax.numpy as jnp

    from thermite_tpu.ops.swg_pallas import (
        _gather_span_nib,
        _gather_span_packed,
        _gather_windows_packed,
        _read_codes,
        get_stream_traceback_gather_kernel,
        make_stream_traceback_kernel,
        meta_row,
        nib_lw,
        pack_text_nib_host,
        pack_text_words,
        xwidth,
    )

    rng = np.random.default_rng(5)
    text = rng.choice(np.frombuffer(b"ACGT", np.uint8), 2_000_000)
    words = jax.device_put(pack_text_nib_host(text))
    lw = np.int32(nib_lw(len(text)))

    RPAD, NR = 96, 4096
    reads = np.zeros((NR, RPAD), np.uint8)
    src = np.zeros(NR, np.int64)
    for i in range(NR):
        p = int(rng.integers(200, len(text) - 290))
        src[i] = p
        reads[i, :90] = text[p : p + 90]
    reads_dev = jax.device_put(reads)

    band, xd = 15, 60
    XMAX, YMAX, W = 96, 128, 128
    XW = xwidth(XMAX, W)
    SMAX = 256
    meta = np.zeros((n, 9), np.int32)
    for i in range(n):
        xlen = int(rng.integers(20, 71))
        ylen = min(xlen + band + 1, YMAX)
        ri = int(rng.integers(0, NR))
        q = int(rng.integers(0, 90 - xlen + 1))
        meta[i] = meta_row(
            int(src[ri]) + q, 1, ylen, ri * RPAD + q, 1, xlen, band, xd
        )
    meta_dev = jax.device_put(meta)

    # every variant reduces to ONE scalar so the d2h transfer (~40 MB/s
    # tunnel) cannot pollute the timing; `noop` measures the dispatch +
    # sync floor to subtract
    @jax.jit
    def noop(m):
        return jnp.sum(m[:, 0])

    @jax.jit
    def take_y(m):
        w0, sub, dirp = m[:, 0:1], m[:, 1:2], m[:, 2:3]
        q = jnp.where(dirp == 1, sub, sub - (YMAX - 1))
        adj = jnp.floor_divide(q, 8)
        K = YMAX // 8
        k = jnp.arange(K + 1, dtype=jnp.int32)[None, :]
        idx = jnp.clip(w0 + adj + k, 0, lw - 1)
        return jnp.sum(jnp.take(words.reshape(-1), idx))

    @jax.jit
    def full_y(m):
        return jnp.sum(
            _gather_span_nib(
                words.reshape(-1), lw, m[:, 0:1], m[:, 1:2], m[:, 2:3], YMAX
            ).astype(jnp.int32)
        )

    @jax.jit
    def pack_x(r):
        rw, _ = pack_text_words(r.reshape(-1))
        return jnp.sum(rw)

    @jax.jit
    def full_xy(r, m):
        x, y = _gather_windows_packed(
            words, lw, r, m, XMAX, XW, YMAX, shifted_x=True
        )
        return jnp.sum(x.astype(jnp.int32)) + jnp.sum(y.astype(jnp.int32))

    dp_inner_raw = make_stream_traceback_kernel(64, XMAX, YMAX, W, SMAX=SMAX)
    dp_inner = jax.jit(lambda x, y, p: jnp.sum(dp_inner_raw(x, y, p)))
    full_raw = get_stream_traceback_gather_kernel(64, XMAX, YMAX, W, SMAX=SMAX)
    full = jax.jit(lambda w, l, r, m: jnp.sum(full_raw(w, l, r, m)))

    @jax.jit
    def full_xy_mat(r, m):
        return _gather_windows_packed(
            words, lw, r, m, XMAX, XW, YMAX, shifted_x=True
        )

    x_host, y_host = (np.asarray(a) for a in full_xy_mat(reads_dev, meta_dev))
    x_dev, y_dev = jax.device_put(x_host), jax.device_put(y_host)
    params = np.concatenate(
        [meta[:, 6:7], meta[:, 3:4], meta[:, 7:8], meta[:, 8:9]], axis=1
    )

    def bench(name, fn, *args):
        np.asarray(jax.tree_util.tree_leaves(fn(*args))[0])  # compile
        best = 1e9
        for _ in range(trials):
            t0 = time.time()
            r = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(r)[0])
            best = min(best, time.time() - t0)
        return name, round(best * 1e3, 2)

    res = dict(
        [
            bench("noop_ms", noop, meta_dev),
            bench("take_y_ms", take_y, meta_dev),
            bench("full_y_ms", full_y, meta_dev),
            bench("pack_x_ms", pack_x, reads_dev),
            bench("full_xy_ms", full_xy, reads_dev, meta_dev),
            bench("dp_only_ms", dp_inner, x_dev, y_dev, params),
            bench("full_ms", full, words, lw, reads_dev, meta_dev),
        ]
    )
    res["n"] = n
    print(json.dumps(res))


if __name__ == "__main__":
    main()
