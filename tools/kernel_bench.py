"""Kernel microbenchmark: general vs lane-packed stream kernels on TPU.

Measures the single-pass gather+forward+traceback kernel at the
production shapes of the adaptive narrow-band pass (band 15 by
default — BOTH the reference benchmark config -s0 and the default
-s0.66 run at min(band, 15) since round 3) and reports problems/s for
the general kernel, the 2-problems/row (SEG=64) and, when the band
fits, the 4-problems/row (SEG=32) packed variants — all bit-identical
by assertion.

Note: each timed call includes the (N, 4+SMAX/16) d2h transfer over
the deployment's ~40 MB/s tunnel, exactly like the production pipeline
sync.

Usage: KB_BAND=15 python tools/kernel_bench.py [n_problems] [trials]
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

    RPAD = 96
    NR = 4096
    reads = np.zeros((NR, RPAD), np.uint8)
    src = np.zeros(NR, np.int64)
    for i in range(NR):
        p = int(rng.integers(200, len(text) - 290))
        src[i] = p
        reads[i, :90] = text[p : p + 90]
    reads_dev = jax.device_put(reads)

    band = int(os.environ.get("KB_BAND", "15"))
    xd = 60  # x_drop stays the un-narrowed value in production
    XMAX, W = 96, 128
    YMAX = ((90 + band + 1 + 31) // 32) * 32
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

    BBLK = int(os.environ.get("KB_BBLK", "128"))
    kerns = {"general": get_stream_traceback_gather_kernel(
        BBLK, XMAX, YMAX, W, SMAX=SMAX)}
    if band <= 31:
        kerns["pack2"] = get_packed_stream_gather_kernel(
            BBLK, XMAX, YMAX, SMAX, SEG=64)
    if band <= 15 and not os.environ.get("KB_NO_PACK4"):
        kerns["pack4"] = get_packed_stream_gather_kernel(
            BBLK, XMAX, YMAX, SMAX, SEG=32)
    # A/B the in-kernel packed walk emission (bit-identical by test;
    # this is where the Mosaic lowering + the speedup get confirmed on
    # real hardware — flip the default in batch.py if it wins)
    if os.environ.get("THERMITE_WALK_PACKED", "0") in ("", "0"):
        os.environ["THERMITE_WALK_PACKED"] = "1"
        try:
            kerns["general_wp"] = get_stream_traceback_gather_kernel(
                BBLK, XMAX, YMAX, W, SMAX=SMAX)
            if band <= 31:
                kerns["pack2_wp"] = get_packed_stream_gather_kernel(
                    BBLK, XMAX, YMAX, SMAX, SEG=64)
        finally:
            os.environ["THERMITE_WALK_PACKED"] = "0"

    # production path since round 4: the split kernels return a packed
    # (N, 2) header (the only always-transferred payload — 8 B/problem)
    # with op streams left device-resident for the winners-only gather.
    # Timing syncs the header alone, exactly like the pipeline's
    # arbitrate sync.
    split_kerns = {
        "general_split": get_stream_traceback_gather_kernel(
            BBLK, XMAX, YMAX, W, SMAX=SMAX, split=True
        )
    }
    if band <= 31:
        from thermite_tpu.ops.swg_pallas_packed import (
            get_packed_stream_gather_kernel_split,
        )

        split_kerns["pack2_split"] = get_packed_stream_gather_kernel_split(
            BBLK, XMAX, YMAX, SMAX, SEG=64
        )

    outs = {}
    res = {"metric": f"stream_kernel_problems_per_s_band{band}", "n": n}
    for name, kern in split_kerns.items():
        try:
            hdr, _streams = kern(words, lw, reads_dev, meta)
            hdr = np.asarray(hdr)  # compile + sync headers only
        except Exception as e:
            res[name + "_error"] = f"{type(e).__name__}: {e}"[:200]
            continue
        from thermite_tpu.ops.swg_pallas import expand_stream_hdr

        assert (expand_stream_hdr(hdr[:n])[:, 0] > 0).mean() > 0.9, (
            f"{name}: scores look wrong"
        )
        best = 0.0
        for _ in range(trials):
            t0 = time.time()
            h, _s = kern(words, lw, reads_dev, meta)
            np.asarray(h)
            best = max(best, n / (time.time() - t0))
        res[name] = round(best, 0)
        res[name + "_gcups"] = round(best * cells / n / 1e9, 2)
    for name, kern in kerns.items():
        try:
            out = np.asarray(kern(words, lw, reads_dev, meta))  # compile
        except Exception as e:  # a _wp Mosaic reject must not lose the rest
            res[name + "_error"] = f"{type(e).__name__}: {e}"[:200]
            continue
        assert (out[:, 0] > 0).mean() > 0.9, f"{name}: scores look wrong"
        outs[name] = out
        best = 0.0
        for _ in range(trials):
            t0 = time.time()
            r = kern(words, lw, reads_dev, meta)
            np.asarray(r)  # sync
            best = max(best, n / (time.time() - t0))
        res[name] = round(best, 0)
        res[name + "_gcups"] = round(best * cells / n / 1e9, 2)
    for name, out in outs.items():
        assert (out == outs["general"]).all(), f"{name} != general on device!"
    if "pack4" in res:
        res["speedup_pack4"] = round(res["pack4"] / res["general"], 2)

    if os.environ.get("KB_DECOMP"):
        # cost decomposition: device-side checksum output (4 B d2h)
        # isolates the ~40 MB/s tunnel payload; walk=False isolates the
        # traceback walk from the DP forward pass.  problems/s here are
        # NOT comparable to production (no full d2h) — they bound the
        # raw kernel compute rate.
        import jax.numpy as jnp
        from thermite_tpu.ops.swg_pallas_packed import (
            make_packed_stream_gather_kernel,
        )

        def checksum(fn):
            import jax

            return jax.jit(
                lambda w, l, r, m: jnp.sum(
                    fn(w, l, r, m), dtype=jnp.int32
                )
            )

        variants = {
            "pack2_nod2h": checksum(
                make_packed_stream_gather_kernel(
                    BBLK, XMAX, YMAX, SMAX, SEG=64
                )[1]
            ),
            "pack2_nowalk_nod2h": checksum(
                make_packed_stream_gather_kernel(
                    BBLK, XMAX, YMAX, SMAX, walk=False, SEG=64
                )[1]
            ),
            "noop_nod2h": checksum(
                lambda w, l, r, m: m[:, :1].astype(jnp.int32)
            ),
        }
        for name, kern in variants.items():
            try:
                kern(words, lw, reads_dev, meta).block_until_ready()
            except Exception as e:
                res[name + "_error"] = f"{type(e).__name__}: {e}"[:200]
                continue
            best = 0.0
            for _ in range(trials):
                t0 = time.time()
                kern(words, lw, reads_dev, meta).block_until_ready()
                best = max(best, n / (time.time() - t0))
            res[name] = round(best, 0)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
