"""Lane-packed stream kernel == general stream kernel (interpret mode).

The packed kernel serves two problems per 128-lane row (band <= 31);
its packed+unscrambled output rows must be bit-identical to the
general kernel's for the same meta rows — scores, max cells, step
counts, and the packed 2-bit op streams.
"""

import numpy as np
import pytest

from thermite_tpu.ops.swg_pallas import (
    get_stream_traceback_gather_kernel,
    meta_row,
    nib_lw,
    pack_text_nib_host,
)
from thermite_tpu.ops.swg_pallas_packed import (
    get_packed_stream_gather_kernel,
)


def _mk_problems(rng, text, reads_flat, RPAD, n, XMAX, YMAX, band_max=31):
    rows = []
    for _ in range(n):
        band = int(rng.integers(1, band_max + 1))
        xd = int(rng.integers(1, 40))
        xlen = int(rng.integers(1, XMAX + 1))
        ylen = int(rng.integers(1, YMAX + 1))
        ri = int(rng.integers(0, len(reads_flat) // RPAD))
        q = int(rng.integers(0, RPAD - 1))
        xdir = 1 if rng.random() < 0.5 else -1
        if xdir == 1:
            xlen = min(xlen, RPAD - q)
        else:
            xlen = min(xlen, q + 1)
        p = int(rng.integers(0, len(text)))
        ydir = 1 if rng.random() < 0.5 else -1
        ylen = min(ylen, len(text) - p if ydir == 1 else p + 1)
        ylen = max(ylen, 1)
        rows.append(
            meta_row(p, ydir, ylen, ri * RPAD + q, xdir, xlen, band, xd)
        )
    return np.asarray(rows, np.int32)


@pytest.mark.parametrize("seed,seg", [(0, 64), (3, 64), (0, 32), (5, 32)])
def test_packed_matches_general(seed, seg):
    rng = np.random.default_rng(seed)
    text = rng.choice(np.frombuffer(b"ACGT", np.uint8), 5000)
    words = pack_text_nib_host(text)
    lw = np.int32(nib_lw(len(text)))
    RPAD, NR = 64, 32
    reads = np.zeros((NR, RPAD), np.uint8)
    for i in range(NR):
        p = int(rng.integers(0, len(text) - RPAD))
        r = text[p : p + RPAD].copy()
        for _ in range(int(rng.integers(0, 5))):
            r[int(rng.integers(0, RPAD))] = ord("ACGT"[int(rng.integers(0, 4))])
        reads[i] = r

    BBLK = 8
    XMAX, YMAX, SMAX = 64, 96, 256
    NSEG = 128 // seg
    N = NSEG * BBLK * 2  # two blocks
    meta = _mk_problems(
        rng, text, reads.reshape(-1), RPAD, N, XMAX, YMAX,
        band_max=(seg - 2) // 2,
    )

    general = get_stream_traceback_gather_kernel(
        BBLK, XMAX, YMAX, 128, interpret=True, SMAX=SMAX
    )
    packed = get_packed_stream_gather_kernel(
        BBLK, XMAX, YMAX, SMAX, interpret=True, SEG=seg
    )
    a = np.asarray(general(words, lw, reads, meta))
    b = np.asarray(packed(words, lw, reads, meta))
    neq = np.nonzero((a != b).any(axis=1))[0]
    assert len(neq) == 0, (
        f"{len(neq)} rows differ; first row {neq[:3]}: "
        f"meta={meta[neq[0]]} general={a[neq[0], :4]} packed={b[neq[0], :4]}"
    )
    assert (a[:, 0] != 0).any()  # some nonzero scores were compared


@pytest.mark.parametrize("seg", [0, 64])  # 0 = general kernel
def test_walk_packed_bit_identity(monkeypatch, seg):
    """THERMITE_WALK_PACKED=1 (codes packed in-kernel via the pow4
    select ladder) must reproduce the default path's output rows bit
    for bit — same meta columns, same packed 2-bit streams."""
    rng = np.random.default_rng(11)
    text = rng.choice(np.frombuffer(b"ACGT", np.uint8), 5000)
    words = pack_text_nib_host(text)
    lw = np.int32(nib_lw(len(text)))
    RPAD, NR = 64, 32
    reads = np.zeros((NR, RPAD), np.uint8)
    for i in range(NR):
        p = int(rng.integers(0, len(text) - RPAD))
        r = text[p : p + RPAD].copy()
        for _ in range(int(rng.integers(0, 5))):
            r[int(rng.integers(0, RPAD))] = ord("ACGT"[int(rng.integers(0, 4))])
        reads[i] = r

    BBLK = 8
    XMAX, YMAX, SMAX = 64, 96, 256

    def run(n, make):
        meta = _mk_problems(
            rng.__class__(np.random.PCG64(7)), text, reads.reshape(-1),
            RPAD, n, XMAX, YMAX, band_max=31 if seg else 47,
        )
        return np.asarray(make()(words, lw, reads, meta)), meta

    if seg:
        NSEG = 128 // seg
        n = NSEG * BBLK * 2
        mk = lambda: get_packed_stream_gather_kernel(  # noqa: E731
            BBLK, XMAX, YMAX, SMAX, interpret=True, SEG=seg
        )
    else:
        n = BBLK * 2
        mk = lambda: get_stream_traceback_gather_kernel(  # noqa: E731
            BBLK, XMAX, YMAX, 128, interpret=True, SMAX=SMAX
        )

    monkeypatch.delenv("THERMITE_WALK_PACKED", raising=False)
    a, meta_a = run(n, mk)
    monkeypatch.setenv("THERMITE_WALK_PACKED", "1")
    b, meta_b = run(n, mk)
    assert (meta_a == meta_b).all()
    neq = np.nonzero((a != b).any(axis=1))[0]
    assert len(neq) == 0, (
        f"{len(neq)} rows differ; first {neq[:3]}: meta={meta_a[neq[0]]} "
        f"default={a[neq[0], :6]} walk_packed={b[neq[0], :6]}"
    )
    assert (a[:, 0] != 0).any() and (np.abs(a[:, 4:]) > 0).any()


@pytest.mark.parametrize("seg", [0, 64, 32])  # 0 = general kernel
def test_prepacked_reads_bit_identity(seg):
    """The production read form (host-pre-packed nibble block,
    pack_reads_nib_host) must reproduce the byte-block path's output
    rows bit for bit through both stream kernels."""
    from thermite_tpu.ops.swg_pallas import pack_reads_nib_host

    rng = np.random.default_rng(23)
    text = rng.choice(np.frombuffer(b"ACGT", np.uint8), 5000)
    words = pack_text_nib_host(text)
    lw = np.int32(nib_lw(len(text)))
    RPAD, NR = 64, 32
    reads = np.zeros((NR, RPAD), np.uint8)
    for i in range(NR):
        p = int(rng.integers(0, len(text) - RPAD))
        r = text[p : p + RPAD].copy()
        for _ in range(int(rng.integers(0, 5))):
            r[int(rng.integers(0, RPAD))] = ord("ACGT"[int(rng.integers(0, 4))])
        reads[i] = r

    BBLK = 8
    XMAX, YMAX, SMAX = 64, 96, 256
    if seg:
        NSEG = 128 // seg
        n = NSEG * BBLK * 2
        kern = get_packed_stream_gather_kernel(
            BBLK, XMAX, YMAX, SMAX, interpret=True, SEG=seg
        )
        band_max = (seg - 2) // 2
    else:
        n = BBLK * 2
        kern = get_stream_traceback_gather_kernel(
            BBLK, XMAX, YMAX, 128, interpret=True, SMAX=SMAX
        )
        band_max = 31
    meta = _mk_problems(
        rng, text, reads.reshape(-1), RPAD, n, XMAX, YMAX, band_max=band_max
    )
    a = np.asarray(kern(words, lw, reads, meta))
    nib = pack_reads_nib_host(reads.reshape(-1))
    b = np.asarray(kern(words, lw, nib, meta))
    assert (a == b).all()
    assert (a[:, 0] != 0).any()


@pytest.mark.parametrize("seg", [0, 64])  # 0 = general kernel
def test_packed_meta_bit_identity(seg):
    """The 4-col packed meta upload form must reproduce the 9-col
    form's output rows bit for bit through both stream kernels."""
    from thermite_tpu.ops.swg_pallas import pack_meta_host

    rng = np.random.default_rng(31)
    text = rng.choice(np.frombuffer(b"ACGT", np.uint8), 5000)
    words = pack_text_nib_host(text)
    lw = np.int32(nib_lw(len(text)))
    RPAD, NR = 64, 32
    reads = np.zeros((NR, RPAD), np.uint8)
    for i in range(NR):
        p = int(rng.integers(0, len(text) - RPAD))
        reads[i] = text[p : p + RPAD]

    BBLK = 8
    XMAX, YMAX, SMAX = 64, 96, 256
    if seg:
        n = (128 // seg) * BBLK * 2
        kern = get_packed_stream_gather_kernel(
            BBLK, XMAX, YMAX, SMAX, interpret=True, SEG=seg
        )
        band_max = (seg - 2) // 2
    else:
        n = BBLK * 2
        kern = get_stream_traceback_gather_kernel(
            BBLK, XMAX, YMAX, 128, interpret=True, SMAX=SMAX
        )
        band_max = 31
    meta = _mk_problems(
        rng, text, reads.reshape(-1), RPAD, n, XMAX, YMAX, band_max=band_max
    )
    a = np.asarray(kern(words, lw, reads, meta))
    b = np.asarray(kern(words, lw, reads, pack_meta_host(meta)))
    assert (a == b).all()
    assert (a[:, 0] != 0).any()
