"""Nibble-packed resident-text gather: the whole-genome device layout.

``pack_text_nib_host`` + ``_gather_span_nib`` replace the round-1
4-byte-shifted-copies text (4 bytes/base in HBM) with 4-bit codes
(0.5 byte/base), keeping every device-side index int32 up to ~17 Gbp
texts.  The gather is plain XLA (runs on CPU here); these tests pin it
against a direct numpy reconstruction, including reversed windows,
word-straddling offsets, and text-edge clipping.
"""

import numpy as np
import pytest

from thermite_tpu.ops.swg_pallas import (
    _NIB_LUT,
    _WPAD,
    _gather_span_nib,
    _gather_windows_packed,
    _read_codes,
    meta_row,
    nib_lw,
    pack_text_nib_host,
)


def _ref_codes(text, base, dirp, span):
    """Numpy reference: codes of text[base + dirp*i] with zero padding
    outside [0, len)."""
    out = np.zeros(span, np.uint8)
    for i in range(span):
        p = base + dirp * i
        if 0 <= p < len(text):
            out[i] = _NIB_LUT[text[p]]
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_gather_span_nib_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    text = rng.choice(np.frombuffer(b"ACGTN$", np.uint8), 3000)
    words = pack_text_nib_host(text)
    lw = nib_lw(len(text))
    SPAN = 64

    cases = []
    for _ in range(200):
        base = int(rng.integers(0, len(text)))
        cases.append((base, 1))
        cases.append((base, -1))
    # edges: reversed window at position 0, forward at the end
    cases += [(0, -1), (2, -1), (len(text) - 1, 1), (len(text) - 3, 1)]

    N = len(cases)
    w0 = np.zeros((N, 1), np.int32)
    sub = np.zeros((N, 1), np.int32)
    dirp = np.zeros((N, 1), np.int32)
    for i, (base, d) in enumerate(cases):
        lo = base + _WPAD
        w0[i], sub[i], dirp[i] = lo >> 3, lo & 7, d
    got = np.asarray(_gather_span_nib(words, lw, w0, sub, dirp, SPAN))
    for i, (base, d) in enumerate(cases):
        want = _ref_codes(text, base, d, SPAN)
        assert (got[i] == want).all(), (i, base, d)


def test_read_codes_mapping():
    win = np.frombuffer(b"ACGTN\x00RQ$", np.uint8)[None, :]
    got = np.asarray(_read_codes(win))[0]
    # ACGTN -> 1..5, pad 0 -> 0, anything else (incl '$') -> 15: a read
    # byte outside ACGTN can never match a text code
    assert got.tolist() == [1, 2, 3, 4, 5, 0, 15, 15, 15]


def test_gather_windows_packed_pairs_with_ascii_path():
    """The full window builder produces code-mapped x and y that match
    byte-for-byte after code translation of a direct slice."""
    rng = np.random.default_rng(7)
    text = rng.choice(np.frombuffer(b"ACGT", np.uint8), 2000)
    words = pack_text_nib_host(text)
    lw = nib_lw(len(text))
    RPAD = 32
    B = 8
    reads = rng.choice(np.frombuffer(b"ACGT", np.uint8), (B, RPAD))
    XMAX, YMAX, W = 32, 64, 128
    XW = max(W, XMAX + 1)
    meta = np.zeros((2 * B, 9), np.int32)
    for i in range(B):
        p = int(rng.integers(100, len(text) - 100))
        meta[2 * i] = meta_row(p, 1, 40, i * RPAD + 4, 1, RPAD - 4, 8, 8)
        meta[2 * i + 1] = meta_row(p - 1, -1, 12, i * RPAD + 3, -1, 4, 8, 8)
    x, y = (
        np.asarray(v)
        for v in _gather_windows_packed(
            words, lw, reads, meta, XMAX, XW, YMAX, shifted_x=True
        )
    )
    flat = reads.reshape(-1)
    for r in range(2 * B):
        yw, ys, yd, yl, xb, xd, xl = meta[r, :7]
        base = 8 * int(yw) + int(ys) - _WPAD
        want_y = _ref_codes(text, base, int(yd), YMAX)
        want_y[yl:] = 0
        assert (y[r] == want_y).all(), r
        # x: shifted by one lane, code-mapped, masked beyond xlen
        want_x = np.zeros(XW, np.uint8)
        for i in range(int(xl)):
            want_x[i + 1] = _NIB_LUT[flat[int(xb) + int(xd) * i]]
        assert (x[r] == want_x).all(), r


def test_iter_text_nib_words_matches_one_shot():
    """The streaming packer (artifact text_nib member) must be
    element-exact vs pack_text_nib_host across chunk boundaries and
    ragged tails."""
    from thermite_tpu.ops.swg_pallas import (
        iter_text_nib_words,
        pack_text_nib_host,
    )

    rng = np.random.default_rng(4)
    for L in (1, 7, 8191, 100_003):
        text = rng.choice(np.frombuffer(b"ACGTN$", np.uint8), L).astype(
            np.uint8
        )
        one = pack_text_nib_host(text)
        for cw in (97, 1 << 12):
            chunks = np.concatenate(
                list(iter_text_nib_words(text, chunk_words=cw))
            )
            assert np.array_equal(chunks, one), (L, cw)


def test_prepacked_reads_match_byte_path():
    """Production read form: the host-pre-packed nibble read block
    (pack_reads_nib_host) must produce bit-identical x/y windows to the
    on-device byte path through BOTH gather front-ends, including
    reversed windows, non-ACGTN read bytes, and block-edge anchors."""
    from thermite_tpu.ops.swg_pallas import pack_reads_nib_host

    rng = np.random.default_rng(11)
    text = rng.choice(np.frombuffer(b"ACGT", np.uint8), 4000)
    words = pack_text_nib_host(text)
    lw = nib_lw(len(text))
    RPAD = 48
    B = 16
    reads = rng.choice(np.frombuffer(b"ACGTNRX", np.uint8), (B, RPAD))
    reads[3, 5:] = 0  # short read: pad bytes inside the block
    XMAX, YMAX, W = 48, 96, 128
    XW = max(W, XMAX + 1)
    meta = np.zeros((2 * B, 9), np.int32)
    for i in range(B):
        p = int(rng.integers(150, len(text) - 150))
        xl = int(rng.integers(1, RPAD))
        meta[2 * i] = meta_row(p, 1, 60, i * RPAD, 1, xl, 8, 8)
        meta[2 * i + 1] = meta_row(
            p - 1, -1, 20, i * RPAD + xl - 1, -1, xl, 8, 8
        )
    # edge: reversed x window anchored at byte 0 of the block
    meta[1] = meta_row(200, -1, 20, 0, -1, 1, 8, 8)

    nib = pack_reads_nib_host(reads.reshape(-1))
    for shifted in (True, False):
        xb, yb = (
            np.asarray(v)
            for v in _gather_windows_packed(
                words, lw, reads, meta, XMAX, XW, YMAX, shifted_x=shifted
            )
        )
        xn, yn = (
            np.asarray(v)
            for v in _gather_windows_packed(
                words, lw, nib, meta, XMAX, XW, YMAX, shifted_x=shifted
            )
        )
        assert (xn == xb).all()
        assert (yn == yb).all()
