"""Native (C++) seeding engine must be output-identical to the numpy
engine (and hence to the brute-force SMEM definition)."""

import numpy as np
import pytest

from thermite_tpu.seed import native
from thermite_tpu.seed.smem import SmemEngine

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _arr(seq: bytes) -> np.ndarray:
    return np.frombuffer(seq, dtype=np.uint8)


def test_matches_numpy_random():
    rng = np.random.default_rng(11)
    alpha = b"ACGTN"
    for trial in range(40):
        n = int(rng.integers(60, 400))
        text = bytes(alpha[i] for i in rng.integers(0, 5, n)) + b"$"
        L = int(rng.integers(10, 80))
        if rng.random() < 0.6:
            p = int(rng.integers(0, n - min(L, n - 1)))
            read = bytearray(text[p : p + L].replace(b"$", b"A"))
            for _ in range(int(rng.integers(0, 4))):
                read[int(rng.integers(0, len(read)))] = alpha[int(rng.integers(0, 4))]
            read = bytes(read)
        else:
            read = bytes(alpha[i] for i in rng.integers(0, 4, L))
        for k in (3, 7, 13, 20):
            got = native.NativeSmemEngine(_arr(text), k).all_smems(read)
            want = SmemEngine(_arr(text), k).all_smems(read)
            assert got == want, f"trial={trial} k={k} read={read!r}"


def test_matches_numpy_chrm():
    from thermite_tpu.index.build import Index
    from thermite_tpu.io.fastx import revcomp

    idx = Index.create_from_files(
        "/root/reference/data/GRCh38-2020-A-chrM.fasta",
        "/root/reference/data/GRCh38-2020-A-chrM.gtf",
    )
    nat = native.NativeSmemEngine(idx.seq_arr, 20)
    ref = SmemEngine(idx.seq_arr, 20)
    rng = np.random.default_rng(5)
    chrM = idx.seq[idx.refs[0].start_idx : idx.refs[0].end_idx - 1]
    for i in range(40):
        p = int(rng.integers(0, len(chrM) - 91))
        r = bytearray(chrM[p : p + 90])
        for _ in range(int(rng.integers(0, 4))):
            r[int(rng.integers(0, 90))] = b"ACGT"[int(rng.integers(0, 4))]
        r = bytes(r)
        if rng.random() < 0.5:
            r = revcomp(r)
        assert nat.all_smems(r) == ref.all_smems(r)
