"""Production pipeline under a device mesh (BatchAligner mesh mode).

The TPU parallelism story is pure data parallelism over extension
problems (the reference's concurrency contract is clone-across-threads
over an Arc'd index, reference src/wrapper.rs:20-27); these tests run
the FULL batch pipeline — build, sharded kernel, arbitrate, finalize —
over the 8-device CPU mesh and require results identical to the
single-device run, plus kernel-level parity for the sharded
stream-traceback (pallas interpret) kernel.
"""

import numpy as np
import pytest

from thermite_tpu.align.batch import BatchAligner
from thermite_tpu.align.driver import AlignOpts
from thermite_tpu.index.build import Index
from thermite_tpu.parallel.mesh import make_mesh
from thermite_tpu.testing.synth import make_truth_reads, write_synth_genome


@pytest.fixture(scope="module")
def small_index(tmp_path_factory):
    d = tmp_path_factory.mktemp("meshidx")
    fasta, gtf = write_synth_genome(str(d), 50_000, seed=3, basename="m")
    return Index.create_from_files(fasta, gtf)


def _render(alns):
    return [
        (g.ref_name, g.strand, g.aln_type, g.primary, g.gx_aln.score,
         g.gx_aln.ystart, g.gx_aln.yend, g.gx_aln.xstart, g.gx_aln.xend,
         tuple(g.gx_aln.operations))
        for g in alns
    ]


def test_batch_mesh_identical_to_single(small_index):
    opts = AlignOpts(
        min_seed_len=20, min_aln_score_percent=0.0, min_aln_score=30,
        intron_mode=True,
    )
    reads = [r[1] for r in make_truth_reads(small_index, 300, seed=8)]
    mesh = make_mesh(8)
    meshed = BatchAligner(small_index, opts, mesh=mesh).align_batch(reads)
    single = BatchAligner(small_index, opts).align_batch(reads)
    assert sum(1 for a in meshed if a) > 270
    for a, b in zip(meshed, single):
        assert _render(a) == _render(b)


def test_sharded_stream_kernel_matches_unsharded(small_index):
    """Kernel-level: the sharded production stream-traceback kernel
    (pallas, interpret mode on CPU) returns the same packed rows as the
    unsharded call."""
    from thermite_tpu.ops.swg_pallas import (
        get_stream_traceback_gather_kernel,
        meta_row,
        nib_lw,
        pack_text_nib_host,
    )
    from thermite_tpu.parallel.mesh import sharded_stream_kernel

    rng = np.random.default_rng(11)
    text = rng.choice(np.frombuffer(b"ACGT", np.uint8), 4000)
    words = pack_text_nib_host(text)
    lw = np.int32(nib_lw(len(text)))
    RPAD, B = 32, 8
    reads = np.zeros((B, RPAD), np.uint8)
    BBLK = 8
    N = BBLK * 8  # one block per device
    meta = np.zeros((N, 9), np.int32)
    for i in range(B):
        p = int(rng.integers(100, len(text) - 100))
        reads[i] = text[p : p + RPAD]
        meta[2 * i] = meta_row(p + 4, 1, 40, i * RPAD + 4, 1, RPAD - 4, 8, 8)
        meta[2 * i + 1] = meta_row(p + 3, -1, 12, i * RPAD + 3, -1, 4, 8, 8)
    for r in range(2 * B, N):
        meta[r] = (64, 0, 1, 0, 0, 1, 0, 1, 1)  # empty padding problems

    XMAX, YMAX, W = 32, 64, 128
    mesh = make_mesh(8)
    sharded = sharded_stream_kernel(
        mesh, BBLK, XMAX, YMAX, W, interpret=True, SMAX=128
    )
    plain = get_stream_traceback_gather_kernel(
        BBLK, XMAX, YMAX, W, interpret=True, SMAX=128
    )
    a = np.asarray(sharded(words, lw, reads, meta))
    b = np.asarray(plain(words, lw, reads, meta))
    assert (a == b).all()
    assert (a[: 2 * B, 0] > 0).any()  # some real scores
