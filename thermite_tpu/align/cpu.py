"""All-native single-core CPU engine: the honest baseline.

``CppAligner`` runs the ENTIRE pipeline in C++ on one thread — seeding,
chunk build, scalar banded SWG (csrc swg_stream_row, the exact mirror
of reference src/swg.rs:31-240), arbitration, finalize, and record
emission — with zero device involvement.  It exists to anchor the
"vs single-core" speedup claim fairly: the reference is compiled Rust
at opt-level 3 (/root/reference/Cargo.toml:33-41), so comparing the
TPU pipeline against the *Python* oracle would flatter it by an order
of magnitude.  Output is byte-identical to the batch/TPU emit path
(tests/test_cpu_engine.py).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .driver import AlignOpts
from ..index.build import Index


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


class CppAligner:
    PROBLEM_BUDGET = 32768 - 1024

    def __init__(self, index: Index, opts: AlignOpts):
        # reuse the batch pipeline's engine assembly (seeder, interval
        # tables, string tables) — the device side stays untouched
        from .batch import BatchAligner

        self._ba = BatchAligner(
            index, opts, backend="pallas", use_native=True
        )
        if self._ba.native is None:
            raise RuntimeError("native library unavailable for --engine cpp")
        self.native = self._ba.native
        self.index = index
        self.opts = opts
        # same adaptive narrow-band pass as the device pipeline
        # (certificate-gated, bit-identical; THERMITE_NARROW_BAND=0
        # disables) — keeps the single-core baseline algorithmically
        # honest vs the TPU path
        import os

        self.narrow_band = int(os.environ.get("THERMITE_NARROW_BAND", "15"))
        from ..utils.stats import PipelineStats

        self.stats = PipelineStats()

    def align_records(
        self, recs: List[Tuple[bytes, bytes, bytes]], fmt_bam: bool,
        strip_tags: bool = False,
    ) -> bytes:
        """(name, seq, qual) tuples -> serialized SAM/BAM record bytes
        in input order (>= 1 record per read)."""
        from ..ops.swg_pallas import _WPAD

        lib = self.native._lib
        out: List[bytes] = []
        pos = 0
        while pos < len(recs):
            take = min(len(recs) - pos, 16384)
            sl = recs[pos : pos + take]
            reads = [r[1].upper() for r in sl]
            rpad = _round_up(max((len(r) for r in reads), default=1), 32)
            maxlen = max((len(r) for r in reads), default=1)
            pw = (3 * maxlen + 20) // 16 + 1
            reads_pad = np.zeros((take, rpad), np.uint8)
            lens = np.zeros(take, np.int64)
            for i, r in enumerate(reads):
                reads_pad[i, : len(r)] = np.frombuffer(r, np.uint8)
                lens[i] = len(r)
            import ctypes

            _u8p = ctypes.POINTER(ctypes.c_uint8)
            _i64p = ctypes.POINTER(ctypes.c_int64)
            lib.thermite_chunk_align_cpu.restype = ctypes.c_void_p
            lib.thermite_chunk_align_cpu.argtypes = [
                ctypes.c_void_p, _u8p, ctypes.c_int64, ctypes.c_int64,
                _i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, _i64p, ctypes.c_int64,
            ]
            patches = ctypes.c_int64(0)
            ch = lib.thermite_chunk_align_cpu(
                self.native._h,
                reads_pad.ctypes.data_as(_u8p), take, rpad,
                lens.ctypes.data_as(_i64p), self.PROBLEM_BUDGET,
                _WPAD, pw, self.narrow_band,
                ctypes.cast(ctypes.byref(patches), _i64p), 0,
            )
            self.stats.cert_patches += patches.value
            if not ch:
                raise RuntimeError("native cpu chunk pipeline failed")
            consumed = lib.thermite_chunk_n_reads(ch)
            self.stats.reads += consumed
            self.stats.chunks += 1
            self.stats.problems += lib.thermite_chunk_n_problems(ch)
            raw = self.native.emit_chunk(
                ch, fmt_bam,
                [r[0] for r in sl[:consumed]],
                [r[1] for r in sl[:consumed]],
                [r[2] or b"" for r in sl[:consumed]],
                strip_tags=strip_tags,
            )
            self.native.free_chunk(ch)
            if raw is None:
                raise RuntimeError("native cpu emit fell back unexpectedly")
            out.append(raw)
            pos += consumed
        return b"".join(out)
