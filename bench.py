"""Headline benchmark: end-to-end alignment throughput on real TPU.

Two workloads, both 90 bp reads with substitution errors on both
strands, aligned with the reference benchmark configuration
(`-k20 -s0 --intron-mode`, reference data/Makefile:39):

* **syn45** (headline): a 45 Mbp synthetic spliced chromosome standing
  in for GRCh38 chr21 (46.7 Mbp; the chr21/pbmc10k blobs are
  git-LFS-elided upstream).  The index artifact (incl. the seed
  posting table) is cached under data/out/ across runs.
* **chrM**: the real GRCh38 chrM (16.5 kb), the reference's small
  regression dataset.

Methodology (round-2 hygiene): kernel compiles happen in a warmup
batch, stats are reset, and the reported value is the **median** of
steady-state trials (the machine is a shared 1-core host with ±20%
noise; best-of-N overstates).  ``vs_baseline`` is the speedup over
this repo's own single-core CPU oracle (exact-semantics sequential
implementation, native C++ seeder) on the SAME headline workload in
the same run — the reference publishes no absolute throughput
(BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}
(extra keys carry the secondary metrics: chrM reads/s, effective
GCUPS, oracle baselines).
"""

import json
import os
import statistics
import sys
import time

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data", "out")
SYN_BP = 45_000_000


def make_reads(chrom: bytes, n: int, seed: int = 3):
    from thermite_tpu.io.fastx import revcomp

    rng = np.random.default_rng(seed)
    reads = []
    for _ in range(n):
        p = int(rng.integers(0, len(chrom) - 91))
        r = bytearray(chrom[p : p + 90])
        for _ in range(int(rng.integers(0, 4))):
            r[int(rng.integers(0, 90))] = b"ACGT"[int(rng.integers(0, 4))]
        r = bytes(r)
        if rng.random() < 0.5:
            r = revcomp(r)
        reads.append(r)
    return reads


def _oracle_rps(idx, opts, reads, passes=2):
    """Single-core oracle reads/s, best of ``passes`` (a noisy-host
    slow pass would inflate the TPU speedup; best keeps it conservative)."""
    from thermite_tpu.align.driver import OracleAligner

    oracle = OracleAligner(idx, opts)
    best = 0.0
    for _ in range(passes):
        t0 = time.time()
        for r in reads:
            oracle.align_read(r)
        best = max(best, len(reads) / (time.time() - t0))
    return best


def _cpp_rps(idx, opts, reads, passes=3):
    """All-native single-core C++ engine reads/s (align/cpu.py: seed +
    full-band scalar SWG + arbitrate + finalize + emit on one thread) —
    the honest 'thermite-equivalent single core' denominator; the
    reference is compiled Rust at opt-level 3, so the Python oracle
    flatters the TPU speedup by an order of magnitude."""
    from thermite_tpu.align.cpu import CppAligner

    try:
        cpp = CppAligner(idx, opts)
    except RuntimeError:
        return 0.0
    recs = [(b"r%d" % i, r, b"I" * len(r)) for i, r in enumerate(reads)]
    best = 0.0
    for _ in range(passes):
        t0 = time.time()
        raw = cpp.align_records(recs, False)
        best = max(best, len(recs) / (time.time() - t0))
    assert len(raw) > len(recs) * 40
    return best


def _steady_state(batch, make_trial_reads, n_trials):
    """Median steady-state reads/s over trials, spread, + effective
    GCUPS (device cells / wall) and full-band-equivalent GCUPS (cells
    the reference's full-band DP would compute for the same work)."""
    # synthesize every trial's reads up front: read generation is not
    # part of the measured pipeline, and interleaving it inflated the
    # stats clock (stage percentages looked diluted by ~30%)
    trial_reads = [make_trial_reads(t) for t in range(n_trials)]
    rps = []
    wall = 0.0
    batch.stats.reset()
    out = None
    for reads in trial_reads:
        t0 = time.time()
        out = batch.align_batch(reads)
        dt = time.time() - t0
        wall += dt
        rps.append(len(reads) / dt)
    assert out is not None and sum(1 for o in out if o) > len(out) * 0.9, (
        "mapping rate sanity"
    )
    gcups = batch.stats.dp_cells / wall / 1e9
    gcups_ref = batch.stats.dp_cells_ref / wall / 1e9
    return (
        statistics.median(rps), min(rps), max(rps), gcups, gcups_ref,
    )


def _emit_rps(batch, reads):
    """FASTQ-records -> serialized BAM record bytes via the C++
    emitter — the production CLI path (includes record encoding)."""
    if not batch.can_emit():
        return 0.0
    recs = [(b"r%d" % i, r, b"I" * len(r)) for i, r in enumerate(reads)]
    batch.align_batch_emit(recs[:2048], True)  # emit-path warmup
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        raw = batch.align_batch_emit(recs, True)
        best = max(best, len(recs) / (time.time() - t0))
    assert len(raw) > len(recs) * 50
    return best


def _paired_rps(batch, chrom, n_pairs, seed=51):
    """Paired-end emit throughput (reads/s counting both mates): FR
    pairs through align_paired_emit — C++ pairing + record emission.
    The interleaved mates share the single-end kernel shapes, so this
    costs no extra compiles."""
    from thermite_tpu.io.fastx import revcomp

    if not batch.can_emit():
        return 0.0
    rng = np.random.default_rng(seed)
    pairs = []
    for i in range(n_pairs):
        p = int(rng.integers(0, len(chrom) - 300))
        frag = chrom[p : p + 300]
        q = b"I" * 90
        pairs.append(
            (
                (b"p%d" % i, frag[:90], q),
                (b"p%d" % i, revcomp(frag[-90:]), q),
            )
        )
    batch.align_paired_emit(pairs[:1024], True)  # warmup
    best = 0.0
    for _ in range(3):
        t0 = time.time()
        raw = batch.align_paired_emit(pairs, True)
        best = max(best, 2 * len(pairs) / (time.time() - t0))
    assert len(raw) > len(pairs) * 100
    return best


def _syn45_index():
    """Build-or-load the cached 45 Mbp synthetic index (the artifact
    carries the seed table, so cached loads skip the ~40 s build)."""
    from thermite_tpu.index.build import Index
    from thermite_tpu.testing.synth import write_synth_genome

    art = os.path.join(OUT_DIR, f"bench_syn{SYN_BP // 1_000_000}.npz")
    if os.path.exists(art):
        t0 = time.time()
        idx = Index.load(art)
        print(f"syn45 index loaded in {time.time() - t0:.1f} s", file=sys.stderr)
        return idx
    os.makedirs(OUT_DIR, exist_ok=True)
    t0 = time.time()
    fasta, gtf = write_synth_genome(
        OUT_DIR, SYN_BP, seed=1234, basename=f"bench_syn{SYN_BP // 1_000_000}"
    )
    idx = Index.create_from_files(fasta, gtf)
    idx.save(art)
    print(f"syn45 index built+saved in {time.time() - t0:.1f} s", file=sys.stderr)
    return idx


def _require_backend(timeout_s: float = 300.0) -> None:
    """Fail fast (exit 3) if device init hangs: the TPU deployment's
    outage mode is an axon init that BLOCKS indefinitely rather than
    erroring (observed 2026-08-17, multi-hour) — without this guard a
    scheduled bench run would hang forever instead of reporting."""
    import threading

    done = threading.Event()
    state = {}

    def probe():
        try:
            import jax

            state["devices"] = jax.devices()
        except Exception as e:  # real init error: report, don't hang
            state["error"] = e
        done.set()

    def abort(reason: str) -> None:
        # leave an explicit record instead of an empty capture: the
        # driver stores this line as the round's bench result.  The
        # TPU-independent baselines still measure on CPU so an outage
        # round records real numbers alongside the error.
        extra = {}
        try:
            from thermite_tpu.align.driver import AlignOpts
            from thermite_tpu.index.build import Index

            opts = AlignOpts(
                min_seed_len=20, min_aln_score_percent=0.0,
                min_aln_score=30, intron_mode=True,
            )
            idx = Index.create_from_files(
                "/root/reference/data/GRCh38-2020-A-chrM.fasta",
                "/root/reference/data/GRCh38-2020-A-chrM.gtf",
            )
            chrM = idx.seq[idx.refs[0].start_idx : idx.refs[0].end_idx - 1]
            extra["chrM_cpp_1core_reads_per_s"] = round(
                _cpp_rps(idx, opts, make_reads(chrM, 4096, seed=13)), 1
            )
            extra["chrM_oracle_reads_per_s"] = round(
                _oracle_rps(idx, opts, make_reads(chrM, 192, seed=11)), 1
            )
        except Exception:
            pass  # the outage record matters more than the extras
        print(
            json.dumps(
                {
                    "metric": "e2e_align_reads_per_s_syn45Mbp_90bp",
                    "value": 0,
                    "unit": "reads/s",
                    "vs_baseline": 0,
                    "error": reason,
                    "backend_outage": True,
                    **extra,
                }
            )
        )
        os._exit(3)

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        print(
            f"bench: device backend init did not complete within "
            f"{timeout_s:.0f}s (TPU outage?); aborting",
            file=sys.stderr,
        )
        abort(f"device backend init hang > {timeout_s:.0f}s (TPU outage)")
    if "error" in state:
        print(f"bench: backend init failed: {state['error']!r}", file=sys.stderr)
        abort(f"backend init failed: {type(state['error']).__name__}")
    print(f"bench: devices {state['devices']}", file=sys.stderr)


# partial results stashed as main() progresses, so the deadline
# watchdog can report whatever was measured before a mid-run stall
_partial: dict = {}


def _deadline_watchdog(deadline_s: float) -> None:
    """Emit a diagnostic JSON line and exit if the whole bench exceeds
    ``deadline_s``.  The init-time guard (_require_backend) does not
    cover the deployment's OTHER failure mode: a degraded-service
    window where an in-flight kernel RPC stalls for tens of minutes
    mid-run (observed 2026-08-20, ~15 min windows, self-recovering) —
    without this a scheduled bench hangs past the driver's patience
    and records nothing."""
    import threading

    def fire():
        print(
            json.dumps(
                {
                    "metric": "e2e_align_reads_per_s_syn45Mbp_90bp",
                    "value": _partial.get("syn45_median", 0),
                    "unit": "reads/s",
                    "vs_baseline": 0,
                    "error": f"bench deadline {deadline_s:.0f}s exceeded "
                    "(degraded-service stall mid-run?)",
                    "backend_outage": True,
                    **{k: v for k, v in _partial.items()},
                }
            ),
            flush=True,
        )
        os._exit(4)

    t = threading.Timer(deadline_s, fire)
    t.daemon = True
    t.start()


def main():
    from thermite_tpu.align.batch import BatchAligner
    from thermite_tpu.align.driver import AlignOpts
    from thermite_tpu.cli import _enable_compile_cache
    from thermite_tpu.index.build import Index

    _enable_compile_cache()
    _require_backend()
    _deadline_watchdog(float(os.environ.get("BENCH_DEADLINE_S", "2700")))
    opts = AlignOpts(
        min_seed_len=20, min_aln_score_percent=0.0, min_aln_score=30,
        intron_mode=True,
    )
    # 49152 reads/trial ≈ 6 pipeline chunks: enough for the 3-stage
    # chunk pipeline to amortize its fill/drain tail (at 16384 = 2
    # chunks the last chunk's un-overlapped kernel+d2h was ~half of
    # every trial).  The reference benchmark workload is 500k reads
    # (data/Makefile:28) — bigger trials are *closer* to it.
    N = 49152

    # ---- headline: 45 Mbp synthetic chromosome (chr21 stand-in) ----
    syn = _syn45_index()
    syn_chrom = syn.seq[syn.refs[0].start_idx : syn.refs[0].end_idx - 1]
    syn_oracle = _oracle_rps(syn, opts, make_reads(syn_chrom, 192, seed=11))
    syn_cpp = _cpp_rps(syn, opts, make_reads(syn_chrom, 4096, seed=13))
    print(f"syn45 C++ 1-core baseline: {syn_cpp:.1f} reads/s", file=sys.stderr)
    _partial["syn45_oracle_reads_per_s"] = round(syn_oracle, 1)
    _partial["syn45_cpp_1core_reads_per_s"] = round(syn_cpp, 1)

    syn_batch = BatchAligner(syn, opts)
    syn_batch.align_batch(make_reads(syn_chrom, N, seed=12))  # compile warmup
    syn_rps, syn_lo, syn_best, syn_gcups, syn_gcups_ref = _steady_state(
        syn_batch, lambda t: make_reads(syn_chrom, N, seed=20 + t), n_trials=5
    )
    print(syn_batch.stats.report(), file=sys.stderr)
    print(f"syn45 oracle baseline: {syn_oracle:.1f} reads/s", file=sys.stderr)
    _partial["syn45_median"] = round(syn_rps, 1)
    syn_emit = _emit_rps(syn_batch, make_reads(syn_chrom, N, seed=33))
    _partial["syn45_emit_bam_reads_per_s"] = round(syn_emit, 1)
    syn_paired = _paired_rps(syn_batch, syn_chrom, N // 2)
    _partial["syn45_paired_emit_reads_per_s"] = round(syn_paired, 1)

    # ---- secondary: GRCh38 chrM ----
    idx = Index.create_from_files(
        "/root/reference/data/GRCh38-2020-A-chrM.fasta",
        "/root/reference/data/GRCh38-2020-A-chrM.gtf",
    )
    chrM = idx.seq[idx.refs[0].start_idx : idx.refs[0].end_idx - 1]
    chrM_oracle = _oracle_rps(idx, opts, make_reads(chrM, 256, seed=11))
    chrM_cpp = _cpp_rps(idx, opts, make_reads(chrM, 4096, seed=13))
    print(f"chrM C++ 1-core baseline: {chrM_cpp:.1f} reads/s", file=sys.stderr)
    batch = BatchAligner(idx, opts)
    batch.align_batch(make_reads(chrM, N, seed=12))  # compile warmup
    chrM_rps, chrM_lo, chrM_best, chrM_gcups, chrM_gcups_ref = _steady_state(
        batch, lambda t: make_reads(chrM, N, seed=20 + t), n_trials=5
    )
    print(batch.stats.report(), file=sys.stderr)
    print(f"chrM oracle baseline: {chrM_oracle:.1f} reads/s", file=sys.stderr)
    _partial["chrM_median_reads_per_s"] = round(chrM_rps, 1)
    chrM_emit = _emit_rps(batch, make_reads(chrM, N, seed=33))

    # ---- default config (-s0.66): same kernel shapes post-narrowing ----
    opts_def = AlignOpts(
        min_seed_len=20, min_aln_score_percent=0.66, min_aln_score=30,
        intron_mode=True,
    )
    bdef = BatchAligner(idx, opts_def)
    bdef.align_batch(make_reads(chrM, N, seed=12))  # warmup
    def_rps, _, _, _, _ = _steady_state(
        bdef, lambda t: make_reads(chrM, N, seed=40 + t), n_trials=3
    )

    print(
        json.dumps(
            {
                "metric": "e2e_align_reads_per_s_syn45Mbp_90bp",
                "value": round(syn_rps, 1),
                "unit": "reads/s",
                "vs_baseline": round(syn_rps / syn_oracle, 2),
                "vs_cpp_baseline": round(syn_rps / syn_cpp, 2) if syn_cpp else None,
                "trials": 5,
                "syn45_spread_reads_per_s": [round(syn_lo, 1), round(syn_best, 1)],
                "syn45_gcups_effective": round(syn_gcups, 2),
                "syn45_gcups_fullband_equiv": round(syn_gcups_ref, 2),
                "syn45_oracle_reads_per_s": round(syn_oracle, 1),
                "syn45_cpp_1core_reads_per_s": round(syn_cpp, 1),
                "syn45_emit_bam_reads_per_s": round(syn_emit, 1),
                "syn45_paired_emit_reads_per_s": round(syn_paired, 1),
                "chrM_median_reads_per_s": round(chrM_rps, 1),
                "chrM_spread_reads_per_s": [round(chrM_lo, 1), round(chrM_best, 1)],
                "chrM_gcups_effective": round(chrM_gcups, 2),
                "chrM_vs_oracle": round(chrM_rps / chrM_oracle, 2),
                "chrM_vs_cpp": round(chrM_rps / chrM_cpp, 2) if chrM_cpp else None,
                "chrM_cpp_1core_reads_per_s": round(chrM_cpp, 1),
                "chrM_emit_bam_reads_per_s": round(chrM_emit, 1),
                "chrM_default_cfg_reads_per_s": round(def_rps, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
