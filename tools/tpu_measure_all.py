"""One-process TPU measurement batch for a round's end-of-session pass.

The remote kernel-compile service has been taking minutes per shape
and the persistent cache has not been serving pallas executables
across processes (docs/ROUND3.md env notes), so every measurement that
shares kernel shapes must run in ONE process: each unique HLO then
compiles exactly once (the in-process compilation cache serves
repeats).  Stages, each isolated so one failure doesn't lose the rest:

  1. CLI-surface A/B: chrM reads through --engine batch / oracle / cpp
     (in-process equivalents) — SAM byte-identity is the contract.
  2. fuzz_parity (2000 mutated mixed-length reads vs the oracle).
  3. bench.py main() (headline JSON; also warms every bench shape).
  4. kernel_bench main() (raw stream-kernel problems/s).

Usage: python tools/tpu_measure_all.py [out_log]
Writes a summary JSON line per stage to stdout and everything to
``out_log`` (default data/out/tpu_measure.log).
"""

import io
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = []


def stage(name):
    def deco(fn):
        def run():
            t0 = time.time()
            try:
                out = fn()
                RESULTS.append(
                    {"stage": name, "ok": True, "s": round(time.time() - t0, 1),
                     "out": out}
                )
            except Exception as e:  # keep later stages alive
                traceback.print_exc()
                RESULTS.append(
                    {"stage": name, "ok": False, "s": round(time.time() - t0, 1),
                     "error": f"{type(e).__name__}: {e}"}
                )
            print(json.dumps(RESULTS[-1]), flush=True)
        return run
    return deco


@stage("cli_ab")
def cli_ab():
    import numpy as np

    from bench import make_reads
    from thermite_tpu.align.batch import BatchAligner
    from thermite_tpu.align.cpu import CppAligner
    from thermite_tpu.align.driver import AlignOpts, OracleAligner
    from thermite_tpu.align.batch import _serialize_records
    from thermite_tpu.index.build import Index

    idx = Index.create_from_files(
        "/root/reference/data/GRCh38-2020-A-chrM.fasta",
        "/root/reference/data/GRCh38-2020-A-chrM.gtf",
    )
    chrM = idx.seq[idx.refs[0].start_idx : idx.refs[0].end_idx - 1]
    opts = AlignOpts(
        min_seed_len=20, min_aln_score_percent=0.0, min_aln_score=30,
        intron_mode=True,
    )
    reads = make_reads(chrM, 2000, seed=41)
    recs = [(b"r%d" % i, r, b"I" * len(r)) for i, r in enumerate(reads)]

    batch = BatchAligner(idx, opts)
    raw_batch = batch.align_batch_emit(recs, False)
    oracle = OracleAligner(idx, opts)
    results = [oracle.align_read(r) for r in reads]
    raw_oracle = _serialize_records(idx, recs, results, False)
    cpp = CppAligner(idx, opts)
    raw_cpp = cpp.align_records(recs, False)
    assert raw_batch == raw_oracle, "batch vs oracle SAM bytes differ"
    assert raw_cpp == raw_oracle, "cpp vs oracle SAM bytes differ"
    return {"reads": len(reads), "identical": True}


@stage("fuzz_parity")
def fuzz():
    from tools import fuzz_parity

    old = sys.argv
    try:
        sys.argv = ["fuzz_parity.py", "2000", "7", "--long"]
        rc = fuzz_parity.main()
    finally:
        sys.argv = old
    assert not rc, f"fuzz_parity mismatches (rc={rc})"
    return {"reads": 2000, "mismatches": 0}


@stage("bench")
def bench_main():
    import bench

    # capture the one-line JSON from stdout while still printing it
    buf = io.StringIO()
    real = sys.stdout

    class Tee(io.TextIOBase):
        def write(self, s):
            buf.write(s)
            return real.write(s)

        def flush(self):
            real.flush()

    sys.stdout = Tee()
    try:
        bench.main()
    finally:
        sys.stdout = real
    line = [ln for ln in buf.getvalue().splitlines() if ln.startswith("{")]
    return json.loads(line[-1]) if line else None


@stage("kernel_bench")
def kernel():
    from tools import kernel_bench

    old = sys.argv
    os.environ["KB_NO_PACK4"] = "1"  # known no-faster; saves a remote compile
    try:
        sys.argv = ["kernel_bench.py", "16384", "6"]
        kernel_bench.main()
    finally:
        sys.argv = old
    return "see log"


def main():
    log_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "out", "tpu_measure.log",
    )

    class TeeAll(io.TextIOBase):
        def __init__(self, *sinks):
            self.sinks = sinks

        def write(self, s):
            for k in self.sinks:
                k.write(s)
            return len(s)

        def flush(self):
            for k in self.sinks:
                k.flush()

    with open(log_path, "a") as lf:
        so, se = sys.stdout, sys.stderr
        sys.stdout = TeeAll(so, lf)
        sys.stderr = TeeAll(se, lf)
        try:
            print(f"=== tpu_measure_all {time.strftime('%F %T')} ===", flush=True)
            for fn in (cli_ab, fuzz, bench_main, kernel):
                fn()
            print(json.dumps({"summary": [
                {k: v for k, v in r.items() if k != "out"} for r in RESULTS
            ]}), flush=True)
        finally:
            sys.stdout, sys.stderr = so, se
    return 0 if all(r["ok"] for r in RESULTS) else 1


if __name__ == "__main__":
    sys.exit(main())
