"""Multi-host data parallelism: read sharding and output-shard merging.

The multi-host story for an embarrassingly read-parallel workload
(SURVEY §7 M5): every host loads the same index artifact, takes a
contiguous block of the input reads (``shard_bounds``), runs the batch
pipeline on its local chips, and writes its own output shard; the
shards are then merged **in host order**, which restores the original
input read order (block sharding is order-preserving).  No inter-host
communication is needed during alignment — cross-host collectives
(psum'd stats) ride the jit'd step in ``mesh.py``.

Merging is format-aware:
* SAM: first shard verbatim; later shards with their ``@`` header
  lines stripped.
* BAM: BGZF-level — the decompressed record bytes of later shards are
  appended verbatim after the first shard's header and re-blocked
  (byte-exact records, no decode/re-encode).
* PAF: plain concatenation.
"""

from __future__ import annotations

import gzip
import struct
from typing import List, Tuple

from ..io.bam import BgzfWriter, bam_header_len


def shard_bounds(n_reads: int, n_hosts: int, host_id: int) -> Tuple[int, int]:
    """Contiguous [start, end) block of reads owned by ``host_id``."""
    base = n_reads // n_hosts
    rem = n_reads % n_hosts
    start = host_id * base + min(host_id, rem)
    end = start + base + (1 if host_id < rem else 0)
    return start, end


def _read_bam_header(f) -> Tuple[bytes, int]:
    """Read just enough of a decompressed BAM stream to cover the
    header; returns (buffer, header byte length)."""
    buf = f.read(1 << 16)
    while True:
        try:
            return buf, bam_header_len(buf)
        except struct.error:
            more = f.read(max(len(buf), 1 << 16))
            if not more:
                raise
            buf += more


def sniff_shard_format(path: str) -> str:
    """Detect a shard's format from its leading bytes: BGZF/gzip magic
    -> bam, an '@' header line -> sam, otherwise tab-separated -> paf."""
    with open(path, "rb") as f:
        head = f.read(4096)
    if head[:2] == b"\x1f\x8b":
        return "bam"
    if head[:1] == b"@":
        return "sam"
    first = head.split(b"\n", 1)[0]
    if first.count(b"\t") >= 11:  # PAF has >= 12 tab-separated fields
        return "paf"
    raise ValueError(
        f"cannot infer merge format from shard {path!r}; name the "
        "output with a .bam/.sam/.paf extension"
    )


def merge_shards(shard_paths: List[str], out_path: str, fmt: str) -> None:
    """Merge per-host output shards (in host order) into one file.

    BAM shards stream through in bounded chunks (a shard's decompressed
    bytes are never held in memory at once)."""
    if fmt == "bam":
        with open(out_path, "wb") as fh:
            w = BgzfWriter(fh)
            for i, p in enumerate(shard_paths):
                with gzip.open(p, "rb") as f:
                    try:
                        buf, off = _read_bam_header(f)
                    except (struct.error, AssertionError) as e:
                        raise ValueError(f"bad BAM shard {p!r}: {e}") from e
                    if i == 0:
                        w.write(buf[:off])
                    w.write(buf[off:])
                    while True:
                        chunk = f.read(1 << 20)
                        if not chunk:
                            break
                        w.write(chunk)
            w.finish()
        return
    if fmt == "sam":
        with open(out_path, "w") as out:
            for i, p in enumerate(shard_paths):
                with open(p) as f:
                    for line in f:
                        if i > 0 and line.startswith("@"):
                            continue
                        out.write(line)
        return
    if fmt == "paf":
        with open(out_path, "w") as out:
            for p in shard_paths:
                with open(p) as f:
                    out.write(f.read())
        return
    raise ValueError(f"unknown format {fmt!r}")
