"""thermite-tpu: a TPU-native spliced (transcriptome-aware) short-read
RNA aligner with the capabilities of 10XGenomics/thermite, re-designed
for JAX/XLA/Pallas on TPU hardware.

Layer map (bottom-up, mirroring the capability set in SURVEY.md §1):

* ``ops``      — banded SWG extension kernels: exact scalar oracle,
                 batched JAX ``lax.scan`` kernel, Pallas TPU kernel.
* ``seed``     — SMEM seeding: k-mer gather tables (HBM-resident on
                 device) replacing the reference's FM-index search.
* ``index``    — reference index: concatenated fwd+revcomp genome,
                 k-mer tables, transcriptome model, .tai artifact.
* ``align``    — seed→extend→arbitrate driver (oracle + batched TPU
                 pipeline).
* ``io``       — FASTA/FASTQ/GTF parsing, SAM/BAM/PAF writing.
* ``parallel`` — device mesh / sharding helpers for data-parallel
                 read alignment across chips and hosts.
"""

__version__ = "0.1.0"
