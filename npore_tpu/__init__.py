"""nPoRe-TPU: a TPU-native n-polymer-aware read realignment framework.

A ground-up reimplementation of the capabilities of nPoRe (TimD1/nPoRe) for
TPU hardware: the banded 5-state alignment DP runs as batched XLA/Pallas
kernels over device meshes, while BAM/FASTA/VCF/BED/pileup I/O is handled by
a native host runtime (no pysam / samtools / bedtools subprocesses).

Layout:
  io/        SAM/BAM/FASTA/VCF/BED codecs + pileup engine (host)
  model/     confusion matrices and score-matrix construction
  golden/    executable NumPy specification of the reference semantics
  ops/       device kernels: n-polymer scan, banded DP, traceback
  engine/    window building, batching, realignment orchestration
  parallel/  jax.sharding mesh utilities, multi-host data parallelism
  cli/       command-line entry points (realign, standardize-vcf, bed, ...)
"""

__version__ = "0.1.0"
