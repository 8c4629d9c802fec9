"""kmertools_tpu — TPU-native DNA vectorisation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`kmertools` (reference: /root/reference, a Rust CLI + PyO3 library).

Workloads (reference README.md:36-42):
  * Oligonucleotide frequency vectors  (k = 3..7)     -> workloads.oligo
  * Exact k-mer counting               (k = 10..31)   -> workloads.counter
  * Minimiser binning                                 -> workloads.minimisers
  * Chaos Game Representation (CGR) vectors           -> workloads.cgr
  * Coverage histograms                               -> workloads.coverage

Design: host I/O (io/) produces fixed-shape padded code batches; device
kernels (ops/) compute k-mer ids as static shift-add windows, per-read
histograms as one-hot factored MXU matmuls, minimisers as vectorised
sliding-window minima, CGR as a scanned linear recurrence and counting
as multi-key sort + run-length encoding; parallel/ scales the same
kernels over a `jax.sharding.Mesh` with shard_map + collectives.
"""

from kmertools_tpu.version import __version__

__all__ = ["__version__"]
