"""Coverage histogram computer (coverage/src/lib.rs analog).

Pipeline: build the global canonical k-mer count table via the counter
(lib.rs:69-77), then per read histogram each k-mer's global abundance
into `bin_count` bins of width `bin_size`, clamped to the last bin
(``bin = min(count / bin_size, bin_count - 1)``, lib.rs:172-173),
optionally normalised (``/ max(1, total)``), written like the oligo
vectors.

TPU design: the count table is uploaded once as sorted (hi, lo, count)
arrays; each batch joins its canonical k-mers against it with the
vectorised binary search (ops.count.lookup_counts) and bins via the
MXU histogram — the HashMap-per-k-mer lookup of the reference becomes
log2(n) fused gathers.
"""

from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from kmertools_tpu.io import batch as iob
from kmertools_tpu.io import fastx
from kmertools_tpu.ops import count as cops
from kmertools_tpu.ops import encode, histogram
from kmertools_tpu.utils.fmt import format_fixed6
from kmertools_tpu.workloads.common import OrderedEmitter, RowAggregator
from kmertools_tpu.workloads.counter import CountComputer


class CovComputer:
    """coverage/src/lib.rs:14-184 equivalent."""

    def __init__(
        self,
        in_path: str,
        out_dir: str,
        ksize: int,
        bin_size: int,
        bin_count: int,
    ):
        self.in_path = in_path
        self.in_path_kmer = in_path
        self.out_dir = out_dir
        self.ksize = ksize
        self.bin_size = bin_size
        self.bin_count = bin_count
        self.threads = 0
        self.norm = True
        self.delim = " "
        self.memory_ceil_gb = 6.0
        self.target_codes = iob.DEFAULT_TARGET_CODES

    def set_threads(self, threads: int) -> None:
        self.threads = threads

    def set_norm(self, norm: bool) -> None:
        self.norm = norm

    def set_delim(self, delim: str) -> None:
        self.delim = delim

    def set_kmer_path(self, path: str) -> None:
        self.in_path_kmer = path

    def set_max_memory(self, memory_ceil_gb: float) -> None:
        self.memory_ceil_gb = memory_ceil_gb

    def build_table(self) -> None:
        ctr = CountComputer(self.in_path_kmer, self.out_dir, self.ksize)
        if self.threads:
            ctr.set_threads(self.threads)
        ctr.set_max_memory(self.memory_ceil_gb)
        ctr.target_codes = self.target_codes
        ctr.count_and_merge(True)

    def _load_table(self):
        """kmers.counts -> device-resident sorted (hi, lo, count)."""
        kmers = []
        counts = []
        with open(os.path.join(self.out_dir, "kmers.counts"), "rb") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                a, b = line.split(b"\t")
                kmers.append(int(a))
                counts.append(int(b))
        kmers = np.array(kmers, dtype=np.uint64)
        counts = np.array(counts, dtype=np.int64)
        order = np.argsort(kmers)
        kmers, counts = kmers[order], counts[order]
        nlo = min(self.ksize, 16)
        th = (kmers >> np.uint64(2 * nlo)).astype(np.uint32)
        tl = (kmers & np.uint64((1 << (2 * nlo)) - 1)).astype(np.uint32)
        tc = np.minimum(counts, np.int64(2**31 - 1)).astype(np.int32)
        return jnp.asarray(th), jnp.asarray(tl), jnp.asarray(tc)

    def compute_coverages(self) -> None:
        th, tl, tc = self._load_table()
        vec_path = os.path.join(self.out_dir, "kmers.vectors")

        with open(vec_path, "wb") as out:
            if self.norm:
                def write_block(payloads: list) -> None:
                    vecs = np.stack([p[0] for p in payloads]).astype(np.float64)
                    tots = np.array([p[1] for p in payloads], dtype=np.float64)
                    vecs /= np.maximum(1.0, tots)[:, None]
                    out.write(format_fixed6(vecs, self.delim))
            else:
                def write_block(payloads: list) -> None:
                    lines = [
                        self.delim.join(str(int(v)) for v in p[0]) + "\n"
                        for p in payloads
                    ]
                    out.write("".join(lines).encode())

            emitter = OrderedEmitter(write_block)
            agg = RowAggregator(lambda ridx, vec, tot: emitter.add(ridx, (vec, tot)))
            for b in iob.stream_path(
                self.in_path, overlap=self.ksize - 1, target_codes=self.target_codes
            ):
                counts, totals = _coverage_batch(
                    jnp.asarray(b.codes), th, tl, tc,
                    self.ksize, self.bin_size, self.bin_count,
                )
                agg.add_batch(
                    b.read_idx, b.last_row, np.asarray(counts), np.asarray(totals)
                )
            agg.finish()
            emitter.finish()


import functools
import jax


@functools.partial(jax.jit, static_argnames=("k", "bin_size", "bin_count"))
def _coverage_batch(codes, th, tl, tc, k, bin_size, bin_count):
    qh, ql, valid = encode.canonical_ids_pair(codes, k)
    cnt = cops.lookup_counts(qh, ql, th, tl, tc)
    bins = jnp.minimum(cnt // bin_size, bin_count - 1).astype(jnp.int32)
    return histogram.per_read_histogram(bins, valid, bin_count)
