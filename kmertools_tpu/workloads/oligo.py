"""Oligonucleotide frequency vectors (composition/src/oligo.rs analog).

Per read: counts of canonical (136-dim for k=4) or raw forward-strand
(4^k-dim) k-mers, optionally normalised by the read's total k-mer count
(f64, ``/ max(1, total)``, oligo.rs:255-257), written as delimited
text, ``{:.6}`` when normalised.

TPU pipeline: host packs padded code batches (io.batch), the device
computes k-mer ids (ops.encode) and per-read histograms as MXU matmuls
(ops.histogram); normalisation happens in f64 on the host so output
bytes match the reference exactly regardless of accelerator dtype
support.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from kmertools_tpu.io import batch as iob
from kmertools_tpu.ops import encode, histogram, pallas_histogram
from kmertools_tpu.utils import codec
from kmertools_tpu.utils.fmt import emit_count_slab, emit_norm_slab
from kmertools_tpu.workloads.common import (
    ArrayAggregator,
    OrderedArrayEmitter,
    data_parallel_step,
    run_pipelined,
)


class OligoComputer:
    """File-to-file oligo vectoriser (composition/src/oligo.rs:15-259)."""

    def __init__(self, in_path: str, out_path: str, ksize: int, count_min: bool = True):
        self.in_path = in_path
        self.out_path = out_path
        self.ksize = ksize
        self.count_min = count_min
        _, self.pos_kmer, self.kcount = codec.kmer_pos_maps(ksize)
        self.norm = True
        self.delim = " "
        self.header = False
        self.threads = 0
        self.input_shard = None  # parallel.dataflow.Shard for multi-host
        self.target_codes = iob.DEFAULT_TARGET_CODES

    # builder setters mirroring oligo.rs:49-67
    def set_threads(self, threads: int) -> None:
        self.threads = threads

    def set_norm(self, norm: bool) -> None:
        self.norm = norm

    def set_delim(self, delim: str) -> None:
        self.delim = delim

    def set_max_memory(self, memory: float) -> None:
        """Reference semantics: GB of buffered sequence (oligo.rs:61-63,
        composition batch threshold oligo.rs:13). Converted to a batch
        code budget at 1 base/code; device batches cap at 2^25 codes
        (~500 MB of device intermediates; beyond that the pipeline
        already overlaps, so bigger buffers only add latency)."""
        self.target_codes = int(max(1 << 14, min(memory * (1 << 30), 1 << 25)))

    def set_header(self, header: bool) -> None:
        self.header = header

    def set_input_shard(self, shard) -> None:
        """Restrict input to one host's byte range (multi-host mode)."""
        self.input_shard = shard

    def get_header(self) -> list[str]:
        """ACGT header row (oligo.rs:69-83)."""
        if self.count_min:
            return [
                codec.numeric_to_kmer(self.pos_kmer[i], self.ksize)
                for i in range(self.kcount)
            ]
        return [codec.numeric_to_kmer(v, self.ksize) for v in range(4**self.ksize)]

    @property
    def nbins(self) -> int:
        return self.kcount if self.count_min else 4**self.ksize

    def vectorise(self) -> None:
        nbins = self.nbins
        slot_table = (
            jnp.asarray(codec.canonical_slot_table(self.ksize))
            if self.count_min
            else None
        )

        use_pallas = pallas_histogram.use_pallas()
        if use_pallas:
            # bins count raw values directly: canonical values for
            # min-mer mode, every k-mer value for raw mode — no slot
            # remap gather anywhere on the device path
            bin_values = jnp.asarray(
                codec.canonical_bin_values(self.ksize)
                if self.count_min
                else np.arange(4**self.ksize, dtype=np.int32)
            )

        def device_step(packed, vb):
            codes = encode.unpack_planes(packed, vb)
            fwd, rc, valid = encode.kmer_ids_small(codes, self.ksize)
            if use_pallas:
                ids = jnp.minimum(fwd, rc) if self.count_min else fwd
                counts, totals = pallas_histogram.per_read_histogram_tpu(
                    ids.astype(jnp.int32), valid, bin_values, nbins
                )
            elif self.count_min:
                ids = jnp.minimum(fwd, rc)
                counts, totals = histogram.per_read_histogram_gathered(
                    ids, valid, slot_table, nbins
                )
            else:
                counts, totals = histogram.per_read_histogram(fwd, valid, nbins)
            # ONE fused int16 result array [counts | total]: counts and
            # totals both fit int16 (row width <= 8192), and a single
            # device->host fetch per batch halves tunnel round-trips —
            # the dominant cost on remote-attached chips
            return jnp.concatenate(
                [counts.astype(jnp.int16),
                 totals.astype(jnp.int16)[:, None]],
                axis=1,
            )

        with open(self.out_path, "wb") as out:
            if self.header:
                out.write((self.delim.join(self.get_header()) + "\n").encode())

            if self.norm:
                def write_slab(vecs: np.ndarray, tots: np.ndarray) -> None:
                    out.write(emit_norm_slab(vecs, tots, self.delim))
            else:
                def write_slab(vecs: np.ndarray, tots: np.ndarray) -> None:
                    out.write(emit_count_slab(vecs, self.delim))

            emitter = OrderedArrayEmitter(write_slab)
            agg = ArrayAggregator(nbins)

            def consume(meta, fused) -> None:
                arr = np.asarray(fused)
                ridx, vecs, tots = agg.add_batch(
                    meta.read_idx, meta.last_row,
                    arr[:, :nbins], arr[:, nbins].astype(np.int32),
                )
                emitter.add(ridx, vecs, tots)

            # pipeline: the main thread parses/packs/uploads/dispatches;
            # the writer thread fetches results and formats/writes —
            # device compute, tunnel transfers, and disk writes all
            # overlap. Codes travel 2-bit packed + a valid-bit plane
            # (~3.6x fewer upload bytes). With >1 device the step
            # row-shards over the mesh (DP).
            sharded_step = data_parallel_step(device_step)
            run_pipelined(
                iob.stream_path(
                    self.in_path,
                    overlap=self.ksize - 1,
                    target_codes=self.target_codes,
                    shard=self.input_shard,
                ),
                lambda b: sharded_step(*iob.pack_planes(b.codes)),
                consume,
            )
            agg.finish()
            emitter.finish()
