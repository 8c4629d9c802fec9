"""Out-of-core exact k-mer counter (counter/src/lib.rs analog).

Phases, matching the reference's layout on disk:
  * count: stream batches; device sorts+RLEs each batch's canonical
    k-mers (ops.count); the host merges batch runs into the chunk
    accumulator; when the chunk's base count passes the memory gate
    (1e9 * mem_gb / 8, counter/src/lib.rs:114-116) the chunk spills to
    ``{out}/temp_kmers.part_{p}_chunk_{c}`` TSVs, partitioned by
    ``kmer % n_parts`` (lib.rs:127).
  * merge: per partition, re-aggregate all chunk spills and append to
    ``{out}/kmers.counts`` as ``kmer\\tcount`` (numeric or ACGT keys),
    optionally deleting the temps (lib.rs:172-234).

The spill files are the durable intermediates (resume point): `merge`
runs standalone over pre-existing temps given `chunks`/`n_parts`, like
the reference's merge-only tests (lib.rs:279-293). A manifest.json
records both so a resume doesn't need to re-derive them.

Output row order is sorted by k-mer (deterministic); the reference's
map-scan order is nondeterministic and its tests sort before comparing
(lib.rs:271-275).
"""

from __future__ import annotations

import json
import os

import numpy as np
import jax.numpy as jnp

from kmertools_tpu.io import batch as iob
from kmertools_tpu.io import fastx
from kmertools_tpu.ops import count as cops
from kmertools_tpu.utils import codec
from kmertools_tpu.utils.fops import delete_file_if_exists
from kmertools_tpu.utils.progress import Progress


def _aggregate(kmers: np.ndarray, counts: np.ndarray):
    """Sum counts of duplicate keys; returns sorted unique (k, c)."""
    order = np.argsort(kmers, kind="stable")
    k = kmers[order]
    c = counts[order]
    if len(k) == 0:
        return k, c
    firsts = np.empty(len(k), dtype=bool)
    firsts[0] = True
    firsts[1:] = k[1:] != k[:-1]
    starts = np.flatnonzero(firsts)
    return k[starts], np.add.reduceat(c, starts)


def _format_tsv(kmers: np.ndarray, counts: np.ndarray) -> bytes:
    """`kmer\\tcount` lines; native fast path when available."""
    if not len(kmers):
        return b""
    from kmertools_tpu import native

    so = native.lib()
    if so is not None:
        import ctypes

        k = np.ascontiguousarray(kmers, dtype=np.uint64)
        c = np.ascontiguousarray(counts, dtype=np.uint64)
        buf = ctypes.create_string_buffer(len(k) * 42)
        n = so.kt_format_u64_tsv(
            k.ctypes.data_as(native.c_u64_p),
            c.ctypes.data_as(native.c_u64_p),
            len(k), buf,
        )
        return buf.raw[:n]
    ks = np.char.mod("%d", kmers.astype(np.uint64))
    cs = np.char.mod("%d", counts.astype(np.uint64))
    return ("\n".join(np.char.add(np.char.add(ks, "\t"), cs).tolist()) + "\n").encode()


def _format_acgt_tsv(kmers: np.ndarray, counts: np.ndarray, k: int) -> bytes:
    """`ACGT...\\tcount` lines; native fast path when available."""
    if not len(kmers):
        return b""
    from kmertools_tpu import native

    so = native.lib()
    if so is not None:
        import ctypes

        ka = np.ascontiguousarray(kmers, dtype=np.uint64)
        c = np.ascontiguousarray(counts, dtype=np.uint64)
        buf = ctypes.create_string_buffer(len(ka) * (k + 22))
        n = so.kt_format_acgt_tsv(
            ka.ctypes.data_as(native.c_u64_p),
            c.ctypes.data_as(native.c_u64_p),
            len(ka), k, buf,
        )
        return buf.raw[:n]
    keys = codec.numeric_to_kmer_array(kmers, k)
    keys = np.char.decode(keys.astype(f"S{k}"))
    vals = np.char.mod("%d", counts)
    return ("\n".join(np.char.add(np.char.add(keys, "\t"), vals).tolist()) + "\n").encode()


def _write_tsv(path: str, kmers: np.ndarray, counts: np.ndarray) -> None:
    with open(path, "wb") as f:
        f.write(_format_tsv(kmers, counts))


def _read_tsv(path: str):
    with open(path, "rb") as f:
        data = f.read()
    from kmertools_tpu import native

    so = native.lib()
    if so is not None and data:
        cap = data.count(b"\n") + 2
        kmers = np.empty(cap, dtype=np.uint64)
        counts = np.empty(cap, dtype=np.uint64)
        n = so.kt_parse_u64_tsv(
            data, len(data),
            kmers.ctypes.data_as(native.c_u64_p),
            counts.ctypes.data_as(native.c_u64_p),
        )
        return kmers[:n].copy(), counts[:n].copy()
    kmers = []
    counts = []
    for line in data.splitlines():
        line = line.strip()
        if not line:
            continue
        a, b = line.split(b"\t")
        kmers.append(int(a))
        counts.append(int(b))
    return np.array(kmers, dtype=np.uint64), np.array(counts, dtype=np.uint64)


class CountComputer:
    """counter/src/lib.rs:22-249 equivalent."""

    def __init__(self, in_path: str, out_dir: str, ksize: int):
        self.in_path = in_path
        self.out_dir = out_dir
        self.ksize = ksize
        self.threads = os.cpu_count() or 1
        self.chunks = 0
        self.n_parts = 0
        self.memory_ceil_gb = 6.0
        self.seq_count = 0
        self.debug = False
        self.acgt = False
        self.target_codes = iob.DEFAULT_TARGET_CODES

    def set_threads(self, threads: int) -> None:
        if threads > 0:
            self.threads = threads

    def set_max_memory(self, memory_ceil_gb: float) -> None:
        self.memory_ceil_gb = memory_ceil_gb

    def set_acgt_output(self, acgt: bool) -> None:
        self.acgt = acgt

    def init(self) -> None:
        """Pre-pass: seq stats -> partition count (lib.rs:236-249)."""
        stats = fastx.seq_stats(self.in_path)
        data_gb = stats.total_length / float(1 << 30)
        self.n_parts = max(
            1 if self.debug else self.threads,
            int(np.ceil(8.0 * data_gb / (2.0 * self.memory_ceil_gb))),
        )
        self.seq_count = stats.seq_count

    def _write_manifest(self) -> None:
        with open(os.path.join(self.out_dir, "manifest.json"), "w") as f:
            json.dump(
                {"ksize": self.ksize, "chunks": self.chunks, "n_parts": self.n_parts},
                f,
            )

    def count(self) -> None:
        self.init()
        pbar = Progress(self.seq_count, "counting")
        gate = 1_000_000_000.0 * self.memory_ceil_gb / 8.0
        nlo = min(self.ksize, 16)
        shift = np.uint64(2 * nlo)

        self.chunks = 0
        acc_k: list[np.ndarray] = []
        acc_c: list[np.ndarray] = []
        chunk_bases = 0

        def spill() -> None:
            nonlocal acc_k, acc_c, chunk_bases
            if not acc_k:
                return
            kmers, counts = _aggregate(np.concatenate(acc_k), np.concatenate(acc_c))
            parts = (kmers % np.uint64(self.n_parts)).astype(np.int64)
            order = np.argsort(parts, kind="stable")
            kmers, counts, parts = kmers[order], counts[order], parts[order]
            bounds = np.searchsorted(parts, np.arange(self.n_parts + 1))
            for p in range(self.n_parts):
                s, e = bounds[p], bounds[p + 1]
                _write_tsv(
                    os.path.join(
                        self.out_dir, f"temp_kmers.part_{p}_chunk_{self.chunks}"
                    ),
                    kmers[s:e],
                    counts[s:e],
                )
            acc_k, acc_c = [], []
            chunk_bases = 0
            self.chunks += 1

        for b in iob.stream_path(
            self.in_path, overlap=self.ksize - 1, target_codes=self.target_codes
        ):
            sh, sl, first, counts = cops.batch_count_runs(
                jnp.asarray(b.codes), self.ksize
            )
            sh = np.asarray(sh)
            sl = np.asarray(sl)
            first = np.asarray(first)
            counts = np.asarray(counts)
            sel = np.flatnonzero(first)
            kh = sh[sel].astype(np.uint64)
            kl = sl[sel].astype(np.uint64)
            kc = counts[sel].astype(np.uint64)
            keys = (kh << shift) | kl
            sentinel = (np.uint64(0xFFFFFFFF) << shift) | np.uint64(0xFFFFFFFF)
            keep = keys != sentinel
            acc_k.append(keys[keep])
            acc_c.append(kc[keep])
            nreads = int((b.read_idx >= 0).sum())
            pbar.update(nreads)
            chunk_bases += int(b.lengths.sum())
            if chunk_bases > gate:
                spill()
        spill()
        pbar.finish()
        self._write_manifest()

    def merge(self, delete: bool) -> None:
        out_path = os.path.join(self.out_dir, "kmers.counts")
        pbar = Progress(self.n_parts * self.chunks, "merging")
        with open(out_path, "wb") as out:
            for p in range(self.n_parts):
                ks, cs = [], []
                for c in range(self.chunks):
                    path = os.path.join(self.out_dir, f"temp_kmers.part_{p}_chunk_{c}")
                    k, v = _read_tsv(path)
                    ks.append(k)
                    cs.append(v)
                    if delete:
                        delete_file_if_exists(path)
                    pbar.update()
                if not ks:
                    continue
                kmers, counts = _aggregate(np.concatenate(ks), np.concatenate(cs))
                if not len(kmers):
                    continue
                if self.acgt:
                    out.write(_format_acgt_tsv(kmers, counts, self.ksize))
                else:
                    out.write(_format_tsv(kmers, counts))
        pbar.finish()
