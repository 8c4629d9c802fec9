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
    # group sums via cumsum differences (np.add.reduceat is ~2x slower)
    csum = np.concatenate([[np.uint64(0)], np.cumsum(c, dtype=np.uint64)])
    ends = np.append(starts[1:], len(k))
    return k[starts], csum[ends] - csum[starts]


_CHUNK_LINES = 1 << 20  # streaming format chunk: buffer stays cache-warm


def _write_tsv_stream(out, kmers: np.ndarray, counts: np.ndarray,
                      acgt_k: int | None = None) -> None:
    """Stream `key\\tcount` lines to `out` in bounded chunks.

    One reused ~45MB buffer instead of a whole-output allocation: a 13M
    line merge previously spent more time zeroing/copying a 550MB
    buffer than formatting into it."""
    n_total = len(kmers)
    if not n_total:
        return
    from kmertools_tpu import native

    so = native.lib()
    if so is None:
        if acgt_k is not None:
            keys = codec.numeric_to_kmer_array(kmers, acgt_k)
            keys = np.char.decode(keys.astype(f"S{acgt_k}"))
        else:
            keys = np.char.mod("%d", kmers.astype(np.uint64))
        vals = np.char.mod("%d", counts.astype(np.uint64))
        out.write(
            ("\n".join(np.char.add(np.char.add(keys, "\t"), vals).tolist())
             + "\n").encode()
        )
        return
    import ctypes

    per_line = (acgt_k + 22) if acgt_k is not None else 42
    buf = ctypes.create_string_buffer(_CHUNK_LINES * per_line)
    view = memoryview(buf)
    for s in range(0, n_total, _CHUNK_LINES):
        e = min(s + _CHUNK_LINES, n_total)
        k = np.ascontiguousarray(kmers[s:e], dtype=np.uint64)
        c = np.ascontiguousarray(counts[s:e], dtype=np.uint64)
        if acgt_k is not None:
            n = so.kt_format_acgt_tsv(
                k.ctypes.data_as(native.c_u64_p),
                c.ctypes.data_as(native.c_u64_p),
                len(k), acgt_k, buf,
            )
        else:
            n = so.kt_format_u64_tsv(
                k.ctypes.data_as(native.c_u64_p),
                c.ctypes.data_as(native.c_u64_p),
                len(k), buf,
            )
        out.write(view[:n])


def _format_tsv(kmers: np.ndarray, counts: np.ndarray) -> bytes:
    """`kmer\\tcount` lines as bytes (spill files are small per part)."""
    import io as _io

    sink = _io.BytesIO()
    _write_tsv_stream(sink, kmers, counts)
    return sink.getvalue()


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


class _BatchCounter:
    """Adaptive device-batch counting: starts on the plain sorted-pairs
    wire format (minimal for low-duplication inputs); after observing
    the first batch, switches to the device-compacted format when the
    duplication ratio makes transfer-per-unique cheaper (real coverage
    >2x). Both decode to (keys u64, counts u64) of unique k-mers."""

    def __init__(self, ksize: int):
        self.ksize = ksize
        nlo = min(ksize, 16)
        self.shift = np.uint64(2 * nlo)
        self.mode = "pairs"
        self._seen_first = False

    def dispatch(self, codes):
        if self.mode == "pairs":
            return ("pairs", cops.batch_sorted_pairs(codes, self.ksize))
        return ("compact", cops.batch_count_compact(codes, self.ksize))

    def decode(self, tag, res):
        if tag == "pairs":
            sh, sl = res
            sh = np.asarray(sh)
            sl = np.asarray(sl)
            sent_hi = np.iinfo(sh.dtype).max
            valid_n = int(np.searchsorted(sh, sent_hi))
            total = valid_n
            if valid_n:
                keys = (
                    sh[:valid_n].astype(np.uint64) << self.shift
                ) | sl[:valid_n].astype(np.uint64)
                firsts = np.empty(valid_n, dtype=bool)
                firsts[0] = True
                np.not_equal(keys[1:], keys[:-1], out=firsts[1:])
                starts = np.flatnonzero(firsts)
                kk = keys[starts]
                cc = np.diff(np.append(starts, valid_n)).astype(np.uint64)
            else:
                kk = np.empty(0, np.uint64)
                cc = np.empty(0, np.uint64)
            if not self._seen_first:
                self._seen_first = True
                if total and len(kk) < total // 2:
                    self.mode = "compact"
            return kk, cc
        uh, ul, uc, n_runs = res
        n = int(n_runs)
        if n == 0:
            return np.empty(0, np.uint64), np.empty(0, np.uint64)
        kh = np.asarray(uh[:n]).astype(np.uint64)
        kl = np.asarray(ul[:n]).astype(np.uint64)
        cc = np.asarray(uc[:n]).astype(np.uint64)
        return (kh << self.shift) | kl, cc


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
        self.total_bases = 0
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
        self.total_bases = stats.total_length

    def _write_manifest(self) -> None:
        with open(os.path.join(self.out_dir, "manifest.json"), "w") as f:
            json.dump(
                {"ksize": self.ksize, "chunks": self.chunks, "n_parts": self.n_parts},
                f,
            )

    def count(self) -> None:
        from kmertools_tpu.workloads.common import run_pipelined

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
                self._write_spill(p, self.chunks, kmers[s:e], counts[s:e])
            acc_k, acc_c = [], []
            chunk_bases = 0
            self.chunks += 1

        decoder = _BatchCounter(self.ksize)

        def consume(b, tag, res) -> None:
            nonlocal chunk_bases
            kk, cc = decoder.decode(tag, res)
            if len(kk):
                acc_k.append(kk)
                acc_c.append(cc)
            pbar.update(int((b.read_idx >= 0).sum()))
            chunk_bases += int(b.lengths.sum())
            if chunk_bases > gate:
                spill()

        run_pipelined(
            iob.stream_path(
                self.in_path, overlap=self.ksize - 1, target_codes=self.target_codes
            ),
            lambda b: decoder.dispatch(jnp.asarray(b.codes)),
            consume,
        )
        spill()
        pbar.finish()
        self._write_manifest()

    def _spill_path(self, p: int, c: int) -> str:
        return os.path.join(self.out_dir, f"temp_kmers.part_{p}_chunk_{c}")

    def _write_spill(self, p: int, c: int, kmers, counts) -> None:
        """Spills keep the reference's TSV format byte-for-byte
        (temp_kmers.part_p_chunk_c, counter/src/lib.rs:151-167): the
        spill files are the durable resume point and a golden file
        (expected_counts.part_0_chunk_0) pins their format."""
        _write_tsv(self._spill_path(p, c), kmers, counts)

    def _read_spill(self, p: int, c: int, delete: bool):
        path = self._spill_path(p, c)
        k, v = _read_tsv(path)
        if delete:
            delete_file_if_exists(path)
        return k, v

    def count_and_merge(self, delete: bool = True) -> None:
        """count() + merge() with the spill round-trip elided when the
        whole run fits in one chunk (the common case below the memory
        gate). End state matches the reference CLI's count->merge(true):
        the out dir holds kmers.counts; multi-chunk runs fall back to
        the durable spill/merge path (the resume point stays intact)."""
        from kmertools_tpu.workloads.common import run_pipelined

        self.init()
        gate = 1_000_000_000.0 * self.memory_ceil_gb / 8.0
        if self.total_bases > gate:
            # above the memory gate: the durable spill/merge path
            self.count()
            self.merge(delete)
            return
        pbar = Progress(self.seq_count, "counting")
        nlo = min(self.ksize, 16)
        shift = np.uint64(2 * nlo)

        acc_k: list[np.ndarray] = []
        acc_c: list[np.ndarray] = []

        decoder = _BatchCounter(self.ksize)

        def consume(b, tag, res) -> None:
            kk, cc = decoder.decode(tag, res)
            if len(kk):
                acc_k.append(kk)
                acc_c.append(cc)
            pbar.update(int((b.read_idx >= 0).sum()))

        run_pipelined(
            iob.stream_path(
                self.in_path, overlap=self.ksize - 1, target_codes=self.target_codes
            ),
            lambda b: decoder.dispatch(jnp.asarray(b.codes)),
            consume,
        )
        pbar.finish()
        out_path = os.path.join(self.out_dir, "kmers.counts")
        with open(out_path, "wb") as out:
            if acc_k:
                kmers, counts = _aggregate(
                    np.concatenate(acc_k), np.concatenate(acc_c)
                )
                # partition-major order, matching merge()'s output
                parts = (kmers % np.uint64(max(1, self.n_parts))).astype(np.int64)
                order = np.argsort(parts, kind="stable")
                kmers, counts = kmers[order], counts[order]
                _write_tsv_stream(
                    out, kmers, counts,
                    acgt_k=self.ksize if self.acgt else None,
                )
        self.chunks = 0
        self._write_manifest()

    def merge(self, delete: bool) -> None:
        out_path = os.path.join(self.out_dir, "kmers.counts")
        pbar = Progress(self.n_parts * self.chunks, "merging")
        with open(out_path, "wb") as out:
            for p in range(self.n_parts):
                ks, cs = [], []
                for c in range(self.chunks):
                    k, v = self._read_spill(p, c, delete)
                    ks.append(k)
                    cs.append(v)
                    pbar.update()
                if not ks:
                    continue
                kmers, counts = _aggregate(np.concatenate(ks), np.concatenate(cs))
                if not len(kmers):
                    continue
                _write_tsv_stream(
                    out, kmers, counts,
                    acgt_k=self.ksize if self.acgt else None,
                )
        pbar.finish()
