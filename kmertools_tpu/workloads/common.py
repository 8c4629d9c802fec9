"""Shared host-side plumbing for the streaming workloads.

The reference restores output order either with an mmap of fixed-width
slots (ktio/src/mmap.rs) or by batching and joining in order
(composition/src/oligo.rs:119-161). Here order restoration is a single
OrderedEmitter: device batches may complete out of read order (length
buckets interleave), and the emitter flushes the contiguous prefix.
"""

from __future__ import annotations

from typing import Callable

import numpy as np


class RowAggregator:
    """Aggregates per-row device outputs into per-read vectors.

    Rows of a split read arrive in order (same bucket); a read is
    complete when its `last_row` row has been seen. Completed reads are
    handed to `emit(read_idx, vector, total)`.
    """

    def __init__(self, emit: Callable[[int, np.ndarray, int], None]):
        self._emit = emit
        self._partial: dict[int, tuple[np.ndarray, int]] = {}

    def add_batch(
        self,
        read_idx: np.ndarray,
        last_row: np.ndarray,
        counts: np.ndarray,
        totals: np.ndarray,
    ) -> None:
        real = read_idx >= 0
        n = int(real.sum())
        if n == 0:
            return
        read_idx = read_idx[:n]
        last_row = last_row[:n]
        counts = counts[:n]
        totals = totals[:n]
        uniq, starts = np.unique(read_idx, return_index=True)
        grp_counts = np.add.reduceat(counts, starts, axis=0)
        grp_totals = np.add.reduceat(totals, starts)
        ends = np.append(starts[1:], n) - 1
        grp_done = last_row[ends]
        for ridx, vec, tot, done in zip(uniq, grp_counts, grp_totals, grp_done):
            ridx = int(ridx)
            if ridx in self._partial:
                pvec, ptot = self._partial.pop(ridx)
                vec = vec + pvec
                tot = tot + ptot
            if done:
                self._emit(ridx, vec, int(tot))
            else:
                self._partial[ridx] = (vec, int(tot))

    def finish(self) -> None:
        assert not self._partial, f"incomplete reads: {list(self._partial)[:5]}"


class OrderedEmitter:
    """Reorders (read_idx, payload) arrivals and flushes the contiguous
    prefix in blocks via `write(list_of_payloads)`."""

    def __init__(self, write: Callable[[list], None], block: int = 4096):
        self._write = write
        self._block = block
        self._next = 0
        self._pending: dict[int, object] = {}
        self._ready: list = []

    def add(self, read_idx: int, payload) -> None:
        self._pending[read_idx] = payload
        while self._next in self._pending:
            self._ready.append(self._pending.pop(self._next))
            self._next += 1
            if len(self._ready) >= self._block:
                self._write(self._ready)
                self._ready = []

    def finish(self) -> None:
        if self._ready:
            self._write(self._ready)
            self._ready = []
        assert not self._pending, "gap in read ordering at finish"
