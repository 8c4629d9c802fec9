"""Exact k-mer counting kernels (counter/src/lib.rs analog).

The reference upserts into sharded lock-free hash maps
(counter/src/lib.rs:123-132). Hash upserts don't vectorise on a TPU;
instead each batch's canonical k-mers are sorted as (hi, lo) uint32
pairs with a multi-key `lax.sort` and run-length encoded — invalid
positions carry an all-ones sentinel and sort to the tail. The host
aggregates the per-batch (kmer, count) runs into partition spills.

Also here: the vectorised binary-search join used by the coverage
workload to look per-read k-mers up in the global count table
(coverage/src/lib.rs:169-178's HashMap lookup analog).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from kmertools_tpu.ops.encode import (
    canonical_ids_pair,
    unpack_packed,
    unpack_planes,
)

# numpy scalar on purpose: a module-level jnp constant would initialise
# the XLA backend at import time, which breaks jax.distributed.initialize
# (it must run before any backend init — parallel/multihost.py)
import numpy as _np

_SENT = _np.uint32(0xFFFFFFFF)


@functools.partial(jax.jit, static_argnames=("k",))
def batch_count_runs(codes: jnp.ndarray, k: int):
    """Sort + RLE the batch's canonical k-mers.

    Returns flat arrays (N = R * P):
      sh, sl:  sorted canonical pairs (sentinels last)
      first:   bool, position starts a new run
      counts:  run length at `first` positions (garbage elsewhere)
    """
    hi, lo, _ = canonical_ids_pair(codes, k)
    fh = hi.reshape(-1)
    fl = lo.reshape(-1)
    sh, sl = lax.sort((fh, fl), num_keys=2)
    n = sh.shape[0]
    ph = jnp.concatenate([jnp.full((1,), ~_SENT, jnp.uint32), sh[:-1]])
    pl = jnp.concatenate([jnp.full((1,), ~_SENT, jnp.uint32), sl[:-1]])
    first = (sh != ph) | (sl != pl)
    # position 0 always starts a run (k-mer value 0 == AAAA.. is real)
    first = first.at[0].set(True)
    idx = jnp.arange(n, dtype=jnp.int32)
    # next run boundary after i (reverse cummin of boundary positions)
    nxt = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
    bpos = jnp.where(nxt, idx + 1, n)
    nb = lax.associative_scan(jnp.minimum, bpos, reverse=True)
    counts = nb - idx
    return sh, sl, first, counts


@functools.partial(jax.jit, static_argnames=("k",))
def batch_sorted_pairs(codes: jnp.ndarray, k: int):
    """Sorted canonical (hi, lo) pairs only — the minimal device->host
    payload for the counter. Boundary detection and run-length counting
    are a vectorised diff+reduceat on the host over the already-sorted
    arrays (they cost nothing there, and halving the transfer dominates).

    For k <= 23 the hi half holds <= 14 bits, so it travels as uint16
    (sentinel 0xFFFFFFFF truncates to 0xFFFF, still above every valid
    value) — 25% less device->host traffic.
    """
    hi, lo, _ = canonical_ids_pair(codes, k)
    sh, sl = lax.sort((hi.reshape(-1), lo.reshape(-1)), num_keys=2)
    if k <= 23:
        sh = sh.astype(jnp.uint16)
    return sh, sl


@functools.partial(jax.jit, static_argnames=("k",))
def batch_count_compact(codes: jnp.ndarray, k: int):
    """Sort + RLE + device-side compaction: run starts move to the array
    prefix via a second stable sort on the boundary flag, so the host
    fetches only ``n_runs`` (unique, counted) entries — transfer scales
    with the batch's UNIQUE k-mers, not its length. Wins when reads are
    duplicated (real coverage >1x); the counter switches to this path
    adaptively after observing the first batch's duplication ratio."""
    hi, lo, _ = canonical_ids_pair(codes, k)
    sh, sl = lax.sort((hi.reshape(-1), lo.reshape(-1)), num_keys=2)
    n = sh.shape[0]
    ph = jnp.concatenate([jnp.full((1,), ~_SENT, jnp.uint32), sh[:-1]])
    pl = jnp.concatenate([jnp.full((1,), ~_SENT, jnp.uint32), sl[:-1]])
    sent = (sh == _SENT) & (sl == _SENT)
    first = (((sh != ph) | (sl != pl)).at[0].set(True)) & ~sent
    idx = jnp.arange(n, dtype=jnp.int32)
    nxt = jnp.concatenate([first[1:] | sent[1:], jnp.ones((1,), bool)])
    bpos = jnp.where(nxt, idx + 1, n)
    nb = lax.associative_scan(jnp.minimum, bpos, reverse=True)
    counts = (nb - idx).astype(jnp.int32)
    n_runs = jnp.sum(first, dtype=jnp.int32)
    notfirst = (~first).astype(jnp.uint8)
    _, uh, ul, uc = lax.sort((notfirst, sh, sl, counts), num_keys=1)
    if k <= 23:
        uh = uh.astype(jnp.uint16)
    return uh, ul, uc, n_runs


def _run_last_sums(sh, sl, sc):
    """Run boundaries + segmented count sums over sorted (hi, lo) keys.

    Returns (keep, sums): `keep` marks the LAST position of each
    non-sentinel run; `sums` at a kept position is the run's total
    count. The segmented scan replaces a global cumsum so per-run
    totals never overflow u32 unless a single k-mer exceeds u32 — the
    same bound as the reference's `scc::HashMap<u64, u32>` values
    (counter/src/lib.rs:100)."""
    ph = jnp.concatenate([jnp.full((1,), ~_SENT, jnp.uint32), sh[:-1]])
    pl = jnp.concatenate([jnp.full((1,), ~_SENT, jnp.uint32), sl[:-1]])
    first = ((sh != ph) | (sl != pl)).at[0].set(True)

    def seg(a, b):
        fa, sa = a
        fb, sb = b
        return fa | fb, sb + jnp.where(fb, jnp.uint32(0), sa)

    _, sums = lax.associative_scan(seg, (first, sc))
    last = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
    sent = (sh == _SENT) & (sl == _SENT)
    return last & ~sent, sums


def merge_sorted_counted(ah, al, ac, bh, bl, bc):
    """Merge two (hi, lo, count) multisets into sorted unique runs
    compacted to the prefix; tail is sentinel-keyed/zero-counted.

    Returns (uh, ul, uc, n_runs) with len == len(a) + len(b). The
    building block for the device-resident accumulator: the TPU-native
    replacement for the reference's concurrent hash upsert
    (counter/src/lib.rs:123-132) is sort + segmented-RLE."""
    ch = jnp.concatenate([ah, bh])
    cl = jnp.concatenate([al, bl])
    cc = jnp.concatenate([ac, bc])
    sh, sl, sc = lax.sort((ch, cl, cc), num_keys=2)
    keep, sums = _run_last_sums(sh, sl, sc)
    n_runs = jnp.sum(keep, dtype=jnp.int32)
    notkeep = (~keep).astype(jnp.uint8)
    _, uh, ul, uc = lax.sort((notkeep, sh, sl, sums), num_keys=1)
    # mask the tail so stale duplicates can never be re-counted by a
    # later merge
    idx = jnp.arange(uh.shape[0], dtype=jnp.int32)
    live = idx < n_runs
    uh = jnp.where(live, uh, _SENT)
    ul = jnp.where(live, ul, _SENT)
    uc = jnp.where(live, uc, jnp.uint32(0))
    return uh, ul, uc, n_runs


def _steps_for(n: int) -> int:
    # search space is [0, n] — n+1 candidate answers — so a power-of-two
    # table needs bit_length(n) steps, not bit_length(n-1)
    return max(1, int(n).bit_length())


@functools.partial(
    jax.jit, static_argnames=("k",), donate_argnums=(0, 1, 2)
)
def accum_merge(ah, al, ac, codes, k):
    """Merge one batch's canonical k-mers into the device-resident
    sorted-unique accumulator (capacity C = len(ah), sentinel tail).

    Device->host transfer for the whole count phase becomes
    "accumulator prefix at spill time" — proportional to UNIQUE k-mers,
    never to occurrences (VERDICT r1 weak#5). State buffers are
    donated, so the merge is in-place from the host's point of view.

    Returns (ah', al', ac', n_runs). The host must spill + reset before
    n_runs can exceed C - batch_size (see workloads/counter.py policy);
    n_runs is exact even when it exceeds C (the host treats that as a
    hard error).

    Performance note (measured on a v5e): this program's cost is the
    lax.sort over (C + batch) elements, and XLA's TPU sort lowers to a
    compare-exchange network whose COMPILE time grows superlinearly
    with the array — a C=33.5M accumulator took >55 min of remote
    compile. A binary-search/gather merge (no sort over C) was tried
    and compiles fine but RUNS 45 s/batch: TPU gathers move ~1e8
    elem/s, and a 25-step search over C-sized queries is ~2.5e9
    gathered elements. Sort wins at bounded capacity, so the counter
    caps its batch target (workloads/counter.py:_CTR_TARGET_CODES) to
    keep C ~= 9M and this sort ~= 10M elements."""
    hi, lo, _ = canonical_ids_pair(codes, k)
    fh = hi.reshape(-1)
    fl = lo.reshape(-1)
    C = ah.shape[0]
    uh, ul, uc, n_runs = merge_sorted_counted(
        ah, al, ac, fh, fl, jnp.ones_like(fh)
    )
    return uh[:C], ul[:C], uc[:C], n_runs


@functools.partial(
    jax.jit, static_argnames=("k",), donate_argnums=(0, 1, 2)
)
def accum_merge_planes(ah, al, ac, packed, vb, k):
    """accum_merge over 2-bit-packed codes + valid-bit plane: the codes
    never travel as whole bytes — upload is ~3 bits/base and the unpack
    fuses into the same XLA program as the sort/RLE merge."""
    return accum_merge(ah, al, ac, unpack_planes(packed, vb), k)


@functools.partial(
    jax.jit, static_argnames=("k",), donate_argnums=(0, 1, 2)
)
def accum_merge_clean(ah, al, ac, packed, lengths, k):
    """accum_merge over 2-bit-packed codes + row lengths (the
    ambiguity-free fast path): exactly 2 bits/base on the wire."""
    return accum_merge(ah, al, ac, unpack_packed(packed, lengths), k)


@functools.partial(jax.jit, static_argnames=())
def lookup_counts(qh, ql, th, tl, tc):
    """Vectorised lower-bound join: per-query count from the sorted
    global table, 0 when absent. All query/table values uint32 pairs.

    The binary search runs as a `fori_loop` (NOT unrolled): unrolling
    log2(n) gather steps into the HLO made remote TPU compiles take
    tens of minutes for multi-million-entry tables."""
    n = th.shape[0]
    steps = _steps_for(n)

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) // 2
        safe = jnp.clip(mid, 0, n - 1)
        mh = jnp.take(th, safe)
        ml = jnp.take(tl, safe)
        less = (mh < qh) | ((mh == qh) & (ml < ql))
        return (
            jnp.where(less, mid + 1, lo).astype(jnp.int32),
            jnp.where(less, hi, mid).astype(jnp.int32),
        )

    # derive the initial carry from the queries so it carries the same
    # manual-sharding axes as the loop body's outputs under shard_map
    lo0 = (qh * 0).astype(jnp.int32)
    hi0 = lo0 + jnp.int32(n)
    lo, _ = jax.lax.fori_loop(0, steps, body, (lo0, hi0))
    pos = jnp.clip(lo, 0, n - 1)
    found = (lo < n) & (jnp.take(th, pos) == qh) & (jnp.take(tl, pos) == ql)
    return jnp.where(found, jnp.take(tc, pos), 0)
