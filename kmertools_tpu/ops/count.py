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


def _steps_for(n: int) -> int:
    # search space is [0, n] — n+1 candidate answers — so a power-of-two
    # table needs bit_length(n) steps, not bit_length(n-1)
    return max(1, int(n).bit_length())


# ---------------------------------------------------------------------------
# Bitonic-merge accumulator update.
#
# The device-resident accumulator merge is the counter's hot loop, and
# neither generic device primitive fits it (measured on a v5e):
#   * lax.sort over the (capacity + batch) concatenation runs fine but
#     its TPU compile time grows superlinearly with the array — a 37M
#     merge program never finished in 55 min of remote compile and a
#     10M one exceeded 30 min;
#   * a gather-based binary-search merge compiles fast but RUNS at TPU
#     gather speed (~1e8 elem/s) — 45 s/batch.
# But the accumulator is ALREADY sorted and the batch can be sorted at
# batch size, and merging two sorted sequences needs only a bitonic
# MERGE network: log2(N) compare-exchange stages of pure reshape/
# where ops (no sort, no gather, no scatter). Duplicate keys then
# combine with one segmented scan, and the dead slots compact out with
# a monotone bit-shift routing network (log2(batch) stages of static
# shifted selects). Everything is elementwise/reshape/scan — small
# programs, a handful of HBM passes per batch.
# ---------------------------------------------------------------------------


def _merge_net_stage(swapkey, arrs, s):
    """One bitonic compare-exchange stage at stride s: within blocks of
    2s, keep key-min at i and key-max at i+s. `swapkey(lo, hi) -> bool
    per pair` compares the key tuples."""
    N = arrs[0].shape[0]

    def split(x):
        return x.reshape(N // (2 * s), 2, s)

    parts = [split(x) for x in arrs]
    los = [p[:, 0] for p in parts]
    his = [p[:, 1] for p in parts]
    swap = swapkey(los, his)
    out = []
    for lo, hi in zip(los, his):
        nlo = jnp.where(swap, hi, lo)
        nhi = jnp.where(swap, lo, hi)
        out.append(jnp.stack([nlo, nhi], axis=1).reshape(N))
    return out


def _pair_swap(los, his):
    lo_h, lo_l = los[0], los[1]
    hi_h, hi_l = his[0], his[1]
    return (lo_h > hi_h) | ((lo_h == hi_h) & (lo_l > hi_l))


def _route_left(arrs, rem, bits):
    """Compact non-dead elements to the prefix: element i moves left by
    rem[i] (its dead-predecessor count; 0 for dead elements). Monotone
    targets make bit-by-bit conditional shifts collision-free: at bit
    b, slot i pulls from i + 2^b iff that element's shift has bit b
    set. LSB-to-MSB; log2(max shift) static stages."""
    for b in range(bits):
        d = 1 << b
        bit = jnp.concatenate(
            [(rem[d:] >> b) & 1, jnp.zeros((d,), rem.dtype)]
        )
        cond = bit == 1

        def pull(x):
            shifted = jnp.concatenate([x[d:], x[:d]])  # tail junk unused
            return jnp.where(cond, shifted, x)

        arrs = [pull(x) for x in arrs]
        rem = pull(rem)
    return arrs


def merge_sorted_batch(ah, al, ac, bh, bl):
    """Merge a SORTED batch of canonical pairs (each occurrence count
    1, sentinels last) into the sorted-unique sentinel-tailed
    accumulator. Returns (oh, ol, oc, n_runs) of length >= len(a) +
    len(b) (padded up to a power of two for the network; the tail is
    sentinel/zero), compacted to the prefix. See the design note."""
    C = ah.shape[0]
    M = bh.shape[0]
    N = 1 << max(0, (C + M - 1).bit_length())
    pad = N - C - M
    if pad:
        ah = jnp.concatenate([ah, jnp.full((pad,), _SENT, jnp.uint32)])
        al = jnp.concatenate([al, jnp.full((pad,), _SENT, jnp.uint32)])
        ac = jnp.concatenate([ac, jnp.zeros((pad,), jnp.uint32)])
    # ascending ++ descending = bitonic; the merge network sorts it
    h = jnp.concatenate([ah, bh[::-1]])
    l = jnp.concatenate([al, bl[::-1]])
    c = jnp.concatenate([ac, jnp.ones((M,), jnp.uint32)])
    s = N // 2
    while s >= 1:
        h, l, c = _merge_net_stage(_pair_swap, [h, l, c], s)
        s //= 2
    # combine duplicate-key runs: run totals land on the LAST element
    keep, sums = _run_last_sums(h, l, c)
    sent = (h == _SENT) & (l == _SENT)
    dead = ~keep & ~sent
    c = jnp.where(keep, sums, jnp.uint32(0))
    n_runs = jnp.sum(keep, dtype=jnp.int32)
    # compact dead slots out (sentinels stay, sliding up to pad the
    # tail); shift = dead predecessors, rem=0 keeps dead inert
    excl_dead = jnp.cumsum(dead.astype(jnp.int32)) - dead.astype(jnp.int32)
    rem = jnp.where(dead, 0, excl_dead)
    h, l, c = _route_left([h, l, c], rem, _steps_for(M))
    total_dead = jnp.sum(dead, dtype=jnp.int32)
    # the vacated far tail holds stale copies: mask to sentinel
    idx = jnp.arange(N, dtype=jnp.int32)
    junk = idx >= (N - total_dead)
    h = jnp.where(junk, _SENT, h)
    l = jnp.where(junk, _SENT, l)
    c = jnp.where(junk, jnp.uint32(0), c)
    return h, l, c, n_runs


def merge_sorted_dispatch(ah, al, ac, sh, sl):
    """merge_sorted_batch via the Pallas merge-path kernel on real TPU
    backends (static program size — no compile cliff at large C), the
    XLA bitonic network elsewhere. Trace-time choice (env + backend),
    identical (oh, ol, oc, n_runs) semantics either way."""
    from kmertools_tpu.ops import pallas_merge

    if pallas_merge.use_pallas_merge():
        return pallas_merge.merge_sorted_pallas(ah, al, ac, sh, sl)
    return merge_sorted_batch(ah, al, ac, sh, sl)


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

    The only lax.sort here is over the BATCH (its 2-key sort); the
    capacity-sized work is the bitonic merge network + routed
    compaction (merge_sorted_batch) — see the design note above for
    why neither a capacity-sized lax.sort (pathological TPU compile)
    nor a binary-search merge (gather-speed runtime) survives contact
    with the hardware. Any (C, batch) sizes work: the Pallas kernel
    tiles arbitrary lengths and the XLA network pads to a power of two
    internally (DeviceAccumulator keeps pow2-friendly sizes on the
    network path so that padding is free)."""
    hi, lo, _ = canonical_ids_pair(codes, k)
    fh = hi.reshape(-1)
    fl = lo.reshape(-1)
    sh, sl = lax.sort((fh, fl), num_keys=2)
    C = ah.shape[0]
    uh, ul, uc, n_runs = merge_sorted_dispatch(ah, al, ac, sh, sl)
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


@functools.partial(
    jax.jit, static_argnames=("k", "bucket_bits", "steps")
)
def lookup_counts_bucketed(qh, ql, tkl, tc, boff, k, bucket_bits, steps):
    """Bucketed lower-bound join: like `lookup_counts` but the search
    starts inside the query's key-prefix bucket.

    TPU gathers run at ~1e8 scalars/s and dominate the join (measured:
    a 13M-table lookup_counts spends 24 steps x 2 scalar gathers per
    query). Two cuts: (a) `boff` — host-precomputed lower bounds of
    each `bucket_bits`-bit key prefix (the same index the native sink
    builds, workloads/coverage.py) — shrinks the search range to the
    bucket's span, so `steps` ~ log2(max bucket) instead of log2(n);
    (b) the table travels as (n, 2) uint32 rows so each probe is ONE
    2-wide row gather instead of two scalar gathers.

    `steps` is static and must satisfy steps >= bit_length(max bucket
    span) — a span of 2^s needs s+1 halvings to pin the lower bound
    (`bucket_offsets` derives exactly this from boff's gaps)."""
    n = tkl.shape[0]
    if n == 0:
        return jnp.zeros(qh.shape, jnp.int32)
    nlo = min(k, 16)
    lo_bits = 2 * nlo
    hi_bits = 2 * k - lo_bits
    if bucket_bits <= hi_bits:
        b = (qh >> (hi_bits - bucket_bits)).astype(jnp.int32)
    else:
        up = bucket_bits - hi_bits
        b = (
            (qh.astype(jnp.uint32) << up)
            | (ql >> (lo_bits - up))
        ).astype(jnp.int32)
    lo = jnp.take(boff, b).astype(jnp.int32)
    hi = jnp.take(boff, b + 1).astype(jnp.int32)

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) // 2
        safe = jnp.clip(mid, 0, n - 1)
        rows = jnp.take(tkl, safe, axis=0)
        mh = rows[..., 0]
        ml = rows[..., 1]
        less = (mh < qh) | ((mh == qh) & (ml < ql))
        return (
            jnp.where(less, mid + 1, lo).astype(jnp.int32),
            jnp.where(less, hi, mid).astype(jnp.int32),
        )

    lo, _ = jax.lax.fori_loop(0, steps, body, (lo, hi))
    pos = jnp.clip(lo, 0, n - 1)
    rows = jnp.take(tkl, pos, axis=0)
    found = (lo < n) & (rows[..., 0] == qh) & (rows[..., 1] == ql)
    return jnp.where(found, jnp.take(tc, pos), 0)


def block_table(tkeys, tcnts, k: int, S: int = 128, p_cap: int = 22):
    """Host-side build of the aligned-block join layout
    (lookup_counts_blocks). Returns (blocks3, boff, p_bits) or None
    when no prefix resolution keeps every bucket span <= S (the caller
    falls back to the binary-search join).

    Layout: the sorted table as (n_blocks + 1, S, 3) uint32 rows of
    [key_hi, key_lo, count], padded with sentinel rows (count 0), plus
    `boff` — the lower bound of every p_bits-bit key prefix. A bucket
    whose span is <= S lies entirely inside the two aligned S-blocks
    that cover [boff[b], boff[b] + S), so a query resolves with TWO
    contiguous row gathers and a vector compare instead of log2(span)
    scalar probes. Canonical k-mer keys skew low (canonical = min(fwd,
    rc)), so bucket spans vary smoothly up to ~2x the mean — p_bits is
    raised until the max span fits."""
    import numpy as np

    n = len(tkeys)
    if n == 0:
        return None
    two_k = 2 * k
    p = max(1, int(np.ceil(np.log2(max(1.0, 4.0 * n / S)))))
    # hard bound regardless of caller: boff (and the arange of bucket
    # bounds used to build it) is 2^p entries — past ~26 bits the
    # index itself dwarfs the table
    p_hi = min(two_k, p_cap, 26)
    p = min(p, p_hi)
    while True:
        bounds = np.arange((1 << p) + 1, dtype=np.uint64) << np.uint64(
            two_k - p
        )
        boff = np.searchsorted(tkeys, bounds).astype(np.uint32)
        max_gap = int(
            (boff[1:].astype(np.int64) - boff[:-1]).max()
        )
        if max_gap <= S:
            break
        if p >= p_hi:
            return None
        p += 1
    nlo = min(k, 16)
    nb = -(-n // S)
    t3 = np.empty(((nb + 1) * S, 3), dtype=np.uint32)
    t3[n:, 0] = 0xFFFFFFFF
    t3[n:, 1] = 0xFFFFFFFF
    t3[n:, 2] = 0
    t3[:n, 0] = (tkeys >> np.uint64(2 * nlo)).astype(np.uint32)
    t3[:n, 1] = (tkeys & np.uint64((1 << (2 * nlo)) - 1)).astype(np.uint32)
    t3[:n, 2] = np.asarray(tcnts, np.int64).astype(np.uint32)
    return t3.reshape(nb + 1, S, 3), boff, p


@functools.partial(
    jax.jit, static_argnames=("k", "p_bits", "S", "chunk")
)
def lookup_counts_blocks(qh, ql, blocks3, boff, k, p_bits, S, chunk=16384):
    """Aligned-block join: per-query count from the block_table layout,
    0 when absent.

    The binary-search joins are issue-bound on TPU scalar/row gathers
    (~1.5e8 row probes/s — lookup_counts_bucketed measured 12.2
    Mlookups/s at ~12 probes per query, PERF.md). Here each query
    issues THREE gathers total (its bucket's lower bound from `boff`,
    then the two aligned (S, 3) blocks covering the bucket) and the
    membership test becomes a full-width VPU compare over the gathered
    rows — the TPU-native shape for a hash-join probe. Queries process
    in fixed `chunk` slices inside a fori_loop so the gathered
    (chunk, S, 3) staging stays ~25 MB regardless of batch size (and
    the program compiles small). Replaces the HashMap lookup hot loop
    of the reference (coverage/src/lib.rs:169-178)."""
    shape = qh.shape
    qhf = qh.reshape(-1)
    qlf = ql.reshape(-1)
    Q = qhf.shape[0]
    n_chunks = max(1, -(-Q // chunk))
    Qp = n_chunks * chunk
    if Qp != Q:
        pad = Qp - Q
        qhf = jnp.concatenate([qhf, jnp.full((pad,), _SENT, jnp.uint32)])
        qlf = jnp.concatenate([qlf, jnp.full((pad,), _SENT, jnp.uint32)])
    nlo = min(k, 16)
    lo_bits = 2 * nlo
    hi_bits = 2 * k - lo_bits
    if p_bits <= hi_bits:
        b = (qhf >> (hi_bits - p_bits)).astype(jnp.int32)
    else:
        up = p_bits - hi_bits
        b = ((qhf.astype(jnp.uint32) << up) | (qlf >> (lo_bits - up))).astype(
            jnp.int32
        )
    # sentinel queries map to clipped buckets; they match only sentinel
    # pad rows, whose count is 0 — "absent" falls out for free. All
    # takes clip explicitly: jnp.take's default "fill" mode would turn
    # an out-of-range index into rows of dtype-max, i.e. a fake match
    # with count 0xFFFFFFFF
    start = jnp.take(boff, b, mode="clip")
    blk = (start // S).astype(jnp.int32)
    # derive the carry from the queries so it carries the same
    # manual-sharding axes as the loop body's outputs under shard_map
    out = (qhf * jnp.uint32(0)).astype(jnp.int32)

    def body(i, out):
        off = i * chunk
        cb = lax.dynamic_slice(blk, (off,), (chunk,))
        ch = lax.dynamic_slice(qhf, (off,), (chunk,))
        cl = lax.dynamic_slice(qlf, (off,), (chunk,))

        def hitsum(g):
            eq = (g[:, :, 0] == ch[:, None]) & (g[:, :, 1] == cl[:, None])
            return jnp.sum(
                jnp.where(eq, g[:, :, 2], jnp.uint32(0)),
                axis=1,
                dtype=jnp.uint32,
            )

        c = hitsum(jnp.take(blocks3, cb, axis=0, mode="clip")) + hitsum(
            jnp.take(blocks3, cb + 1, axis=0, mode="clip")
        )
        return lax.dynamic_update_slice(out, c.astype(jnp.int32), (off,))

    out = lax.fori_loop(0, n_chunks, body, out)
    return out[:Q].reshape(shape)


def direct_table(tkeys, tcnts, k: int, bin_size: int, bin_count: int,
                 S_cap: int = 128, p_cap: int = 24,
                 mem_cap_bytes: int | None = None):
    """Host-side build of the direct-bucket join layout
    (lookup_bins_direct): every p_bits-bit key prefix owns a private
    padded row block, indexed ARITHMETICALLY by the query's prefix —
    the join needs ONE row gather per query (the block join needs
    three: boff + two aligned blocks). Table counts are pre-binned
    (bin = min(count / bin_size, bin_count - 1), the coverage binning
    rule of coverage/src/lib.rs:172-173), so the join returns the
    abundance bin directly and absent queries fall out as bin 0
    (count 0 bins to 0).

    Bucket rows are FLAT 2D, planar within the row (chosen by key
    width + bin width):
      planes=1: (2^p, S)  = [((key_rem << bin_bits) | bin) x S] where
        key_rem is the key's low (2k - p) bits — the bucket index
        already pins the top p bits, so the slot stores only the
        REMAINDER (quotienting; exact, no fingerprint collisions).
        Requires 2k - p + bin_bits <= 32. ~6-8 B/key at big tables
        (VERDICT r4 #4: the 2-plane layout's ~18 B/key kept 100M-key
        tables out of the auto gate).
      planes=2: (2^p, 2S) = [lo x S | ((hi << bin_bits) | bin) x S]
      planes=3: (2^p, 3S) = [hi x S | lo x S | bin x S]
    Flat-2D matters on TPU: a 3D gather operand with a non-pow2 middle
    dim measured ~25x slower than the same bytes gathered as flat rows
    (scripts/probe_gather_shapes.py: (524k,56,2) 4.2 Mgather/s vs
    (524k,112) 113.9). Padding entries are all-ones keys with bin 0 —
    no canonical k-mer is all-ones (canonical = min(fwd, rc) and
    rc(all-T) = 0), so a pad's all-ones remainder can only collide
    with a real query in the all-ones-prefix bucket (impossible key),
    and even then it reads bin 0 = absent.

    Memory trades ~2x the raw table (canonical prefixes skew low, so
    max bucket span ~= 2x mean): p scans a small range and the
    min-footprint (2^p, S, planes) wins; returns None when no p keeps
    the span <= S_cap or the footprint exceeds `mem_cap_bytes` (the
    caller falls back to the block join).

    Returns (rows, p_bits, bin_bits, planes)."""
    import numpy as np

    n = len(tkeys)
    if n == 0 or bin_size <= 0 or bin_count <= 0:
        return None
    two_k = 2 * k
    nlo = min(k, 16)
    hi_bits = two_k - 2 * nlo
    bin_bits = max(1, int(bin_count - 1).bit_length())
    planes_wide = 2 if hi_bits + bin_bits <= 32 else 3

    def planes_for(p: int) -> int:
        return 1 if two_k - p + bin_bits <= 32 else planes_wide

    p_hi = min(two_k, p_cap)
    p = max(1, min(int(np.ceil(np.log2(max(1.0, n / 32.0)))), p_hi))
    best = None
    while p <= p_hi:
        bounds = np.arange((1 << p) + 1, dtype=np.uint64) << np.uint64(
            two_k - p
        )
        boff = np.searchsorted(tkeys, bounds).astype(np.int64)
        max_gap = int((boff[1:] - boff[:-1]).max())
        pl = planes_for(p)
        if max_gap <= S_cap:
            # rows must span >= 64 u32 lanes: the TPU gather rate
            # cliffs ~9x below that (measured W=56 24.6 vs W=64 217.5
            # Mgather/s on (524k, W) operands — refines the round-4b
            # flat-2D rule)
            min_S = -(-(-(-64 // pl)) // 8) * 8
            S = max(min_S, -(-max_gap // 8) * 8)
            mem = (1 << p) * S * 4 * pl
            if best is None or mem < best[2]:
                best = (p, S, mem, boff, pl)
            if max_gap <= 8 and pl == 1:
                break  # more resolution only doubles the index
        if best is not None and (1 << (p + 1)) * 8 * 4 >= best[2]:
            break  # even span-8 single-plane blocks at p+1 cost more
        p += 1
    if best is None:
        return None
    p, S, mem, boff, planes = best
    if mem_cap_bytes is not None and mem > mem_cap_bytes:
        return None
    hi = (tkeys >> np.uint64(2 * nlo)).astype(np.uint32)
    lo = (tkeys & np.uint64((1 << (2 * nlo)) - 1)).astype(np.uint32)
    bins = np.minimum(
        np.asarray(tcnts, np.int64) // bin_size, bin_count - 1
    ).astype(np.uint32)
    b = (tkeys >> np.uint64(two_k - p)).astype(np.int64)
    slot = b * (planes * S) + (np.arange(n, dtype=np.int64) - boff[b])
    rows = np.empty(((1 << p) * planes * S,), dtype=np.uint32)
    if planes == 1:
        rem_bits = two_k - p
        rem = (tkeys & np.uint64((1 << rem_bits) - 1)).astype(np.uint32)
        pad = np.uint32(
            (((1 << rem_bits) - 1) << bin_bits) & 0xFFFFFFFF
        )  # all-ones remainder, bin 0
        rows[:] = pad
        rows[slot] = (rem << np.uint32(bin_bits)) | bins
    elif planes == 2:
        rows.reshape(-1, 2, S)[:, 0, :] = 0xFFFFFFFF
        rows.reshape(-1, 2, S)[:, 1, :] = np.uint32(
            (0xFFFFFFFF << bin_bits) & 0xFFFFFFFF
        )  # pad: all-ones hi field, bin 0
        rows[slot] = lo
        rows[slot + S] = (hi << np.uint32(bin_bits)) | bins
    else:
        r3 = rows.reshape(-1, 3, S)
        r3[:, 0, :] = 0xFFFFFFFF
        r3[:, 1, :] = 0xFFFFFFFF
        r3[:, 2, :] = 0
        rows[slot] = hi
        rows[slot + S] = lo
        rows[slot + 2 * S] = bins
    return rows.reshape(1 << p, planes * S), p, bin_bits, planes


@functools.partial(
    jax.jit, static_argnames=("k", "p_bits", "bin_bits", "planes", "chunk")
)
def lookup_bins_direct(qh, ql, rows, k, p_bits, bin_bits, planes=None,
                       chunk=16384):
    """Direct-bucket join: per-query abundance BIN from the
    direct_table layout (flat planar rows, pre-binned values), 0 when
    absent. ONE flat row gather per query — the block join's measured
    ceiling was gather issue rate (~8.4e7 gathers/s, PERF.md), so
    dropping 3 gathers to 1 is the whole win; flat-2D rows keep the
    gather on the fast path (probe_gather_shapes.py). Queries process
    in fixed `chunk` slices inside a fori_loop (same staging-bound
    pattern as lookup_counts_blocks)."""
    shape = qh.shape
    qhf = qh.reshape(-1)
    qlf = ql.reshape(-1)
    Q = qhf.shape[0]
    n_chunks = max(1, -(-Q // chunk))
    Qp = n_chunks * chunk
    if Qp != Q:
        pad = Qp - Q
        qhf = jnp.concatenate([qhf, jnp.full((pad,), _SENT, jnp.uint32)])
        qlf = jnp.concatenate([qlf, jnp.full((pad,), _SENT, jnp.uint32)])
    nlo = min(k, 16)
    lo_bits = 2 * nlo
    hi_bits = 2 * k - lo_bits
    if planes is None:  # legacy callers: the pre-compact inference
        planes = 2 if hi_bits + bin_bits <= 32 else 3
    S = rows.shape[1] // planes
    if p_bits <= hi_bits:
        bu = qhf >> (hi_bits - p_bits)
    else:
        up = p_bits - hi_bits
        bu = (qhf.astype(jnp.uint32) << up) | (qlf >> (lo_bits - up))
    # sentinel queries overflow the bucket range; clip UNSIGNED to the
    # LAST bucket (the all-ones prefix): a signed cast would wrap them
    # negative and jnp.take's clip would send them to bucket 0, where
    # an all-ones REMAINDER is a legal key the quotient layout would
    # false-match. In the all-ones-prefix bucket, remainder all-ones
    # means the full key is all-ones — impossible for canonical k-mers
    # (min(fwd, rc) with rc(all-T) = 0) — so a sentinel can only hit
    # pads (bin 0); the histogram masks them via `valid` anyway.
    # mode="clip" everywhere: jnp.take's default fill would fabricate
    # dtype-max rows
    b = jnp.minimum(bu, jnp.uint32((1 << p_bits) - 1)).astype(jnp.int32)
    out = (qhf * jnp.uint32(0)).astype(jnp.int32)

    rem_bits = 2 * k - p_bits

    def body(i, out):
        off = i * chunk
        cb = lax.dynamic_slice(b, (off,), (chunk,))
        ch = lax.dynamic_slice(qhf, (off,), (chunk,))
        cl = lax.dynamic_slice(qlf, (off,), (chunk,))
        g = jnp.take(rows, cb, axis=0, mode="clip")
        if planes == 1:
            # quotient layout: the slot stores the key's low
            # (2k - p_bits) bits + the bin; the bucket pins the rest
            if rem_bits <= lo_bits:
                q_rem = cl & jnp.uint32((1 << rem_bits) - 1)
            else:
                q_rem = (
                    (ch & jnp.uint32((1 << (rem_bits - lo_bits)) - 1))
                    << lo_bits
                ) | cl
            eq = (g >> bin_bits) == q_rem[:, None]
            val = g & jnp.uint32((1 << bin_bits) - 1)
        elif planes == 2:
            eq = (g[:, :S] == cl[:, None]) & (
                (g[:, S:] >> bin_bits) == ch[:, None]
            )
            val = g[:, S:] & jnp.uint32((1 << bin_bits) - 1)
        else:
            eq = (g[:, :S] == ch[:, None]) & (g[:, S:2 * S] == cl[:, None])
            val = g[:, 2 * S:]
        c = jnp.sum(
            jnp.where(eq, val, jnp.uint32(0)), axis=1, dtype=jnp.uint32
        )
        return lax.dynamic_update_slice(out, c.astype(jnp.int32), (off,))

    out = lax.fori_loop(0, n_chunks, body, out)
    return out[:Q].reshape(shape)


def bucket_offsets(tkeys, k: int, bucket_bits: int):
    """Host-side lower bounds of each `bucket_bits`-bit key prefix over
    the sorted u64 table, plus the static step count the bucketed join
    needs. Shared with the native sink's index (kt_cov_hist_idx)."""
    import numpy as np

    bounds = np.arange((1 << bucket_bits) + 1, dtype=np.uint64) << np.uint64(
        2 * k - bucket_bits
    )
    boff = np.searchsorted(tkeys, bounds).astype(np.uint32)
    max_gap = int((boff[1:].astype(np.int64) - boff[:-1]).max()) if len(
        tkeys
    ) else 0
    # round steps up to even: fewer distinct compiles across inputs
    steps = max(4, (max(1, max_gap).bit_length() + 1) // 2 * 2)
    return boff, steps


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
