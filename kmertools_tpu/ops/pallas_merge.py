"""Pallas TPU kernel: streaming merge of a sorted batch into the
sorted-unique counter accumulator (merge + duplicate-combine + compact).

Why this kernel exists. The counter's per-batch accumulator update is
``merge two sorted key streams, sum duplicate counts, compact`` — the
TPU-native replacement for the reference's concurrent hash upsert
(counter/src/lib.rs:123-132). The pure-XLA implementation
(ops/count.py:merge_sorted_batch) is a bitonic merge network of
log2(C+M) full-array reshape/select stages whose TPU compile time
grows superlinearly with the array: the 16.7M-element program took
>50 min of remote compile, the 4.2M one ~20 min (PERF.md), which
capped the production batch size at KMERTOOLS_CTR_TARGET = 1<<18 and
throttled the flagship device-counting path with tiny batches
(VERDICT r3 weak#3). This kernel's program size is static in C and M:
a merge-path grid of fixed-size tiles, each processed with vector ops
on (1, 2T) registers — compile cost is O(tile), runtime is O(N) with
a handful of HBM passes.

Algorithm (merge path + sequential-grid carry):

 1. XLA precomputes, for every output-tile diagonal d = t*T, the split
    (a_t, b_t) with A[:a_t] ++ B[:b_t] = first d elements of the merge
    (vectorised binary search, log2(C) gather steps — the same
    compile-friendly fori pattern as ops/count.py:lookup_counts).
 2. Grid step t DMA-stages A[a_t : a_t+T] and B[b_t : b_t+T] into
    VMEM. Their concatenation (ascending ++ descending-reversed-B) is
    bitonic, so a log2(2T)-stage bitonic merge of circular-roll
    compare-exchanges sorts it; the first T elements are exactly
    merged[d : d+T] as a multiset (the counts attached to equal keys
    may locally permute, which run-summing erases).
 3. Runs of equal keys are combined with an in-tile segmented scan;
    runs crossing tile boundaries chain through an SMEM carry
    (key, running sum). A tile's run-boundary flags are only complete
    once the NEXT tile's first key is known, so emission runs one tile
    behind: step t compacts tile t-1's finished runs (bit-shift
    routing network, log2(T) stages) and appends them to the output at
    a carried offset. One trailing all-sentinel tile finalises the
    last real run.

Keys travel as order-preserving int32 (uint32 XOR 0x80000000): Mosaic's
vector compares are int32-native and the sentinel 0xFFFFFFFF maps to
INT32_MAX, keeping sentinel-last ordering.

Semantics are pinned equal to merge_sorted_batch by
tests/test_pallas_merge.py (interpret mode) and by the on-chip golden
byte-compares (the verify skill).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as _np

_FLIP = _np.uint32(0x80000000)
_IMAX = _np.int32(0x7FFFFFFF)


def use_pallas_merge(platform: str | None = None) -> bool:
    """The Pallas merge is the default on real TPU backends; XLA's
    bitonic network remains the fallback (KMERTOOLS_NO_PALLAS_MERGE=1
    isolates it without disabling the other Pallas kernels)."""
    from kmertools_tpu.ops.pallas_histogram import use_pallas

    if os.environ.get("KMERTOOLS_NO_PALLAS_MERGE"):
        return False
    return use_pallas(platform)


def _flip(x):
    """uint32 -> order-preserving int32."""
    return lax.bitcast_convert_type(x ^ _FLIP, jnp.int32)


def _merge_path_offsets(fah, fal, fbh, fbl, C: int, M: int, T: int, G: int):
    """Split points (a_t, b_t) for diagonals d_t = min(t*T, C+M):
    smallest a with A[a] >= B[d-a-1] (A-first ties). Vectorised binary
    search over all G boundaries; inputs are the flipped-int32 PADDED
    arrays (A[C..] and B[M..] are INT32_MAX sentinels)."""
    d = jnp.minimum(jnp.arange(G, dtype=jnp.int32) * T, C + M)
    lo0 = jnp.maximum(0, d - M)
    hi0 = jnp.minimum(d, C)
    steps = int(C + 1).bit_length() + 1

    def body(_, st):
        lo, hi = st
        a = (lo + hi) // 2
        b = d - a
        ah = jnp.take(fah, a, mode="clip")
        al = jnp.take(fal, a, mode="clip")
        bi = jnp.maximum(b - 1, 0)
        bh = jnp.take(fbh, bi, mode="clip")
        bl = jnp.take(fbl, bi, mode="clip")
        a_lt_b = (ah < bh) | ((ah == bh) & (al < bl))
        cond = (b >= 1) & a_lt_b & (lo < hi)
        nlo = jnp.where(cond, a + 1, lo)
        nhi = jnp.where(cond, hi, jnp.where(lo < hi, a, hi))
        return nlo, nhi

    lo, _ = lax.fori_loop(0, steps, body, (lo0, hi0))
    return lo, d - lo


def _make_kernel(T: int, G: int):
    """T = aligned load-window size (pow2, multiple of 256); each grid
    step produces D = T - 128 merged elements. The 128-lane slack is
    what makes the streaming legal on TPU: Mosaic requires lane-dim DMA
    offsets provably divisible by 128, so the kernel fetches ALIGNED
    T-lane windows that over-cover the exact merge-path ranges, rotates
    the <=128 lanes of misalignment back into place with static-staged
    rotates, and masks the out-of-range lanes to the sentinel. Output
    appends through a 128-lane pending buffer so every store is an
    aligned (T+128)-lane window."""
    D = T - 128
    T2 = 2 * T
    # narrow B window for small-span tiles: the bitonic merge then runs
    # at T + WB lanes instead of 2T (Batcher's generalised first stage
    # + a shared pow2 schedule; see _merge_small). Disabled for tiny
    # test tiles where WB would undershoot the 128-lane register width.
    WB = T // 4 if T >= 2048 else 0
    _imax = _IMAX

    def _rt(x, s):
        """circular right shift on the lane axis: out[i] = x[i-s]."""
        return pltpu.roll(x, s, axis=1)

    def _lt_(x, s):
        """circular left shift: out[i] = x[i+s]."""
        return pltpu.roll(x, x.shape[1] - s, axis=1)

    _DYN_ROLL = os.environ.get("KMERTOOLS_MERGE_STATIC_ROLL") != "1"

    def _rot_dyn(arrs, s, bits, left):
        """Rotate every array by a DYNAMIC amount s (< 2**bits).

        Default: Mosaic's native dynamic rotate (pltpu.roll with a
        traced shift) — one roll per array. The staged fallback
        (KMERTOOLS_MERGE_STATIC_ROLL=1) selects static rolls by s's
        bits: `bits` roll+select pairs per array. Round 4 measured the
        staged form faster when per-tile DMA waits dominated; with the
        round-5 double-buffered DMA the rotation is the op-count
        hotspot and the single dynamic roll wins."""
        if _DYN_ROLL:
            n = arrs[0].shape[1]
            # pltpu.roll shifts right: out[i] = x[i - amt]; a left
            # rotate by s is a right rotate by (n - s) mod n
            sw = jnp.asarray(s, jnp.int32)
            amt = (
                lax.rem(jnp.int32(n) - sw, jnp.int32(n)) if left
                else lax.rem(sw, jnp.int32(n))
            )
            return [pltpu.roll(x, amt, axis=1) for x in arrs]
        for b in range(bits):
            amt = 1 << b
            cond = ((s >> b) & 1) == 1
            arrs = [
                jnp.where(cond, _lt_(x, amt) if left else _rt(x, amt), x)
                for x in arrs
            ]
        return arrs

    def kernel(aoff, boff,  # scalar prefetch (G,) int32
               ah, al, ac, brh, brl,  # ANY (1, C+T) / (1, M+T+128)
               oh, ol, oc, nruns,  # ANY (1, L_out) x3, SMEM (1, 1)
               a_h, a_l, a_c, b_h, b_l,      # VMEM (1, T) staging slot 0
               a_h1, a_l1, a_c1, b_h1, b_l1,  # VMEM (1, T) staging slot 1
               m_h, m_l, m_c, cu_s,          # VMEM (1, D) current tile
               pv_h, pv_l, pv_s, pv_f,      # VMEM (1, D) prev tile
               e_h, e_l, e_c,               # VMEM (1, D) emit compaction
               pd_h, pd_l, pd_c,            # VMEM (1, 128) pending out
               carry, sems):
        t = pl.program_id(0)
        Mp = brh.shape[1] - 128  # reversed-B true length (M + T)
        slots = ((a_h, a_l, a_c, b_h, b_l, 0),
                 (a_h1, a_l1, a_c1, b_h1, b_l1, 5))

        def params(tt):
            """Merge-path window parameters of tile tt (tt may be a
            traced value; aoff/boff are prefetched scalars)."""
            a0 = aoff[tt]
            b0 = boff[tt]
            b1 = boff[jnp.minimum(tt + 1, G - 1)]
            # pure-A tile: its merge-path span consumes NO batch
            # elements, so its output is exactly A[a0 : a0+D] — with a
            # big accumulator and a small batch that is most tiles
            # (~94% at C=31M, M=2M): the whole 2T-lane bitonic network
            # plus the B window staging can be skipped
            pure = jnp.logical_and(tt + 1 < G, b1 == b0)
            a_load = pl.multiple_of((a0 // 128) * 128, 128)
            braw = Mp - b0 - D
            b_load = pl.multiple_of((braw // 128) * 128, 128)
            if WB:
                # small-B tile: the span fits the narrow window, so the
                # merge network runs at T+WB lanes instead of 2T (the
                # dominant case at production batch/accumulator ratios)
                small = jnp.logical_and(
                    jnp.logical_not(pure), (b1 - b0) + 128 <= WB
                )
                bls = jnp.minimum(
                    (jnp.maximum(Mp - b1, 0) // 128) * 128,
                    ((Mp + 128 - WB) // 128) * 128,
                )
                bls = pl.multiple_of(bls, 128)
            else:
                small = jnp.bool_(False)
                bls = jnp.int32(0)
            return a0, b0, pure, small, a_load, b_load, bls

        def in_copies(sl: int, a_load, b_load, bls):
            bufs = slots[sl]
            base = bufs[5]
            cps = [
                pltpu.make_async_copy(
                    ah.at[:, pl.ds(a_load, T)], bufs[0], sems.at[base]
                ),
                pltpu.make_async_copy(
                    al.at[:, pl.ds(a_load, T)], bufs[1], sems.at[base + 1]
                ),
                pltpu.make_async_copy(
                    ac.at[:, pl.ds(a_load, T)], bufs[2], sems.at[base + 2]
                ),
            ]
            # brh/brl hold B REVERSED: this aligned window covers
            # B[b0 : b0 + D] descending plus <=128 lanes of slack on
            # each side (large extras are harmless; small ones mask)
            bps = [
                pltpu.make_async_copy(
                    brh.at[:, pl.ds(b_load, T)], bufs[3], sems.at[base + 3]
                ),
                pltpu.make_async_copy(
                    brl.at[:, pl.ds(b_load, T)], bufs[4], sems.at[base + 4]
                ),
            ]
            # narrow-window variant (same sems: per tile exactly one of
            # bps/bps_s starts, chosen by the same deterministic
            # predicate at start and wait time)
            if WB:
                bps_s = [
                    pltpu.make_async_copy(
                        brh.at[:, pl.ds(bls, WB)],
                        bufs[3].at[:, pl.ds(0, WB)], sems.at[base + 3]
                    ),
                    pltpu.make_async_copy(
                        brl.at[:, pl.ds(bls, WB)],
                        bufs[4].at[:, pl.ds(0, WB)], sems.at[base + 4]
                    ),
                ]
            else:
                bps_s = bps
            return cps, bps, bps_s

        def start_in(tt, sl: int):
            _, _, pure, small, a_load, b_load, bls = params(tt)
            cps, bps, bps_s = in_copies(sl, a_load, b_load, bls)
            for c in cps:
                c.start()

            # pl.when TRACES both arms even under a constant predicate,
            # and Mosaic rejects the zero-width vectors a WB == 0
            # small branch would slice — gate statically
            if WB:
                @pl.when(jnp.logical_and(jnp.logical_not(pure), small))
                def _():
                    for c in bps_s:
                        c.start()

                @pl.when(
                    jnp.logical_and(
                        jnp.logical_not(pure), jnp.logical_not(small)
                    )
                )
                def _():
                    for c in bps:
                        c.start()
            else:
                @pl.when(jnp.logical_not(pure))
                def _():
                    for c in bps:
                        c.start()

        # double-buffered input staging: tile t's windows were started
        # at step t-1 (t=0 starts its own and t=1's), so the DMA
        # latency of the 94%-case 3x16KB A fetch hides behind the
        # previous tile's compute instead of serialising with it
        @pl.when(t == 0)
        def _t0():
            start_in(jnp.int32(0), 0)
            start_in(jnp.int32(1), 1)  # G >= 2 always (trailing tile)
            carry[0] = 0  # committed output entries (multiple of 128)
            carry[1] = _imax  # carried run key (impossible: sentinel)
            carry[2] = _imax
            carry[3] = 0  # carried run count
            carry[4] = 0  # pending-buffer fill (< 128)
            carry[5] = 0  # fast-path store outstanding flag

        sl_is0 = lax.rem(t, jnp.int32(2).astype(t.dtype)) == 0

        @pl.when(jnp.logical_and(t > 0, t + 1 < G))
        def _prefetch_next():
            # slot (t+1) & 1 was consumed by tile t-1; reuse it
            @pl.when(sl_is0)
            def _():
                start_in(t + 1, 1)

            @pl.when(jnp.logical_not(sl_is0))
            def _():
                start_in(t + 1, 0)

        a0, b0, pure_a, small_b, a_load, b_load, bls = params(t)
        da = a0 - a_load

        lane = lax.broadcasted_iota(jnp.int32, (1, T), 1)

        def consume(sl: int):
            """Wait tile t's windows in slot sl, rotate/mask them and
            run the merge (or the pure-A copy) into m_h/m_l/m_c. The
            body is instantiated once per slot (static buffer refs);
            only one branch executes per tile."""
            _, _, _, _, a_loadx, b_loadx, blsx = params(t)
            cps, bps, bps_s = in_copies(sl, a_loadx, b_loadx, blsx)
            for c in cps:
                c.wait()
            bufs = slots[sl]
            # A window: rotate the misalignment out, sentinel the tail
            # the rotation wrapped (ascending ++ inf stays ascending)
            wa = _rot_dyn(
                [bufs[0][:], bufs[1][:], bufs[2][:]], da, 7, left=True
            )
            a_sent = lane >= T - da
            wah = jnp.where(a_sent, _imax, wa[0])
            wal = jnp.where(a_sent, _imax, wa[1])
            wac = wa[2]

            @pl.when(pure_a)
            def _merge_fast():
                # the rotation wrap (lanes >= T - da > D) never reaches
                # the first D lanes, so the slices are the clean A span
                m_h[:] = wah[:, :D]
                m_l[:] = wal[:, :D]
                m_c[:] = wac[:, :D]

            if WB:
                @pl.when(
                    jnp.logical_and(jnp.logical_not(pure_a), small_b)
                )
                def _merge_slow_small():
                    for c in bps_s:
                        c.wait()
                    _merge_small(bufs, wah, wal, wac)

                @pl.when(
                    jnp.logical_and(
                        jnp.logical_not(pure_a), jnp.logical_not(small_b)
                    )
                )
                def _merge_slow():
                    for c in bps:
                        c.wait()
                    _merge_full(bufs, wah, wal, wac)
            else:
                @pl.when(jnp.logical_not(pure_a))
                def _merge_slow():
                    for c in bps:
                        c.wait()
                    _merge_full(bufs, wah, wal, wac)

        def _merge_small(bufs, wah, wal, wac):
            """Merge with the NARROW (WB-lane) B window, at HALF the
            full network's cost. View the input as the virtual 2T-lane
            bitonic sequence [asc-A (T) | inf x (T-WB) | inf-pad ++
            desc-B (WB)]. The standard stage s = T pairs lane i with
            i + T; every pair whose upper lane is virtual-inf keeps A
            unchanged, so only the LAST WB lanes of A exchange — with
            the B window, elementwise. The resulting LOWER half is
            bitonic (pow2 Batcher property) and <= the upper half, and
            since each grid step emits only D <= T outputs, the upper
            half (the pairwise maxima) is never needed: later tiles
            re-fetch their windows from HBM. Total: one WB-wide
            min-select + a T-wide bitonic merge — ~2x fewer
            element-stages than the 2T network."""
            b_hx, b_lx = bufs[3], bufs[4]
            thresh = (Mp - b0) - bls  # first small-extra lane
            kshift = WB - thresh
            wb = _rot_dyn(
                [b_hx[:, :WB], b_lx[:, :WB]], kshift, 12, left=False
            )
            lane_w = lax.broadcasted_iota(jnp.int32, (1, WB), 1)
            b_sent = lane_w < kshift
            wbh = jnp.where(b_sent, _imax, wb[0])
            wbl = jnp.where(b_sent, _imax, wb[1])
            wbc = jnp.ones((1, WB), jnp.int32)

            def cmp_lt(ph, pll, pc, h, l, c_):
                return (ph < h) | (
                    (ph == h) & ((pll < l) | ((pll == l) & (pc < c_)))
                )

            # virtual stage T: elementwise tuple-min of A's last WB
            # lanes vs the B window (identical tuples: either side)
            ath = wah[:, T - WB:]
            atl = wal[:, T - WB:]
            atc = wac[:, T - WB:]
            b_lt = cmp_lt(wbh, wbl, wbc, ath, atl, atc)
            h = jnp.concatenate(
                [wah[:, : T - WB], jnp.where(b_lt, wbh, ath)], axis=1
            )
            l = jnp.concatenate(
                [wal[:, : T - WB], jnp.where(b_lt, wbl, atl)], axis=1
            )
            c_ = jnp.concatenate(
                [wac[:, : T - WB], jnp.where(b_lt, wbc, atc)], axis=1
            )

            iota1 = lax.broadcasted_iota(jnp.int32, (1, T), 1)
            s = T // 2
            while s >= 1:
                m = (iota1 & s) == 0
                ph = jnp.where(m, _lt_(h, s), _rt(h, s))
                pll = jnp.where(m, _lt_(l, s), _rt(l, s))
                pc = jnp.where(m, _lt_(c_, s), _rt(c_, s))
                p_lt = cmp_lt(ph, pll, pc, h, l, c_)
                take = m == p_lt
                h = jnp.where(take, ph, h)
                l = jnp.where(take, pll, l)
                c_ = jnp.where(take, pc, c_)
                s //= 2
            m_h[:] = h[:, :D]
            m_l[:] = l[:, :D]
            m_c[:] = c_[:, :D]

        def _merge_full(bufs, wah, wal, wac):
            b_hx, b_lx = bufs[3], bufs[4]
            # B window: the tail lanes fell before b0 (SMALLER than the
            # tile — they must not enter); rotate them to the front and
            # sentinel them: [inf.. , descending] keeps the
            # concatenation single-peak bitonic.
            thresh = (Mp - b0) - b_load  # first small-extra lane
            kshift = T - thresh
            wb = _rot_dyn(
                [b_hx[:], b_lx[:]],
                kshift, 8, left=False,
            )
            b_sent = lane < kshift
            wbh = jnp.where(b_sent, _imax, wb[0])
            wbl = jnp.where(b_sent, _imax, wb[1])
            # B counts are the unit batch counts; sentinel lanes keep
            # count 1 (their imax keys never emit)
            wbc = jnp.ones((1, T), jnp.int32)

            h = jnp.concatenate([wah, wbh], axis=1)
            l = jnp.concatenate([wal, wbl], axis=1)
            c_ = jnp.concatenate([wac, wbc], axis=1)
            iota2 = lax.broadcasted_iota(jnp.int32, (1, T2), 1)
            s = T
            while s >= 1:
                m = (iota2 & s) == 0  # lower lane of each exchange pair
                ph = jnp.where(m, _lt_(h, s), _rt(h, s))
                pll = jnp.where(m, _lt_(l, s), _rt(l, s))
                pc = jnp.where(m, _lt_(c_, s), _rt(c_, s))
                # Compare the FULL (h, l, count) tuple: any two lanes
                # are either bitwise-identical (the exchange is then a
                # harmless self-assignment) or totally ordered, so the
                # XNOR exchange below is well defined WITHOUT a rank
                # plane. Tie order among equal keys is arbitrary but
                # run-summing erases it, and the tile's first-D
                # selection only depends on the sorted multiset — a
                # quarter of the network's rolls/selects deleted
                # (round 5; the rank plane's "global tie order" was
                # never load-bearing).
                p_lt = (ph < h) | (
                    (ph == h) & ((pll < l) | ((pll == l) & (pc < c_)))
                )
                # the upper lane takes the partner exactly when the
                # lower doesn't — take = XNOR(m, p_lt). Written as ==
                # because a bool-VALUED select lowers to an i8 vector
                # select + i8->i1 truncation, which Mosaic rejects
                take = m == p_lt
                h = jnp.where(take, ph, h)
                l = jnp.where(take, pll, l)
                c_ = jnp.where(take, pc, c_)
                s //= 2
            m_h[:] = h[:, :D]
            m_l[:] = l[:, :D]
            m_c[:] = c_[:, :D]

        # consume tile t from its slot (one branch executes; the body
        # is instantiated per slot so every buffer ref stays static)
        @pl.when(sl_is0)
        def _consume0():
            consume(0)

        @pl.when(jnp.logical_not(sl_is0))
        def _consume1():
            consume(1)

        h = m_h[:]
        l = m_l[:]
        c_ = m_c[:]

        ti = lax.broadcasted_iota(jnp.int32, (1, D), 1)
        # run-boundary flags vs the previous element (lane 0 vs carry)
        ph0 = jnp.where(ti == 0, carry[1], _rt(h, 1))
        pl0 = jnp.where(ti == 0, carry[2], _rt(l, 1))
        first = ((h != ph0) | (l != pl0)).astype(jnp.int32)
        # a run continuing across the tile boundary inherits the
        # carried sum
        c_ = c_ + jnp.where((ti == 0) & (first == 0), carry[3], 0)
        # duplicate-free tiles (the common case for large-k counting:
        # most keys occur once) skip the segmented scan — run sums ARE
        # the counts when every lane starts its own run
        n_starts = jnp.sum(first)

        @pl.when(n_starts == D)
        def _scan_fast():
            cu_s[:] = c_

        @pl.when(n_starts != D)
        def _scan_slow():
            # segmented inclusive sum scan (Hillis-Steele)
            f = first
            s_ = c_
            d = 1
            while d < D:
                sd = jnp.where(ti >= d, _rt(s_, d), 0)
                fd = jnp.where(ti >= d, _rt(f, d), 1)
                s_ = s_ + jnp.where(f != 0, 0, sd)
                f = f | fd
                d *= 2
            cu_s[:] = s_

        cur_first0 = first[0, 0]

        def _wait_fast_store():
            # drain the async fast-path store before its source buffers
            # (e_h/e_l/e_c) are overwritten or the kernel ends; the
            # reconstructed descriptors only carry the byte count the
            # semaphores were signalled with (same (1, D) shape every
            # fast store)
            @pl.when(carry[5] == 1)
            def _():
                for i, src in enumerate((e_h, e_l, e_c)):
                    pltpu.make_async_copy(
                        src, oh.at[:, pl.ds(0, D)], sems.at[10 + i]
                    ).wait()
                carry[5] = 0

        @pl.when(t > 0)
        def _emit():
            # finalise the PREVIOUS tile: its last-of-run flags are
            # complete now that the current tile's first key is known
            _wait_fast_store()
            eh = pv_h[:]
            el = pv_l[:]
            es = pv_s[:]
            ef = pv_f[:]
            lastp = jnp.where(ti == D - 1, cur_first0, _lt_(ef, 1))
            sent = (eh == _imax) & (el == _imax)
            emit = (lastp != 0) & ~sent
            dead = (~emit).astype(jnp.int32)
            dead_n = jnp.sum(dead)

            @pl.when(dead_n == 0)
            def _compact_fast():
                # every lane emits (no duplicates collapsed, no
                # sentinels): the compaction is the identity
                e_h[:] = eh
                e_l[:] = el
                e_c[:] = es

            @pl.when(dead_n != 0)
            def _compact_slow():
                ehc, elc, esc = eh, el, es
                # exclusive dead-predecessor count -> leftward move
                ex = dead
                dd = 1
                while dd < D:
                    ex = ex + jnp.where(ti >= dd, _rt(ex, dd), 0)
                    dd *= 2
                ex = ex - dead  # inclusive -> exclusive
                rem = jnp.where(dead != 0, 0, ex)
                # bit-shift routing: compact live runs to the prefix
                for b in range(D.bit_length()):
                    step = 1 << b
                    if step >= D:
                        break
                    bit = jnp.where(
                        ti < D - step, (_lt_(rem, step) >> b) & 1, 0
                    )
                    cond = bit == 1
                    ehc = jnp.where(cond, _lt_(ehc, step), ehc)
                    elc = jnp.where(cond, _lt_(elc, step), elc)
                    esc = jnp.where(cond, _lt_(esc, step), esc)
                    rem = jnp.where(cond, _lt_(rem, step), rem)
                e_h[:] = ehc
                e_l[:] = elc
                e_c[:] = esc

            n_emit = D - dead_n
            pend_n = carry[4]

            @pl.when(jnp.logical_and(dead_n == 0, pend_n == 0))
            def _tail_fast():
                # steady state for distinct-heavy inputs: the full tile
                # emits and the pending buffer is empty, so the store
                # is one aligned D-lane DMA (D is a multiple of 128)
                # with no rotate/merge-with-pending machinery; pend
                # stays empty (D % 128 == 0)
                base = pl.multiple_of((carry[0] // 128) * 128, 128)
                ops = [
                    pltpu.make_async_copy(
                        e_h, oh.at[:, pl.ds(base, D)], sems.at[10]
                    ),
                    pltpu.make_async_copy(
                        e_l, ol.at[:, pl.ds(base, D)], sems.at[11]
                    ),
                    pltpu.make_async_copy(
                        e_c, oc.at[:, pl.ds(base, D)], sems.at[12]
                    ),
                ]
                for o in ops:
                    o.start()
                # ASYNC: the store drains at the next tile's emission
                # (or in _fin) — its region is disjoint from every
                # other store, so only source-buffer reuse must wait
                carry[5] = 1
                carry[0] = base + D

            @pl.when(jnp.logical_or(dead_n != 0, pend_n != 0))
            def _tail_slow():
                # append through the 128-lane pending buffer so the
                # store stays 128-aligned: comb = [pend | compacted],
                # write the whole (T+128) window at the aligned base,
                # keep the incomplete trailing 128-block as the new
                # pend
                lane_c = lax.broadcasted_iota(jnp.int32, (1, T + 128), 1)

                def pad_to(x, fill):
                    # (1, D) -> (1, T + 128): D + 256 = T + 128
                    return jnp.concatenate(
                        [x, jnp.full((1, 256), fill, jnp.int32)], axis=1
                    )

                sh_h, sh_l, sh_s = _rot_dyn(
                    [pad_to(e_h[:], _imax), pad_to(e_l[:], _imax),
                     pad_to(e_c[:], 0)],
                    pend_n, 7, left=False,
                )
                in_pend = lane_c < pend_n
                p_h = jnp.concatenate(
                    [pd_h[:], jnp.full((1, T), _imax, jnp.int32)], axis=1
                )
                p_l = jnp.concatenate(
                    [pd_l[:], jnp.full((1, T), _imax, jnp.int32)], axis=1
                )
                p_c = jnp.concatenate(
                    [pd_c[:], jnp.zeros((1, T), jnp.int32)], axis=1
                )
                comb_h = jnp.where(in_pend, p_h, sh_h)
                comb_l = jnp.where(in_pend, p_l, sh_l)
                comb_c = jnp.where(in_pend, p_c, sh_s)
                total = pend_n + n_emit
                commit = (total // 128) * 128
                # committed counts only ever advance by 128-multiples;
                # the hint lets Mosaic prove the store's alignment
                base = pl.multiple_of((carry[0] // 128) * 128, 128)

                def store(buf_h, buf_l, buf_c):
                    ops = [
                        pltpu.make_async_copy(
                            buf_h, oh.at[:, pl.ds(base, T + 128)],
                            sems.at[13]
                        ),
                        pltpu.make_async_copy(
                            buf_l, ol.at[:, pl.ds(base, T + 128)],
                            sems.at[14]
                        ),
                        pltpu.make_async_copy(
                            buf_c, oc.at[:, pl.ds(base, T + 128)],
                            sems.at[15]
                        ),
                    ]
                    for o in ops:
                        o.start()
                    for o in ops:
                        o.wait()

                def inner(buf_h, buf_l, buf_c):
                    buf_h[:] = comb_h
                    buf_l[:] = comb_l
                    buf_c[:] = comb_c
                    store(buf_h, buf_l, buf_c)

                pl.run_scoped(
                    inner,
                    pltpu.VMEM((1, T + 128), jnp.int32),
                    pltpu.VMEM((1, T + 128), jnp.int32),
                    pltpu.VMEM((1, T + 128), jnp.int32),
                )
                nh, nl, nc = _rot_dyn(
                    [comb_h, comb_l, comb_c], commit, T.bit_length(),
                    left=True,
                )
                pd_h[:] = nh[:, :128]
                pd_l[:] = nl[:, :128]
                pd_c[:] = nc[:, :128]
                carry[0] = base + commit
                carry[4] = total - commit

        @pl.when(t == G - 1)
        def _fin():
            _wait_fast_store()
            nruns[0, 0] = carry[0] + carry[4]

        # current tile becomes the deferred one
        pv_h[:] = h
        pv_l[:] = l
        pv_s[:] = cu_s[:]
        pv_f[:] = first
        carry[1] = h[0, D - 1]
        carry[2] = l[0, D - 1]
        carry[3] = cu_s[0, D - 1]

    return kernel


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def merge_sorted_pallas(ah, al, ac, bh, bl, tile: int = 8192,
                        interpret: bool = False):
    """Drop-in for ops.count.merge_sorted_batch: merge a SORTED batch
    (bh, bl) of unit-count canonical pairs (sentinels last) into the
    sorted-unique sentinel-tailed accumulator (ah, al, ac). Returns
    (oh, ol, oc, n_runs), runs compacted to the prefix, sentinel/zero
    tail, output length >= C + M. ``tile`` is the aligned load-window
    size (pow2 >= 256); each grid step emits tile - 128 elements.
    Default 8192: the round-5 on-chip sweep read 341/382/203 Melem/s at
    4096/8192/16384 with the narrow-B branch."""
    C = ah.shape[0]
    M = bh.shape[0]
    T = tile
    assert T >= 256 and (T & (T - 1)) == 0
    D = T - 128
    N = C + M
    n_tiles = max(1, -(-N // D))
    G = n_tiles + 1  # one trailing sentinel tile finalises the last run
    L_out = n_tiles * D + T + 256

    fah = _flip(ah)
    fal = _flip(al)
    fac = lax.bitcast_convert_type(ac, jnp.int32)
    fbh = _flip(bh)
    fbl = _flip(bl)
    imax = jnp.full((T,), _IMAX, jnp.int32)
    fah = jnp.concatenate([fah, imax])
    fal = jnp.concatenate([fal, imax])
    fac = jnp.concatenate([fac, jnp.zeros((T,), jnp.int32)])
    fbh = jnp.concatenate([fbh, imax])
    fbl = jnp.concatenate([fbl, imax])
    aoff, boff = _merge_path_offsets(fah, fal, fbh, fbl, C, M, D, G)
    # reversed B, plus 128 sentinel lanes of right slack for aligned
    # window over-reach (masked in-kernel either way)
    slack = jnp.full((128,), _IMAX, jnp.int32)
    brh = jnp.concatenate([fbh[::-1], slack])
    brl = jnp.concatenate([fbl[::-1], slack])

    def as2(x):
        return x.reshape(1, -1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 5,
        out_specs=(
            [pl.BlockSpec(memory_space=pl.ANY)] * 3
            + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        ),
        scratch_shapes=(
            [pltpu.VMEM((1, T), jnp.int32) for _ in range(10)]
            + [pltpu.VMEM((1, D), jnp.int32) for _ in range(11)]
            + [pltpu.VMEM((1, 128), jnp.int32) for _ in range(3)]
            + [pltpu.SMEM((8,), jnp.int32), pltpu.SemaphoreType.DMA((16,))]
        ),
    )
    oh, ol, oc, nr = pl.pallas_call(
        _make_kernel(T, G),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((1, L_out), jnp.int32),
            jax.ShapeDtypeStruct((1, L_out), jnp.int32),
            jax.ShapeDtypeStruct((1, L_out), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ),
        interpret=interpret,
    )(aoff, boff, as2(fah), as2(fal), as2(fac), as2(brh), as2(brl))
    n_runs = nr[0, 0]
    # positions past the final write offset hold stale DMA bytes (or
    # were never written): mask to the sentinel/zero tail contract
    idx = jnp.arange(L_out, dtype=jnp.int32)
    live = idx < n_runs
    sent = jnp.uint32(0xFFFFFFFF)
    to_u32 = lambda x: lax.bitcast_convert_type(x, jnp.uint32)  # noqa: E731
    oh_u = jnp.where(live, to_u32(oh[0]) ^ _FLIP, sent)
    ol_u = jnp.where(live, to_u32(ol[0]) ^ _FLIP, sent)
    oc_u = jnp.where(live, to_u32(oc[0]), jnp.uint32(0))
    return oh_u, ol_u, oc_u, n_runs
