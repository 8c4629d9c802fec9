"""Device kernel-rate microbenchmarks (PERF.md "Device kernel rates").

Measures steady-state rates of the hot device kernels on whatever JAX
backend is live (axon TPU by default; KMERTOOLS_PLATFORM=cpu to pin the
host backend).

MEASUREMENT PROTOCOL (round 3): on the remote-attached axon backend,
``jax.block_until_ready`` returns before the computation finishes, and
a scalar device->host fetch — the only trustworthy barrier — costs a
~28 ms tunnel round trip. So each kernel runs as N data-dependent
chained applications inside ONE jitted program (a loop-carried
perturbation forbids elision/reordering); the measurement fetches one
scalar, subtracts the fetch floor, and divides by N. Round-1 numbers
recorded without this protocol measured async dispatch, not compute.

Prints one `name: rate` line per kernel plus a trailing JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

import kmertools_tpu  # noqa: F401  (compile cache + hugepage tuning)

import jax
import jax.numpy as jnp

K = 4
RESULTS: dict[str, float] = {}


def _bench_fetch(fn, *args, iters: int = 5) -> float:
    """Median seconds per call with a REAL sync: fetch the (scalar)
    result to host. On the remote-attached axon backend
    ``block_until_ready`` returns before the computation finishes (an
    8-chained 4096^3 matmul "completes" in 0.12 ms — 1191 TFLOP/s on a
    394-TFLOP chip), so only a device->host fetch of a value derived
    from the result is a trustworthy barrier."""
    _ = np.asarray(fn(*args))
    ts = []
    for _i in range(iters):
        t0 = time.perf_counter()
        _ = np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


_LAT: float | None = None


def _fetch_floor() -> float:
    """Scalar-fetch round trip (~28 ms through the tunnel): every
    synced measurement pays it once, so chained-kernel timings subtract
    it and divide by the chain length."""
    global _LAT
    if _LAT is None:
        f = jax.jit(lambda x: x.sum())
        x = jnp.zeros(8, jnp.int32)
        _LAT = _bench_fetch(f, x, iters=9)
        RESULTS["fetch_floor_ms"] = _LAT * 1e3
        print(f"scalar fetch floor: {_LAT * 1e3:.1f} ms")
    return _LAT


_CHAIN = 16


def _rate_chained(make_step, payload_per_call: float, label: str,
                  result_key: str, unit_div: float, unit: str,
                  chain: int = _CHAIN, args: tuple = ()) -> None:
    """Measure a kernel by running `chain` data-dependent applications
    inside ONE jitted program (loop-carried perturbation prevents DCE /
    reordering), fetching a scalar, and amortising the fetch floor.

    Big device tables must ride in `args` (make_step(n) then returns a
    function OF those tables), never as closures: a closure-captured
    array embeds as an XLA literal — every remote compile request
    ships it (HTTP 413 past ~268 MB) and each compiled program lands in
    the persistent cache at table size (observed 420 MB entries)."""
    lat = _fetch_floor()
    one = jax.jit(make_step(1))
    dt_1 = _bench_fetch(one, *args)
    # escalate the chain until its span clears the fetch-floor noise
    # (fast kernels finish a 16-chain inside the floor's 26-37 ms jitter)
    while True:
        dt_n = _bench_fetch(jax.jit(make_step(chain)), *args)
        if dt_n - lat >= lat or chain >= 4096:
            break
        chain *= 8
    per_call = max((dt_n - lat) / chain, 1e-9)
    rate = payload_per_call / per_call
    RESULTS[result_key] = rate / unit_div
    print(f"{label}: {rate / unit_div:.2f} {unit} "
          f"[{per_call * 1e3:.2f} ms/call chained x{chain}; "
          f"1-call raw {dt_1 * 1e3:.1f} ms incl {lat * 1e3:.0f} ms floor]")


def fused_oligo_step() -> None:
    """encode + canonical + per-read histogram, the oligo device step."""
    from kmertools_tpu.io import batch as iob
    from kmertools_tpu.ops import encode, histogram, pallas_histogram
    from kmertools_tpu.utils import codec

    R, L = 8192, 1024  # 8.4M codes: amortises the dispatch floor
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 4, size=(R, L), dtype=np.uint8)
    lengths = np.full(R, L, np.int32)
    packed, vb, _ = iob.pack_planes(codes, lengths)
    packed_d = jax.device_put(packed)
    lengths_d = jax.device_put(lengths)
    nbins = 136
    bin_values = jnp.asarray(codec.canonical_bin_values(K))
    use_pallas = pallas_histogram.use_pallas()
    slot_table = jnp.asarray(codec.canonical_slot_table(K))

    def step(p):
        c = encode.unpack_packed(p, lengths_d)
        fwd, rc, valid = encode.kmer_ids_small(c, K)
        ids = jnp.minimum(fwd, rc)
        if use_pallas:
            return pallas_histogram.per_read_histogram_tpu(
                ids.astype(jnp.int32), valid, bin_values, nbins
            )
        return histogram.per_read_histogram_gathered(
            ids, valid, slot_table, nbins
        )

    def make_step(n):
        def run():
            def body(i, carry):
                pk, acc = carry
                counts, totals = step(pk)
                # the dependency must flow through COUNTS: totals only
                # depend on lengths, and XLA will happily elide the
                # whole histogram otherwise
                acc = acc + counts.reshape(-1)[0].astype(jnp.int32)
                pk = pk ^ (acc & 1).astype(jnp.uint8)
                return pk, acc

            _, acc = jax.lax.fori_loop(
                0, n, body, (packed_d, jnp.int32(0))
            )
            return acc

        return run

    _rate_chained(
        make_step, R * L,
        f"fused oligo step ({'pallas' if use_pallas else 'xla'}, {R}x{L})",
        "fused_oligo_step_Mcodes_s", 1e6, "Mcodes/s",
    )


def hist_only() -> None:
    """Per-read histogram alone: Pallas vs XLA one-hot matmul."""
    from kmertools_tpu.ops import histogram, pallas_histogram
    from kmertools_tpu.utils import codec

    R, P = 8192, 1021
    rng = np.random.default_rng(1)
    nbins = 136
    bin_values_np = codec.canonical_bin_values(K)
    ids = jnp.asarray(
        bin_values_np[rng.integers(0, nbins, size=(R, P))].astype(np.int32)
    )
    valid = jnp.ones((R, P), bool)
    bv = jnp.asarray(bin_values_np)
    slot_table = jnp.asarray(codec.canonical_slot_table(K))

    def chained(kernel, key, label):
        def make_step(n):
            def run():
                def body(i, carry):
                    idc, acc = carry
                    counts, totals = kernel(idc)
                    acc = acc + counts.reshape(-1)[0].astype(jnp.int32)
                    # perturb between iterations (same op count: the
                    # kernels are branchless)
                    idc = idc ^ (acc & 1)
                    return idc, acc

                _, acc = jax.lax.fori_loop(
                    0, n, body, (ids, jnp.int32(0))
                )
                return acc

            return run

        _rate_chained(make_step, R * P, label, key, 1e9, "Gcodes/s")

    if pallas_histogram.use_pallas():
        chained(
            lambda i: pallas_histogram.per_read_histogram_tpu(
                i, valid, bv, nbins
            ),
            "hist_pallas_Gcodes_s", "per-read hist (pallas)",
        )
    chained(
        lambda i: histogram.per_read_histogram_gathered(
            i.astype(jnp.uint32), valid, slot_table, nbins
        ),
        "hist_xla_Gcodes_s", "per-read hist (xla one-hot)",
    )


def accum_merge_rate(n_reads: int = 8400, label: str = "",
                     key_suffix: str = "") -> None:
    """The counter's device accumulator (the production path:
    workloads/counter.py:DeviceAccumulator), measured end to end over
    streamed batches at the backend's resolved default target — the
    Pallas merge-path kernel on real TPUs (1<<23 batches; program size
    static in C+M), the XLA bitonic network elsewhere (1<<18 batches to
    stay under its compile cliff). Running this also warms the exact
    program class the ctr hardware run dispatches.

    Default corpus: 42 Mbases / ~41.8M uniques (fixed, so batch-size
    sweeps via KMERTOOLS_CTR_TARGET vary only the batch). main() also
    runs the FLAGSHIP shape (15 Mb, C~=32M — the VERDICT r4 #2
    criterion's scale)."""
    import os
    import tempfile

    from kmertools_tpu.io import batch as iob
    from kmertools_tpu.workloads.counter import (
        DeviceAccumulator,
        _default_ctr_target,
    )

    k = 21
    target = _default_ctr_target()
    rng = np.random.default_rng(2)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    read_len = 5000
    fa = tempfile.NamedTemporaryFile(
        suffix=".fa", delete=False,
        dir="/dev/shm" if os.path.isdir("/dev/shm") else None,
    )
    with fa:
        seqs = bases[rng.integers(0, 4, size=(n_reads, read_len))]
        for i in range(n_reads):
            fa.write(b">r%d\n%s\n" % (i, seqs[i].tobytes()))
    try:
        batches = list(
            iob.stream_path(fa.name, overlap=k - 1, target_codes=target)
        )
        # expect_codes mirrors production (counter.py:_make_engines):
        # the accumulator sizes once from the input bound, so the big
        # merge program's one-time first-dispatch load lands in the
        # warmup, not the timed loop
        acc = DeviceAccumulator(
            k, target, n_devices=1,
            expect_codes=n_reads * (read_len - k + 1),
        )
        # warmup: first adds compile + fill the dispatch lag. sync()
        # (a real n-fetch) is the barrier — block_until_ready returns
        # before axon compute finishes (PERF.md protocol note), and
        # with grouped resolves nothing else forces the first
        # program's executable load out of the timed region
        warm = max(1, min(4, len(batches) // 4))
        for b in batches[:warm]:
            acc.add(lengths_np=b.lengths, planes=b.planes())
        acc.sync()
        t0 = time.perf_counter()
        codes = 0
        drains = 0
        uniq = 0
        drain_t = 0.0
        for b in batches[warm:]:
            n = acc.add(lengths_np=b.lengths, planes=b.planes())
            codes += int(b.lengths.sum())
            if acc.needs_drain(n):
                td = time.perf_counter()
                ks, _ = acc.drain()  # production spill policy
                drain_t += time.perf_counter() - td
                uniq += len(ks)
                drains += 1
        # block on every queued merge BEFORE the drain timer: grouped
        # resolves (exact-bound mode) defer up to 9 batches of merge
        # compute, which must count as loop time, not drain time
        acc.sync()
        td = time.perf_counter()
        ks, _ = acc.drain()
        drain_t += time.perf_counter() - td
        uniq += len(ks)
        dt = time.perf_counter() - t0
        nb = len(batches) - warm
        RESULTS["accum_merge_Mcodes_s" + key_suffix] = codes / dt / 1e6
        RESULTS["accum_merge_nodrain_Mcodes_s" + key_suffix] = (
            codes / (dt - drain_t) / 1e6
        )
        RESULTS["accum_drain_s_per_Muniq" + key_suffix] = (
            drain_t / max(uniq / 1e6, 1e-9)
        )
        RESULTS["accum_C" + key_suffix] = acc.C_dev
        RESULTS["accum_drains" + key_suffix] = drains + 1
        print(
            f"ctr device accumulator (k=21{label}): {codes / dt / 1e6:.1f} "
            f"Mcodes/s incl drains, {codes / (dt - drain_t) / 1e6:.1f} "
            f"Mcodes/s merge loop alone ({nb} batches, "
            f"C={acc.C_dev / 1e6:.1f}M state; {uniq / 1e6:.2f}M uniques "
            f"drained in {drain_t:.2f}s over {drains + 1} drains; "
            f"exact-bound={acc._exact}: one n-fetch per "
            f"{acc._resolve_every} batches)"
        )
    finally:
        os.unlink(fa.name)


def cov_join_rate() -> None:
    """Coverage count-table join: binary-search lookups vs a big table."""
    from kmertools_tpu.ops import count as cops

    n_table = 13_000_000
    n_q = 4_000_000
    rng = np.random.default_rng(3)
    keys = np.unique(
        rng.integers(0, 1 << 42, n_table + n_table // 8, dtype=np.uint64)
    )[:n_table]
    th = jax.device_put(jnp.asarray((keys >> np.uint64(32)).astype(np.uint32)))
    tl = jax.device_put(jnp.asarray((keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)))
    tc = jax.device_put(jnp.asarray(rng.integers(1, 100, n_table, np.uint32)))
    q = rng.choice(keys, n_q)
    qh = jax.device_put(jnp.asarray((q >> np.uint64(32)).astype(np.uint32)))
    ql = jax.device_put(jnp.asarray((q & np.uint64(0xFFFFFFFF)).astype(np.uint32)))

    def make_step(n):
        def run(th, tl, tc):
            def body(i, carry):
                qlc, acc = carry
                res = cops.lookup_counts(qh, qlc, th, tl, tc)
                acc = acc + res.reshape(-1)[0].astype(jnp.int32)
                return qlc ^ (acc & 1).astype(qlc.dtype), acc

            _, acc = jax.lax.fori_loop(0, n, body, (ql, jnp.int32(0)))
            return acc

        return run

    _rate_chained(
        make_step, n_q,
        f"cov table join ({n_q // 10**6}M queries vs "
        f"{n_table // 10**6}M-entry table)",
        "cov_join_Mlookups_s", 1e6, "Mlookups/s", chain=4,
        args=(th, tl, tc),
    )

    # bucketed join (production path): host prefix index + (n, 2) row
    # gathers — fewer probe steps, one gather per probe
    k = 21
    bb = min(2 * k, 18)
    boff_np, steps = cops.bucket_offsets(keys, k, bb)
    tkl = jax.device_put(jnp.asarray(
        np.stack(
            [(keys >> np.uint64(32)).astype(np.uint32),
             (keys & np.uint64(0xFFFFFFFF)).astype(np.uint32)],
            axis=1,
        )
    ))
    boff = jax.device_put(jnp.asarray(boff_np))

    def make_step_b(n):
        def run(tkl, tc, boff):
            def body(i, carry):
                qlc, acc = carry
                res = cops.lookup_counts_bucketed(
                    qh, qlc, tkl, tc, boff, k, bb, steps
                )
                acc = acc + res.reshape(-1)[0].astype(jnp.int32)
                return qlc ^ (acc & 1).astype(qlc.dtype), acc

            _, acc = jax.lax.fori_loop(0, n, body, (ql, jnp.int32(0)))
            return acc

        return run

    _rate_chained(
        make_step_b, n_q,
        f"cov table join BUCKETED (bb={bb}, steps={steps})",
        "cov_join_bucketed_Mlookups_s", 1e6, "Mlookups/s", chain=4,
        args=(tkl, tc, boff),
    )

    # aligned-block join (round-4 production path): one bucket-bound
    # gather + two aligned (S, 3) block row gathers + full-width VPU
    # compare per query (ops/count.py:lookup_counts_blocks)
    blk = cops.block_table(keys, np.asarray(tc), k)
    if blk is not None:
        blocks3_np, bboff_np, p_bits = blk
        blocks3 = jax.device_put(jnp.asarray(blocks3_np))
        bboff = jax.device_put(jnp.asarray(bboff_np))
        S = blocks3_np.shape[1]

        def make_step_blk(n):
            def run(blocks3, bboff):
                def body(i, carry):
                    qlc, acc = carry
                    res = cops.lookup_counts_blocks(
                        qh, qlc, blocks3, bboff, k, p_bits, S
                    )
                    acc = acc + res.reshape(-1)[0].astype(jnp.int32)
                    return qlc ^ (acc & 1).astype(qlc.dtype), acc

                _, acc = jax.lax.fori_loop(0, n, body, (ql, jnp.int32(0)))
                return acc

            return run

        _rate_chained(
            make_step_blk, n_q,
            f"cov table join BLOCKS (p={p_bits}, S={S})",
            "cov_join_blocks_Mlookups_s", 1e6, "Mlookups/s", chain=4,
            args=(blocks3, bboff),
        )

    # direct-bucket pre-binned join (round-4b production path): ONE
    # private-block row gather per query, bin values baked into the
    # rows (ops/count.py:direct_table) — the cov workload's actual
    # device program under KMERTOOLS_COV_JOIN=auto
    dt = cops.direct_table(keys, np.asarray(tc), k, 5, 16)
    if dt is not None:
        rows_np, dp_bits, dbin_bits, dplanes = dt
        drows = jax.device_put(jnp.asarray(rows_np))

        def make_step_dir(n):
            def run(drows):
                def body(i, carry):
                    qlc, acc = carry
                    res = cops.lookup_bins_direct(
                        qh, qlc, drows, k, dp_bits, dbin_bits, dplanes
                    )
                    acc = acc + res.reshape(-1)[0].astype(jnp.int32)
                    return qlc ^ (acc & 1).astype(qlc.dtype), acc

                _, acc = jax.lax.fori_loop(0, n, body, (ql, jnp.int32(0)))
                return acc

            return run

        _rate_chained(
            make_step_dir, n_q,
            f"cov table join DIRECT (p={dp_bits}, row {rows_np.shape[1]}, "
            f"{rows_np.nbytes // 10**6} MB)",
            "cov_join_direct_Mlookups_s", 1e6, "Mlookups/s", chain=4,
            args=(drows,),
        )


def minimiser_rates() -> None:
    """Window-min kernels (the `min` workload's accelerator path):
    fused m<=15 single-u32 variant and the (hi, lo) pair variant."""
    from kmertools_tpu.ops import minimiser as mops

    R, L = 2048, 1024
    rng = np.random.default_rng(4)
    codes_np = rng.integers(0, 4, size=(R, L), dtype=np.uint8)
    codes = jax.device_put(jnp.asarray(codes_np))

    def chain_of(kernel, pick):
        def make_step(n):
            def run():
                def body(i, carry):
                    c, acc = carry
                    out = kernel(c)
                    acc = acc + pick(out).astype(jnp.int32)
                    c = (c + (acc & 1).astype(jnp.uint8)) & 3
                    return c, acc

                _, acc = jax.lax.fori_loop(0, n, body, (codes, jnp.int32(0)))
                return acc

            return run

        return make_step

    _rate_chained(
        chain_of(
            lambda c: mops.window_min_fused(c, 10, 31),
            lambda o: o.reshape(-1)[0],
        ),
        R * L, "window min fused (m=10, w=31)",
        "min_window_fused_Mcodes_s", 1e6, "Mcodes/s",
    )
    _rate_chained(
        chain_of(
            lambda c: mops.window_min(c, 21, 31),
            lambda o: o[1].reshape(-1)[0],
        ),
        R * L, "window min pair (m=21, w=31)",
        "min_window_pair_Mcodes_s", 1e6, "Mcodes/s",
    )
    _rate_chained(
        chain_of(
            lambda c: mops.whole_read_min(c, 10),
            lambda o: o[1].reshape(-1)[0],
        ),
        R * L, "whole-read min (m=10)",
        "min_whole_read_Mcodes_s", 1e6, "Mcodes/s",
    )


def main() -> None:
    devs = jax.devices()
    plat = devs[0].platform
    print(f"backend: {plat} x{len(devs)} ({devs[0].device_kind})")
    RESULTS["backend"] = plat
    fused_oligo_step()
    hist_only()
    minimiser_rates()
    accum_merge_rate()
    accum_merge_rate(
        n_reads=3000, label=", flagship 15 Mb", key_suffix="_flagship"
    )
    cov_join_rate()
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
