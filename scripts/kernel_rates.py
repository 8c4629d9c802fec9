"""Device kernel-rate microbenchmarks (PERF.md "Device kernel rates").

Measures steady-state rates of the hot device kernels on whatever JAX
backend is live (axon TPU by default; KMERTOOLS_PLATFORM=cpu to pin the
host backend). Inputs are device-resident and timing blocks on
block_until_ready, so the numbers are kernel rates, not tunnel rates.

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


def _bench(fn, *args, iters: int = 5) -> float:
    """Median seconds per call, post-warmup, blocking on completion."""
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def fused_oligo_step() -> None:
    """encode + canonical + per-read histogram, the oligo device step."""
    from kmertools_tpu.io import batch as iob
    from kmertools_tpu.ops import encode, histogram, pallas_histogram
    from kmertools_tpu.utils import codec

    R, L = 2048, 1024
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

    @jax.jit
    def step(p, ln):
        c = encode.unpack_packed(p, ln)
        fwd, rc, valid = encode.kmer_ids_small(c, K)
        ids = jnp.minimum(fwd, rc)
        if use_pallas:
            return pallas_histogram.per_read_histogram_tpu(
                ids.astype(jnp.int32), valid, bin_values, nbins
            )
        return histogram.per_read_histogram_gathered(
            ids, valid, slot_table, nbins
        )

    dt = _bench(step, packed_d, lengths_d)
    rate = R * L / dt
    RESULTS["fused_oligo_step_Mcodes_s"] = rate / 1e6
    print(f"fused oligo step ({'pallas' if use_pallas else 'xla'}): "
          f"{rate / 1e6:.0f} Mcodes/s  [{R}x{L} batch]")


def hist_only() -> None:
    """Per-read histogram alone: Pallas vs XLA one-hot matmul."""
    from kmertools_tpu.ops import histogram, pallas_histogram
    from kmertools_tpu.utils import codec

    R, P = 2048, 1021
    rng = np.random.default_rng(1)
    nbins = 136
    bin_values_np = codec.canonical_bin_values(K)
    ids = jnp.asarray(
        bin_values_np[rng.integers(0, nbins, size=(R, P))].astype(np.int32)
    )
    valid = jnp.ones((R, P), bool)
    bv = jnp.asarray(bin_values_np)

    if pallas_histogram.use_pallas():
        f = jax.jit(
            lambda i, v: pallas_histogram.per_read_histogram_tpu(
                i, v, bv, nbins
            )
        )
        dt = _bench(f, ids, valid)
        RESULTS["hist_pallas_Gcodes_s"] = R * P / dt / 1e9
        print(f"per-read hist (pallas): {R * P / dt / 1e9:.2f} Gcodes/s")

    slot_table = jnp.asarray(codec.canonical_slot_table(K))
    g = jax.jit(
        lambda i, v: histogram.per_read_histogram_gathered(
            i.astype(jnp.uint32), v, slot_table, nbins
        )
    )
    dt = _bench(g, ids, valid)
    RESULTS["hist_xla_Gcodes_s"] = R * P / dt / 1e9
    print(f"per-read hist (xla one-hot): {R * P / dt / 1e9:.2f} Gcodes/s")


def accum_merge_rate() -> None:
    """The counter's bitonic accumulator merge: one batch -> sorted-
    unique device state (ops/count.py:accum_merge_clean)."""
    from kmertools_tpu.io import batch as iob
    from kmertools_tpu.ops import count as cops

    k = 21
    R, L = 256, 4096  # ~1M codes: the ctr batch scale
    rng = np.random.default_rng(2)
    codes = rng.integers(0, 4, size=(R, L), dtype=np.uint8)
    lengths = np.full(R, L, np.int32)
    packed, vb, _ = iob.pack_planes(codes, lengths)
    n_flat = R * L
    C = (1 << 24) - n_flat  # pow2 total like DeviceAccumulator
    sent = jnp.uint32(0xFFFFFFFF)
    ah = jax.device_put(jnp.full((C,), sent, jnp.uint32))
    al = jax.device_put(jnp.full((C,), sent, jnp.uint32))
    ac = jax.device_put(jnp.zeros((C,), jnp.uint32))
    packed_d = jax.device_put(packed)
    lengths_d = jax.device_put(lengths)

    f = jax.jit(
        lambda h, lo, c, p, ln: cops.accum_merge_clean(h, lo, c, p, ln, k)
    )
    # steady state: keep state resident, feed the same batch
    out = f(ah, al, ac, packed_d, lengths_d)
    jax.block_until_ready(out)
    ah2, al2, ac2, n = out
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = f(ah2, al2, ac2, packed_d, lengths_d)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    total = C + n_flat
    RESULTS["accum_merge_Melem_s"] = total / dt / 1e6
    RESULTS["accum_merge_Mcodes_s"] = n_flat / dt / 1e6
    print(f"ctr accumulator merge (k=21): {n_flat / dt / 1e6:.1f} Mcodes/s "
          f"per batch ({total / dt / 1e6:.0f} M merge-elements/s, "
          f"C={C / 1e6:.1f}M state)")


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

    f = jax.jit(cops.lookup_counts)
    dt = _bench(f, qh, ql, th, tl, tc)
    RESULTS["cov_join_Mlookups_s"] = n_q / dt / 1e6
    print(f"cov table join: {n_q / dt / 1e6:.0f} Mlookups/s "
          f"({n_q / 1e6:.0f}M queries vs {n_table / 1e6:.0f}M-entry table, "
          f"{dt * 1e3:.1f} ms)")


def main() -> None:
    devs = jax.devices()
    plat = devs[0].platform
    print(f"backend: {plat} x{len(devs)} ({devs[0].device_kind})")
    RESULTS["backend"] = plat
    fused_oligo_step()
    hist_only()
    accum_merge_rate()
    cov_join_rate()
    print(json.dumps(RESULTS))


if __name__ == "__main__":
    main()
