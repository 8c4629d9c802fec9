"""Per-read histograms as one-hot factored MXU matmuls.

The reference accumulates per-read k-mer counts with sequential
scatter-adds into a Vec (composition/src/oligo.rs:240-254). Scatter is
the wrong shape for a TPU; instead we factor each id as
``id = hi * 128 + lo`` and compute

    counts[r, hi, lo] = sum_p onehot_hi[r, p, hi] * onehot_lo[r, p, lo]

— a batched (H, P) x (P, 128) matmul that runs on the 128x128 systolic
array. One-hot entries are exact in bf16 and the MXU accumulates in
f32, so counts are exact integers for any row length < 2^24.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("nbins",))
def per_read_histogram(ids: jnp.ndarray, valid: jnp.ndarray, nbins: int):
    """ids (R, P) int32 in [0, nbins), valid (R, P) bool ->
    (counts f32 (R, nbins), totals int32 (R,))."""
    C = _round_up(nbins, 128)
    H = C // 128
    ids = jnp.where(valid, ids, 0)
    hi = (ids // 128).astype(jnp.int32)
    lo = (ids % 128).astype(jnp.int32)
    iota_h = jnp.arange(H, dtype=jnp.int32)
    iota_l = jnp.arange(128, dtype=jnp.int32)
    oh_hi = ((hi[..., None] == iota_h) & valid[..., None]).astype(jnp.bfloat16)
    oh_lo = (lo[..., None] == iota_l).astype(jnp.bfloat16)
    counts = jnp.einsum(
        "rph,rpl->rhl", oh_hi, oh_lo, preferred_element_type=jnp.float32
    ).reshape(ids.shape[0], C)
    totals = jnp.sum(valid.astype(jnp.int32), axis=1)
    return counts[:, :nbins], totals


def prefer_scatter(platform: str | None = None) -> bool:
    """True where sequential scatter-add beats the one-hot matmul
    factoring: CPU backends (the one-hot path materialises (R, P, 256)
    bf16 one-hots — MXU food, ~40x slower than scatter on a host CPU).
    Used by workloads to pick the histogram kernel at dispatch-build
    time; TPU always takes Pallas or the MXU matmul. `platform`
    overrides the default backend (heterogeneous sinks)."""
    if platform is None:
        platform = jax.default_backend()
    return platform == "cpu"


@functools.partial(jax.jit, static_argnames=("nbins",))
def per_read_histogram_scatter(ids: jnp.ndarray, valid: jnp.ndarray, nbins: int):
    """Same contract as per_read_histogram via flat scatter-add.

    Invalid positions route to a sacrificial overflow bin so the
    scatter stays dense and unconditional."""
    R, P = ids.shape
    row = nbins + 1
    flat = jnp.where(valid, ids, nbins).astype(jnp.int32)
    flat = flat + jnp.arange(R, dtype=jnp.int32)[:, None] * row
    counts = (
        jnp.zeros((R * row,), jnp.int32).at[flat.reshape(-1)].add(1)
    ).reshape(R, row)
    totals = jnp.sum(valid, axis=1, dtype=jnp.int32)
    return counts[:, :nbins].astype(jnp.float32), totals


@functools.partial(jax.jit, static_argnames=("nbins",))
def per_read_histogram_gathered(
    ids: jnp.ndarray, valid: jnp.ndarray, slot_table: jnp.ndarray, nbins: int
):
    """Histogram over `slot_table[ids]` — canonical-slot remap fused in.

    slot_table is the dense canonical index (4^k,) int32
    (kmer/src/kmer.rs:54-73 analog, precomputed on host).
    """
    ids = jnp.where(valid, ids, 0)
    slots = jnp.take(slot_table, ids, axis=None, mode="clip")
    return per_read_histogram(slots, valid, nbins)
