"""Pallas TPU kernel: fused per-read k-mer histogram with in-kernel
canonical remap.

The XLA path (ops/histogram.py) needs (a) a table gather remapping
canonical k-mer values to dense slots (kmer/src/kmer.rs:54-73) — which
XLA lowers to a catastrophically slow scalar gather on TPU (~18 ms for
a 2 M-element batch) — and (b) one-hot matmuls whose (R, P, 128) bf16
one-hots it materialises in HBM. This kernel does neither: the
accumulator lives in VMEM and each histogram bin is matched by
comparing the raw k-mer id against that bin's *value* (`bin_values`),
so the dense-slot remap costs nothing extra:

    acc[c, r] += (ids[p, r] == bin_values[c])

Invalid positions carry id -1, which matches no bin. Layout: reads on
the lane dimension (inputs transposed to (P, R) outside, output (C,
TILE_R) transposed back), so every loop step is a full-width VPU
compare-and-add.

Semantics match ops/histogram.per_read_histogram_gathered exactly (the
golden suite pins that path to the reference's per-read counts,
composition/src/oligo.rs:240-254).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE_R = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


_P_BLK = 8  # positions per loop step: one native (8, 128) f32/i32 tile


def _hist_kernel(ids_ref, bins_ref, out_ref, acc_ref):
    P = ids_ref.shape[0]  # padded to a multiple of _P_BLK
    C = bins_ref.shape[0]
    bins = bins_ref[:]  # (C, 1) int32 bin values

    acc_ref[:] = jnp.zeros((C, _TILE_R), jnp.float32)

    def body(i, _):
        # one full-tile load per step (a per-position (1, 128) slice
        # wastes 7/8 sublanes and was ~6x slower end to end), and the
        # accumulator round-trips VMEM once per 8 positions instead of
        # once per position
        blk = ids_ref[pl.ds(i * _P_BLK, _P_BLK), :]  # (8, _TILE_R)
        acc = acc_ref[:]
        for s in range(_P_BLK):
            acc = acc + (bins == blk[s].reshape(1, _TILE_R)).astype(
                jnp.float32
            )
        acc_ref[:] = acc
        return 0

    jax.lax.fori_loop(0, P // _P_BLK, body, 0)
    out_ref[:] = acc_ref[:].astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("nbins", "interpret"))
def per_read_histogram_tpu(
    ids: jnp.ndarray,
    valid: jnp.ndarray,
    bin_values: jnp.ndarray,
    nbins: int,
    interpret: bool = False,
):
    """ids (R, P) int32 raw k-mer values, valid (R, P) bool,
    bin_values (nbins,) int32 — the k-mer value counted by each output
    bin (canonical values for min-mer mode, arange(4^k) for raw mode) ->
    (counts int16 (R, nbins), totals int32 (R,)).

    Rows pad to a multiple of 128 internally.
    """
    R, P = ids.shape
    R_pad = _round_up(R, _TILE_R)
    # bins pad to the f32 sublane quantum (8), not 128: 136 bins cost
    # 144 compare rows, not 256 — the compare work is C*P*R, so the
    # pad factor is throughput
    C = _round_up(nbins, 8)
    P_pad = _round_up(P, _P_BLK)
    ids_m = jnp.where(valid, ids, -1).astype(jnp.int32)
    if R_pad != R:
        ids_m = jnp.pad(ids_m, ((0, R_pad - R), (0, 0)), constant_values=-1)
    ids_t = ids_m.T  # (P, R_pad)
    if P_pad != P:
        ids_t = jnp.pad(ids_t, ((0, P_pad - P), (0, 0)), constant_values=-1)
    bins_pad = (
        jnp.full((C,), -2, jnp.int32)
        .at[:nbins]
        .set(bin_values.astype(jnp.int32))
        .reshape(C, 1)
    )

    grid = (R_pad // _TILE_R,)
    counts_t = pl.pallas_call(
        _hist_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (P_pad, _TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((C, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (C, _TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((C, R_pad), jnp.int16),
        scratch_shapes=[pltpu.VMEM((C, _TILE_R), jnp.float32)],
        interpret=interpret,
    )(ids_t, bins_pad)
    counts = counts_t.T[:R, :nbins]
    totals = jnp.sum(valid, axis=1, dtype=jnp.int32)
    return counts, totals


def use_pallas(platform: str | None = None) -> bool:
    """Pallas path is the default on real TPU hardware. `platform`
    overrides the default backend (heterogeneous sinks compile the same
    workload for several backends in one process)."""
    import os

    if os.environ.get("KMERTOOLS_NO_PALLAS"):
        return False
    if platform is None:
        try:
            platform = jax.default_backend()
        except Exception:  # pragma: no cover
            return False
    return platform in ("tpu", "axon")
