"""Pallas TPU kernel: fused per-read k-mer histogram.

The XLA path (ops/histogram.py) factors the histogram into one-hot
matmuls; XLA materialises the (R, P, 128) bf16 one-hots in HBM, so the
op runs at HBM bandwidth over ~130x the useful data. This kernel keeps
the accumulator in VMEM and streams each position's slot column through
the VPU — the only HBM traffic is the (P, R) slot/valid planes in and
the (R, C) counts out.

Layout: reads live on the *lane* dimension (inputs transposed to
(P, R) outside the kernel, output produced as (C, TILE_R) and
transposed back), so each loop step is a full-width VPU
compare-and-add of shape (C, TILE_R):

    acc[c, r] += (slots[p, r] == c) & valid[p, r]

Semantics match ops/histogram.per_read_histogram exactly (the golden
suite pins that path to the reference's per-read counts,
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


def _hist_kernel(slots_ref, valid_ref, out_ref, acc_ref, *, nbins_pad: int):
    P = slots_ref.shape[0]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (nbins_pad, _TILE_R), 0)

    acc_ref[:] = jnp.zeros((nbins_pad, _TILE_R), jnp.float32)

    def body(p, _):
        s = slots_ref[p, :].reshape(1, _TILE_R)
        v = valid_ref[p, :].reshape(1, _TILE_R)
        hit = (iota_c == s) & (v != 0)
        acc_ref[:] += hit.astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, P, body, 0)
    out_ref[:] = acc_ref[:].astype(jnp.int16)


@functools.partial(jax.jit, static_argnames=("nbins", "interpret"))
def per_read_histogram_tpu(
    slots: jnp.ndarray,
    valid: jnp.ndarray,
    nbins: int,
    interpret: bool = False,
):
    """slots (R, P) int32 in [0, nbins), valid (R, P) bool ->
    (counts int16 (R, nbins), totals int32 (R,)).

    R must be a multiple of 128 (all bucket row counts are).
    """
    R, P = slots.shape
    assert R % _TILE_R == 0, R
    C = _round_up(nbins, 128)
    slots_t = jnp.where(valid, slots, -1).T.astype(jnp.int32)  # (P, R)
    valid_t = valid.T.astype(jnp.int32)

    grid = (R // _TILE_R,)
    counts_t = pl.pallas_call(
        functools.partial(_hist_kernel, nbins_pad=C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((P, _TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, _TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (C, _TILE_R), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((C, R), jnp.int16),
        scratch_shapes=[pltpu.VMEM((C, _TILE_R), jnp.float32)],
        interpret=interpret,
    )(slots_t, valid_t)
    counts = counts_t.T[:, :nbins]
    totals = jnp.sum(valid, axis=1, dtype=jnp.int32)
    return counts, totals


def use_pallas() -> bool:
    """Pallas path is the default on real TPU hardware."""
    import os

    if os.environ.get("KMERTOOLS_NO_PALLAS"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False
