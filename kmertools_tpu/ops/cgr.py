"""Chaos Game Representation kernels.

Per base the CGR walks a marker halfway from its current position
toward the base's corner (A=(0,0), T=(S,0), G=(S,S), C=(0,S)), starting
from the center (composition/src/cgr.rs:127-144). That is the linear
recurrence m_t = (m_{t-1} + c_t) / 2 — a `lax.scan` with a (R, 2) f64
carry, vectorised over all reads of the batch.

Both the add and the halving are single correctly-rounded f64 ops, so
the scan reproduces the reference's sequential f64 trajectory bit for
bit (the values are dyadic rationals; rounding only occurs in the add,
in the same order).

For throughput-oriented consumers `dtype=float32` gives an approximate
trajectory; `associative=True` additionally switches to a parallel
`associative_scan` over the closed form m_t = a_t * m_0 + b_t
(different rounding order — not for byte-parity output).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def corner_tables(vecsize: float, dtype) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Corner coordinates indexed by 2-bit base code (A,C,G,T, pad)."""
    s = float(vecsize)
    cx = jnp.array([0.0, 0.0, s, s, 0.0], dtype=dtype)
    cy = jnp.array([0.0, s, s, 0.0, 0.0], dtype=dtype)
    return cx, cy


@functools.partial(jax.jit, static_argnames=("vecsize", "dtype", "associative"))
def cgr_scan(codes: jnp.ndarray, vecsize: float, dtype=jnp.float64, associative=False):
    """codes (R, W) uint8 -> (xs, ys) (R, W) dtype: marker after each base."""
    cx_t, cy_t = corner_tables(vecsize, dtype)
    cx = cx_t[codes.astype(jnp.int32)]
    cy = cy_t[codes.astype(jnp.int32)]
    half = jnp.asarray(0.5, dtype)
    center = jnp.asarray(vecsize / 2.0, dtype)
    if associative:
        # m_t = 0.5 * m_{t-1} + 0.5 * c_t ; compose (a, b) pairs
        a = jnp.full_like(cx, half)
        bx = cx * half
        by = cy * half

        def combine(l, r):
            (la, lbx, lby), (ra, rbx, rby) = l, r
            return la * ra, lbx * ra + rbx, lby * ra + rby

        aa, sbx, sby = lax.associative_scan(combine, (a, bx, by), axis=1)
        return aa * center + sbx, aa * center + sby

    init = jnp.full((codes.shape[0], 2), center, dtype=dtype)
    corners = jnp.stack([cx, cy], axis=-1).swapaxes(0, 1)  # (W, R, 2)
    # under shard_map the scanned corners are device-varying but a
    # fresh-constant carry is replicated, which lax.scan rejects; adding
    # input-derived zeros gives the carry the input's variance (a no-op
    # add otherwise, folded by XLA)
    init = init + jnp.zeros_like(corners[0])

    def step(m, c):
        m2 = (m + c) * half
        return m2, m2

    _, out = lax.scan(step, init, corners)
    out = out.swapaxes(0, 1)  # (R, W, 2)
    return out[..., 0], out[..., 1]


def kmer_cgr_points(kmers_codes, vecsize: float):
    """CGR endpoint of short fixed k-mers (oligocgr.rs:123-143).

    kmers_codes: (N, k) int array of base codes. Returns (N,) f64 x, y.
    Tiny and init-time only, so computed in plain numpy f64 on host.
    """
    import numpy as np

    s = float(vecsize)
    cx_t = np.array([0.0, 0.0, s, s], dtype=np.float64)
    cy_t = np.array([0.0, s, s, 0.0], dtype=np.float64)
    x = np.full(kmers_codes.shape[0], s / 2.0)
    y = np.full(kmers_codes.shape[0], s / 2.0)
    for j in range(kmers_codes.shape[1]):
        x = (x + cx_t[kmers_codes[:, j]]) / 2.0
        y = (y + cy_t[kmers_codes[:, j]]) / 2.0
    return x, y
