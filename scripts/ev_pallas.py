"""Pallas Mosaic lowering probe on the live backend (verify skill)."""

import numpy as np
import jax.numpy as jnp

from kmertools_tpu.ops import pallas_histogram as ph

assert ph.use_pallas(), "pallas path not active on this backend"
ids = jnp.asarray(
    np.random.default_rng(0).integers(0, 136, (128, 125), np.int32)
)
valid = jnp.ones((128, 125), bool)
bv = jnp.arange(136, dtype=jnp.int32)
counts, totals = ph.per_read_histogram_tpu(ids, valid, bv, 136)
assert int(jnp.sum(counts)) == 128 * 125 == int(jnp.sum(totals))
print("PALLAS-TPU-OK")
