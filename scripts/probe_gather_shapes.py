"""On-chip probe: which (rows, S, planes) gather-operand shapes run at
the blocks-join rate? Isolates why lookup_bins_direct (one gather of
(524288, 56, 2) rows) measured 7x SLOWER than lookup_counts_blocks
(two gathers of (101k, 128, 3)) — candidate culprits: non-pow2 /
non-128 S, 2-element minor dim, operand row count. Tables are
generated ON DEVICE inside the program (a big host-side constant would
blow the remote compile service's request-size limit — observed
HTTP 413 at ~268 MB). Each case: fori_loop over 245 chunks of 16384
random row gathers + a full-element reduce (so XLA cannot narrow the
gather), chained x4, fetch-synced (kernel_rates.py protocol)."""

import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, "/root/repo/scripts")
import kernel_rates as kr  # noqa: E402

CASES = [
    ("blocks-like  (101k,128,3)", 101_563, 128, 3),
    ("direct-as-is (524k, 56,2)", 524_288, 56, 2),
    ("direct-pow2  (524k, 64,2)", 524_288, 64, 2),
    ("direct-p3    (524k, 64,3)", 524_288, 64, 3),
    ("direct-S128  (524k,128,2)", 524_288, 128, 2),
    ("direct-S128p1(524k,128,1)", 524_288, 128, 1),
    ("direct-S128  (262k,128,2)", 262_144, 128, 2),
    ("direct-flat  (524k,112,1)", 524_288, 112, 1),
]

Q = 4_000_000
CHUNK = 16384


def main():
    devs = jax.devices()
    print("backend:", devs[0].platform, devs[0].device_kind, flush=True)
    rng = np.random.default_rng(0)
    qidx_np = rng.integers(0, 1 << 30, Q, dtype=np.int32)
    qidx = jax.device_put(jnp.asarray(qidx_np))
    n_chunks = Q // CHUNK
    for label, R, S, P in CASES:
        shape = (R, S) if P == 1 else (R, S, P)

        def make_step(n, shape=shape, R=R):
            def run():
                total = int(np.prod(shape))
                tbl = (
                    lax.iota(jnp.int32, total) * jnp.int32(0x1E3779B1)
                ).reshape(shape)

                def body(i, carry):
                    qc, acc = carry

                    def chunk_body(j, out):
                        off = j * CHUNK
                        cb = lax.dynamic_slice(qc, (off,), (CHUNK,))
                        g = jnp.take(tbl, cb % R, axis=0, mode="clip")
                        # sum EVERY gathered element: slicing a subset
                        # would let XLA narrow the gather itself
                        return out + jnp.sum(g, dtype=jnp.int32)

                    acc2 = lax.fori_loop(0, n_chunks, chunk_body, acc)
                    return qc ^ (acc2 & 1), acc2

                _, acc = lax.fori_loop(0, n, body, (qidx, jnp.int32(0)))
                return acc

            return run

        try:
            kr._rate_chained(
                make_step, Q, label, "probe", 1e6, "Mgather/s", chain=4
            )
        except Exception as e:  # keep probing the other shapes
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
