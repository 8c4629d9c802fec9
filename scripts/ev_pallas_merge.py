"""On-chip gate for the Pallas merge-path kernel (ops/pallas_merge.py):
compile + run through Mosaic on the real TPU and compare exactly
against the XLA bitonic network on the same inputs. Run:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/ev_pallas_merge.py
"""
import time

import numpy as np
import jax.numpy as jnp

from kmertools_tpu.ops import count as cops
from kmertools_tpu.ops.pallas_merge import merge_sorted_pallas, use_pallas_merge

SENT = np.uint32(0xFFFFFFFF)


def case(C, M, na, nb, seed, hi_max=50):
    rng = np.random.default_rng(seed)

    def pairs(n):
        hi = rng.integers(0, hi_max, n, dtype=np.uint32)
        lo = rng.integers(0, 1 << 31, n, dtype=np.uint32)
        key = hi.astype(np.uint64) << np.uint64(32) | lo
        key = np.unique(key)
        return (key >> np.uint64(32)).astype(np.uint32), key.astype(np.uint32)

    ah = np.full(C, SENT, np.uint32)
    al = np.full(C, SENT, np.uint32)
    ac = np.zeros(C, np.uint32)
    hi, lo = pairs(na)
    ah[: len(hi)] = hi
    al[: len(hi)] = lo
    ac[: len(hi)] = rng.integers(1, 100, len(hi)).astype(np.uint32)
    bh = np.full(M, SENT, np.uint32)
    bl = np.full(M, SENT, np.uint32)
    bhi = rng.integers(0, hi_max, nb, dtype=np.uint32)
    blo = rng.integers(0, 1 << 31, nb, dtype=np.uint32)
    bkey = np.sort(bhi.astype(np.uint64) << np.uint64(32) | blo)
    bh[:nb] = (bkey >> np.uint64(32)).astype(np.uint32)
    bl[:nb] = bkey.astype(np.uint32)
    return ah, al, ac, bh, bl


def run(C, M, na, nb, seed, tile=4096):
    ah, al, ac, bh, bl = case(C, M, na, nb, seed)
    t0 = time.perf_counter()
    got = merge_sorted_pallas(
        jnp.asarray(ah), jnp.asarray(al), jnp.asarray(ac),
        jnp.asarray(bh), jnp.asarray(bl), tile=tile,
    )
    n_g = int(got[3])
    t1 = time.perf_counter()
    want = cops.merge_sorted_batch(
        jnp.asarray(ah), jnp.asarray(al), jnp.asarray(ac),
        jnp.asarray(bh), jnp.asarray(bl),
    )
    n_w = int(want[3])
    assert n_g == n_w, (n_g, n_w)
    for g, w, name in zip(got[:3], want[:3], "hi lo cnt".split()):
        g = np.asarray(g)[:n_g]
        w = np.asarray(w)[:n_w]
        assert np.array_equal(g, w), f"{name}: {g[:8]} vs {w[:8]}"
    print(f"C={C} M={M}: n_runs={n_g}  pallas wall (incl 1st compile) "
          f"{t1 - t0:.1f}s  OK")


def main():
    assert use_pallas_merge(), "pallas merge gate says off on this backend"
    run(3072, 1024, 1500, 900, 0, tile=512)   # multi-tile, small
    run(6144, 2048, 4000, 2000, 1, tile=512)  # duplicate-heavy
    # tile >= 2048 engages the narrow-B branch (round 5): sparse spans
    # take it, a dense cluster forces the full-network fallback
    run(60_000, 2_500, 28_000, 2_300, 2, tile=2048)
    run(30_000, 9_000, 14_000, 8_900, 3, tile=2048)  # dense: mixed paths
    print("PALLAS-MERGE-TPU-OK")


if __name__ == "__main__":
    main()
