"""Pallas merge-path accumulator merge (ops/pallas_merge.py).

Oracle: the XLA bitonic network (ops/count.py:merge_sorted_batch),
itself golden-pinned through the counter suite. The kernel runs in
interpret mode here (CPU test env); the Mosaic lowering is exercised
by the on-chip gate (evidence/) and the verify skill.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from kmertools_tpu.ops import count as cops
from kmertools_tpu.ops.pallas_merge import merge_sorted_pallas

SENT = np.uint32(0xFFFFFFFF)


def _acc(keys_hi, keys_lo, cnts, C):
    """Sentinel-tailed accumulator arrays of capacity C."""
    n = len(keys_hi)
    ah = np.full(C, SENT, np.uint32)
    al = np.full(C, SENT, np.uint32)
    ac = np.zeros(C, np.uint32)
    ah[:n] = keys_hi
    al[:n] = keys_lo
    ac[:n] = cnts
    return ah, al, ac


def _batch(keys_hi, keys_lo, M):
    bh = np.full(M, SENT, np.uint32)
    bl = np.full(M, SENT, np.uint32)
    bh[: len(keys_hi)] = keys_hi
    bl[: len(keys_lo)] = keys_lo
    return bh, bl


def _sorted_pairs(rng, n, hi_max, lo_max, dup_pool=None):
    if dup_pool is not None:
        hi = rng.choice(dup_pool[0], n)
        lo = rng.choice(dup_pool[1], n)
    else:
        hi = rng.integers(0, hi_max, n, dtype=np.uint32)
        lo = rng.integers(0, lo_max, n, dtype=np.uint32)
    key = hi.astype(np.uint64) << np.uint64(32) | lo
    order = np.argsort(key)
    return hi[order], lo[order]


def _check(ah, al, ac, bh, bl, tile=256):
    got = merge_sorted_pallas(
        jnp.asarray(ah), jnp.asarray(al), jnp.asarray(ac),
        jnp.asarray(bh), jnp.asarray(bl), tile=tile, interpret=True,
    )
    want = cops.merge_sorted_batch(
        jnp.asarray(ah), jnp.asarray(al), jnp.asarray(ac),
        jnp.asarray(bh), jnp.asarray(bl),
    )
    n_got = int(got[3])
    n_want = int(want[3])
    assert n_got == n_want, f"n_runs {n_got} != {n_want}"
    for g, w, name in zip(got[:3], want[:3], "hi lo cnt".split()):
        g = np.asarray(g)[:n_got]
        w = np.asarray(w)[:n_want]
        assert np.array_equal(g, w), (
            f"{name} mismatch: {g[:10]} vs {w[:10]}"
        )
    # tail contract: sentinels / zero counts
    oh = np.asarray(got[0])
    oc = np.asarray(got[2])
    assert (oh[n_got:] == SENT).all()
    assert (oc[n_got:] == 0).all()
    return n_got


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("shape", [(256, 256), (512, 300), (300, 512)])
def test_merge_random(seed, shape):
    C, M = shape
    rng = np.random.default_rng(seed)
    na = rng.integers(0, C - 8)
    hi, lo = _sorted_pairs(rng, na, 50, 1 << 31)
    # accumulator keys must be unique
    key = hi.astype(np.uint64) << np.uint64(32) | lo
    _, idx = np.unique(key, return_index=True)
    hi, lo = hi[np.sort(idx)], lo[np.sort(idx)]
    cnts = rng.integers(1, 100, len(hi)).astype(np.uint32)
    ah, al, ac = _acc(hi, lo, cnts, C)
    nb = rng.integers(0, M)
    bhi, blo = _sorted_pairs(rng, nb, 50, 1 << 31)
    bh, bl = _batch(bhi, blo, M)
    _check(ah, al, ac, bh, bl)


def test_merge_heavy_duplicates_span_tiles():
    """One key repeated across many tiles: the carry chain must sum a
    run far longer than a tile, and inject across every boundary."""
    C, M = 512, 1024
    ah, al, ac = _acc(
        np.array([3], np.uint32), np.array([7], np.uint32),
        np.array([5], np.uint32), C,
    )
    bh, bl = _batch(
        np.full(900, 3, np.uint32), np.full(900, 7, np.uint32), M
    )
    n = _check(ah, al, ac, bh, bl, tile=256)
    assert n == 1


def test_merge_empty_sides():
    C, M = 256, 256
    # empty accumulator
    ah, al, ac = _acc(
        np.empty(0, np.uint32), np.empty(0, np.uint32),
        np.empty(0, np.uint32), C,
    )
    bhi, blo = _sorted_pairs(np.random.default_rng(9), 100, 4, 1000)
    bh, bl = _batch(bhi, blo, M)
    _check(ah, al, ac, bh, bl)
    # empty batch
    hi, lo = _sorted_pairs(np.random.default_rng(10), 60, 4, 1000)
    key = hi.astype(np.uint64) << np.uint64(32) | lo
    _, idx = np.unique(key, return_index=True)
    hi, lo = hi[np.sort(idx)], lo[np.sort(idx)]
    ah, al, ac = _acc(hi, lo, np.full(len(hi), 2, np.uint32), C)
    bh, bl = _batch(np.empty(0, np.uint32), np.empty(0, np.uint32), M)
    _check(ah, al, ac, bh, bl)
    # both empty
    ah, al, ac = _acc(
        np.empty(0, np.uint32), np.empty(0, np.uint32),
        np.empty(0, np.uint32), C,
    )
    assert _check(ah, al, ac, bh, bl) == 0


def test_merge_extreme_lo_values():
    """lo = 0xFFFFFFFF is a REAL key half (poly-T 16-mer) and must not
    be confused with the sentinel pair."""
    C, M = 256, 128
    ah, al, ac = _acc(
        np.array([0, 1], np.uint32),
        np.array([0xFFFFFFFF, 0], np.uint32),
        np.array([9, 9], np.uint32), C,
    )
    bh, bl = _batch(
        np.array([0, 0, 1], np.uint32),
        np.array([5, 0xFFFFFFFF, 0], np.uint32), M,
    )
    _check(ah, al, ac, bh, bl)


def test_merge_exact_tile_boundaries():
    """Runs ending exactly at tile edges; C + M an exact tile multiple."""
    C, M = 256, 256
    hi = np.zeros(128, np.uint32)
    lo = (np.arange(128) * 2).astype(np.uint32)
    ah, al, ac = _acc(hi, lo, np.ones(128, np.uint32), C)
    # batch hits every accumulator key once and adds new odd keys
    bh, bl = _batch(
        np.zeros(256, np.uint32),
        np.sort(np.concatenate([lo, lo + 1]).astype(np.uint32)), M,
    )
    n = _check(ah, al, ac, bh, bl, tile=256)
    assert n == 256


def test_accum_merge_pallas_path(monkeypatch):
    """accum_merge routes through the Pallas kernel when the merge
    gate says TPU: force it in interpret mode and compare against the
    XLA-network path on the same inputs."""
    import kmertools_tpu.ops.pallas_merge as pm

    rng = np.random.default_rng(4)
    codes = rng.integers(0, 5, size=(16, 64)).astype(np.uint8)
    k = 21
    C = 4096 - 16 * 64  # C + M power of two (merge_sorted_batch needs it)

    sentf = np.full(C, SENT, np.uint32)
    base = (sentf.copy(), sentf.copy(), np.zeros(C, np.uint32))

    want = cops.accum_merge(
        jnp.asarray(base[0]), jnp.asarray(base[1]), jnp.asarray(base[2]),
        jnp.asarray(codes), k,
    )
    want = [np.asarray(w) for w in want]
    # accum_merge is jitted: drop the cached XLA-path trace so the
    # monkeypatched gate is consulted again
    cops.accum_merge.clear_cache()
    monkeypatch.setattr(pm, "use_pallas_merge", lambda platform=None: True)
    real = pm.merge_sorted_pallas
    monkeypatch.setattr(
        pm, "merge_sorted_pallas",
        lambda *a, **kw: real(*a, tile=256, interpret=True),
    )
    got = cops.accum_merge(
        jnp.asarray(base[0]), jnp.asarray(base[1]), jnp.asarray(base[2]),
        jnp.asarray(codes), k,
    )
    cops.accum_merge.clear_cache()  # don't leak the forced path
    assert int(got[3]) == int(want[3])
    n = int(got[3])
    for g, w in zip(got[:3], want[:3]):
        assert np.array_equal(np.asarray(g)[:n], w[:n])


def test_merge_small_b_window_branch():
    """tile >= 2048 enables the narrow-B (WB = T/4) network branch:
    a sparse batch (every tile's span fits WB) must merge exactly, and
    a DENSE region (spans exceeding WB) must fall back to the full 2T
    network per tile — both vs the XLA oracle, duplicates included."""
    rng = np.random.default_rng(21)
    C, M = 60_000, 2_500
    # sparse: ~2.5k batch keys spread over 60k accumulator keys ->
    # per-8064-tile spans ~340 << WB-128
    hi, lo = _sorted_pairs(rng, C // 2, 1 << 8, 1 << 30)
    ah, al, ac = _acc(hi, lo, rng.integers(1, 9, len(hi)), C)
    bhs, bls_ = _sorted_pairs(rng, M - 64, 1 << 8, 1 << 30)
    bh, bl = _batch(bhs, bls_, M)
    _check(ah, al, ac, bh, bl, tile=2048)

    # dense cluster: all batch keys inside ONE narrow key range so a
    # single tile's span is the whole batch (> WB - 128 at WB = 512)
    # -> that tile takes the full-network fallback
    bh2 = np.full(M, 3, np.uint32)
    bl2 = np.sort(rng.integers(0, 1 << 12, M).astype(np.uint32))
    _check(ah, al, ac, bh2, bl2, tile=2048)

    # duplicates across A and B in the small-branch regime
    pool_hi = rng.integers(0, 4, 64, dtype=np.uint32)
    pool_lo = rng.integers(0, 1 << 10, 64, dtype=np.uint32)
    hi3, lo3 = _sorted_pairs(rng, 2_000, 0, 0, (pool_hi, pool_lo))
    # unique-ify A (accumulator holds unique keys)
    key3 = (hi3.astype(np.uint64) << np.uint64(32)) | lo3
    _, idx = np.unique(key3, return_index=True)
    ah3, al3, ac3 = _acc(
        hi3[idx], lo3[idx], rng.integers(1, 5, len(idx)), C
    )
    bh4, bl4 = _sorted_pairs(rng, 1_500, 0, 0, (pool_hi, pool_lo))
    bhp, blp = _batch(bh4, bl4, M)
    _check(ah3, al3, ac3, bhp, blp, tile=2048)
