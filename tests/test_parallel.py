"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kmertools_tpu.io.batch import encode_bases
from kmertools_tpu.parallel import (
    distributed_dense_count,
    distributed_oligo_step,
    make_mesh,
    partitioned_count_exchange,
)
from kmertools_tpu.parallel.mesh import shard_batch
from kmertools_tpu.utils import codec


def _random_codes(rng, rows, width, n_frac=0.02):
    codes = rng.integers(0, 4, size=(rows, width)).astype(np.uint8)
    mask = rng.random((rows, width)) < n_frac
    codes[mask] = 4
    return codes


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_distributed_oligo_matches_single(mesh):
    rng = np.random.default_rng(0)
    codes = _random_codes(rng, 64, 128)
    table = jnp.asarray(codec.canonical_slot_table(4))
    fn = distributed_oligo_step(mesh, table, 4, 136)
    counts, totals = fn(shard_batch(mesh, codes), table)
    from kmertools_tpu.ops import encode, histogram

    fwd, rc, valid = encode.kmer_ids_small(jnp.asarray(codes), 4)
    ids = jnp.minimum(fwd, rc)
    ref_counts, ref_totals = histogram.per_read_histogram_gathered(
        ids, valid, table, 136
    )
    assert np.array_equal(np.asarray(counts), np.asarray(ref_counts))
    assert np.array_equal(np.asarray(totals), np.asarray(ref_totals))


def test_distributed_dense_count(mesh):
    rng = np.random.default_rng(1)
    codes = _random_codes(rng, 64, 128)
    fn = distributed_dense_count(mesh, 5)
    global_counts = np.asarray(fn(shard_batch(mesh, codes)))
    # brute force
    pos_map, _, kcount = codec.kmer_pos_maps(5)
    want = np.zeros(kcount)
    for row in codes:
        for i in range(len(row) - 4):
            win = row[i : i + 5]
            if (win >= 4).any():
                continue
            f = 0
            for c in win:
                f = f * 4 + int(c)
            r = codec.rev_comp(f, 5)
            want[pos_map[min(f, r)]] += 1
    assert np.array_equal(global_counts, want)


def test_partitioned_count_exchange(mesh):
    rng = np.random.default_rng(2)
    codes = _random_codes(rng, 32, 128)
    k = 21
    cap = 32 * 128  # generous
    fn = partitioned_count_exchange(mesh, k, cap)
    sh, sl, counts, first, overflow = fn(shard_batch(mesh, codes))
    assert not np.asarray(overflow).any()
    sh = np.asarray(sh).reshape(8, -1)
    sl = np.asarray(sl).reshape(8, -1)
    counts = np.asarray(counts).reshape(8, -1)
    first = np.asarray(first).reshape(8, -1)
    got = {}
    nlo = 16
    for d in range(8):
        sel = first[d] & ~((sh[d] == 0xFFFFFFFF) & (sl[d] == 0xFFFFFFFF))
        for h, l, c in zip(sh[d][sel], sl[d][sel], counts[d][sel]):
            key = (int(h) << (2 * nlo)) | int(l)
            # partition ownership: lo % 8 == d
            assert int(l) % 8 == d
            got[key] = got.get(key, 0) + int(c)
    # brute force over all rows
    want = {}
    for row in codes:
        run = 0
        for i in range(len(row)):
            run = run + 1 if row[i] < 4 else 0
            if run >= k:
                f = 0
                for c in row[i - k + 1 : i + 1]:
                    f = f * 4 + int(c)
                key = min(f, codec.rev_comp(f, k))
                want[key] = want.get(key, 0) + 1
    assert got == want
