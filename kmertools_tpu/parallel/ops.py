"""Multi-chip collective kernels (shard_map over a 1-D mesh).

TPU-native equivalents of the reference's concurrency machinery
(SURVEY.md section 2 parallelism table):

  * work-stealing read loop  -> data-parallel row shards (shard_map)
  * scc::HashMap shard upsert -> psum of dense histograms (small k)
  * `min_mer % n_parts` k-mer-space sharding (counter/src/lib.rs:127)
     -> all_to_all exchange of hash-partitioned k-mer buckets, then a
        local sort/RLE per partition owner (large k)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from kmertools_tpu.ops import encode, histogram
from kmertools_tpu.ops.count import batch_count_runs
from kmertools_tpu.parallel.mesh import DATA_AXIS

_SENT = jnp.uint32(0xFFFFFFFF)


def distributed_oligo_step(mesh, slot_table, k: int, nbins: int):
    """Data-parallel per-read oligo histograms: codes sharded on rows,
    outputs sharded the same way. No collectives needed — the point is
    the sharding annotation so XLA partitions the MXU histogram."""

    def step(codes, table):
        fwd, rc, valid = encode.kmer_ids_small(codes, k)
        ids = jnp.minimum(fwd, rc)
        return histogram.per_read_histogram_gathered(ids, valid, table, nbins)

    return jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(P(DATA_AXIS, None), P()),
            out_specs=(P(DATA_AXIS, None), P(DATA_AXIS)),
        )
    )


def distributed_dense_count(mesh, k: int):
    """Global dense canonical k-mer histogram (k <= 7): per-device MXU
    histogram of its read shard + psum over the mesh — the collective
    replacement for the reference's shared concurrent count map."""
    from kmertools_tpu.utils.codec import canonical_slot_table
    import numpy as np

    nbins = int(canonical_slot_table(k).max()) + 1

    def step(codes, table):
        fwd, rc, valid = encode.kmer_ids_small(codes, k)
        ids = jnp.minimum(fwd, rc)
        counts, _ = histogram.per_read_histogram_gathered(ids, valid, table, nbins)
        local = jnp.sum(counts, axis=0)
        return lax.psum(local, DATA_AXIS)

    table = jnp.asarray(canonical_slot_table(k))
    fn = jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(P(DATA_AXIS, None), P()),
            out_specs=P(),
        )
    )
    return lambda codes: fn(codes, table)


def partitioned_count_exchange(mesh, k: int, capacity: int):
    """Large-k distributed counting: each device extracts canonical
    (hi, lo) pairs from its read shard, buckets them by
    ``lo % n_devices`` (the `min_mer % n_parts` analog), all_to_all
    exchanges fixed-capacity buckets over ICI, and sort/RLE-counts the
    partition it owns.

    Returns fn(codes_sharded) -> (kmer_hi, kmer_lo, counts, first,
    overflowed) with leading dim sharded by partition owner.
    `overflowed` is a per-device bool: a bucket exceeded `capacity`
    and was truncated — the host should re-run with smaller shards.
    """
    ndev = mesh.devices.size

    def step(codes):
        hi, lo, _ = encode.canonical_ids_pair(codes, k)  # invalid -> sentinel
        fh = hi.reshape(-1)
        fl = lo.reshape(-1)
        part = jnp.where(
            (fh == _SENT) & (fl == _SENT),
            jnp.uint32(ndev),  # sentinels to the overflow tail
            fl % jnp.uint32(ndev),
        )
        sp, sh, sl = lax.sort((part, fh, fl), num_keys=3)
        n = sp.shape[0]
        # per-partition ranges in the sorted order
        iota_parts = jnp.arange(ndev + 1, dtype=jnp.uint32)
        starts = jnp.searchsorted(sp, iota_parts, side="left").astype(jnp.int32)
        counts_per_part = starts[1:] - starts[:-1]
        overflow = jnp.any(counts_per_part > capacity)
        # gather each partition's slice into a fixed-capacity bucket
        buckets_h = []
        buckets_l = []
        valid_n = []
        pad_h = jnp.full((capacity,), _SENT, jnp.uint32)
        for d in range(ndev):
            s = jnp.minimum(starts[d], n - 1)
            bh = lax.dynamic_slice(jnp.concatenate([sh, pad_h]), (s,), (capacity,))
            bl = lax.dynamic_slice(jnp.concatenate([sl, pad_h]), (s,), (capacity,))
            m = jnp.minimum(counts_per_part[d], capacity)
            idx = jnp.arange(capacity, dtype=jnp.int32)
            bh = jnp.where(idx < m, bh, _SENT)
            bl = jnp.where(idx < m, bl, _SENT)
            buckets_h.append(bh)
            buckets_l.append(bl)
            valid_n.append(m)
        bh = jnp.stack(buckets_h)  # (ndev, capacity)
        bl = jnp.stack(buckets_l)
        # exchange: device i sends bucket d to device d
        xh = lax.all_to_all(bh, DATA_AXIS, split_axis=0, concat_axis=0, tiled=False)
        xl = lax.all_to_all(bl, DATA_AXIS, split_axis=0, concat_axis=0, tiled=False)
        # local count of the owned partition
        fh2 = xh.reshape(-1)
        fl2 = xl.reshape(-1)
        sh2, sl2 = lax.sort((fh2, fl2), num_keys=2)
        ph = jnp.concatenate([jnp.full((1,), ~_SENT, jnp.uint32), sh2[:-1]])
        pl = jnp.concatenate([jnp.full((1,), ~_SENT, jnp.uint32), sl2[:-1]])
        first = ((sh2 != ph) | (sl2 != pl)).at[0].set(True)
        idx = jnp.arange(sh2.shape[0], dtype=jnp.int32)
        nxt = jnp.concatenate([first[1:], jnp.ones((1,), bool)])
        bpos = jnp.where(nxt, idx + 1, sh2.shape[0])
        nb = lax.associative_scan(jnp.minimum, bpos, reverse=True)
        counts = nb - idx
        return (
            sh2[None],
            sl2[None],
            counts[None],
            first[None],
            overflow[None],
        )

    return jax.jit(
        shard_map(
            step,
            mesh=mesh,
            in_specs=(P(DATA_AXIS, None),),
            out_specs=(
                P(DATA_AXIS, None),
                P(DATA_AXIS, None),
                P(DATA_AXIS, None),
                P(DATA_AXIS, None),
                P(DATA_AXIS),
            ),
        )
    )
