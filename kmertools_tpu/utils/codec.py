"""Nucleotide <-> 2-bit codecs and canonical k-mer index maps.

Behavioural contract with the reference implementation:
  * base table semantics: kmer/src/kmer.rs:6-15 (A/a->0, C/c->1, G/g->2,
    T/t/U/u->3, everything else ambiguous)
  * u64 <-> ACGT codecs: kmer/src/lib.rs:19-50
  * canonical ("min-mer") dense index: kmer/src/kmer.rs:54-73

Everything here is vectorised numpy (host side); device kernels consume
the precomputed tables.
"""

from __future__ import annotations

import functools

import numpy as np

# 256-entry lookup: ASCII byte -> 2-bit base code, 4 = ambiguous.
SEQ_NT4_TABLE = np.full(256, 4, dtype=np.uint8)
for _ch, _code in (("A", 0), ("C", 1), ("G", 2), ("T", 3), ("U", 3)):
    SEQ_NT4_TABLE[ord(_ch)] = _code
    SEQ_NT4_TABLE[ord(_ch.lower())] = _code

_BASE_CHARS = np.frombuffer(b"ACGT", dtype=np.uint8)


def rev_comp(kmer: int, ksize: int) -> int:
    """Reverse complement of a 2-bit packed k-mer (kmer/src/kmer.rs:43-52)."""
    out = 0
    for _ in range(ksize):
        out = (out << 2) | ((kmer & 3) ^ 3)
        kmer >>= 2
    return out


def _rev_comp_array(kmers: np.ndarray, ksize: int) -> np.ndarray:
    """Vectorised reverse complement over a uint64 array."""
    out = np.zeros_like(kmers)
    tmp = kmers.copy()
    for _ in range(ksize):
        out = (out << np.uint64(2)) | ((tmp & np.uint64(3)) ^ np.uint64(3))
        tmp = tmp >> np.uint64(2)
    return out


@functools.lru_cache(maxsize=None)
def kmer_pos_maps(ksize: int):
    """Dense canonical k-mer index (kmer/src/kmer.rs:54-73).

    Returns (pos_map, pos_kmer, count):
      pos_map:  int64[4^k]  canonical k-mer value -> dense slot (0 elsewhere)
      pos_kmer: dict slot -> canonical k-mer value
      count:    number of canonical k-mers (e.g. 136 for k=4)
    """
    n = 4**ksize
    kmers = np.arange(n, dtype=np.uint64)
    rc = _rev_comp_array(kmers, ksize)
    canon = np.minimum(kmers, rc)
    uniq = np.unique(canon)  # sorted
    pos_map = np.zeros(n, dtype=np.int64)
    pos_map[uniq] = np.arange(len(uniq), dtype=np.int64)
    pos_kmer = {int(i): int(v) for i, v in enumerate(uniq)}
    return pos_map, pos_kmer, len(uniq)


@functools.lru_cache(maxsize=None)
def canonical_bin_values(ksize: int) -> np.ndarray:
    """int32[n_canonical]: dense slot -> canonical k-mer value (sorted).

    The inverse of `canonical_slot_table` restricted to canonical
    values; bin c of the per-read histogram counts k-mers whose
    canonical value equals this array's element c.
    """
    n = 4**ksize
    kmers = np.arange(n, dtype=np.uint64)
    rc = _rev_comp_array(kmers, ksize)
    canon = np.minimum(kmers, rc)
    return np.unique(canon).astype(np.int32)


@functools.lru_cache(maxsize=None)
def canonical_slot_table(ksize: int) -> np.ndarray:
    """int32[4^k]: ANY k-mer value -> dense canonical slot.

    Device-friendly variant of `kmer_pos_maps` that is defined for
    non-canonical values too, so kernels can gather without computing
    min(fwd, rc) twice.
    """
    n = 4**ksize
    kmers = np.arange(n, dtype=np.uint64)
    rc = _rev_comp_array(kmers, ksize)
    canon = np.minimum(kmers, rc)
    pos_map, _, _ = kmer_pos_maps(ksize)
    return pos_map[canon].astype(np.int32)


def numeric_to_kmer(kmer: int, k: int) -> str:
    """u64 -> ACGT string (kmer/src/lib.rs:19-34)."""
    chars = []
    for _ in range(k):
        chars.append("ACGT"[kmer & 3])
        kmer >>= 2
    return "".join(reversed(chars))


def numeric_to_kmer_array(kmers: np.ndarray, k: int) -> np.ndarray:
    """Vectorised u64 -> ACGT. Returns an S{k} bytes array."""
    kmers = np.asarray(kmers, dtype=np.uint64)
    out = np.empty((len(kmers), k), dtype=np.uint8)
    for j in range(k):
        shift = np.uint64(2 * (k - 1 - j))
        out[:, j] = _BASE_CHARS[((kmers >> shift) & np.uint64(3)).astype(np.int64)]
    return out.view(f"S{k}").reshape(len(kmers))


def kmer_to_numeric(kmer: str) -> tuple[int, int]:
    """ACGT string -> (forward, revcomp) pair (kmer/src/lib.rs:36-50)."""
    fval = 0
    rval = 0
    shift = 2 * (len(kmer) - 1)
    mask = (1 << (2 * len(kmer))) - 1
    for c in kmer:
        f = int(SEQ_NT4_TABLE[ord(c) & 0xFF])
        r = f ^ 3
        fval = ((fval << 2) | f) & mask
        rval = (rval >> 2) | (r << shift)
    return fval, rval
