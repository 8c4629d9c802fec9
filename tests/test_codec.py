"""Unit tests for codecs and canonical maps (ports of the reference's
exact-value tests: kmer/src/kmer.rs:113-176, kmer/src/lib.rs:56-71)."""

import numpy as np

from kmertools_tpu.utils import codec


def test_numeric_to_kmer():
    assert codec.numeric_to_kmer(0b0001101111, 5) == "ACGTT"
    assert codec.numeric_to_kmer(0b0000011011, 5) == "AACGT"


def test_kmer_to_numeric():
    f, r = codec.kmer_to_numeric("ACGTT")
    assert f == 0b0001101111
    assert r == 0b0000011011


def test_rev_comp():
    assert codec.rev_comp(0b00011011, 4) == 0b00011011
    assert codec.rev_comp(0b001101101011, 6) == 0b000101100011


def test_pos_maps_k4():
    pos_map, pos_kmer, count = codec.kmer_pos_maps(4)
    assert count == 136
    assert len(pos_kmer) == 136
    assert (pos_map < 136).all()
    assert pos_map[0] == 0  # AAAA
    assert pos_map[0b11111111] == 0  # TTTT (canonical entries only)
    assert pos_map[0b11] == 0b11  # AAAT -> 11
    # exactly one zero among canonical slots besides AAAA
    assert int((pos_map > 0).sum()) == 135


def test_canonical_slot_table():
    tbl = codec.canonical_slot_table(4)
    pos_map, _, _ = codec.kmer_pos_maps(4)
    # every kmer maps to its canonical slot
    for kmer in [0, 3, 0b11111111, 0b10010011]:
        canon = min(kmer, codec.rev_comp(kmer, 4))
        assert tbl[kmer] == pos_map[canon]


def test_numeric_to_kmer_array():
    arr = codec.numeric_to_kmer_array(np.array([0b0001101111, 0b0000011011]), 5)
    assert arr[0] == b"ACGTT"
    assert arr[1] == b"AACGT"
