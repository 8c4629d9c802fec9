"""Typed public API of pykmertools.

Signature-compatible with the reference's PyO3 stub
(pybindings/pykmertools.pyi:1-244): the classes, methods, argument
names/defaults and return shapes below are the drop-in contract a
reference user relies on.
"""

from typing import Dict, Iterator, List, Tuple

Point = Tuple[float, float]

class utils:
    @staticmethod
    def to_acgt(kmer: int, ksize: int) -> str:
        """Numeric k-mer -> ACGT string of length ``ksize``."""
        ...
    @staticmethod
    def to_numeric(kmer: str) -> Tuple[int, int]:
        """ACGT string -> (forward, reverse-complement) numeric pair.

        Raises ValueError for k-mers longer than 32 bases
        (pybindings/src/kmer.rs:58-63)."""
        ...

class CgrComputer:
    """Chaos game representation points for DNA sequences."""

    def __init__(self, vecsize: int) -> None:
        """``vecsize`` sets the CGR square's side length."""
        ...
    def vectorise_one(self, seq: str) -> List[Point]:
        """One (x, y) point per base; ValueError on a non-ACGTU base."""
        ...
    def vectorise_batch(self, seqs: List[str]) -> List[List[Point]]:
        """CGR point lists for each sequence in ``seqs``."""
        ...

class KmerGenerator:
    """Iterator over (forward, reverse-complement) numeric k-mers."""

    def __init__(self, seq: str, ksize: int) -> None: ...
    def __iter__(self) -> Iterator[Tuple[int, int]]: ...
    def __next__(self) -> Tuple[int, int]: ...
    def kmer_pos_maps(self) -> Tuple[List[int], Dict[int, int], int]:
        """(kmer->slot list of size 4^k, canonical kmer->slot dict,
        canonical slot count) — kmer/src/kmer.rs:54-73 semantics."""
        ...

class MinimiserGenerator:
    """Iterator over (minimiser, window_start, window_end) records."""

    def __init__(self, seq: str, wsize: int, msize: int) -> None: ...
    def __iter__(self) -> Iterator[Tuple[int, int, int]]: ...
    def __next__(self) -> Tuple[int, int, int]: ...
    def to_acgt(self, mmer: int) -> str:
        """Numeric minimiser -> ACGT string of length ``msize``."""
        ...

class OligoComputer:
    """Oligonucleotide (k-mer) frequency vectors."""

    def __init__(self, ksize: int) -> None: ...
    def vectorise_one(
        self, seq: str, norm: bool = True, mins: bool = True
    ) -> List[float]:
        """Frequency vector for one sequence; ``mins`` selects canonical
        (min-complement) bins, ``norm`` divides by the k-mer total."""
        ...
    def vectorise_batch(
        self, seqs: List[str], norm: bool = True, mins: bool = True
    ) -> List[List[float]]:
        """Frequency vectors for a batch of sequences."""
        ...
    def get_header(self, mins: bool = True) -> List[str]:
        """ACGT column labels matching the vector layout."""
        ...

def run_cli(argv: List[str] | None = None) -> int:
    """Console entry point re-entering the full kmertools CLI
    (pip/src/lib.rs:11-18)."""
    ...

__all__ = [
    "CgrComputer",
    "KmerGenerator",
    "MinimiserGenerator",
    "OligoComputer",
    "utils",
    "run_cli",
]
