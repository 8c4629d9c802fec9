"""
Pykmertools: kmertools python wrapper (TPU-native implementation)

Signature-compatible with the reference PyO3 stub
(pybindings/pykmertools.pyi:1-244): classes, methods, argument
names/defaults, return shapes and raise conditions below are the
drop-in contract a reference user relies on.

Modules:
    OligoComputer      - computing oligonucleotide frequency vectors
                         from DNA sequences
    CgrComputer        - computing chaos game representations
                         for DNA sequences
    KmerGenerator      - an iterator object to generate k-mers
                         as (forward, reverse) numeric kmer tuples
    MinimiserGenerator - an iterator object to iterate minimisers
                         as (kmer, start, end) numeric minimiser tuples
"""

from typing import Dict, Iterator, List, Tuple

Point = Tuple[float, float]

class utils:
    """Codec helpers (reference ``utils`` submodule,
    pybindings/src/kmer.rs:67-73)."""

    @staticmethod
    def to_acgt(kmer: int, ksize: int) -> str:
        """
        Convert a numeric k-mer to its string form.

        Args:
            kmer (int): Numeric (2-bit packed) value of the k-mer.
            ksize (int): Size of the k-mer; sets the output length.

        Returns:
            str: ACGT alphabetic representation of the k-mer.
        """
        ...

    @staticmethod
    def to_numeric(kmer: str) -> Tuple[int, int]:
        """
        Convert a string k-mer to numeric form.

        Args:
            kmer (str): ACGT alphabetic representation of the k-mer.

        Returns:
            Tuple[int, int]: The (forward, reverse-complement) numeric
            pair for the k-mer.

        Raises:
            ValueError: If the k-mer is longer than 32 bases
                (pybindings/src/kmer.rs:58-63).
        """
        ...

class CgrComputer:
    """
    Computing chaos game representations (CGR) for DNA sequences.
    """

    def __init__(self, vecsize: int) -> None:
        """
        Initialise the CGR counter.

        Args:
            vecsize (int): Side length of the CGR square (the map the
                walk is scaled into).
        """
        ...

    def vectorise_one(self, seq: str) -> List[Point]:
        """
        Generate the CGR for a single sequence.

        Args:
            seq (str): The sequence as a string.

        Returns:
            List[Point]: One (x, y) marker position per base — the CGR
            trajectory of the sequence.

        Raises:
            ValueError: If the sequence contains a base outside
                AaCcGgTtUu (composition/src/cgr.rs:138-140 behavior).
        """
        ...

    def vectorise_batch(self, seqs: List[str]) -> List[List[Point]]:
        """
        Generate the CGRs for a batch of sequences.

        Args:
            seqs (List[str]): A list of sequences.

        Returns:
            List[List[Point]]: Per input sequence, its list of CGR
            trajectory points.

        Raises:
            ValueError: If any sequence contains an invalid nucleotide.
        """
        ...

class KmerGenerator:
    """
    An iterator object to generate k-mers as (forward, reverse) numeric
    kmer tuples.
    """

    def __init__(self, seq: str, ksize: int) -> None:
        """
        Initialise the KmerGenerator.

        Args:
            seq (str): The DNA sequence to generate k-mers from.
            ksize (int): The size of k-mers to generate.
        """
        ...

    def __iter__(self) -> Iterator[Tuple[int, int]]:
        """
        Iterate the sequence's k-mers.

        Returns:
            Iterator[Tuple[int, int]]: Yields one (forward,
            reverse-complement) numeric pair per k-mer position;
            windows containing an ambiguous base are skipped
            (kmer/src/kmer.rs:96-99 reset semantics).
        """
        ...

    def __next__(self) -> Tuple[int, int]:
        """
        Next (forward, reverse-complement) numeric k-mer pair.

        Returns:
            Tuple[int, int]: The pair at the iterator's position.

        Raises:
            StopIteration: At the end of the sequence.
        """
        ...

    def kmer_pos_maps(self) -> Tuple[List[int], Dict[int, int], int]:
        """
        Get the canonical k-mer index tables (kmer/src/kmer.rs:54-73).

        Returns:
            Tuple[List[int], Dict[int, int], int]: A tuple containing:
                - A list of size 4^ksize mapping every k-mer value to
                  its canonical (minimum-complement) slot.
                - A dict mapping each canonical k-mer value to its slot.
                - The number of canonical slots (e.g. 136 for k=4).
        """
        ...

class MinimiserGenerator:
    """
    An iterator object to iterate minimisers as (kmer, start, end)
    numeric minimiser tuples.
    """

    def __init__(self, seq: str, wsize: int, msize: int) -> None:
        """
        Initialise the MinimiserGenerator.

        Args:
            seq (str): The DNA sequence to generate minimisers from.
            wsize (int): Size of the window.
            msize (int): Size of the minimiser.
        """
        ...

    def __iter__(self) -> Iterator[Tuple[int, int, int]]:
        """
        Iterate the sequence's minimiser records.

        Returns:
            Iterator[Tuple[int, int, int]]: Yields one (minimiser,
            window_start, window_end) record each time the active
            minimiser changes (kmer/src/minimiser.rs:61-175 emission
            rules, including the final partial window).
        """
        ...

    def __next__(self) -> Tuple[int, int, int]:
        """
        Next (minimiser, start, end) record.

        Returns:
            Tuple[int, int, int]: The record at the iterator's position.

        Raises:
            StopIteration: After the final window's record.
        """
        ...

    def to_acgt(self, mmer: int) -> str:
        """
        Render a numeric minimiser in ACGT form.

        Args:
            mmer (int): Numeric value of the minimiser.

        Returns:
            str: ACGT alphabetic representation, msize characters long.
        """
        ...

class OligoComputer:
    """
    Computing oligonucleotide frequency vectors from DNA sequences.
    """

    def __init__(self, k: int) -> None:
        """
        Initialise the OligoComputer.

        Args:
            k (int): The size of the oligonucleotides to compute.
        """
        ...

    def vectorise_one(
        self, seq: str, norm: bool = True, mins: bool = True
    ) -> List[float]:
        """
        Compute the frequency vector for a single sequence.

        Args:
            seq (str): The sequence as a string.
            norm (bool): Normalise counts by the sequence's k-mer total.
            mins (bool): Count canonical (minimum-complement) k-mers
                only (136 bins for k=4); False counts raw forward
                k-mers over all 4^k bins.

        Returns:
            List[float]: The oligonucleotide frequency vector.

        Raises:
            ValueError: If the sequence contains an invalid nucleotide.
        """
        ...

    def vectorise_batch(
        self, seqs: List[str], norm: bool = True, mins: bool = True
    ) -> List[List[float]]:
        """
        Compute frequency vectors for a batch of sequences.

        Args:
            seqs (List[str]): A list of sequences.
            norm (bool): Normalise counts by each sequence's k-mer
                total.
            mins (bool): Count canonical (minimum-complement) k-mers
                only.

        Returns:
            List[List[float]]: Per input sequence, its frequency
            vector.

        Raises:
            ValueError: If any sequence contains an invalid nucleotide.
        """
        ...

    def get_header(self, mins: bool = True) -> List[str]:
        """
        Generate the header for the oligonucleotide vector.

        Args:
            mins (bool): Canonical (minimum-complement) layout when
                True; raw 4^k layout otherwise.

        Returns:
            List[str]: ACGT column labels matching the vector layout.
        """
        ...

def run_cli(argv: List[str] | None = None) -> int:
    """
    Re-enter the full kmertools CLI (the PyPI wheel's console script,
    pip/src/lib.rs:11-18).

    Args:
        argv (List[str] | None): Arguments after the program name;
            None reads sys.argv.

    Returns:
        int: Process exit code (0 on success).
    """
    ...

__all__ = [
    "CgrComputer",
    "KmerGenerator",
    "MinimiserGenerator",
    "OligoComputer",
    "utils",
    "run_cli",
]
