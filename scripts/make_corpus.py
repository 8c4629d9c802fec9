"""Generate a synthetic FASTA corpus (contig-scale reads, fixed seed).

Usage: python scripts/make_corpus.py OUT.fa [n_reads] [read_len]
"""

import sys

import numpy as np


def make(path: str, n_reads: int, read_len: int, seed: int = 42) -> int:
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    total = 0
    with open(path, "wb") as f:
        chunk = 2_000
        for start in range(0, n_reads, chunk):
            n = min(chunk, n_reads - start)
            seqs = bases[rng.integers(0, 4, size=(n, read_len))]
            blocks = []
            for i in range(n):
                blocks.append(b">c%d\n%s\n" % (start + i, seqs[i].tobytes()))
            f.write(b"".join(blocks))
            total += n * read_len
    return total


if __name__ == "__main__":
    out = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000
    L = int(sys.argv[3]) if len(sys.argv) > 3 else 5_000
    print(make(out, n, L))
