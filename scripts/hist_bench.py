"""Microbenchmark for the native oligo histogram kernel.

Measures kt_oligo_hist codes/s on clean (ambiguity-free) contig-scale
rows — the configuration the headline bench exercises. Used to compare
kernel variants (e.g. striped count arrays) without end-to-end noise.
"""

import ctypes
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kmertools_tpu import native
from kmertools_tpu.utils import codec

K = int(os.environ.get("HB_K", 4))
ROWS = int(os.environ.get("HB_ROWS", 2048))
WIDTH = int(os.environ.get("HB_WIDTH", 5000))
THREADS = int(os.environ.get("HB_THREADS", 1))
REPS = int(os.environ.get("HB_REPS", 8))


def main() -> None:
    so = native.lib()
    assert so is not None, "native runtime unavailable"
    nbins = 136 if K == 4 else int(codec.canonical_slot_table(K).max()) + 1
    table = np.ascontiguousarray(codec.canonical_slot_table(K), np.int32)
    rng = np.random.default_rng(0)
    # random 2-bit packed rows, fully valid
    packed = rng.integers(0, 256, (ROWS, WIDTH // 4), np.uint8)
    packed = np.ascontiguousarray(packed, np.uint8)
    vb = np.full((ROWS, WIDTH // 8), 0xFF, np.uint8)
    fused = np.empty((ROWS, nbins + 1), np.int16)
    totals = np.empty((ROWS,), np.int32)
    i16_p = ctypes.POINTER(ctypes.c_int16)
    args = (
        packed.ctypes.data_as(native.c_u8_p),
        vb.ctypes.data_as(native.c_u8_p),
        ROWS, WIDTH, K,
        table.ctypes.data_as(native.c_i32_p), nbins,
        fused.ctypes.data_as(i16_p),
        totals.ctypes.data_as(native.c_i32_p),
        THREADS, nbins + 1,
    )
    codes = ROWS * (WIDTH - K + 1)
    assert so.kt_oligo_hist(*args) == 0  # warm
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        assert so.kt_oligo_hist(*args) == 0
        best = min(best, time.perf_counter() - t0)
    print(
        f"k={K} rows={ROWS} width={WIDTH} threads={THREADS}: "
        f"{codes / best / 1e9:.3f} Gcodes/s (best of {REPS}, "
        f"{best * 1e3:.2f} ms)  checksum={int(fused[:, :nbins].sum())}"
    )


if __name__ == "__main__":
    main()
