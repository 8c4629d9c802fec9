"""kmertools_tpu — TPU-native DNA vectorisation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`kmertools` (reference: /root/reference, a Rust CLI + PyO3 library).

Workloads (reference README.md:36-42):
  * Oligonucleotide frequency vectors  (k = 3..7)     -> workloads.oligo
  * Exact k-mer counting               (k = 10..31)   -> workloads.counter
  * Minimiser binning                                 -> workloads.minimisers
  * Chaos Game Representation (CGR) vectors           -> workloads.cgr
  * Coverage histograms                               -> workloads.coverage

Design: host I/O (io/) produces fixed-shape padded code batches; device
kernels (ops/) compute k-mer ids as static shift-add windows, per-read
histograms as one-hot factored MXU matmuls, minimisers as vectorised
sliding-window minima, CGR as a scanned linear recurrence and counting
as multi-key sort + run-length encoding; parallel/ scales the same
kernels over a `jax.sharding.Mesh` with shard_map + collectives.
"""

import os as _os

from kmertools_tpu.version import __version__

__all__ = ["__version__"]


def _configure_jax() -> None:
    """Enable JAX's persistent compilation cache (opt-out via
    KMERTOOLS_NO_JAX_CACHE / KMERTOOLS_JAX_CACHE_DIR).

    Remote TPU compiles can take minutes with high variance; every
    batch-bucket shape compiles exactly once per machine and is reused
    by all later runs (CLI invocations, bench, pipelines).
    """
    if _os.environ.get("KMERTOOLS_NO_JAX_CACHE"):
        return
    cache = _os.environ.get(
        "KMERTOOLS_JAX_CACHE_DIR",
        _os.path.join(
            _os.environ.get("XDG_CACHE_HOME", _os.path.expanduser("~/.cache")),
            "kmertools_tpu",
            "jax_cache",
        ),
    )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        # Explicit backend pin. Site hooks (e.g. an accelerator plugin's
        # sitecustomize) may set JAX_PLATFORMS after Python start, which
        # jax has already captured — a plain env var cannot override
        # them. KMERTOOLS_PLATFORM=cpu forces the CPU backend even so
        # (useful when the accelerator transport is down).
        plat = _os.environ.get("KMERTOOLS_PLATFORM")
        if plat:
            jax.config.update("jax_platforms", plat)
    except Exception:  # pragma: no cover - jax absent or too old
        pass


_configure_jax()
