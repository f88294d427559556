"""illico_tpu — TPU-native asymptotic Wilcoxon rank-sum tests.

A from-scratch TPU (JAX/XLA/Pallas) framework with the capabilities of the
``illico`` reference library: blazing-fast asymptotic Mann-Whitney U tests for
single-cell differential expression, OVO and OVR, over dense / CSR / CSC /
h5ad-backed matrices, with exact U statistics and 1e-12 p-value parity versus
``scipy.stats.mannwhitneyu``.
"""

# float64 is a correctness requirement for the small cross-block reductions
# and tie sums; the engines enable it *locally* at trace time
# (``jax.enable_x64(True)`` contexts) — this library never mutates the global
# x64 flag, and Pallas kernels trace with x64 off as Mosaic requires.
from illico_tpu.api import asymptotic_wilcoxon, asymptotic_wilcoxon_arrays

__all__ = [
    "asymptotic_wilcoxon",
    "asymptotic_wilcoxon_arrays",
    "asymptotic_wilcoxon_multihost",
    "enable_compilation_cache",
]
__version__ = "0.1.8"


def __getattr__(name):
    # Lazy: the multi-host path pulls in jax.distributed machinery that a
    # plain single-host import should not pay for.
    if name == "asymptotic_wilcoxon_multihost":
        from illico_tpu.parallel.multihost import asymptotic_wilcoxon_multihost

        return asymptotic_wilcoxon_multihost
    raise AttributeError(f"module 'illico_tpu' has no attribute {name!r}")


def enable_compilation_cache(path: str | None = None) -> str:
    """Enable JAX's on-disk compilation cache (opt-in; mutates jax config).

    The tile executables compile once per (shape, dtype, layout) and are
    reused process-wide; with an on-disk cache they also survive process
    restarts, turning the ~minutes XLA warm-up of a fresh run into
    milliseconds.  The analog of numba's on-disk ``cache=True`` the
    reference leaves untapped (``utils/compile.py``).
    """
    import os

    import jax

    if path is None:
        path = os.environ.get(
            "ILLICO_TPU_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "illico_tpu_xla"),
        )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Persist EVERYTHING: the threshold compares XLA's own compile time,
    # but over a remote-compile link even a "0.1 s" executable costs tens
    # of seconds of RPC wall-clock per process (measured round 4) — tiny
    # executables are exactly the ones worth caching here.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
