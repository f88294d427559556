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

__all__ = ["asymptotic_wilcoxon", "asymptotic_wilcoxon_arrays"]
__version__ = "0.1.0"
