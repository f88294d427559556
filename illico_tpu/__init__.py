"""illico_tpu — TPU-native asymptotic Wilcoxon rank-sum tests.

A from-scratch TPU (JAX/XLA/Pallas) framework with the capabilities of the
``illico`` reference library: blazing-fast asymptotic Mann-Whitney U tests for
single-cell differential expression, OVO and OVR, over dense / CSR / CSC /
h5ad-backed matrices, with exact U statistics and 1e-12 p-value parity versus
``scipy.stats.mannwhitneyu``.
"""

import os as _os

import jax as _jax

# float64 is a correctness requirement: rank/tie accumulations and the
# statistical tail are exact only in 64-bit (the heavy sort path stays in the
# input dtype; float64 shows up only in small cross-block reductions).
# Opt out with ILLICO_TPU_NO_X64=1 at your own risk.
if not _os.environ.get("ILLICO_TPU_NO_X64"):
    _jax.config.update("jax_enable_x64", True)

from illico_tpu.api import asymptotic_wilcoxon, asymptotic_wilcoxon_arrays

__all__ = ["asymptotic_wilcoxon", "asymptotic_wilcoxon_arrays"]
__version__ = "0.1.0"
