"""Diagnostics parity tests (``illico/utils/math.py:121-165,224-244``)."""

import numpy as np
import pytest
from scipy import sparse

from illico_tpu.utils.diagnostics import (
    compute_sparsity,
    sampled_max,
    warn_if_log1p_mismatch,
)


def test_sampled_max():
    x = np.arange(1000.0)
    assert sampled_max(x, sample_size=10_000) == 999.0
    assert sampled_max(x, sample_size=10) <= 999.0


def test_warn_log1p_flags():
    raw = np.random.RandomState(0).poisson(100.0, (100, 10)).astype(np.float32)
    with pytest.warns(UserWarning, match="is_log1p=True"):
        warn_if_log1p_mismatch(raw, is_log1p=True)
    logged = np.log1p(raw)
    with pytest.warns(UserWarning, match="is_log1p=False"):
        warn_if_log1p_mismatch(logged, is_log1p=False)
    # consistent flags: no warning
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")
        warn_if_log1p_mismatch(raw, is_log1p=False)
        warn_if_log1p_mismatch(logged, is_log1p=True)
    with pytest.raises(ValueError):
        warn_if_log1p_mismatch([1, 2, 3], is_log1p=False)


def test_log1p_warning_wired_into_api():
    """The flag-sanity heuristic fires from the public API (the reference
    ships it but never calls it), with the integrality sample suppressing
    the reference heuristic's false positive on small integer counts."""
    import warnings

    from illico_tpu import asymptotic_wilcoxon_arrays

    rng = np.random.RandomState(0)
    counts = rng.poisson(2.0, (400, 8)).astype(np.float32)  # max << 15
    labels = np.array(["a", "b"])[rng.randint(0, 2, 400)]
    kw = dict(reference="a", progress=False)

    # Small integer counts with is_log1p=False: legitimate, no warning.
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        asymptotic_wilcoxon_arrays(counts, labels, **kw)

    # Raw-count-scale values flagged as log1p: warn.
    big = rng.poisson(100.0, (400, 8)).astype(np.float32)
    with pytest.warns(UserWarning, match="is_log1p=True"):
        asymptotic_wilcoxon_arrays(np.maximum(big, 1.0), labels,
                                   is_log1p=True, **kw)

    # Low-max NON-integer values flagged as raw counts: warn.
    with pytest.warns(UserWarning, match="is_log1p=False"):
        asymptotic_wilcoxon_arrays(np.log1p(counts), labels, **kw)


def test_compute_sparsity():
    x = np.zeros((10, 10))
    x[0, :5] = 1.0
    assert compute_sparsity(x) == 0.95
    assert compute_sparsity(sparse.csr_matrix(x)) == 0.95
    with pytest.raises(ValueError):
        compute_sparsity("nope")
