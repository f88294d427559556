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


def test_compute_sparsity():
    x = np.zeros((10, 10))
    x[0, :5] = 1.0
    assert compute_sparsity(x) == 0.95
    assert compute_sparsity(sparse.csr_matrix(x)) == 0.95
    with pytest.raises(ValueError):
        compute_sparsity("nope")
