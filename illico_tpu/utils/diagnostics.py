"""Input diagnostics: log1p-consistency warning and sparsity estimation.

Parity with the reference's diagnostics utilities
(``/root/reference/illico/utils/math.py:121-165`` ``sampled_max``/``_warn_log1p``
and ``math.py:224-244`` ``compute_sparsity``).
"""

from __future__ import annotations

import warnings

import numpy as np
from scipy import sparse as sp

__all__ = ["sampled_max", "warn_if_log1p_mismatch", "compute_sparsity"]


def _flat_values(X) -> np.ndarray:
    if sp.issparse(X):
        return X.data
    if isinstance(X, np.ndarray):
        return X.ravel()
    raise ValueError(f"Unsupported data type: {type(X)}")


def sampled_max(data: np.ndarray, sample_size: int = 200_000) -> float:
    """Approximate max via strided sampling (cheap on huge arrays)."""
    n = data.size
    if n == 0:
        return -np.inf
    step = max(1, n // sample_size)
    return float(np.max(data[::step]))


def warn_if_log1p_mismatch(
    X=None,
    is_log1p: bool = False,
    sample_size: int = 200_000,
    *,
    max_value: float | None = None,
    integral: bool | None = None,
) -> None:
    """Warn when the user's ``is_log1p`` flag looks inconsistent with the data.

    Heuristic: log1p-transformed expression rarely exceeds ~15, raw counts
    usually do (same thresholds as the reference).  Callers that already
    sampled the data may pass ``max_value`` directly (then ``X`` is unused);
    ``integral=True`` additionally suppresses the low-max warning for
    ``is_log1p=False`` — small integer counts are legitimately below 15 and
    are the common false positive of the raw threshold heuristic.
    """
    max_val = (
        float(max_value)
        if max_value is not None
        else sampled_max(_flat_values(X), sample_size=sample_size)
    )
    if not is_log1p and integral is True:
        return
    if is_log1p and max_val > 15:
        warnings.warn(
            f"is_log1p=True, yet a sampled maximum of {max_val:.2f} looks "
            "like raw counts (log1p expression rarely exceeds ~15). Fold "
            "changes would be computed on expm1 of already-raw values — "
            "check the flag against how the matrix was produced.",
            UserWarning,
        )
    elif not is_log1p and max_val < 15:
        warnings.warn(
            f"is_log1p=False, yet a sampled maximum of {max_val:.2f} looks "
            "like log1p-transformed expression (raw counts usually exceed "
            "15). Fold changes would then be ratios of log values — check "
            "the flag against how the matrix was produced.",
            UserWarning,
        )


def compute_sparsity(X) -> float:
    """Fraction of zero entries."""
    if sp.issparse(X):
        n_elements = X.shape[0] * X.shape[1]
        n_nonzero = X.nnz
    elif isinstance(X, np.ndarray):
        n_elements = X.size
        n_nonzero = int(np.count_nonzero(X))
    else:
        raise ValueError(f"Unsupported data type: {type(X)}")
    return 1.0 - n_nonzero / n_elements
