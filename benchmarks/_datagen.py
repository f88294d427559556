"""Shared synthetic-data generator for the benchmark scripts.

One source of truth for the K562-like distribution (Poisson counts, ~90%
zeros, ~10% non-targeting control) so run_benchmarks.py,
host_wire_bench.py and scipy_compare.py measure the SAME dataset shape —
a drift between them would silently make the recorded comparisons
incommensurable.  (bench.py keeps its own generator by design: it builds
the matrix directly in HBM with jax.random, and must stay standalone for
the driver.)
"""

import numpy as np


def synthetic_counts(
    n, t, g, seed=0, *, density=0.1, lam=2.0, dtype=np.float32,
    clamp=None, heavy_tail=False,
):
    """(X, groups) with ``density`` nonzero Poisson(lam) counts.

    ``clamp`` caps values (e.g. 126 for int8 storage); ``heavy_tail``
    sends ~2% of genes far beyond the histogram value table to exercise
    the overflow -> sort-engine fallback.
    """
    rng = np.random.RandomState(seed)
    x = rng.poisson(lam, (n, t)).astype(np.float32)
    x[rng.rand(n, t) >= density] = 0
    if heavy_tail:
        hot = rng.choice(t, size=max(1, t // 50), replace=False)
        x[:, hot] += rng.poisson(2000.0, (n, hot.size)).astype(np.float32)
    if clamp is not None:
        np.minimum(x, clamp, out=x)
    x = x.astype(dtype)
    labels = rng.randint(1, g, n)
    labels[rng.rand(n) < 0.1] = 0
    groups = np.array([f"pert_{v}" if v else "non-targeting" for v in labels])
    return x, groups
