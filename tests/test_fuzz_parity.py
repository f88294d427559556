"""Seeded fuzz sweep: random shapes/groups/densities/dtypes vs scipy.

The deterministic fixtures cover the designed cases; this sweep guards the
edges (tiny groups, skewed group sizes, integer input dtypes, dense and
sparse, high counts) with the same exactness contract.
"""

import numpy as np
import pytest
from scipy import sparse, stats

from illico_tpu import asymptotic_wilcoxon_arrays

CASES = [
    # (seed, n_cells, n_genes, n_groups, density, lam, dtype, fmt)
    (0, 500, 7, 3, 0.4, 2.0, np.float32, "dense"),
    (1, 1200, 33, 5, 0.1, 1.0, np.int32, "dense"),
    (2, 800, 17, 4, 0.7, 5.0, np.uint8, "csr"),
    (3, 2000, 5, 8, 0.2, 3.0, np.int16, "csc"),
    (4, 300, 64, 2, 0.5, 150.0, np.float32, "dense"),  # counts > 128
    (5, 1500, 9, 6, 0.05, 0.5, np.float64, "dense"),   # f64 -> sort engine
]


@pytest.mark.parametrize("case", CASES, ids=[f"case{c[0]}" for c in CASES])
@pytest.mark.parametrize("mode", ["ovo", "ovr"])
def test_fuzz_scipy_parity(case, mode):
    seed, n, t, g, density, lam, dtype, fmt = case
    rng = np.random.RandomState(seed)
    x = rng.poisson(lam, (n, t)).astype(np.float64)
    x[rng.rand(n, t) >= density] = 0
    x = x.astype(dtype)
    labels = rng.randint(0, g, n)
    labels[:g] = np.arange(g)  # every group non-empty
    groups = np.array([f"g{v}" for v in labels])

    X = {
        "dense": lambda: x,
        "csr": lambda: sparse.csr_matrix(x),
        "csc": lambda: sparse.csc_matrix(x),
    }[fmt]()

    ref = "g0" if mode == "ovo" else None
    df = asymptotic_wilcoxon_arrays(X, groups, reference=ref, progress=False)

    xd = x.astype(np.float64)
    check = [(gr, j) for gr in (f"g{g-1}", "g1") for j in (0, t // 2, t - 1)]
    for gr, j in check:
        if mode == "ovo" and gr == "g0":
            continue
        tgt = groups == gr
        refm = groups == "g0" if mode == "ovo" else ~tgt
        r = stats.mannwhitneyu(
            xd[refm, j], xd[tgt, j],
            alternative="two-sided", method="asymptotic",
        )
        got = df.loc[(gr, f"gene_{j}")]
        assert got["statistic"] == r.statistic, (seed, mode, gr, j)
        assert abs(got["p_value"] - r.pvalue) <= 1e-12 * r.pvalue, (
            seed, mode, gr, j, got["p_value"], r.pvalue,
        )
