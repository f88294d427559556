"""Headline benchmark: K562-essential-scale OVO, dense, full run.

Matches the reference's flagship measurement (``BASELINE.md``: ~300k cells,
8k genes, 2k perturbation groups, OVO dense => 29.70 s on 8 CPU threads;
reference README.md:142).  The dataset itself cannot be downloaded here
(zero egress), so a size- and sparsity-matched synthetic matrix is used
(~90% zeros, Poisson counts): runtime of the comparison-sort rank engine is
shape-driven, not value-driven, so this is a faithful proxy.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} where
``vs_baseline`` is the speedup factor over the reference's 29.70 s
(>1 means faster than the reference).
"""

import json
import sys
import time

import numpy as np

BASELINE_SECONDS = 29.70  # reference, 8 threads, EPYC 7J13 (README.md:142)

N_CELLS = 300_000
N_GENES = 8_000
N_GROUPS = 2_000


def make_data(n_cells=N_CELLS, n_genes=N_GENES, n_groups=N_GROUPS, seed=0):
    rng = np.random.RandomState(seed)
    base_cols = 512
    block = rng.poisson(2.0, (n_cells, base_cols)).astype(np.float32)
    block[rng.rand(n_cells, base_cols) < 0.9] = 0.0  # ~90% sparsity, K562-like
    reps = (n_genes + base_cols - 1) // base_cols
    X = np.tile(block, (1, reps))[:, :n_genes]
    # Group sizes ~ n/G with one large control group, like K562-essential.
    labels = rng.randint(1, n_groups, n_cells)
    labels[rng.rand(n_cells) < 0.1] = 0  # 'non-targeting' control ~10%
    groups = np.array([f"pert_{g}" if g else "non-targeting" for g in labels])
    return X, groups


def main():
    quick = "--quick" in sys.argv
    if quick:
        X, groups = make_data(20_000, 512, 50)
    else:
        X, groups = make_data()

    from illico_tpu import asymptotic_wilcoxon_arrays

    t_setup = time.perf_counter()
    # Warm-up/compile pass on the same shapes (precompile=True compiles AOT
    # inside the call; the reference likewise precompiles outside its timer,
    # tests/test_asymptotic_wilcoxon.py:334-335).
    _ = asymptotic_wilcoxon_arrays(
        X[:, :512], groups, reference="non-targeting",
        batch_size=512, progress=False,
    )
    compile_s = time.perf_counter() - t_setup

    t0 = time.perf_counter()
    res = asymptotic_wilcoxon_arrays(
        X, groups, reference="non-targeting",
        batch_size=512, n_threads=2, progress=False,
    )
    elapsed = time.perf_counter() - t0
    assert res.shape[0] == len(np.unique(groups)) * X.shape[1]

    print(json.dumps({
        "metric": "k562_scale_ovo_dense_seconds",
        "value": round(elapsed, 3),
        "unit": "s",
        "vs_baseline": round(BASELINE_SECONDS / elapsed, 3),
    }))
    print(f"# compile+warmup: {compile_s:.1f}s; shape={X.shape}, groups={N_GROUPS}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
