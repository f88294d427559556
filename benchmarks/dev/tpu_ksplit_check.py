"""Hardware spot-check of the nnz-split OVO wire (round 5).

Drives the public API on the real TPU with an engagement-shaped problem
(big control + sub-256 groups), adversarial exception columns, and a
buffer-overflow column, then asserts the exact contract vs scipy and
native/numpy consume equality.  A plain process (no pytest conftest), so
x64-off staging behavior is the production one.

    timeout 900 python benchmarks/dev/tpu_ksplit_check.py
"""

import sys
import time

import numpy as np
from scipy import stats

sys.path.insert(0, "/root/repo")


def main():
    from illico_tpu import asymptotic_wilcoxon_arrays, enable_compilation_cache

    enable_compilation_cache()
    r = np.random.RandomState(29)
    n_ref, g_other, n_per, t = 20_000, 50, 120, 67  # t not 128-aligned
    labels = np.concatenate(
        [np.zeros(n_ref, int), 1 + np.arange(g_other).repeat(n_per)]
    )
    r.shuffle(labels)
    counts = r.poisson(2.0, (labels.size, t)).astype(np.float64)
    counts[r.rand(labels.size, t) >= 0.12] = 0
    for g2 in range(1, 40):
        counts[np.flatnonzero(labels == g2), 5] = 2.0  # >24 violators
    counts[np.flatnonzero(labels == 7)[:100], 11] = 3.0  # a few exceptions
    x = counts.astype(np.float32)
    enc = np.array([f"g{v:03d}" for v in labels])

    from illico_tpu.models.wilcoxon import WilcoxonRunner
    from illico_tpu.utils.groups import encode_and_count_groups
    from illico_tpu.utils.registry import data_handler_registry

    _, info = encode_and_count_groups(enc, "g000")
    rr_ = WilcoxonRunner(
        data_handler_registry.get(x), info, is_log1p=False, engine="hist"
    )
    assert rr_.tile_fn._statics["nnz_split"] is True, rr_.tile_fn._statics

    t0 = time.time()
    df = asymptotic_wilcoxon_arrays(
        x, enc, is_log1p=False, reference="g000", progress=False,
        engine="hist",
    )
    print(f"# hist run {time.time()-t0:.1f}s")
    xd = x.astype(np.float64)
    base = labels == 0
    n_ok = 0
    for gr, jj in (("g007", 11), ("g003", 5), ("g020", 5), ("g013", 0),
                   ("g049", 66), ("g001", 23), ("g033", 42)):
        tgt = labels == int(gr[1:])
        mw = stats.mannwhitneyu(
            xd[base, jj], xd[tgt, jj],
            alternative="two-sided", method="asymptotic",
        )
        got = df.loc[(gr, f"gene_{jj}")]
        assert got["statistic"] == mw.statistic, (gr, jj)
        assert abs(got["p_value"] - mw.pvalue) <= 1e-12 * mw.pvalue, (
            gr, jj, got["p_value"], mw.pvalue,
        )
        n_ok += 1
    # numpy-consume equality (native disabled) on the same wire
    import illico_tpu.native as native

    native._LIB = None
    native._TRIED = True
    df2 = asymptotic_wilcoxon_arrays(
        x, enc, is_log1p=False, reference="g000", progress=False,
        engine="hist",
    )
    np.testing.assert_array_equal(
        df["statistic"].to_numpy(), df2["statistic"].to_numpy()
    )
    # A few-ulp association difference between the C and numpy tails is
    # expected; 1e-13 is still 10x inside the scipy contract.
    np.testing.assert_allclose(
        df["p_value"].to_numpy(), df2["p_value"].to_numpy(),
        rtol=1e-13, atol=0.0,
    )
    print(f"KSPLIT TPU CHECK OK: {n_ok} scipy cells exact, "
          "native == numpy consume")


if __name__ == "__main__":
    main()
