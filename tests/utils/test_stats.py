"""Statistical tail tests vs scipy (reference contract: ``illico/utils/math.py:64-118``)."""

import numpy as np
import pytest
from scipy.stats import mannwhitneyu

from illico_tpu.stats import fold_change_from_summed_expr, pvalues_from_stats


@pytest.mark.parametrize("alternative", ["two-sided", "greater", "less"])
@pytest.mark.parametrize("use_continuity", [True, False])
def test_pvalues_match_scipy(alternative, use_continuity):
    rng = np.random.RandomState(0)
    for trial in range(20):
        a = rng.randint(0, 8, rng.randint(5, 60)).astype(np.float64)
        b = rng.randint(0, 8, rng.randint(5, 60)).astype(np.float64)
        u_scipy, p_scipy = mannwhitneyu(
            a, b, method="asymptotic", use_continuity=use_continuity,
            alternative=alternative,
        )
        combined = np.concatenate([a, b])
        _, cnt = np.unique(combined, return_counts=True)
        tie = float((cnt.astype(np.float64) ** 3 - cnt).sum())
        p = pvalues_from_stats(
            np.asarray(u_scipy), tie, len(a), len(b),
            use_continuity=use_continuity, alternative=alternative,
        )
        np.testing.assert_allclose(p, p_scipy, rtol=1e-12, atol=0)


def test_degenerate_all_tied():
    # every value equal -> tie_corr <= 1e-9 -> p = 1 (math.py:96,117-118)
    n1 = n2 = 10
    U = n1 * n2 / 2.0
    t = n1 + n2
    tie = float(t**3 - t)
    p = pvalues_from_stats(np.asarray(U), tie, n1, n2)
    assert p == 1.0


def test_tie_correct_off():
    p_on = pvalues_from_stats(np.asarray(30.0), 100.0, 10, 10, tie_correct=True)
    p_off = pvalues_from_stats(np.asarray(30.0), 100.0, 10, 10, tie_correct=False)
    assert p_on != p_off


def test_invalid_alternative():
    with pytest.raises(ValueError, match="Unsupported alternative"):
        pvalues_from_stats(np.asarray(1.0), 0.0, 3, 3, alternative="bogus")


def test_fold_change_ovr_and_ovo():
    sums = np.array([[10.0, 0.0], [30.0, 4.0]])
    counts = np.array([2, 4])
    # OVR: ref is the rest
    fc = fold_change_from_summed_expr(sums, counts, -1)
    np.testing.assert_allclose(fc[0], [(10 / 2) / (30 / 4), 0.0])
    np.testing.assert_allclose(fc[1], [(30 / 4) / (10 / 2), np.inf])
    # OVO: ref group 0 (mu_ref == 0 -> inf, even on the ref row; math.py:192)
    fc = fold_change_from_summed_expr(sums, counts, 0)
    np.testing.assert_allclose(fc[0], [1.0, np.inf])
    np.testing.assert_allclose(fc[1], [(30 / 4) / (10 / 2), np.inf])


def test_fold_change_zero_ref_is_inf():
    # mu_ref == 0 -> inf (math.py:192)
    sums = np.array([[0.0], [5.0]])
    counts = np.array([3, 5])
    fc = fold_change_from_summed_expr(sums, counts, 0)
    assert fc[1, 0] == np.inf


def test_degenerate_all_tied_column_gives_p_one():
    """All-tied columns hit the reference's tie_corr <= 1e-9 guard -> p = 1
    (``/root/reference/illico/utils/math.py:96,117-118``), end to end."""
    from illico_tpu import asymptotic_wilcoxon_arrays

    rng = np.random.RandomState(0)
    X = rng.poisson(2.0, (400, 3)).astype(np.float32)
    X[:, 1] = 7.0  # constant column: every value tied
    groups = np.array(["a", "b"] * 200)
    df = asymptotic_wilcoxon_arrays(X, groups, reference="a", progress=False)
    assert df.loc[("b", "gene_1"), "p_value"] == 1.0
    # constant column: same mean in both groups -> fold change exactly 1
    np.testing.assert_allclose(df.loc[("b", "gene_1"), "fold_change"], 1.0)
    # neighbors unaffected
    assert df.loc[("b", "gene_0"), "p_value"] < 1.0


def test_enable_compilation_cache(tmp_path):
    import jax

    import illico_tpu

    path = illico_tpu.enable_compilation_cache(str(tmp_path / "cc"))
    assert (tmp_path / "cc").is_dir()
    assert jax.config.jax_compilation_cache_dir == path


def test_native_and_numpy_paths_agree_on_broadcasts():
    """The native fast path must only engage for per-row-constant sample
    sizes: a 1-D (G,) array broadcasts per-COLUMN in numpy, so taking it
    per-group natively silently diverged (review finding)."""
    rng = np.random.RandomState(0)
    U = rng.randint(0, 50, (3, 3)).astype(np.float64)
    n_ref = np.array([10.0, 20.0, 30.0])  # (3,) -> per-column in numpy
    n_tgt = np.array([5.0, 6.0, 7.0])
    p_auto = pvalues_from_stats(U, 0.0, n_ref, n_tgt)
    p_numpy = pvalues_from_stats(U, 0.0, n_ref, n_tgt, prefer_native=False)
    np.testing.assert_array_equal(p_auto, p_numpy)
    # per-group (G, 1) shapes still agree between the two paths
    p2 = pvalues_from_stats(U, 0.0, n_ref[:, None], n_tgt[:, None])
    p2_np = pvalues_from_stats(
        U, 0.0, n_ref[:, None], n_tgt[:, None], prefer_native=False
    )
    np.testing.assert_allclose(p2, p2_np, rtol=1e-15)
