"""End-to-end parity suite versus scipy.stats.mannwhitneyu.

Mirrors the reference's oracle strategy
(``/root/reference/tests/test_asymptotic_wilcoxon.py:111-194``): U statistics
must match scipy exactly (atol=0, rtol=0), p-values to rtol=1e-12, fold change
to rtol=1e-6, and inputs must be left unmodified.  The scipy oracle is fed
float64 data (scipy >= 1.17 computes the asymptotic tail in the input dtype;
the contract is defined against float64 evaluation).
"""

import contextlib

import numpy as np
import pandas as pd
import pytest
from scipy import sparse as py_sparse
from scipy.stats import mannwhitneyu

from illico_tpu import asymptotic_wilcoxon
from illico_tpu.io.h5ad import BackedCSR

ATOL = 0.0
RTOL = 1.0e-12


def _no_tie_pvalues(U1, n1, n2, use_continuity, alternative):
    """Asymptotic MWU p-values WITHOUT tie correction.

    scipy does not expose the tie-correction toggle, so this hand-rolled
    oracle supplies the ``tie_correct=False`` ground truth: the same normal
    approximation with the tie term dropped from sigma —
    ``sigma = sqrt(n1*n2*(n1+n2+1)/12)`` — and the reference's two-sided /
    continuity semantics (``/root/reference/illico/utils/math.py:64-118``).
    U itself is tie-independent and still comes from scipy.
    """
    from scipy.special import erfc

    U1 = np.asarray(U1, dtype=np.float64)
    mu = n1 * n2 / 2.0
    sigma = np.sqrt(n1 * n2 * (n1 + n2 + 1.0) / 12.0)
    c = 0.5 if use_continuity else 0.0
    sqrt2 = np.sqrt(2.0)
    if alternative == "two-sided":
        delta = np.minimum(U1, n1 * n2 - U1) - mu
        z = (np.abs(delta) + np.sign(delta) * c) / sigma
        return erfc(z / sqrt2)
    if alternative == "greater":
        return 0.5 * erfc((U1 - mu - c) / sigma / sqrt2)
    return 0.5 * erfc(-(U1 - mu + c) / sigma / sqrt2)


def scipy_mannwhitneyu(adata, groupby_key, reference, use_continuity, alternative, is_log1p=False, tie_correct=True):
    results = []
    obs_groups = np.asarray(adata.obs[groupby_key])
    X = adata.X
    if hasattr(X, "toarray"):
        X = X.toarray()
    X = np.asarray(X).astype(np.float64)
    if reference is not None:
        ref_counts = X[obs_groups == reference]
    for pert in pd.unique(obs_groups):
        if pert == reference:
            continue
        mask = obs_groups == pert
        grp_counts = X[mask]
        if reference is None:
            ref_counts = X[~mask]
        if is_log1p:
            grp_counts = np.expm1(grp_counts)
            ref_counts = np.expm1(ref_counts)
        fc = grp_counts.mean(axis=0) / ref_counts.mean(axis=0)
        stats, pvals = mannwhitneyu(
            ref_counts, grp_counts, axis=0, method="asymptotic",
            use_continuity=use_continuity, alternative=alternative,
        )
        if not tie_correct:
            pvals = _no_tie_pvalues(
                stats, ref_counts.shape[0], grp_counts.shape[0],
                use_continuity, alternative,
            )
        results.append(
            pd.DataFrame({
                "p_value": pvals, "statistic": stats, "fold_change": fc,
                "target": pert, "feature": adata.var_names,
            })
        )
    return pd.concat(results, axis=0).set_index(["target", "feature"])


@pytest.mark.parametrize("alternative", ["two-sided", "less", "greater"])
@pytest.mark.parametrize("tie_correct", [True, False], ids=["tie-correct", "no-tie-correct"])
@pytest.mark.parametrize("use_continuity", [True, False])
@pytest.mark.parametrize("test", ["ovo", "ovr"])
def test_asymptotic_wilcoxon(rand_adata, test, use_continuity, tie_correct, alternative):
    if not rand_adata.isbacked:
        cached = rand_adata.copy()

    reference = rand_adata.obs.pert.iloc[0] if test == "ovo" else None

    # Backed CSR is unsupported — same error contract as the reference.
    if isinstance(rand_adata.X, BackedCSR):
        ctx = pytest.raises(KeyError, match="is not implemented")
        should_raise = True
    else:
        ctx = contextlib.nullcontext()
        should_raise = False

    with ctx:
        asy_results = asymptotic_wilcoxon(
            adata=rand_adata,
            is_log1p=False,
            group_keys="pert",
            reference=reference,
            use_continuity=use_continuity,
            tie_correct=tie_correct,
            n_threads=1,
            batch_size=16,
            alternative=alternative,
            progress=False,
        )
    if should_raise:
        return

    scipy_results = scipy_mannwhitneyu(
        adata=rand_adata,
        groupby_key="pert",
        reference=reference,
        is_log1p=False,
        use_continuity=use_continuity,
        alternative=alternative,
        tie_correct=tie_correct,
    )

    got = asy_results.loc[scipy_results.index]
    np.testing.assert_allclose(
        got.statistic.values, scipy_results.statistic.values, atol=0.0, rtol=0.0
    )
    np.testing.assert_allclose(
        got.p_value.values, scipy_results.p_value.values, atol=ATOL, rtol=RTOL
    )
    np.testing.assert_allclose(
        got.fold_change.values, scipy_results.fold_change.values, atol=0.0, rtol=1e-6
    )

    if not rand_adata.isbacked:
        # In-place device staging must not leak back into user data.
        pd.testing.assert_frame_equal(rand_adata.obs, cached.obs)
        pd.testing.assert_frame_equal(rand_adata.var, cached.var)
        if isinstance(rand_adata.X, np.ndarray):
            np.testing.assert_array_equal(rand_adata.X, cached.X)
        else:
            np.testing.assert_array_equal(
                rand_adata.X.toarray(), cached.X.toarray()
            )


def test_is_log1p_fold_change(eager_rand_adata):
    """expm1 transform applied to fold-change means when is_log1p=True."""
    adata = eager_rand_adata
    X = adata.X if isinstance(adata.X, np.ndarray) else adata.X.toarray()
    adata_log = type(adata)(
        np.log1p(X).astype(np.float32), adata.obs.copy(), adata.var.copy()
    ) if isinstance(adata.X, np.ndarray) else None
    if adata_log is None:
        pytest.skip("dense only")
    res = asymptotic_wilcoxon(
        adata_log, is_log1p=True, group_keys="pert", reference=None,
        batch_size=16, progress=False,
    )
    # Oracle: means of expm1(log1p(x)) per group vs rest.
    obs_groups = np.asarray(adata.obs["pert"])
    expm1X = np.expm1(np.log1p(X.astype(np.float64)).astype(np.float32).astype(np.float64))
    for pert in pd.unique(obs_groups)[:2]:
        mask = obs_groups == pert
        fc = expm1X[mask].mean(0) / expm1X[~mask].mean(0)
        got = res.loc[pert].fold_change.values
        np.testing.assert_allclose(got, fc, rtol=1e-6)


def test_unsorted_indices_error(eager_rand_adata):
    """ValueError when CSR indices are unsorted (``asymptotic_wilcoxon.py:186-193``)."""
    if not isinstance(eager_rand_adata.X, py_sparse.csr_matrix):
        pytest.skip("Test only relevant for CSR matrices.")
    eager_rand_adata.X.indices[:] = eager_rand_adata.X.indices[::-1]
    with pytest.raises(ValueError):
        asymptotic_wilcoxon(
            adata=eager_rand_adata, is_log1p=False, group_keys="pert",
            reference="pert_0", n_threads=1, batch_size=16, progress=False,
        )


def test_missing_reference_error(eager_rand_adata):
    with pytest.raises(ValueError, match="not present"):
        asymptotic_wilcoxon(
            adata=eager_rand_adata, is_log1p=False, group_keys="pert",
            reference="no-such-group", progress=False,
        )


def test_invalid_batch_size(eager_rand_adata):
    # n_genes < 256 collapses to a single batch, so use the bounds helper.
    from illico_tpu.models.wilcoxon import compute_tile_bounds

    with pytest.raises(ValueError, match="Invalid batch_size"):
        compute_tile_bounds(1000, "bogus", 1)


def test_arrays_api():
    from illico_tpu import asymptotic_wilcoxon_arrays

    rng = np.random.RandomState(1)
    X = rng.poisson(2.0, (500, 7)).astype(np.float32)
    groups = rng.choice(["a", "b", "c"], 500)
    res = asymptotic_wilcoxon_arrays(X, groups, reference="a", progress=False)
    assert res.shape == (3 * 7, 3)
    st, pv = mannwhitneyu(
        X[groups == "a"].astype(np.float64), X[groups == "b"].astype(np.float64),
        axis=0, method="asymptotic",
    )
    np.testing.assert_array_equal(res.loc["b"].statistic.values, st)
    np.testing.assert_allclose(res.loc["b"].p_value.values, pv, rtol=1e-12, atol=0)
    # sentinel row for the reference group
    assert (res.loc["a"].p_value == 1.0).all()
    assert (res.loc["a"].statistic == -1.0).all()


@pytest.mark.parametrize("engine", ["hist", "sort"])
def test_degenerate_shapes_match_scipy(engine):
    """Singleton groups, a single-gene matrix, and two-group OVR are legal
    inputs (the reference imposes no minimum sizes) and must keep the
    exactness contract on both engines."""
    from illico_tpu import asymptotic_wilcoxon_arrays

    rng = np.random.RandomState(11)
    # one singleton group, one control-sized group, ONE gene
    # (float32 counts are exact; the oracle evaluates in float64)
    X = rng.poisson(2.0, (30, 1)).astype(np.float32)
    Xd = X.astype(np.float64)
    labels = np.array(["ctl"] * 20 + ["big"] * 9 + ["solo"])
    for ref in ("ctl", None):
        df = asymptotic_wilcoxon_arrays(
            X, labels, reference=ref, progress=False, engine=engine
        )
        targets = ("big", "solo") + (("ctl",) if ref is None else ())
        for g in targets:
            rmask = (labels == "ctl") if ref else (labels != g)
            r = mannwhitneyu(
                Xd[rmask, 0], Xd[labels == g, 0],
                alternative="two-sided", method="asymptotic",
            )
            got = df.loc[(g, "gene_0")]
            assert got["statistic"] == r.statistic, (ref, g)
            assert abs(got["p_value"] - r.pvalue) <= 1e-12 * r.pvalue, (ref, g)

    # exactly two groups, OVR: each group's "rest" IS the other group
    labels2 = np.array(["a"] * 12 + ["b"] * 18)
    X2 = rng.poisson(1.0, (30, 5)).astype(np.float32)
    X2d = X2.astype(np.float64)
    df2 = asymptotic_wilcoxon_arrays(
        X2, labels2, reference=None, progress=False, engine=engine
    )
    for g, o in (("a", "b"), ("b", "a")):
        r = mannwhitneyu(
            X2d[labels2 == o, 3], X2d[labels2 == g, 3],
            alternative="two-sided", method="asymptotic",
        )
        got = df2.loc[(g, "gene_3")]
        assert got["statistic"] == r.statistic, g
        assert abs(got["p_value"] - r.pvalue) <= 1e-12 * r.pvalue, g


def test_float64_input_in_plain_x64_off_process():
    """The suite enables x64 globally (conftest), which masks a staging
    bug: in a DEFAULT process `jax.device_put` canonicalizes float64
    tiles to float32, silently corrupting float64 tie comparison and
    mismatching the sort engine's f64-compiled executables.  The runner
    must stage float64 under its own x64 scope.  Drive the public API in
    a plain subprocess with a value that is not float32-representable:
    canonicalization would merge the tie and change U."""
    import os
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import numpy as np\n"
        "from scipy.stats import mannwhitneyu\n"
        "from illico_tpu import asymptotic_wilcoxon_arrays\n"
        "rng = np.random.RandomState(42)\n"
        "X = rng.poisson(2.0, (50, 3)).astype(np.float64)\n"
        "X[0, 0] = 2.0 + 1e-12  # f64-distinct, f32-aliased vs X[1, 0]\n"
        "X[1, 0] = 2.0\n"
        "labels = np.array(['ctl'] * 25 + ['t'] * 25)\n"
        "for ref in ('ctl', None):\n"
        "    df = asymptotic_wilcoxon_arrays(X, labels, reference=ref,\n"
        "                                    progress=False)\n"
        "    m = (labels == 'ctl') if ref else (labels != 't')\n"
        "    r = mannwhitneyu(X[m, 0], X[labels == 't', 0],\n"
        "                     alternative='two-sided', method='asymptotic')\n"
        "    got = df.loc[('t', 'gene_0')]\n"
        "    assert got['statistic'] == r.statistic, (ref, 'U')\n"
        "    assert abs(got['p_value'] - r.pvalue) <= 1e-12 * r.pvalue\n"
        "print('OK')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=240,
        cwd=os.path.dirname(os.path.dirname(__file__)),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout


def test_forced_hist_engine_rejects_float64():
    """The histogram value table is float32: a float64 value that is not
    float32-representable could alias into a bucket and silently corrupt
    ranks (the per-column overflow check sees only post-cast values).
    auto routes float64 to the sort engine; a FORCED 'hist' must fail
    loudly, like the engine's other exactness guards."""
    from illico_tpu import asymptotic_wilcoxon_arrays

    rng = np.random.RandomState(0)
    X = rng.poisson(2.0, (40, 3)).astype(np.float64)
    labels = np.array(["ctl"] * 20 + ["t"] * 20)
    with pytest.raises(ValueError, match="float64"):
        asymptotic_wilcoxon_arrays(
            X, labels, reference="ctl", progress=False, engine="hist"
        )


def test_layer_selection():
    """`layer=` selects adata.layers[...] over adata.X (reference
    ``asymptotic_wilcoxon.py:178-182``), round-tripping through h5ad."""
    import tempfile
    from pathlib import Path

    from illico_tpu.io.h5ad import AnnDataLite, read_h5ad

    rng = np.random.RandomState(4)
    X = rng.poisson(2.0, (400, 6)).astype(np.float32)
    other = rng.poisson(5.0, (400, 6)).astype(np.float32)
    obs = pd.DataFrame({"pert": rng.choice(["a", "b"], 400)})
    var = pd.DataFrame(index=[f"g{i}" for i in range(6)])
    ad = AnnDataLite(X, obs, var, layers={"counts": other})
    with tempfile.TemporaryDirectory() as d:
        path = Path(d) / "t.h5ad"
        ad.write_h5ad(path)
        ad2 = read_h5ad(path)
    np.testing.assert_array_equal(ad2.layers["counts"], other)

    from_x = asymptotic_wilcoxon(
        ad2, is_log1p=False, group_keys="pert", reference="a", progress=False
    )
    from_layer = asymptotic_wilcoxon(
        ad2, is_log1p=False, group_keys="pert", reference="a",
        layer="counts", progress=False,
    )
    want = asymptotic_wilcoxon(
        AnnDataLite(other, obs, var), is_log1p=False, group_keys="pert",
        reference="a", progress=False,
    )
    pd.testing.assert_frame_equal(from_layer, want)
    assert not from_x.equals(from_layer)


def test_invalid_alternative_rejected_early():
    from illico_tpu import asymptotic_wilcoxon_arrays

    X = np.zeros((10, 4), np.float32)
    groups = np.array(["a", "b"] * 5)
    with pytest.raises(ValueError, match="alternative"):
        asymptotic_wilcoxon_arrays(
            X, groups, reference="a", alternative="bogus", progress=False
        )


@pytest.mark.parametrize(
    "n_genes,auto_width,want_width",
    [
        (8000, 2048, 2048),   # 4 tiles, bucket holds
        (600, 2048, 1024),    # 1 tile, pow2 bucket above 600
        (300, 512, 512),      # 1 tile
        (5000, 2048, 2048),   # 3 tiles of ceil(5000/3)=1667 -> bucket 2048
        (4100, 1920, 1920),   # non-pow2 HBM cap respected
    ],
)
def test_auto_width_buckets(n_genes, auto_width, want_width):
    from illico_tpu.models.wilcoxon import compute_tile_bounds

    bounds, width = compute_tile_bounds(n_genes, "auto", 1, auto_width)
    assert width == want_width
    assert bounds[0][0] == 0 and bounds[-1][1] == n_genes
    # tiles cover the axis contiguously
    for (a, b), (c, d) in zip(bounds, bounds[1:]):
        assert b == c


def test_auto_width_small_input_single_batch():
    from illico_tpu.models.wilcoxon import compute_tile_bounds

    bounds, width = compute_tile_bounds(100, "auto", 4, 2048)
    assert bounds == [(0, 100)] and width == 100


def test_invalid_engine_raises(eager_rand_adata):
    with pytest.raises(ValueError, match="Invalid engine"):
        asymptotic_wilcoxon(
            eager_rand_adata, is_log1p=False, group_keys="pert",
            engine="histogram", progress=False,
        )


def test_profile_dir_smoke(eager_rand_adata, tmp_path):
    """profile_dir= wraps the run in jax.profiler.trace (SURVEY §5's
    observability hook); the run must succeed and leave a trace dir."""
    d = tmp_path / "prof"
    df = asymptotic_wilcoxon(
        eager_rand_adata, is_log1p=False, group_keys="pert",
        reference="pert_0", progress=False, profile_dir=str(d),
    )
    assert len(df) > 0
    assert d.exists() and any(d.rglob("*"))
