"""Engine auto-routing for the compact sort tier (round-3 VERDICT items 2/3).

The flagship gaps these pin down:
- scanpy ``normalize_total``+``log1p`` output (non-tabulable float32) must
  reach the compact tier automatically, not the full-column sort engine;
- Smart-seq-magnitude counts (sampled max far beyond the largest histogram
  table) must never pay a guaranteed-overflowing histogram pass.
"""

import numpy as np
import pytest
import scipy.sparse as sp

from illico_tpu.models.wilcoxon import CSORT_MAX_DENSITY, WilcoxonRunner
from illico_tpu.utils.groups import encode_and_count_groups
from illico_tpu.utils.registry import data_handler_registry


def _normalized(rng, n=600, t=40, g=5, density=0.3):
    labels = rng.randint(0, g, n).astype(str)
    x = rng.poisson(2.0, (n, t)).astype(np.float64)
    x[rng.rand(n, t) >= density] = 0
    totals = x.sum(axis=1, keepdims=True)
    totals[totals == 0] = 1.0
    return np.log1p(x / totals * 1e4).astype(np.float32), labels


def _runner(X, labels, reference=None, **kw):
    handler = data_handler_registry.get(X)
    _, info = encode_and_count_groups(labels, reference)
    return WilcoxonRunner(handler, info, is_log1p=False, **kw)


def test_normalized_sparse_routes_to_csort():
    rng = np.random.RandomState(0)
    xn, labels = _normalized(rng)
    for X in (sp.csr_matrix(xn), sp.csc_matrix(xn), xn):
        r = _runner(X, labels)
        assert r.engine == "csort", type(X)


def test_dense_normalized_uses_sampled_density():
    rng = np.random.RandomState(1)
    xn, labels = _normalized(rng, density=0.25)
    r = _runner(np.asarray(xn), labels)
    assert r.engine == "csort"
    assert r._sampled_density is not None and r._sampled_density < 0.5


def test_dense_data_above_density_threshold_keeps_full_sort():
    rng = np.random.RandomState(2)
    xn, labels = _normalized(rng, density=0.95)
    r = _runner(np.asarray(xn), labels)
    assert r._sampled_density is None or r._sampled_density > CSORT_MAX_DENSITY
    assert r.engine == "sort"


def test_high_count_data_never_pays_a_hist_pass():
    # Smart-seq-class magnitudes: typical counts in the thousands.  auto
    # must route to the rank path up front (VERDICT item 3a) — asserted by
    # the engine choice, which decides before any histogram executable is
    # built (no full-matrix hist pass can happen from a csort/sort runner).
    rng = np.random.RandomState(3)
    n, t, g = 500, 30, 4
    labels = rng.randint(0, g, n).astype(str)
    x = rng.poisson(5000.0, (n, t)).astype(np.float32)
    x[rng.rand(n, t) >= 0.4] = 0
    r = _runner(sp.csr_matrix(x), labels)
    assert r.engine == "csort"
    # Mid-band maxima (~900, table 512): every column would overflow the
    # largest table and pay hist sweep + sort fallback — the
    # overflow-fraction routing must send these to the rank path up front
    # (round-4 VERDICT item 5), even though max < 4 * MAX_V.
    x2 = np.minimum(x, 900.0)
    r2 = _runner(sp.csr_matrix(x2), labels)
    assert r2._sampled_overflow_frac is not None
    assert r2._sampled_overflow_frac > 0.9
    assert r2.engine == "csort"


def test_few_overflow_columns_keep_the_histogram_engine():
    # A handful of high-count columns in otherwise tabulable data: the
    # overflow fraction is small, so hist (+ per-column fallback for just
    # those columns) stays the cheaper plan.
    rng = np.random.RandomState(13)
    n, t, g = 500, 30, 4
    labels = rng.randint(0, g, n).astype(str)
    x = rng.poisson(3.0, (n, t)).astype(np.float32)
    x[rng.rand(n, t) >= 0.35] = 0
    x[:5, 15] = 1000.0  # one hot column
    r = _runner(sp.csr_matrix(x), labels)
    assert r._sampled_overflow_frac is not None
    assert 0.0 < r._sampled_overflow_frac < 0.5
    assert r.engine == "hist"


def test_float64_sparse_routes_to_csort():
    rng = np.random.RandomState(4)
    xn, labels = _normalized(rng)
    r = _runner(sp.csr_matrix(xn.astype(np.float64)), labels)
    assert r.engine == "csort"


def test_csort_rejects_device_resident_and_cells_mesh():
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(5)
    xn, labels = _normalized(rng, n=200, t=8)
    with pytest.raises(ValueError, match="host-resident"):
        _runner(jnp.asarray(xn), labels, engine="csort")
    if len(jax.devices()) >= 4:
        # 1-D gene meshes are served (round-4 VERDICT item 2, see
        # tests/parallel/test_sharding.py); only cell-axis sharding is
        # structurally impossible for a rank engine.
        from illico_tpu.parallel.cells import make_mesh_2d

        with pytest.raises(ValueError, match="cell"):
            _runner(sp.csr_matrix(xn), labels, engine="csort",
                    mesh=make_mesh_2d(2, 2))


def test_csort_precompile_counters_and_run():
    # AOT warm-up: every streamed tile must take the compiled path.
    rng = np.random.RandomState(6)
    xn, labels = _normalized(rng, n=700, t=300)
    r = _runner(sp.csr_matrix(xn), labels, batch_size=128)
    assert r.engine == "csort"
    r.precompile()
    res = r.run(progress=False)
    c = r.tile_fn._counters
    assert c["jit"] == 0 and c["aot"] == len(r.bounds)
    assert np.isfinite(res.pvalues).all()


def test_csort_ovo_api_parity_sample():
    from scipy.stats import mannwhitneyu

    from illico_tpu import asymptotic_wilcoxon_arrays

    rng = np.random.RandomState(7)
    xn, labels = _normalized(rng, n=400, t=12, g=4)
    labels = np.where(labels == "0", "ctl", labels)
    X = sp.csr_matrix(xn)
    df = asymptotic_wilcoxon_arrays(X, labels, reference="ctl",
                                    progress=False)
    ctl = xn[labels == "ctl"]
    for gname in ("1", "2"):
        for j in (0, 5, 11):
            a = ctl[:, j].astype(np.float64)
            b = xn[labels == gname, j].astype(np.float64)
            res = mannwhitneyu(a, b, alternative="two-sided",
                               method="asymptotic")
            got = df.loc[(gname, f"gene_{j}")]
            assert got["statistic"] == res.statistic
            assert abs(got["p_value"] - res.pvalue) <= 1e-12 * res.pvalue


def test_native_tail_engages_for_packed_rank_wires(monkeypatch):
    """The csort and full-sort packed wires carry an (all-False) overflow
    flag purely so the fused native C++ tail engages; its results must be
    bit-identical to the numpy tail on the same wire."""
    import illico_tpu.native as native

    if not native.native_available():
        pytest.skip("no C++ toolchain for the native tail")
    from illico_tpu import asymptotic_wilcoxon_arrays

    rng = np.random.RandomState(21)
    xn, labels = _normalized(rng, n=500, t=300)
    X = sp.csr_matrix(xn)

    def run_pair(engine, ref):
        handler = data_handler_registry.get(X)
        _, info = encode_and_count_groups(labels, ref)
        r = WilcoxonRunner(handler, info, is_log1p=False, engine=engine,
                           batch_size=128)
        res = r.run(progress=False)
        native_tiles = r._consume_path["native"]
        monkeypatch.setattr(native, "_LIB", None)
        monkeypatch.setattr(native, "_TRIED", True)
        r2 = WilcoxonRunner(handler, info, is_log1p=False, engine=engine,
                            batch_size=128)
        res2 = r2.run(progress=False)
        monkeypatch.undo()
        assert r2._consume_path["native"] == 0
        return res, res2, native_tiles, len(r.bounds)

    for engine in ("csort", "sort"):
        for ref in (None, "0"):
            res, res2, n_native, n_tiles = run_pair(engine, ref)
            assert n_native == n_tiles, (engine, ref)
            # U and fc are exact; p may differ in the last bit (the C and
            # numpy tails associate a few float64 ops differently on this
            # wire) — 2.2e-16 relative, far inside the 1e-12 contract.
            np.testing.assert_array_equal(res.statistics, res2.statistics,
                                          err_msg=f"{engine}/{ref}")
            np.testing.assert_array_equal(res.fold_change, res2.fold_change,
                                          err_msg=f"{engine}/{ref}")
            np.testing.assert_allclose(res.pvalues, res2.pvalues,
                                       rtol=5e-15, atol=0.0,
                                       err_msg=f"{engine}/{ref}")
