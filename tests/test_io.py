"""h5ad IO round-trip and backed-streaming tests."""

import numpy as np
import pandas as pd
import pytest
from scipy import sparse

from illico_tpu.io.h5ad import AnnDataLite, BackedCSC, BackedCSR, read_h5ad
from illico_tpu.utils.registry import data_handler_registry, ensure_backed_handlers


def _adata(fmt, n=300, t=20):
    rng = np.random.RandomState(0)
    dense = rng.poisson(1.5, (n, t)).astype(np.float32)
    dense[rng.rand(n, t) < 0.5] = 0
    X = {"dense": dense,
         "csc": sparse.csc_matrix(dense),
         "csr": sparse.csr_matrix(dense)}[fmt]
    obs = pd.DataFrame({
        "pert": pd.Categorical([f"p{v}" for v in rng.randint(0, 4, n)]),
        "score": rng.rand(n).astype(np.float64),
        "name": [f"cell{i}" for i in range(n)],
    })
    var = pd.DataFrame(index=[f"gene_{i}" for i in range(t)])
    return AnnDataLite(X, obs, var), dense


@pytest.mark.parametrize("fmt", ["dense", "csc", "csr"])
def test_h5ad_roundtrip_eager(fmt, tmp_path):
    adata, dense = _adata(fmt)
    path = tmp_path / "x.h5ad"
    adata.write_h5ad(path)
    back = read_h5ad(path)
    X = back.X if isinstance(back.X, np.ndarray) else back.X.toarray()
    np.testing.assert_array_equal(X, dense)
    assert list(back.obs.columns) == ["pert", "score", "name"]
    assert (np.asarray(back.obs["pert"]) == np.asarray(adata.obs["pert"])).all()
    np.testing.assert_allclose(back.obs["score"], adata.obs["score"])
    assert list(back.var_names) == list(adata.var_names)
    assert not back.isbacked


@pytest.mark.parametrize("fmt", ["dense", "csc", "csr"])
def test_h5ad_backed_read(fmt, tmp_path):
    adata, dense = _adata(fmt)
    path = tmp_path / "x.h5ad"
    adata.write_h5ad(path)
    back = read_h5ad(path, backed="r")
    assert back.isbacked
    if fmt == "csr":
        assert isinstance(back.X, BackedCSR)
        ensure_backed_handlers()
        with pytest.raises(KeyError, match="is not implemented"):
            data_handler_registry.get(back.X)
        return
    if fmt == "csc":
        assert isinstance(back.X, BackedCSC)
        np.testing.assert_array_equal(back.X.densify_columns(3, 9), dense[:, 3:9])
    else:
        np.testing.assert_array_equal(np.asarray(back.X[:, 3:9]), dense[:, 3:9])
    # handler streams tiles correctly
    ensure_backed_handlers()
    handler = data_handler_registry.get(back.X)
    np.testing.assert_array_equal(handler.fetch_tile(0, 7), dense[:, :7])
    np.testing.assert_array_equal(handler.fetch_tile(15, 20), dense[:, 15:20])


def test_handler_tiles_match_across_formats():
    adata, dense = _adata("dense")
    for X in [dense, sparse.csr_matrix(dense), sparse.csc_matrix(dense)]:
        h = data_handler_registry.get(X)
        np.testing.assert_array_equal(h.fetch_tile(2, 11), dense[:, 2:11])
        assert h.footprint() > 0


def test_unknown_type_keyerror():
    with pytest.raises(KeyError, match="is not implemented"):
        data_handler_registry.get([1, 2, 3])


def test_adata_shape_validation():
    X = np.zeros((5, 3), np.float32)
    with pytest.raises(ValueError, match="obs has"):
        AnnDataLite(X, obs=pd.DataFrame({"a": [1, 2]}))


def test_anndatalite_shape_validation():
    import pytest as _pytest

    X = np.zeros((5, 3), np.float32)
    with _pytest.raises(ValueError, match="obs has"):
        AnnDataLite(X, obs=pd.DataFrame(index=range(4)))
    with _pytest.raises(ValueError, match="var has"):
        AnnDataLite(X, var=pd.DataFrame(index=range(7)))


def test_backed_csc_footprint_and_toarray(tmp_path):
    from scipy import sparse

    from illico_tpu.io.h5ad import read_h5ad

    rng = np.random.RandomState(3)
    dense = rng.poisson(1.0, (50, 8)).astype(np.float32)
    dense[rng.rand(50, 8) < 0.6] = 0
    ad = AnnDataLite(sparse.csc_matrix(dense),
                     pd.DataFrame({"g": ["a"] * 50}),
                     pd.DataFrame(index=[f"v{i}" for i in range(8)]))
    p = tmp_path / "x.h5ad"
    ad.write_h5ad(p)
    backed = read_h5ad(p, backed="r")
    np.testing.assert_array_equal(backed.X.toarray(), dense)
    assert backed.X.nbytes > 0


def test_csr_validation_empty_boundary_rows():
    """Empty first/last rows must neither crash validation nor mask errors."""
    import scipy.sparse as sp

    from illico_tpu.utils.registry import data_handler_registry

    # Valid CSR whose LAST row is empty: indptr[-2] == nnz previously
    # indexed one past the diff array (IndexError on valid input).
    m = sp.csr_matrix(np.array([[1.0, 2.0], [3.0, 0.0], [0.0, 0.0]]))
    assert m.indptr[-2] == m.nnz  # the boundary that used to go OOB
    data_handler_registry.get(m).validate()  # must not raise

    # Valid CSR whose FIRST row is empty (boundary at position 0).
    m2 = sp.csr_matrix(np.array([[0.0, 0.0], [1.0, 2.0], [3.0, 4.0]]))
    data_handler_registry.get(m2).validate()

    # Unsorted indices in the LAST row with an empty FIRST row: the
    # boundary at 0 previously wrapped to bad[-1], masking exactly this.
    m3 = sp.csr_matrix(np.array([[0.0, 0.0], [1.0, 2.0], [3.0, 4.0]]))
    assert m3.indptr[1] == 0
    m3.indices[-2:] = m3.indices[-2:][::-1]  # unsort the final row pair
    with pytest.raises(ValueError, match="unsorted"):
        data_handler_registry.get(m3).validate()


def test_nullable_integer_boolean_columns_roundtrip(tmp_path):
    """AnnData >= 0.8 nullable-integer/-boolean obs encodings read back."""
    import h5py

    from illico_tpu.io.h5ad import read_h5ad, write_h5ad
    from illico_tpu.io.h5ad import AnnDataLite

    X = np.zeros((3, 2), np.float32)
    ad = AnnDataLite(X, pd.DataFrame({"g": ["a", "b", "a"]},
                                     index=["c0", "c1", "c2"]))
    p = tmp_path / "n.h5ad"
    write_h5ad(ad, p)
    # graft a masked (nullable) column pair the way anndata writes them
    with h5py.File(p, "r+") as f:
        for name, enc, values in (
            ("n_counts", "nullable-integer", np.array([5, 0, 7], np.int32)),
            ("flagged", "nullable-boolean", np.array([True, False, True])),
        ):
            cg = f["obs"].create_group(name)
            cg.attrs["encoding-type"] = enc
            cg.attrs["encoding-version"] = "0.1.0"
            cg.create_dataset("values", data=values)
            cg.create_dataset("mask", data=np.array([False, True, False]))
        order = [c.decode() if isinstance(c, bytes) else c
                 for c in f["obs"].attrs["column-order"]]
        f["obs"].attrs["column-order"] = np.asarray(
            order + ["n_counts", "flagged"], dtype=object
        )
    back = read_h5ad(p)
    assert back.obs["n_counts"].tolist() == [5, pd.NA, 7]
    assert back.obs["flagged"].tolist() == [True, pd.NA, True]


def test_backed_mode_exposes_layers(tmp_path):
    """anndata backs only X but still exposes layers; layer= must work."""
    from illico_tpu.io.h5ad import AnnDataLite, read_h5ad, write_h5ad

    rng = np.random.RandomState(0)
    X = rng.poisson(2.0, (40, 6)).astype(np.float32)
    ad = AnnDataLite(X, layers={"counts": (X * 2).astype(np.float32)})
    p = tmp_path / "l.h5ad"
    write_h5ad(ad, p)
    backed = read_h5ad(p, backed="r")
    assert "counts" in backed.layers
    # Backed layers stay on disk until selected (lazy mapping, no eager
    # densification of every layer).
    assert backed.layers._cache == {}
    np.testing.assert_array_equal(backed.layers["counts"], X * 2)
    assert "counts" in backed.layers._cache
    assert list(backed.layers.keys()) == ["counts"]

    eager = read_h5ad(p)
    assert isinstance(eager.layers, dict)
    np.testing.assert_array_equal(eager.layers["counts"], X * 2)


def test_backed_copy_keeps_layers_lazy(tmp_path):
    """AnnDataLite.copy() on a backed file must not densify on-disk layers
    (iterating items() would materialize every one)."""
    from illico_tpu.io.h5ad import AnnDataLite, read_h5ad, write_h5ad

    rng = np.random.RandomState(1)
    X = rng.poisson(2.0, (30, 5)).astype(np.float32)
    ad = AnnDataLite(
        X,
        layers={
            "a": (X * 2).astype(np.float32),
            "b": (X + 1).astype(np.float32),
        },
    )
    p = tmp_path / "c.h5ad"
    write_h5ad(ad, p)
    backed = read_h5ad(p, backed="r")
    _ = backed.layers["a"]  # materialize one of the two

    cp = backed.copy()
    assert set(cp.layers._cache) == {"a"}  # 'b' still on disk
    assert set(backed.layers._cache) == {"a"}
    # Materialized entries are deep-copied, not shared.
    cp.layers._cache["a"][0, 0] = -1.0
    assert backed.layers["a"][0, 0] != -1.0
    # Lazy entries still readable through the copy.
    np.testing.assert_array_equal(cp.layers["b"], X + 1)


def test_fetch_columns_coalesces_ranges(tmp_path):
    """The generic fetch_columns must issue one backed read per contiguous
    column range (not per column), in any request order, with duplicates."""
    adata, dense = _adata("csc")
    path = tmp_path / "x.h5ad"
    adata.write_h5ad(path)
    back = read_h5ad(path, backed="r")
    ensure_backed_handlers()
    handler = data_handler_registry.get(back.X)

    calls = []
    orig = handler.fetch_tile
    handler.fetch_tile = lambda lb, ub: (calls.append((lb, ub)), orig(lb, ub))[1]

    idx = [7, 8, 2, 3, 4, 12, 3]  # sorted runs: [2,4) [3,5) [7,9) [12,13)
    out = handler.fetch_columns(idx)
    np.testing.assert_array_equal(out, dense[:, idx])
    assert len(calls) == 4  # one read per contiguous run, not per column
    assert sorted(calls) == [(2, 4), (3, 5), (7, 9), (12, 13)]

    assert handler.fetch_columns([]).shape == (dense.shape[0], 0)


def test_write_rejects_exotic_sparse(tmp_path):
    from scipy import sparse as sp

    from illico_tpu.io.h5ad import AnnDataLite, write_h5ad

    X = sp.coo_matrix(np.eye(3, dtype=np.float32))
    with pytest.raises(TypeError, match="convert to CSR or CSC"):
        write_h5ad(AnnDataLite(X), tmp_path / "bad.h5ad")


def test_native_build_failure_is_best_effort(monkeypatch):
    """An unwritable cache dir must degrade to numpy, not crash."""
    import illico_tpu.native as native

    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    monkeypatch.setenv("ILLICO_TPU_CACHE", "/proc/nonexistent/cache")
    assert native._load() is None  # no exception
    from illico_tpu.stats import pvalues_from_stats

    p = pvalues_from_stats(np.asarray([[3.0]]), 0.0, np.asarray([[5.0]]),
                           np.asarray([[4.0]]))
    assert p.shape == (1, 1)
    monkeypatch.setattr(native, "_TRIED", False)  # let later tests rebuild


def test_backed_csc_csort_never_densifies_tiles(tmp_path, monkeypatch):
    """The compact-sort tier on backed CSC must stream O(window-nnz)
    entries from disk, never a dense tile (round-4 VERDICT item 4;
    reference ``utils/registry.py:171-188`` reads only nnz bytes)."""
    from scipy import sparse

    from illico_tpu.io.h5ad import read_h5ad
    from illico_tpu.models.wilcoxon import WilcoxonRunner
    from illico_tpu.utils.groups import encode_and_count_groups
    from illico_tpu.utils.registry import (
        data_handler_registry,
        ensure_backed_handlers,
    )

    ensure_backed_handlers()
    rng = np.random.RandomState(11)
    n, t, g = 400, 12, 4
    dense = rng.poisson(2.0, (n, t)).astype(np.float32)
    dense[rng.rand(n, t) >= 0.3] = 0
    labels = rng.randint(0, g, n)
    labels[:g] = np.arange(g)
    ad = AnnDataLite(sparse.csc_matrix(dense),
                     pd.DataFrame({"g": labels.astype(str)}),
                     pd.DataFrame(index=[f"v{i}" for i in range(t)]))
    p = tmp_path / "x.h5ad"
    ad.write_h5ad(p)
    backed = read_h5ad(p, backed="r")

    handler = data_handler_registry.get(backed.X)
    _, info = encode_and_count_groups(labels.astype(str), "0")
    runner = WilcoxonRunner(handler, info, is_log1p=False, engine="csort")

    def _no_densify(lb, ub):  # engine-selection sampling already ran
        raise AssertionError(
            "csort on backed CSC densified a tile via fetch_tile"
        )

    monkeypatch.setattr(handler, "fetch_tile", _no_densify)
    got = runner.run(progress=False)

    eager = data_handler_registry.get(sparse.csc_matrix(dense))
    want = WilcoxonRunner(eager, info, is_log1p=False, engine="csort").run(
        progress=False
    )
    np.testing.assert_array_equal(got.statistics, want.statistics)
    np.testing.assert_allclose(got.pvalues, want.pvalues, rtol=1e-12,
                               atol=0.0)
    np.testing.assert_allclose(got.fold_change, want.fold_change,
                               rtol=1e-12)
