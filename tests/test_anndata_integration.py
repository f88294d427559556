"""Optional-dependency integration suite against REAL ``anndata.AnnData``.

The reference operates directly on anndata objects
(``/root/reference/illico/asymptotic_wilcoxon.py:71-83``) and its fixtures
build them (``/root/reference/tests/conftest.py:76-121``).  This package
duck-types AnnData, so the core suite runs on :class:`AnnDataLite`; these
tests close the loop on the real library when it is installed (CI installs
it — ``.github/workflows/python-package.yaml``) and skip cleanly otherwise.

Covered: eager dense/CSR/CSC AnnData through the full scipy oracle, the
h5ad round trip written BY anndata and read back in backed mode (exercising
the registered ``_CSCDataset`` handler and the backed-CSR rejection
contract), and equality with the AnnDataLite path on identical data.
"""

import numpy as np
import pandas as pd
import pytest
from scipy import sparse

anndata = pytest.importorskip("anndata")

from illico_tpu import asymptotic_wilcoxon
from illico_tpu.io.h5ad import AnnDataLite

# Absolute import: pytest's prepend import mode puts tests/ on sys.path
# (no tests/__init__.py, so relative imports are unavailable here).
from test_asymptotic_wilcoxon import ATOL, RTOL, scipy_mannwhitneyu


def _make_real_adata(fmt, n_cells=4_000, n_genes=13, n_groups=4, seed=3):
    rng = np.random.RandomState(seed)
    dense = rng.poisson(
        rng.uniform(0.1, 12, size=n_genes), size=(n_cells, n_genes)
    ).astype(np.float32)
    dense[rng.rand(n_cells, n_genes) < 0.5] = 0
    groups = rng.randint(0, n_groups, size=n_cells)
    X = {
        "dense": lambda: dense,
        "csr": lambda: sparse.csr_matrix(dense),
        "csc": lambda: sparse.csc_matrix(dense),
    }[fmt]()
    return anndata.AnnData(
        X=X,
        obs=pd.DataFrame(
            {"pert": pd.Categorical([f"pert_{g}" for g in groups])},
            index=[f"cell_{i}" for i in range(n_cells)],
        ),
        var=pd.DataFrame(index=[f"gene_{i}" for i in range(n_genes)]),
    )


@pytest.mark.parametrize("fmt", ["dense", "csr", "csc"])
@pytest.mark.parametrize("test", ["ovo", "ovr"])
def test_real_anndata_oracle(fmt, test):
    adata = _make_real_adata(fmt)
    reference = "pert_0" if test == "ovo" else None
    got = asymptotic_wilcoxon(
        adata=adata, is_log1p=False, group_keys="pert", reference=reference,
        batch_size=16, progress=False,
    )
    want = scipy_mannwhitneyu(
        adata=adata, groupby_key="pert", reference=reference,
        use_continuity=True, alternative="two-sided",
    )
    got = got.loc[want.index]
    np.testing.assert_allclose(
        got.statistic.values, want.statistic.values, atol=0.0, rtol=0.0
    )
    np.testing.assert_allclose(
        got.p_value.values, want.p_value.values, atol=ATOL, rtol=RTOL
    )
    np.testing.assert_allclose(
        got.fold_change.values, want.fold_change.values, rtol=1e-6
    )


def test_real_anndata_matches_lite():
    """Same bytes in -> identical frame whether wrapped by anndata or Lite."""
    adata = _make_real_adata("dense")
    lite = AnnDataLite(
        np.asarray(adata.X),
        obs=pd.DataFrame({"pert": np.asarray(adata.obs["pert"]).astype(str)}),
        var=pd.DataFrame(index=adata.var_names),
    )
    kwargs = dict(
        is_log1p=False, group_keys="pert", reference="pert_0",
        batch_size=16, progress=False,
    )
    pd.testing.assert_frame_equal(
        asymptotic_wilcoxon(adata=adata, **kwargs),
        asymptotic_wilcoxon(adata=lite, **kwargs),
    )


def test_real_anndata_backed_csc(tmp_path):
    """anndata-written h5ad, opened backed -> the registered ``_CSCDataset``
    handler (``illico_tpu/utils/registry.py:262-268``) must serve tiles."""
    adata = _make_real_adata("csc")
    path = tmp_path / "real_csc.h5ad"
    adata.write_h5ad(path)
    backed = anndata.read_h5ad(path, backed="r")
    got = asymptotic_wilcoxon(
        adata=backed, is_log1p=False, group_keys="pert", reference="pert_0",
        batch_size=16, progress=False,
    )
    eager = asymptotic_wilcoxon(
        adata=adata, is_log1p=False, group_keys="pert", reference="pert_0",
        batch_size=16, progress=False,
    )
    pd.testing.assert_frame_equal(got, eager)


def test_real_anndata_backed_csr_rejected(tmp_path):
    """Backed CSR keeps the reference's explicit rejection contract
    (``/root/reference/illico/asymptotic_wilcoxon.py:96-101``)."""
    adata = _make_real_adata("csr")
    path = tmp_path / "real_csr.h5ad"
    adata.write_h5ad(path)
    backed = anndata.read_h5ad(path, backed="r")
    with pytest.raises(KeyError, match="is not implemented"):
        asymptotic_wilcoxon(
            adata=backed, is_log1p=False, group_keys="pert",
            reference="pert_0", progress=False,
        )
