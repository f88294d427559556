"""Fixtures mirroring the reference test design (``/root/reference/tests/conftest.py:76-121``):
synthetic Poisson AnnData with ~50% zeros, parametrized over format x laziness,
so multi-format and out-of-core paths are tested without big data.

All tests run on a CPU backend with 8 virtual devices so sharding tests work
anywhere (the analog of the reference testing thread parallelism in-process).
"""

import os

# 8 virtual CPU devices must be requested before the CPU client exists.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment's sitecustomize may pre-register a TPU plugin and force
# jax_platforms; tests run on the CPU backend by default (post-import
# override is the only switch that sticks).  Set ILLICO_TPU_TEST_TPU=1 to
# run the whole suite against the real TPU backend instead (multi-device
# sharding tests then skip).
if not os.environ.get("ILLICO_TPU_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
else:
    # Real-TPU suite runs compile through a remote service with bad
    # phases (round-5: 0.27 tests/min cold vs ~5/min warm); the
    # persistent cache makes every repeated shape — the parametrized
    # sweeps reuse a handful — compile once per host lifetime.
    import illico_tpu

    illico_tpu.enable_compilation_cache()
jax.config.update("jax_enable_x64", True)

import numpy as np
import pandas as pd
import pytest
from scipy import sparse

from illico_tpu.io.h5ad import AnnDataLite, read_h5ad


def _make_rand_adata(fmt: str, n_cells=10_000, n_genes=15, n_groups=5, seed=0):
    rng = np.random.RandomState(seed)
    gene_means = rng.uniform(0.1, 15, size=n_genes)
    dense = rng.poisson(gene_means, size=(n_cells, n_genes)).astype(np.float32)
    dense[rng.rand(n_cells, n_genes) < 0.5] = 0
    groups = rng.randint(0, n_groups, size=n_cells)

    if fmt == "dense":
        X = dense
    elif fmt == "csc":
        X = sparse.csc_matrix(dense)
    elif fmt == "csr":
        X = sparse.csr_matrix(dense)
    else:
        raise ValueError(fmt)

    return AnnDataLite(
        X,
        obs=pd.DataFrame({"pert": [f"pert_{g}" for g in groups]}),
        var=pd.DataFrame(index=[f"gene_{i}" for i in range(n_genes)]),
    )


@pytest.fixture(
    scope="function",
    params=[(fmt, lazy) for fmt in ["dense", "csc", "csr"] for lazy in [False, True]],
    ids=lambda p: f"{p[0]}-{'lazy' if p[1] else 'eager'}",
)
def rand_adata(request, tmp_path):
    fmt, lazy = request.param
    adata = _make_rand_adata(fmt)
    if lazy:
        path = tmp_path / f"rand_adata_{fmt}_lazy.h5ad"
        adata.write_h5ad(path)
        adata = read_h5ad(path, backed="r")
    return adata


@pytest.fixture(scope="function")
def eager_rand_adata(rand_adata):
    if rand_adata.isbacked:
        pytest.skip("This fixture returns only in-RAM dataset.")
    return rand_adata
