"""Out-of-core memory discipline.

Analog of the reference's memray-gated test
(``/root/reference/tests/test_asymptotic_wilcoxon.py:228-256``): running in
backed mode must keep host heap O(tile), not O(matrix).  memray is not
available here; tracemalloc tracks numpy allocations (the host-side buffers
that matter), so the same discipline is asserted with stdlib tooling.
"""

import tracemalloc

import numpy as np
import pandas as pd
import pytest
from scipy import sparse

from illico_tpu import asymptotic_wilcoxon
from illico_tpu.io.h5ad import AnnDataLite, read_h5ad
from illico_tpu.utils.memory import estimate_memory_usage


def _big_adata(n=20_000, t=400):
    rng = np.random.RandomState(0)
    dense = rng.poisson(1.0, (n, t)).astype(np.float32)
    dense[rng.rand(n, t) < 0.6] = 0
    obs = pd.DataFrame({"pert": [f"p{v}" for v in rng.randint(0, 5, n)]})
    var = pd.DataFrame(index=[f"g{i}" for i in range(t)])
    return AnnDataLite(sparse.csc_matrix(dense), obs, var)


@pytest.mark.parametrize("backed", [True, False], ids=["lazy", "eager"])
def test_backed_heap_discipline(backed, tmp_path):
    adata = _big_adata()
    path = tmp_path / "big.h5ad"
    adata.write_h5ad(path)
    full_bytes = 20_000 * 400 * 4  # 32 MB densified

    del adata

    def run():
        ad = read_h5ad(path, backed="r" if backed else None)
        if not backed:
            # eager CSC densifies per-tile as well; force full
            # materialization to mirror the reference's eager-vs-lazy
            # contrast
            ad = AnnDataLite(ad.X.toarray(), ad.obs, ad.var)
        asymptotic_wilcoxon(
            ad, is_log1p=False, group_keys="pert", reference="p0",
            batch_size=16, n_threads=1, progress=False,
        )

    # Warm-up: XLA compilation allocates tens of MB of host memory through
    # the Python allocator; the discipline under test is the *streaming*
    # heap (the reference's memray bound likewise reflects steady state,
    # numba compile happening at first call).
    run()
    tracemalloc.start()
    base, _ = tracemalloc.get_traced_memory()
    run()
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    heap = peak - base
    if backed:
        assert heap < 0.5 * full_bytes, f"backed heap too large: {heap/1e6:.1f} MB"
    else:
        assert heap > 0.9 * full_bytes, f"eager heap unexpectedly small: {heap/1e6:.1f} MB"


def test_memory_estimator_orders_of_magnitude():
    from illico_tpu.utils.groups import encode_and_count_groups
    from illico_tpu.utils.registry import data_handler_registry

    X = np.zeros((1000, 100), np.float32)
    handler = data_handler_registry.get(X)
    _, info = encode_and_count_groups(np.repeat(np.arange(4), 250), None)
    host, device = estimate_memory_usage(handler, info, 100, 1)
    assert host > 4 * 100 * 3 * 8
    assert device >= 1000 * 100 * 4


def test_host_tile_budget_env_override(monkeypatch):
    from illico_tpu.utils.memory import host_tile_budget

    monkeypatch.setenv("ILLICO_TPU_HOST_BUDGET", "123456789")
    assert host_tile_budget() == 123456789
    monkeypatch.setenv("ILLICO_TPU_HOST_BUDGET", "not-a-number")
    assert host_tile_budget() >= 256 * 2**20  # falls back to RAM-derived
    monkeypatch.delenv("ILLICO_TPU_HOST_BUDGET")
    b = host_tile_budget()
    assert 256 * 2**20 <= b <= 8 * 2**30


def test_auto_width_binds_to_host_budget(monkeypatch):
    """The RAM-derived budget caps the auto tile width for host inputs.

    160 MB budget, 100k cells, n_threads=1 (4 in-flight tiles): the cap is
    160e6 / (4 * 100000 * 4) = 100 columns -> floored to the 128 grid, far
    below the engine's unconstrained 512/2048 preference.
    """
    from illico_tpu.models.wilcoxon import WilcoxonRunner
    from illico_tpu.utils.groups import encode_and_count_groups
    from illico_tpu.utils.registry import data_handler_registry

    monkeypatch.setenv("ILLICO_TPU_HOST_BUDGET", str(int(160e6)))
    n = 100_000
    X = np.zeros((n, 512), np.float32)
    handler = data_handler_registry.get(X)
    _, info = encode_and_count_groups(np.repeat(np.arange(4), n // 4), None)
    for engine in ("sort", "hist"):
        runner = WilcoxonRunner(
            handler, info, is_log1p=False, batch_size="auto",
            n_threads=1, engine=engine,
        )
        assert runner.tile_width == 128, engine


def test_host_watermark_under_budget(monkeypatch):
    """tracemalloc watermark at a scale where the budget binds.

    Full matrix is 100k x 512 x 4B = 205 MB; the 260 MB budget forces
    128-wide tiles (51 MB each, 4 in flight = 205 MB).  The streaming heap
    must stay under the budget (the unbudgeted footprint would be
    4 x 512-wide = 820 MB).
    """
    n, t = 100_000, 512
    rng = np.random.RandomState(0)
    X = rng.poisson(1.0, (n, t)).astype(np.float32)
    labels = np.array([f"p{v}" for v in rng.randint(0, 4, n)])
    from illico_tpu import asymptotic_wilcoxon_arrays

    budget = int(260e6)
    monkeypatch.setenv("ILLICO_TPU_HOST_BUDGET", str(budget))

    def run():
        asymptotic_wilcoxon_arrays(
            X, labels, reference="p0", is_log1p=False,
            batch_size="auto", n_threads=1, progress=False, engine="sort",
        )

    run()  # warm-up: XLA compile allocates through the Python allocator
    tracemalloc.start()
    base, _ = tracemalloc.get_traced_memory()
    run()
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    heap = peak - base
    # results (4 x 512 x 4 arrays x 8B) are negligible; 1.1x slack covers
    # interpreter noise.
    assert heap < 1.1 * budget, f"streaming heap {heap/1e6:.1f} MB over budget"


def test_prefetch_threads_equivalence(tmp_path):
    """n_threads only changes prefetch parallelism, never results."""
    adata = _big_adata(n=5000, t=300)
    path = tmp_path / "t.h5ad"
    adata.write_h5ad(path)
    ad = read_h5ad(path, backed="r")
    kw = dict(
        is_log1p=False, group_keys="pert", reference="p0",
        batch_size=32, progress=False,
    )
    a = asymptotic_wilcoxon(ad, n_threads=1, **kw)
    b = asymptotic_wilcoxon(ad, n_threads=4, **kw)
    pd.testing.assert_frame_equal(a, b)
