"""Multi-host (DCN) layout tests, simulated on the virtual 8-device mesh.

Real multi-process hardware is unavailable; everything except the process
boundary — window math, per-host storage fetches, per-host local mesh,
block assembly — is the code a real ``jax.distributed`` run executes
(illico_tpu/parallel/multihost.py).
"""

import jax
import numpy as np
import pandas as pd
import pytest
from scipy import sparse

from illico_tpu.io.h5ad import AnnDataLite
from illico_tpu.parallel.multihost import (
    ColumnWindowHandler,
    _assemble_blocks,
    asymptotic_wilcoxon_multihost,
    host_gene_window,
    simulate_multihost,
    window_handler,
)
from illico_tpu.utils.registry import data_handler_registry


@pytest.mark.parametrize("n_genes", [1, 100, 129, 256, 8000])
@pytest.mark.parametrize("num_hosts", [1, 2, 3, 8])
def test_host_gene_window_partitions_the_axis(n_genes, num_hosts):
    windows = [host_gene_window(n_genes, num_hosts, h) for h in range(num_hosts)]
    # Disjoint, ordered, covering.
    assert windows[0][0] == 0
    assert windows[-1][1] == n_genes
    for (a_lb, a_ub), (b_lb, b_ub) in zip(windows, windows[1:]):
        assert a_ub == b_lb
    # All boundaries 128-aligned except the axis end.
    for lb, ub in windows:
        assert lb % 128 == 0 or lb == n_genes
        assert ub % 128 == 0 or ub == n_genes


def test_host_gene_window_validates_host_id():
    with pytest.raises(ValueError, match="host_id"):
        host_gene_window(100, 2, 2)


def _problem(n_cells=3000, n_genes=256, n_groups=6, seed=3):
    rng = np.random.RandomState(seed)
    x = rng.poisson(2.0, (n_cells, n_genes)).astype(np.float32)
    x[rng.rand(n_cells, n_genes) < 0.6] = 0
    labels = np.array([f"p{v}" for v in rng.randint(0, n_groups, n_cells)])
    return x, labels


@pytest.mark.parametrize("fmt", ["dense", "csr", "csc"])
def test_window_handler_matches_base_slices(fmt):
    x, _ = _problem(n_cells=500)
    X = {"dense": lambda a: a,
         "csr": sparse.csr_matrix,
         "csc": sparse.csc_matrix}[fmt](x)
    base = data_handler_registry.get(X)
    wh = window_handler(base, 128, 256)
    assert wh.shape == (500, 128)
    np.testing.assert_array_equal(
        np.asarray(wh.fetch_tile(0, 40)), x[:, 128:168]
    )
    idx = np.array([0, 5, 5, 127, 64])
    np.testing.assert_array_equal(
        np.asarray(wh.fetch_columns(idx)), x[:, idx + 128]
    )
    assert 0 < wh.footprint() <= base.footprint()


def test_window_handler_backed_reads_only_the_window(tmp_path):
    """A backed dataset windowed to [128, 256) never touches other columns."""
    from illico_tpu.io.h5ad import read_h5ad
    from illico_tpu.utils.registry import ensure_backed_handlers

    ensure_backed_handlers()
    x, labels = _problem(n_cells=400)
    ad = AnnDataLite(
        sparse.csc_matrix(x),
        obs=pd.DataFrame({"g": labels}),
        var=pd.DataFrame(index=[f"g{i}" for i in range(x.shape[1])]),
    )
    path = tmp_path / "w.h5ad"
    ad.write_h5ad(path)
    backed = read_h5ad(path, backed="r")
    base = data_handler_registry.get(backed.X)
    wh = window_handler(base, 128, 256)
    np.testing.assert_array_equal(
        np.asarray(wh.fetch_tile(10, 30)), x[:, 138:158]
    )


def test_window_handler_bounds_validation():
    x, _ = _problem(n_cells=100)
    base = data_handler_registry.get(x)
    with pytest.raises(ValueError, match="Window"):
        ColumnWindowHandler(base, 100, 300)


def test_assemble_blocks_detects_gaps():
    with pytest.raises(RuntimeError, match="cover"):
        _assemble_blocks([(0, 100, np.zeros((2, 100, 3)))], 2, 256)


@pytest.mark.parametrize("engine", ["hist", "sort"])
@pytest.mark.parametrize("reference", ["p0", None], ids=["ovo", "ovr"])
def test_simulate_multihost_matches_single_run(engine, reference):
    """2 simulated hosts x 4 devices == one single-device run, bit for bit."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    x, labels = _problem()
    adata = AnnDataLite(
        x,
        obs=pd.DataFrame({"group": labels}),
        var=pd.DataFrame(index=[f"g{i}" for i in range(x.shape[1])]),
    )
    from illico_tpu import asymptotic_wilcoxon

    kw = dict(
        is_log1p=False, group_keys="group", reference=reference, engine=engine
    )
    df_one = asymptotic_wilcoxon(adata, progress=False, **kw)
    df_mh = simulate_multihost(adata, n_hosts=2, devices_per_host=4, **kw)
    pd.testing.assert_frame_equal(df_mh, df_one)


def test_simulate_multihost_2d_local_mesh_matches_single_run():
    """2 simulated hosts, each laying its 4 local chips out as a 2x2
    (cells x genes) mesh — DCN gene windows composed with cell-axis
    sharding — equals the single-device run bit for bit."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    x, labels = _problem()
    adata = AnnDataLite(
        x,
        obs=pd.DataFrame({"group": labels}),
        var=pd.DataFrame(index=[f"g{i}" for i in range(x.shape[1])]),
    )
    from illico_tpu import asymptotic_wilcoxon

    kw = dict(
        is_log1p=False, group_keys="group", reference="p0", engine="hist"
    )
    df_one = asymptotic_wilcoxon(adata, progress=False, **kw)
    df_mh = simulate_multihost(
        adata, n_hosts=2, devices_per_host=4, local_mesh=(2, 2), **kw
    )
    pd.testing.assert_frame_equal(df_mh, df_one, check_exact=True)


def test_simulate_multihost_empty_trailing_window():
    """More hosts than 128-gene windows: trailing hosts contribute empty
    blocks and assembly still covers the axis."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    x, labels = _problem(n_cells=800, n_genes=100)
    adata = AnnDataLite(
        x,
        obs=pd.DataFrame({"group": labels}),
        var=pd.DataFrame(index=[f"g{i}" for i in range(100)]),
    )
    from illico_tpu import asymptotic_wilcoxon

    kw = dict(is_log1p=False, group_keys="group", reference="p0")
    df_one = asymptotic_wilcoxon(adata, progress=False, **kw)
    df_mh = simulate_multihost(adata, n_hosts=4, devices_per_host=1, **kw)
    pd.testing.assert_frame_equal(df_mh, df_one)


def test_simulate_multihost_backed_csc(tmp_path):
    """Out-of-core multi-host: each host streams only its window from h5."""
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    from illico_tpu.io.h5ad import read_h5ad

    x, labels = _problem(n_cells=600)
    ad = AnnDataLite(
        sparse.csc_matrix(x),
        obs=pd.DataFrame({"group": labels}),
        var=pd.DataFrame(index=[f"g{i}" for i in range(x.shape[1])]),
    )
    path = tmp_path / "mh.h5ad"
    ad.write_h5ad(path)
    backed = read_h5ad(path, backed="r")
    from illico_tpu import asymptotic_wilcoxon

    kw = dict(is_log1p=False, group_keys="group", reference="p0")
    df_one = asymptotic_wilcoxon(backed, progress=False, **kw)
    df_mh = simulate_multihost(backed, n_hosts=2, devices_per_host=2, **kw)
    pd.testing.assert_frame_equal(df_mh, df_one)


def test_multihost_entry_single_process_degrades_to_full_axis():
    """asymptotic_wilcoxon_multihost == asymptotic_wilcoxon when the
    session is a single process (the guarded jax.distributed fallback)."""
    x, labels = _problem(n_cells=800, n_genes=64)
    adata = AnnDataLite(
        x,
        obs=pd.DataFrame({"group": labels}),
        var=pd.DataFrame(index=[f"g{i}" for i in range(64)]),
    )
    from illico_tpu import asymptotic_wilcoxon

    kw = dict(is_log1p=False, group_keys="group", reference="p0")
    df_one = asymptotic_wilcoxon(adata, progress=False, **kw)
    df_mh = asymptotic_wilcoxon_multihost(adata, **kw)
    pd.testing.assert_frame_equal(df_mh, df_one)


def test_simulate_multihost_rejects_oversubscription():
    x, labels = _problem(n_cells=100, n_genes=64)
    adata = AnnDataLite(
        x,
        obs=pd.DataFrame({"group": labels}),
        var=pd.DataFrame(index=[f"g{i}" for i in range(64)]),
    )
    with pytest.raises(ValueError, match="devices"):
        simulate_multihost(
            adata, is_log1p=False, group_keys="group", reference="p0",
            n_hosts=100, devices_per_host=100,
        )


def test_assemble_blocks_detects_overlap_with_matching_total():
    """Overlap + gap whose widths sum to exactly n_genes must still raise:
    a summed-width check alone would let uninitialized memory through
    (windows [0,128)+[100,200)+[228,256) sum to 256 but miss [200,228))."""
    blocks = [
        (0, 128, np.zeros((2, 128, 3))),
        (100, 200, np.zeros((2, 100, 3))),
        (228, 256, np.zeros((2, 28, 3))),
    ]
    with pytest.raises(RuntimeError, match="tile"):
        _assemble_blocks(blocks, 2, 256)


def test_allgather_blocks_survive_device_put_canonicalization(monkeypatch):
    """The DCN gather stages host blocks through ``jax.device_put``, which
    canonicalizes float64 -> float32 when the global x64 flag is off (the
    library never sets it).  ``_allgather_blocks`` must move raw 32-bit
    words so p/U/fc survive bit-exactly."""
    from jax.experimental import multihost_utils

    from illico_tpu.parallel.multihost import _allgather_blocks

    def staged_allgather(arr, tiled=False):
        # Mimic process_allgather's multi-process branch (device_put per
        # local device); the real single-process branch short-circuits
        # around device_put and would mask the canonicalization.
        staged = np.asarray(jax.device_put(np.asarray(arr)))
        return np.expand_dims(staged, axis=0)

    monkeypatch.setattr(multihost_utils, "process_allgather", staged_allgather)
    rng = np.random.RandomState(7)
    block = rng.standard_normal((3, 100, 3))  # full f64 mantissas
    x64_was = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", False)
    try:
        full = _allgather_blocks(0, 100, block, 100, 1)
    finally:
        jax.config.update("jax_enable_x64", x64_was)
    assert full.dtype == np.float64
    np.testing.assert_array_equal(full, block)


def test_initialize_distributed_degrades_without_cluster():
    """A bare initialize_distributed() must ATTEMPT jax.distributed
    bring-up (auto-detection covers pod slices with no announcing env
    vars) and degrade to (1, 0) when no cluster is detectable; explicit
    arguments that are incomplete must surface jax's error."""
    import os
    import subprocess
    import sys

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import jax._src.xla_bridge as xb\n"
        "from illico_tpu.parallel.multihost import initialize_distributed\n"
        "assert not xb._backends, 'import must not initialize the backend'\n"
        "try:\n"
        "    initialize_distributed(num_processes=2, process_id=0)\n"
        "except ValueError:\n"
        "    print('OK')\n"
        "assert initialize_distributed() == (1, 0)\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=240,
        cwd=os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK" in r.stdout


def test_window_handler_data_attribute_is_blocked():
    """ColumnWindowHandler must not expose the un-offset base matrix as
    ``.data`` — a consumer reading it would silently get full-axis columns."""
    x = np.random.RandomState(0).poisson(1.0, (50, 256)).astype(np.float32)
    h = ColumnWindowHandler(data_handler_registry.get(x), 0, 128)
    with pytest.raises(AttributeError, match="window"):
        _ = h.data
