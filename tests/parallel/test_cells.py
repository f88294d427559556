"""Cell-axis (2-D mesh) sharding tests on the virtual 8-device CPU backend.

The reference scales only the gene axis (thread pool over column batches,
``/root/reference/illico/asymptotic_wilcoxon.py:236``); cell-axis sharding
is a capability beyond it, possible because the histogram engine's
per-(group, value, column) counts are additive over cells — one ``psum``
reconstructs the exact global histogram (illico_tpu/parallel/cells.py).
Every test here asserts BIT-EXACT agreement with the single-device run:
the psum adds exact f32 integer counts, so no tolerance is acceptable.
"""

import jax
import numpy as np
import pandas as pd
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from illico_tpu.ops.rank_engine import BLOCK, build_padded_layout
from illico_tpu.parallel.cells import (
    build_cell_shard_plans,
    make_cell_sharded_hist_fn,
    make_mesh_2d,
)
from illico_tpu.utils.groups import encode_and_count_groups


def _needs(n):
    if len(jax.devices()) < n:
        pytest.skip("not enough devices")


@pytest.fixture(scope="module")
def problem():
    rng = np.random.RandomState(7)
    n, t, g = 1003, 256, 6  # n NOT divisible by 2/4/8: exercises row padding
    x = rng.poisson(2.0, (n, t)).astype(np.float32)
    x[rng.rand(n, t) < 0.5] = 0
    labels = rng.randint(0, g, n)
    return x, labels


# -- plan construction --------------------------------------------------------


@pytest.mark.parametrize("n_shards", [1, 2, 3, 4, 8])
def test_plan_partitions_rows_exactly_once(problem, n_shards):
    """Every input row lands in exactly one shard's perm, at its shard-local
    index; pad accounting balances; block metadata is consistent."""
    _, labels = problem
    _, info = encode_and_count_groups(labels, 0)
    plan = build_cell_shard_plans(info, n_shards)

    n_cells = info.n_cells
    assert plan.n_shards == n_shards
    assert plan.rows_per_shard == -(-n_cells // n_shards)
    assert plan.n_pad_shard % BLOCK == 0

    codes = np.asarray(info.encoded_groups)
    grp_of_block = plan.blk_group
    seen = 0
    for s in range(n_shards):
        lo = s * plan.rows_per_shard
        hi = min(lo + plan.rows_per_shard, n_cells)
        local = np.asarray(plan.perm[s])
        real = local[local >= 0]
        # Each local row exactly once, all within the shard's row block.
        assert sorted(real.tolist()) == list(range(hi - lo))
        seen += real.size
        # pad_mask mirrors perm sentinel slots.
        np.testing.assert_array_equal(plan.pad_mask[s], local < 0)
        # Non-pad slots carry the group code of the row they gather, and
        # that code matches the slot's block group.
        slots = np.flatnonzero(local >= 0)
        got = grp_of_block[s][slots // BLOCK]
        np.testing.assert_array_equal(got, codes[lo + real])
        # Every group owns >= 1 block in every shard (its zero histogram
        # row must still be flushed), and flush fires exactly once per
        # group-run boundary + once at the end.
        assert set(range(info.n_groups)) <= set(grp_of_block[s].tolist())
        flush = plan.blk_flush[s]
        assert flush[-1] == 1
        np.testing.assert_array_equal(
            flush[:-1], grp_of_block[s][1:] != grp_of_block[s][:-1]
        )
    assert seen == n_cells
    # Global pad accounting: pad slots per group sum to total pads.
    assert int(plan.pads_total.sum()) == n_shards * plan.n_pad_shard - n_cells


def test_plan_shard_with_absent_group(problem):
    """A group with zero rows in a shard still gets one all-pad block."""
    labels = np.array([0] * 500 + [1] * 300 + [2] * 203)  # sorted: shard 0
    _, info = encode_and_count_groups(labels, 0)           # sees only group 0
    plan = build_cell_shard_plans(info, 4)
    g0 = plan.blk_group[0]
    assert {0, 1, 2} <= set(g0.tolist())
    # Groups 1, 2 are absent from shard 0 (rows 0..250 are all group 0):
    # their blocks must be all-pad.
    for g in (1, 2):
        blocks = np.flatnonzero(g0 == g)
        for b in blocks:
            assert plan.pad_mask[0][b * BLOCK : (b + 1) * BLOCK].all()


# -- raw kernel parity --------------------------------------------------------


@pytest.mark.parametrize("shape", [(2, 4), (4, 2), (8, 1), (1, 8)])
@pytest.mark.parametrize("reference", [0, None], ids=["ovo", "ovr"])
def test_cell_sharded_matches_single_device(problem, shape, reference):
    """Raw tile outputs bit-equal the single-chip histogram engine."""
    from illico_tpu.ops.hist_engine import make_hist_tile_fn

    _needs(shape[0] * shape[1])
    x, labels = problem
    _, info = encode_and_count_groups(labels, reference)
    layout = build_padded_layout(info.perm, info.indptr)

    single = make_hist_tile_fn(
        layout, ref_code=info.ref_code, is_log1p=False, interpret=True
    )
    import jax.numpy as jnp

    want = single.unpack(np.asarray(single(jnp.asarray(x))))

    mesh = make_mesh_2d(*shape)
    plan = build_cell_shard_plans(info, shape[0])
    fn = make_cell_sharded_hist_fn(
        layout, plan, mesh,
        ref_code=info.ref_code, is_log1p=False, interpret=True,
    )
    staged = plan.n_shards * plan.rows_per_shard
    xp = np.zeros((staged, x.shape[1]), x.dtype)
    xp[: x.shape[0]] = x
    xs = jax.device_put(xp, NamedSharding(mesh, P("cells", "genes")))
    got = {k: np.asarray(v) for k, v in fn(xs).items()}

    w = x.shape[1]
    for k in want:
        if k not in got:  # wire-only bookkeeping keys
            continue
        np.testing.assert_array_equal(
            np.asarray(got[k], np.float64)[..., :w],
            np.asarray(want[k], np.float64)[..., :w],
            err_msg=k,
        )


# -- public API parity --------------------------------------------------------


@pytest.mark.parametrize("devices", [(2, 4), (4, 2), (8, 1)])
@pytest.mark.parametrize("reference", ["p0", None], ids=["ovo", "ovr"])
def test_public_api_cells_matches_single(problem, devices, reference):
    """asymptotic_wilcoxon(devices=(c, g)) == single-device, bit for bit."""
    _needs(devices[0] * devices[1])
    from illico_tpu import asymptotic_wilcoxon_arrays

    x, labels = problem
    groups = np.array([f"p{v}" for v in labels])
    kw = dict(reference=reference, engine="hist", progress=False)
    df1 = asymptotic_wilcoxon_arrays(x, groups, **kw)
    df2 = asymptotic_wilcoxon_arrays(x, groups, devices=devices, **kw)
    pd.testing.assert_frame_equal(df1, df2, check_exact=True)


def test_cells_width_realigns_per_gene_shard(problem):
    """batch_size that shards unevenly realigns to 128 per gene shard, and
    multi-tile runs stay bit-exact (row pad applied per tile)."""
    _needs(8)
    from illico_tpu import asymptotic_wilcoxon_arrays

    x, labels = problem
    groups = np.array([f"p{v}" for v in labels])
    kw = dict(reference="p0", engine="hist", progress=False)
    df1 = asymptotic_wilcoxon_arrays(x, groups, batch_size=50, **kw)
    df2 = asymptotic_wilcoxon_arrays(
        x, groups, devices=(2, 4), batch_size=50, **kw
    )
    pd.testing.assert_frame_equal(df1, df2, check_exact=True)


def test_public_api_cells_sorted_labels(problem):
    """Labels sorted by group: early shards hold a single group (the
    absent-group all-pad block path end-to-end)."""
    _needs(8)
    from illico_tpu import asymptotic_wilcoxon_arrays

    x, labels = problem
    order = np.argsort(labels, kind="stable")
    x, labels = x[order], labels[order]
    groups = np.array([f"p{v}" for v in labels])
    kw = dict(reference="p0", engine="hist", progress=False)
    df1 = asymptotic_wilcoxon_arrays(x, groups, **kw)
    df2 = asymptotic_wilcoxon_arrays(x, groups, devices=(8, 1), **kw)
    pd.testing.assert_frame_equal(df1, df2, check_exact=True)


def test_public_api_cells_log1p(problem):
    _needs(8)
    from illico_tpu import asymptotic_wilcoxon_arrays

    x, labels = problem
    xl = np.log1p(x)
    groups = np.array([f"p{v}" for v in labels])
    kw = dict(reference="p0", is_log1p=True, engine="hist", progress=False)
    df1 = asymptotic_wilcoxon_arrays(xl, groups, **kw)
    df2 = asymptotic_wilcoxon_arrays(xl, groups, devices=(2, 4), **kw)
    pd.testing.assert_frame_equal(df1, df2, check_exact=True)


def test_public_api_cells_narrow_wire(problem):
    """Integer-count input ships in its narrow dtype over the 2-D mesh and
    still matches the float32 single-device run exactly."""
    _needs(8)
    from illico_tpu import asymptotic_wilcoxon_arrays

    x, labels = problem
    groups = np.array([f"p{v}" for v in labels])
    kw = dict(reference="p0", engine="hist", progress=False)
    df1 = asymptotic_wilcoxon_arrays(x, groups, **kw)
    df2 = asymptotic_wilcoxon_arrays(
        x.astype(np.uint8), groups, devices=(2, 4), **kw
    )
    pd.testing.assert_frame_equal(df1, df2, check_exact=True)


def test_cells_overflow_column_falls_back_exactly(problem):
    """A column whose counts exceed the sampled value table is recomputed by
    the exact sort fallback, on the cell-sharded path too."""
    _needs(8)
    from illico_tpu import asymptotic_wilcoxon_arrays

    x, labels = problem
    x = x.copy()
    # Column 60 is outside all three sampled windows (0-23, ~116-139,
    # 232-255 for 256 genes): the table stays small and the column
    # overflows at run time.
    x[::3, 60] = 1000.0
    groups = np.array([f"p{v}" for v in labels])
    df_sort = asymptotic_wilcoxon_arrays(
        x, groups, reference="p0", engine="sort", progress=False
    )
    df2 = asymptotic_wilcoxon_arrays(
        x, groups, reference="p0", engine="hist", devices=(2, 4),
        progress=False,
    )
    pd.testing.assert_frame_equal(df_sort, df2, check_exact=True)


def test_cells_precompile_aot_no_dispatch(problem):
    """2-D mesh precompile AOT-lowers with zero real dispatch; identical
    runners share the executable cache (as the 1-D mesh path does)."""
    _needs(8)
    import illico_tpu.parallel.cells as cells_mod
    from illico_tpu.models.wilcoxon import WilcoxonRunner
    from illico_tpu.utils.registry import data_handler_registry

    x, labels = problem
    _, info = encode_and_count_groups(labels, 0)
    mesh = make_mesh_2d(2, 4)

    def build():
        return WilcoxonRunner(
            data_handler_registry.get(x), info, is_log1p=False,
            engine="hist", mesh=mesh,
        )

    runner = build()
    runner.precompile()
    assert runner.tile_fn._counters == {"aot": 0, "jit": 0}
    cache_after_first = len(cells_mod._AOT_CACHE)
    res = runner.run(progress=False)
    assert np.isfinite(res.pvalues[info.ref_code + 1 :]).all()
    n_tiles = len(runner.bounds)
    assert runner.tile_fn._counters == {"aot": n_tiles, "jit": 0}

    runner2 = build()
    runner2.precompile()
    assert len(cells_mod._AOT_CACHE) == cache_after_first
    runner2.run(progress=False)
    assert runner2.tile_fn._counters == {"aot": n_tiles, "jit": 0}


# -- guards -------------------------------------------------------------------


def test_cells_requires_hist_engine(problem):
    _needs(8)
    from illico_tpu import asymptotic_wilcoxon_arrays

    x, labels = problem
    groups = np.array([f"p{v}" for v in labels])
    with pytest.raises(ValueError, match="histogram engine"):
        asymptotic_wilcoxon_arrays(
            x, groups, reference="p0", engine="sort", devices=(2, 4),
            progress=False,
        )
    # float64 input: auto routes to the sort engine, which the cell axis
    # cannot shard — must fail loudly, not silently produce garbage.
    with pytest.raises(ValueError, match="histogram engine"):
        asymptotic_wilcoxon_arrays(
            x.astype(np.float64), groups, reference="p0", devices=(2, 4),
            progress=False,
        )


def test_cells_devices_tuple_validation(problem):
    from illico_tpu import asymptotic_wilcoxon_arrays

    x, labels = problem
    groups = np.array([f"p{v}" for v in labels])
    with pytest.raises(ValueError, match="pair"):
        asymptotic_wilcoxon_arrays(
            x, groups, reference="p0", devices=(2,), progress=False
        )
    # A zero axis must fail loudly, not silently run single-device.
    with pytest.raises(ValueError, match=">= 1"):
        asymptotic_wilcoxon_arrays(
            x, groups, reference="p0", devices=(0, 4), progress=False
        )


def test_cells_mesh_validation(problem):
    _needs(2)
    from illico_tpu.parallel.mesh import make_gene_mesh

    x, labels = problem
    _, info = encode_and_count_groups(labels, 0)
    layout = build_padded_layout(info.perm, info.indptr)
    plan = build_cell_shard_plans(info, 2)
    with pytest.raises(ValueError, match="cells"):
        make_cell_sharded_hist_fn(
            layout, plan, make_gene_mesh(2),
            ref_code=0, is_log1p=False, interpret=True,
        )
    with pytest.raises(ValueError, match="shards"):
        make_cell_sharded_hist_fn(
            layout, plan, make_mesh_2d(4, 2),
            ref_code=0, is_log1p=False, interpret=True,
        )
    with pytest.raises(ValueError):
        make_mesh_2d(16, 1)  # more devices than exist

    with pytest.raises(ValueError, match=">= 1"):
        build_cell_shard_plans(info, 0)


def test_devices_tuple_with_unit_axes_still_runs(problem):
    """(1, n) and (n, 1) tuples are valid degenerate 2-D meshes."""
    _needs(2)
    from illico_tpu import asymptotic_wilcoxon_arrays

    x, labels = problem
    groups = np.array([f"p{v}" for v in labels])
    kw = dict(reference="p0", engine="hist", progress=False)
    df1 = asymptotic_wilcoxon_arrays(x, groups, **kw)
    df2 = asymptotic_wilcoxon_arrays(x, groups, devices=(1, 2), **kw)
    pd.testing.assert_frame_equal(df1, df2, check_exact=True)


def test_mesh_from_spec_routing():
    """mesh_from_spec is the single devices= validation point (api.py and
    parallel/multihost.py both route through it): None/1/(1,1) -> no mesh,
    int>1 and (1,g) -> 1-D gene mesh (no cell-plan/psum overhead), and
    (c>1, g) -> 2-D cells x genes mesh."""
    from illico_tpu.parallel.cells import mesh_from_spec

    assert mesh_from_spec(None) is None
    assert mesh_from_spec(1) is None
    assert mesh_from_spec((1, 1)) is None

    # Spec validation raises before touching the backend — keep these above
    # the device-count guards so they run everywhere.
    with pytest.raises(ValueError, match="pair"):
        mesh_from_spec((2, 2, 2))
    with pytest.raises(ValueError, match=">= 1"):
        mesh_from_spec((2, -1))

    _needs(2)
    m = mesh_from_spec(2)
    assert tuple(m.axis_names) == ("genes",) and m.shape["genes"] == 2
    # (1, g) performs no cell sharding: routes to the engine-agnostic
    # 1-D gene mesh, not the degenerate 2-D machinery.
    m = mesh_from_spec((1, 2))
    assert tuple(m.axis_names) == ("genes",)
    m = mesh_from_spec([1, 2])  # list spec accepted like tuple
    assert tuple(m.axis_names) == ("genes",)

    _needs(4)
    m = mesh_from_spec((2, 2))
    assert tuple(m.axis_names) == ("cells", "genes")
    assert m.shape["cells"] == 2 and m.shape["genes"] == 2
