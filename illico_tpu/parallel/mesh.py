"""Multi-chip execution: gene-axis mesh sharding.

The reference's only parallelism is data parallelism over gene-column batches
via an in-process thread pool (``/root/reference/illico/asymptotic_wilcoxon.py:236``,
SURVEY §2.3).  The TPU-native equivalent is a 1-D device mesh over the gene
axis: every column's rank statistics are independent, so the tile kernel
partitions across chips with **zero cross-chip communication in the hot
path** — collectives appear only when gathering the tiny (n_groups, genes)
summaries.  Because the per-column work is embarrassingly parallel over ICI,
scaling is linear by construction, exactly like the reference's ~7x/8-thread
scaling but at chip granularity.

Cell-axis sharding lives in :mod:`illico_tpu.parallel.cells`: the sort
engine would need a distributed merge of per-shard sorted runs, but the
histogram engine's counts are additive over cells, so a 2-D (cells × genes)
mesh needs exactly one ``psum``.  The gene axis remains the cheaper default
direction (zero hot-path collectives), so it is the primary mesh axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import functools

import jax.numpy as jnp

from illico_tpu.ops.rank_engine import PaddedLayout, rank_stats_tile

__all__ = [
    "make_gene_mesh",
    "make_sharded_tile_fn",
    "make_sharded_hist_fn",
    "make_sharded_csort_fn",
    "shard_map_compat",
]


def shard_map_compat(f, mesh: Mesh, *, in_specs, out_specs):
    """``shard_map`` across jax versions, with vma/replication checks off
    (pallas_call out_shapes carry no vma info)."""
    try:
        from jax import shard_map

        return shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _shard_map

        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )

# Process-wide AOT executable cache for the mesh path, keyed by (mesh
# devices, shapes/dtypes, statics) — the sharded analog of the single-chip
# engines' signature-keyed caches (ops/rank_engine.py / ops/hist_engine.py):
# executables are shared across runners, and precompile never dispatches
# real work.
_AOT_CACHE: dict = {}


def _mesh_key(mesh: Mesh) -> tuple:
    return (
        tuple(str(d) for d in mesh.devices.flat),
        mesh.devices.shape,
        mesh.axis_names,
    )


def make_gene_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the gene axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            # Silent truncation would let scaling numbers be reported for
            # a device count that never ran.
            raise ValueError(
                f"Requested {n_devices} devices but only {len(devices)} "
                "are available."
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("genes",))


def make_sharded_tile_fn(
    layout: PaddedLayout,
    mesh: Mesh,
    *,
    ref_code: int,
    is_log1p: bool,
    compute_fc: bool = True,
):
    """Tile function sharded over the gene axis of ``mesh``.

    Input tile columns must be divisible by the mesh size.  Outputs keep the
    gene axis sharded; per-group rows are replicated (they are tiny).
    """
    col = NamedSharding(mesh, P(None, "genes"))
    rep = NamedSharding(mesh, P())
    out_row = NamedSharding(mesh, P("genes"))

    statics = dict(
        ref_code=int(ref_code), is_log1p=bool(is_log1p), compute_fc=compute_fc
    )
    if ref_code == -1:
        out_shardings = {"R2": col, "tie_col": out_row}
    else:
        out_shardings = {"U2": col, "tie_seg": col, "tie_ref_col": out_row}
    if compute_fc:
        out_shardings["fc_sums"] = col

    kernel = functools.partial(rank_stats_tile, **statics)
    jitted = jax.jit(
        kernel,
        in_shardings=(col, rep, rep, rep, rep, rep),
        out_shardings=out_shardings,
    )

    # Layout arrays committed to the replicated mesh sharding up front: the
    # jit path then never re-stages them per tile, and the AOT executables
    # (whose input shardings are fixed at compile time) accept them as-is.
    perm, grp, pad_mask, bs, be = (
        jax.device_put(a, rep)
        for a in (layout.perm, layout.grp, layout.pad_mask,
                  layout.block_starts, layout.block_ends)
    )
    layout_args = (perm, grp, pad_mask, bs, be)
    state = {"compiled": None}
    counters = {"aot": 0, "jit": 0}

    def precompile(shape, dtype, device=None) -> None:
        key = (
            "sort", _mesh_key(mesh), (tuple(shape), str(dtype)),
            tuple((tuple(a.shape), str(a.dtype)) for a in layout_args),
            tuple(sorted(statics.items())),
        )
        exe = _AOT_CACHE.get(key)
        if exe is None:
            with jax.enable_x64(True):
                lowered = jitted.lower(
                    jax.ShapeDtypeStruct(tuple(shape), dtype, sharding=col),
                    *(jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=rep)
                      for a in layout_args),
                )
                exe = lowered.compile()
            _AOT_CACHE[key] = exe
        state["compiled"] = exe

    def run(x_raw):
        if state["compiled"] is not None:
            counters["aot"] += 1
            return state["compiled"](x_raw, *layout_args)
        counters["jit"] += 1
        # The rank engine's exact accumulations are float64; enabled locally.
        with jax.enable_x64(True):
            return jitted(x_raw, *layout_args)

    run._jitted = jitted
    run._layout_args = layout_args
    run._mesh = mesh
    run._counters = counters
    run.precompile = precompile
    return run


def make_sharded_csort_fn(
    group_info,
    mesh: Mesh,
    *,
    ref_code: int,
    is_log1p: bool,
    compute_fc: bool = True,
):
    """Compact-sort tile function sharded over the gene axis.

    Every csort statistic is per-column (the sort, the prefix sums, the
    ``indptr`` gathers and the closed-form zero block all run along axis 0
    of a column-sharded tile), so the 1-D gene mesh partitions the kernel
    with zero cross-chip collectives — the same embarrassing parallelism
    the reference's thread pool exploits for every kernel uniformly
    (``asymptotic_wilcoxon.py:236``; round-4 VERDICT item 2: the compact
    tier must not be the one engine that refuses to scale).  Host
    compaction stays on the host tiler; shards receive column slices of
    one compacted (M, T) block.  Outputs are the plain dict (no wire
    packing), like the other mesh paths: multi-chip deployments pull
    per-shard results over per-host links, not a single serial tunnel.
    """
    from illico_tpu.ops.csort_engine import CompactTile, csort_stats_tile

    col = NamedSharding(mesh, P(None, "genes"))
    rep = NamedSharding(mesh, P())
    out_row = NamedSharding(mesh, P("genes"))

    statics = dict(
        ref_code=int(ref_code),
        is_log1p=bool(is_log1p),
        n_total=int(group_info.n_cells),
        compute_fc=compute_fc,
        pack=False,
    )
    if ref_code == -1:
        out_shardings = {"R2": col, "tie_col": out_row}
    else:
        out_shardings = {"U2": col, "tie_seg": col, "tie_ref_col": out_row}
    if compute_fc:
        out_shardings["fc_sums"] = col

    jitted = jax.jit(
        functools.partial(csort_stats_tile, **statics),
        in_shardings=(col, col, col, rep),
        out_shardings=out_shardings,
    )
    counts_dev = jax.device_put(
        np.asarray(group_info.counts, dtype=np.int32), rep
    )
    state = {"compiled": None}
    counters = {"aot": 0, "jit": 0}

    def _aot_for(m_pad, t_cols, vdtype, gdtype, idtype):
        key = (
            "csort", _mesh_key(mesh), m_pad, t_cols,
            str(vdtype), str(gdtype), str(idtype),
            int(group_info.n_groups), tuple(sorted(statics.items())),
        )
        exe = _AOT_CACHE.get(key)
        if exe is None:
            g = int(group_info.n_groups)
            with jax.enable_x64(True):
                lowered = jitted.lower(
                    jax.ShapeDtypeStruct((m_pad, t_cols), vdtype, sharding=col),
                    jax.ShapeDtypeStruct((m_pad, t_cols), gdtype, sharding=col),
                    jax.ShapeDtypeStruct((g + 1, t_cols), idtype, sharding=col),
                    jax.ShapeDtypeStruct(
                        counts_dev.shape, counts_dev.dtype, sharding=rep
                    ),
                )
                exe = lowered.compile()
            _AOT_CACHE[key] = exe
        return exe

    def run(tile):
        if isinstance(tile, CompactTile):
            vals, grp, indptr = tile.vals, tile.grp, tile.indptr
        else:
            vals, grp, indptr = tile["vals"], tile.get("grp"), tile["indptr"]
        with jax.enable_x64(True):
            vals_d = jax.device_put(vals, col)
            # OVR never reads grp: alias the values buffer (same trick as
            # the single-chip engine) instead of staging a second (M, T).
            grp_d = vals_d if grp is None else jax.device_put(grp, col)
            indptr_d = jax.device_put(indptr, col)
            exe = _aot_for(
                vals.shape[0], vals.shape[1], vals_d.dtype, grp_d.dtype,
                np.dtype(indptr.dtype),
            )
            counters["aot"] += 1
            return exe(vals_d, grp_d, indptr_d, counts_dev)

    def precompile(tile) -> None:
        gdtype = tile.vals.dtype if tile.grp is None else tile.grp.dtype
        _aot_for(
            tile.vals.shape[0], tile.vals.shape[1],
            tile.vals.dtype, gdtype, np.dtype(tile.indptr.dtype),
        )

    run._mesh = mesh
    run._counters = counters
    run._statics = statics
    run.precompile = precompile
    return run


def make_sharded_hist_fn(
    layout,
    mesh: Mesh,
    *,
    ref_code: int,
    is_log1p: bool,
    compute_fc: bool = True,
    interpret: bool = False,
    v_buckets: int | None = None,
):
    """Histogram-engine tile function sharded over the gene axis.

    The Pallas histogram sweep runs independently per device on its gene
    slice (``shard_map``); the float64 contraction is sharded by XLA's
    partitioner (it is elementwise/reduction over non-gene axes).  Tile
    columns must be divisible by the mesh size; on real TPUs the per-shard
    width must additionally be a multiple of 128 (the caller aligns the
    full tile, so the per-shard pass runs with ``pad_align=1``).

    Outputs are the plain dict (no wire packing): multi-chip runs pull
    per-shard results over fast per-host links, not a single serial tunnel.
    """
    from jax.sharding import PartitionSpec

    def _smap(f, in_specs, out_specs):
        return shard_map_compat(
            f, mesh, in_specs=in_specs, out_specs=out_specs
        )

    from illico_tpu.ops.hist_engine import (
        DEFAULT_V,
        hist_contract,
        hist_contract_statics,
        hist_pass,
        prepare_hist_inputs,
        validate_hist_layout,
    )

    if v_buckets is None:
        v_buckets = DEFAULT_V
    # Same exactness guards as the single-chip engine (minus the packed-wire
    # total-cell bound — this path ships plain arrays, see
    # validate_hist_layout); a forced engine='hist' must fail loudly here
    # too, not silently produce inexact f32 bucket counts.
    validate_hist_layout(layout, packed_wire=False)
    perm, pad_mask, table, blk_group, blk_flush, ppg = prepare_hist_inputs(
        layout, v_buckets, is_log1p
    )
    contract_statics = dict(
        n_pad=float(layout.n_pad),
        is_log1p=bool(is_log1p),
        pack=False,
        **hist_contract_statics(
            layout, ref_code, v_buckets, compute_fc=compute_fc, wire=False
        ),
    )

    col = PartitionSpec(None, "genes")
    rep = PartitionSpec()

    def shard_pass(x, perm, pad_mask, table, blk_group, blk_flush):
        return hist_pass(
            x, perm, pad_mask, table, blk_group, blk_flush,
            n_groups=layout.n_groups, interpret=interpret, pad_align=1,
        )

    sharded_pass = _smap(
        shard_pass,
        in_specs=(col, rep, rep, rep, rep, rep),
        out_specs=PartitionSpec(None, None, "genes"),
    )

    # overflow_cols/tie columns are per-gene: keep them sharded on genes; the
    # (G, T) statistics shard on their gene axis; XLA partitions the
    # contraction automatically from the input sharding.
    jit_pass = jax.jit(sharded_pass)
    jit_contract = jax.jit(
        functools.partial(hist_contract, **contract_statics)
    )

    # Commit the layout arrays to the replicated mesh sharding up front
    # (same rationale as make_sharded_tile_fn).
    col_s = NamedSharding(mesh, col)
    rep_s = NamedSharding(mesh, rep)
    hist_s = NamedSharding(mesh, PartitionSpec(None, None, "genes"))
    perm, pad_mask, table, blk_group, blk_flush, ppg = (
        jax.device_put(a, rep_s)
        for a in (perm, pad_mask, table, blk_group, blk_flush, ppg)
    )
    pass_args = (perm, pad_mask, table, blk_group, blk_flush)
    state = {"pass": None, "contract": None}
    counters = {"aot": 0, "jit": 0}

    def precompile(shape, dtype, device=None) -> None:
        key = (
            "hist", _mesh_key(mesh), (tuple(shape), str(dtype)),
            tuple((tuple(a.shape), str(a.dtype)) for a in pass_args),
            (layout.n_groups, bool(interpret)),
            tuple(sorted(contract_statics.items())),
        )
        cached = _AOT_CACHE.get(key)
        if cached is None:
            with jax.enable_x64(False):
                p_low = jit_pass.lower(
                    jax.ShapeDtypeStruct(tuple(shape), dtype, sharding=col_s),
                    *(jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=rep_s)
                      for a in pass_args),
                )
                p_exe = p_low.compile()
            hist_spec = jax.ShapeDtypeStruct(
                (layout.n_groups, v_buckets, int(shape[1])), jnp.float32,
                sharding=hist_s,
            )
            with jax.enable_x64(True):
                c_low = jit_contract.lower(
                    hist_spec,
                    jax.ShapeDtypeStruct(ppg.shape, ppg.dtype, sharding=rep_s),
                )
                c_exe = c_low.compile()
            cached = (p_exe, c_exe)
            _AOT_CACHE[key] = cached
        state["pass"], state["contract"] = cached

    def run(x_sharded):
        if state["pass"] is not None:
            counters["aot"] += 1
            hist = state["pass"](x_sharded, *pass_args)
            return state["contract"](hist, ppg)
        counters["jit"] += 1
        with jax.enable_x64(False):
            hist = jit_pass(x_sharded, *pass_args)
        with jax.enable_x64(True):
            return jit_contract(hist, ppg)

    run._mesh = mesh
    run._counters = counters
    run.precompile = precompile
    return run
