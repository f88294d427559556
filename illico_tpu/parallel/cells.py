"""Cell-axis sharding: 2-D (cells × genes) meshes for the histogram engine.

The reference scales along exactly one axis — gene-column batches over a
thread pool (``/root/reference/illico/asymptotic_wilcoxon.py:236``) — and
SURVEY §5 notes that splitting the *cell* axis would require a distributed
merge of per-shard sorted runs, because per-group rank sums do not compose
across cell shards.  That is true of comparison-sort ranking.  It is NOT
true of the histogram engine: its per-(group, value, column) counts are
**additive over cells**.  Shard the cell axis, sweep each shard's local
histogram with the unchanged Pallas kernel (:mod:`illico_tpu.ops.hist_engine`),
and one ``psum`` over the cell mesh axis reconstructs the exact global
histogram — the "distributed merge" collapses to a single additive
collective riding ICI.  Every downstream contraction is then bit-identical
to the single-device run: bucket counts are exact float32 integers (the
engine's ``HIST_EXACT_MAX_GROUP`` bound), and float addition of exact
integers below 2**24 is exact in any order.

This gives the framework a scaling axis the reference architecture cannot
express at all: datasets too *tall* for one device's HBM (or one host's
RAM window) split across chips with zero redundant compute, while the gene
axis keeps its embarrassing parallelism on the second mesh dimension.

Layout strategy: the input tile ships sharded ``P("cells", "genes")`` —
contiguous equal row blocks per shard, no host-side reshuffle.  Each shard
gets its own group-contiguous padded layout (over its *local* rows), built
host-side once per run.  Groups with zero local rows still get one all-pad
block so the sweep's DMA flush writes their (zero) histogram row —
otherwise that row would be uninitialized HBM.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from illico_tpu.ops.rank_engine import BLOCK, PaddedLayout
from illico_tpu.utils.groups import GroupInfo

__all__ = [
    "CellShardPlan",
    "make_mesh_2d",
    "mesh_from_spec",
    "build_cell_shard_plans",
    "make_cell_sharded_hist_fn",
]


def mesh_from_spec(spec, devices=None) -> Mesh | None:
    """Mesh from a user ``devices=`` spec — the single validation point
    shared by the public API and the multi-host layer.

    ``None``/``1`` → no mesh; ``int > 1`` → 1-D gene mesh;
    ``(cell_devices, gene_devices)`` → 2-D cells × genes mesh.  A
    ``(1, g)`` pair performs no cell sharding, so it routes to the 1-D
    gene mesh (engine-agnostic, no plan/psum overhead) rather than the
    degenerate 2-D machinery.
    """
    from illico_tpu.parallel.mesh import make_gene_mesh

    if spec is None:
        return None
    if isinstance(spec, (tuple, list)):
        if len(spec) != 2:
            raise ValueError(
                f"devices must be an int or a (cell_devices, gene_devices) "
                f"pair; got {spec!r}"
            )
        cell_dev, gene_dev = (int(v) for v in spec)
        if cell_dev < 1 or gene_dev < 1:
            raise ValueError(
                f"devices axis sizes must be >= 1; got {spec!r}"
            )
        if cell_dev > 1:
            return make_mesh_2d(cell_dev, gene_dev, devices=devices)
        if gene_dev > 1:
            return make_gene_mesh(gene_dev, devices=devices)
        return None
    if int(spec) > 1:
        return make_gene_mesh(int(spec), devices=devices)
    return None

# AOT executable cache for the cell-sharded path (same role as
# parallel/mesh._AOT_CACHE: executables shared across runners, precompile
# never dispatches real work).
_AOT_CACHE: dict = {}


def make_mesh_2d(cell_devices: int, gene_devices: int, devices=None) -> Mesh:
    """2-D mesh with axes ``("cells", "genes")``.

    The cell axis should map to the faster interconnect dimension when the
    physical topology distinguishes them: it carries the one hot-path
    collective (the histogram ``psum``), while the gene axis communicates
    nothing until results are gathered.
    """
    if devices is None:
        devices = jax.devices()
    n = int(cell_devices) * int(gene_devices)
    if n > len(devices):
        raise ValueError(
            f"Requested {cell_devices}x{gene_devices} = {n} devices but "
            f"only {len(devices)} are available."
        )
    grid = np.asarray(devices[:n]).reshape(cell_devices, gene_devices)
    return Mesh(grid, axis_names=("cells", "genes"))


class CellShardPlan(NamedTuple):
    """Host-side per-shard padded layouts, stacked on a leading shard axis.

    ``perm[s]`` holds *local* row indices into shard ``s``'s contiguous
    block of ``rows_per_shard`` input rows (``-1`` = pad slot).  All shards
    share one padded length so the arrays stack into rectangular
    ``(n_shards, ...)`` blocks that shard over the mesh's cell axis.
    """

    perm: np.ndarray        # (S, n_pad_shard) int32; -1 = pad
    pad_mask: np.ndarray    # (S, n_pad_shard) bool
    blk_group: np.ndarray   # (S, n_pad_shard / BLOCK) int32
    blk_flush: np.ndarray   # (S, n_pad_shard / BLOCK) int32
    pads_total: np.ndarray  # (n_groups,) int32: pad slots per group, all shards
    rows_per_shard: int     # input rows per shard (input padded to S * this)
    n_pad_shard: int
    n_shards: int
    n_groups: int
    n_cells: int


def build_cell_shard_plans(info: GroupInfo, n_shards: int) -> CellShardPlan:
    """Per-shard group-contiguous padded layouts for a cell-sharded run.

    Shard ``s`` owns input rows ``[s * rows_per_shard, (s+1) * rows_per_shard)``
    of the (row-padded) input — the blocks ``jax.device_put`` produces for a
    ``P("cells", ...)`` sharding.  Within a shard, local rows are stably
    ordered by group and each group's segment is padded to a multiple of
    ``BLOCK`` rows, with a floor of one block so every group's histogram row
    is flushed (zeros) even when the shard holds none of its cells.
    """
    from illico_tpu.ops.hist_engine import _SUPER_ROWS

    codes = np.asarray(info.encoded_groups)
    n_groups = info.n_groups
    n_cells = int(codes.size)
    s_count = int(n_shards)
    if s_count < 1:
        raise ValueError(f"n_shards must be >= 1 (got {n_shards})")
    rows_per_shard = -(-n_cells // s_count)

    shard_parts: list[tuple[np.ndarray, np.ndarray]] = []
    max_pad = 0
    for s in range(s_count):
        lo = s * rows_per_shard
        hi = min(lo + rows_per_shard, n_cells)
        local = codes[lo:hi] if hi > lo else codes[:0]
        order = np.argsort(local, kind="stable").astype(np.int32)
        cnt = np.bincount(local, minlength=n_groups).astype(np.int64)
        # >= 1 block per group: the Pallas sweep writes a group's output row
        # only at its flush; a group absent from the shard needs an all-pad
        # block so its (zero) row is still written.
        blocks = np.maximum(1, -(-cnt // BLOCK))
        indptr = np.zeros(n_groups + 1, np.int64)
        np.cumsum(blocks * BLOCK, out=indptr[1:])
        n_pad = int(indptr[-1])
        perm = np.full(n_pad, -1, np.int32)
        grp = np.empty(n_pad, np.int32)
        cstart = np.zeros(n_groups + 1, np.int64)
        np.cumsum(cnt, out=cstart[1:])
        for g in range(n_groups):
            seg = order[cstart[g] : cstart[g + 1]]
            perm[indptr[g] : indptr[g] + seg.size] = seg
            grp[indptr[g] : indptr[g + 1]] = g
        shard_parts.append((perm, grp))
        max_pad = max(max_pad, n_pad)

    n_pad_shard = max_pad + (-max_pad) % _SUPER_ROWS
    perms = np.full((s_count, n_pad_shard), -1, np.int32)
    grps = np.empty((s_count, n_pad_shard), np.int32)
    for s, (perm, grp) in enumerate(shard_parts):
        perms[s, : perm.size] = perm
        grps[s, : grp.size] = grp
        # Tail pads ride the last group (always code n_groups - 1: every
        # group owns >= 1 block, in code order); they match no table entry,
        # so they only delay that group's flush to the final block — the
        # same convention as hist_engine.prepare_hist_inputs.
        grps[s, grp.size :] = grp[-1]
    pad_mask = perms < 0
    # Shared flush contract with the single-chip layout
    # (hist_engine.block_metadata); one call per shard row.
    from illico_tpu.ops.hist_engine import block_metadata

    per_shard = [block_metadata(grps[s]) for s in range(s_count)]
    blk_group = np.stack([g for g, _ in per_shard])
    blk_flush = np.stack([f for _, f in per_shard])
    pads_total = np.bincount(
        grps[pad_mask], minlength=n_groups
    ).astype(np.int32)

    return CellShardPlan(
        perm=perms,
        pad_mask=pad_mask,
        blk_group=blk_group,
        blk_flush=blk_flush,
        pads_total=pads_total,
        rows_per_shard=int(rows_per_shard),
        n_pad_shard=int(n_pad_shard),
        n_shards=s_count,
        n_groups=int(n_groups),
        n_cells=n_cells,
    )


def make_cell_sharded_hist_fn(
    layout: PaddedLayout,
    plan: CellShardPlan,
    mesh: Mesh,
    *,
    ref_code: int,
    is_log1p: bool,
    compute_fc: bool = True,
    interpret: bool = False,
    v_buckets: int | None = None,
):
    """Histogram tile function over a 2-D ``("cells", "genes")`` mesh.

    Tiles ship sharded ``P("cells", "genes")`` with rows padded to
    ``plan.n_shards * plan.rows_per_shard``.  Per shard: local Pallas sweep →
    ``psum`` over the cell axis → exact global histogram (replicated over
    cells, sharded over genes) → the standard float64 contraction, which XLA
    partitions over the gene axis.  Outputs are the plain dict, exactly as
    the 1-D mesh path (:func:`illico_tpu.parallel.mesh.make_sharded_hist_fn`).

    ``layout`` is the *global* padded layout — used only for the exactness
    guards and the static statistic bounds (group sizes), which are
    shard-independent.
    """
    from illico_tpu.ops.hist_engine import (
        DEFAULT_V,
        hist_contract,
        hist_contract_statics,
        hist_pass,
        make_value_table,
        validate_hist_layout,
    )
    from illico_tpu.parallel.mesh import _mesh_key, shard_map_compat

    if tuple(mesh.axis_names) != ("cells", "genes"):
        raise ValueError(
            f"Cell-sharded runs need a mesh with axes ('cells', 'genes') "
            f"(got {mesh.axis_names}); build one with make_mesh_2d."
        )
    if int(mesh.shape["cells"]) != plan.n_shards:
        raise ValueError(
            f"Plan was built for {plan.n_shards} cell shards but the mesh "
            f"has {mesh.shape['cells']}."
        )
    if v_buckets is None:
        v_buckets = DEFAULT_V
    # Same exactness guards as the 1-D mesh path (plain arrays, so the
    # packed-wire total-cell bound does not apply).  The psum adds exact
    # f32 integer bucket counts whose total is bounded by the group size,
    # so the single-device bound covers the sharded sum too.
    validate_hist_layout(layout, packed_wire=False)

    n_groups = plan.n_groups
    contract_statics = dict(
        n_pad=float(plan.n_shards * plan.n_pad_shard),
        is_log1p=bool(is_log1p),
        pack=False,
        **hist_contract_statics(
            layout, ref_code, v_buckets, compute_fc=compute_fc, wire=False
        ),
    )

    col = P("cells", "genes")
    row = P("cells", None)
    rep = P()
    hist_spec_p = P(None, None, "genes")

    def shard_fn(x, perm, pad_mask, blk_group, blk_flush, table):
        # Leading shard axis arrives with local extent 1: squeeze it.
        h = hist_pass(
            x, perm[0], pad_mask[0], table, blk_group[0], blk_flush[0],
            n_groups=n_groups, interpret=interpret, pad_align=1,
        )
        return jax.lax.psum(h, "cells")

    sharded_pass = shard_map_compat(
        shard_fn, mesh,
        in_specs=(col, row, row, row, row, rep),
        out_specs=hist_spec_p,
    )
    jit_pass = jax.jit(sharded_pass)
    jit_contract = jax.jit(functools.partial(hist_contract, **contract_statics))

    col_s = NamedSharding(mesh, col)
    row_s = NamedSharding(mesh, row)
    rep_s = NamedSharding(mesh, rep)
    hist_s = NamedSharding(mesh, hist_spec_p)
    perm, pad_mask, blk_group, blk_flush = (
        jax.device_put(np.asarray(a), row_s)
        for a in (plan.perm, plan.pad_mask, plan.blk_group, plan.blk_flush)
    )
    table = jax.device_put(make_value_table(v_buckets, is_log1p), rep_s)
    ppg = jax.device_put(plan.pads_total, rep_s)
    pass_args = (perm, pad_mask, blk_group, blk_flush, table)
    state = {"pass": None, "contract": None}
    counters = {"aot": 0, "jit": 0}

    def precompile(shape, dtype, device=None) -> None:
        key = (
            "cells", _mesh_key(mesh), (tuple(shape), str(dtype)),
            tuple((tuple(a.shape), str(a.dtype)) for a in pass_args),
            (n_groups, bool(interpret)),
            tuple(sorted(contract_statics.items())),
        )
        cached = _AOT_CACHE.get(key)
        if cached is None:
            with jax.enable_x64(False):
                p_low = jit_pass.lower(
                    jax.ShapeDtypeStruct(tuple(shape), dtype, sharding=col_s),
                    *(jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=row_s)
                      for a in pass_args[:-1]),
                    jax.ShapeDtypeStruct(table.shape, table.dtype, sharding=rep_s),
                )
                p_exe = p_low.compile()
            hist_spec = jax.ShapeDtypeStruct(
                (n_groups, v_buckets, int(shape[1])), jnp.float32,
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
    run._plan = plan
    run._counters = counters
    run.precompile = precompile
    return run
