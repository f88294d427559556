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

A future cell-axis ("sp"-like) sharding would need a distributed merge of
per-shard sorted runs (the rank merge generalizes to k sorted shards); the
gene axis is always the cheaper direction for this workload, so it is the
primary and default mesh axis.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import functools

import jax.numpy as jnp

from illico_tpu.ops.rank_engine import PaddedLayout, rank_stats_tile

__all__ = ["make_gene_mesh", "make_sharded_tile_fn"]


def make_gene_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the gene axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
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

    perm = jnp.asarray(layout.perm)
    grp = jnp.asarray(layout.grp)
    pad_mask = jnp.asarray(layout.pad_mask)
    bs = jnp.asarray(layout.block_starts)
    be = jnp.asarray(layout.block_ends)

    def run(x_raw):
        # The rank engine's exact accumulations are float64; enabled locally.
        with jax.enable_x64(True):
            return jitted(x_raw, perm, grp, pad_mask, bs, be)

    run._jitted = jitted
    run._layout_args = (perm, grp, pad_mask, bs, be)
    run._mesh = mesh
    return run
