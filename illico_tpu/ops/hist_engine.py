"""Histogram-contraction engine: rank statistics without sorting.

Single-cell expression values are small integers (UMI counts) or their exact
log1p images.  For such data the Mann-Whitney machinery does not need a sort
at all: every statistic the tests require is a contraction of **per-(group,
value, column) histograms** with per-column value tables:

  c[v,j]      = sum_g h[g,v,j]                    (global value counts)
  r2tab[v,j]  = 2*ccum_excl[v,j] + c[v,j] + 1     (2x tie-averaged rank of v)
  OVR:  R2[g,j]     = sum_v h * r2tab             (exact rank sums)
        tie_col[j]  = sum_v c^3 - c
  OVO:  U2[g,j]     = sum_v h * (2*acum_excl + a) (a = ref histogram)
        tie_seg[g,j]= sum_v (h^3 - h) + 3*a*h*(a + h)
        tie_ref[j]  = sum_v a^3 - a
  FC:   sums[g,j]   = sum_v h * v

This replaces the O(n log n) comparison sort of the rank engine with a single
O(n * V) streaming pass — the TPU-native answer to the reference's
"sort controls only once" trick (``/root/reference/README.md:118``) and its
sparse zero-block algebra (``ovo/sparse_ovo.py:74-85``): the zero bucket *is*
the zero block.

The one heavy step — per-group histograms — is a Pallas kernel
(:func:`grouped_histograms`): a single sweep over the group-contiguous padded
tile, accumulating a (V, TB) histogram in VMEM and DMA-flushing it to the
group's row of the (G, V, T) output whenever a group's (block-aligned) segment
ends.  No scatter, no sort, no gather; the inner loop is V broadcast-compares
per block on the VPU.

Values that fall outside the table (count >= V, non-integers, negatives,
NaN) simply match no table entry; affected *columns* are detected from the
count totals and reported so the caller can recompute just those with the
exact sort engine (:mod:`illico_tpu.ops.rank_engine`).  log1p-transformed
data uses a ``log1p(v)`` table — ties and ranks depend only on the underlying
integer counts, so the histogram algebra is exact there too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from illico_tpu.ops.rank_engine import BLOCK, PaddedLayout

__all__ = ["grouped_histograms", "hist_pass", "hist_contract", "make_hist_tile_fn", "DEFAULT_V"]

DEFAULT_V = 128  # table covers integer values 0..V-1; V must be a multiple of 8
_ROW_BLOCK = BLOCK  # row blocks align with the group padding granularity


# Rows fetched per grid step.  Group segments are padded to _ROW_BLOCK rows;
# each step sweeps _SUPER_SUB aligned sub-blocks so the HBM->VMEM input DMAs
# stay large and per-step pipeline overhead is amortized.
_SUPER_SUB = 64
_SUPER_ROWS = _ROW_BLOCK * _SUPER_SUB


def _hist_kernel(blk_group_ref, blk_flush_ref, x_ref, tab_ref, out_ref, acc, sem):
    """One (super-row-block, col-block) step of the grouped histogram sweep."""
    j = pl.program_id(0)  # column block (outer)
    i = pl.program_id(1)  # super row block (inner, sequential)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    tab = tab_ref[:]  # (V, 1) value table, V a multiple of 8
    tb = acc.shape[1]

    for k in range(_SUPER_SUB):
        # (V, BR, TB) broadcast equality, reduced over rows -> (V, TB).
        # Values matching no table entry (overflow, pads' +inf) simply do
        # not count; the caller recovers per-column overflow from totals.
        xk = x_ref[k * _ROW_BLOCK : (k + 1) * _ROW_BLOCK, :]
        cmp = (xk[None, :, :] == tab[:, :, None]).astype(jnp.float32)
        acc[:, :] += jnp.sum(cmp, axis=1)

        @pl.when(blk_flush_ref[i * _SUPER_SUB + k] == 1)
        def _():
            g = blk_group_ref[i * _SUPER_SUB + k]
            copy = pltpu.make_async_copy(
                acc, out_ref.at[g, :, pl.ds(j * tb, tb)], sem
            )
            copy.start()
            copy.wait()
            acc[:] = jnp.zeros_like(acc)


def grouped_histograms(
    x_gathered,
    value_table,
    blk_group,
    blk_flush,
    *,
    n_groups: int,
    interpret: bool = False,
):
    """Per-(group, value, column) histograms of a group-contiguous tile.

    Parameters
    ----------
    x_gathered : (n_pad, T) float32, rows group-contiguous and block-padded
        (pad rows hold +inf and therefore match no table entry).
    value_table : (V, 1) float32 — the tabulated values, ascending (e.g.
        ``0..V-1`` for raw counts, ``log1p(0..V-1)`` for log1p data); V must
        be a multiple of 8 (sublane alignment).
    blk_group : (n_pad / BLOCK,) int32 — group id of each row block.
    blk_flush : (n_pad / BLOCK,) int32 — 1 on a group's last row block.

    Returns
    -------
    (n_groups, V, T) float32 histogram of tabulated values (exact counts;
    untabulated values are absent — recover them from row totals).
    """
    n_pad, t_cols = x_gathered.shape
    v_real = value_table.shape[0]
    if v_real % 8:
        raise ValueError(f"value table size {v_real} must be a multiple of 8")
    if n_pad % _SUPER_ROWS:
        raise ValueError(
            f"padded rows {n_pad} not a multiple of the super block {_SUPER_ROWS}"
        )
    tb = t_cols if t_cols < 128 else 128
    if t_cols % tb:
        raise ValueError(f"tile width {t_cols} not divisible by col block {tb}")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(t_cols // tb, n_pad // _SUPER_ROWS),
        in_specs=[
            pl.BlockSpec(
                (_SUPER_ROWS, tb), lambda j, i, *_: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (v_real, 1), lambda j, i, *_: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((v_real, tb), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    return pl.pallas_call(
        _hist_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_groups, v_real, t_cols), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(blk_group, blk_flush, x_gathered, value_table)


def hist_pass(
    x_raw,
    perm,
    pad_mask,
    value_table,
    blk_group,
    blk_flush,
    *,
    n_groups: int,
    interpret: bool = False,
):
    """32-bit stage: gather to the padded layout and run the Pallas sweep.

    Kept in a separate jit traced *without* x64 — Pallas/Mosaic lowering
    requires 32-bit index arithmetic; the float64 contractions live in
    :func:`hist_contract` traced with x64 enabled.
    """
    gathered = jnp.take(x_raw, jnp.clip(perm, 0, x_raw.shape[0] - 1), axis=0)
    xp = jnp.where(pad_mask[:, None], jnp.asarray(jnp.inf, gathered.dtype), gathered)
    xp = xp.astype(jnp.float32)
    return grouped_histograms(
        xp, value_table, blk_group, blk_flush,
        n_groups=n_groups, interpret=interpret,
    )


def hist_contract(
    hist,
    pads_per_group,
    *,
    n_pad: float,
    ref_code: int,
    is_log1p: bool,
    compute_fc: bool = True,
):
    """64-bit stage: all statistics as exact float64 histogram contractions.
    Same output contract as :func:`illico_tpu.ops.rank_engine.rank_stats_tile`,
    plus ``overflow_cols`` marking columns for the sort-engine fallback."""
    h = hist.astype(jnp.float64)  # (G, V, T)
    out = {}

    # Columns where any real (non-pad) row matched no table entry need the
    # exact sort-engine fallback.
    n_real = jnp.float32(n_pad) - jnp.sum(pads_per_group).astype(jnp.float32)
    matched = jnp.sum(hist, axis=(0, 1))  # (T,)
    out["overflow_cols"] = matched < n_real

    c = jnp.sum(h, axis=0)  # (V, T) global value counts
    ccum_excl = jnp.cumsum(c, axis=0) - c
    if compute_fc:
        # Values are the integer counts themselves; for log1p data the mean of
        # expm1(x) is the mean of the underlying counts.
        vals = jnp.arange(h.shape[1], dtype=jnp.float64)[:, None]
        out["fc_sums"] = jnp.sum(h * vals, axis=1)

    if ref_code == -1:
        r2tab = 2.0 * ccum_excl + c + 1.0
        out["R2"] = jnp.sum(h * r2tab[None], axis=1)
        out["tie_col"] = jnp.sum(c * c * c - c, axis=0)
        # Zeros of the padded layout never reach real buckets, so group sizes
        # are implicit; nothing else needed for OVR.
    else:
        a = h[ref_code]  # (V-1, T)
        acum_excl = jnp.cumsum(a, axis=0) - a
        u2tab = 2.0 * acum_excl + a
        out["U2"] = jnp.sum(h * u2tab[None], axis=1)
        out["tie_ref_col"] = jnp.sum(a * a * a - a, axis=0)
        out["tie_seg"] = jnp.sum(
            (h * h * h - h) + 3.0 * a[None] * h * (a[None] + h), axis=1
        )

    return out


# Process-wide jit caches (mirror the rank engine's).  The Pallas stage is
# traced with x64 disabled (Mosaic needs 32-bit index arithmetic); the
# contraction stage with x64 enabled.  Neither touches the global flag.
_jitted_hist_pass = jax.jit(
    hist_pass, static_argnames=("n_groups", "interpret")
)
_jitted_hist_contract = jax.jit(
    hist_contract,
    static_argnames=("n_pad", "ref_code", "is_log1p", "compute_fc"),
)


def build_block_flags(layout: PaddedLayout) -> tuple[np.ndarray, np.ndarray]:
    """Per-row-block (group id, is-last-block-of-group) prefetch arrays."""
    nb = layout.n_pad // _ROW_BLOCK
    blk_group = layout.grp[::_ROW_BLOCK].astype(np.int32)
    assert blk_group.size == nb
    blk_flush = np.zeros(nb, dtype=np.int32)
    blk_flush[-1] = 1
    blk_flush[:-1] = (blk_group[1:] != blk_group[:-1]).astype(np.int32)
    return blk_group, blk_flush


def make_value_table(v_buckets: int, is_log1p: bool) -> np.ndarray:
    # log1p computed in float32 to match data produced by float32 pipelines
    # (e.g. scanpy's log1p on float32 counts); data transformed differently
    # simply matches no table entry and takes the exact sort path.
    vals = np.arange(v_buckets, dtype=np.float32)
    if is_log1p:
        vals = np.log1p(vals)
    return vals.astype(np.float32)[:, None]


def real_rows_per_group(layout: PaddedLayout) -> np.ndarray:
    return np.asarray(
        [
            np.count_nonzero(~layout.pad_mask[s * BLOCK : e * BLOCK])
            for s, e in zip(layout.block_starts, layout.block_ends)
        ],
        dtype=np.int64,
    )


def pads_per_group(layout: PaddedLayout) -> np.ndarray:
    seg = (layout.block_ends.astype(np.int64) - layout.block_starts) * BLOCK
    return (seg - real_rows_per_group(layout)).astype(np.int32)


def make_hist_tile_fn(
    layout: PaddedLayout,
    *,
    ref_code: int,
    is_log1p: bool,
    compute_fc: bool = True,
    v_buckets: int = DEFAULT_V,
    interpret: bool = False,
):
    """Histogram-engine tile function with the layout baked in."""
    # Extend the padded layout to a multiple of the kernel's super block;
    # extension rows are pads attributed to the last group (they match no
    # table entry, so they only delay that group's flush to the final step).
    rem = (-layout.n_pad) % _SUPER_ROWS
    perm_np = layout.perm
    grp_np = layout.grp
    if rem:
        perm_np = np.concatenate([perm_np, np.full(rem, -1, np.int32)])
        tail_grp = grp_np[-1] if grp_np.size else np.int32(0)
        grp_np = np.concatenate([grp_np, np.full(rem, tail_grp, np.int32)])
    pad_np = perm_np < 0
    blk_group = grp_np[::_ROW_BLOCK].astype(np.int32)
    blk_flush = np.zeros(blk_group.size, dtype=np.int32)
    blk_flush[-1] = 1
    blk_flush[:-1] = (blk_group[1:] != blk_group[:-1]).astype(np.int32)

    perm = jnp.asarray(perm_np)
    pad_mask = jnp.asarray(pad_np)
    blk_group = jnp.asarray(blk_group)
    blk_flush = jnp.asarray(blk_flush)
    table = jnp.asarray(make_value_table(v_buckets, is_log1p))
    ppg = jnp.asarray(pads_per_group(layout))
    pass_statics = dict(n_groups=layout.n_groups, interpret=interpret)
    contract_statics = dict(
        n_pad=float(layout.n_pad),
        ref_code=int(ref_code),
        is_log1p=bool(is_log1p),
        compute_fc=compute_fc,
    )
    pass_args = (perm, pad_mask, table, blk_group, blk_flush)
    state = {"pass": None, "contract": None}

    def precompile(shape, dtype, device=None) -> None:
        key = (
            (tuple(shape), str(dtype)),
            tuple((tuple(a.shape), str(a.dtype)) for a in pass_args),
            tuple(sorted(pass_statics.items())),
            tuple(sorted(contract_statics.items())),
            str(device),
        )
        cached = _AOT_CACHE.get(key)
        if cached is None:
            with jax.enable_x64(False):
                p_low = _jitted_hist_pass.lower(
                    jax.ShapeDtypeStruct(tuple(shape), dtype),
                    *(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in pass_args),
                    **pass_statics,
                )
                p_exe = p_low.compile()
            hist_spec = jax.ShapeDtypeStruct(
                (layout.n_groups, table.shape[0], shape[1]), jnp.float32
            )
            with jax.enable_x64(True):
                c_low = _jitted_hist_contract.lower(
                    hist_spec,
                    jax.ShapeDtypeStruct(ppg.shape, ppg.dtype),
                    **contract_statics,
                )
                c_exe = c_low.compile()
            cached = (p_exe, c_exe)
            _AOT_CACHE[key] = cached
        state["pass"], state["contract"] = cached

    def run(x_raw):
        if state["pass"] is not None:
            hist = state["pass"](x_raw, *pass_args)
            return state["contract"](hist, ppg)
        with jax.enable_x64(False):
            hist = _jitted_hist_pass(x_raw, *pass_args, **pass_statics)
        with jax.enable_x64(True):
            return _jitted_hist_contract(hist, ppg, **contract_statics)

    run._layout_args = pass_args
    run._statics = {**pass_statics, **contract_statics}
    run.precompile = precompile
    return run


_AOT_CACHE: dict = {}
