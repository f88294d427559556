"""Core TPU rank engine: one global sort per column serves every group.

This is the TPU-native replacement for the reference's six numba kernels
(``/root/reference/illico/ovo/*.py``, ``/root/reference/illico/ovr/*.py``).
Instead of translating the CPU design (per-group sorts + linear merges for
OVO, per-column argsort + tie walk for OVR), both tests are derived from a
*single* ``lax.sort`` of each gene column over all cells:

- **OVR** (``ovr/dense_ovr.py:15-80`` semantics): global tie-averaged ranks
  are computed from the sorted column, then per-group rank sums are exact
  segment sums.

- **OVO** (``ovo/dense_ovo.py``, ``ovo/sparse_ovo.py`` semantics): for the
  pair (ref, g), ``U_tgt = #{(r,e): r in ref, e in g, r < e} + 0.5 * #{r == e}``.
  Both pair counts are per-element prefix quantities of the global sort
  (number of reference elements strictly below / inside my tie block), so the
  U statistic of *every* group against the reference falls out of one sort —
  removing the reference's O(n_groups * n_ref) merge term entirely
  (``README.md:118`` describes that cost).  Tie sums decompose per value-block
  as ``(a+t)^3-(a+t) = (a^3-a) + (t^3-t) + 3at(a+t)`` with ``a`` = ref count
  and ``t`` = group count in the block: the first term is a per-column scalar,
  the rest are per-element payloads summed per group.

Layout contract (set up by the host, see ``illico_tpu/utils/groups.py``):
rows are permuted so groups are contiguous, and each group segment is padded
to a multiple of ``BLOCK`` rows with sentinel rows (+inf values) that sort to
the end of every column and carry zero payloads.  Per-group reductions are
then *static-boundary* segment sums: int32 within-block sums (exact) + a
small float64 cross-block cumsum (exact below 2^53) + constant-index slices.
No scatter, no gather, no data-dependent shapes anywhere on device.

Exactness: rank sums and U statistics are exact integers / half-integers
(bit-identical to scipy's float64 results); tie sums are float64 with
~1e-16 relative error (same class as scipy's own float64 evaluation).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "BLOCK",
    "PaddedLayout",
    "build_padded_layout",
    "rank_stats_tile",
    "make_tile_fn",
]

# Rows per segment-sum block. Group segments are padded to a multiple of this,
# so within-block partial sums never cross a group boundary.
BLOCK = 32

_I32_MAX = np.int32(2**31 - 1)

# Largest padded row count for which the int32 block-partial segment sums
# are provably exact: per-element integer payloads are bounded by
# 3*n_pad + 2 (OVO qu2 = 2*ref_less + ref_eq; OVR r2 = first + last + 2),
# and a BLOCK-row partial sum of them must stay below 2^31.  Beyond this
# (~22M rows) rank_stats_tile switches the segment sums to float64.
_I32_SAFE_N_PAD = (2**31 // BLOCK - 3) // 3


class PaddedLayout(NamedTuple):
    """Static (host-side) description of the group-contiguous padded layout."""

    perm: np.ndarray          # (n_pad,) int32: source row per padded slot; -1 = pad
    grp: np.ndarray           # (n_pad,) int32: group code per padded slot (G for pads)
    pad_mask: np.ndarray      # (n_pad,) bool: True on pad slots
    block_starts: np.ndarray  # (n_groups,) int32: first block index of each group
    block_ends: np.ndarray    # (n_groups,) int32: one-past-last block index
    n_cells: int
    n_groups: int

    @property
    def n_pad(self) -> int:
        return int(self.perm.size)


def build_padded_layout(perm: np.ndarray, indptr: np.ndarray, block: int = BLOCK) -> PaddedLayout:
    """Pad each group's contiguous segment to a multiple of ``block`` rows."""
    n_groups = indptr.size - 1
    counts = np.diff(indptr)
    padded_counts = ((counts + block - 1) // block) * block
    # Groups with zero rows keep zero blocks.
    out_indptr = np.zeros(n_groups + 1, dtype=np.int64)
    np.cumsum(padded_counts, out=out_indptr[1:])
    n_pad = int(out_indptr[-1])

    perm_pad = np.full(n_pad, -1, dtype=np.int32)
    grp_pad = np.full(n_pad, n_groups, dtype=np.int32)
    for g in range(n_groups):
        s, e = int(indptr[g]), int(indptr[g + 1])
        os = int(out_indptr[g])
        perm_pad[os : os + (e - s)] = perm[s:e]
        grp_pad[os : int(out_indptr[g + 1])] = g

    return PaddedLayout(
        perm=perm_pad,
        grp=grp_pad,
        pad_mask=perm_pad < 0,
        block_starts=(out_indptr[:-1] // block).astype(np.int32),
        block_ends=(out_indptr[1:] // block).astype(np.int32),
        n_cells=int(indptr[-1]),
        n_groups=int(n_groups),
    )


def _block_segment_sum_i32(q, block_starts, block_ends, block=BLOCK):
    """Exact per-group sums of int32 payloads over block-aligned segments.

    q: (n_pad, T) int32 with per-element magnitude small enough that a
    ``block``-row partial sum fits int32. Returns (G, T) float64, exact as
    long as each group's total stays below 2^53.
    """
    n_pad, t = q.shape
    nb = n_pad // block
    within = jnp.sum(q.reshape(nb, block, t), axis=1, dtype=jnp.int32)  # (nb, T)
    cross = jnp.cumsum(within.astype(jnp.float64), axis=0)  # (nb, T) exact ints
    css = jnp.concatenate([jnp.zeros((1, t), jnp.float64), cross], axis=0)
    return css[block_ends] - css[block_starts]  # constant-index slices


def _block_segment_sum_f64(q, block_starts, block_ends, block=BLOCK):
    """Per-group sums of float64 payloads over block-aligned segments."""
    n_pad, t = q.shape
    nb = n_pad // block
    within = jnp.sum(q.reshape(nb, block, t), axis=1)  # (nb, T) f64
    cross = jnp.cumsum(within, axis=0)
    css = jnp.concatenate([jnp.zeros((1, t), jnp.float64), cross], axis=0)
    return css[block_ends] - css[block_starts]


def _tie_block_bounds(sorted_vals):
    """First/last index of each element's tie block along axis 0.

    Returns (first, last) int32 arrays, same shape as ``sorted_vals``.
    Uses running max/min propagation of boundary markers — no gathers.
    """
    n = sorted_vals.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, sorted_vals.shape, 0)
    neq_prev = jnp.concatenate(
        [jnp.ones_like(sorted_vals[:1], bool), sorted_vals[1:] != sorted_vals[:-1]], axis=0
    )
    neq_next = jnp.concatenate(
        [sorted_vals[1:] != sorted_vals[:-1], jnp.ones_like(sorted_vals[:1], bool)], axis=0
    )
    first = jax.lax.cummax(jnp.where(neq_prev, idx, 0), axis=0)
    last = jax.lax.cummin(jnp.where(neq_next, idx, jnp.int32(n - 1) + 1), axis=0, reverse=True)
    return first, last


def _subblock_bounds(sorted_vals, sorted_grp):
    """Tie-block bounds refined by group: (value, group) sub-blocks."""
    n = sorted_vals.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, sorted_vals.shape, 0)
    brk = sorted_vals[1:] != sorted_vals[:-1]
    brk = brk | (sorted_grp[1:] != sorted_grp[:-1])
    neq_prev = jnp.concatenate([jnp.ones_like(brk[:1]), brk], axis=0)
    neq_next = jnp.concatenate([brk, jnp.ones_like(brk[:1])], axis=0)
    first = jax.lax.cummax(jnp.where(neq_prev, idx, 0), axis=0)
    last = jax.lax.cummin(jnp.where(neq_next, idx, jnp.int32(n - 1) + 1), axis=0, reverse=True)
    return first, last


def rank_stats_tile(
    x_raw,
    perm,
    grp,
    pad_mask,
    block_starts,
    block_ends,
    *,
    ref_code: int,
    is_log1p: bool,
    compute_fc: bool = True,
):
    """Per-tile device computation.  All shapes static.

    Parameters
    ----------
    x_raw : (n_cells, T) tile of expression values (original row order).
    perm : (n_pad,) int32 — padded permutation (pads clipped to 0, masked).
    grp : (n_pad,) int32 — group code per padded slot.
    pad_mask : (n_pad,) bool.
    block_starts / block_ends : (G,) int32 — static segment bounds in blocks.
    ref_code : static; -1 selects OVR, otherwise OVO against that group.
    is_log1p : static; expm1 data before summing expression for fold change.

    Returns a dict of small per-(group, column) float64 arrays:
      OVR: R2 (2x rank sums, exact), tie_col (T,)
      OVO: U2 (2x U_tgt, exact), tie_seg (G, T), tie_ref_col (T,)
      both: fc_sums (G, T) when compute_fc, nnz not required (dense algebra).
    """
    # Narrow-wire inputs (int8/uint16/float16 shipped in storage dtype) are
    # cast to float32 on device — exact for integers below 2**24 and for
    # every float16 value; float32/float64 tiles pass through untouched.
    if x_raw.dtype not in (jnp.float32, jnp.float64):
        x_raw = x_raw.astype(jnp.float32)
    n_pad = perm.shape[0]
    t_cols = x_raw.shape[1]
    # Static trace-time branch: above _I32_SAFE_N_PAD rows the int32
    # block-partial sums could wrap, so the segment sums switch to float64
    # (slower, still exact below 2^53).
    i32_blocks_safe = n_pad <= _I32_SAFE_N_PAD

    def _int_segment_sum(q, starts, ends):
        if i32_blocks_safe:
            return _block_segment_sum_i32(q, starts, ends)
        return _block_segment_sum_f64(q.astype(jnp.float64), starts, ends)

    # --- Assemble the padded, group-contiguous tile -------------------------
    gathered = jnp.take(x_raw, jnp.clip(perm, 0, x_raw.shape[0] - 1), axis=0)
    pad2d = pad_mask[:, None]
    # Pad sentinels sort to the end of every column (values must be finite).
    xp = jnp.where(pad2d, jnp.asarray(jnp.inf, gathered.dtype), gathered)

    out = {}

    # --- Fold-change expression sums (no sort involved) ---------------------
    if compute_fc:
        expr = jnp.expm1(gathered) if is_log1p else gathered
        expr = jnp.where(pad2d, 0.0, expr).astype(jnp.float64)
        out["fc_sums"] = _block_segment_sum_f64(expr, block_starts, block_ends)

    pos = jax.lax.broadcasted_iota(jnp.int32, (n_pad, t_cols), 0)
    grp2d = jnp.broadcast_to(grp[:, None], (n_pad, t_cols))

    if ref_code == -1:
        # ---------------- OVR: global tie-averaged ranks --------------------
        sv, spos = jax.lax.sort((xp, pos), dimension=0, num_keys=1)
        first, last = _tie_block_bounds(sv)
        # 2x (1-based average rank) = first + last + 2 — exact int32.
        r2 = first + last + 2
        # Per-column tie sum: each element of a t-block contributes t^2 - 1.
        t_blk = (last - first + 1).astype(jnp.float64)
        pad_sorted = jnp.isinf(sv)
        tie_el = jnp.where(pad_sorted, 0.0, t_blk * t_blk - 1.0)
        out["tie_col"] = jnp.sum(tie_el, axis=0)
        # Restore layout order; zero payloads on (statically-placed) pad slots.
        _, r2_l = jax.lax.sort((spos, r2), dimension=0, num_keys=1)
        r2_l = jnp.where(pad2d, 0, r2_l)
        out["R2"] = _int_segment_sum(r2_l, block_starts, block_ends)
    else:
        # ---------------- OVO: all pairs (ref, g) from one sort -------------
        sv, sg, spos = jax.lax.sort((xp, grp2d, pos), dimension=0, num_keys=2)
        first, last = _tie_block_bounds(sv)
        isref = (sg == ref_code).astype(jnp.int32)
        # Inclusive prefix count of reference elements.
        cref = jnp.cumsum(isref, axis=0)
        cref_excl = cref - isref
        # Reference elements strictly below my tie block: prefix count at the
        # block start, propagated forward (monotone, so cummax is exact).
        neq_prev = jnp.concatenate(
            [jnp.ones_like(sv[:1], bool), sv[1:] != sv[:-1]], axis=0
        )
        ref_less = jax.lax.cummax(jnp.where(neq_prev, cref_excl, 0), axis=0)
        # Reference elements inside my tie block: prefix at block end minus start.
        neq_next = jnp.concatenate(
            [sv[1:] != sv[:-1], jnp.ones_like(sv[:1], bool)], axis=0
        )
        ref_at_end = jax.lax.cummin(
            jnp.where(neq_next, cref, _I32_MAX), axis=0, reverse=True
        )
        ref_eq = ref_at_end - ref_less
        # 2 * per-element U_tgt contribution (exact int32, <= 3n).
        qu2 = 2 * ref_less + ref_eq
        # (value, group) sub-block size t for the 3at(a+t) + (t^3-t) tie terms.
        sfirst, slast = _subblock_bounds(sv, sg)
        t_sub = (slast - sfirst + 1).astype(jnp.float64)
        a_ref = ref_eq.astype(jnp.float64)
        q_tie = (t_sub * t_sub - 1.0) + 3.0 * a_ref * (a_ref + t_sub)
        # Per-column scalar: sum over value-blocks of a^3 - a (each ref
        # element contributes a^2 - 1).
        pad_sorted = jnp.isinf(sv)
        ref_term = jnp.where(
            pad_sorted | (isref == 0), 0.0, a_ref * a_ref - 1.0
        )
        out["tie_ref_col"] = jnp.sum(ref_term, axis=0)
        # Back to layout order, zero the pads, segment-sum per group.
        _, qu2_l, qtie_l = jax.lax.sort((spos, qu2, q_tie), dimension=0, num_keys=1)
        qu2_l = jnp.where(pad2d, 0, qu2_l)
        qtie_l = jnp.where(pad2d, 0.0, qtie_l)
        out["U2"] = _int_segment_sum(qu2_l, block_starts, block_ends)
        out["tie_seg"] = _block_segment_sum_f64(qtie_l, block_starts, block_ends)

    return out


def _packed_rank_stats(
    x_raw, perm, grp, pad_mask, block_starts, block_ends,
    *,
    ref_code: int,
    is_log1p: bool,
    compute_fc: bool,
    u2_dtype: str,
    tie_dtype: str,
    narrow_items: tuple,
):
    """rank_stats_tile + the single-buffer packed wire.

    A separate jitted entry so the plain (dict) graph — and its persistent
    cache entries — stay untouched.  OVO reference self-rows are zeroed
    (the consumer writes sentinels there), which is what makes the narrow
    wire tiers' bounds — computed over the NON-reference groups — sound,
    exactly as in the histogram and compact engines.
    """
    out = rank_stats_tile(
        x_raw, perm, grp, pad_mask, block_starts, block_ends,
        ref_code=ref_code, is_log1p=is_log1p, compute_fc=compute_fc,
    )
    dev = {"int32": jnp.int32}
    if ref_code != -1:
        out["U2"] = out["U2"].at[ref_code].set(0.0).astype(
            dev.get(u2_dtype, jnp.float64)
        )
        out["tie_seg"] = out["tie_seg"].at[ref_code].set(0.0).astype(
            dev.get(tie_dtype, jnp.float64)
        )
    else:
        out["R2"] = out["R2"].astype(dev.get(u2_dtype, jnp.float64))
    # Exact engine, no overflow possible — the (all-False) flag column is
    # carried so the fused native C++ consumer engages on this wire too.
    out["overflow_cols"] = jnp.zeros((x_raw.shape[1],), jnp.bool_)
    from illico_tpu.ops.hist_engine import pack_device_outputs

    return pack_device_outputs(out, dict(narrow_items))[0]


# Single process-wide jit cache: every runner with the same shapes and static
# flags reuses one executable (the reference avoids redundant numba compiles
# the same way via its signature-keyed dispatcher, ``utils/compile.py:14-17``).
# float64 is enabled *locally* at trace time — this library never mutates the
# global x64 flag (and Pallas kernels elsewhere must trace without x64).
_jitted_rank_stats = jax.jit(
    rank_stats_tile, static_argnames=("ref_code", "is_log1p", "compute_fc")
)
_jitted_packed_rank_stats = jax.jit(
    _packed_rank_stats,
    static_argnames=(
        "ref_code", "is_log1p", "compute_fc",
        "u2_dtype", "tie_dtype", "narrow_items",
    ),
)

# Process-wide AOT executable cache, keyed by shapes/dtypes/statics — the
# analog of numba's signature-keyed dispatch cache.
_AOT_CACHE: dict = {}


def make_tile_fn(
    layout: PaddedLayout,
    *,
    ref_code: int,
    is_log1p: bool,
    compute_fc: bool = True,
    device=None,
    pack: bool = False,
):
    """Return a tile function with the layout baked in as device arrays.

    ``device`` commits the layout arrays to a specific device (default:
    jax's default device).  ``pack=True`` returns the single-buffer packed
    wire per tile (``run.unpack`` inverts it) with the same bound-proven
    narrow tiers as the compact engine — a separate jitted entry, so
    unpacked callers' executables (and persistent-cache entries) are
    untouched.
    """
    put = (lambda a: jax.device_put(a, device)) if device is not None else jnp.asarray
    perm = put(layout.perm)
    grp = put(layout.grp)
    pad_mask = put(layout.pad_mask)
    bs = put(layout.block_starts)
    be = put(layout.block_ends)
    layout_args = (perm, grp, pad_mask, bs, be)
    statics = dict(
        ref_code=int(ref_code), is_log1p=bool(is_log1p), compute_fc=compute_fc
    )
    state = {"compiled": None}

    find_spec = unpack = None
    spec_cache = None
    if pack:
        # Narrow tiers + spec/unpack machinery shared with the compact
        # engine (identical output contract; counts from the layout).
        from illico_tpu.ops.csort_engine import (
            _narrow_for,
            csort_narrow_statics,
            make_rank_unpackers,
        )
        from illico_tpu.ops.hist_engine import real_rows_per_group

        narrow_statics = csort_narrow_statics(
            real_rows_per_group(layout), int(ref_code)
        )
        spec_cache, _spec_for, find_spec, unpack = make_rank_unpackers(
            layout.n_groups, int(ref_code), compute_fc, narrow_statics
        )

        def _pack_statics(t_cols: int) -> dict:
            _spec_for(t_cols)
            narrow = _narrow_for(
                t_cols, layout.n_groups, narrow_statics, int(ref_code),
                compute_fc,
            )
            return dict(
                **statics,
                u2_dtype=narrow_statics["u2_dtype"],
                tie_dtype=narrow_statics["tie_dtype"],
                narrow_items=tuple(sorted(narrow.items())),
            )

    def _fn_and_statics(t_cols: int):
        if pack:
            return _jitted_packed_rank_stats, _pack_statics(t_cols)
        return _jitted_rank_stats, statics

    def precompile(shape, dtype, device=None) -> None:
        fn, st = _fn_and_statics(int(shape[1]))
        if device is not None:
            # AOT lowering pins the default device; warm the jit cache with
            # an argument committed to the target instead.
            x = jax.device_put(np.zeros(tuple(shape), dtype), device)
            with jax.enable_x64(True):
                jax.device_get(fn(x, *layout_args, **st))
            return
        key = (
            (tuple(shape), str(dtype)),
            tuple((tuple(a.shape), str(a.dtype)) for a in layout_args),
            tuple(sorted((k, v) for k, v in st.items())),
        )
        exe = _AOT_CACHE.get(key)
        if exe is None:
            import time as _time

            from illico_tpu.utils.log import logger as _logger

            t0 = _time.perf_counter()
            with jax.enable_x64(True):
                lowered = fn.lower(
                    jax.ShapeDtypeStruct(tuple(shape), dtype),
                    *(jax.ShapeDtypeStruct(a.shape, a.dtype) for a in layout_args),
                    **st,
                )
                t1 = _time.perf_counter()
                exe = lowered.compile()
            _logger.trace(
                "rank AOT: lower %.1fs compile %.1fs",
                t1 - t0, _time.perf_counter() - t1,
            )
            _AOT_CACHE[key] = exe
        state["compiled"] = exe

    counters = {"aot": 0, "jit": 0}  # per-tile dispatch-path accounting

    def run(x_raw):
        if state["compiled"] is not None:
            counters["aot"] += 1
            return state["compiled"](x_raw, *layout_args)
        counters["jit"] += 1
        fn, st = _fn_and_statics(int(x_raw.shape[1]))
        with jax.enable_x64(True):
            return fn(x_raw, *layout_args, **st)

    run._counters = counters
    run._jitted = _jitted_rank_stats
    run._layout_args = layout_args
    run._statics = statics
    run._spec_cache = spec_cache
    run.precompile = precompile
    if pack:
        run.unpack = unpack
        run.find_spec = find_spec
    return run
