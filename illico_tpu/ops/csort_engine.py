"""Compact (nonzero-only) sort engine: the sparse tier of the rank path.

The full-column sort engine (:mod:`illico_tpu.ops.rank_engine`) pays two
``lax.sort`` passes over every cell — zeros included.  Single-cell matrices
are ~90% zeros, and the reference's sparse kernels prove the zero block
never needs to be sorted: rank only the nonzeros and add the zero block
analytically (``/root/reference/illico/ovo/sparse_ovo.py:74-85``,
``/root/reference/illico/ovr/sparse_ovr.py:70-84``).  This module is that
idea in TPU shape:

- The **host tiler** compacts a tile's nonzeros into a dense padded
  ``(M, T)`` block (``M`` = per-tile max column nnz, bucketed), laid out
  group-major per column, plus a per-column group index ``indptr``
  ``(G+1, T)``.  All raggedness stays on the host; the device sees static
  shapes (SURVEY §7 design stance #2).
- The **device kernel** sorts only the compacted block — ``density``-times
  less sort work than the full-column engine — computes per-element rank /
  pair-count payloads exactly as the dense engine does, restores layout
  order, and reduces per (group, column) segments with *per-column dynamic
  boundaries* (two-level exact prefix sums + one small gather).
- The **zero block** enters in closed form: per (group, column) zero counts
  are ``counts[g] - nnz[g,j]``, and every zero-block statistic (rank sums,
  pair counts, tie sums) is a scalar expression in those counts — including
  support for *negative* values (normalized/scaled data), where the zero
  block sits between the negative and positive nonzeros.

Unlike the histogram engine this path never tabulates values: it is exact
for arbitrary float32/float64 data — scanpy's ``normalize_total``+``log1p``
output, scaled/corrected matrices, Smart-seq-magnitude counts — at
``~1/density`` of the full-sort cost (round-3 VERDICT items 2/3/5).

Output contract: identical to :func:`illico_tpu.ops.rank_engine.
rank_stats_tile` (R2/tie_col for OVR, U2/tie_seg/tie_ref_col for OVO,
fc_sums), so the runner's consume tail is shared.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from illico_tpu.ops.rank_engine import (
    _subblock_bounds,
    _tie_block_bounds,
)

__all__ = [
    "CompactTile",
    "compact_from_entries",
    "csort_stats_tile",
    "make_csort_tile_fn",
]

# Per-element integer payloads are bounded by 3*n_total + 2; a 32-row
# partial sum must fit int32 (same scheme as rank_engine._I32_SAFE_N_PAD).
_SEG_BLOCK = 32
_I32_SAFE_N_TOTAL = (2**31 // _SEG_BLOCK - 3) // 3

# Device dtype per wire tier ("u40"/"f48"/"f96" are wire encodings of
# float64 device arrays; "int32" is a real device cast, exact below 2**31).
_DEV = {"int32": jnp.int32}


class CompactTile:
    """Host-side compacted tile: nonzeros only, group-major per column.

    Attributes
    ----------
    vals : (M, T) float32/float64 — nonzero values; pad slots hold +inf.
        Column ``j``'s real entries occupy rows ``[0, indptr[G, j])``,
        grouped by ascending group code.
    grp : (M, T) uint16 — group code per slot (``G`` on pads).  Only
        shipped for OVO (the OVR algebra needs only the boundaries).
    indptr : (G+1, T) int32 — per-column group segment bounds.
    """

    __slots__ = ("vals", "grp", "indptr", "t_cols")

    def __init__(self, vals, grp, indptr, t_cols):
        self.vals = vals
        self.grp = grp
        self.indptr = indptr
        self.t_cols = t_cols


def _bucket_rows(m_max: int) -> int:
    """Static row-count bucket: next power of two, multiple of _SEG_BLOCK.

    Executables are keyed by (M, T); bucketing keeps the number of distinct
    compiles per run logarithmic in tile nnz spread (the same reasoning as
    the runner's power-of-two tile widths, ``models/wilcoxon.py:122-134``).
    """
    m = max(int(m_max), 1)
    b = _SEG_BLOCK
    while b < m:
        b *= 2
    return b


def compact_from_entries(
    v: np.ndarray,
    r: np.ndarray,
    c: np.ndarray,
    t_cols: int,
    group_codes: np.ndarray,
    n_groups: int,
    value_dtype=np.float32,
    need_grp: bool = True,
) -> CompactTile:
    """Build a :class:`CompactTile` from (value, row, col) nonzero entries.

    ``group_codes`` maps original row index -> group code (``GroupInfo.
    encoded_groups``).  Explicit stored zeros are dropped — they belong to
    the analytic zero block, and leaving them in the compacted block would
    double-count them.  Entries may arrive in any order; a single lexsort
    makes them (column, group)-contiguous (the role the reference's
    ``csr_get_contig_cols_into_csc`` plays for its kernels,
    ``utils/sparse/csr.py:199-257``).
    """
    nz = v != 0
    if not nz.all():
        v, r, c = v[nz], r[nz], c[nz]
    g = group_codes[r]
    # (column, group) ordering via ONE combined integer key: numpy's stable
    # argsort radix-sorts integer keys, measured ~3x faster than
    # np.lexsort((g, c)) at 8M entries — this is the host tiler's hot loop
    # on a single-core host.  Everything runs in int32 when the bounds
    # allow (always, for realistic tiles): int64 passes over ~10M-entry
    # tiles each cost ~0.5-0.8 s on this host, and the old
    # key-build/div/mod/arange chain cost more than the radix sort itself
    # (measured round 5; ~2x total compaction win).
    idx_t = np.int32 if n_groups * t_cols < 2**31 and v.size < 2**31 else np.int64
    c = c.astype(idx_t, copy=False)
    key = c * idx_t(n_groups) + g.astype(idx_t)
    # Counts don't depend on entry order: bincount the raw key (pre-sort)
    # and reshape — cheaper than rebuilding a (g, c) key post-sort.
    cnt_gc = np.ascontiguousarray(
        np.bincount(key, minlength=n_groups * t_cols)
        .reshape(t_cols, n_groups).T
    )
    order = np.argsort(key, kind="stable")
    c_s = c[order]  # gathers beat div/mod decode of the sorted key
    v_s = v[order]

    col_nnz = cnt_gc.sum(axis=0)
    m_pad = _bucket_rows(col_nnz.max() if col_nnz.size else 0)

    # Scatter targets live in [0, m_pad * t_cols): re-widen if the padded
    # tile is larger than the key-domain bound that picked idx_t.
    tgt_t = idx_t if m_pad * t_cols < 2**31 else np.int64
    col_start = np.zeros(t_cols + 1, dtype=tgt_t)
    np.cumsum(col_nnz, out=col_start[1:])
    tgt = np.arange(c_s.size, dtype=tgt_t) - col_start[c_s]
    tgt *= tgt_t(t_cols)
    tgt += c_s

    vals = np.full((m_pad, t_cols), np.inf, dtype=value_dtype)
    vals.ravel()[tgt] = v_s.astype(value_dtype)
    grp = None
    if need_grp:  # OVO sub-block terms only; OVR aliases vals (unused)
        grp = np.full((m_pad, t_cols), n_groups, dtype=np.uint16)
        grp.ravel()[tgt] = g.astype(np.uint16)[order]

    indptr = np.zeros((n_groups + 1, t_cols), dtype=np.int32)
    np.cumsum(cnt_gc, axis=0, out=indptr[1:])
    return CompactTile(vals, grp, indptr, t_cols)


def _colwise_segment_sum(q, indptr, *, exact_int: bool):
    """(G, T) segment sums of ``q`` (M, T) at per-column dynamic boundaries.

    ``exact_int``: q is int32 with 32-row partial sums provably inside
    int32 — two-level scheme (int32 within-block partials + float64 block
    prefix) keeps every integer exact below 2^53, the same guarantee as
    ``rank_engine._block_segment_sum_i32`` but with *dynamic* boundaries
    resolved by two small gathers instead of static block slices.
    """
    m, t = q.shape
    idx = indptr.astype(jnp.int32)
    if exact_int:
        nb = m // _SEG_BLOCK
        qb = q.reshape(nb, _SEG_BLOCK, t)
        within = jnp.sum(qb, axis=1, dtype=jnp.int32)  # (nb, T)
        blk_css = jnp.concatenate(
            [jnp.zeros((1, t), jnp.float64),
             jnp.cumsum(within.astype(jnp.float64), axis=0)], axis=0
        )  # (nb+1, T)
        pre_excl = (jnp.cumsum(qb, axis=1) - qb).reshape(m, t)
        pre_ext = jnp.concatenate(
            [pre_excl, jnp.zeros((1, t), pre_excl.dtype)], axis=0
        )  # (M+1, T); row M pairs with blk_css[nb] (M is a block multiple)
        a = jnp.take_along_axis(blk_css, idx // _SEG_BLOCK, axis=0)
        b = jnp.take_along_axis(pre_ext, idx, axis=0).astype(jnp.float64)
        css_at = a + b
    else:
        css = jnp.concatenate(
            [jnp.zeros((1, t), jnp.float64),
             jnp.cumsum(q.astype(jnp.float64), axis=0)], axis=0
        )
        css_at = jnp.take_along_axis(css, idx, axis=0)
    return css_at[1:] - css_at[:-1]


def csort_narrow_statics(counts: np.ndarray, ref_code: int) -> dict:
    """Wire tiers for the packed csort output, proven by group-size bounds.

    Mirrors :func:`illico_tpu.ops.hist_engine.hist_contract_statics`:
    integer statistics (U2/R2, tie sums) pick the narrowest faithful
    encoding — int32 device cast below 2**31, split-word tiers (u40/f48)
    below 2**48, 8-byte word split below 2**63, f96 beyond.  fc sums are
    NON-integer here (arbitrary float expression values), so they always
    ride the f96 triple (bit-faithful float64, no integrality needed) —
    the one tier the histogram engine never needs for fc.
    """
    from illico_tpu.ops.hist_engine import _pick_split_dtype

    c = np.asarray(counts, dtype=np.float64)
    n = float(c.sum())

    def pick(bound: float) -> str:
        d = _pick_split_dtype(bound)
        # csort arrays stay float64 on device except the int32 cast;
        # uint16/uint24 wire tiers would need more device casts than the
        # bytes they save on these (G, T) f64 arrays.
        return "int32" if d in ("uint16", "uint24", "int32") else d

    if ref_code == -1:
        u2_dtype = pick(2.0 * n * (c.max() if c.size else 0.0))
        tie_dtype = "float64"  # no (G, T) tie array in OVR
        tiecol_dtype = "f96" if n**3 >= 2.0**63 else "float64"
    else:
        others = np.delete(c, ref_code)
        m_max = others.max() if others.size else 0.0
        r = c[ref_code]
        u2_dtype = pick(2.0 * r * m_max)
        tie_dtype = pick((m_max**3 - m_max) + 3.0 * r * m_max * (r + m_max))
        tiecol_dtype = "f96" if r**3 >= 2.0**63 else "float64"
    return dict(
        u2_dtype=u2_dtype, tie_dtype=tie_dtype, tiecol_dtype=tiecol_dtype
    )


def _narrow_for(
    t_cols: int, g_rows: int, narrow_statics: dict, ref_code: int,
    compute_fc: bool,
) -> dict:
    """Pack-narrowing map for a csort tile, alignment-checked.

    Split-word tiers (u40/f48) require element counts divisible by 4/2 to
    keep later pack blocks aligned; the histogram engine always satisfies
    this (its widths are 128-padded) but csort tiles keep the caller's
    width, which can be odd for small inputs.  Misaligned keys fall back
    to the natural 8-byte word split — always valid, since every split
    tier's bound is below 2**63 by construction.
    """
    from illico_tpu.ops.hist_engine import _WIRE_COUNT_ALIGN, _narrow_map

    narrow = _narrow_map(dict(
        fc_dtype="f96", compute_fc=compute_fc, ref_code=ref_code,
        **narrow_statics,
    ))
    if compute_fc:
        narrow["fc_sums"] = 12  # non-integer float64: f96, always
    bulk = g_rows * t_cols
    sizes = {
        "R2": bulk, "U2": bulk, "tie_seg": bulk, "fc_sums": bulk,
        "tie_col": t_cols, "tie_ref_col": t_cols,
    }
    for k, wb in list(narrow.items()):
        if sizes.get(k, 0) % _WIRE_COUNT_ALIGN.get(wb, 1):
            del narrow[k]
    return narrow


def rank_output_abstract(
    t_cols: int, g_rows: int, ref_code: int, compute_fc: bool,
    narrow_statics: dict,
) -> dict:
    """Abstract shapes/dtypes of the rank-stats output contract.

    Shared by the compact and full sort engines' pack-spec builders: the
    output contract (R2/tie_col OVR; U2/tie_seg/tie_ref_col OVO; fc_sums)
    is identical, and the device dtype of each array follows the wire
    tier ("int32" is a real device cast; split/f96 tiers stay float64).
    """
    f64 = np.float64
    dev = {"int32": np.int32}
    out = {"overflow_cols": jax.ShapeDtypeStruct((t_cols,), np.bool_)}
    if compute_fc:
        out["fc_sums"] = jax.ShapeDtypeStruct((g_rows, t_cols), f64)
    u2d = dev.get(narrow_statics["u2_dtype"], f64)
    if ref_code == -1:
        out["R2"] = jax.ShapeDtypeStruct((g_rows, t_cols), u2d)
        out["tie_col"] = jax.ShapeDtypeStruct((t_cols,), f64)
    else:
        out["U2"] = jax.ShapeDtypeStruct((g_rows, t_cols), u2d)
        out["tie_seg"] = jax.ShapeDtypeStruct(
            (g_rows, t_cols), dev.get(narrow_statics["tie_dtype"], f64)
        )
        out["tie_ref_col"] = jax.ShapeDtypeStruct((t_cols,), f64)
    return out


def make_rank_unpackers(g_rows: int, ref_code: int, compute_fc: bool,
                        narrow_statics: dict):
    """(spec_cache, _spec_for, find_spec, unpack) for a rank-contract
    engine's packed wire, keyed by tile width."""
    from illico_tpu.ops.hist_engine import build_pack_spec, unpack_host_buffer

    spec_cache: dict = {}

    def _spec_for(t_cols: int):
        if t_cols not in spec_cache:
            from illico_tpu.ops.hist_engine import assert_spec_size_unique

            spec = build_pack_spec(
                rank_output_abstract(
                    t_cols, g_rows, ref_code, compute_fc, narrow_statics
                ),
                _narrow_for(t_cols, g_rows, narrow_statics, ref_code,
                            compute_fc),
            )
            assert_spec_size_unique(spec_cache, t_cols, spec)
            spec_cache[t_cols] = spec
        return spec_cache[t_cols]

    def find_spec(buf_size: int) -> dict | None:
        for spec in spec_cache.values():
            _, _, _, off, nbytes = spec[-1]
            if off + nbytes == buf_size:
                return {k: (s, d, o, n) for (k, s, d, o, n) in spec}
        return None

    def unpack(buf) -> dict:
        buf = np.asarray(buf)
        for spec in spec_cache.values():
            _, _, _, off, nbytes = spec[-1]
            if off + nbytes == buf.size:
                return unpack_host_buffer(buf, spec)
        raise ValueError(
            f"No pack spec matches buffer of {buf.size} bytes; "
            "call the tile function (or precompile) first."
        )

    return spec_cache, _spec_for, find_spec, unpack


def csort_stats_tile(
    vals,
    grp,
    indptr,
    counts,
    *,
    ref_code: int,
    is_log1p: bool,
    n_total: int,
    compute_fc: bool = True,
    u2_dtype: str = "float64",
    tie_dtype: str = "float64",
    tiecol_dtype: str = "float64",
    pack: bool = False,
):
    """Rank statistics of a compacted tile; zero block in closed form.

    Parameters
    ----------
    vals : (M, T) float32/float64 — compacted nonzeros (+inf pads),
        (column, group)-contiguous.
    grp : (M, T) integer — group code per slot (G on pads).  Used only by
        the OVO sub-block tie terms; OVR callers may pass any placeholder
        of the right shape.
    indptr : (G+1, T) int32 — per-column group boundaries.
    counts : (G,) int32/int64 — total cells per group (zeros included).
    n_total : static — total cells (zeros included).
    u2_dtype / tie_dtype / tiecol_dtype : wire tiers from
        :func:`csort_narrow_statics`; ``pack=True`` returns one uint8
        buffer (the single-transfer wire, as the histogram engine's).

    Returns the :func:`rank_engine.rank_stats_tile` output contract.
    In OVO the reference group's own U2/tie_seg rows are zeroed on device
    (the consumer overwrites them with sentinels), keeping narrow wire
    bounds — which exclude the much larger self-row — sound.
    """
    if vals.dtype not in (jnp.float32, jnp.float64):
        vals = vals.astype(jnp.float32)
    m_pad, t_cols = vals.shape
    exact_int = n_total <= _I32_SAFE_N_TOTAL
    # Per-element payloads carry 2*n0 (zero-count offsets): int32 wraps once
    # n_total reaches 2**30, so payloads widen to float64 there (exact below
    # 2**53; the segment sums are already on the f64 path at that scale —
    # round-4 ADVICE item 2).  Static trace-time branch.
    wide_payload = n_total >= 2**30

    def _int_seg(q):
        if exact_int:
            return _colwise_segment_sum(q, indptr, exact_int=True)
        return _colwise_segment_sum(
            q.astype(jnp.float64), indptr, exact_int=False
        )

    counts = counts.astype(jnp.float64)  # (G,)
    nnz_g = (indptr[1:] - indptr[:-1]).astype(jnp.float64)  # (G, T)
    m_real = indptr[-1]  # (T,) int32
    n0 = (jnp.float64(n_total) - m_real.astype(jnp.float64))  # (T,) f64
    n0_i = n0.astype(jnp.int32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (m_pad, t_cols), 0)
    real_mask = rows < m_real[None, :]  # layout-order real slots
    pos = rows

    out = {}

    if compute_fc:
        expr = jnp.expm1(vals) if is_log1p else vals
        expr = jnp.where(real_mask, expr, 0.0).astype(jnp.float64)
        out["fc_sums"] = _colwise_segment_sum(expr, indptr, exact_int=False)

    if ref_code == -1:
        # ---------------- OVR ----------------------------------------------
        sv, spos = jax.lax.sort((vals, pos), dimension=0, num_keys=1)
        first, last = _tie_block_bounds(sv)
        pad_sorted = jnp.isinf(sv)
        # 2x global tie-averaged rank of a nonzero: within-nonzeros rank
        # (first + last + 2) offset by the zeros below it (positives only).
        if wide_payload:
            r2 = (first + last + 2).astype(jnp.float64) + jnp.where(
                sv > 0, 2.0 * n0[None, :], 0.0
            )
        else:
            r2 = first + last + 2 + jnp.where(
                sv > 0, 2 * n0_i[None, :], 0
            )
        n_neg = jnp.sum((sv < 0).astype(jnp.float64), axis=0)  # (T,)
        t_blk = (last - first + 1).astype(jnp.float64)
        tie_el = jnp.where(pad_sorted, 0.0, t_blk * t_blk - 1.0)
        out["tie_col"] = (
            jnp.sum(tie_el, axis=0) + (n0 * n0 - 1.0) * n0
        )
        _, r2_l = jax.lax.sort((spos, r2), dimension=0, num_keys=1)
        r2_l = jnp.where(real_mask, r2_l, 0)
        r2_nz = _int_seg(r2_l)
        # Zero block: 2x average rank of a zero = 2*n_neg + n0 + 1.
        zero_g = counts[:, None] - nnz_g  # (G, T)
        r2_full = r2_nz + zero_g * (2.0 * n_neg + n0 + 1.0)[None, :]
        out["R2"] = r2_full.astype(_DEV.get(u2_dtype, jnp.float64))
    else:
        # ---------------- OVO ----------------------------------------------
        sv, sg, spos = jax.lax.sort(
            (vals, grp.astype(jnp.int32), pos), dimension=0, num_keys=2
        )
        first, last = _tie_block_bounds(sv)
        pad_sorted = jnp.isinf(sv)
        isref = (sg == ref_code).astype(jnp.int32)
        cref = jnp.cumsum(isref, axis=0)
        cref_excl = cref - isref
        neq_prev = jnp.concatenate(
            [jnp.ones_like(sv[:1], bool), sv[1:] != sv[:-1]], axis=0
        )
        ref_less = jax.lax.cummax(
            jnp.where(neq_prev, cref_excl, 0), axis=0
        )
        neq_next = jnp.concatenate(
            [sv[1:] != sv[:-1], jnp.ones_like(sv[:1], bool)], axis=0
        )
        ref_at_end = jax.lax.cummin(
            jnp.where(neq_next, cref, np.int32(2**31 - 1)),
            axis=0, reverse=True,
        )
        ref_eq = ref_at_end - ref_less
        # Reference zero / negative-nonzero counts per column.
        nnz_ref = (indptr[ref_code + 1] - indptr[ref_code]).astype(
            jnp.float64
        )  # (T,)
        n0r = counts[ref_code] - nnz_ref  # (T,) f64
        n0r_i = n0r.astype(jnp.int32)
        refnz_neg = jnp.sum(
            (isref * (sv < 0)).astype(jnp.float64), axis=0
        )  # (T,)
        # 2x per-element U_tgt contribution of a nonzero target: reference
        # nonzeros strictly below + reference zeros below (positives only),
        # each twice, + tied reference nonzeros once.
        if wide_payload:
            qu2 = (2 * ref_less + ref_eq).astype(jnp.float64) + jnp.where(
                sv > 0, 2.0 * n0r[None, :], 0.0
            )
        else:
            qu2 = 2 * ref_less + ref_eq + jnp.where(
                sv > 0, 2 * n0r_i[None, :], 0
            )
        sfirst, slast = _subblock_bounds(sv, sg)
        t_sub = (slast - sfirst + 1).astype(jnp.float64)
        a_ref = ref_eq.astype(jnp.float64)
        q_tie = (t_sub * t_sub - 1.0) + 3.0 * a_ref * (a_ref + t_sub)
        ref_term = jnp.where(
            pad_sorted | (isref == 0), 0.0, a_ref * a_ref - 1.0
        )
        out["tie_ref_col"] = (
            jnp.sum(ref_term, axis=0) + (n0r * n0r - 1.0) * n0r
        )
        _, qu2_l, qtie_l = jax.lax.sort(
            (spos, qu2, q_tie), dimension=0, num_keys=1
        )
        qu2_l = jnp.where(real_mask, qu2_l, 0)
        qtie_l = jnp.where(real_mask, qtie_l, 0.0)
        u2_nz = _int_seg(qu2_l)
        tie_nz = _colwise_segment_sum(qtie_l, indptr, exact_int=False)
        zero_g = counts[:, None] - nnz_g  # (G, T) target zero counts
        # Zero-block pair counts: a target zero sees every negative
        # reference nonzero strictly below it and ties the n0r reference
        # zeros.
        u2_full = u2_nz + zero_g * (2.0 * refnz_neg + n0r)[None, :]
        # Zero-block tie terms: (t0^3 - t0) + 3*a0*t0*(a0 + t0) with
        # a0 = n0r (the a0^3 - a0 part lives in tie_ref_col above) — the
        # same per-block decomposition as the sorted path, evaluated in
        # closed form (``sparse_ovo.py:74-85`` algebra).
        n0r_b = n0r[None, :]
        tie_full = tie_nz + (
            (zero_g * zero_g - 1.0) * zero_g
            + 3.0 * n0r_b * zero_g * (n0r_b + zero_g)
        )
        # Zero the reference self-rows: the consumer writes sentinels
        # there, and the narrow wire bounds exclude the self-row.
        out["U2"] = u2_full.at[ref_code].set(0.0).astype(
            _DEV.get(u2_dtype, jnp.float64)
        )
        out["tie_seg"] = tie_full.at[ref_code].set(0.0).astype(
            _DEV.get(tie_dtype, jnp.float64)
        )

    if pack:
        from illico_tpu.ops.hist_engine import pack_device_outputs

        # csort is exact for every value — no overflow is possible — but
        # carrying the (all-False) flag column lets the fused native C++
        # consumer engage on this wire too (it keys on the flag's
        # presence), at one byte per column.
        out["overflow_cols"] = jnp.zeros((t_cols,), jnp.bool_)
        narrow = _narrow_for(
            t_cols, indptr.shape[0] - 1,
            dict(u2_dtype=u2_dtype, tie_dtype=tie_dtype,
                 tiecol_dtype=tiecol_dtype),
            ref_code, compute_fc,
        )
        return pack_device_outputs(out, narrow)[0]
    return out


# Process-wide jit + AOT executable caches (the rank/hist engines' scheme).
_jitted_csort = jax.jit(
    csort_stats_tile,
    static_argnames=(
        "ref_code", "is_log1p", "n_total", "compute_fc",
        "u2_dtype", "tie_dtype", "tiecol_dtype", "pack",
    ),
)
_AOT_CACHE: dict = {}


def make_csort_tile_fn(
    group_info,
    *,
    ref_code: int,
    is_log1p: bool,
    compute_fc: bool = True,
    device=None,
    pack: bool = True,
):
    """Tile function over :class:`CompactTile` inputs.

    The returned callable takes a CompactTile (host numpy) or an equivalent
    dict of device arrays and returns the packed wire buffer (default; one
    transfer per tile, as the histogram engine's — ``run.unpack`` inverts
    it) or the plain rank-stats dict with ``pack=False``.  AOT executables
    are cached per (M, T) bucket; ``precompile(tile)`` warms the cache for
    a representative tile's shape.
    """
    # int32 survives x64-off staging untouched (a float64 put would be
    # canonicalized to float32 outside an enable_x64 context); the kernel
    # widens to float64 at trace time.
    counts_dev = jax.device_put(
        np.asarray(group_info.counts, dtype=np.int32), device
    )
    n_total = int(group_info.n_cells)
    narrow_statics = csort_narrow_statics(group_info.counts, int(ref_code))
    statics = dict(
        ref_code=int(ref_code),
        is_log1p=bool(is_log1p),
        n_total=n_total,
        compute_fc=compute_fc,
        pack=bool(pack),
        **narrow_statics,
    )
    counters = {"aot": 0, "jit": 0}

    g_rows = int(group_info.n_groups)
    spec_cache, _spec_for, find_spec, unpack = make_rank_unpackers(
        g_rows, int(ref_code), compute_fc, narrow_statics
    )

    def _aot_for(m_pad: int, t_cols: int, vdtype, gdtype, idtype):
        cache_key = (
            m_pad, t_cols, str(vdtype), str(gdtype), str(idtype),
            int(group_info.n_groups), tuple(sorted(statics.items())),
        )
        exe = _AOT_CACHE.get(cache_key)
        if exe is None:
            g = int(group_info.n_groups)
            with jax.enable_x64(True):
                lowered = _jitted_csort.lower(
                    jax.ShapeDtypeStruct((m_pad, t_cols), vdtype),
                    jax.ShapeDtypeStruct((m_pad, t_cols), gdtype),
                    jax.ShapeDtypeStruct((g + 1, t_cols), idtype),
                    jax.ShapeDtypeStruct(counts_dev.shape, counts_dev.dtype),
                    **statics,
                )
                exe = lowered.compile()
            _AOT_CACHE[cache_key] = exe
        return exe

    def run(tile):
        if isinstance(tile, CompactTile):
            vals, grp, indptr = tile.vals, tile.grp, tile.indptr
        else:
            vals, grp, indptr = tile["vals"], tile.get("grp"), tile["indptr"]
        # Stage under x64: float64 tiles would otherwise be canonicalized
        # to float32 in an x64-off process (invisible to the test suite,
        # which enables x64 globally — see models/wilcoxon.py run()).
        with jax.enable_x64(True):
            return _dispatch(vals, grp, indptr)

    def _dispatch(vals, grp, indptr):
        if pack:
            _spec_for(vals.shape[1])
        vals_d = jax.device_put(vals, device)
        # The OVR graph never reads grp: alias the values buffer instead of
        # shipping a second (M, T) array over the link.
        grp_d = vals_d if grp is None else jax.device_put(grp, device)
        indptr_d = jax.device_put(indptr, device)
        if device is not None or not isinstance(vals, np.ndarray):
            with jax.enable_x64(True):
                counters["jit"] += 1
                return _jitted_csort(
                    vals_d, grp_d, indptr_d, counts_dev, **statics
                )
        exe = _aot_for(
            vals.shape[0], vals.shape[1], vals_d.dtype, grp_d.dtype,
            indptr.dtype,
        )
        counters["aot"] += 1
        return exe(vals_d, grp_d, indptr_d, counts_dev)

    def precompile(tile: CompactTile) -> None:
        gdtype = tile.vals.dtype if tile.grp is None else tile.grp.dtype
        if pack:
            _spec_for(tile.vals.shape[1])
        _aot_for(
            tile.vals.shape[0], tile.vals.shape[1],
            tile.vals.dtype, gdtype, tile.indptr.dtype,
        )

    run._counters = counters
    run._statics = statics
    run._spec_cache = spec_cache  # t_cols -> pack spec (wire accounting)
    run.precompile = precompile
    run.unpack = unpack
    run.find_spec = find_spec
    return run
