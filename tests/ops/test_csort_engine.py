"""Oracle tests for the compact (nonzero-only) sort engine.

Strategy: the dense full-column engine (``ops/rank_engine.rank_stats_tile``)
is already proven bit-exact against scipy by the parity suite — so the
compacted engine is checked (a) field-for-field against it on random sparse
tiles (exact for the integer statistics, 1e-12 for tie/fc sums), and
(b) directly against ``scipy.stats.mannwhitneyu`` for a sample of cells,
including *negative* values, which only the compact path treats specially
(the zero block sits between negative and positive nonzeros).
"""

import numpy as np
import pytest

from illico_tpu.ops.csort_engine import (
    CompactTile,
    compact_from_entries,
    csort_stats_tile,
    make_csort_tile_fn,
)
from illico_tpu.ops.rank_engine import build_padded_layout, make_tile_fn
from illico_tpu.utils.groups import encode_and_count_groups


def _random_case(seed, n=400, t=7, g=5, density=0.3, negatives=False,
                 dtype=np.float32):
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, g, n)
    labels[:g] = np.arange(g)  # every group nonempty
    x = rng.poisson(3.0, (n, t)).astype(np.float64)
    x[rng.rand(n, t) >= density] = 0
    if negatives:
        # scaled/centered floats: arbitrary sign, many distinct values
        x = np.where(x != 0, x + rng.randn(n, t), 0.0)
    x = x.astype(dtype)
    _, info = encode_and_count_groups(labels.astype(str), None)
    return x, labels, info


def _dense_oracle(x, info, ref_code, is_log1p=False):
    layout = build_padded_layout(info.perm, info.indptr)
    fn = make_tile_fn(layout, ref_code=ref_code, is_log1p=is_log1p)
    return {k: np.asarray(v) for k, v in fn(x).items()}


def _compact_run(x, info, ref_code, is_log1p=False):
    r, c = np.nonzero(x)
    tile = compact_from_entries(
        x[r, c], r, c, x.shape[1], info.encoded_groups, info.n_groups,
        value_dtype=x.dtype, need_grp=(ref_code != -1),
    )
    fn = make_csort_tile_fn(
        info, ref_code=ref_code, is_log1p=is_log1p, pack=False
    )
    return {k: np.asarray(v) for k, v in fn(tile).items()}, tile


@pytest.mark.parametrize("negatives", [False, True])
@pytest.mark.parametrize("mode", ["ovr", "ovo"])
def test_csort_matches_dense_engine(mode, negatives):
    for seed in range(4):
        x, labels, info = _random_case(seed, negatives=negatives)
        # re-encode with a reference for OVO
        if mode == "ovo":
            _, info = encode_and_count_groups(labels.astype(str), "0")
        ref = info.ref_code
        want = _dense_oracle(x, info, ref)
        got, _ = _compact_run(x, info, ref)
        assert set(got) == set(want)

        def rows(a):
            # csort zeroes the OVO reference self-row on device (the
            # consumer writes sentinels there); the dense engine does not.
            return np.delete(a, ref, axis=0) if ref != -1 else a

        for key in ("R2", "U2"):
            if key in want:
                np.testing.assert_array_equal(rows(got[key]), rows(want[key]))
        for key in ("tie_col", "tie_ref_col", "fc_sums"):
            if key in want:
                np.testing.assert_allclose(
                    got[key], want[key], rtol=1e-12, atol=1e-9,
                )
        if "tie_seg" in want:
            np.testing.assert_allclose(
                rows(got["tie_seg"]), rows(want["tie_seg"]),
                rtol=1e-12, atol=1e-9,
            )


def test_csort_float64_values_exact():
    # float64 ties that are invisible at float32 precision must be honored.
    x, labels, info = _random_case(11, density=0.4, dtype=np.float64)
    x[x != 0] += 1e-12 * np.sign(x[x != 0])
    want = _dense_oracle(x, info, -1)
    got, tile = _compact_run(x, info, -1)
    assert tile.vals.dtype == np.float64
    np.testing.assert_array_equal(got["R2"], want["R2"])
    np.testing.assert_allclose(got["tie_col"], want["tie_col"], rtol=1e-12)


def test_csort_all_zero_and_full_columns():
    x, labels, info = _random_case(3, n=200, t=5, density=0.5)
    x[:, 0] = 0.0            # empty column: pure zero block
    x[:, 1] = np.arange(200) + 1.0  # fully dense column: empty zero block
    want = _dense_oracle(x, info, -1)
    got, _ = _compact_run(x, info, -1)
    np.testing.assert_array_equal(got["R2"], want["R2"])
    np.testing.assert_allclose(got["tie_col"], want["tie_col"], rtol=1e-12)
    np.testing.assert_allclose(got["fc_sums"], want["fc_sums"], rtol=1e-12)


def test_csort_explicit_zero_entries_dropped():
    # Explicit stored zeros (legal in CSC/CSR) belong to the analytic zero
    # block; keeping them in the compacted block would double-count.
    x, labels, info = _random_case(5, n=150, t=3, density=0.4)
    r, c = np.nonzero(x)
    # inject explicit-zero entries at occupied coordinates of a zero cell
    zr, zc = np.nonzero(x == 0)
    take = slice(0, 20)
    v = np.concatenate([x[r, c], np.zeros(20, x.dtype)])
    rr = np.concatenate([r, zr[take]])
    cc = np.concatenate([c, zc[take]])
    tile = compact_from_entries(
        v, rr, cc, x.shape[1], info.encoded_groups, info.n_groups,
        value_dtype=x.dtype, need_grp=False,
    )
    fn = make_csort_tile_fn(info, ref_code=-1, is_log1p=False, pack=False)
    got = {k: np.asarray(v) for k, v in fn(tile).items()}
    want = _dense_oracle(x, info, -1)
    np.testing.assert_array_equal(got["R2"], want["R2"])


def test_csort_scipy_sample_with_negatives():
    from scipy.stats import mannwhitneyu

    x, labels, info = _random_case(7, n=300, t=4, g=4, density=0.5,
                                   negatives=True)
    got, _ = _compact_run(x, info, -1)
    counts = info.counts.astype(np.float64)
    r_tgt = got["R2"] / 2.0
    n_tgt = counts[:, None]
    # scipy's statistic is U of its first sample: U_a = R_a - n_a(n_a+1)/2.
    u = r_tgt - n_tgt * (n_tgt + 1.0) / 2.0
    for g in range(info.n_groups):
        for j in range(x.shape[1]):
            a = x[info.encoded_groups == g, j].astype(np.float64)
            b = x[info.encoded_groups != g, j].astype(np.float64)
            res = mannwhitneyu(a, b, alternative="two-sided",
                               method="asymptotic")
            assert u[g, j] == res.statistic, (g, j)


def test_csort_aot_precompile_counters():
    x, labels, info = _random_case(9, density=0.3)
    r, c = np.nonzero(x)
    tile = compact_from_entries(
        x[r, c], r, c, x.shape[1], info.encoded_groups, info.n_groups,
        need_grp=False,
    )
    fn = make_csort_tile_fn(info, ref_code=-1, is_log1p=False)
    fn.precompile(tile)
    fn(tile)
    assert fn._counters["aot"] == 1 and fn._counters["jit"] == 0


@pytest.mark.parametrize("mode", ["ovr", "ovo"])
def test_csort_packed_wire_roundtrip(mode):
    """The packed csort wire (one buffer per tile) must reproduce the
    plain dict output exactly — integer statistics bit-equal, fc sums
    (non-integer float64 on the f96 triple tier) bit-faithful too."""
    x, labels, info = _random_case(13, negatives=True, density=0.4)
    if mode == "ovo":
        _, info = encode_and_count_groups(labels.astype(str), "0")
    ref = info.ref_code
    r, c = np.nonzero(x)
    tile = compact_from_entries(
        x[r, c], r, c, x.shape[1], info.encoded_groups, info.n_groups,
        need_grp=(ref != -1),
    )
    plain_fn = make_csort_tile_fn(info, ref_code=ref, is_log1p=False,
                                  pack=False)
    plain = {k: np.asarray(v) for k, v in plain_fn(tile).items()}
    packed_fn = make_csort_tile_fn(info, ref_code=ref, is_log1p=False)
    buf = np.asarray(packed_fn(tile))
    assert buf.dtype == np.uint8 and buf.ndim == 1
    got = packed_fn.unpack(buf)
    # packed wire additionally carries the (all-False) overflow flag so
    # the native consumer engages
    assert not got.pop("overflow_cols").any()
    assert set(got) == set(plain)
    for k in got:
        np.testing.assert_array_equal(
            np.asarray(got[k], np.float64), np.asarray(plain[k], np.float64),
            err_msg=k,
        )


def test_compact_tile_layout_invariants():
    x, labels, info = _random_case(2, n=100, t=6, density=0.35)
    r, c = np.nonzero(x)
    tile = compact_from_entries(
        x[r, c], r, c, x.shape[1], info.encoded_groups, info.n_groups,
    )
    G = info.n_groups
    assert tile.indptr.shape == (G + 1, x.shape[1])
    assert tile.vals.shape[0] % 32 == 0
    for j in range(x.shape[1]):
        m = int(tile.indptr[G, j])
        assert m == np.count_nonzero(x[:, j])
        assert np.all(np.isinf(tile.vals[m:, j]))
        assert np.all(tile.grp[m:, j] == G)
        # group-major: slot groups are ascending with indptr boundaries
        for g in range(G):
            s, e = int(tile.indptr[g, j]), int(tile.indptr[g + 1, j])
            assert np.all(tile.grp[s:e, j] == g)
            rows_g = np.flatnonzero(info.encoded_groups == g)
            np.testing.assert_allclose(
                np.sort(tile.vals[s:e, j]),
                np.sort(x[rows_g, j][x[rows_g, j] != 0]),
            )


def test_csort_packed_wire_odd_width_alignment():
    """Split-word tiers need aligned element counts; csort tiles keep the
    caller's width, which can make G*T odd (found on hardware: G=6, T=67
    broke the 5-byte tie tier's 4-divisibility).  Misaligned keys must
    fall back to the natural 8-byte split and still roundtrip exactly."""
    x, labels, info = _random_case(17, n=500, t=67, g=6, density=0.35)
    _, info = encode_and_count_groups(labels.astype(str), "0")
    r, c = np.nonzero(x)
    tile = compact_from_entries(
        x[r, c], r, c, x.shape[1], info.encoded_groups, info.n_groups,
    )
    plain_fn = make_csort_tile_fn(info, ref_code=info.ref_code,
                                  is_log1p=False, pack=False)
    plain = {k: np.asarray(v) for k, v in plain_fn(tile).items()}
    packed_fn = make_csort_tile_fn(info, ref_code=info.ref_code,
                                   is_log1p=False)
    got = packed_fn.unpack(np.asarray(packed_fn(tile)))
    assert not got.pop("overflow_cols").any()
    for k in plain:
        np.testing.assert_array_equal(
            np.asarray(got[k], np.float64), np.asarray(plain[k], np.float64),
            err_msg=k,
        )


def test_csort_duplicate_sparse_entries_match_sort_engine():
    """Non-canonical CSR/CSC (duplicate (row, col) entries from a raw
    constructor) passes validation; the compact tiler must see duplicates
    SUMMED, as the dense/sort paths' toarray does (round-4 ADVICE 1)."""
    import scipy.sparse as sp

    from illico_tpu.models.wilcoxon import WilcoxonRunner
    from illico_tpu.utils.registry import data_handler_registry

    rng = np.random.RandomState(23)
    n, t, g = 300, 9, 4
    labels = rng.randint(0, g, n)
    labels[:g] = np.arange(g)
    x = rng.poisson(2.0, (n, t)).astype(np.float64)
    x[rng.rand(n, t) >= 0.25] = 0
    base = sp.csr_matrix(x)
    # Duplicate every 3rd stored entry in place (same row, same column,
    # adjacent in the index array — still non-decreasing, so the
    # sorted-indices validation accepts it).
    data, indices, indptr = [], [], [0]
    for i in range(n):
        s, e = base.indptr[i], base.indptr[i + 1]
        for p in range(s, e):
            if p % 3 == 0:
                half = base.data[p] / 2.0
                data += [half, half]
                indices += [base.indices[p]] * 2
            else:
                data.append(base.data[p])
                indices.append(base.indices[p])
        indptr.append(len(data))
    dup = sp.csr_matrix(
        (np.asarray(data), np.asarray(indices), np.asarray(indptr)),
        shape=base.shape,
    )
    assert not dup.has_canonical_format
    np.testing.assert_array_equal(dup.toarray(), x)

    def run(X, engine):
        handler = data_handler_registry.get(X)
        handler.validate()
        _, info = encode_and_count_groups(labels.astype(str), "0")
        r = WilcoxonRunner(handler, info, is_log1p=False, engine=engine)
        return r.run(progress=False)

    for X in (dup, sp.csc_matrix(dup)):
        got = run(X, "csort")
        want = run(X, "sort")
        np.testing.assert_array_equal(got.statistics, want.statistics)
        np.testing.assert_allclose(got.pvalues, want.pvalues,
                                   rtol=1e-12, atol=0.0)
        np.testing.assert_allclose(got.fold_change, want.fold_change,
                                   rtol=1e-12)


def _bigint_oracle_ovr(col_nzs, counts):
    """Exact Python-int OVR statistics of one column given nonzeros +
    (possibly huge) per-group zero counts.  col_nzs: list of (value, g)."""
    g_n = len(counts)
    vals = sorted(v for v, _ in col_nzs)
    nnz_g = [sum(1 for _, gg in col_nzs if gg == g) for g in range(g_n)]
    n0_g = [counts[g] - nnz_g[g] for g in range(g_n)]
    n0 = sum(n0_g)
    n_neg = sum(1 for v in vals if v < 0)

    def less(v):
        return sum(1 for w in vals if w < v) + (n0 if v > 0 else 0)

    def eq(v):
        return sum(1 for w in vals if w == v)

    r2 = [
        sum(2 * less(v) + eq(v) + 1 for v, gg in col_nzs if gg == g)
        + n0_g[g] * (2 * n_neg + n0 + 1)
        for g in range(g_n)
    ]
    tie = sum(
        eq(v) ** 3 - eq(v) for v in sorted(set(vals))
    ) + (n0**3 - n0)
    return r2, tie


def _bigint_oracle_ovo(col_nzs, counts, ref=0):
    g_n = len(counts)
    ref_nzs = sorted(v for v, gg in col_nzs if gg == ref)
    nnz_g = [sum(1 for _, gg in col_nzs if gg == g) for g in range(g_n)]
    n0r = counts[ref] - nnz_g[ref]
    refnz_neg = sum(1 for v in ref_nzs if v < 0)

    def rless(v):
        return sum(1 for w in ref_nzs if w < v) + (n0r if v > 0 else 0)

    def req(v):
        return sum(1 for w in ref_nzs if w == v)

    u2, tie_seg = [], []
    all_vals = sorted({v for v, _ in col_nzs})
    for g in range(g_n):
        zero_g = counts[g] - nnz_g[g]
        u2.append(
            sum(2 * rless(v) + req(v) for v, gg in col_nzs if gg == g)
            + zero_g * (2 * refnz_neg + n0r)
        )
        t = 0
        for v in all_vals:
            a = req(v)
            tg = sum(1 for w, gg in col_nzs if gg == g and w == v)
            t += (tg**3 - tg) + 3 * a * tg * (a + tg)
        # zero block: a0 = n0r, t0 = zero_g
        t += (zero_g**3 - zero_g) + 3 * n0r * zero_g * (n0r + zero_g)
        tie_seg.append(t)
    tie_ref = sum(req(v) ** 3 - req(v) for v in all_vals) + (
        n0r**3 - n0r
    )
    return u2, tie_seg, tie_ref


def test_csort_wide_payloads_past_2pow30_cells():
    """n_total >= 2**30: the 2*n0 zero-offset payloads no longer fit int32
    and must widen to float64 (round-4 ADVICE 2).  Checked against an
    arbitrary-precision Python oracle on a tiny compact tile with huge
    claimed zero counts (the zero block is closed-form, so no actual
    gigacell array is needed)."""
    G, T = 3, 2
    counts = [2**29, 2**29, 2**29 + 123]
    n_total = sum(counts)
    assert n_total >= 2**30
    cols = [
        [(1.0, 0), (3.0, 0), (2.0, 1), (3.0, 1), (-1.5, 1), (3.0, 2)],
        [(5.0, 0), (2.5, 2), (2.5, 2)],
    ]
    m_pad = 32
    vals = np.full((m_pad, T), np.inf, np.float64)
    grp = np.full((m_pad, T), G, np.uint16)
    indptr = np.zeros((G + 1, T), np.int32)
    for j, nzs in enumerate(cols):
        nzs = sorted(nzs, key=lambda vg: vg[1])
        for i, (v, gg) in enumerate(nzs):
            vals[i, j] = v
            grp[i, j] = gg
        for g in range(G):
            indptr[g + 1, j] = sum(1 for _, gg in nzs if gg <= g)

    import jax.numpy as jnp

    out = csort_stats_tile(
        jnp.asarray(vals), jnp.asarray(grp), jnp.asarray(indptr),
        jnp.asarray(np.asarray(counts, np.int64)),
        ref_code=-1, is_log1p=False, n_total=n_total,
    )
    for j, nzs in enumerate(cols):
        r2, tie = _bigint_oracle_ovr(nzs, counts)
        np.testing.assert_allclose(
            np.asarray(out["R2"])[:, j], np.asarray(r2, np.float64),
            rtol=1e-13,
        )
        np.testing.assert_allclose(
            float(np.asarray(out["tie_col"])[j]), float(tie), rtol=1e-12
        )

    out = csort_stats_tile(
        jnp.asarray(vals), jnp.asarray(grp), jnp.asarray(indptr),
        jnp.asarray(np.asarray(counts, np.int64)),
        ref_code=0, is_log1p=False, n_total=n_total,
    )
    for j, nzs in enumerate(cols):
        u2, tie_seg, tie_ref = _bigint_oracle_ovo(nzs, counts)
        np.testing.assert_allclose(
            np.asarray(out["U2"])[1:, j], np.asarray(u2[1:], np.float64),
            rtol=1e-13,
        )
        np.testing.assert_allclose(
            np.asarray(out["tie_seg"])[1:, j],
            np.asarray(tie_seg[1:], np.float64), rtol=1e-12,
        )
        np.testing.assert_allclose(
            float(np.asarray(out["tie_ref_col"])[j]), float(tie_ref),
            rtol=1e-12,
        )
