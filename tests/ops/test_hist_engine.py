"""Histogram-engine unit tests: pack/unpack wire format and dtype narrowing."""

import jax.numpy as jnp
import numpy as np
import pytest

from illico_tpu.ops import hist_engine as he


def test_pack_unpack_roundtrip():
    out = {
        # 2**52 - 1 has a low word of 2**32 - 1: the boundary where a
        # floor-division split mis-rounds under TPU x64 emulation.
        "tie_seg": jnp.asarray(
            np.array([[0.0, 1.0, 2.0**48 + 12345.0], [7.0, 2.0**33, 2.0**52 - 1.0]]),
            jnp.float64,
        ),
        "tie_ref_col": jnp.asarray(np.array([5.0, 0.0, 2.0**40]), jnp.float64),
        "U2": jnp.asarray(np.array([[1, 2, 3], [4, 5, 6]], np.int32)),
        "fc_sums": jnp.asarray(
            np.array([[0.5, 1.5, 2.5], [3.0, 4.0, 5.0]], np.float32)
        ),
        "overflow_cols": jnp.asarray(np.array([True, False, True])),
    }
    buf, spec = he.pack_device_outputs(out)
    assert buf.dtype == jnp.uint8
    total = spec[-1][3] + spec[-1][4]
    assert buf.shape == (total,)
    # descending itemsize => every offset 8-byte aligned for the f64 keys
    for k, shape, dtype, off, nbytes in spec:
        if dtype.itemsize == 8:
            assert off % 8 == 0

    back = he.unpack_host_buffer(np.asarray(buf), spec)
    assert set(back) == set(out)
    for k in out:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(out[k]))
        assert back[k].dtype == np.asarray(out[k]).dtype


def test_pack_unpack_roundtrip_narrow_encodings():
    """uint16 entries and the 6-byte split-f64 ('f48') encoding."""
    out = {
        # 2**47 - 1: low word at the 2**32 - 1 split boundary (see above).
        "tie_seg": jnp.asarray(
            np.array([[0.0, 1.0, 2.0**47 + 987.0], [2.0**33, 5.0, 2.0**47 - 1.0]]),
            jnp.float64,
        ),
        "tie_ref_col": jnp.asarray(np.array([5.0, 2.0**40, 0.0]), jnp.float64),
        "U2": jnp.asarray(np.array([[1, 2, 3], [4, 5, 6]], np.int32)),
        "fc_sums": jnp.asarray(np.array([[0, 65535, 7], [1, 2, 3]], np.uint16)),
        "overflow_cols": jnp.asarray(np.array([False, True, False])),
    }
    buf, spec = he.pack_device_outputs(out, frozenset({"tie_seg"}))
    by_key = {s[0]: s for s in spec}
    assert by_key["tie_seg"][4] == 6 * 6      # 6 values x 6 bytes
    assert by_key["tie_ref_col"][4] == 3 * 8  # full hi/lo encoding
    assert by_key["fc_sums"][4] == 6 * 2
    # uint32 sub-block of the f48 entry stays 4-byte aligned
    assert by_key["tie_seg"][3] % 4 == 0

    back = he.unpack_host_buffer(np.asarray(buf), spec)
    for k in out:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(out[k]))


@pytest.mark.parametrize(
    "bound,expected",
    [
        (100.0, "uint16"),
        (2.0**16, "uint24"),
        (2.0**24, "int32"),
        (2.0**31, "float64"),
    ],
)
def test_pick_exact_dtype(bound, expected):
    assert he._pick_exact_dtype(bound) == expected


@pytest.mark.parametrize(
    "bound,expected",
    [
        (100.0, "uint16"),
        (2.0**16, "uint24"),
        (2.0**24, "int32"),
        (2.0**31, "u40"),
        (2.0**40, "f48"),
        (2.0**48, "float64"),
    ],
)
def test_pick_tie_dtype(bound, expected):
    assert he._pick_tie_dtype(bound) == expected


def test_pack_unpack_u40():
    """5-byte split-f64 encoding: values < 2**40, uint32 lo + uint8 hi."""
    vals = np.array(
        [[0.0, 1.0, 2.0**40 - 1.0, 2.0**32], [7.0, 2.0**33 + 9.0, 3.0, 12.0]]
    )
    out = {
        "tie_seg": jnp.asarray(vals, jnp.float64),
        "overflow_cols": jnp.asarray(np.array([False, True, False, False])),
    }
    buf, spec = he.pack_device_outputs(out, {"tie_seg": 5})
    by_key = {s[0]: s for s in spec}
    assert by_key["tie_seg"][4] == 8 * 5  # 8 values x 5 bytes
    assert by_key["tie_seg"][3] % 4 == 0  # uint32 sub-block aligned
    back = he.unpack_host_buffer(np.asarray(buf), spec)
    np.testing.assert_array_equal(np.asarray(back["tie_seg"]), vals)


def test_pack_unpack_fuzz_all_tiers():
    """Seeded fuzz: random dicts over every encoding tier round-trip exactly.

    Values are drawn adversarially near the 32-bit word boundary (lo word
    in {0, 1, 2**32-2, 2**32-1}) as well as uniformly, since the split
    encodings historically mis-rounded exactly there on TPU x64 emulation.
    """
    rng = np.random.RandomState(42)

    def draw(bound, shape):
        u = rng.randint(0, 4, size=shape)
        lo = np.choose(u, [0, 1, 2**32 - 2, 2**32 - 1])
        hi = rng.randint(0, max(1, int(bound // 2**32) + 1), size=shape)
        v = np.minimum(hi.astype(np.float64) * 2.0**32 + lo, bound - 1)
        mix = rng.rand(*shape) < 0.5
        return np.where(
            mix, np.floor(rng.rand(*shape) * bound), v
        ).astype(np.float64)

    for trial in range(8):
        g = rng.choice([1, 2, 3, 5])
        t = rng.choice([4, 8, 12])
        out, narrow = {}, {}
        out["a_f64"] = jnp.asarray(draw(2.0**52, (g, t)), jnp.float64)
        out["b_f48"] = jnp.asarray(draw(2.0**48, (g, t)), jnp.float64)
        narrow["b_f48"] = 6
        out["c_u40"] = jnp.asarray(draw(2.0**40, (g, t)), jnp.float64)
        narrow["c_u40"] = 5
        out["d_u24"] = jnp.asarray(
            rng.randint(0, 2**24, (g, t)).astype(np.uint32)
        )
        narrow["d_u24"] = 3
        out["e_i32"] = jnp.asarray(rng.randint(0, 2**31 - 1, (g, t), np.int64).astype(np.int32))
        out["f_u16"] = jnp.asarray(rng.randint(0, 2**16, (g, t)).astype(np.uint16))
        out["g_f32"] = jnp.asarray(rng.rand(t).astype(np.float32))
        out["h_bool"] = jnp.asarray(rng.rand(t) < 0.5)
        if (g * t) % 4:
            narrow.pop("c_u40")  # 5-byte tier needs counts divisible by 4
            if (g * t) % 2:
                narrow.pop("b_f48")
                narrow.pop("d_u24")
        buf, spec = he.pack_device_outputs(out, narrow)
        back = he.unpack_host_buffer(np.asarray(buf), spec)
        for k in out:
            np.testing.assert_array_equal(
                np.asarray(back[k]), np.asarray(out[k]), err_msg=f"{trial}:{k}"
            )
            assert back[k].dtype == np.asarray(out[k]).dtype


def test_pack_count_alignment_guard():
    """Split encodings reject element counts that would misalign later blocks."""
    bad = {"tie_seg": jnp.zeros((3, 1), jnp.float64)}  # 3 values, 5B each
    with pytest.raises(ValueError, match="divisible by 4"):
        he.build_pack_spec(bad, {"tie_seg": 5})
    bad3 = {"U2": jnp.zeros((3, 1), jnp.uint32)}
    with pytest.raises(ValueError, match="divisible by 2"):
        he.build_pack_spec(bad3, {"U2": 3})


def test_ovr_r2_u40_tier_end_to_end(monkeypatch):
    """OVR rank sums ride the 5-byte u40 tier (bound 2*M*n exceeds int32 at
    production scale); force the tier on a small dataset and check scipy
    parity through the native consume path."""
    from scipy import stats

    from illico_tpu import asymptotic_wilcoxon_arrays

    monkeypatch.setattr(
        he, "_pick_split_dtype", lambda bound: "u40" if bound >= 2**16 else "uint16"
    )
    rng = np.random.RandomState(3)
    X = rng.poisson(2.0, (3000, 8)).astype(np.float32)
    X[rng.rand(*X.shape) < 0.5] = 0
    groups = np.array(["a", "b", "c"])[rng.randint(0, 3, 3000)]

    df = asymptotic_wilcoxon_arrays(X, groups, progress=False)  # OVR
    Xd = X.astype(np.float64)
    for g in ("a", "b", "c"):
        tgt = groups == g
        for j in range(8):
            r = stats.mannwhitneyu(
                Xd[~tgt, j], Xd[tgt, j],
                alternative="two-sided", method="asymptotic",
            )
            got = df.loc[(g, f"gene_{j}")]
            assert got["statistic"] == r.statistic, (g, j)
            assert abs(got["p_value"] - r.pvalue) <= 1e-12 * r.pvalue, (g, j)


def test_fc_split_and_narrow_tiers_end_to_end():
    """A huge control group triggers the fc-row split and narrow tie tiers.

    The dominant group otherwise forces fc_sums (and, via its self-row,
    tie_seg) into wide encodings; with the split + device ref-row zeroing,
    statistics still match scipy exactly through both the native and the
    numpy consume paths.
    """
    from scipy import stats

    import illico_tpu.native as native
    from illico_tpu import asymptotic_wilcoxon_arrays
    from illico_tpu.models.wilcoxon import WilcoxonRunner
    from illico_tpu.utils.groups import encode_and_count_groups
    from illico_tpu.utils.registry import data_handler_registry

    rng = np.random.RandomState(17)
    n_ref, n_g = 5000, 60
    labels = np.array(["ctl"] * n_ref + ["a"] * n_g + ["b"] * (n_g - 7))
    rng.shuffle(labels)
    X = rng.poisson(2.0, (labels.size, 10)).astype(np.float32)
    X[rng.rand(*X.shape) < 0.6] = 0

    _, info = encode_and_count_groups(labels, "ctl")
    runner = WilcoxonRunner(
        data_handler_registry.get(X), info, is_log1p=False, engine="hist"
    )
    statics = runner.tile_fn._statics
    # the huge control is split out and the bulk fc array drops to uint16
    assert statics["fc_split_code"] == info.ref_code
    assert statics["fc_dtype"] == "uint16"
    # tie bound ~3*R*M*(R+M) ~ 4.6e9: the 5-byte u40 tier, not f48
    assert statics["tie_dtype"] == "u40"
    assert statics["u2_dtype"] == "uint24"

    def oracle(df):
        Xd = X.astype(np.float64)
        ref = labels == "ctl"
        for g in ("a", "b"):
            tgt = labels == g
            for j in range(X.shape[1]):
                r = stats.mannwhitneyu(
                    Xd[ref, j], Xd[tgt, j],
                    alternative="two-sided", method="asymptotic",
                )
                got = df.loc[(g, f"gene_{j}")]
                assert got["statistic"] == r.statistic, (g, j)
                assert abs(got["p_value"] - r.pvalue) <= 1e-12 * r.pvalue, (g, j)
                mu_t = Xd[tgt, j].mean()
                mu_r = Xd[ref, j].mean()
                want_fc = np.inf if mu_r == 0 else mu_t / mu_r
                np.testing.assert_allclose(
                    got["fold_change"], want_fc, rtol=1e-9, err_msg=f"{g},{j}"
                )

    oracle(asymptotic_wilcoxon_arrays(X, labels, reference="ctl", progress=False))

    # numpy fallback consume path (fc_split_col restored host-side)
    lib, tried = native._LIB, native._TRIED
    try:
        native._LIB, native._TRIED = None, True
        oracle(
            asymptotic_wilcoxon_arrays(X, labels, reference="ctl", progress=False)
        )
    finally:
        native._LIB, native._TRIED = lib, tried


def test_pack_unpack_u24():
    out = {
        "U2": jnp.asarray(
            np.array([[0, 1, 2**24 - 1], [65536, 123456, 7]], np.uint32)
        ),
        "overflow_cols": jnp.asarray(np.array([False, False, True])),
    }
    buf, spec = he.pack_device_outputs(out, frozenset({"U2"}))
    by_key = {s[0]: s for s in spec}
    assert by_key["U2"][4] == 6 * 3  # 6 values x 3 bytes
    back = he.unpack_host_buffer(np.asarray(buf), spec)
    np.testing.assert_array_equal(np.asarray(back["U2"]), np.asarray(out["U2"]))
    assert back["U2"].dtype == np.uint32


def test_adaptive_table_covers_large_counts():
    """Counts in [128, 511) widen the value table instead of falling back."""
    from illico_tpu import asymptotic_wilcoxon_arrays
    from illico_tpu.models.wilcoxon import WilcoxonRunner
    from illico_tpu.utils.groups import encode_and_count_groups
    from illico_tpu.utils.registry import data_handler_registry
    from scipy import stats

    rng = np.random.RandomState(5)
    X = rng.poisson(60.0, (1500, 8)).astype(np.float32)
    X[:, 3] += 300  # counts up to ~400: needs the 512-wide table
    groups = np.array(["a", "b", "c"])[rng.randint(0, 3, 1500)]

    _, info = encode_and_count_groups(groups, "a")
    runner = WilcoxonRunner(
        data_handler_registry.get(X), info, is_log1p=False
    )
    assert runner._pick_v_buckets() == 512

    df = asymptotic_wilcoxon_arrays(X, groups, reference="a", progress=False)
    Xd = X.astype(np.float64)
    for j in (0, 3):
        r = stats.mannwhitneyu(
            Xd[groups == "a", j], Xd[groups == "b", j],
            alternative="two-sided", method="asymptotic",
        )
        got = df.loc[("b", f"gene_{j}")]
        assert got["statistic"] == r.statistic
        assert abs(got["p_value"] - r.pvalue) <= 1e-12 * r.pvalue


def test_log1p_data_exact_parity():
    """log1p-transformed float32 data ties exactly via the log1p value table.

    SURVEY §7 hard part 2: tie detection must match scipy on the float32
    values the user actually passes.  The histogram engine tabulates
    ``log1p(0..V-1)`` in float32, so data produced by float32 pipelines
    (e.g. scanpy's log1p) hits the table bit-for-bit; p-values, U and the
    expm1-aware fold change must all match scipy on the same values.
    """
    from illico_tpu import asymptotic_wilcoxon_arrays
    from scipy import stats

    rng = np.random.RandomState(11)
    counts = rng.poisson(3.0, (3000, 12)).astype(np.float32)
    counts[rng.rand(3000, 12) < 0.5] = 0
    X = np.log1p(counts)  # float32 log1p, as scanpy produces
    groups = np.array(["ctl", "a", "b"])[rng.randint(0, 3, 3000)]

    # The log1p table must actually serve these values: no column may take
    # the sort-engine overflow fallback (correctness would mask a broken
    # fast path otherwise).
    from unittest import mock

    from illico_tpu.models import wilcoxon as wmod

    with mock.patch.object(
        wmod.WilcoxonRunner,
        "_recompute_with_sort_engine",
        side_effect=AssertionError("log1p values missed the histogram table"),
    ):
        df = asymptotic_wilcoxon_arrays(
            X, groups, is_log1p=True, reference="ctl", progress=False
        )
    Xd = X.astype(np.float64)
    ref = groups == "ctl"
    for g in ("a", "b"):
        tgt = groups == g
        for j in range(12):
            r = stats.mannwhitneyu(
                Xd[ref, j], Xd[tgt, j],
                alternative="two-sided", method="asymptotic",
            )
            got = df.loc[(g, f"gene_{j}")]
            assert got["statistic"] == r.statistic, (g, j)
            assert abs(got["p_value"] - r.pvalue) <= 1e-12 * r.pvalue, (g, j)
            # expm1-aware fold change vs the raw-count means
            mu_t = counts[tgt, j].astype(np.float64).mean()
            mu_r = counts[ref, j].astype(np.float64).mean()
            want_fc = np.inf if mu_r == 0 else mu_t / mu_r
            np.testing.assert_allclose(got["fold_change"], want_fc, rtol=1e-9)


def test_production_scale_tier_selection():
    """K562-scale group sizes select the narrow tiers the bench relies on:
    OVO = 10 B/test (u24 + u40 + u16/split), OVR = 6 B/test
    (int32/split + u16/split — the control's R2 and fc rows each ship as
    one separate per-column array).
    """
    from illico_tpu.ops.rank_engine import build_padded_layout
    from illico_tpu.utils.groups import encode_and_count_groups

    rng = np.random.RandomState(0)
    n, G = 300_000, 2000
    labels = rng.randint(1, G, n)
    labels[rng.rand(n) < 0.1] = 0  # ~30k-cell control, ~150-cell groups

    def statics_for(ref):
        _, info = encode_and_count_groups(labels, ref)
        layout = build_padded_layout(info.perm, info.indptr)
        fn = he.make_hist_tile_fn(
            layout, ref_code=info.ref_code, is_log1p=False, interpret=True
        )
        return fn._statics, info

    ovo, info = statics_for(0)
    assert ovo["u2_dtype"] == "uint24"      # 2*R*M ~ 1.1e7
    assert ovo["tie_dtype"] == "u40"        # M^3+3RM(R+M) ~ 5e11
    assert ovo["fc_dtype"] == "uint16"      # rest bound ~ M*127
    assert ovo["fc_split_code"] == info.ref_code

    ovr, _ = statics_for(None)
    # control row split out: rest bound 2*M_max*n ~ 9e7 -> int32 (the
    # unsplit bound 2*R*n ~ 1.8e10 would force u40 on the whole array)
    assert ovr["u2_dtype"] == "int32"
    assert ovr["u2_split_code"] >= 0
    assert ovr["tie_dtype"] == "float64"    # OVR ships no (G, T) tie array
    assert ovr["fc_dtype"] == "uint16"
    assert ovr["fc_split_code"] >= 0


def test_hist_stat_bounds_ovr_vs_ovo():
    from illico_tpu.ops.rank_engine import build_padded_layout
    from illico_tpu.utils.groups import encode_and_count_groups

    labels = np.repeat(np.arange(4), [10, 20, 30, 40])
    _, info = encode_and_count_groups(labels, ref_group=0)
    layout = build_padded_layout(info.perm, info.indptr)
    u2_ovo, fc = he.hist_stat_bounds(layout, info.ref_code, 128)
    assert u2_ovo == 2.0 * 10 * 40
    assert fc == 40 * 127
    u2_ovr, _ = he.hist_stat_bounds(layout, -1, 128)
    assert u2_ovr == 2.0 * 40 * 100


def test_overflow_fallback_recomputes_exactly():
    """Columns with counts beyond the largest table take the sort engine."""
    from unittest import mock

    from scipy import stats

    from illico_tpu import asymptotic_wilcoxon_arrays
    from illico_tpu.models import wilcoxon as wmod

    rng = np.random.RandomState(8)
    X = rng.poisson(3.0, (2000, 9)).astype(np.float32)
    X[:, 4] += 2000  # far beyond the 512-entry table
    groups = np.array(["a", "b", "c"])[rng.randint(0, 3, 2000)]

    recomputed = {}
    orig = wmod.WilcoxonRunner._recompute_with_sort_engine

    def spy(self, cols, consume_stats):
        recomputed["cols"] = np.array(cols)
        return orig(self, cols, consume_stats)

    with mock.patch.object(
        wmod.WilcoxonRunner, "_recompute_with_sort_engine", spy
    ):
        df = asymptotic_wilcoxon_arrays(
            X, groups, reference="a", engine="hist", progress=False
        )

    np.testing.assert_array_equal(recomputed["cols"], [4])
    Xd = X.astype(np.float64)
    for j in (3, 4, 5):
        r = stats.mannwhitneyu(
            Xd[groups == "a", j], Xd[groups == "b", j],
            alternative="two-sided", method="asymptotic",
        )
        got = df.loc[("b", f"gene_{j}")]
        assert got["statistic"] == r.statistic
        assert abs(got["p_value"] - r.pvalue) <= 1e-12 * r.pvalue


def test_auto_tile_width_respects_hbm_budget():
    """The wide-tile preference must never override the HBM workspace
    budget: at ~11k groups the budget allows <512 columns per tile."""
    from illico_tpu.models.wilcoxon import WilcoxonRunner
    from illico_tpu.utils.groups import encode_and_count_groups
    from illico_tpu.utils.registry import data_handler_registry

    n_groups = 11_000
    labels = np.arange(n_groups)
    X = np.zeros((n_groups, 2048), np.float32)
    _, info = encode_and_count_groups(labels, None)
    runner = WilcoxonRunner(
        data_handler_registry.get(X), info, is_log1p=False, engine="hist"
    )
    t_hbm = int(8e9 / (n_groups * 128 * 12.0))
    assert runner.tile_width <= ((t_hbm // 128) * 128)
    assert runner.tile_width == 384


def test_huge_group_takes_sort_engine(monkeypatch):
    """Groups beyond the f32 bucket-exactness bound must not use the
    histogram engine: auto falls back to sort, explicit hist raises."""
    from illico_tpu.models.wilcoxon import WilcoxonRunner
    from illico_tpu.ops.rank_engine import build_padded_layout
    from illico_tpu.utils.groups import encode_and_count_groups
    from illico_tpu.utils.registry import data_handler_registry

    monkeypatch.setattr(he, "HIST_EXACT_MAX_GROUP", 50)
    rng = np.random.RandomState(0)
    labels = np.array([0] * 60 + [1] * 10 + [2] * 10)
    X = rng.poisson(2.0, (80, 8)).astype(np.float32)
    _, info = encode_and_count_groups(labels, 0)

    runner = WilcoxonRunner(
        data_handler_registry.get(X), info, is_log1p=False, engine="auto"
    )
    assert runner.engine == "sort"

    layout = build_padded_layout(info.perm, info.indptr)
    with pytest.raises(ValueError, match="sort"):
        he.make_hist_tile_fn(layout, ref_code=0, is_log1p=False, interpret=True)


def test_tall_datasets_keep_hist_via_f96_tiers():
    """The historical 2**21-total-cell demotion is retired (round-3 VERDICT
    item 4): tie statistics past the int64 word split's 2**63 bound ship on
    the f96 triple tier instead.  The at-scale statics choice is pinned by
    ``test_wire_contract.test_tall_dataset_statics_choose_f96``; here the
    f96 tiers are driven end-to-end through the packed contract on a small
    problem and must reproduce the plain-array float64 truth bit-exactly."""
    import jax
    import jax.numpy as jnp

    from illico_tpu.ops.rank_engine import build_padded_layout
    from illico_tpu.utils.groups import encode_and_count_groups

    rng = np.random.RandomState(1)
    labels = np.array([0] * 30 + [1] * 30 + [2] * 20)
    x = rng.poisson(2.0, (80, 8)).astype(np.float32)
    _, info = encode_and_count_groups(labels, 0)
    layout = build_padded_layout(info.perm, info.indptr)
    V = he.DEFAULT_V

    perm, pad_mask, table, blk_group, blk_flush, ppg = (
        he.prepare_hist_inputs(layout, V, False)
    )
    with jax.enable_x64(False):
        hist = he.hist_pass(
            jnp.asarray(x), perm, pad_mask, table, blk_group, blk_flush,
            n_groups=layout.n_groups, interpret=True,
        )
    base = he.hist_contract_statics(layout, 0, V)
    forced = {**base, "tie_dtype": "f96", "tiecol_dtype": "f96"}
    with jax.enable_x64(True):
        packed_buf = he.hist_contract(
            hist, ppg, n_pad=float(layout.n_pad), is_log1p=False,
            pack=True, **forced,
        )
        plain = he.hist_contract(
            hist, ppg, n_pad=float(layout.n_pad), is_log1p=False,
            pack=False, **forced,
        )
    spec = he.build_pack_spec(
        {
            k: jax.ShapeDtypeStruct(v.shape, v.dtype)
            for k, v in plain.items()
        },
        he._narrow_map(forced),
    )
    got = he.unpack_host_buffer(
        np.asarray(jax.device_get(packed_buf)),
        spec,
    )
    np.testing.assert_array_equal(
        np.asarray(got["tie_seg"], np.float64),
        np.asarray(jax.device_get(plain["tie_seg"])),
    )
    np.testing.assert_array_equal(
        np.asarray(got["tie_ref_col"], np.float64),
        np.asarray(jax.device_get(plain["tie_ref_col"])),
    )


def test_non_integer_data_takes_rank_path_up_front():
    """Normalized/scaled float32 expression can never hit the value table:
    auto must route it to the rank path without a wasted histogram pass
    (VERDICT round-1 weakness 3).  Since round 4 that path is the compact
    (nonzero-only) sort tier for sparse host data (VERDICT round-3 item 2).
    Integer counts and float32 log1p counts keep the histogram engine;
    results stay exact either way."""
    from illico_tpu import asymptotic_wilcoxon_arrays
    from illico_tpu.models.wilcoxon import WilcoxonRunner
    from illico_tpu.utils.groups import encode_and_count_groups
    from illico_tpu.utils.registry import data_handler_registry
    from scipy import stats

    rng = np.random.RandomState(3)
    counts = rng.poisson(2.0, (800, 12)).astype(np.float32)
    counts[rng.rand(*counts.shape) < 0.5] = 0
    labels = np.array(["a", "b", "c"])[rng.randint(0, 3, 800)]
    _, info = encode_and_count_groups(labels, "a")

    def engine_for(X, is_log1p=False):
        return WilcoxonRunner(
            data_handler_registry.get(X), info, is_log1p=is_log1p
        ).engine

    # CPM-style normalization: non-integer everywhere -> rank path, up
    # front (csort: this fixture is ~50% zeros and host-resident).
    norm = counts / np.maximum(counts.sum(axis=1, keepdims=True), 1) * 1e4
    assert engine_for(norm) == "csort"
    # log of normalized data is not float32-log1p-of-integers -> rank path.
    assert engine_for(np.log1p(norm), is_log1p=True) == "csort"
    # Raw counts and float32 log1p counts keep the histogram engine.
    assert engine_for(counts) == "hist"
    assert engine_for(np.log1p(counts), is_log1p=True) == "hist"

    # The sort route stays exact on the normalized data.
    df = asymptotic_wilcoxon_arrays(norm, labels, reference="a", progress=False)
    nd = norm.astype(np.float64)
    r = stats.mannwhitneyu(
        nd[labels == "a", 5], nd[labels == "b", 5],
        alternative="two-sided", method="asymptotic",
    )
    got = df.loc[("b", "gene_5")]
    assert got["statistic"] == r.statistic
    assert abs(got["p_value"] - r.pvalue) <= 1e-12 * r.pvalue


def test_failed_sampling_probe_is_memoized():
    """Three runner-setup stages (engine selection, the log1p warning,
    value-table sizing) consult the value-stats sample; a FAILING probe
    (slow-then-raising storage) must be attempted once, not re-paid by
    each stage — and must leave the runner on its default configuration."""
    from illico_tpu.models.wilcoxon import WilcoxonRunner
    from illico_tpu.ops.hist_engine import DEFAULT_V
    from illico_tpu.utils.groups import encode_and_count_groups
    from illico_tpu.utils.registry import data_handler_registry

    rng = np.random.RandomState(0)
    X = rng.poisson(2.0, (60, 8)).astype(np.float32)
    labels = np.array([0] * 30 + [1] * 15 + [2] * 15)
    _, info = encode_and_count_groups(labels, 0)
    handler = data_handler_registry.get(X)
    calls = []

    def flaky_fetch(lb, ub):
        calls.append((lb, ub))
        raise OSError("flaky storage")

    handler.fetch_tile = flaky_fetch
    runner = WilcoxonRunner(handler, info, is_log1p=False, engine="auto")
    assert runner.engine == "hist"  # failed probe -> (None, True) defaults
    assert runner._v_buckets == DEFAULT_V
    assert len(calls) == 1, f"sampling I/O paid {len(calls)} times"


def test_device_resident_short_tail_tile():
    """A device-resident matrix whose gene count is below the tile width
    takes the jitted tail fetch (no full-matrix pad copy); results match
    the host-input path exactly."""
    import jax.numpy as jnp
    import pandas as pd

    from illico_tpu import asymptotic_wilcoxon_arrays

    rng = np.random.RandomState(2)
    X = rng.poisson(2.0, (2000, 300)).astype(np.float32)
    X[rng.rand(*X.shape) < 0.5] = 0
    groups = np.array(["a", "b", "c"])[rng.randint(0, 3, 2000)]
    kw = dict(reference="a", progress=False)
    df_host = asymptotic_wilcoxon_arrays(X, groups, **kw)
    df_dev = asymptotic_wilcoxon_arrays(jnp.asarray(X), groups, **kw)
    pd.testing.assert_frame_equal(df_host, df_dev)


def test_device_resident_non_integer_routes_to_sort():
    """The device-resident conformity probe pulls a sample slab and checks
    it with the SAME numpy math that builds the value table (XLA f32
    transcendentals can differ by ULPs): normalized device data must route
    to sort up front, device count data must keep the histogram engine."""
    import jax.numpy as jnp

    from illico_tpu.models.wilcoxon import WilcoxonRunner
    from illico_tpu.utils.groups import encode_and_count_groups
    from illico_tpu.utils.registry import data_handler_registry

    rng = np.random.RandomState(7)
    counts = rng.poisson(2.0, (800, 12)).astype(np.float32)
    counts[rng.rand(*counts.shape) < 0.5] = 0
    labels = np.array(["a", "b", "c"])[rng.randint(0, 3, 800)]
    _, info = encode_and_count_groups(labels, "a")

    def engine_for(X, is_log1p=False):
        return WilcoxonRunner(
            data_handler_registry.get(jnp.asarray(X)), info, is_log1p=is_log1p
        ).engine

    norm = counts / np.maximum(counts.sum(axis=1, keepdims=True), 1) * 1e4
    assert engine_for(norm) == "sort"
    assert engine_for(np.log1p(norm), is_log1p=True) == "sort"
    assert engine_for(counts) == "hist"
    assert engine_for(np.log1p(counts), is_log1p=True) == "hist"


def test_ovr_r2_row_split_drops_wire_tier_and_stays_exact():
    """OVR with one dominant group (the K562 control pattern): R2's bound
    2*n_max*n_total forces u40 on the whole (G, T) array unless the big
    row ships separately; with the split the bulk drops to int32 and both
    consume paths (native, numpy) stay scipy-exact — including the split
    group's own test, whose R2 row travels as ``r2_split_col``."""
    from scipy.stats import mannwhitneyu

    import illico_tpu.native as native
    from illico_tpu import asymptotic_wilcoxon_arrays
    from illico_tpu.models.wilcoxon import WilcoxonRunner
    from illico_tpu.utils.groups import encode_and_count_groups
    from illico_tpu.utils.registry import data_handler_registry

    rng = np.random.RandomState(23)
    n_big, n_small = 35_000, 500
    labels = np.array(
        ["big"] * n_big + ["a"] * n_small + ["b"] * (n_small - 9)
    )
    rng.shuffle(labels)
    X = rng.poisson(2.0, (labels.size, 6)).astype(np.float32)
    X[rng.rand(*X.shape) < 0.8] = 0

    _, info = encode_and_count_groups(labels, None)
    runner = WilcoxonRunner(
        data_handler_registry.get(X), info, is_log1p=False, engine="hist"
    )
    statics = runner.tile_fn._statics
    big_code = int(np.argmax(info.counts))
    assert statics["u2_split_code"] == big_code
    assert statics["u2_dtype"] == "int32"  # 2*500*36k ~ 3.6e7 < 2^31

    def oracle(df):
        Xd = X.astype(np.float64)
        for g in ("big", "a", "b"):
            tgt = labels == g
            for j in range(X.shape[1]):
                r = mannwhitneyu(
                    Xd[~tgt, j], Xd[tgt, j],
                    alternative="two-sided", method="asymptotic",
                )
                got = df.loc[(g, f"gene_{j}")]
                assert got["statistic"] == r.statistic, (g, j)
                assert abs(got["p_value"] - r.pvalue) <= 1e-12 * r.pvalue, (g, j)

    kw = dict(reference=None, engine="hist", progress=False)
    oracle(asymptotic_wilcoxon_arrays(X, labels, **kw))

    # numpy fallback consume path (r2_split_col restored host-side)
    lib, tried = native._LIB, native._TRIED
    try:
        native._LIB, native._TRIED = None, True
        oracle(asymptotic_wilcoxon_arrays(X, labels, **kw))
    finally:
        native._LIB, native._TRIED = lib, tried
