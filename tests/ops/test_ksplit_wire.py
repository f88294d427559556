"""nnz-split ("ksplit") OVO wire: correctness of the narrow-residual
format, its exception buffer, and the overflow fallback (round-4 VERDICT
item 1 — the OVO tie term was the wire's widest tier and the open
performance gap vs the blueprint's <5 s north star).

Oracle: the full-column sort engine (itself scipy-proven by the parity
suite).  The wire must reproduce U2/tie_seg/fc EXACTLY, including cells
whose narrow stores overflow and travel via exceptions.
"""

import numpy as np
import pytest

from illico_tpu.ops import hist_engine as he
from illico_tpu.ops.rank_engine import build_padded_layout, make_tile_fn
from illico_tpu.utils.groups import encode_and_count_groups


def _ksplit_problem(seed=0, n_ref=8000, g_other=30, n_per=45, t=64,
                    density=0.12):
    """Shapes that engage the nnz-split wire: big control, small groups,
    tie bound in u40 territory (3*R*M*(R+M) ~ 3.9e9 > 2^31)."""
    rng = np.random.RandomState(seed)
    labels = np.concatenate(
        [np.zeros(n_ref, int), 1 + np.arange(g_other).repeat(n_per)]
    )
    rng.shuffle(labels)
    x = rng.poisson(2.0, (labels.size, t)).astype(np.float32)
    x[rng.rand(labels.size, t) >= density] = 0
    _, info = encode_and_count_groups(
        np.array([f"g{v:03d}" for v in labels]), "g000"
    )
    layout = build_padded_layout(info.perm, info.indptr)
    return x, info, layout


def _unpacked(layout, info, x):
    fn = he.make_hist_tile_fn(
        layout, ref_code=info.ref_code, is_log1p=False, interpret=True
    )
    assert fn._statics["nnz_split"] is True
    buf = np.asarray(fn(x))
    out = fn.unpack(buf)
    fc_split = fn._statics["fc_split_code"]
    if fc_split >= 0 and "fc_split_col" in out:
        fc = np.asarray(out["fc_sums"], np.float64)
        fc[fc_split] = np.asarray(out["fc_split_col"], np.float64)
        out["fc_sums"] = fc
    return out, buf, fn


def _sort_oracle(layout, info, x):
    fn = make_tile_fn(layout, ref_code=info.ref_code, is_log1p=False)
    out = {k: np.array(v, np.float64) for k, v in fn(x).items()}
    for k in ("U2", "tie_seg"):
        out[k][info.ref_code] = 0.0
    return out


def test_ksplit_engagement_conditions():
    x, info, layout = _ksplit_problem()
    s = he.hist_contract_statics(layout, info.ref_code, he.DEFAULT_V)
    assert s["nnz_split"] is True
    # OVR never engages (no per-(G, T) tie array to replace).
    assert he.hist_contract_statics(layout, -1, he.DEFAULT_V)[
        "nnz_split"] is False
    # The mesh path (plain arrays) never engages.
    assert he.hist_contract_statics(
        layout, info.ref_code, he.DEFAULT_V, wire=False
    )["nnz_split"] is False
    # A non-ref group at >= 256 cells breaks the static uint8-k proof.
    rng = np.random.RandomState(3)
    labels = np.concatenate(
        [np.zeros(8000, int), np.full(300, 1), 2 + np.arange(10).repeat(40)]
    )
    rng.shuffle(labels)
    _, info2 = encode_and_count_groups(
        np.array([f"g{v:03d}" for v in labels]), "g000"
    )
    layout2 = build_padded_layout(info2.perm, info2.indptr)
    assert he.hist_contract_statics(layout2, info2.ref_code, he.DEFAULT_V)[
        "nnz_split"] is False


def test_ksplit_matches_sort_engine_exactly():
    x, info, layout = _ksplit_problem()
    out, buf, _ = _unpacked(layout, info, x)
    want = _sort_oracle(layout, info, x)
    t = x.shape[1]
    assert not out["overflow_cols"][:t].any()
    for k in ("U2", "tie_seg", "fc_sums", "tie_ref_col"):
        np.testing.assert_array_equal(
            np.asarray(out[k], np.float64)[..., :t], want[k], err_msg=k
        )


def test_ksplit_exceptions_carry_violators_exactly():
    # Adversarial columns: groups with many tied nonzeros push U2_nz past
    # uint16 and the tie residual past the s24 window.
    x, info, layout = _ksplit_problem(seed=7, density=0.25)
    code = {
        int(c): i for i, c in enumerate(range(info.n_groups))
    }  # codes are already 0..G-1
    del code
    rows_g5 = np.flatnonzero(info.encoded_groups == 5)
    rows_g9 = np.flatnonzero(info.encoded_groups == 9)
    x[rows_g5, 3] = 2.0   # k = n_g, all tied with a large ref bucket
    x[rows_g9[:44], 3] = 2.0
    x[rows_g5, 11] = 1.0
    out, buf, fn = _unpacked(layout, info, x)
    want = _sort_oracle(layout, info, x)
    t = x.shape[1]
    assert not out["overflow_cols"][:t].any()
    # the raw wire must actually have used exception slots
    raw = he.unpack_host_buffer(buf, fn._spec_cache[t])
    n_exc = int((np.asarray(raw["exc_key"]) != he._EXC_KEY_SENTINEL).sum())
    assert n_exc > 0, "adversarial columns produced no exceptions"
    for k in ("U2", "tie_seg", "fc_sums", "tie_ref_col"):
        got = np.asarray(out[k], np.float64)[..., :t]
        if k == "fc_sums":
            np.testing.assert_array_equal(got, want[k], err_msg=k)
        else:
            np.testing.assert_array_equal(got, want[k], err_msg=k)


def test_ksplit_overflowing_column_flags_for_fallback():
    # > NNZ_SPLIT_SLOTS violators in one column: the device must flag the
    # column (overflow_cols), routing it to the exact sort fallback.
    x, info, layout = _ksplit_problem(seed=11, density=0.25)
    for g in range(1, 28):
        rows = np.flatnonzero(info.encoded_groups == g)
        x[rows, 5] = 2.0  # every group fully tied at one value: huge tie_nz
    out, buf, fn = _unpacked(layout, info, x)
    t = x.shape[1]
    raw = he.unpack_host_buffer(buf, fn._spec_cache[t])
    keys = np.asarray(raw["exc_key"])
    assert (keys[:, 5] != he._EXC_KEY_SENTINEL).all(), (
        "expected a full exception buffer in the hot column"
    )
    assert out["overflow_cols"][5]
    assert not out["overflow_cols"][:5].any()


def test_ksplit_public_api_end_to_end_with_fallback():
    from illico_tpu import asymptotic_wilcoxon_arrays
    from illico_tpu.models.wilcoxon import WilcoxonRunner
    from illico_tpu.utils.registry import data_handler_registry

    x, info, layout = _ksplit_problem(seed=13, t=40)
    for g in range(1, 28):  # column 5 overflows the exception buffer
        x[np.flatnonzero(info.encoded_groups == g), 5] = 2.0
    labels = np.array([f"g{i:03d}" for i in info.encoded_groups])
    handler = data_handler_registry.get(x)
    r = WilcoxonRunner(handler, info, is_log1p=False, engine="hist")
    assert r.tile_fn._statics["nnz_split"] is True
    res = r.run(progress=False)
    rs = WilcoxonRunner(handler, info, is_log1p=False, engine="sort")
    res_s = rs.run(progress=False)
    np.testing.assert_array_equal(res.statistics, res_s.statistics)
    np.testing.assert_allclose(res.pvalues, res_s.pvalues, rtol=1e-12,
                               atol=0.0)
    np.testing.assert_allclose(res.fold_change, res_s.fold_change,
                               rtol=1e-12)


def test_ksplit_native_consume_matches_numpy(monkeypatch):
    import illico_tpu.native as native

    if not native.native_available():
        pytest.skip("no C++ toolchain for the native tail")
    from illico_tpu.models.wilcoxon import WilcoxonRunner
    from illico_tpu.utils.registry import data_handler_registry

    x, info, layout = _ksplit_problem(seed=17, t=80, density=0.25)
    x[np.flatnonzero(info.encoded_groups == 5), 3] = 2.0  # exceptions
    handler = data_handler_registry.get(x)
    r = WilcoxonRunner(handler, info, is_log1p=False, engine="hist")
    res = r.run(progress=False)
    assert r._consume_path["native"] == len(r.bounds)
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    r2 = WilcoxonRunner(handler, info, is_log1p=False, engine="hist")
    res2 = r2.run(progress=False)
    assert r2._consume_path["native"] == 0
    np.testing.assert_array_equal(res.statistics, res2.statistics)
    np.testing.assert_array_equal(res.fold_change, res2.fold_change)
    # U and fc are exact; p differs by a few ulps (the C and numpy tails
    # associate float64 ops differently), far inside the 1e-12 contract.
    np.testing.assert_allclose(res.pvalues, res2.pvalues, rtol=2e-14,
                               atol=0.0)


def test_ksplit_fc_u8_tier_exact():
    # Forced fc-u8 hint: fc travels as fc - k (uint8) with exceptions for
    # the rare large entries; reconstruction must stay exact.
    x, info, layout = _ksplit_problem(seed=19, density=0.2)
    # one group with large values in one column: fc_res > 255 exceptions
    rows = np.flatnonzero(info.encoded_groups == 4)
    x[rows[:30], 9] = 30.0
    fn = he.make_hist_tile_fn(
        layout, ref_code=info.ref_code, is_log1p=False, interpret=True,
        fc_u8_hint=True,
    )
    assert fn._statics["fc_u8"] is True
    buf = np.asarray(fn(x))
    t = x.shape[1]
    raw = he.unpack_host_buffer(buf, fn._spec_cache[t])
    assert "fc_res" in raw and "fc_sums" not in raw
    keys = np.asarray(raw["exc_key"])
    aid = np.where(keys != he._EXC_KEY_SENTINEL, keys >> he._EXC_AID_SHIFT, 99)
    assert (aid == 2).any(), "expected fc exceptions"
    out = fn.unpack(buf)
    fc = np.asarray(out["fc_sums"], np.float64)
    fc[fn._statics["fc_split_code"]] = np.asarray(
        out["fc_split_col"], np.float64
    )
    want = _sort_oracle(layout, info, x)
    np.testing.assert_array_equal(fc[..., :t], want["fc_sums"])
    np.testing.assert_array_equal(
        np.asarray(out["U2"], np.float64)[..., :t], want["U2"]
    )


def test_ksplit_runner_engages_fc_u8_from_sampling():
    from illico_tpu.models.wilcoxon import WilcoxonRunner
    from illico_tpu.utils.registry import data_handler_registry

    x, info, layout = _ksplit_problem(seed=21)
    r = WilcoxonRunner(
        data_handler_registry.get(x), info, is_log1p=False, engine="hist"
    )
    assert r.tile_fn._statics["fc_u8"] is True
    # high-expression data: the hint must keep the 2-byte tier
    x2 = x * 40.0
    x2[x2 > 500] = 500.0
    r2 = WilcoxonRunner(
        data_handler_registry.get(np.ascontiguousarray(x2)), info,
        is_log1p=False, engine="hist",
    )
    assert r2.tile_fn._statics["fc_u8"] is False
