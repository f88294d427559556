"""Native (C++) host kernels vs the pure-numpy reference path.

The fused tile consumer (``native/_tail.cpp:illico_consume_tile``) replaces
the numpy consume path (dtype casts, tie broadcast, p tail, fold change) with
one C pass; this asserts both produce the same DataFrame.  Formula order
mirrors the reference ``compute_pval``
(``/root/reference/illico/utils/math.py:64-118``).
"""

import numpy as np
import pytest

import illico_tpu.native as native
from illico_tpu import asymptotic_wilcoxon_arrays


def _problem(seed=3, n=4000, t=96, g=6):
    rng = np.random.RandomState(seed)
    X = rng.poisson(2.0, (n, t)).astype(np.float32)
    X[rng.rand(n, t) < 0.5] = 0
    groups = np.array([f"p{v}" for v in rng.randint(0, g, n)])
    return X, groups


@pytest.mark.parametrize("reference", ["p0", None], ids=["ovo", "ovr"])
@pytest.mark.parametrize("alternative", ["two-sided", "greater", "less"])
def test_native_consume_matches_numpy(reference, alternative, monkeypatch):
    if not native.native_available():
        pytest.skip("no C++ toolchain for the native tail")
    X, groups = _problem()
    kw = dict(
        reference=reference, alternative=alternative, progress=False,
    )
    df_native = asymptotic_wilcoxon_arrays(X, groups, **kw)

    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", True)
    df_numpy = asymptotic_wilcoxon_arrays(X, groups, **kw)

    # U and fold change: identical float64 operation order => bit-exact.
    np.testing.assert_array_equal(
        df_native["statistic"].to_numpy(), df_numpy["statistic"].to_numpy()
    )
    np.testing.assert_array_equal(
        df_native["fold_change"].to_numpy(), df_numpy["fold_change"].to_numpy()
    )
    # p: libm erfc (native) vs cephes erfc (scipy fallback) differ in ulps.
    np.testing.assert_allclose(
        df_native["p_value"].to_numpy(), df_numpy["p_value"].to_numpy(),
        rtol=1e-12, atol=0.0,
    )


def test_native_consume_tie_toggles(monkeypatch):
    if not native.native_available():
        pytest.skip("no C++ toolchain for the native tail")
    X, groups = _problem(seed=9, t=64)
    for kw in (
        dict(use_continuity=False),
        dict(tie_correct=False),
        dict(use_continuity=False, tie_correct=False),
    ):
        a = asymptotic_wilcoxon_arrays(
            X, groups, reference="p1", progress=False, **kw
        )
        monkeypatch.setattr(native, "_LIB", None)
        monkeypatch.setattr(native, "_TRIED", True)
        b = asymptotic_wilcoxon_arrays(
            X, groups, reference="p1", progress=False, **kw
        )
        monkeypatch.undo()
        np.testing.assert_array_equal(
            a["statistic"].to_numpy(), b["statistic"].to_numpy()
        )
        np.testing.assert_allclose(
            a["p_value"].to_numpy(), b["p_value"].to_numpy(),
            rtol=1e-12, atol=0.0,
        )


def test_broken_cached_so_is_rebuilt(tmp_path, monkeypatch):
    """The .so cache is keyed on the SOURCE hash only, so a cached build can
    carry a runtime dependency this environment cannot satisfy (e.g. an
    OpenMP build reused where libgomp is missing).  A dlopen failure must
    drop the cached file and rebuild, not silently disable the native
    fast path.  The rebuild caches under a DISTINCT ``_plain`` name: writing
    it to the canonical path would permanently downgrade every other
    environment sharing the cache to the no-OpenMP build."""
    if not native.native_available():
        pytest.skip("no C++ toolchain for the native tail")
    import hashlib

    monkeypatch.setenv("ILLICO_TPU_CACHE", str(tmp_path))
    tag = hashlib.sha256(native._SRC.read_bytes()).hexdigest()[:16]
    broken = tmp_path / f"illico_tail_{tag}.so"
    broken.write_bytes(b"\x7fNOT-AN-ELF-OBJECT")
    monkeypatch.setattr(native, "_LIB", None)
    monkeypatch.setattr(native, "_TRIED", False)
    lib = native._load()
    assert lib is not None, "broken cached .so was not rebuilt"
    assert hasattr(lib, "illico_consume_tile")
    # canonical path dropped (a healthy process will rebuild it with
    # OpenMP); the fallback lives under its own name
    assert not broken.exists()
    plain = tmp_path / f"illico_tail_{tag}_plain.so"
    assert plain.read_bytes()[:4] == b"\x7fELF"


@pytest.mark.parametrize("engine", ["hist", "sort"])
@pytest.mark.parametrize("reference", ["p0", None], ids=["ovo", "ovr"])
def test_native_consume_threaded_is_bit_exact(reference, engine, monkeypatch):
    """ILLICO_TPU_TAIL_THREADS parallelizes the per-group native loops
    (packed consume for hist, p-value tail for sort); group rows are
    independent, so any thread count must be bit-identical to the serial
    result (no reductions cross thread boundaries)."""
    if not native.native_available():
        pytest.skip("no C++ toolchain for the native tail")
    X, groups = _problem(seed=5)
    kw = dict(reference=reference, engine=engine, progress=False)
    df_serial = asymptotic_wilcoxon_arrays(X, groups, **kw)
    monkeypatch.setenv("ILLICO_TPU_TAIL_THREADS", "4")
    df_threaded = asymptotic_wilcoxon_arrays(X, groups, **kw)
    for col in ("statistic", "p_value", "fold_change"):
        np.testing.assert_array_equal(
            df_serial[col].to_numpy(), df_threaded[col].to_numpy()
        )


def _spec_dict(spec):
    return {k: (shape, dtype, off, nbytes) for k, shape, dtype, off, nbytes in spec}


def test_native_decode_at_split_word_boundaries_ovo():
    """The C++ consumer decodes the split-word wire tiers (uint24, u40,
    hi/lo float64) straight from the packed buffer; the numpy decoder
    (``unpack_host_buffer``) is boundary-tested separately, but the native
    ``decode()`` was only exercised on hardware with realistic values.
    Feed a crafted buffer whose statistics sit exactly at the split
    boundaries (low word 2^32-1 — the mis-rounding trap of
    ``_split_hi_lo_words`` — and each tier's maximum) and assert the
    native consume reproduces ground truth computed from the original
    float64 values."""
    if not native.native_available():
        pytest.skip("no C++ toolchain for the native tail")
    import jax.numpy as jnp

    from illico_tpu.native import consume_tile_native
    from illico_tpu.ops import hist_engine as he
    from illico_tpu.stats import fold_change_from_summed_expr, pvalues_from_stats

    G, T = 3, 4
    counts = np.array([1000.0, 700.0, 500.0])
    ref_code = 0
    u2 = np.array([
        [0, 2, 4, 6],
        [2**24 - 1, 2**24 - 2, 2**16, 2],
        [1, 3, 2**24 - 1, 0],
    ], np.float64)
    tie_seg = np.array([
        [0, 2**40 - 1, 2**32 - 1, 2**32],
        [2**32 - 1, 0, 12345, 2**40 - 1],
        [2**33, 2**40 - 2, 1, 2**32 + 1],
    ], np.float64)
    tie_ref_col = np.array([2.0**52 - 1, 2.0**32 - 1, 0.0, 7.0])
    fc_sums = np.array([
        [65535, 0, 1, 2],
        [3, 65535, 4, 5],
        [6, 7, 65534, 8],
    ], np.float64)
    out = {
        "U2": jnp.asarray(u2, jnp.uint32),
        "tie_seg": jnp.asarray(tie_seg, jnp.float64),
        "tie_ref_col": jnp.asarray(tie_ref_col, jnp.float64),
        "fc_sums": jnp.asarray(fc_sums, jnp.uint16),
        "overflow_cols": jnp.zeros(T, jnp.bool_),
    }
    buf, spec = he.pack_device_outputs(out, {"U2": 3, "tie_seg": 5})
    buf = np.ascontiguousarray(np.asarray(buf))

    results = np.full((G, T, 3), np.nan)
    ok = consume_tile_native(
        buf, _spec_dict(spec), counts, ref_code, T,
        "two-sided", True, True, results, 0,
    )
    assert ok, "native consume unavailable for the crafted spec"

    n_ref = counts[ref_code]
    n_tgt = counts[:, None]
    U = n_ref * n_tgt - u2 / 2.0
    tie = tie_ref_col[None] + tie_seg
    p = pvalues_from_stats(
        U, tie, np.full((G, 1), n_ref), n_tgt,
        use_continuity=True, tie_correct=True, alternative="two-sided",
    )
    fc = fold_change_from_summed_expr(fc_sums, counts, ref_code)
    np.testing.assert_array_equal(results[..., 1], U)
    np.testing.assert_array_equal(results[..., 2], fc)
    np.testing.assert_allclose(results[..., 0], p, rtol=1e-12, atol=0.0)


def test_native_decode_at_split_word_boundaries_ovr():
    """OVR variant: int32 R2 bulk + hi/lo float64 split row
    (``r2_split_col``) + uint32 ``fc_split_col`` + hi/lo ``tie_col``,
    all at their boundary values."""
    if not native.native_available():
        pytest.skip("no C++ toolchain for the native tail")
    import jax.numpy as jnp

    from illico_tpu.native import consume_tile_native
    from illico_tpu.ops import hist_engine as he
    from illico_tpu.stats import fold_change_from_summed_expr, pvalues_from_stats

    G, T = 3, 4
    counts = np.array([200.0, 5000.0, 300.0])
    u2_split, fc_split = 1, 1  # the dominant group's rows travel separately
    r2 = np.array([
        [2**31 - 1, 2**31 - 2, 0, 2],
        [0, 0, 0, 0],  # split row zeroed on device
        [4, 2**30, 6, 2**31 - 1],
    ], np.float64)
    r2_split_col = np.array([2.0**52 - 1, 2.0**32 - 1, 2.0**32, 123456789.0])
    fc_sums = np.array([
        [65535, 1, 2, 3],
        [0, 0, 0, 0],  # split row zeroed on device
        [4, 5, 65534, 6],
    ], np.float64)
    fc_split_col = np.array([2**32 - 1, 2**24, 0, 7], np.float64)
    tie_col = np.array([2.0**52 - 1, 2.0**32 - 1, 0.0, 2.0**33])
    out = {
        "R2": jnp.asarray(r2, jnp.int32),
        "r2_split_col": jnp.asarray(r2_split_col, jnp.float64),
        "fc_sums": jnp.asarray(fc_sums, jnp.uint16),
        "fc_split_col": jnp.asarray(fc_split_col, jnp.uint32),
        "tie_col": jnp.asarray(tie_col, jnp.float64),
        "overflow_cols": jnp.zeros(T, jnp.bool_),
    }
    buf, spec = he.pack_device_outputs(out)
    buf = np.ascontiguousarray(np.asarray(buf))

    results = np.full((G, T, 3), np.nan)
    ok = consume_tile_native(
        buf, _spec_dict(spec), counts, -1, T,
        "two-sided", True, True, results, 0,
        fc_split_code=fc_split, u2_split_code=u2_split,
    )
    assert ok, "native consume unavailable for the crafted spec"

    r2_full = r2.copy()
    r2_full[u2_split] = r2_split_col
    fc_full = fc_sums.copy()
    fc_full[fc_split] = fc_split_col
    n_total = counts.sum()
    n_tgt = counts[:, None]
    n_ref = n_total - n_tgt
    U = n_ref * n_tgt + n_tgt * (n_tgt + 1.0) / 2.0 - r2_full / 2.0
    tie = np.broadcast_to(tie_col[None], (G, T))
    p = pvalues_from_stats(
        U, tie, n_ref, n_tgt,
        use_continuity=True, tie_correct=True, alternative="two-sided",
    )
    fc = fold_change_from_summed_expr(fc_full, counts, -1)
    np.testing.assert_array_equal(results[..., 1], U)
    np.testing.assert_array_equal(results[..., 2], fc)
    np.testing.assert_allclose(results[..., 0], p, rtol=1e-12, atol=0.0)


def test_native_decode_f96_tier_ovo():
    """The f96 (mantissa/exponent triple-word) tier carries tie statistics
    past the int64 word split's 2**63 bound and signed non-integer fc
    sums.  Round-4 regression: the native encoder silently mapped unknown
    12-byte float64 blocks to the hi/lo decode, corrupting every tie
    statistic of >2**21-cell datasets — caught on hardware by a 4M-cell
    probe.  Drive the C++ decode with values straddling 2**63, full
    53-bit mantissas, fractions and signs, against the same ground truth
    as the numpy path."""
    if not native.native_available():
        pytest.skip("no C++ toolchain for the native tail")
    import jax
    import jax.numpy as jnp

    from illico_tpu.native import consume_tile_native
    from illico_tpu.ops import hist_engine as he
    from illico_tpu.stats import fold_change_from_summed_expr, pvalues_from_stats

    G, T = 3, 4
    counts = np.array([3_000_000.0, 900_000.0, 600_000.0])
    ref_code = 0
    u2 = np.array([
        [0, 2, 4, 6],
        [2**24 - 1, 2**24 - 2, 2**16, 2],
        [1, 3, 2**24 - 1, 0],
    ], np.float64)
    n4m = 4_194_304.0
    tie_seg = np.array([
        [0.0, 2.0**63, 2.0**63 + 2048.0, 2.0**66],
        [n4m**3 - n4m, 2.0**64 + 4096.0, 1.0, 2.0**70],
        [2.0**63 - 1.0, 12345.0, 2.0**52 + 1.0, 3.0],
    ], np.float64)
    tie_ref_col = np.array([2.0**64, 2.0**63 - 2.0, 0.0, 2.0**66 + 2.0**20])
    fc_sums = np.array([  # f96 also carries sign + fractions (csort fc)
        [65535.25, 0.0, -1.5, 1.0 / 3.0],
        [3.0, -65535.75, 123456789.123456789, 5.0],
        [6.5, 7.0, 2.0**53 - 1.0, -8.25],
    ], np.float64)
    out = {
        "U2": jnp.asarray(u2, jnp.uint32),
        "tie_seg": jnp.asarray(tie_seg, jnp.float64),
        "tie_ref_col": jnp.asarray(tie_ref_col, jnp.float64),
        "fc_sums": jnp.asarray(fc_sums, jnp.float64),
        "overflow_cols": jnp.zeros(T, jnp.bool_),
    }
    narrow = {"U2": 3, "tie_seg": 12, "tie_ref_col": 12, "fc_sums": 12}

    @jax.jit
    def ident(v):
        return v + 0.0

    with jax.enable_x64(True):
        buf, spec = he.pack_device_outputs(out, narrow)
        buf = np.ascontiguousarray(np.asarray(jax.device_get(buf)))
        # Faithfulness is to the DEVICE's value: TPU's x64 emulation stores
        # float64 as a float32 pair, so non-dyadic fractions round before
        # the wire sees them (equal to the originals on real-f64 backends).
        tie_seg = np.asarray(jax.device_get(ident(jnp.asarray(tie_seg))))
        tie_ref_col = np.asarray(
            jax.device_get(ident(jnp.asarray(tie_ref_col)))
        )
        fc_sums = np.asarray(jax.device_get(ident(jnp.asarray(fc_sums))))

    # numpy decode is the reference for the wire itself
    got = he.unpack_host_buffer(buf, spec)
    np.testing.assert_array_equal(got["tie_seg"], tie_seg)
    np.testing.assert_array_equal(got["fc_sums"], fc_sums)
    np.testing.assert_array_equal(got["tie_ref_col"], tie_ref_col)

    results = np.full((G, T, 3), np.nan)
    ok = consume_tile_native(
        buf, _spec_dict(spec), counts, ref_code, T,
        "two-sided", True, True, results, 0,
    )
    assert ok, "native consume unavailable for the crafted spec"

    n_ref = counts[ref_code]
    n_tgt = counts[:, None]
    U = n_ref * n_tgt - u2 / 2.0
    tie = tie_ref_col[None] + tie_seg
    p = pvalues_from_stats(
        U, tie, np.full((G, 1), n_ref), n_tgt,
        use_continuity=True, tie_correct=True, alternative="two-sided",
    )
    fc = fold_change_from_summed_expr(fc_sums, counts, ref_code)
    np.testing.assert_array_equal(results[..., 1], U)
    np.testing.assert_array_equal(results[..., 2], fc)
    np.testing.assert_allclose(results[..., 0], p, rtol=1e-12, atol=0.0)
