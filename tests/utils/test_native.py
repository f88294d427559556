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
