"""Seeded fuzz sweep: random shapes/groups/densities/dtypes vs scipy.

The deterministic fixtures cover the designed cases; this sweep guards the
edges (tiny groups, skewed group sizes, integer input dtypes, dense and
sparse, high counts) with the same exactness contract.
"""

import os

import numpy as np
import pytest
from scipy import sparse, stats

from illico_tpu import asymptotic_wilcoxon_arrays

CASES = [
    # (seed, n_cells, n_genes, n_groups, density, lam, dtype, fmt)
    (0, 500, 7, 3, 0.4, 2.0, np.float32, "dense"),
    (1, 1200, 33, 5, 0.1, 1.0, np.int32, "dense"),
    (2, 800, 17, 4, 0.7, 5.0, np.uint8, "csr"),
    (3, 2000, 5, 8, 0.2, 3.0, np.int16, "csc"),
    (4, 300, 64, 2, 0.5, 150.0, np.float32, "dense"),  # counts > 128
    (5, 1500, 9, 6, 0.05, 0.5, np.float64, "dense"),   # f64 -> sort engine
    (6, 900, 21, 4, 0.3, 2.0, np.int8, "dense"),       # 1-byte narrow wire
    (7, 700, 13, 3, 0.6, 60.0, np.float16, "dense"),   # f16 narrow wire
]


@pytest.mark.parametrize("case", CASES, ids=[f"case{c[0]}" for c in CASES])
@pytest.mark.parametrize("mode", ["ovo", "ovr"])
def test_fuzz_scipy_parity(case, mode):
    seed, n, t, g, density, lam, dtype, fmt = case
    rng = np.random.RandomState(seed)
    x = rng.poisson(lam, (n, t)).astype(np.float64)
    x[rng.rand(n, t) >= density] = 0
    x = x.astype(dtype)
    labels = rng.randint(0, g, n)
    labels[:g] = np.arange(g)  # every group non-empty
    groups = np.array([f"g{v}" for v in labels])

    X = {
        "dense": lambda: x,
        "csr": lambda: sparse.csr_matrix(x),
        "csc": lambda: sparse.csc_matrix(x),
    }[fmt]()

    ref = "g0" if mode == "ovo" else None
    df = asymptotic_wilcoxon_arrays(X, groups, reference=ref, progress=False)

    xd = x.astype(np.float64)
    check = [(gr, j) for gr in (f"g{g-1}", "g1") for j in (0, t // 2, t - 1)]
    for gr, j in check:
        if mode == "ovo" and gr == "g0":
            continue
        tgt = groups == gr
        refm = groups == "g0" if mode == "ovo" else ~tgt
        r = stats.mannwhitneyu(
            xd[refm, j], xd[tgt, j],
            alternative="two-sided", method="asymptotic",
        )
        got = df.loc[(gr, f"gene_{j}")]
        assert got["statistic"] == r.statistic, (seed, mode, gr, j)
        assert abs(got["p_value"] - r.pvalue) <= 1e-12 * r.pvalue, (
            seed, mode, gr, j, got["p_value"], r.pvalue,
        )


@pytest.mark.skipif(
    not os.environ.get("ILLICO_TPU_SOAK"),
    reason="opt-in soak: ILLICO_TPU_SOAK=<trials> (optionally "
    "ILLICO_TPU_SOAK_SEED=<base>) python -m pytest -k fuzz_soak",
)
def test_fuzz_soak():
    """Open-ended randomized soak of the full exactness contract.

    Every trial draws shape, group count, density, count scale, dtype,
    storage format, test mode, engine, alternative and the
    continuity/tie toggles at random and checks U (exact), p (scipy or
    the no-tie oracle, rtol 1e-12) and fold change (rtol 1e-6) on a
    sample of (group, gene) cells.  Constant columns assert the
    degenerate-sigma guard (p = 1.0, reference ``math.py:96,117``)
    instead of comparing against scipy's 0/0.

    Deterministic per seed: a failure message carries the trial seed, and
    re-running with ILLICO_TPU_SOAK=1 ILLICO_TPU_SOAK_SEED=<seed>
    reproduces that exact trial.
    """
    from test_asymptotic_wilcoxon import _no_tie_pvalues

    import jax as _jax

    ndev = len(_jax.devices())  # invariant for the process
    trials = int(os.environ["ILLICO_TPU_SOAK"])
    seed0 = int(os.environ.get("ILLICO_TPU_SOAK_SEED", "0"))
    for trial in range(trials):
        seed = seed0 + trial
        rng = np.random.RandomState(seed)
        n = int(rng.randint(40, 3000))
        t = int(rng.randint(1, 50))
        g = int(rng.randint(2, min(10, max(3, n // 8))))
        density = float(rng.uniform(0.02, 0.95))
        lam = float(rng.choice([0.3, 1.0, 2.0, 5.0, 40.0, 200.0, 1500.0]))
        # int8/uint8/int16/uint16/float16 additionally exercise the narrow
        # host->device wire (storage-dtype staging + on-device f32 cast).
        # Out-of-range casts (e.g. lam=1500 into uint8) wrap, but both the
        # engine and the scipy oracle see the same post-cast values.
        dtype = rng.choice([np.float32, np.float64, np.int32, np.uint8,
                            np.int16, np.int8, np.uint16, np.float16])
        fmt = str(rng.choice(["dense", "csr", "csc", "device",
                              "h5-dense", "h5-csc"]))
        if dtype == np.float16 and fmt in ("csr", "csc", "h5-csc"):
            fmt = "dense"  # scipy.sparse has no float16 support
        mode = str(rng.choice(["ovo", "ovr"]))
        alternative = str(rng.choice(["two-sided", "less", "greater"]))
        use_continuity = bool(rng.randint(2))
        tie_correct = bool(rng.randint(2))
        is_log1p = bool(rng.randint(4) == 0)
        eng_opts = (
            ["auto", "sort"]
            if dtype == np.float64 or is_log1p
            else ["auto", "hist", "sort"]
        )
        if fmt != "device":
            # the compact tier is host-resident-only; forcing it on dense
            # high-density draws is deliberate (slower, still exact)
            eng_opts.append("csort")
        engine = str(rng.choice(eng_opts))
        # ~1/4 of trials shard over a mesh (when the backend has the
        # devices): 1-D gene meshes for any engine, 2-D cells x genes
        # meshes only for combos that resolve to the histogram engine
        # (the runner rejects cell sharding for the sort engine by
        # design).  On a 1-device backend (the real TPU suite) this
        # draw is inert.
        # Both draws consumed unconditionally: the RNG stream (and thus
        # every later draw of the trial) is identical on 1- and N-device
        # backends, so a seed reproduces the same trial everywhere.
        want_mesh = rng.randint(4) == 0
        mesh_pick = int(rng.randint(4))
        devices = None
        if want_mesh and ndev >= 2 and engine != "csort":
            opts: list = [2, ndev]
            # 2-D (cell-sharded) only when the engine is known to resolve
            # to hist: under "auto", wrapped-negative casts (e.g. lam=1500
            # into int8) fail the integrality probe and route to sort,
            # which rejects cell sharding by design.
            if ndev >= 4 and engine == "hist":
                opts += [(2, 2), (2, ndev // 2)]
            # mesh_pick is drawn from randint(4); the modulo is uniform
            # only while len(opts) divides 4 (it is 2 or 4).  If opts ever
            # grows an entry, redraw as rng.randint(len(opts)) instead of
            # silently biasing toward early entries.
            assert 4 % len(opts) == 0
            devices = opts[mesh_pick % len(opts)]
        case = (seed, n, t, g, round(density, 3), lam, np.dtype(dtype).name,
                fmt, mode, engine, alternative, use_continuity, tie_correct,
                is_log1p, devices)
        if os.environ.get("ILLICO_TPU_SOAK_VERBOSE"):
            # Unbuffered trial marker (run with -s): a hard crash (e.g. a
            # compiler segfault) identifies its seed as the last line.
            import sys

            print(f"# trial {case}", file=sys.__stderr__, flush=True)

        x = rng.poisson(lam, (n, t)).astype(np.float64)
        x[rng.rand(n, t) >= density] = 0
        if is_log1p:
            x = np.log1p(x).astype(np.float32)
        else:
            x = x.astype(dtype)
        labels = rng.randint(0, g, n)
        if rng.randint(3) == 0 and mode == "ovo" and g >= 3:
            # Perturbation-screen population: a dominant control and
            # small perturbation groups — the regime that engages the
            # nnz-split OVO wire (every non-ref group < 256 cells needs
            # n/g small enough; the skew pushes the tie tier into
            # u40/f48 territory where the split is live).
            labels[rng.rand(n) < 0.7] = 0
        labels[:g] = np.arange(g)
        groups = np.array([f"g{v}" for v in labels])

        ref = "g0" if mode == "ovo" else None
        kw = dict(
            reference=ref, is_log1p=is_log1p, engine=engine,
            alternative=alternative, use_continuity=use_continuity,
            tie_correct=tie_correct, progress=False, devices=devices,
        )
        if fmt.startswith("h5-"):
            # Streaming path: h5ad round trip read back in backed mode.
            import tempfile

            import pandas as pd

            from illico_tpu import asymptotic_wilcoxon
            from illico_tpu.io.h5ad import AnnDataLite, read_h5ad

            Xw = x if fmt == "h5-dense" else sparse.csc_matrix(x)
            ad = AnnDataLite(
                Xw,
                obs=pd.DataFrame({"grp": groups}),
                var=pd.DataFrame(index=[f"gene_{j}" for j in range(t)]),
            )
            with tempfile.TemporaryDirectory() as td:
                ad.write_h5ad(td + "/t.h5ad")
                backed = read_h5ad(td + "/t.h5ad", backed="r")
                df = asymptotic_wilcoxon(backed, group_keys="grp", **kw)
        else:
            if fmt == "device":
                import jax.numpy as jnp

                X = jnp.asarray(x)
            else:
                X = {"dense": lambda: x,
                     "csr": lambda: sparse.csr_matrix(x),
                     "csc": lambda: sparse.csc_matrix(x)}[fmt]()
            df = asymptotic_wilcoxon_arrays(X, groups, **kw)

        xd = np.expm1(x.astype(np.float64)) if is_log1p else x.astype(np.float64)
        check_groups = {f"g{g - 1}", "g1"} - ({"g0"} if mode == "ovo" else set())
        for gr in sorted(check_groups):
            tgt = groups == gr
            refm = groups == "g0" if mode == "ovo" else ~tgt
            for j in sorted({0, int(rng.randint(t)), t - 1}):
                a, b = xd[refm, j], xd[tgt, j]
                got = df.loc[(gr, f"gene_{j}")]
                mu_ref = a.mean()
                want_fc = np.inf if mu_ref == 0 else b.mean() / mu_ref
                if np.isfinite(want_fc):
                    np.testing.assert_allclose(
                        got["fold_change"], want_fc, rtol=1e-6, atol=0,
                        err_msg=f"fc {case} {gr} {j}")
                else:
                    assert got["fold_change"] == want_fc, ("fc", case, gr, j)
                combined = np.concatenate([a, b])
                if (combined == combined[0]).all():
                    # Degenerate column: scipy divides by sigma = 0.  With
                    # tie correction the guard pins p = 1.0 (reference
                    # math.py:96,117); without it sigma stays positive and
                    # the no-tie oracle applies at U = n1*n2/2 exactly.
                    u_deg = a.size * b.size / 2.0
                    assert got["statistic"] == u_deg, ("U-deg", case, gr, j)
                    if tie_correct:
                        assert got["p_value"] == 1.0, ("deg", case, gr, j)
                    else:
                        want_p = float(_no_tie_pvalues(
                            np.asarray([u_deg]), a.size, b.size,
                            use_continuity, alternative)[0])
                        assert abs(got["p_value"] - want_p) <= 1e-12 * want_p, (
                            "deg-p", case, gr, j, got["p_value"], want_p,
                        )
                    continue
                r = stats.mannwhitneyu(
                    a, b, alternative=alternative, method="asymptotic",
                    use_continuity=use_continuity,
                )
                assert got["statistic"] == r.statistic, ("U", case, gr, j)
                want_p = (
                    r.pvalue if tie_correct else float(_no_tie_pvalues(
                        np.asarray([r.statistic]), a.size, b.size,
                        use_continuity, alternative)[0])
                )
                assert abs(got["p_value"] - want_p) <= 1e-12 * want_p, (
                    "p", case, gr, j, got["p_value"], want_p,
                )

        if (trial + 1) % 100 == 0:
            # Every trial draws a fresh shape, so compiled executables
            # accumulate in-process without bound (production bounds shape
            # count via pow2 tile bucketing; this soak is the pathological
            # many-shapes client).  Observed: the XLA CPU backend segfaults
            # inside backend_compile_and_load after ~630 accumulated
            # compilations in one process (jax 0.9.0, reproducible at the
            # same trial across runs, innocent in a fresh process).  Clear
            # the jit caches AND the engines' process-wide AOT caches
            # periodically to bound compiler state.
            import jax

            from illico_tpu.ops import hist_engine, rank_engine
            from illico_tpu.parallel import cells, mesh

            hist_engine._AOT_CACHE.clear()
            rank_engine._AOT_CACHE.clear()
            cells._AOT_CACHE.clear()
            mesh._AOT_CACHE.clear()
            jax.clear_caches()
