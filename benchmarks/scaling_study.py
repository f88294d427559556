"""Device-compute scaling study: tile width, group count, cell count.

The reference publishes a 1/2/4/8-thread scaling table
(``/root/reference/README.md:137-147``).  Multi-chip hardware is not
available in this environment, so the measurable scaling axes are the
per-device ones: how device compute scales with tile width (columns per
dispatch), group count, and cell count, for both engines.  This
substantiates the "device compute is a small, linearly-scaling slice of
the pipeline" claim with data (VERDICT round-1 item 6).

Methodology: the engine tile functions are invoked on HBM-resident data
and forced with a device-side scalar reduction fetched via ``device_get``
(8 bytes) — the development tunnel's bandwidth therefore does not
contaminate the measurement (``jax.block_until_ready`` does not block on
this backend; a scalar pull is the cheapest true fence).  min-of-N over
``--runs`` repetitions per point; executables ride the persistent compile
cache.

Usage:  python benchmarks/scaling_study.py [--quick] [--runs N] [--out PATH]
"""

import argparse
import json
import platform
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE = dict(n_cells=50_000, n_groups=100, width=512)

SWEEPS = {
    "width": [128, 256, 512, 1024, 2048],
    "n_groups": [50, 200, 1000, 5000],
    "n_cells": [12_500, 25_000, 50_000, 100_000, 200_000],
}

# --quick: small base so the mechanics can be smoke-tested on the
# single-core CPU backend in minutes.
QUICK_BASE = dict(n_cells=6_000, n_groups=20, width=128)

QUICK_SWEEPS = {
    "width": [128, 256],
    "n_groups": [20, 50],
    "n_cells": [6_000, 12_000],
}


def _make_problem(n_cells, n_groups, width, seed=0):
    """HBM-resident count tile + group layout (Poisson ~90% zeros, the
    headline bench's distribution)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(seed)
    x = rng.poisson(2.0, (n_cells, width)).astype(np.float32)
    x[rng.rand(n_cells, width) < 0.9] = 0
    labels = rng.randint(1, n_groups, n_cells)
    labels[rng.rand(n_cells) < 0.1] = 0
    from illico_tpu.utils.groups import encode_and_count_groups

    _, info = encode_and_count_groups(labels, 0)
    return jnp.asarray(x), info


def _measure_fence_s(runs):
    """min-of-N cost of the bare 8-byte forcing pull (tunnel latency).

    Subtracted from the timed samples: over the development tunnel a
    ``device_get`` costs a fixed ~150 ms round trip that would otherwise
    swamp small-compute points and flatten the scaling curves.
    """
    import jax
    import jax.numpy as jnp

    z = jnp.zeros(())
    float(jax.device_get(z))
    times = []
    for _ in range(max(runs, 3)):
        t0 = time.perf_counter()
        float(jax.device_get(z))
        times.append(time.perf_counter() - t0)
    return min(times)


def _time_device_compute(fn, x, runs, inner, fence_s):
    """min-of-N per-execution device time of ``fn(x)``.

    One jitted tree-sum reducer forces the output (eager per-leaf sums
    would issue one remote dispatch per array); ``inner`` executions are
    queued back-to-back and fenced once — device executions serialize in
    order, so (elapsed - fence) / inner amortizes both the pull latency
    and dispatch jitter across the batch.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def tree_sum(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    float(jax.device_get(tree_sum(fn(x))))  # compile + first touch
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        out = None
        for _k in range(inner):
            out = fn(x)
        float(jax.device_get(tree_sum(out)))
        times.append((time.perf_counter() - t0 - fence_s) / inner)
    return max(min(times), 1e-9)


def _point(n_cells, n_groups, width, engine, runs, inner, fence_s):
    import jax

    from illico_tpu.ops.rank_engine import build_padded_layout, make_tile_fn

    x, info = _make_problem(n_cells, n_groups, width)
    layout = build_padded_layout(info.perm, info.indptr)
    m_pad = None
    if engine == "hist":
        from illico_tpu.ops.hist_engine import make_hist_tile_fn

        fn = make_hist_tile_fn(
            layout, ref_code=info.ref_code, is_log1p=False,
            interpret=jax.default_backend() != "tpu",
        )
    elif engine == "csort":
        # Compact tier: measure the DEVICE side only — build the compacted
        # tile on host once, stage its arrays in HBM, and drive the jit
        # path with committed device arrays (no per-execution transfers).
        from illico_tpu.ops.csort_engine import (
            compact_from_entries,
            make_csort_tile_fn,
        )

        xh = np.asarray(jax.device_get(x))
        r, c = np.nonzero(xh)
        tile = compact_from_entries(
            xh[r, c], r, c, width, info.encoded_groups, info.n_groups,
        )
        m_pad = int(tile.vals.shape[0])
        csort_fn = make_csort_tile_fn(
            info, ref_code=info.ref_code, is_log1p=False
        )
        x = {
            "vals": jax.device_put(tile.vals),
            "grp": jax.device_put(tile.grp),
            "indptr": jax.device_put(tile.indptr),
        }

        def fn(t):
            return csort_fn(t)
    else:
        fn = make_tile_fn(layout, ref_code=info.ref_code, is_log1p=False)
    dt = _time_device_compute(fn, x, runs, inner, fence_s)
    n_tests = (info.n_groups - 1) * width
    rec = {
        "engine": engine,
        "n_cells": n_cells,
        "n_groups": n_groups,
        "width": width,
        "device_s": round(dt, 5),
        "tests_per_s": round(n_tests / dt, 1),
    }
    if m_pad is not None:
        rec["m_pad"] = m_pad  # compacted rows actually sorted (~10% of n)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--engines", default="hist,sort,csort",
        help="comma-separated subset of hist,sort,csort",
    )
    ap.add_argument(
        "--cpu", action="store_true",
        help="force the CPU backend (smoke testing; the sitecustomize "
        "in this environment force-registers the TPU platform)",
    )
    ap.add_argument(
        "--inner", type=int, default=None,
        help="executions queued per timed sample (default: 4 on TPU to "
        "amortize the tunnel fence, 1 on CPU)",
    )
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import illico_tpu
    from illico_tpu import enable_compilation_cache

    enable_compilation_cache()
    engines = [e for e in args.engines.split(",") if e]
    sweeps = QUICK_SWEEPS if args.quick else SWEEPS
    base = QUICK_BASE if args.quick else BASE
    inner = args.inner or (4 if jax.default_backend() == "tpu" else 1)
    fence_s = _measure_fence_s(args.runs)
    print(f"# fence_s={fence_s:.4f} inner={inner}", file=sys.stderr)

    payload = {
        "version": illico_tpu.__version__,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "python": platform.python_version(),
        "base": base,
        "note": (
            "device-compute only (jitted tree-sum force, one 8-byte pull "
            "per sample, measured fence latency subtracted, %d executions "
            "amortized per sample); OVO vs group 0; min-of-%d"
            % (inner, args.runs)
        ),
        "fence_s": round(fence_s, 5),
        "inner": inner,
        "complete": False,
        "results": [],
    }
    out = Path(args.out or (
        Path(__file__).resolve().parent.parent
        / ".benchmarks"
        / f"scaling_{jax.default_backend()}_{illico_tpu.__version__}.json"
    ))
    out.parent.mkdir(parents=True, exist_ok=True)

    def _save():
        # Rewrite after every point: a timeout (remote compiles can eat a
        # bounded stage budget) keeps the points already measured.
        tmp = out.with_suffix(".tmp")
        tmp.write_text(json.dumps(payload, indent=2))
        tmp.replace(out)

    for axis, values in sweeps.items():
        for v in values:
            cfg = dict(base)
            cfg[axis] = v
            for engine in engines:
                rec = _point(
                    cfg["n_cells"], cfg["n_groups"], cfg["width"],
                    engine, args.runs, inner, fence_s,
                )
                rec["axis"] = axis
                payload["results"].append(rec)
                print(json.dumps(rec), flush=True)
                _save()
    payload["complete"] = True
    _save()
    print(f"# saved {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
