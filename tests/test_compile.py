"""Precompile / no-retrace contract.

JAX analog of the reference's compilation test
(``/root/reference/tests/utils/test_compile.py:19-28``): after
``WilcoxonRunner.precompile()``, running the stream must add **zero** new
jit traces on the engine the runner actually selected — the declared
(shape, dtype, statics) signature exactly matches runtime — and every tile
must dispatch through the AOT executable, never the jit fallback.
"""

import numpy as np
import pandas as pd

from illico_tpu.io.h5ad import AnnDataLite
from illico_tpu.models.wilcoxon import WilcoxonRunner
from illico_tpu.ops.hist_engine import _jitted_hist_contract, _jitted_hist_pass
from illico_tpu.ops.rank_engine import _jitted_rank_stats
from illico_tpu.utils.groups import encode_and_count_groups
from illico_tpu.utils.registry import data_handler_registry


def _runner(n=500, t=40, g=4, ref=None, engine="auto"):
    rng = np.random.RandomState(0)
    X = rng.poisson(2.0, (n, t)).astype(np.float32)
    labels = np.array([f"g{v}" for v in rng.randint(0, g, n)])
    handler = data_handler_registry.get(X)
    _, info = encode_and_count_groups(labels, ref)
    return WilcoxonRunner(
        handler, info, is_log1p=False, batch_size=16, engine=engine
    )


def _cache_sizes():
    return {
        "hist_pass": _jitted_hist_pass._cache_size(),
        "hist_contract": _jitted_hist_contract._cache_size(),
        "rank_stats": _jitted_rank_stats._cache_size(),
    }


def test_precompile_no_retrace_hist_engine():
    runner = _runner()
    assert runner.engine == "hist"  # guard: the engine under test
    runner.precompile()
    before = _cache_sizes()
    runner.run(progress=False)
    # Zero new traces on EITHER engine's process-wide jit cache: the AOT
    # executables serve every tile, and nothing fell through to jit.
    assert _cache_sizes() == before
    n_tiles = len(runner.bounds)
    assert runner.tile_fn._counters == {"aot": n_tiles, "jit": 0}


def test_precompile_no_retrace_sort_engine():
    runner = _runner(engine="sort")
    assert runner.engine == "sort"
    runner.precompile()
    before = _cache_sizes()
    runner.run(progress=False)
    assert _cache_sizes() == before
    n_tiles = len(runner.bounds)
    assert runner.tile_fn._counters == {"aot": n_tiles, "jit": 0}


def test_run_without_precompile_uses_jit_path():
    runner = _runner(ref="g0")
    res = runner.run(progress=False)
    assert np.isfinite(res.pvalues[1:]).all()
    assert res.statistics.shape == (4, 40)
    n_tiles = len(runner.bounds)
    assert runner.tile_fn._counters == {"aot": 0, "jit": n_tiles}
