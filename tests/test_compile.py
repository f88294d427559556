"""Precompile / no-retrace contract.

JAX analog of the reference's compilation test
(``/root/reference/tests/utils/test_compile.py:19-28``): after
``WilcoxonRunner.precompile()``, running the stream must add **zero** new
jit traces — the declared (shape, dtype, statics) signature exactly matches
runtime.
"""

import numpy as np
import pandas as pd

from illico_tpu.io.h5ad import AnnDataLite
from illico_tpu.models.wilcoxon import WilcoxonRunner
from illico_tpu.ops.rank_engine import _jitted_rank_stats
from illico_tpu.utils.groups import encode_and_count_groups
from illico_tpu.utils.registry import data_handler_registry


def _runner(n=500, t=40, g=4, ref=None):
    rng = np.random.RandomState(0)
    X = rng.poisson(2.0, (n, t)).astype(np.float32)
    labels = np.array([f"g{v}" for v in rng.randint(0, g, n)])
    handler = data_handler_registry.get(X)
    _, info = encode_and_count_groups(labels, ref)
    return WilcoxonRunner(handler, info, is_log1p=False, batch_size=16)


def test_precompile_no_retrace():
    runner = _runner()
    runner.precompile()
    traces_before = _jitted_rank_stats._cache_size()
    runner.run(progress=False)
    assert _jitted_rank_stats._cache_size() == traces_before


def test_run_without_precompile_works():
    runner = _runner(ref="g0")
    res = runner.run(progress=False)
    assert np.isfinite(res.pvalues[1:]).all()
    assert res.statistics.shape == (4, 40)
