"""Narrow host->device input wire (round-2 VERDICT missing #3).

Integer-count / float16 inputs ship device-ward in their storage dtype
(2-4x fewer bytes than the old always-float32 staging) and are cast to
float32 on device — exact for integers below 2**24 and for every float16
value, so results must be bit-identical across input dtypes.  Reference
analog: sparse-native streaming touches only the stored bytes
(``/root/reference/illico/utils/sparse/csr.py:144-196``).
"""

import numpy as np
import pandas as pd
import pytest
from scipy import sparse

from illico_tpu import asymptotic_wilcoxon_arrays
from illico_tpu.models.wilcoxon import WilcoxonRunner
from illico_tpu.utils.groups import encode_and_count_groups
from illico_tpu.utils.registry import data_handler_registry


@pytest.fixture(scope="module")
def counts():
    rng = np.random.RandomState(3)
    n, t = 1200, 96
    x = rng.poisson(2.0, (n, t)).astype(np.int64)
    x[rng.rand(n, t) < 0.5] = 0
    x[4, 7] = 100  # exercise a value above the int8 midrange
    labels = np.array([f"p{v}" for v in rng.randint(0, 5, n)])
    return x, labels


NARROW = [np.int8, np.uint8, np.int16, np.uint16, np.float16]
WIDE = [np.int32, np.float32, np.float64]


@pytest.mark.parametrize("engine", ["hist", "sort"])
@pytest.mark.parametrize("reference", ["p0", None], ids=["ovo", "ovr"])
def test_dtype_parity_dense(counts, engine, reference):
    x, labels = counts
    kw = dict(
        reference=reference, engine=engine, progress=False, is_log1p=False
    )
    want = asymptotic_wilcoxon_arrays(x.astype(np.float32), labels, **kw)
    for dt in NARROW + WIDE:
        if engine == "hist" and dt == np.float64:
            continue  # forced hist rejects float64 by contract
        got = asymptotic_wilcoxon_arrays(x.astype(dt), labels, **kw)
        pd.testing.assert_frame_equal(got, want)


def test_dtype_parity_sparse(counts):
    x, labels = counts
    kw = dict(reference="p0", progress=False, is_log1p=False)
    want = asymptotic_wilcoxon_arrays(
        sparse.csr_matrix(x.astype(np.float32)), labels, **kw
    )
    for dt in (np.int16, np.uint16):
        for fmt in (sparse.csr_matrix, sparse.csc_matrix):
            got = asymptotic_wilcoxon_arrays(fmt(x.astype(dt)), labels, **kw)
            pd.testing.assert_frame_equal(got, want)


def test_wire_dtype_selection(counts):
    x, labels = counts
    _, info = encode_and_count_groups(labels, "p0")

    def runner(arr):
        return WilcoxonRunner(
            data_handler_registry.get(arr), info, is_log1p=False
        )

    for dt in NARROW:
        r = runner(x.astype(dt))
        assert r.wire_dtype == np.dtype(dt), dt
        tile = r._fetch(*r.bounds[0])
        assert tile.dtype == np.dtype(dt), dt
    # Wide inputs ship as the value dtype (no narrowing possible).
    assert runner(x.astype(np.int32)).wire_dtype == np.float32
    assert runner(x.astype(np.float32)).wire_dtype == np.float32
    assert runner(x.astype(np.float64)).wire_dtype == np.float64


def test_narrow_wire_mesh_parity(counts):
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    x, labels = counts
    kw = dict(reference="p0", progress=False, is_log1p=False, engine="hist")
    want = asymptotic_wilcoxon_arrays(x.astype(np.float32), labels, **kw)
    got = asymptotic_wilcoxon_arrays(
        x.astype(np.uint16), labels, devices=8, **kw
    )
    pd.testing.assert_frame_equal(got, want)
