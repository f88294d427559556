"""Primitive-level oracle tests for the rank engine.

Mirrors the reference's strategy of checking every kernel helper against a
numpy/scipy oracle (``/root/reference/tests/utils/test_ranking.py``,
``test_math.py``): tie-block bounds vs scipy.stats.rankdata, segment sums vs
np.add.reduceat, OVO pair counts vs brute force.
"""

import numpy as np
import pytest
import jax.numpy as jnp
from scipy.stats import rankdata

from illico_tpu.ops.rank_engine import (
    BLOCK,
    _block_segment_sum_f64,
    _block_segment_sum_i32,
    _tie_block_bounds,
    build_padded_layout,
    make_tile_fn,
)
from illico_tpu.utils.groups import encode_and_count_groups


def test_tie_block_ranks_match_rankdata():
    rng = np.random.RandomState(0)
    x = np.sort(rng.randint(0, 10, (200, 4)).astype(np.float32), axis=0)
    first, last = _tie_block_bounds(jnp.asarray(x))
    r2 = np.asarray(first) + np.asarray(last) + 2
    expected = 2 * rankdata(x, axis=0)
    np.testing.assert_array_equal(r2, expected)


def test_block_segment_sums_exact():
    rng = np.random.RandomState(1)
    g = 7
    counts = rng.randint(1, 60, g)
    labels = np.repeat(np.arange(g), counts)
    _, info = encode_and_count_groups(labels, None)
    layout = build_padded_layout(info.perm, info.indptr)
    n_pad, t = layout.n_pad, 3
    q = rng.randint(0, 2**20, (n_pad, t)).astype(np.int32)
    q[layout.pad_mask] = 0
    got = np.asarray(
        _block_segment_sum_i32(
            jnp.asarray(q), jnp.asarray(layout.block_starts), jnp.asarray(layout.block_ends)
        )
    )
    # numpy oracle over padded segments
    starts = layout.block_starts.astype(int) * BLOCK
    ends = layout.block_ends.astype(int) * BLOCK
    expected = np.stack([q[s:e].sum(axis=0, dtype=np.int64) for s, e in zip(starts, ends)])
    np.testing.assert_array_equal(got, expected.astype(np.float64))

    qf = rng.rand(n_pad, t)
    qf[layout.pad_mask] = 0
    gotf = np.asarray(
        _block_segment_sum_f64(
            jnp.asarray(qf), jnp.asarray(layout.block_starts), jnp.asarray(layout.block_ends)
        )
    )
    expectedf = np.stack([qf[s:e].sum(axis=0) for s, e in zip(starts, ends)])
    np.testing.assert_allclose(gotf, expectedf, rtol=1e-12)


def test_ovo_pair_counts_brute_force():
    """U2 equals twice the ref<tgt pair count (+ ties) for every group."""
    rng = np.random.RandomState(2)
    n, t, g = 300, 3, 4
    x = rng.randint(0, 6, (n, t)).astype(np.float32)
    labels = rng.randint(0, g, n)
    _, info = encode_and_count_groups(labels, ref_group=1)
    layout = build_padded_layout(info.perm, info.indptr)
    fn = make_tile_fn(layout, ref_code=info.ref_code, is_log1p=False, compute_fc=False)
    out = {k: np.asarray(v) for k, v in fn(jnp.asarray(x)).items()}
    ref_vals = x[labels == 1]
    for gi in range(g):
        if gi == 1:
            continue
        tgt = x[labels == gi]
        for j in range(t):
            less = (ref_vals[:, j][:, None] < tgt[:, j][None, :]).sum()
            eq = (ref_vals[:, j][:, None] == tgt[:, j][None, :]).sum()
            assert out["U2"][gi, j] == 2 * less + eq


def test_ovo_tie_sum_brute_force():
    rng = np.random.RandomState(3)
    n, g = 250, 4
    x = rng.randint(0, 5, (n, 2)).astype(np.float32)
    labels = rng.randint(0, g, n)
    _, info = encode_and_count_groups(labels, ref_group=0)
    layout = build_padded_layout(info.perm, info.indptr)
    fn = make_tile_fn(layout, ref_code=0, is_log1p=False, compute_fc=False)
    out = {k: np.asarray(v) for k, v in fn(jnp.asarray(x)).items()}
    tie = out["tie_ref_col"][None, :] + out["tie_seg"]
    for gi in range(1, g):
        for j in range(2):
            sub = np.concatenate([x[labels == 0, j], x[labels == gi, j]])
            _, cnt = np.unique(sub, return_counts=True)
            expected = float((cnt.astype(np.float64) ** 3 - cnt).sum())
            assert tie[gi, j] == pytest.approx(expected, rel=1e-12)


def test_padded_layout_invariants():
    rng = np.random.RandomState(4)
    labels = rng.randint(0, 11, 997)
    _, info = encode_and_count_groups(labels, None)
    layout = build_padded_layout(info.perm, info.indptr)
    assert layout.n_pad % BLOCK == 0
    assert layout.n_cells == 997
    # every real row appears exactly once
    real = layout.perm[layout.perm >= 0]
    assert sorted(real.tolist()) == list(range(997))
    # group segments are block aligned and correctly labeled
    for g in range(info.n_groups):
        s, e = layout.block_starts[g] * BLOCK, layout.block_ends[g] * BLOCK
        seg = layout.perm[s:e]
        codes = info.encoded_groups[seg[seg >= 0]]
        assert (codes == g).all()


def test_float64_input_path():
    """float64 data keeps float64 comparisons (distinct beyond f32 epsilon)."""
    x = np.array(
        [[1.0], [1.0 + 1e-12], [1.0 + 2e-12], [2.0], [2.0], [3.0]], dtype=np.float64
    )
    labels = np.array([0, 0, 0, 1, 1, 1])
    _, info = encode_and_count_groups(labels, None)
    layout = build_padded_layout(info.perm, info.indptr)
    fn = make_tile_fn(layout, ref_code=-1, is_log1p=False, compute_fc=False)
    out = {k: np.asarray(v) for k, v in fn(jnp.asarray(x)).items()}
    # ranks: group 0 holds ranks 1,2,3 -> R2 = 12; group 1: 4.5,4.5,6 -> R2 = 30
    np.testing.assert_array_equal(out["R2"][:, 0], [12.0, 30.0])


def test_f64_segment_sum_fallback_exact(monkeypatch):
    """Above the int32-safety row bound the engine switches its segment
    sums to float64; results stay bit-exact vs the i32 path."""
    import illico_tpu.ops.rank_engine as re_mod

    rng = np.random.RandomState(9)
    n, t, g = 901, 7, 4  # odd shape: forces a fresh trace under the patch
    x = rng.poisson(3.0, (n, t)).astype(np.float32)
    labels = rng.randint(0, g, n)
    _, info = encode_and_count_groups(labels, 0)
    layout = build_padded_layout(info.perm, info.indptr)

    fn = make_tile_fn(layout, ref_code=0, is_log1p=False)
    want = {k: np.asarray(v) for k, v in fn(jnp.asarray(x)).items()}

    monkeypatch.setattr(re_mod, "_I32_SAFE_N_PAD", 8)  # force the f64 path
    fn64 = make_tile_fn(layout, ref_code=0, is_log1p=False, compute_fc=False)
    got = {k: np.asarray(v) for k, v in fn64(jnp.asarray(x)).items()}
    for k in got:
        np.testing.assert_array_equal(got[k], want[k], err_msg=k)
