"""Wire-contract snapshots at headline (K562) scale.

The packed wire format is the performance contract of the single-chip
path: the host<->device link carries ~10 bytes/test OVO and ~6 bytes/test
OVR at K562-essential scale (300k cells, 2k groups, ~10% control — the
``bench.py`` population).  These tests pin the statically chosen encodings
so an accidental tier-boundary change (which would silently widen the wire
AND invalidate the cached headline executable, costing a fresh ~170 s XLA
compile over the remote-compile link) fails the suite instead.

Reference scale: ``/root/reference/README.md`` benchmarks ~300k cells x
8k genes x 2k perturbation groups.
"""

import numpy as np
import pytest

from illico_tpu.ops import hist_engine as he
from illico_tpu.ops.rank_engine import build_padded_layout
from illico_tpu.utils.groups import encode_and_count_groups


@pytest.fixture(scope="module")
def k562_layout():
    """Group layout matching bench.py's population (seeded, no matrix)."""
    rng = np.random.RandomState(0)
    n_cells, n_groups = 300_000, 2_000
    labels = rng.randint(1, n_groups, n_cells)
    labels[rng.rand(n_cells) < 0.1] = 0  # 'non-targeting' control ~10%
    groups = np.array(
        [f"pert_{g}" if g else "non-targeting" for g in labels]
    )
    _, info = encode_and_count_groups(groups, ref_group="non-targeting")
    return build_padded_layout(info.perm, info.indptr), info


def _bulk_wire_bytes(statics):
    """Wire bytes per (group, gene) test implied by the statics.

    Counts only the (G, T)-shaped bulk arrays — split rows and per-column
    arrays are O(T), amortized to ~0 over G=2000 groups.
    """
    wb = he._DTYPE_WIRE_BYTES
    total = wb[statics["u2_dtype"]]
    if statics["ref_code"] != -1:
        total += wb[statics["tie_dtype"]]  # tie_seg is (G, T) only in OVO
    if statics["compute_fc"]:
        total += wb[statics["fc_dtype"]]
    return total


def test_ovo_headline_statics_snapshot(k562_layout):
    layout, info = k562_layout
    s = he.hist_contract_statics(layout, info.ref_code, he.DEFAULT_V)
    # U2: bound 2 * n_ctl * max(n_pert) ~ 1.1e7 < 2^24 (control self-row
    # zeroed on device).
    assert s["u2_dtype"] == "uint24"
    # tie_seg: bound 3*R*M*(R+M) ~ 5e11 < 2^40.
    assert s["tie_dtype"] == "u40"
    # fc: the control row splits out, dropping the bulk to uint16
    # (max pert group * 127 < 2^16).
    assert s["fc_split_code"] == info.ref_code
    assert s["fc_dtype"] == "uint16"
    assert s["u2_split_code"] == -1  # OVO never splits U2
    # nnz-split wire engages (every perturbation group < 256 cells, tie
    # tier u40): the effective bulk is k(1) + u2_res(2) + tie_res(3) +
    # fc(2) = 8 B/test, replacing the 10 B/test u2/tie/fc tiers above
    # (round-4 VERDICT item 1 — the OVO wire was the open perf gap).
    assert s["nnz_split"] is True
    assert _bulk_wire_bytes(s) == 10  # the tiers nnz_split supersedes


def test_ovo_headline_packed_bytes_per_test(k562_layout):
    """End-to-end packed size at the headline shape: ~8.2 B/test."""
    import jax

    layout, info = k562_layout
    statics = dict(
        n_pad=float(layout.n_pad), is_log1p=False,
        **he.hist_contract_statics(layout, info.ref_code, he.DEFAULT_V),
    )
    t_pad = 2048
    hist_spec = jax.ShapeDtypeStruct(
        (layout.n_groups, he.DEFAULT_V, t_pad), np.float32
    )
    ppg_spec = jax.ShapeDtypeStruct((layout.n_groups,), np.int32)
    import functools

    with jax.enable_x64(True):
        abstract = jax.eval_shape(
            functools.partial(he.hist_contract, **statics, pack=False),
            hist_spec, ppg_spec,
        )
    spec = he.build_pack_spec(abstract, he._narrow_map(statics))
    per_test = he.spec_total_bytes(spec) / (layout.n_groups * t_pad)
    assert 8.0 <= per_test <= 8.35, per_test

    # With the sampling-gated fc-residual uint8 tier (what bench.py's
    # Poisson counts engage): ~7.2 B/test.
    statics8 = dict(
        n_pad=float(layout.n_pad), is_log1p=False,
        **he.hist_contract_statics(
            layout, info.ref_code, he.DEFAULT_V, fc_u8_hint=True
        ),
    )
    assert statics8["fc_u8"] is True
    with jax.enable_x64(True):
        abstract8 = jax.eval_shape(
            functools.partial(he.hist_contract, **statics8, pack=False),
            hist_spec, ppg_spec,
        )
    spec8 = he.build_pack_spec(abstract8, he._narrow_map(statics8))
    per_test8 = he.spec_total_bytes(spec8) / (layout.n_groups * t_pad)
    assert 7.0 <= per_test8 <= 7.35, per_test8


def test_ovr_headline_statics_snapshot(k562_layout):
    layout, info = k562_layout
    s = he.hist_contract_statics(layout, -1, he.DEFAULT_V)
    # R2: full bound 2 * n_ctl * n_total ~ 1.8e10 needs u40, but splitting
    # the control row drops the bulk to int32 (2 * max_pert * n_total).
    assert s["u2_split_code"] == int(np.argmax(info.counts))
    assert s["u2_dtype"] == "int32"
    # fc split drops the bulk to uint16, as in OVO.
    assert s["fc_split_code"] == int(np.argmax(info.counts))
    assert s["fc_dtype"] == "uint16"
    assert s["tie_dtype"] == "float64"  # per-column tie_col only, not (G, T)
    assert _bulk_wire_bytes(s) == 6  # 4 + 2


@pytest.mark.parametrize("mode", ["ovo", "ovr"])
@pytest.mark.parametrize(
    "sizes",
    [(400, 150, 30, 20),   # no row splits engaged
     (600, 22, 18, 15)],   # control dominates: fc (and OVR R2) splits engage
)
def test_wire_bounds_are_attained_suprema(mode, sizes):
    """The narrow wire tiers are proven by STATIC bounds; if any bound
    under-estimated the achievable maximum, the encoding would silently
    wrap.  Drive data constructed to ATTAIN each bound (everyone tied in
    one value bucket; targets at the table max; reference at the max) and
    assert (a) the packed path is bit-identical to the plain (mesh)
    contract on the real columns, and (b) the maxima actually equal the
    bounds — so the tiers are tested at their exact suprema, not at
    comfortable interior points.  Pad columns (device-side 128-alignment)
    legitimately hold out-of-bound garbage both paths discard."""
    import jax
    import jax.numpy as jnp

    from illico_tpu.ops.rank_engine import build_padded_layout
    from illico_tpu.utils.groups import encode_and_count_groups

    rng = np.random.RandomState(0)
    labels = np.repeat(np.arange(len(sizes)), sizes)
    _, info = encode_and_count_groups(labels, 0 if mode == "ovo" else None)
    ref_code = info.ref_code
    layout = build_padded_layout(info.perm, info.indptr)
    n = labels.size
    V = he.DEFAULT_V
    ref_mask = labels == 0
    cols = [
        np.ones(n),                    # everyone ties at value 1
        np.where(ref_mask, 0, V - 1),  # targets dominate at the table max
        np.where(ref_mask, V - 1, 0),  # reference dominates at the max
        np.full(n, V - 1),             # everyone ties at the top bucket
        np.zeros(n),
        rng.randint(0, V, n).astype(float),
        rng.randint(0, 2, n) * float(V - 1),
        rng.randint(0, 3, n).astype(float),
    ]
    x = np.stack(cols, axis=1).astype(np.float32)
    w = x.shape[1]

    fn = he.make_hist_tile_fn(
        layout, ref_code=ref_code, is_log1p=False, interpret=True
    )
    st = fn._statics
    packed = fn.unpack(np.asarray(jax.device_get(fn(jnp.asarray(x)))))

    # Plain-array (mesh) contract over the same histogram: float64 truth.
    perm, pad_mask, table, blk_group, blk_flush, ppg = he.prepare_hist_inputs(
        layout, V, False
    )
    with jax.enable_x64(False):
        hist = he.hist_pass(
            jnp.asarray(x), perm, pad_mask, table, blk_group, blk_flush,
            n_groups=layout.n_groups, interpret=True,
        )
    plain_statics = dict(
        n_pad=float(layout.n_pad), is_log1p=False, pack=False,
        **he.hist_contract_statics(layout, ref_code, V, wire=False),
    )
    with jax.enable_x64(True):
        plain = he.hist_contract(hist, ppg, **plain_statics)
    plain = {
        k: np.asarray(jax.device_get(v)).astype(np.float64)[..., :w]
        for k, v in plain.items()
    }

    # Reassemble split rows, then compare real columns exactly.
    ukey = "U2" if mode == "ovo" else "R2"
    got_u = np.asarray(packed[ukey]).astype(np.float64)[:, :w]
    if st["u2_split_code"] >= 0:
        got_u[st["u2_split_code"]] = np.asarray(
            packed["r2_split_col"], np.float64
        )[:w]
    got_fc = np.asarray(packed["fc_sums"]).astype(np.float64)[:, :w]
    if st["fc_split_code"] >= 0:
        got_fc[st["fc_split_code"]] = np.asarray(
            packed["fc_split_col"], np.float64
        )[:w]
    np.testing.assert_array_equal(got_u, plain[ukey])
    np.testing.assert_array_equal(got_fc, plain["fc_sums"])
    np.testing.assert_array_equal(
        np.asarray(packed["overflow_cols"])[:w], plain["overflow_cols"]
    )
    if mode == "ovo":
        got_tie = np.asarray(packed["tie_seg"]).astype(np.float64)[:, :w]
        np.testing.assert_array_equal(got_tie, plain["tie_seg"])
        np.testing.assert_array_equal(
            np.asarray(packed["tie_ref_col"])[:w], plain["tie_ref_col"]
        )
    else:
        np.testing.assert_array_equal(
            np.asarray(packed["tie_col"])[:w], plain["tie_col"]
        )

    # Attainment: the adversarial columns reach the static bounds exactly.
    u2_bound, fc_bound = he.hist_stat_bounds(layout, ref_code, V)
    assert got_fc.max() == fc_bound  # reference row, all at the table max
    if mode == "ovo":
        R = float(sizes[0])
        M = float(max(sizes[1:]))
        assert got_u.max() == u2_bound == 2.0 * R * M
        tie_bound = (M**3 - M) + 3.0 * R * M * (R + M)
        assert got_tie.max() == tie_bound
    else:
        assert got_u.max() <= u2_bound  # 2*n_g*n_total is a strict supremum


def test_mesh_path_disables_wire_splits(k562_layout):
    layout, info = k562_layout
    s = he.hist_contract_statics(layout, -1, he.DEFAULT_V, wire=False)
    assert s["u2_split_code"] == -1 and s["fc_split_code"] == -1
    # Device dtypes still narrow where a real dtype exists (no split tiers).
    assert s["u2_dtype"] in ("int32", "float64")


def test_f96_triple_roundtrip_bitfaithful():
    """The f96 (triple-float32) tier must transport ANY float64 value
    bit-faithfully — integers past the int64 word split's 2**63 bound
    (tie sums of >2**21-cell datasets) and non-integers (csort fc sums)
    alike (within float32's normal exponent range — every statistic on
    this tier is bounded by n**3 < 2**93, far inside it).  Checked at
    adversarial points: powers of two straddling 2**63, values with full
    53-bit mantissas, and float64-rounded cubes at n = 4M-cell scale."""
    import jax
    import jax.numpy as jnp

    n4m = 4_194_304.0  # 2**22 cells: tie_col ~ n^3 = 2**66
    vals = np.array([
        0.0, 1.0, 2.0**63, 2.0**63 + 2048.0, 2.0**66, n4m**3 - n4m,
        float(np.float64(2**63 - 1)), 2.0**52 + 1.0, 2.0**53 - 1.0,
        1.0 / 3.0, 2.0**92, 2.0**-20, 123456789.123456789,
        np.pi * 2.0**40, np.log1p(7.0), 2.0**93 - 2.0**40,
    ], dtype=np.float64)
    arr = np.tile(vals, 4).reshape(4, -1)  # (4, 16)

    @jax.jit
    def pack(v):
        return he.pack_device_outputs({"t": v}, narrow={"t": 12})[0]

    @jax.jit
    def ident(v):
        return v + 0.0

    with jax.enable_x64(True):
        buf = np.asarray(jax.device_get(pack(jnp.asarray(arr))))
        # The faithfulness contract is to the value the DEVICE holds: under
        # TPU's x64 emulation float64 is a float32 pair (~48-49 effective
        # bits), so values like 1/3 are rounded before the wire ever sees
        # them.  On real-f64 backends this equals ``arr`` bit-for-bit.
        want = np.asarray(jax.device_get(ident(jnp.asarray(arr))))
    spec = he.build_pack_spec(
        {"t": jax.ShapeDtypeStruct(arr.shape, np.float64)}, narrow={"t": 12}
    )
    got = he.unpack_host_buffer(buf, spec)["t"]
    np.testing.assert_array_equal(got, want)  # bit-faithful, no tolerance


def test_tall_dataset_statics_choose_f96(k562_layout):
    """Past 2**21 total cells the per-column tie scalars exceed the int64
    word split; the statics must pick the f96 tier (and the engine no
    longer demotes tall datasets to the sort engine — VERDICT r3 item 4)."""
    # Fake 5M-cell layout: 2 groups of 2.5M (statics need only bounds;
    # n_ref = 2.5M > 2**21, so even the OVO per-column n_ref^3 exceeds
    # 2**63).
    indptr = np.array([0, 2_500_000, 5_000_000], dtype=np.int64)
    perm = np.arange(5_000_000, dtype=np.int32)
    layout = build_padded_layout(perm, indptr)

    s_ovr = he.hist_contract_statics(layout, -1, he.DEFAULT_V)
    assert s_ovr["tiecol_dtype"] == "f96"  # tie_col bound n^3 ~ 2**72

    s_ovo = he.hist_contract_statics(layout, 0, he.DEFAULT_V)
    assert s_ovo["tiecol_dtype"] == "f96"  # tie_ref_col bound n_ref^3
    assert s_ovo["tie_dtype"] == "f96"     # tie_seg bound ~ 7 * (2.5M)^3

    # Mesh path (plain arrays): no split tiers, stays float64.
    s_mesh = he.hist_contract_statics(layout, -1, he.DEFAULT_V, wire=False)
    assert s_mesh["tiecol_dtype"] == "float64"

    # K562 scale (300k cells) keeps the narrow tiers — the headline
    # executable is unchanged by the f96 addition.
    k_layout, k_info = k562_layout
    s_k = he.hist_contract_statics(k_layout, k_info.ref_code, he.DEFAULT_V)
    assert s_k["tiecol_dtype"] == "float64"


def test_pack_spec_size_collision_guard():
    """find_spec keys packed buffers by total byte size alone; the builder
    must refuse to cache two specs with equal totals (round-4 VERDICT)."""
    import jax

    from illico_tpu.ops.hist_engine import (
        assert_spec_size_unique,
        build_pack_spec,
        spec_total_bytes,
    )

    s64 = jax.ShapeDtypeStruct((4, 16), np.int32)
    spec_a = build_pack_spec({"U2": s64})
    spec_b = build_pack_spec(
        {"U2": jax.ShapeDtypeStruct((4, 32), np.int32)}
    )
    cache = {}
    assert_spec_size_unique(cache, 16, spec_a)
    cache[16] = spec_a
    assert_spec_size_unique(cache, 32, spec_b)  # distinct size: fine
    cache[32] = spec_b
    # Same width re-derivation is fine (idempotent)...
    assert_spec_size_unique(cache, 16, spec_a)
    # ...but a different key packing to an existing total must fail.
    collide = build_pack_spec(
        {"R2": jax.ShapeDtypeStruct((8, 8), np.int32)}
    )
    assert spec_total_bytes(collide) == spec_total_bytes(spec_a)
    with pytest.raises(AssertionError, match="size collision"):
        assert_spec_size_unique(cache, 8, collide)
