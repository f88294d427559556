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
    assert _bulk_wire_bytes(s) == 10  # 3 + 5 + 2: the README number


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


def test_mesh_path_disables_wire_splits(k562_layout):
    layout, info = k562_layout
    s = he.hist_contract_statics(layout, -1, he.DEFAULT_V, wire=False)
    assert s["u2_split_code"] == -1 and s["fc_split_code"] == -1
    # Device dtypes still narrow where a real dtype exists (no split tiers).
    assert s["u2_dtype"] in ("int32", "float64")
