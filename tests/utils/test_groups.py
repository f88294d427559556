"""Group encoding tests (reference contract: ``illico/utils/groups.py:18-58``)."""

import numpy as np
import pytest

from illico_tpu.utils.groups import encode_and_count_groups


def test_encoding_matches_unique_order():
    labels = np.array(["b", "a", "c", "a", "b", "b"])
    uniq, info = encode_and_count_groups(labels, None)
    np.testing.assert_array_equal(uniq, ["a", "b", "c"])
    np.testing.assert_array_equal(info.counts, [2, 3, 1])
    np.testing.assert_array_equal(info.encoded_groups, [1, 0, 2, 0, 1, 1])
    assert info.ref_code == -1


def test_reference_encoding():
    labels = np.array(["b", "a", "c"])
    _, info = encode_and_count_groups(labels, "c")
    assert info.ref_code == 2


def test_missing_reference_raises():
    with pytest.raises(ValueError, match="not present"):
        encode_and_count_groups(np.array(["a", "b"]), "zz")


def test_perm_groups_contiguous_and_stable():
    rng = np.random.RandomState(0)
    labels = rng.randint(0, 5, 100)
    _, info = encode_and_count_groups(labels, None)
    sorted_codes = info.encoded_groups[info.perm]
    assert (np.diff(sorted_codes) >= 0).all()
    # stability: original order preserved within groups
    for g in range(5):
        rows = info.perm[sorted_codes == g]
        assert (np.diff(rows) > 0).all()
    # indptr consistent with counts
    np.testing.assert_array_equal(np.diff(info.indptr), info.counts)


def test_missing_labels_raise():
    """NaN/None labels must fail loudly, not silently join the last group."""
    with pytest.raises(ValueError, match="missing value"):
        encode_and_count_groups(np.array(["a", np.nan, "b"], dtype=object), None)
    import pandas as pd

    s = pd.Series(["a", None, "b"], dtype="category")
    with pytest.raises(ValueError, match="missing value"):
        encode_and_count_groups(s, "a")
