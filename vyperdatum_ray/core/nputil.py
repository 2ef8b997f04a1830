"""Small shared numpy utilities used across pipeline stages."""

from __future__ import annotations

import numpy as np


def isin_sorted(keys: np.ndarray, sorted_set: np.ndarray) -> np.ndarray:
    """Membership of ``keys`` in a SORTED unique array via searchsorted
    (O((n+m) log m), no hashing) — empty-set safe. The one broadcast-
    membership idiom shared by the broadcast-join stages (TPC-H Q3
    order filter, Jaccard doc prefilter, cluster assignment)."""
    if len(sorted_set) == 0:
        return np.zeros(len(keys), dtype=bool)
    pos = np.searchsorted(sorted_set, keys)
    pos_c = np.minimum(pos, len(sorted_set) - 1)
    return (pos < len(sorted_set)) & (sorted_set[pos_c] == keys)
