"""64-bit mixing hashes used by the exist-filter (vectorized).

Semantics match the two Thomas-Wang-style mixers of the reference
(lib/utils.c:1067-1091); all arithmetic is mod 2^64.
"""
from __future__ import annotations

import numpy as np

_U64 = np.uint64


def hash64_1(key: np.ndarray) -> np.ndarray:
    """First exist-filter hash (lib/utils.c:1067-1077)."""
    key = np.asarray(key, dtype=_U64)
    with np.errstate(over="ignore"):
        key = (~key) + (key << _U64(21))
        key = key ^ (key >> _U64(24))
        key = (key + (key << _U64(3))) + (key << _U64(8))
        key = key ^ (key >> _U64(14))
        key = (key + (key << _U64(2))) + (key << _U64(4))
        key = key ^ (key >> _U64(28))
        key = key + (key << _U64(31))
    return key


def hash64_2(key: np.ndarray) -> np.ndarray:
    """Second exist-filter hash (lib/utils.c:1080-1091)."""
    key = np.asarray(key, dtype=_U64)
    with np.errstate(over="ignore"):
        key = key + (~(key << _U64(32)))
        key = key ^ (key >> _U64(22))
        key = key + (~(key << _U64(13)))
        key = key ^ (key >> _U64(8))
        key = key + (key << _U64(3))
        key = key ^ (key >> _U64(15))
        key = key + (~(key << _U64(27)))
        key = key ^ (key >> _U64(31))
    return key
