"""Vectorized 64-bit hashing.

The reference hashes uint32 keys with a Dietzfelbinger 128-bit
multiply-add-shift (``Utils/hash_function.cpp:6-15,75-77``) and strings with
CityHash64 (``Utils/hash_function.cpp:64-68``).  Per SURVEY.md §2.4 the
filter's error bound depends only on hash *uniformity*, not on identity with
CityHash, so we use a fixed-constant splitmix64 finalizer over the key mixed
with two Dietzfelbinger-style multiply-add constants — fully vectorizable in
NumPy uint64 (the 128-bit C++ arithmetic does not vectorize in NumPy), and
deterministic across executors / parallelism levels (north_rule).

All functions operate on whole NumPy arrays; no per-element Python.
"""

from __future__ import annotations

import numpy as np

# Dietzfelbinger-style odd multiply/add constants (fixed: determinism across
# executors replaces the reference's srand(1)-seeded constants,
# ``Utils/hash_function.cpp:6-15``).
_MULT = np.uint64(0x9E3779B97F4A7C15)  # 2^64 / golden ratio, odd
_ADD = np.uint64(0x2545F4914F6CDD1D)

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)

U64 = np.uint64


def hash64(keys: np.ndarray, seed: int = 0) -> np.ndarray:
    """Vectorized 64-bit hash of integer keys (splitmix64 finalizer over a
    multiply-add premix).  Input any integer dtype; output uint64."""
    x = keys.astype(np.uint64, copy=False)
    with np.errstate(over="ignore"):
        z = x * _MULT + (_ADD + np.uint64(seed) * np.uint64(0x9E3779B9))
        z = (z ^ (z >> np.uint64(30))) * _C1
        z = (z ^ (z >> np.uint64(27))) * _C2
        z = z ^ (z >> np.uint64(31))
    return z


def hash64_bytes(values, seed: int = 0) -> np.ndarray:
    """64-bit hash of a sequence of str/bytes (FNV-1a 64 then splitmix
    finalize).  Used for string-element parity (the reference's CityHash64
    path, ``Utils/hash_function.cpp:64-68``); per-element Python but only on
    driver-side test fixtures — the hot Spark path hashes int token arrays.
    """
    out = np.empty(len(values), dtype=np.uint64)
    fnv_offset = 0xCBF29CE484222325
    fnv_prime = 0x100000001B3
    mask = 0xFFFFFFFFFFFFFFFF
    for i, v in enumerate(values):
        b = v.encode("utf-8") if isinstance(v, str) else v
        h = fnv_offset
        for byte in b:
            h = ((h ^ byte) * fnv_prime) & mask
        out[i] = h
    return hash64(out, seed=seed)
