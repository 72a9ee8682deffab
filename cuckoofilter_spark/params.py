"""Filter configuration.

Mirrors the reference's compile-time template space: the five legal
``(entries_per_bucket, bits_per_fp, fp_type)`` configurations enforced at
construction (reference: ``CF/cuckoo_table.h:150-168``,
``DCF/dynamic_cuckoo_filter.h:254-272``), the power-of-two table sizing
(``Utils/util.h:9-19``) and the fingerprint mask
(``CF/cuckoo_filter.h:157``).

Unlike the reference (a C++ template instantiation), ours is a runtime
dataclass validated against the same configuration set.  Compute dtype is
the smallest NumPy unsigned type that holds ``bits_per_fp`` — 4-bit and
12-bit configurations are computed in uint8/uint16 *lanes* masked to width
(identical fingerprint space and FPR; dense bit-packing is applied only at
serialization time, see ``core/serde.py``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

#: kick-loop bound, reference ``CF/cuckoo_filter.h:6`` (KICKS_MAX_COUNT)
KICKS_MAX_COUNT = 500

#: DCF growth watermark, reference ``DCF/cuckoo_filter.h:205``
CAPACITY_WATERMARK = 0.9

#: multiplicative constant in the partner-index hash,
#: reference ``Utils/hash_function.h:12`` (MURMUR_CONST)
MURMUR_CONST = np.uint64(0x5BD1E995)

#: legal (entries_per_bucket, bits_per_fp) pairs → compute dtype
#: reference ``CF/cuckoo_table.h:150-168``
LEGAL_CONFIGS: dict[tuple[int, int], type] = {
    (4, 4): np.uint8,
    (4, 8): np.uint8,
    (4, 12): np.uint16,
    (4, 16): np.uint16,
    (2, 32): np.uint32,
}


def highest_power_of_two(n: int) -> int:
    """Round *n* to a power of two, reference ``Utils/util.h:9-19`` semantics:
    bit-smear round-up then halve — i.e. the largest power of two strictly
    below the next power of two above n-ish; notably an exact power of two
    is *halved* (8 → 4) and 40000 → 32768.
    """
    if n <= 1:
        return 1
    v = n - 1
    v |= v >> 1
    v |= v >> 2
    v |= v >> 4
    v |= v >> 8
    v |= v >> 16
    v |= v >> 32
    return (v + 1) >> 1


@dataclass(frozen=True)
class CuckooParams:
    """Runtime analog of the reference's template parameters."""

    max_table_size: int = 65536
    entries_per_bucket: int = 4
    bits_per_fp: int = 16
    seed: int = 0  # extra hash seed; 0 == reference-default behavior

    # derived
    table_size: int = field(init=False)
    fp_mask: int = field(init=False)

    def __post_init__(self) -> None:
        if (self.entries_per_bucket, self.bits_per_fp) not in LEGAL_CONFIGS:
            raise ValueError(
                f"CuckooFilter cannot be initialized with entries_per_bucket="
                f"{self.entries_per_bucket}, bits_per_fp={self.bits_per_fp}; "
                f"legal: {sorted(LEGAL_CONFIGS)}"
            )
        object.__setattr__(self, "table_size", highest_power_of_two(self.max_table_size))
        object.__setattr__(self, "fp_mask", (1 << self.bits_per_fp) - 1)

    @property
    def dtype(self) -> type:
        return LEGAL_CONFIGS[(self.entries_per_bucket, self.bits_per_fp)]

    @property
    def slots(self) -> int:
        return self.table_size * self.entries_per_bucket

    @property
    def capacity(self) -> int:
        """DCF per-filter capacity = 0.9 · slots (``DCF/cuckoo_filter.h:205``)."""
        return int(CAPACITY_WATERMARK * self.slots)

    @property
    def fpr_bound(self) -> float:
        """Published cuckoo-filter bound ε ≤ 2b / 2^f (Fan et al.)."""
        return 2.0 * self.entries_per_bucket / float(1 << self.bits_per_fp)

    def to_tuple(self) -> tuple[int, int, int, int]:
        return (self.max_table_size, self.entries_per_bucket, self.bits_per_fp, self.seed)

    @classmethod
    def from_tuple(cls, t: tuple[int, int, int, int]) -> "CuckooParams":
        return cls(*t)
