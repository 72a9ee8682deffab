"""cuckoofilter_spark — a PySpark-native distributed sketch / approximate-
membership library with the capabilities of the reference C++ CuckooFilter
repo (jmatak/CuckooFilter), re-expressed Spark-first: Arrow-vectorized
per-partition builds, deterministic tree merges, broadcast query UDFs, and
companion mergeable sketches (Bloom, HLL, count-min, KLL, t-digest).
"""

from cuckoofilter_spark.core import CuckooFilter, CuckooTable, DynamicCuckooFilter
from cuckoofilter_spark.params import CuckooParams

__all__ = ["CuckooParams", "CuckooFilter", "CuckooTable", "DynamicCuckooFilter"]
__version__ = "0.1.0"
