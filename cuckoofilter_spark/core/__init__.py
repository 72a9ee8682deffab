from cuckoofilter_spark.core.cuckoo_filter import CuckooFilter
from cuckoofilter_spark.core.cuckoo_table import CuckooTable
from cuckoofilter_spark.core.dynamic_filter import DynamicCuckooFilter

__all__ = ["CuckooTable", "CuckooFilter", "DynamicCuckooFilter"]
