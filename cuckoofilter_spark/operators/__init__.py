from cuckoofilter_spark.operators.build import build_filter, tree_merge_blobs
from cuckoofilter_spark.operators.membership import cf_contains_udf, membership_df

__all__ = ["build_filter", "tree_merge_blobs", "cf_contains_udf", "membership_df"]
