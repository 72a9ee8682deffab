from cuckoofilter_spark.plans.audit import (  # noqa: F401
    count_exchanges,
    explain_str,
    plan_report,
    read_schema_columns,
    uses_whole_stage_codegen,
)
