from mongo_analyser_spark.plans.inspect import (
    formatted_plan,
    has_broadcast_hash_join,
    has_sort_merge_join,
    num_broadcast_hints,
    num_exchanges,
    num_raw_stream_equijoins,
    num_wholestage_codegen,
    plan_report,
    pushed_filters,
    read_schemas,
)
from mongo_analyser_spark.plans.lint import Finding, assert_scale_safe, lint_plan

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "read_schemas",
    "has_broadcast_hash_join",
    "has_sort_merge_join",
    "num_broadcast_hints",
    "num_exchanges",
    "num_wholestage_codegen",
    "plan_report",
    "Finding",
    "lint_plan",
    "assert_scale_safe",
]
