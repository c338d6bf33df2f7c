from elastic_freight_spark.plans.explain import (
    assert_broadcast_join,
    assert_no_python_in_plan,
    assert_partition_pruned,
    assert_pushed_filters,
    assert_read_schema_pruned,
    codegen_stage_count,
    formatted_plan,
)

__all__ = [
    "formatted_plan",
    "assert_pushed_filters",
    "assert_read_schema_pruned",
    "assert_partition_pruned",
    "assert_broadcast_join",
    "assert_no_python_in_plan",
    "codegen_stage_count",
]

from elastic_freight_spark.plans.metrics import (  # noqa: E402
    execution_metrics,
    shuffle_summary,
    summarize,
)

__all__ += ["execution_metrics", "shuffle_summary", "summarize"]
