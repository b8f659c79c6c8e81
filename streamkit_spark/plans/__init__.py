from streamkit_spark.plans.inspect import (
    assert_no_exchange,
    assert_pushed_filters,
    count_exchanges,
    explain_str,
    has_broadcast_join,
    read_schemas,
    codegen_stage_count,
    pushed_filters,
)

__all__ = [
    "explain_str",
    "pushed_filters",
    "assert_pushed_filters",
    "count_exchanges",
    "assert_no_exchange",
    "has_broadcast_join",
    "read_schemas",
    "codegen_stage_count",
]
