from .explain import (
    broadcast_hint_subtrees,
    executed_plan,
    has_broadcast_hash_join,
    pushed_filters,
    read_schema,
    static_plan,
    whole_stage_codegen_spans,
)

__all__ = [
    "broadcast_hint_subtrees",
    "executed_plan",
    "has_broadcast_hash_join",
    "pushed_filters",
    "read_schema",
    "static_plan",
    "whole_stage_codegen_spans",
]
