"""Plan inspection helpers (pushdown / codegen assertions)."""

from go_lsh_spark.plans.inspect import (
    assert_contains,
    count_codegen_stages,
    explain_str,
)

__all__ = ["explain_str", "assert_contains", "count_codegen_stages"]
