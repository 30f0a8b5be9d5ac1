from demv_spark.plans.introspect import (
    assert_no_python_udf,
    explain_str,
    plan_stats,
)

__all__ = ["explain_str", "plan_stats", "assert_no_python_udf"]
