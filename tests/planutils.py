"""Shared physical-plan introspection for plan-shape assertions."""


def formatted_plan(spark, df) -> str:
    """`df.explain("formatted")` as a string (formatted mode names every
    physical node — Exchange, BroadcastNestedLoopJoin, ArrowEvalPython)."""
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
