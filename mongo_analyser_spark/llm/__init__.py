from mongo_analyser_spark.llm.context import (
    ContextBuilder,
    build_context_block,
    truncate_history,
)

__all__ = ["build_context_block", "truncate_history", "ContextBuilder"]
