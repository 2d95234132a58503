"""Model blocklist filtering (SURVEY §2.11 L5): the reference maintains
exact-name and case-insensitive-regex blocklists per provider
(mongo_analyser/llm_chat/openai.py:11-71, ollama.py:10-13,
wrapper.py:12-63) applied with `re.search` (wrapper.py:66-81). Here the
same policy is a DataFrame combinator: exact names become an anti-join
against a (broadcast) blocklist table, patterns a single case-insensitive
rlike — both engine-side, so the policy also works on million-row model
registries, not just provider listings."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def filter_blocklisted(
    models: DataFrame,
    name_col: str = "name",
    exact: list[str] | None = None,
    patterns: list[str] | None = None,
) -> DataFrame:
    """Rows whose ``name_col`` is neither an exact blocklist member nor a
    case-insensitive match of any blocklist regex (re.search semantics:
    unanchored substring match)."""
    out = models
    if exact:
        bl = models.sparkSession.createDataFrame(
            [(n,) for n in exact], f"{name_col} string"
        )
        out = out.join(F.broadcast(bl), name_col, "left_anti")
    if patterns:
        combined = "(?i)" + "|".join(f"(?:{p})" for p in patterns)
        out = out.filter(~F.col(name_col).rlike(combined))
    return out
