"""LLM chat-context assembly (SURVEY §2.11 L1-L3).

The reference feeds schema + field-stats + sample-docs artifacts into an
LLM chat as a marked context block
(mongo_analyser/views/chat_view.py:48-60 markers/templates, :859-887
assembly), truncates history by a -1/0/N policy (:451-464), and caches
the analysis artifacts per collection (:699-770). All three behaviors are
driver-side string/dict work over artifacts our Spark jobs computed —
reproduced here with the same observable format so a consumer of the
reference's context blocks can switch engines without re-prompting.

The LLM provider clients themselves (ollama/openai/google, §2.11 L4) are
engine-independent network code and out of scope for the analytics
engine; this module ends at the prompt-payload boundary.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

CONTEXT_BLOCK_START = "--- START APP-PROVIDED CONTEXT ---\n"
CONTEXT_BLOCK_END = "\n--- END APP-PROVIDED CONTEXT ---\n\n"

#: ordered sections and their title templates (chat_view.py:54-60)
SECTION_TITLES = {
    "schema": "[SCHEMA FOR COLLECTION: '{collection}']\n",
    "metadata": "[FIELD STATISTICS FOR COLLECTION: '{collection}']\n",
    "sample_docs": "[SAMPLE DOCUMENTS FOR COLLECTION: '{collection}' ({num_docs} docs)]\n",
}
SECTION_ORDER = ["schema", "metadata", "sample_docs"]
DEFAULT_SAMPLE_DOCS = 3


def build_context_block(
    collection: str,
    schema: dict | None = None,
    stats: dict | None = None,
    sample_docs: list[dict] | None = None,
) -> str:
    """Assemble the reference's marked context block: ordered sections
    (schema → stats → samples), each a titled ```json fence, wrapped in
    START/END markers (chat_view.py:859-887). Empty input → empty string."""
    sections: list[str] = []
    payloads = {
        "schema": schema,
        "metadata": stats,
        "sample_docs": sample_docs,
    }
    for key in SECTION_ORDER:
        payload = payloads[key]
        if payload is None:
            continue
        title = SECTION_TITLES[key].format(
            collection=collection,
            num_docs=len(sample_docs) if key == "sample_docs" else None,
        )
        body = json.dumps(payload, indent=2, default=str)
        sections.append(f"{title}```json\n{body}\n```\n")
    if not sections:
        return ""
    return CONTEXT_BLOCK_START + "\n".join(sections) + CONTEXT_BLOCK_END


def truncate_history(history: list[dict], max_messages: int | None) -> list[dict]:
    """The reference's history policy (chat_view.py:451-464):
    -1 → no history, 0 (or None) → full history, N>0 → last N messages.
    Only user/assistant turns are eligible."""
    hist = [m for m in history if m.get("role") in {"user", "assistant", "ai"}]
    if max_messages == -1:
        return []
    if not max_messages:
        return hist
    return hist[-max_messages:]


class ContextBuilder:
    """Schema/stats artifact cache keyed by collection — the reference
    re-uses a collection's analysis across chat turns instead of
    re-scanning (chat_view.py:699-770, cache check :705-713)."""

    def __init__(self, engine):
        self.engine = engine
        self._cache: dict[str, tuple[dict, dict]] = {}

    def artifacts(
        self, collection: str, df: DataFrame, json_cols=None, sample_size: int = 100
    ) -> tuple[dict, dict]:
        """(schema, stats) for a collection, computed once. The chat path
        uses sample_size=100 like the reference (chat_view.py:730-734)."""
        if collection not in self._cache:
            self._cache[collection] = (
                self.engine.infer_schema(df, json_cols),
                self.engine.analyze(df, json_cols, sample_size=sample_size),
            )
        return self._cache[collection]

    def invalidate(self, collection: str | None = None) -> None:
        """Collection switch invalidation (tui.py:141-150)."""
        if collection is None:
            self._cache.clear()
        else:
            self._cache.pop(collection, None)

    def context_for(
        self,
        collection: str,
        df: DataFrame,
        json_cols=None,
        num_docs: int = DEFAULT_SAMPLE_DOCS,
        order_col: str | None = None,
    ) -> str:
        """Full context block: cached schema+stats plus the newest
        `num_docs` sample documents (display-truncated upstream)."""
        schema, stats = self.artifacts(collection, df, json_cols)
        sample_df = df
        if order_col is not None:
            from pyspark.sql import functions as F

            sample_df = df.orderBy(F.desc(order_col))
        docs = [r.asDict(recursive=True) for r in sample_df.limit(num_docs).collect()]
        return build_context_block(collection, schema, stats, docs)
