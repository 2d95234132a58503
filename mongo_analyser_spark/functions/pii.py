"""EXTENDED PII scrubbing [EXT — north-star curation]: the round-4
email/url/phone tier (functions/text.py:107 ``PII_PATTERNS`` /
``scrub_pii``, still registered as ``pii_scrub_documents``) widened
with IPv4 addresses and long-digit-run IDs, plus per-category counts
decomposed on the progressively-scrubbed text so no span double-counts
across categories. (Reference parity anchor: the reference redacts
credentials from Mongo URIs for display — sources/mongodb.py carries
that port; this lifts the same concern to corpus scale.)

Engine-portable by construction: every pattern is a single regex with
no lookarounds, no backrefs, and no ambiguous alternations, so Java
regex (Spark `regexp_replace`) and RE2 (DuckDB) produce identical
scans; the chain applies in a FIXED order (url → email → ipv4 → phone →
digit-run) so earlier replacements' placeholder tokens (which contain
letters like ``<email>``) can never re-match later numeric patterns.
The whole scrub is one fused Column expression chain — JVM-side,
whole-stage codegen, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (name, pattern, replacement) — applied in ORDER. Patterns restrict
#: to the lowercase alphabet the corpus normalizer emits plus the
#: characters PII introduces; \b word guards keep digit-run and ip from
#: eating parts of longer tokens.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^ ]+", "<url>"),
    ("email", r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z][a-z]+", "<email>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<ip>"),
    # no leading \b: space→'+' is not a word boundary, and a left guard
    # would silently skip "+555-..." forms (classic scrubber pitfall)
    ("phone", r"\+?[0-9]{3}-[0-9]{3,4}-[0-9]{4}\b", "<phone>"),
    ("digit_run", r"\b[0-9]{7,}\b", "<id>"),
]


def scrub_pii(col: Column | str) -> Column:
    """The scrubbed text: every pattern replaced by its placeholder, in
    the fixed chain order."""
    c = F.col(col) if isinstance(col, str) else col
    for _, pat, tok in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tok)
    return c


def pii_counts(col: Column | str) -> list[Column]:
    """One ``n_<name>`` count column per pattern — counted on the SAME
    progressively-scrubbed text each pattern actually saw, so the counts
    decompose the scrub exactly (an email is never also counted as a
    digit run)."""
    c = F.col(col) if isinstance(col, str) else col
    out = []
    for name, pat, tok in PII_PATTERNS:
        out.append(
            F.size(F.regexp_extract_all(c, F.lit(pat), 0)).cast("long").alias(f"n_{name}")
        )
        c = F.regexp_replace(c, pat, tok)
    return out


def scrub_pii_sql(col_sql: str) -> str:
    """DuckDB twin of ``scrub_pii`` — same patterns, same order, 'g'
    flag matching Spark's replace-all default."""
    s = col_sql
    for _, pat, tok in PII_PATTERNS:
        s = f"regexp_replace({s}, '{pat}', '{tok}', 'g')"
    return s


def pii_count_sql(col_sql: str, upto: int) -> str:
    """DuckDB count for pattern ``upto`` over the text as scrubbed by
    patterns 0..upto-1 (the ``pii_counts`` decomposition)."""
    s = col_sql
    for _, pat, tok in PII_PATTERNS[:upto]:
        s = f"regexp_replace({s}, '{pat}', '{tok}', 'g')"
    name, pat, _ = PII_PATTERNS[upto]
    return f"CAST(len(regexp_extract_all({s}, '{pat}')) AS BIGINT)"
