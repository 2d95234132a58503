"""Byte-pair-encoding token math [EXT — BASELINE.json north star]:
tokenizer-exact token counting for the training-data curation tier.

The reference's only token-counting surface is its LLM context budget
(mongo_analyser/views/chat_view.py:451-464 — a whitespace heuristic over
chat history); a real training pipeline budgets in TOKENIZER tokens,
where whitespace counts are 1.3-1.7x off on English and worse elsewhere.
This module provides the missing piece as three cooperating layers:

* ``train_bpe`` — learn a merge table from a corpus. Spark does ONE
  word-frequency shuffle + a bounded top-``max_words`` TakeOrdered; the
  classic Sennrich pair-count loop then runs driver-side over that
  bounded word-frequency dict (the standard formulation: BPE training
  only ever needs word TYPES with counts, not the corpus). At 100 TB the
  collected state is `max_words` rows, not data-sized.
* ``with_bpe_token_count`` — the scale path: Arrow-batched
  ``mapInPandas`` with the merge table shipped as broadcast DATA and a
  per-batch word->len memo (Zipf makes the cache hit rate ~1).
* ``bpe_segment_expr`` / ``bpe_count_from_segmented`` — a pure Column
  twin: the merge loop unrolled as a chain of literal `replace` calls
  over a separator-encoded form. Plain string functions, reproducible
  bit-for-bit in DuckDB — this is what makes the Arrow path's output
  HASH-ORACLE-able instead of rows-only.

Equivalence of the two paths (why the replace chain IS BPE): applying
merges one-at-a-time in rank order equals priority-queue greedy BPE,
because merging the rank-r pair can only create adjacencies involving
its OWN output token, and every trained merge containing that token has
rank > r (the token did not exist earlier in training); pairs of
pre-existing tokens can never newly appear (a merge only removes their
occurrences). Within one merge, `replace` consumes occurrences
left-to-right without rescanning the replacement — exactly the
single-pass semantics `_merge_word` implements, so "aaa" under (a,a)
yields [aa, a] in both.

Why boundaries are DOUBLE separators ("||tok||tok||"): each boundary
carries two SEPs and the pattern `|a||b|` consumes exactly one from
each side. A single-separator form is UNSOUND in two dual ways the
property test (tests/test_property.py) exposes: with trailing-only
separators the pattern "b|b|" can match a token's proper SUFFIX across
a boundary (word "abb" under [(a,b),(b,b)] would collapse to "abb"
instead of [ab, b]); with single wrapped separators two consecutive
matches SHARE a pipe, so "aaaa" under (a,a) would miss its second
merge. The double-pipe form leaves one pipe for the neighbor match
while still anchoring both token edges, and the equivalence holds for
arbitrary merge tables — property-tested against `encode_word` on
random words and adversarial tables, not just the trained fixture.

Token alphabet: the caller passes text whose words are drawn from
[a-z0-9]+ (``functions.text.normalize_text`` output — the testdata's
documents.text is already in this form). The two separator characters
below are outside that alphabet by construction.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: intra-word symbol separator in the segmented encoding — every token
#: (including the last of a word) is FOLLOWED by one SEP
SEP = "|"
#: word-boundary marker (replaces the space); never part of any merge,
#: so no replace pattern can span a word boundary
WORDSEP = "~"

_MERGES_FIXTURE = Path(__file__).with_name("bpe_merges.json")


def load_fixture_merges() -> list[tuple[str, str]]:
    """The committed merge table (trained once by ``train_bpe`` on the
    sf0.001 documents corpus, 64 merges — see tests/test_bpe.py which
    re-derives and pins it). A FIXED table keeps the registry oracle
    static across scale factors, exactly like the SRP plane fixture."""
    return [tuple(p) for p in json.loads(_MERGES_FIXTURE.read_text())]


#: GPT-2-style pre-tokenization, restricted to the normalize_text
#: alphabet [a-z0-9]: the public GPT-2 splitter's ` ?\p{L}+ | ?\p{N}+`
#: alternation reduces here to maximal letter runs vs digit runs (the
#: space/contraction/punct branches are vacuous after normalization).
#: Merges never cross a pre-token boundary — "abc123" can never produce
#: a mixed "c1" token, matching the real tokenizer's behavior.
#:
#: Boundaries are EXACTLY the letter<->digit transitions — the same two
#: classes the Column/SQL twins and train_bpe's splitter use. Out-of-
#: alphabet characters introduce NO boundary (they simply never match a
#: transition), so all four surfaces agree even on un-normalized input
#: like "a-b" (previously this function isolated "-" as its own
#: pre-token while the replace-chain twins did not — advice r8 #2).
_PRETOK_RE = re.compile(r"(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])")


def pretokenize_word(word: str) -> list[str]:
    """Split one word into GPT-2-style pre-tokens at letter<->digit
    transitions (identical boundary set to ``bpe_segment_expr``/
    ``bpe_segment_sql`` with ``pretokenize=True``)."""
    if not word:
        return []
    return _PRETOK_RE.split(word)


def _merge_word(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    """One left-to-right non-rescanning merge pass — the tuple-form twin
    of `replace(s, 'a|b|', 'ab|')`."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def encode_word(
    word: str, merges: list[tuple[str, str]], pretokenize: bool = False
) -> tuple[str, ...]:
    """Tokenize one word: start from characters, apply every merge in
    rank order (sequential application == greedy BPE, see module doc).
    With ``pretokenize=True`` the word is first split into GPT-2-style
    letter/digit runs and each run encodes independently (merges cannot
    cross a run boundary)."""
    if pretokenize:
        out: list[str] = []
        for run in pretokenize_word(word):
            out.extend(encode_word(run, merges))
        return tuple(out)
    syms = tuple(word)
    # r15 (guide §1.2 per-task work): a merge can only apply when both
    # halves are present in the CURRENT symbol sequence, so two set
    # lookups replace a full scan for every inapplicable merge (most of
    # the table, for typical words). _merge_word is identity when the
    # pair is absent, so skipping is output-identical; every applied
    # merge shortens the sequence, so a length change is the exact
    # "applied" signal for refreshing the set.
    present = set(syms)
    for a, b in merges:
        if len(syms) < 2:
            break
        if a in present and b in present:
            merged = _merge_word(syms, a, b)
            if len(merged) != len(syms):
                syms = merged
                present = set(syms)
    return syms


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 64,
    max_words: int = 50_000,
    min_pair_count: int = 2,
    pretokenize: bool = False,
) -> list[tuple[str, str]]:
    """Learn a BPE merge table from a corpus column.

    Distributed part: word frequencies (one groupBy shuffle with
    map-side combine) truncated to the ``max_words`` most frequent types
    (TakeOrdered — count desc, word asc, deterministic). Driver part:
    the classic pair-counting loop over that bounded dict. Ties on pair
    count break to the lexicographically smallest pair; training stops
    early when the best pair occurs fewer than ``min_pair_count`` times
    (merging hapax pairs memorizes the sample).

    With ``pretokenize=True`` the frequency units are GPT-2-style
    letter/digit runs instead of whole words (same two regexp passes as
    the Column twin, JVM-side), so no trained merge can ever cross a
    letter↔digit boundary."""
    col = F.col(text_col)
    if pretokenize:
        col = F.regexp_replace(col, "([a-z])([0-9])", "$1 $2")
        col = F.regexp_replace(col, "([0-9])([a-z])", "$1 $2")
    rows = (
        df.select(F.explode(F.split(col, " ")).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), "w")
        .limit(max_words)
        .collect()
    )
    vocab: dict[tuple[str, ...], int] = {tuple(r["w"]): r["c"] for r in rows}
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        mx = max(pairs.values())
        if mx < min_pair_count:
            break
        best = min(p for p, c in pairs.items() if c == mx)
        merges.append(best)
        vocab = {
            _merge_word(syms, *best): c for syms, c in vocab.items()
        }
    return merges


def with_bpe_token_count(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "n_bpe",
    pretokenize: bool = False,
) -> DataFrame:
    """Append a tokenizer-exact token count column — the SCALE path.

    Arrow-batched ``mapInPandas`` (never row-at-a-time); the merge table
    travels as an explicit broadcast variable (constant-size plan, like
    the SRP planes / k-means centroids), and a word->token-count memo
    persists across rows within each Python worker task so the encode
    loop runs once per word TYPE, not per occurrence."""
    bc = df.sparkSession.sparkContext.broadcast(list(merges))
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{fields}, `{out_col}` bigint"

    def run(batches):
        m = [tuple(p) for p in bc.value]
        memo: dict[str, int] = {}

        def count(text) -> int:
            if text is None:
                return 0
            total = 0
            for w in text.split(" "):
                if not w:
                    continue
                n = memo.get(w)
                if n is None:
                    n = len(encode_word(w, m, pretokenize=pretokenize))
                    memo[w] = n
                total += n
            return total

        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [count(t) for t in pdf[text_col]]
            yield pdf

    return df.mapInPandas(run, schema=schema)


def with_bpe_tokens(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
    count_col: str = "n_bpe",
    pretokenize: bool = False,
) -> DataFrame:
    """Append the full token SEQUENCE (space-joined surface strings) and
    its length — the encode twin of ``with_bpe_token_count``, same Arrow
    shape and broadcast merge table, with the per-task memo caching the
    encoded tuple instead of just its length."""
    bc = df.sparkSession.sparkContext.broadcast(list(merges))
    fields = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema)
    schema = f"{fields}, `{out_col}` string, `{count_col}` bigint"

    def run(batches):
        m = [tuple(p) for p in bc.value]
        memo: dict[str, tuple[str, ...]] = {}

        def enc(text):
            if text is None:
                return "", 0
            toks: list[str] = []
            for w in text.split(" "):
                if not w:
                    continue
                t = memo.get(w)
                if t is None:
                    t = encode_word(w, m, pretokenize=pretokenize)
                    memo[w] = t
                toks.extend(t)
            return " ".join(toks), len(toks)

        for pdf in batches:
            pdf = pdf.copy()
            enc_pairs = [enc(t) for t in pdf[text_col]]
            pdf[out_col] = [p[0] for p in enc_pairs]
            pdf[count_col] = [p[1] for p in enc_pairs]
            yield pdf

    return df.mapInPandas(run, schema=schema)


# --- pure-Column twin (the oracle-able unrolled form) ---------------------


def bpe_segment_expr(
    col: Column | str,
    merges: list[tuple[str, str]],
    pretokenize: bool = False,
) -> Column:
    """The segmented-string form after all merges, as ONE Column
    expression: spaces -> WORDSEP, every char suffixed with a DOUBLE
    SEP and the string prefixed with one ("||a||b||"), then one literal
    `replace('|a||b|' -> '|ab|')` per merge in rank order (see module
    doc for why boundaries must be double). Materialize it via
    .alias(...) in its own projection before counting so the chain is
    evaluated once (CollapseProject keeps non-cheap expressions from
    being inlined into multiple consumers).

    ``pretokenize=True`` inserts a WORDSEP at every letter↔digit
    transition BEFORE segmenting — two sequential non-overlapping regexp
    passes (letter→digit first, then digit→letter; one combined pass
    would miss the second boundary of "a1a" because replace scans resume
    AFTER each replacement, and the shared digit overlaps both matches).
    WORDSEP never appears in any merge, so no chain pattern can cross a
    pre-token boundary — exactly `encode_word(pretokenize=True)`."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.replace(c, F.lit(" "), F.lit(WORDSEP))
    if pretokenize:
        c = F.regexp_replace(c, "([a-z])([0-9])", "$1" + WORDSEP + "$2")
        c = F.regexp_replace(c, "([0-9])([a-z])", "$1" + WORDSEP + "$2")
    s = F.concat(
        F.lit(SEP + SEP),
        F.regexp_replace(c, "(.)", "$1" + SEP + SEP),
    )
    for a, b in merges:
        s = F.replace(
            s, F.lit(SEP + a + SEP + SEP + b + SEP), F.lit(SEP + a + b + SEP)
        )
    return s


def bpe_count_from_segmented(seg: Column | str) -> Column:
    """Token count from a segmented string "||t1||t2||...||tk||":
    #SEP == 2*(k+1) where k counts '~' pseudo-tokens too, so
    k_real = #SEP/2 - 1 - #WORDSEP (clamped at 0 for empty text, whose
    segmented form is the bare '||' prefix)."""
    s = F.col(seg) if isinstance(seg, str) else seg
    n_sep = F.length(s) - F.length(F.replace(s, F.lit(SEP), F.lit("")))
    n_ws = F.length(s) - F.length(F.replace(s, F.lit(WORDSEP), F.lit("")))
    return F.greatest(
        F.lit(0).cast("long"),
        ((n_sep / 2).cast("long") - 1 - n_ws).cast("long"),
    )


def bpe_segment_sql(
    col_sql: str, merges: list[tuple[str, str]], pretokenize: bool = False
) -> str:
    """DuckDB twin of ``bpe_segment_expr`` — same chain, same order; use
    inside a CTE so the chain appears once in the query text. The
    pretokenize transition passes use the same two-pass non-overlapping
    form (RE2 has no lookaround; semantics match Java's resume-after-
    replacement scan, property-tested)."""
    ss = SEP + SEP
    inner = f"replace({col_sql}, ' ', '{WORDSEP}')"
    if pretokenize:
        inner = (
            f"regexp_replace({inner}, '([a-z])([0-9])', '\\1{WORDSEP}\\2', 'g')"
        )
        inner = (
            f"regexp_replace({inner}, '([0-9])([a-z])', '\\1{WORDSEP}\\2', 'g')"
        )
    s = f"'{ss}' || regexp_replace({inner}, '(.)', '\\1{ss}', 'g')"
    for a, b in merges:
        s = f"replace({s}, '{SEP}{a}{ss}{b}{SEP}', '{SEP}{a}{b}{SEP}')"
    return s


def bpe_count_sql(seg_sql: str) -> str:
    """DuckDB twin of ``bpe_count_from_segmented``."""
    n_sep = f"(length({seg_sql}) - length(replace({seg_sql}, '{SEP}', '')))"
    n_ws = f"(length({seg_sql}) - length(replace({seg_sql}, '{WORDSEP}', '')))"
    return f"CAST(GREATEST(0, {n_sep} // 2 - 1 - {n_ws}) AS BIGINT)"
