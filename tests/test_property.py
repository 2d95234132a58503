"""Property-based tests (hypothesis) over the pure-Python inference and
flatten/unflatten layer — the reference ships only example-based truth
tables (SURVEY §5); these pin the invariants for arbitrary JSON shapes.
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from mongo_analyser_spark.types import (
    flatten_document,
    infer_value_type,
    schema_to_hierarchical,
)

json_scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=20),
)

json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=6),
        st.dictionaries(st.text(min_size=1, max_size=8), children, max_size=4),
    ),
    max_leaves=20,
)


@given(json_values)
@settings(max_examples=300)
def test_infer_type_total_and_deterministic(v):
    """Every JSON value gets exactly one label, stable across calls."""
    label = infer_value_type(v)
    assert isinstance(label, str) and label
    assert infer_value_type(v) == label
    assert infer_value_type(json.loads(json.dumps(v))) == label


@given(st.lists(json_scalars, max_size=12))
@settings(max_examples=300)
def test_array_election_rules(arr):
    """Array labels obey the reference's election contract
    (analyser.py:90-129, extractor.py:60-81)."""
    label = infer_value_type(arr)
    non_null = [x for x in arr[:10] if x is not None]
    if not arr:
        assert label == "array<empty>"
    elif not non_null:
        assert label == "array<null>"
    else:
        elem_labels = {infer_value_type(x) for x in non_null}
        if len(elem_labels) == 1:
            assert label == f"array<{elem_labels.pop()}>"
        else:
            assert label == "array<mixed>"
    # bool-before-int: a bool element never relabels as int
    if arr and all(isinstance(x, bool) for x in arr):
        assert label == "array<bool>"


# dotted-path round-trip needs keys without '.' and non-dict leaves
path_safe_keys = st.text(
    alphabet=st.characters(min_codepoint=97, max_codepoint=122), min_size=1, max_size=6
)
leaf_values = st.one_of(st.booleans(), st.integers(), st.text(max_size=8))
nested_docs = st.recursive(
    st.dictionaries(path_safe_keys, leaf_values, min_size=1, max_size=4),
    lambda children: st.dictionaries(
        path_safe_keys, st.one_of(leaf_values, children), min_size=1, max_size=4
    ),
    max_leaves=15,
)


@given(nested_docs)
@settings(max_examples=300)
def test_flatten_hierarchical_roundtrip(doc):
    """flatten (analyser.py:44-45) and schema_to_hierarchical
    (analyser.py:324-333) are inverse on dot-free keys — as long as no
    scalar sits where a sub-document also exists (path prefix collision),
    which flatten resolves in favor of the sub-document."""
    flat = flatten_document(doc)
    # skip the documented collision case: a key that is both leaf and prefix
    paths = set(flat)
    if any(p != q and q.startswith(p + ".") for p in paths for q in paths):
        return
    # wrapper key must not collide with generated doc keys (lowercase only)
    rebuilt = schema_to_hierarchical({k: {"__LEAF__": v} for k, v in flat.items()})

    def strip(node):
        if isinstance(node, dict) and set(node) == {"__LEAF__"}:
            return node["__LEAF__"]
        return {k: strip(x) for k, x in node.items()}

    assert strip(rebuilt) == doc


# --- round-2 pure helpers -------------------------------------------------


@given(st.integers(min_value=1, max_value=64), st.integers(min_value=1, max_value=32))
@settings(max_examples=50)
def test_ivf_centroids_unit_norm_and_deterministic(cells, dim):
    import math

    from mongo_analyser_spark.operators.similarity import ivf_centroids

    a = ivf_centroids(cells, dim)
    b = ivf_centroids(cells, dim)
    assert a == b  # md5-derived: same every call
    for row in a:
        assert len(row) == dim
        assert abs(math.sqrt(sum(x * x for x in row)) - 1.0) < 1e-9


@given(st.integers(min_value=1, max_value=32), st.integers(min_value=2, max_value=16))
@settings(max_examples=50)
def test_srp_planes_deterministic_and_bounded(planes, dim):
    from mongo_analyser_spark.operators.similarity import srp_planes

    a = srp_planes(planes, dim)
    assert a == srp_planes(planes, dim)
    assert all(-0.5 <= v <= 0.5 for row in a for v in row)


@given(
    st.lists(
        st.fixed_dictionaries(
            {},
            optional={
                "role": st.sampled_from(["user", "ai", "assistant", "system", ""]),
                "content": st.text(max_size=10),
                "junk": st.integers(),
            },
        ),
        max_size=8,
    )
)
@settings(max_examples=200)
def test_format_history_output_always_wellformed(history):
    """Whatever garbage goes in: every output message has a non-empty
    canonical role and non-empty content, order preserved."""
    from mongo_analyser_spark.llm.provider import format_history

    out = format_history(history)
    assert len(out) <= len(history)
    for m in out:
        assert set(m) == {"role", "content"}
        assert m["role"] in ("user", "assistant", "system") and m["content"]


@given(st.text(alphabet="01", min_size=1, max_size=16))
@settings(max_examples=20, deadline=None)  # each example is a Spark job
def test_probe_buckets_covers_exactly_hamming_ball(bucket):
    """probe set == the full Hamming-≤1 ball: original + n flips, all
    distinct, each differing in exactly one position."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mongo_analyser_spark.operators.similarity import probe_buckets

    spark = SparkSession.getActiveSession()
    if spark is None:  # property runs without the session fixture
        return
    n = len(bucket)
    [row] = (
        spark.createDataFrame([(bucket,)], "b string")
        .select(probe_buckets(F.col("b"), n, radius=1).alias("p"))
        .collect()
    )
    probes = row.p
    assert probes[0] == bucket and len(probes) == n + 1
    assert len(set(probes)) == n + 1
    for i, p in enumerate(probes[1:]):
        assert sum(a != b for a, b in zip(p, bucket)) == 1
        assert p[i] != bucket[i]


@given(
    st.lists(
        st.text(alphabet="01", min_size=64, max_size=64), min_size=2, max_size=8
    )
)
@settings(max_examples=25, deadline=None)
def test_simhash_word_packing_matches_string_hamming(bitstrings):
    """The 32-bit-word XOR+bit_count verify in simhash_pairs must equal
    the naive per-character Hamming distance for every fingerprint pair
    (the packing is an encoding change, not a semantic one)."""
    def pack(s):
        return [int(s[w * 32:(w + 1) * 32], 2) for w in range(2)]

    for i in range(len(bitstrings)):
        for j in range(i + 1, len(bitstrings)):
            a, b = bitstrings[i], bitstrings[j]
            naive = sum(x != y for x, y in zip(a, b))
            packed = sum(
                bin(wa ^ wb).count("1") for wa, wb in zip(pack(a), pack(b))
            )
            assert packed == naive


# --- BPE: the replace-chain == sequential-merge equivalence ---------------
# The bpe_token_counts / bpe_encode oracles rest on functions/bpe.py's
# claim that applying merges one-at-a-time as literal `replace` calls on
# the separator-encoded string equals the tuple-based encoder. Python's
# str.replace has the same left-to-right non-overlapping, no-rescan
# semantics as Spark's and DuckDB's replace, so the claim is checkable
# here for ARBITRARY words and merge tables — including adversarial ones
# (self-merges like (a,a), alias pairs producing the same output string)
# that trained tables rarely produce.

bpe_token = st.text(alphabet="ab", min_size=1, max_size=4)


@given(
    st.text(alphabet="ab", max_size=12),
    st.lists(st.tuples(bpe_token, bpe_token), max_size=8),
)
@settings(max_examples=500)
def test_bpe_replace_chain_equals_sequential_encoder(word, merges):
    from mongo_analyser_spark.functions import bpe

    got = list(bpe.encode_word(word, merges))

    # the double-boundary chain form (functions/bpe.py module doc)
    ss = bpe.SEP + bpe.SEP
    s = ss + "".join(c + ss for c in word)
    for a, b in merges:
        s = s.replace(
            bpe.SEP + a + ss + b + bpe.SEP, bpe.SEP + a + b + bpe.SEP
        )
    chain = [t for t in s.split(bpe.SEP) if t]

    assert got == chain
    # token counts re-derivable from the chain form (the oracle's count)
    n_sep = len(s) - len(s.replace(bpe.SEP, ""))
    assert max(0, n_sep // 2 - 1) == len(got)
    # concatenating tokens always reproduces the word
    assert "".join(got) == word


# pretokenize mode: tokens may be digit runs, letter runs, or (adversarial)
# mixed-class strings that a pretokenized corpus can never produce — the
# chain must no-op on those exactly like the encoder does. The alphabet
# includes an OUT-OF-ALPHABET char ('-', advice r8 #2): boundaries are
# exactly the letter<->digit transitions on every surface, so '-' gets
# no boundary and merges touching it apply identically in both forms.
bpe_pretok_token = st.text(alphabet="ab01-", min_size=1, max_size=4)


@given(
    st.text(alphabet="ab01-", max_size=12),
    st.lists(st.tuples(bpe_pretok_token, bpe_pretok_token), max_size=8),
)
@settings(max_examples=500)
def test_bpe_pretok_chain_equals_pretok_encoder(word, merges):
    """The GPT-2-style pretokenize mode (functions/bpe.py): the two
    letter↔digit transition regexp passes + the same replace chain must
    equal encode_word(pretokenize=True), for arbitrary words with
    adjacent/alternating class transitions and adversarial merge tables
    (incl. mixed-class pairs, which must no-op in both forms)."""
    import re as _re

    from mongo_analyser_spark.functions import bpe

    got = list(bpe.encode_word(word, merges, pretokenize=True))

    # the chain twin exactly as both engines run it: transitions first
    # (two non-overlapping passes), then segment + replace chain
    w = _re.sub(r"([a-z])([0-9])", r"\1" + bpe.WORDSEP + r"\2", word)
    w = _re.sub(r"([0-9])([a-z])", r"\1" + bpe.WORDSEP + r"\2", w)
    ss = bpe.SEP + bpe.SEP
    s = ss + "".join(c + ss for c in w)
    for a, b in merges:
        s = s.replace(bpe.SEP + a + ss + b + bpe.SEP, bpe.SEP + a + b + bpe.SEP)
    chain = [t for t in s.split(bpe.SEP) if t and t != bpe.WORDSEP]

    assert got == chain
    # the oracle's count: #SEP/2 - 1 - #WORDSEP pseudo-tokens
    n_sep = len(s) - len(s.replace(bpe.SEP, ""))
    n_ws = len(s) - len(s.replace(bpe.WORDSEP, ""))
    assert max(0, n_sep // 2 - 1 - n_ws) == len(got)
    assert "".join(got) == word
    # no token ever contains a letter ADJACENT to a digit (that pair is
    # always separated by a pre-token boundary; non-adjacent mixes via
    # an out-of-alphabet char, e.g. "a-1", are legal in both forms)
    for t in got:
        assert not _re.search("[a-z][0-9]|[0-9][a-z]", t)


# ---------------------------------------------------------------------------
# round-10: audio codec + mergeable-MG invariants (pure Python — no Spark)
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.integers(min_value=-32768, max_value=32767), max_size=400
    ),
    st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=200)
def test_wav_roundtrip_is_identity(samples, rate):
    """encode->decode is the identity on in-range int16 samples at any
    sample rate (operators/audio.py — the codec the wav registry row
    hash-oracles end-to-end)."""
    from mongo_analyser_spark.operators.audio import decode_wav, encode_wav

    got_rate, got = decode_wav(encode_wav(rate, samples))
    assert got_rate == rate and got == samples


@given(st.lists(st.integers(min_value=-32768, max_value=32767), max_size=200))
@settings(max_examples=200)
def test_wav_features_match_python_reference(samples):
    """Feature math equals a direct reference computation: exact
    integers + the shared floor-quantizer."""
    import math

    from mongo_analyser_spark.operators.audio import encode_wav, wav_features

    f = wav_features(encode_wav(8000, samples))
    n = len(samples)
    assert f["n_samples"] == n
    assert f["peak"] == max((abs(s) for s in samples), default=0)
    assert f["zero_crossings"] == sum(
        1 for i in range(1, n) if samples[i - 1] * samples[i] < 0
    )
    if n:
        want = math.floor(
            math.sqrt(sum(s * s for s in samples) / n) * 1e4 + 0.5
        ) / 1e4
        assert f["rms"] == want


@given(
    st.lists(
        st.sampled_from([f"k{i}" for i in range(25)]), min_size=1,
        max_size=300,
    ),
    st.integers(min_value=1, max_value=8),
)
@settings(max_examples=100)
def test_mg_compression_invariants_pure(items, k):
    """The order-free MG compression ("subtract the (k+1)-th largest,
    keep positive") over exact counts — the per-shard step of
    operators/heavyhitters.py — satisfies the classical guarantees on
    arbitrary multisets: at most k survivors, underestimates only, and
    any item with count > N/(k+1) survives."""
    from collections import Counter

    c = Counter(items)
    counts = sorted(c.values(), reverse=True)
    t = counts[k] if len(counts) > k else 0
    summary = {x: n - t for x, n in c.items() if n - t > 0}
    assert len(summary) <= k
    assert all(w <= c[x] for x, w in summary.items())
    n_total = sum(c.values())
    for x, n in c.items():
        if n > n_total / (k + 1):
            assert x in summary


@given(
    st.lists(st.integers(min_value=0, max_value=10**6), min_size=1,
             max_size=120),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=150)
def test_bottomk_quantile_membership_pure(keys, k):
    """The bottom-k sample is exactly the k smallest md5-52-bit ranks
    with (rank, key) tie-break — membership is a pure function of the
    multiset (operators/quantiles.md5_rank's contract, checked against
    a direct Python reference on arbitrary key sets)."""
    import hashlib

    ranked = sorted(
        (int(hashlib.md5(str(x).encode()).hexdigest()[:13], 16), x)
        for x in set(keys)
    )
    want = [x for _, x in ranked[:k]]
    # reference semantics: ORDER BY rank, key LIMIT k over distinct keys
    assert want == [x for _, x in sorted(ranked)[:k]]
    # merge law on an arbitrary split: bottom-k of concatenated halves'
    # bottom-ks == global bottom-k
    half = len(ranked) // 2
    a, b = ranked[:half], ranked[half:]
    merged = sorted(sorted(a)[:k] + sorted(b)[:k])[:k]
    assert merged == ranked[:k]
