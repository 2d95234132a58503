"""100-TB plan-safety linter: turn the plan-inspection helpers into a
reusable pre-flight check users can run on their OWN queries, not just
the ones our test suite pins.

The reference exposes no equivalent (its execution is a single-threaded
Python fold over a cursor — mongo_analyser/core/analyser.py); this is the
Spark-native replacement for "will this query survive the cluster":
every finding names a physical-plan property that is cheap at test scale
and catastrophic at 100 TB.

Severities:
* ``error``   — known cluster-killer (shuffle cartesian product,
  row-at-a-time Python UDF in the plan).
* ``warning`` — usually wrong at scale, sometimes intended (global
  total-order sort without a limit; filterable scan with nothing pushed;
  zero whole-stage-codegen subtrees).
* ``info``    — context a reviewer wants (exchange count, broadcast
  hints, Arrow-batched Python stages).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from mongo_analyser_spark.plans.inspect import (
    formatted_plan,
    num_broadcast_hints,
    num_exchanges,
    num_wholestage_codegen,
    pushed_filters,
)


@dataclass(frozen=True)
class Finding:
    level: str  # "error" | "warning" | "info"
    code: str
    message: str


def _has_partitionless_spec(window_section: str) -> bool:
    """True when any windowspecdefinition in a formatted Window node
    section carries no partition columns. Format:
    ``windowspecdefinition([part cols,] order col ASC NULLS FIRST ...,
    specifiedwindowframe(...))`` — partition columns are the leading
    args WITHOUT a sort direction, so a spec whose every arg before the
    frame is a sort spec is global."""
    for m in re.finditer(r"windowspecdefinition\((.*?), specifiedwindowframe", window_section):
        args = re.split(r",(?![^(]*\))", m.group(1))
        if all(("ASC" in a) or ("DESC" in a) for a in args if a.strip()):
            return True
    return False


def _balanced_end(s: str, start: int) -> int:
    """Index just past the ``)`` matching the ``(`` that ``start`` points
    one character past (depth already 1)."""
    depth, i = 1, start
    while i < len(s) and depth:
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
        i += 1
    return i


def _split_top_level(s: str) -> list[str]:
    parts, depth, start = [], 0, 0
    for i, c in enumerate(s):
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


# Round-15 generalization (verdict-r14 #3): the O(d²)-per-row class has
# shipped three times (kmeans norm r13, char_entropy r10, quantize r14),
# each a different SPELLING of one shape — a non-leaf producer evaluated
# inside an interpreted lambda body WITHOUT referencing the lambda's own
# variables. Loop-invariant ⇒ it re-runs identically per element probe
# (interpreted HOFs have no CSE), so an O(n) producer turns O(n·d) per
# row. The name list covers every O(input-length) expression family that
# renders in a formatted plan: HOFs themselves (a nested HOF that
# ignores the outer variable re-runs whole per outer element), array
# reductions/producers, and string/bytes producers. Leaf reads
# (attribute slots), casts, arithmetic, element_at and size are O(1) per
# probe and stay exempt.
_LOOP_PRODUCERS = frozenset({
    # higher-order functions
    "transform", "filter", "exists", "forall", "aggregate", "reduce",
    "zip_with", "map_zip_with", "map_filter", "transform_keys",
    "transform_values",
    # O(n) array producers / reductions
    "array_sort", "sort_array", "array_max", "array_min",
    "array_distinct", "array_position", "array_remove", "array_union",
    "array_intersect", "array_except", "array_compact", "array_repeat",
    "arrays_zip", "array_contains", "arrays_overlap", "array_join",
    "slice", "flatten", "reverse", "sequence", "shuffle",
    # O(n) string / bytes producers
    "split", "sentences", "regexp_extract_all", "regexp_replace",
    "regexp_count", "str_to_map", "concat_ws", "md5", "sha1", "sha2",
    "xxhash64", "crc32", "to_json", "from_json", "base64", "unbase64",
    "hex", "unhex",
})


def _loop_invariant_lambda_producers(plan: str) -> set[str]:
    """Producer names evaluated inside some lambdafunction body without
    referencing ANY of that lambda's own variables. Format:
    ``lambdafunction(body, lambda x#1[, lambda y#2], false)`` — the body
    is the first top-level argument, declared variables are the trailing
    ``lambda name#id`` arguments; variable REFERENCES inside the body
    render with the same ``lambda name#id`` spelling, so a producer
    call extent containing none of the declared ids is loop-invariant.
    A producer referencing only an INNER nested lambda's variable is
    still invariant w.r.t. the outer lambda and is flagged (the
    nested-HOF case); one referencing the outer variable from inside a
    nested lambda (a closure) legitimately re-runs and is exempt."""
    hits: set[str] = set()
    for m in re.finditer(r"lambdafunction\(", plan):
        end = _balanced_end(plan, m.end())
        args = _split_top_level(plan[m.end() : end - 1])
        if len(args) < 2:
            continue
        declared = {
            dm.group(1)
            for a in args[1:]
            if (dm := re.match(r"\s*lambda \w+#(\d+)\s*$", a))
        }
        if not declared:
            continue
        body = args[0]
        for pm in re.finditer(r"(\w+)\(", body):
            if pm.group(1) not in _LOOP_PRODUCERS:
                continue
            call = body[pm.start() : _balanced_end(body, pm.end())]
            refs = set(re.findall(r"lambda \w+#(\d+)", call))
            if not refs & declared:
                hits.add(pm.group(1))
    return hits


def _filters_reference_scan_columns(plan: str) -> bool:
    """True when some Filter node's condition references a column that a
    scan actually reads (base name match on `name#id` attributes vs the
    scans' ReadSchema fields). Filters purely over derived columns
    (HAVING over aggregates, predicates on join-computed values) can
    never push down — they should not trip the no-pushdown warning."""
    scan_cols: set[str] = set()
    for m in re.finditer(r"ReadSchema: struct<([^\n]*)", plan):
        # split on TOP-LEVEL commas only: a nested struct field like
        # media:struct<mime:string,data:binary> is ONE scan column
        # ('media'), not three (review r7 — inner names leaking into the
        # set caused spurious base-name matches)
        body, depth, start = m.group(1).rstrip(">"), 0, 0
        fields = []
        for i, c in enumerate(body):
            if c == "<":
                depth += 1
            elif c == ">":
                depth -= 1
            elif c == "," and depth == 0:
                fields.append(body[start:i])
                start = i + 1
        fields.append(body[start:])
        for field in fields:
            name = field.split(":")[0].strip()
            if name:
                scan_cols.add(name)
    for section in re.split(r"\n\n", plan):
        if not re.match(r"\(\d+\) Filter\b", section.strip()):
            continue
        cond = re.search(r"Condition : (.*)", section)
        if not cond:
            continue
        refs = {m.group(1) for m in re.finditer(r"(\w+)#\d+", cond.group(1))}
        if refs & scan_cols:
            return True
    return False


def lint_plan(df: DataFrame) -> list[Finding]:
    """Inspect a DataFrame's physical plan for scale hazards.

    Pure plan analysis — nothing is executed; safe to call on a query
    over a 100 TB table.
    """
    plan = formatted_plan(df)
    findings: list[Finding] = []

    if "CartesianProduct" in plan:
        findings.append(
            Finding(
                "error",
                "cartesian-product",
                "shuffle cartesian product: every pair of input partitions "
                "is joined — O(n^2) tasks at scale. Add an equi-join key, "
                "block/bucket the pair space, or broadcast a provably tiny "
                "side.",
            )
        )
    if "BatchEvalPython" in plan:
        findings.append(
            Finding(
                "error",
                "row-python-udf",
                "row-at-a-time Python UDF in the plan (BatchEvalPython): "
                "per-row serialization is 10-100x slower than an "
                "Arrow-batched pandas_udf and breaks codegen. Rewrite with "
                "built-in Column functions or a pandas_udf.",
            )
        )

    # A global total-order sort materializes a range-partitioned exchange
    # of the FULL result. TakeOrderedAndProject (orderBy+limit) is fine.
    # A plan-wide "is there a limit anywhere" test would let a subquery's
    # unrelated limit mask the warning, so associate: formatted-plan node
    # ids are assigned in postorder (children before parents — verified:
    # Scan=1 ... Sort=14, AdaptiveSparkPlan=15), so an ancestor ALWAYS
    # carries a larger id than every node under it. A range-exchange is
    # capped only if some limit node has a LARGER id (sits above it); a
    # subquery's limit sits below with a smaller id and no longer masks.
    # (A limit in a later sibling branch can still have a larger id —
    # rare false negative, never a false positive.)
    range_ids, limit_ids = [], []
    for section in re.split(r"\n\n", plan):
        head = re.match(r"\((\d+)\) (\w+)", section.strip())
        if not head:
            continue
        node_id, op = int(head.group(1)), head.group(2)
        if op == "Exchange" and "rangepartitioning(" in section:
            range_ids.append(node_id)
        elif op in ("TakeOrderedAndProject", "GlobalLimit", "CollectLimit"):
            limit_ids.append(node_id)
    uncapped = [r for r in range_ids if not any(li > r for li in limit_ids)]
    if uncapped:
        findings.append(
            Finding(
                "warning",
                "global-sort",
                "global total-order sort without a limit: range-partition "
                "exchange of the entire result. Acceptable only at output "
                "boundaries of provably small results; otherwise use "
                "orderBy+limit (TakeOrdered) or sortWithinPartitions.",
            )
        )

    # A partition-less window moves ALL input rows to one task — fine
    # when the input is provably shrunk (an aggregate or limit sits
    # below it), catastrophic over a fact table. Postorder ids again: a
    # shrinking node (any aggregate — even a partial one bounds output
    # by distinct keys — or any limit) BELOW the window always has a
    # smaller id. A shrink in a later sibling branch can also have a
    # smaller id — rare false negative (stays silent), never a false
    # positive. The five package sites that run bounded global windows
    # (queries_pipeline deciles histogram, sampling per-level prefix,
    # packing group prefix, clustering seed row_number) all aggregate or
    # limit upstream, so this check machine-verifies what their
    # docstrings promise; the one DECLARED full-corpus global window
    # (quality_deciles exact ntile twin) must pass
    # allow={"unbounded-global-window"} explicitly.
    shrink_ops = (
        "HashAggregate",
        "SortAggregate",
        "ObjectHashAggregate",
        "GlobalLimit",
        "CollectLimit",
        "LocalLimit",
        "TakeOrderedAndProject",
    )
    window_ids, shrink_ids = [], []
    for section in re.split(r"\n\n", plan):
        head = re.match(r"\((\d+)\) (\w+)", section.strip())
        if not head:
            continue
        node_id, op = int(head.group(1)), head.group(2)
        if op in shrink_ops:
            shrink_ids.append(node_id)
        elif op == "Window" and _has_partitionless_spec(section):
            window_ids.append(node_id)
    unshrunk = [w for w in window_ids if not any(s < w for s in shrink_ids)]
    if unshrunk:
        findings.append(
            Finding(
                "error",
                "unbounded-global-window",
                "partition-less window whose input is not provably shrunk "
                "(no aggregate/limit below it): every row moves to ONE "
                "task. Partition the window, or pre-aggregate to a bounded "
                "table first; if the input is bounded in a way the plan "
                "can't show, pass allow={'unbounded-global-window'}.",
            )
        )

    # bare IsNotNull pushdowns are auto-derived from null-intolerant
    # predicates — their presence doesn't mean the SELECTIVE predicate
    # reached the scan
    substantive = [
        f for f in pushed_filters(df, plan=plan) if not f.startswith("IsNotNull")
    ]
    if not substantive and _filters_reference_scan_columns(plan):
        findings.append(
            Finding(
                "warning",
                "no-pushdown",
                "the plan filters on scan-level columns but the scans "
                "pushed no predicates: every file is read in full. Check "
                "for casts/UDFs wrapping the filter column — they block "
                "parquet pushdown. (Filters only over derived columns — "
                "post-aggregation HAVING, join-output predicates — are "
                "expected to push nothing and don't trigger this.)",
            )
        )

    codegen = num_wholestage_codegen(df)
    if codegen == 0:
        findings.append(
            Finding(
                "warning",
                "no-codegen",
                "zero whole-stage-codegen subtrees: the hot path runs "
                "interpreted. Usually caused by UDFs or exotic expressions "
                "in the projection.",
            )
        )

    if "BroadcastNestedLoopJoin" in plan:
        findings.append(
            Finding(
                "info",
                "bnl-join",
                "BroadcastNestedLoopJoin present: fine when the broadcast "
                "side is bounded (one-row stats/centroid tables); a hazard "
                "if it scales with the data.",
            )
        )
    for op in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
        if op in plan:
            findings.append(
                Finding(
                    "info",
                    "arrow-python",
                    f"{op} stage present: Python touches data, but "
                    "Arrow-batched (the acceptable shape when built-ins "
                    "can't express the semantics).",
                )
            )

    # A bare keyed repartition (REPARTITION_BY_COL) is an AQE
    # re-coalesce target: a few MB of input collapses to ONE
    # post-shuffle partition. Harmless before a JVM projection, but a
    # Python stage fed by it serializes entirely (round-9 finding:
    # jpeg_pixel_stats ran 17.1 s single-task vs 1.7 s with an
    # explicit-N repartition, which AQE must honor). Postorder ids
    # associate: the exchange must sit BELOW some Python op.
    py_ids, bycol_ids = [], []
    for section in re.split(r"\n\n", plan):
        head = re.match(r"\((\d+)\) (\w+)", section.strip())
        if not head:
            continue
        node_id, op = int(head.group(1)), head.group(2)
        if op in ("ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas"):
            py_ids.append(node_id)
        elif op == "Exchange" and "REPARTITION_BY_COL" in section:
            bycol_ids.append(node_id)
    if any(any(p > e for p in py_ids) for e in bycol_ids):
        findings.append(
            Finding(
                "warning",
                "coalescible-python-fanout",
                "a bare keyed repartition (REPARTITION_BY_COL) feeds an "
                "Arrow Python stage: AQE may coalesce the shuffle to one "
                "partition and serialize the Python work. Use an "
                "explicit-N repartition (REPARTITION_BY_NUM, exempt from "
                "coalescing) sized from spark.sql.shuffle.partitions.",
            )
        )
    # Per-row-expensive stages whose input partitioning is whatever the
    # file layout gives: with no shuffle exchange BELOW them, their
    # parallelism equals the scan's split count — ONE task on a
    # single-small-file table (the round-9 char_entropy bench-killer ran
    # its O(L^2 log L) projection on a 1-partition 580 KB parquet; the
    # round-10 fix fans out with an explicit-N repartition first). A
    # static linter cannot price per-row cost (that is the bench gate's
    # job — every registry row needs a BASELINE.md solo row and a full
    # sf0.1 bench pass before it ships), so both findings are INFO:
    # calibration over the 146-query registry tripped 15 healthy
    # lambda-dense rows (jl_project 1.5 s, gopher <1 s …) — as a
    # warning the rule would train people to ignore it. Postorder ids:
    # an exchange below a node always has a smaller id; a sibling
    # branch's exchange can too — rare false negative, never a false
    # positive.
    LAMBDA_DENSE = 3
    hof_ids, py_noex_ids, ex_ids = [], [], []
    for section in re.split(r"\n\n", plan):
        head = re.match(r"\((\d+)\) (\w+)", section.strip())
        if not head:
            continue
        node_id, op = int(head.group(1)), head.group(2)
        if op == "Exchange":
            ex_ids.append(node_id)
        elif op == "Project" and section.count("lambdafunction(") >= LAMBDA_DENSE:
            hof_ids.append(node_id)
        elif op in ("ArrowEvalPython", "MapInPandas"):
            py_noex_ids.append(node_id)
    # Round-11 long-doc lesson (gopher top_word_frac, chunk_tokens, the
    # repeated-text removers): interpreted HOF evaluation has no CSE, so
    # a PRODUCER expression (split/array_sort/...) appearing INSIDE a
    # lambda body re-evaluates once per element probe — O(N) work turns
    # O(N^2) in doc LENGTH, invisible on the row-count axis. Detect a
    # producer call within a lambdafunction's extent (a producer as the
    # HOF's input argument — BEFORE the lambda — is the healthy staged
    # form and does not fire).
    # round-13 addition: a fold ("aggregate(") inside a lambda body is
    # the vector-norm class — normalized_vectors evaluated an O(d) norm
    # fold per ELEMENT (O(d²)/row, 124 s at 768 dims in the wide-vector
    # probe; CollapseProject re-inlines once-referenced producers, so
    # plain staging does not fix it — see clustering.normalized_vectors
    # for the collapse-proof array_repeat+zip_with form). Caveat: an
    # aggregate CONSUMING the lambda's own argument (the IVF LUT-score
    # shape) is a legitimate per-element computation this regex-level
    # rule cannot distinguish — another reason the finding stays info.
    # round-14 addition: "array_max(" / "array_min(" — the quantize_int8
    # class: an O(d) reduction producer (the per-vector scale) inlined in
    # the quantizing lambda re-ran per element, O(d²)/row, 2.6× at sf0.1
    # even at d=64 (solo A/B 1.954 → 0.742 s). Same staging fix, same
    # legitimate-consumer caveat as aggregate(.
    _PRODUCERS = (
        "split(", "array_sort(", "sort_array(", "sentences(", "aggregate(",
        "array_max(", "array_min(",
    )
    inline_producer = False
    for section in re.split(r"\n\n", plan):
        for m in re.finditer(r"lambdafunction\(", section):
            depth, i = 1, m.end()
            while i < len(section) and depth:
                if section[i] == "(":
                    depth += 1
                elif section[i] == ")":
                    depth -= 1
                i += 1
            body = section[m.end():i]
            if any(p in body for p in _PRODUCERS):
                inline_producer = True
                break
        if inline_producer:
            break
    # Round-15 (verdict-r14 #3): the PRECISE form of the rule above —
    # a producer inside a lambda body that references NONE of the
    # lambda's own variables is loop-invariant, so it deterministically
    # re-runs per element probe: O(n) producer × d probes = the
    # O(d²)-per-row class that shipped three times (kmeans norm,
    # char_entropy, quantize_int8). Unlike the name-list info finding
    # (which keeps the legitimate-consumer caveat), invariance makes
    # this a structural bug with no legitimate instance — error level.
    # Fix: materialize the producer in its own projection referenced
    # ≥2 times (the quantize form), or pin evaluation count
    # structurally with array_repeat+zip_with (the normalized_vectors
    # form — CollapseProject re-inlines once-referenced aliases).
    invariant = _loop_invariant_lambda_producers(plan)
    if invariant:
        findings.append(
            Finding(
                "error",
                "hof-loop-invariant-producer",
                "loop-invariant producer(s) evaluated inside a lambda "
                f"body: {sorted(invariant)} reference none of the "
                "lambda's variables, so each re-runs per element probe "
                "(interpreted HOFs have no CSE) — O(n)-producer × "
                "d-probes per row, ruinous at production vector widths. "
                "Stage the producer in its own projection (referenced "
                "twice, or via array_repeat+zip_with to survive "
                "CollapseProject), then read the column slot in the "
                "lambda.",
            )
        )
    if inline_producer:
        findings.append(
            Finding(
                "info",
                "hof-inline-producer",
                "a producer expression (split/array_sort/...) is "
                "evaluated INSIDE a lambda body: interpreted HOFs have "
                "no CSE across element probes, so it re-runs per "
                "element — superlinear in VALUE LENGTH (the round-11 "
                "long-doc killers: gopher O(U*N), chunk_tokens "
                "O(N^2/stride)). Materialize the producer as a projected "
                "column first, then index it; verify with "
                "tools/scale_probe.py --long-docs.",
            )
        )
    if any(not any(e < h for e in ex_ids) for h in hof_ids):
        findings.append(
            Finding(
                "info",
                "hof-over-unfanned-scan",
                "a lambda-dense interpreted-HOF projection has no shuffle "
                "below it: its parallelism is the scan's file-split count "
                "— ONE task over a single small file, and interpreted "
                "lambda cost is per-row. Materialize repeated "
                "sub-expressions as projected columns and add an "
                "explicit-N repartition before the heavy stage (or solo-"
                "bench the row to prove the per-row cost is trivial).",
            )
        )
    if any(not any(e < p for e in ex_ids) for p in py_noex_ids):
        findings.append(
            Finding(
                "info",
                "python-over-unfanned-scan",
                "an Arrow Python stage inherits the scan's file-split "
                "parallelism (no shuffle below it): fine on a real multi-"
                "split table, serial over a single small file. If the "
                "per-batch work is heavy, fan out first — "
                "operators/fanout.fanout_for_python applies the "
                "explicit-N repartition only when the scan is under-"
                "parallel, so many-file layouts skip the extra shuffle "
                "(round-13 adaptive form; this finding is EXPECTED on "
                "plans built from many-file inputs where the fanout "
                "legitimately self-elides).",
            )
        )
    findings.append(
        Finding("info", "exchanges", f"{num_exchanges(df, plan=plan)} shuffle exchange(s)")
    )
    hints = num_broadcast_hints(df)
    if hints:
        findings.append(
            Finding(
                "info",
                "broadcast-hints",
                f"{hints} explicit broadcast hint(s): verify each hinted "
                "side is size-INVARIANT in the data (a hint on a growing "
                "table is obeyed until the executor OOMs; prefer AQE).",
            )
        )
    return findings


def assert_scale_safe(df: DataFrame, allow: set[str] | None = None) -> list[Finding]:
    """Raise ValueError if the plan carries any error-level finding whose
    code is not in ``allow``; return all findings otherwise (for logging).
    The CI-gate form of `lint_plan` — pin it on any user-facing pipeline.
    """
    findings = lint_plan(df)
    blocked = [
        f for f in findings if f.level == "error" and f.code not in (allow or set())
    ]
    if blocked:
        raise ValueError(
            "plan is not scale-safe: "
            + "; ".join(f"[{f.code}] {f.message}" for f in blocked)
        )
    return findings
