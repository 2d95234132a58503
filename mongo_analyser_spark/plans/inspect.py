"""Physical-plan inspection: the engine's scale-verification surface.

The reference has no optimizer to inspect (SURVEY §4.3 — a single-threaded
Python fold). Here the optimizer IS Catalyst, so "is this operator
100-TB-safe" is a checkable property of the physical plan: filters reached
the parquet scan (PushedFilters), the scan reads only needed columns
(ReadSchema), small dimensions broadcast instead of shuffling the fact
table, and hot expressions stay inside whole-stage codegen. These helpers
parse `explain("formatted")` output into assertions; tests/test_plans.py
pins the properties for the headline queries so a regression that
de-optimizes a plan fails CI, not the cluster.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame, mode: str = "formatted") -> str:
    """The explain() text as a string (explain() itself only prints)."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def pushed_filters(df: DataFrame, plan: str | None = None) -> list[str]:
    """All filters the scans pushed into the parquet reader, e.g.
    ['IsNotNull(ts)', 'GreaterThan(value,10.0)']. Empty list = nothing
    pushed (a full-scan smell when the query has a selective filter).
    Pass ``plan`` to reuse an already-rendered formatted_plan string
    (each render round-trips Py4J)."""
    if plan is None:
        plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            # split on commas not inside parens: EqualTo(r_name,ASIA) is one
            out.extend(p.strip() for p in re.split(r",(?![^(]*\))", body))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings, one per file scan — shows column
    pruning (a scan listing columns the query never touches is wrong)."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def num_exchanges(df: DataFrame, plan: str | None = None) -> int:
    """Shuffle count (Exchange operators, excluding broadcast exchanges —
    broadcasts move only the small side). Every extra exchange is a full
    re-shuffle of the data at scale. Pass ``plan`` to reuse an
    already-rendered formatted_plan string."""
    if plan is None:
        plan = formatted_plan(df)
    # detail entries look like "(30) Exchange"; BroadcastExchange won't match
    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def num_wholestage_codegen(df: DataFrame) -> int:
    """Whole-stage-codegen subtree count; expressions outside codegen run
    interpreted row-at-a-time on the JVM (or worse, in Python).

    AQE wraps the un-executed plan in AdaptiveSparkPlan, which reports 0
    codegen subtrees before runtime re-planning — so probe a re-plan of
    the same logical plan with AQE off (planning happens inside the
    conf scope; the conf is restored after)."""
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        replanned = DataFrame(df._jdf.toDF(), spark)
        plan = formatted_plan(replanned, mode="codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    return int(m.group(1)) if m else 0


def num_broadcast_hints(df: DataFrame) -> int:
    """Count of EXPLICIT broadcast hints (F.broadcast / /*+ BROADCAST */)
    in the analyzed logical plan. Hints on sf-proportional tables are a
    100-TB hazard: AQE can demote an oversized auto-broadcast, but an
    explicit hint is obeyed until the executor OOMs. Plan pins assert the
    hint count so only fixed-size dims (nation/region) carry hints."""
    analyzed = df._jdf.queryExecution().analyzed().toString()
    return len(re.findall(r"ResolvedHint \(strategy=broadcast\)", analyzed))


def num_raw_stream_equijoins(df: DataFrame) -> int:
    """Count of equi-join operators (SMJ/SHJ/BHJ) that consume a RAW
    exploded stream — i.e. have a Generate descendant reachable without
    crossing an aggregate. Each such join re-shuffles or re-probes the
    full corpus-sized stream; joins below an aggregate only touch the
    shrunk type tables. The Kneser-Ney pre-fold pin asserts exactly ONE
    such join (round-9 advice: three corpus-stream joins collapsed to
    one by folding the factor tables onto the shrunk c2 first).

    Parses the simple-mode physical plan tree by indentation (3 chars
    per level; AQE off so the final operators are visible)."""
    spark = df.sparkSession
    old = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        replanned = DataFrame(df._jdf.toDF(), spark)
        plan = formatted_plan(replanned, mode="simple")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)

    nodes = []  # (depth, name)
    for line in plan.splitlines():
        m = re.match(r"^([ :+|-]*)(?:\*\(\d+\) )?([A-Za-z][A-Za-z0-9]*)", line)
        if not m:
            continue
        nodes.append((len(m.group(1)) // 3, m.group(2)))

    joins = 0
    for i, (d, name) in enumerate(nodes):
        if name not in (
            "SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"
        ):
            continue
        blocked_below: int | None = None
        for dd, nn in nodes[i + 1:]:
            if dd <= d:
                break
            if blocked_below is not None:
                if dd > blocked_below:
                    continue
                blocked_below = None
            if nn in ("HashAggregate", "ObjectHashAggregate",
                      "SortAggregate"):
                blocked_below = dd
                continue
            if nn == "Generate":
                joins += 1
                break
    return joins


def plan_report(df: DataFrame) -> dict:
    """One-call summary used by tests and by humans iterating on a plan."""
    return {
        "pushed_filters": pushed_filters(df),
        "read_schemas": read_schemas(df),
        "broadcast_hash_join": has_broadcast_hash_join(df),
        "sort_merge_join": has_sort_merge_join(df),
        "exchanges": num_exchanges(df),
        "wholestage_codegen": num_wholestage_codegen(df),
    }
