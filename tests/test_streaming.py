"""Streaming operators: batch/stream parity on the same files.

The windowing builders are checked three ways:
* the DuckDB oracle hash-checks the batch twins (driver gate);
* here, a real Structured Streaming run (readStream → memory sink,
  availableNow trigger) must converge to the batch answer;
* stateful dedup keeps exactly one row per key.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_analyser_spark.sources.parquet import load_table
from mongo_analyser_spark.streaming.windows import (
    dedup_first_per_key,
    session_stats,
    sliding_counts,
    stream_events,
    streaming_dedup,
    tumbling_counts,
    with_late_data_policy,
)

SF = "/root/testdata/sf0.001"


def _run_stream_to_memory(sdf, name: str, output_mode: str = "complete"):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tumbling_stream_matches_batch(spark):
    ev = load_table(spark, SF, "events")
    batch = {
        (r["window_start"], r["n_events"], r["sum_value"])
        for r in tumbling_counts(ev, "ts", "1 hour", value_col="value").collect()
    }
    sdf = tumbling_counts(stream_events(spark, SF), "ts", "1 hour", value_col="value")
    assert sdf.isStreaming
    _run_stream_to_memory(sdf, "t_tumbling")
    got = {
        (r["window_start"], r["n_events"], r["sum_value"])
        for r in spark.table("t_tumbling").collect()
    }
    assert got == batch and len(got) > 0


def test_session_stream_matches_batch(spark):
    ev = load_table(spark, SF, "events")
    batch = {
        tuple(r) for r in session_stats(ev, "ts", "30 minutes", ["user_id"]).collect()
    }
    sdf = session_stats(
        stream_events(spark, SF).withWatermark("ts", "1 hour"),
        "ts",
        "30 minutes",
        ["user_id"],
    )
    assert sdf.isStreaming
    _run_stream_to_memory(sdf, "t_session")
    got = {tuple(r) for r in spark.table("t_session").collect()}
    assert got == batch and len(got) > 0


def test_sliding_each_event_in_two_windows(spark):
    ev = load_table(spark, SF, "events")
    total = ev.count()
    windows = sliding_counts(ev, "ts", "1 hour", "30 minutes")
    assert windows.agg(F.sum("n_events")).collect()[0][0] == 2 * total


def test_streaming_dedup_bounded_state(spark):
    sdf = streaming_dedup(
        stream_events(spark, SF), ["user_id", "event_type"], "ts", "1 hour"
    )
    assert sdf.isStreaming
    _run_stream_to_memory(sdf, "t_dedup", output_mode="append")
    out = spark.table("t_dedup")
    n_keys = out.select("user_id", "event_type").distinct().count()
    assert out.count() == n_keys > 0


def test_dedup_first_per_key_deterministic(spark):
    ev = load_table(spark, SF, "events")
    first = dedup_first_per_key(ev, ["user_id", "event_type"], ["ts", "event_id"])
    keys = ev.select("user_id", "event_type").distinct().count()
    assert first.count() == keys
    # re-run is bit-identical (total order)
    again = dedup_first_per_key(ev, ["user_id", "event_type"], ["ts", "event_id"])
    assert {tuple(r) for r in first.collect()} == {tuple(r) for r in again.collect()}


def test_late_data_policy_batch_twin(spark):
    ev = load_table(spark, SF, "events")
    kept = with_late_data_policy(ev, "ts", "1 day")
    hwm = ev.agg(F.max("ts")).collect()[0][0]
    mn = kept.agg(F.min("ts")).collect()[0][0]
    import datetime

    assert mn >= hwm - datetime.timedelta(days=1)
    assert 0 < kept.count() < ev.count()


def test_late_data_policy_streaming_is_watermark(spark):
    sdf = with_late_data_policy(stream_events(spark, SF), "ts", "1 day")
    assert sdf.isStreaming  # watermark path, no filter-join


def test_custom_stateful_running_totals(spark):
    """applyInPandasWithState per-user profile converges to the batch
    twin after one availableNow pass over the same files."""
    from mongo_analyser_spark.streaming.stateful import (
        running_user_totals,
        user_totals_batch,
    )

    ev = load_table(spark, SF, "events")
    expected = {
        (r["user_id"], r["n_events"], r["total_value"], r["last_ts"])
        for r in user_totals_batch(ev).collect()
    }
    sdf = running_user_totals(stream_events(spark, SF))
    assert sdf.isStreaming
    _run_stream_to_memory(sdf, "t_state", output_mode="update")
    # keep only each user's LAST emitted row (one row per micro-batch)
    out = spark.table("t_state")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        out.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    got = {
        (r["user_id"], r["n_events"], r["total_value"], r["last_ts"])
        for r in final.collect()
    }
    assert got == expected and len(got) > 0


def test_stream_file_sink_checkpoint_exactly_once(spark, tmp_path):
    """writeStream to parquet with a checkpoint: restarting the query
    against the same checkpoint must not duplicate rows (file-source
    offsets are committed per micro-batch)."""
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    agg_src = stream_events(spark, SF).select("event_id", "user_id")

    def run_once():
        q = (
            agg_src.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    n_events = load_table(spark, SF, "events").count()
    first = spark.read.parquet(out).count()
    assert first == n_events
    # restart on the same checkpoint: no new input -> no duplicates
    run_once()
    assert spark.read.parquet(out).count() == n_events
    assert spark.read.parquet(out).select("event_id").distinct().count() == n_events


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas state protocol needs google.protobuf "
    "(not bundled in this container) — processor logic is unit-tested below",
)
def test_transform_with_state_matches_batch(spark):
    """transformWithStateInPandas (Spark 4 successor API) produces the
    same converged per-user profile as the applyInPandasWithState op and
    the batch twin."""
    from mongo_analyser_spark.streaming.stateful import (
        running_user_totals_tws,
        user_totals_batch,
    )

    ev = load_table(spark, SF, "events")
    expected = {
        (r["user_id"], r["n_events"], r["total_value"], r["last_ts"])
        for r in user_totals_batch(ev).collect()
    }
    sdf = running_user_totals_tws(stream_events(spark, SF))
    assert sdf.isStreaming
    _run_stream_to_memory(sdf, "t_tws", output_mode="update")
    out = spark.table("t_tws")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        out.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    got = {
        (r["user_id"], r["n_events"], r["total_value"], r["last_ts"])
        for r in final.collect()
    }
    assert got == expected


def test_user_totals_processor_logic_direct():
    """The StatefulProcessor's fold, driven directly with a fake
    ValueState — the full plumbing test is env-gated on protobuf, but the
    state arithmetic (the part we own) is pinned here."""
    import pandas as pd

    from mongo_analyser_spark.streaming.stateful import UserTotalsProcessor

    class FakeState:
        def __init__(self):
            self.value = None

        def exists(self):
            return self.value is not None

        def get(self):
            return self.value

        def update(self, v):
            self.value = v

    proc = UserTotalsProcessor()
    proc._state = FakeState()
    batch1 = pd.DataFrame({"value": [1.0, 2.0], "ts": pd.to_datetime(["2023-01-01", "2023-01-03"])})
    [out1] = list(proc.handleInputRows((7,), iter([batch1]), None))
    assert out1.iloc[0].to_dict() == {
        "user_id": 7, "n_events": 2, "total_value": 3.0,
        "last_ts": pd.Timestamp("2023-01-03"),
    }
    # second batch folds ONTO existing state; stale ts does not regress last_ts
    batch2 = pd.DataFrame({"value": [4.0], "ts": pd.to_datetime(["2023-01-02"])})
    [out2] = list(proc.handleInputRows((7,), iter([batch2]), None))
    assert out2.iloc[0].n_events == 3
    assert out2.iloc[0].total_value == 7.0
    assert out2.iloc[0].last_ts == pd.Timestamp("2023-01-03")


def test_interval_join_stream_matches_batch(spark):
    """Stream-stream interval join: two readStream branches of the same
    events file, watermarked, must converge to the batch twin. Append
    mode is the only valid stream-stream-join output mode."""
    from mongo_analyser_spark.streaming.joins import interval_join

    ev = load_table(spark, SF, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    batch = {
        (r.l_event_id, r.r_event_id)
        for r in interval_join(clicks, purchases, ["user_id"]).collect()
    }

    sev = stream_events(spark, SF)
    s_clicks = sev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    s_purch = sev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    sdf = interval_join(
        s_clicks, s_purch, ["user_id"], upper="6 hours", watermark="1 hour"
    )
    assert sdf.isStreaming
    _run_stream_to_memory(sdf, "t_interval_join", output_mode="append")
    got = {
        (r.l_event_id, r.r_event_id)
        for r in spark.table("t_interval_join").collect()
    }
    assert got == batch and len(got) > 0


def test_field_stats_stream_matches_batch(spark):
    """The flagship analyzer as an incremental monitor: streaming
    complete-mode output must equal the batch approx twin on the same
    files (HLL merge is order-insensitive, so the sketch counts agree
    exactly)."""
    from mongo_analyser_spark.operators.field_stats import field_stats
    from mongo_analyser_spark.sources.parquet import EVENTS_PROPS_SCHEMA
    from mongo_analyser_spark.streaming.field_stats import field_stats_stream

    ev = load_table(spark, SF, "events")
    batch = {
        tuple(r) for r in field_stats(ev, {"props": EVENTS_PROPS_SCHEMA}, approx=True).collect()
    }
    sdf = field_stats_stream(
        stream_events(spark, SF), {"props": EVENTS_PROPS_SCHEMA}
    )
    assert sdf.isStreaming
    _run_stream_to_memory(sdf, "t_field_stats")
    got = {tuple(r) for r in spark.table("t_field_stats").collect()}
    assert got == batch and len(got) == 7


def _run_monitor_with_checkpoint(spark, mon, name: str, ckpt: str):
    q = (
        mon.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {tuple(r) for r in spark.table(name).collect()}


def test_field_stats_monitor_checkpoint_restart(spark, tmp_path):
    """ST7 restart story (verdict-r7 #5): run the monitor over an initial
    file set with a checkpointLocation, STOP, append more files, restart
    the same query on the same checkpoint — the final complete-mode
    output must equal the batch twin over ALL files. Proves both halves
    of recovery: aggregate state survives the restart (else the second
    run would cover only the appended files) and committed file-source
    offsets prevent double-counting the initial files (else presence
    counts would exceed the batch twin's)."""
    from mongo_analyser_spark.operators.field_stats import field_stats
    from mongo_analyser_spark.sources.parquet import EVENTS_PROPS_SCHEMA
    from mongo_analyser_spark.streaming.field_stats import field_stats_stream

    ev = load_table(spark, SF, "events")
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    ev.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(in_dir)

    def run(name):
        sdf = spark.readStream.schema(ev.schema).parquet(in_dir)
        return _run_monitor_with_checkpoint(
            spark, field_stats_stream(sdf, {"props": EVENTS_PROPS_SCHEMA}), name, ckpt
        )

    first = run("t_fs_ckpt_a")
    batch_all = {
        tuple(r)
        for r in field_stats(ev, {"props": EVENTS_PROPS_SCHEMA}, approx=True).collect()
    }
    assert first != batch_all and len(first) == 7  # the split is real
    ev.filter(F.col("event_id") % 2 != 0).write.mode("append").parquet(in_dir)
    assert run("t_fs_ckpt_b") == batch_all


def test_token_budget_monitor_checkpoint_restart(spark, tmp_path):
    """ST8 restart story (verdict-r7 #5): same stop/append/restart
    boundary for the token monitor — per-source running totals (incl. the
    Arrow BPE sums) must converge to the batch twin after recovery, with
    no double-count of the pre-restart files."""
    from mongo_analyser_spark.functions.bpe import load_fixture_merges
    from mongo_analyser_spark.streaming.tokens import token_budget_stream

    docs = load_table(spark, SF, "documents")
    merges = load_fixture_merges()
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("append").parquet(in_dir)

    def run(name):
        sdf = spark.readStream.schema(docs.schema).parquet(in_dir)
        return _run_monitor_with_checkpoint(
            spark, token_budget_stream(sdf, merges), name, ckpt
        )

    first = run("t_tok_ckpt_a")
    batch_all = {tuple(r) for r in token_budget_stream(docs, merges).collect()}
    assert first != batch_all and len(first) > 1  # the split is real
    docs.filter(F.col("doc_id") % 2 != 0).write.mode("append").parquet(in_dir)
    assert run("t_tok_ckpt_b") == batch_all


def test_token_budget_stream_matches_batch(spark):
    """Streaming per-source token accounting == the batch twin on the
    same files, exact set equality incl. the BPE Arrow-stage sums (the
    mapInPandas stage runs identically per micro-batch)."""
    from mongo_analyser_spark.functions.bpe import load_fixture_merges
    from mongo_analyser_spark.sources.parquet import load_table
    from mongo_analyser_spark.streaming.tokens import (
        stream_documents,
        token_budget_stream,
    )

    merges = load_fixture_merges()
    sdf = token_budget_stream(stream_documents(spark, SF), merges)
    assert sdf.isStreaming
    _run_stream_to_memory(sdf, "t_tokens")
    got = {
        tuple(r) for r in spark.sql("SELECT * FROM t_tokens").collect()
    }
    batch = token_budget_stream(
        load_table(spark, SF, "documents"), merges
    )
    assert not batch.isStreaming
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 1


def test_dedup_monitor_stream_matches_batch(spark):
    """ST9: streaming per-source dedup health == the batch twin on the
    same files, exact set equality (HLL insertion is order- and
    partition-independent, so the approx_distinct partials agree
    exactly — the ST7 contract)."""
    from mongo_analyser_spark.streaming.dedup_monitor import dedup_rate_stream
    from mongo_analyser_spark.streaming.tokens import stream_documents

    sdf = dedup_rate_stream(stream_documents(spark, SF))
    assert sdf.isStreaming
    _run_stream_to_memory(sdf, "t_dedup_mon")
    got = {tuple(r) for r in spark.table("t_dedup_mon").collect()}
    batch = dedup_rate_stream(load_table(spark, SF, "documents"))
    assert not batch.isStreaming
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 1
    # rates are rates
    assert all(0.0 <= t[-1] <= 1.0 for t in got)


def test_dedup_monitor_checkpoint_restart(spark, tmp_path):
    """ST9 restart story (the verdict-r7 #5 contract): stop/append/
    restart on the same checkpoint — per-source totals and HLL
    partials must converge to the batch twin over ALL files with no
    double-count of the pre-restart files."""
    from mongo_analyser_spark.streaming.dedup_monitor import dedup_rate_stream

    docs = load_table(spark, SF, "documents")
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("append").parquet(in_dir)

    def run(name):
        sdf = spark.readStream.schema(docs.schema).parquet(in_dir)
        return _run_monitor_with_checkpoint(
            spark, dedup_rate_stream(sdf), name, ckpt
        )

    first = run("t_dm_ckpt_a")
    batch_all = {tuple(r) for r in dedup_rate_stream(docs).collect()}
    assert first != batch_all  # the split is real
    docs.filter(F.col("doc_id") % 2 != 0).write.mode("append").parquet(in_dir)
    assert run("t_dm_ckpt_b") == batch_all


def test_countmin_monitor_stream_matches_batch_exactly(spark):
    """ST10: the count-min sketch is an additive (row, bucket) counter
    table — order/partition-independent, so streaming complete-mode
    output equals the batch sketch EXACTLY (no HLL caveat: every cell
    is an exact integer)."""
    from mongo_analyser_spark.streaming.countmin_monitor import countmin_stream
    from mongo_analyser_spark.streaming.windows import stream_events

    sdf = countmin_stream(stream_events(spark, SF), F.col("user_id"))
    assert sdf.isStreaming
    _run_stream_to_memory(sdf, "t_cm_mon")
    got = {tuple(r) for r in spark.table("t_cm_mon").collect()}
    batch = countmin_stream(load_table(spark, SF, "events"), F.col("user_id"))
    assert not batch.isStreaming
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(want) > 10
    # bounded-state invariant: at most d*w cells
    assert len(got) <= 3 * 64


def test_countmin_monitor_checkpoint_restart(spark, tmp_path):
    """ST10 restart story: stop/append/restart on the same checkpoint —
    sketch cells converge to the batch twin over ALL files with no
    double-count (additive counters make any drift visible)."""
    from mongo_analyser_spark.streaming.countmin_monitor import countmin_stream

    ev = load_table(spark, SF, "events")
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    ev.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(in_dir)

    def run(name):
        sdf = spark.readStream.schema(ev.schema).parquet(in_dir)
        return _run_monitor_with_checkpoint(
            spark, countmin_stream(sdf, F.col("user_id")), name, ckpt
        )

    first = run("t_cm_ckpt_a")
    batch_all = {
        tuple(r) for r in countmin_stream(ev, F.col("user_id")).collect()
    }
    assert first != batch_all  # the split is real
    ev.filter(F.col("event_id") % 2 != 0).write.mode("append").parquet(in_dir)
    assert run("t_cm_ckpt_b") == batch_all


def _derived_docs_expr():
    """The dynamic_schema_histogram document derivation (a JSON doc per
    event with a type-drifting field) as a reusable expression."""
    from mongo_analyser_spark.queries import EVENTS_PROPS_SCHEMA

    k_json = (
        F.from_json("props", EVENTS_PROPS_SCHEMA).getField("k").cast("string")
    )
    return F.concat(
        F.lit('{"t":"'), F.col("event_type"), F.lit('","k":'),
        F.when(F.col("event_id") % 2 == 0, k_json).otherwise(
            F.concat(F.lit('"'), F.col("event_type"), F.lit('"'))
        ),
        F.lit(',"n":{"u":'), F.col("user_id").cast("string"), F.lit("}}"),
    ).alias("doc")


def test_schema_monitor_stream_matches_batch_exactly(spark):
    """ST11: the per-path observed-type histogram is an additive
    counter over a stateless melt — streaming complete mode equals the
    batch histogram exactly (the reference's core inference, live)."""
    from mongo_analyser_spark.streaming.schema_monitor import (
        schema_histogram_stream,
    )
    from mongo_analyser_spark.streaming.windows import stream_events

    sdf = schema_histogram_stream(
        stream_events(spark, SF).select(_derived_docs_expr()), "doc"
    )
    assert sdf.isStreaming
    _run_stream_to_memory(sdf, "t_schema_mon")
    got = {tuple(r) for r in spark.table("t_schema_mon").collect()}
    batch = schema_histogram_stream(
        load_table(spark, SF, "events").select(_derived_docs_expr()), "doc"
    )
    want = {tuple(r) for r in batch.collect()}
    assert got == want
    # the type-drifting field shows BOTH observed types, the reference's
    # defining dynamic-schema behavior
    k_types = {t for p, t, _ in got if p == "k"}
    assert k_types == {"int32", "str"}


def test_schema_monitor_checkpoint_restart(spark, tmp_path):
    """ST11 restart story: stop/append/restart on the same checkpoint —
    histogram counts converge to the batch twin over ALL files."""
    from mongo_analyser_spark.streaming.schema_monitor import (
        schema_histogram_stream,
    )

    ev = load_table(spark, SF, "events")
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    ev.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(in_dir)

    def run(name):
        sdf = spark.readStream.schema(ev.schema).parquet(in_dir)
        return _run_monitor_with_checkpoint(
            spark,
            schema_histogram_stream(sdf.select(_derived_docs_expr()), "doc"),
            name,
            ckpt,
        )

    first = run("t_sm_ckpt_a")
    batch_all = {
        tuple(r)
        for r in schema_histogram_stream(
            ev.select(_derived_docs_expr()), "doc"
        ).collect()
    }
    assert first != batch_all  # the split is real
    ev.filter(F.col("event_id") % 2 != 0).write.mode("append").parquet(in_dir)
    assert run("t_sm_ckpt_b") == batch_all


def test_exactly_once_sink_replay_is_idempotent(spark, tmp_path):
    """The foreachBatch contract: replaying a micro-batch (the
    at-least-once crash case) must overwrite its own __batch_id
    partition, not append duplicates."""
    from mongo_analyser_spark.streaming.sink import (
        exactly_once_parquet_writer,
        write_batch_idempotent,
    )

    ev = load_table(spark, SF, "events").select(
        "event_id", "user_id", "value"
    )
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev.write.mode("append").parquet(in_dir)

    sdf = spark.readStream.schema(
        ev.schema
    ).parquet(in_dir)
    q = (
        exactly_once_parquet_writer(sdf, out_dir, ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    total = ev.count()
    got = spark.read.parquet(out_dir)
    assert got.count() == total
    # simulate the crash-replay: re-run the LAST committed batch body
    # with the same batch_id and the same data — row count must not move
    last_bid = got.agg(F.max("__batch_id")).collect()[0][0]
    replay = got.where(F.col("__batch_id") == last_bid).drop("__batch_id")
    write_batch_idempotent(replay, int(last_bid), out_dir)
    again = spark.read.parquet(out_dir)
    assert again.count() == total
    assert {r["event_id"] for r in again.collect()} == {
        r["event_id"] for r in ev.collect()
    }


def test_exactly_once_sink_restart_appends_new_batches(spark, tmp_path):
    """Stop/append/restart on the same checkpoint: committed source
    offsets mean the first files are not re-emitted; the second run
    lands only the new files, each under a fresh __batch_id."""
    from mongo_analyser_spark.streaming.sink import exactly_once_parquet_writer

    ev = load_table(spark, SF, "events").select("event_id", "value")
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(in_dir)

    def drain():
        sdf = spark.readStream.schema(ev.schema).parquet(in_dir)
        q = (
            exactly_once_parquet_writer(sdf, out_dir, ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    half = spark.read.parquet(out_dir).count()
    ev.filter(F.col("event_id") % 2 != 0).write.mode("append").parquet(in_dir)
    drain()
    got = spark.read.parquet(out_dir)
    assert half < got.count() == ev.count()
    assert {r["event_id"] for r in got.collect()} == {
        r["event_id"] for r in ev.collect()
    }


def _latest_quantile_report(spark, name):
    """Freshest (max-seq) report row per (group, q) from an update-mode
    memory sink."""
    rows = spark.table(name).collect()
    best = {}
    for r in rows:
        key = (r["group"], r["q"])
        if key not in best or r["seq"] > best[key]["seq"]:
            best[key] = r
    return {
        (r["group"], r["q"], r["est"], r["n_sample"])
        for r in best.values()
    }


def _batch_quantile_set(df):
    from mongo_analyser_spark.operators.quantiles import (
        grouped_bottomk_quantiles,
    )

    return {
        (r["event_type"], r["q"], r["est"], r["n"])
        for r in grouped_bottomk_quantiles(
            df.select(
                "event_type", F.col("value"), F.col("event_id")
            ),
            "event_type", "value", "event_id", k=64,
        ).collect()
    }


def test_quantile_monitor_stream_matches_batch_exactly(spark):
    """ST12: the bottom-k quantile sketch as a stateful streaming
    operator — after the whole stream, the freshest per-group report
    equals the batch grouped_bottomk_quantiles EXACTLY (membership is a
    pure function of the data; estimates are raw data values)."""
    from mongo_analyser_spark.streaming.quantile_monitor import (
        bottomk_quantile_stream,
    )
    from mongo_analyser_spark.streaming.windows import stream_events

    mon = bottomk_quantile_stream(
        stream_events(spark, SF),
        F.col("event_type"),
        F.col("value"),
        F.col("event_id"),
        k=64,
    )
    assert mon.isStreaming
    _run_stream_to_memory(mon, "t_q_mon", output_mode="update")
    got = _latest_quantile_report(spark, "t_q_mon")
    want = _batch_quantile_set(load_table(spark, SF, "events"))
    assert got == want and len(want) > 10


def test_quantile_monitor_checkpoint_restart(spark, tmp_path):
    """ST12 restart story: stop/append/restart on one checkpoint — the
    ≤k-row keyed state survives (else the second run would only see the
    appended files) and committed offsets prevent replay (else the
    sample would hold duplicate items and the quantile indices would
    shift). Final report == batch over ALL files."""
    from mongo_analyser_spark.streaming.quantile_monitor import (
        bottomk_quantile_stream,
    )

    ev = load_table(spark, SF, "events")
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    ev.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(in_dir)

    def run(name):
        # memory sink can't recover an update-mode checkpoint; foreachBatch
        # (the production sink shape, streaming/sink.py) can
        sdf = spark.readStream.schema(ev.schema).parquet(in_dir)
        mon = bottomk_quantile_stream(
            sdf, F.col("event_type"), F.col("value"), F.col("event_id"),
            k=64,
        )
        q = (
            mon.writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out_dir).collect()
        best = {}
        for r in rows:
            key = (r["group"], r["q"])
            if key not in best or r["seq"] > best[key]["seq"]:
                best[key] = r
        return {
            (r["group"], r["q"], r["est"], r["n_sample"])
            for r in best.values()
        }

    first = run("t_q_ckpt_a")
    batch_all = _batch_quantile_set(ev)
    assert first != batch_all  # the split is real
    ev.filter(F.col("event_id") % 2 != 0).write.mode("append").parquet(in_dir)
    assert run("t_q_ckpt_b") == batch_all


def _batch_theta_set(df, k=64):
    from mongo_analyser_spark.operators.theta import theta_sketches

    # item = event_id: unique per row, so every event_type group holds
    # >= k distinct ranks at sf0.001 and ESTIMATION mode is exercised
    return {
        (r["group"], r["n_sketch"], r["theta"], r["est_distinct"])
        for r in theta_sketches(
            df.select(F.col("event_type").cast("string").alias("event_type"),
                      "event_id"),
            "event_type", F.col("event_id"), k,
        ).collect()
    }


def test_theta_monitor_stream_matches_batch_exactly(spark):
    """ST13: the KMV/theta sketch as a stateful streaming operator —
    distinct-count estimates with the EXACT contract (state is the
    bottom-k of distinct md5 ranks, a pure function of the data), the
    deterministic sibling of ST9's HLL dedup monitor."""
    from mongo_analyser_spark.streaming.theta_monitor import (
        theta_distinct_stream,
    )
    from mongo_analyser_spark.streaming.windows import stream_events

    mon = theta_distinct_stream(
        stream_events(spark, SF), F.col("event_type"), F.col("event_id"),
        k=64,
    )
    assert mon.isStreaming
    _run_stream_to_memory(mon, "t_th_mon", output_mode="update")
    rows = spark.table("t_th_mon").collect()
    best = {}
    for r in rows:
        if r["group"] not in best or r["seq"] > best[r["group"]]["seq"]:
            best[r["group"]] = r
    got = {
        (r["group"], r["n_sketch"], r["theta"], r["est_distinct"])
        for r in best.values()
    }
    want = _batch_theta_set(load_table(spark, SF, "events"))
    assert got == want and len(want) == 5
    # estimation mode actually exercised: some group saturated its k
    assert any(t[1] == 64 for t in want)


def test_theta_monitor_checkpoint_restart(spark, tmp_path):
    """ST13 restart story: the <=k-rank state survives a stop/append/
    restart and committed offsets prevent replay (a replayed batch
    would be absorbed by the set-union, so the real risk this pins is
    LOST state yielding an underfull sketch)."""
    from mongo_analyser_spark.streaming.theta_monitor import (
        theta_distinct_stream,
    )

    ev = load_table(spark, SF, "events")
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    ev.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(in_dir)

    def run():
        sdf = spark.readStream.schema(ev.schema).parquet(in_dir)
        mon = theta_distinct_stream(
            sdf, F.col("event_type"), F.col("event_id"), k=64
        )
        q = (
            mon.writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out_dir).collect()
        best = {}
        for r in rows:
            if r["group"] not in best or r["seq"] > best[r["group"]]["seq"]:
                best[r["group"]] = r
        return {
            (r["group"], r["n_sketch"], r["theta"], r["est_distinct"])
            for r in best.values()
        }

    first = run()
    batch_all = _batch_theta_set(ev)
    assert first != batch_all  # the split is real
    ev.filter(F.col("event_id") % 2 != 0).write.mode("append").parquet(in_dir)
    assert run() == batch_all


def _latest_mg_rows(rows):
    """Freshest (max-seq) summary row-set per shard from an update-mode
    sink: shards refresh independently, so take each shard's newest
    emission."""
    best_seq = {}
    for r in rows:
        if r["g"] not in best_seq or r["seq"] > best_seq[r["g"]]:
            best_seq[r["g"]] = r["seq"]
    return [r for r in rows if r["seq"] == best_seq[r["g"]]]


def _mg_merged_from_rows(spark, rows):
    from mongo_analyser_spark.operators.heavyhitters import mg_merge

    summ = spark.createDataFrame(
        [
            (r["key"], int(r["g"]), r["exact_cnt"], r["t_g"], r["weight"])
            for r in rows
        ],
        "user_key string, g long, exact_cnt long, t_g long, weight long",
    )
    return [tuple(r) for r in mg_merge(summ, "user_key", 16).collect()]


def test_mg_monitor_stream_matches_batch_exactly(spark):
    """ST14: the mergeable Misra-Gries summary as a stateful streaming
    operator — after the whole stream, the freshest per-shard summary
    rows equal batch mg_summary EXACTLY (the mergeable form is a pure
    function of the exact counts), and feeding them to the SAME
    mg_merge reproduces the batch mg_heavy_hitters report
    bit-for-bit."""
    from mongo_analyser_spark.operators.heavyhitters import (
        mg_heavy_hitters,
        mg_summary,
    )
    from mongo_analyser_spark.streaming.mg_monitor import mg_stream
    from mongo_analyser_spark.streaming.windows import stream_events

    mon = mg_stream(stream_events(spark, SF), F.col("user_id"), k=16)
    assert mon.isStreaming
    _run_stream_to_memory(mon, "t_mg_mon", output_mode="update")
    latest = _latest_mg_rows(spark.table("t_mg_mon").collect())

    ev = load_table(spark, SF, "events")
    want_summ = {
        (r["user_key"], r["g"], r["exact_cnt"], r["t_g"], r["weight"])
        for r in mg_summary(ev, F.col("user_id"), "user_key", 16, 8).collect()
    }
    got_summ = {
        (r["key"], r["g"], r["exact_cnt"], r["t_g"], r["weight"])
        for r in latest
    }
    assert got_summ == want_summ and len(want_summ) > 0

    want = [
        tuple(r)
        for r in mg_heavy_hitters(
            ev, F.col("user_id"), "user_key", 16, 8
        ).collect()
    ]
    assert _mg_merged_from_rows(spark, latest) == want


def test_mg_monitor_checkpoint_restart(spark, tmp_path):
    """ST14 restart story: stop/append/restart on one checkpoint — the
    per-shard exact-count state survives and committed offsets prevent
    replay (a replay would double every count and break the exact-cnt
    parity). Final merged report == batch over ALL files."""
    from mongo_analyser_spark.operators.heavyhitters import mg_heavy_hitters
    from mongo_analyser_spark.streaming.mg_monitor import mg_stream

    ev = load_table(spark, SF, "events")
    in_dir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    ev.filter(F.col("event_id") % 2 == 0).write.mode("append").parquet(in_dir)

    def run():
        sdf = spark.readStream.schema(ev.schema).parquet(in_dir)
        mon = mg_stream(sdf, F.col("user_id"), k=16)
        q = (
            mon.writeStream.foreachBatch(
                lambda df, bid: df.write.mode("append").parquet(out_dir)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return _mg_merged_from_rows(
            spark, _latest_mg_rows(spark.read.parquet(out_dir).collect())
        )

    first = run()
    batch_all = [
        tuple(r)
        for r in mg_heavy_hitters(
            ev, F.col("user_id"), "user_key", 16, 8
        ).collect()
    ]
    assert first != batch_all  # the split is real
    ev.filter(F.col("event_id") % 2 != 0).write.mode("append").parquet(in_dir)
    assert run() == batch_all
