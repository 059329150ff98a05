"""Structured Streaming verbs: run real micro-batch streams against a
memory sink and compare with the batch equivalents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import pyjanitor_spark as pj
from pyjanitor_spark.streaming import (
    STREAMING_SAFE_VERBS,
    sessionize,
    streaming_dedupe,
    streaming_quality_filter,
    windowed_agg,
)


@pytest.fixture()
def stream_events(spark, tmp_path):
    """A file-source stream over a small parquet directory."""
    from pyjanitor_spark.sources import read_table

    src = read_table(spark, "/root/testdata/sf0.001/events.parquet").limit(500)
    path = str(tmp_path / "events_stream")
    src.write.parquet(path)
    batch = spark.read.parquet(path)
    return spark.readStream.schema(batch.schema).parquet(path), batch


def _run(q_df, name):
    q = (
        q_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if not q_df.isStreaming or True else "complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_windowed_agg_stream_matches_batch(spark, stream_events):
    stream, batch = stream_events
    out = windowed_agg(
        stream,
        "ts",
        "1 hour",
        {"n": ("event_id", "count"), "v": ("value", "sum")},
        by=["event_type"],
        watermark="1 minute",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("wagg")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select window.start as s, event_type, n, v from wagg").collect()
    exp = windowed_agg(
        batch, "ts", "1 hour", {"n": ("event_id", "count"), "v": ("value", "sum")},
        by=["event_type"],
    ).select(F.col("window.start").alias("s"), "event_type", "n", "v").collect()

    def key(rows):
        return sorted((r["s"], r["event_type"], r["n"], round(r["v"] or 0, 6)) for r in rows)

    # availableNow + watermark: final windows may be withheld until a
    # later trigger; everything emitted must match the batch result
    emitted = key(got)
    expected = {k[:2]: k for k in key(exp)}
    assert emitted, "stream emitted nothing"
    for row in emitted:
        assert expected[row[:2]] == row


def test_streaming_dedupe(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", "same text"),
            (2, "2024-01-01 00:00:10", "same  TEXT"),  # normalized dup
            (3, "2024-01-01 00:01:00", "other text"),
        ],
        ["id", "ts", "text"],
    ).withColumn("ts", F.to_timestamp("ts"))
    path = str(tmp_path / "dedup_stream")
    df.write.parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    out = streaming_dedupe(stream, "text", watermark="10 minutes", ts_column="ts")
    q = (
        out.writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select id from sdedup").collect()
    kept = {r["id"] for r in rows}
    assert len(kept) == 2 and 3 in kept and len(kept & {1, 2}) == 1

    # batch fallback: same semantics via dropDuplicates
    b = streaming_dedupe(df, "text")
    assert b.count() == 2


def test_streaming_dedupe_requires_watermark(spark, tmp_path):
    df = spark.createDataFrame([(1, "x")], ["id", "text"])
    path = str(tmp_path / "nb")
    df.write.parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    with pytest.raises(ValueError):
        streaming_dedupe(stream, "text")


def test_sessionize_batch(spark):
    df = spark.createDataFrame(
        [
            ("u1", "2024-01-01 00:00:00"),
            ("u1", "2024-01-01 00:03:00"),
            ("u1", "2024-01-01 01:00:00"),  # new session (> 5 min gap)
            ("u2", "2024-01-01 00:00:00"),
        ],
        ["user", "ts"],
    ).withColumn("ts", F.to_timestamp("ts"))
    out = sessionize(df, "ts", "5 minutes", by=["user"])
    per_user = {
        (r["user"],): r for r in out.groupBy("user").count().collect()
    }
    assert per_user[("u1",)]["count"] == 2
    assert per_user[("u2",)]["count"] == 1


def test_expression_verbs_run_on_stream(spark, stream_events):
    stream, batch = stream_events
    # a representative chain of expression-only verbs on the stream
    out = pj.case_when(
        pj.filter_column_isin(stream, "event_type", ["click", "view"]),
        F.col("value") > 50,
        F.lit("hi"),
        column_name="band",
        default=F.lit("lo"),
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("exprchain")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select count(*) c from exprchain").first()["c"]
    exp = pj.filter_column_isin(batch, "event_type", ["click", "view"]).count()
    assert got == exp


def test_streaming_quality_filter_batch(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and runs far away."),
            (2, "x"),
        ],
        ["id", "text"],
    )
    out = streaming_quality_filter(df, "text", min_quality=0.5)
    assert {r["id"] for r in out.collect()} == {1}


def test_safe_verb_list_is_accurate(spark):
    # every listed verb exists in the package
    for name in STREAMING_SAFE_VERBS:
        assert hasattr(pj, name), name


def test_running_counter_stateful(spark, tmp_path):
    from pyjanitor_spark.streaming import running_counter

    df = spark.createDataFrame(
        [
            ("u1", "2024-01-01 00:00:00"),
            ("u1", "2024-01-01 00:01:00"),
            ("u2", "2024-01-01 00:00:30"),
        ],
        ["user", "ts"],
    ).withColumn("ts", F.to_timestamp("ts"))
    path = str(tmp_path / "rc_stream")
    df.write.parquet(path)
    stream = spark.readStream.schema(df.schema).parquet(path)
    out = running_counter(stream, ["user"], "ts")
    q = (
        out.writeStream.format("memory")
        .queryName("rcount")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "select user, max(n_events) n from rcount group by user"
    ).collect()
    got = {r["user"]: r["n"] for r in rows}
    assert got == {"u1": 2, "u2": 1}

    # batch fallback: plain groupBy count
    b = running_counter(df, ["user"], "ts")
    gb = {r["user"]: r["n_events"] for r in b.collect()}
    assert gb == {"u1": 2, "u2": 1}


def test_write_stream_parquet_sink(spark, stream_events, tmp_path):
    """Stream -> expression verbs -> parquet sink; restart resumes from
    the checkpoint without duplicating rows."""
    from pyjanitor_spark.streaming import write_stream_parquet

    stream, batch = stream_events
    out_path = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    staged = pj.deterministic_sample(stream, "event_id", 0.5, dest="keep")
    q = write_stream_parquet(
        staged, out_path, ckpt, partition_by=["event_type"], available_now=True
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out_path)
    assert got.count() == batch.count()
    assert "keep" in got.columns
    # restart on the same checkpoint: nothing new to process, no dupes
    q2 = write_stream_parquet(staged, out_path, ckpt, available_now=True)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_path).count() == batch.count()


def test_streaming_dedupe_near_across_batches(spark, tmp_path):
    """Incremental near-dedup: batch 2's duplicates of batch 1 content
    are dropped via the parquet store; within-batch dups keep min id;
    restarting the query with the same checkpoint processes only new
    files (store state survives outside the stream)."""
    from pyjanitor_spark.streaming import streaming_dedupe_near

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = "id long, text string"

    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "one two three four five")],
        schema,
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    q = streaming_dedupe_near(
        spark.readStream.schema(schema).parquet(src),
        "id", "text", store, ckpt, available_now=True,
    )
    q.awaitTermination(120)
    assert {r["id"] for r in spark.read.parquet(store).collect()} == {1, 2}

    b2 = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),  # dup of stored doc 1
            (20, "new doc text here now"),           # within-batch dup pair:
            (21, "new doc text here now"),           #   min id 20 survives
            (30, "totally different content words"), # fresh
        ],
        schema,
    )
    b2.coalesce(1).write.mode("append").parquet(src)
    q2 = streaming_dedupe_near(
        spark.readStream.schema(schema).parquet(src),
        "id", "text", store, ckpt, available_now=True,
    )
    q2.awaitTermination(120)
    kept = {r["id"] for r in spark.read.parquet(store).collect()}
    assert kept == {1, 2, 20, 30}, kept


def test_streaming_dedupe_near_restart_recovery(spark, tmp_path):
    """STOP/RESTART recovery (VERDICT r11 task 5): both source files
    exist BEFORE the query starts; maxFilesPerTrigger=1 forces one
    file per micro-batch; the query is stopped at the first committed
    batch — i.e. between micro-batches with work still pending — and a
    NEW query resumed from the same checkpoint must (a) process only
    the remaining file, (b) still near-dedupe it against the state the
    killed run persisted, and (c) never double-process: exactly one
    store partition per micro-batch, no id duplicated."""
    import os
    import time

    from pyjanitor_spark.streaming import streaming_dedupe_near

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = "id long, text string"

    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "one two three four five")],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    # distinct mtimes pin file order: the dup pair's survivor must be
    # deterministic (FileStreamSource orders by modification time)
    now = time.time()
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            os.utime(os.path.join(src, f), (now - 10, now - 10))
    spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),  # near-dup of stored 1
            (30, "totally different content words"),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = streaming_dedupe_near(stream, "id", "text", store, ckpt)
    deadline = time.time() + 120
    while time.time() < deadline:
        p = q.lastProgress
        if p is not None and p["numInputRows"] > 0:
            break
        time.sleep(0.05)
    q.stop()  # kill with (usually) one file still pending
    q.awaitTermination(120)

    q2 = streaming_dedupe_near(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src),
        "id", "text", store, ckpt, available_now=True,
    )
    q2.awaitTermination(120)

    rows = spark.read.parquet(store).collect()
    kept = sorted(r["id"] for r in rows)
    # 10 deduped against the killed run's persisted store; no id twice
    assert kept == [1, 2, 30], kept
    # exactly-once across the restart: one store partition per batch
    batches = sorted(
        d for d in os.listdir(store) if d.startswith("batch=")
    )
    assert batches == ["batch=0", "batch=1"], batches


def _drain(stream_df, sink, ckpt, mode="append"):
    """One availableNow run into a parquet sink; checkpoint carries the
    watermark + state into the next run."""
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ckpt)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_dedupe_state_recovers_across_restart(spark, tmp_path):
    """dropDuplicatesWithinWatermark state across a query RESTART: run 2
    is a brand-new query resuming from run 1's checkpoint, and a
    normalized duplicate of run 1's survivor (still inside the
    watermark horizon) must be dropped by the RECOVERED state store —
    completing the restart matrix for the built-in stateful class
    (file-store near-dedup and watermark windows are covered above)."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def mk(rows):
        return spark.createDataFrame(rows, "id long, ts string, text string") \
            .withColumn("ts", F.to_timestamp("ts"))

    def dedup():
        stream = spark.readStream.schema(
            mk([(0, "2024-01-01 00:00:00", "x")]).schema
        ).parquet(src)
        return streaming_dedupe(
            stream, "text", watermark="10 minutes", ts_column="ts"
        )

    mk([
        (1, "2024-01-01 10:00:00", "same text"),
        (2, "2024-01-01 10:00:30", "other text"),
    ]).coalesce(1).write.mode("append").parquet(src)
    _drain(dedup(), sink, ckpt)

    # new query instance, same checkpoint: 3 normalize-dups row 1
    # (state recovered), 4 is genuinely new
    mk([
        (3, "2024-01-01 10:01:00", "same  TEXT"),
        (4, "2024-01-01 10:02:00", "brand new"),
    ]).coalesce(1).write.mode("append").parquet(src)
    _drain(dedup(), sink, ckpt)

    kept = {r["id"] for r in spark.read.parquet(sink).collect()}
    assert kept == {1, 2, 4}, kept


def test_running_counter_state_recovers_across_restart(spark, tmp_path):
    """applyInPandasWithState state across a query RESTART: the per-key
    counter in run 2 (new query, same checkpoint) must CONTINUE from
    run 1's persisted count, not restart at zero — the custom-state
    class recovered from the state store."""
    from pyjanitor_spark.streaming import running_counter

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def mk(rows):
        return spark.createDataFrame(rows, "user string, ts string") \
            .withColumn("ts", F.to_timestamp("ts"))

    def counter():
        stream = spark.readStream.schema(
            mk([("u0", "2024-01-01 00:00:00")]).schema
        ).parquet(src)
        return running_counter(stream, ["user"], "ts")

    def drain_update(out):
        # update-mode rows -> per-batch parquet append via foreachBatch
        q = (
            out.writeStream.foreachBatch(
                lambda b, _id: b.write.mode("append").parquet(sink)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    mk([
        ("u1", "2024-01-01 10:00:00"),
        ("u1", "2024-01-01 10:01:00"),
        ("u2", "2024-01-01 10:00:30"),
    ]).coalesce(1).write.mode("append").parquet(src)
    drain_update(counter())

    mk([
        ("u1", "2024-01-01 10:05:00"),
        ("u3", "2024-01-01 10:05:30"),
    ]).coalesce(1).write.mode("append").parquet(src)
    drain_update(counter())

    got = {
        r["user"]: r["n"]
        for r in spark.read.parquet(sink)
        .groupBy("user").agg(F.max("n_events").alias("n")).collect()
    }
    # u1's count CONTINUED across the restart (2 then 3, never reset)
    assert got == {"u1": 3, "u2": 1, "u3": 1}, got


def test_windowed_agg_drops_late_row_across_batches(spark, tmp_path):
    """Real watermark semantics across micro-batch runs: a row arriving
    in run 2 whose event time is older than the watermark established in
    run 1 is DROPPED — the finalized window's count excludes it."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    schema = "event_id long, ts timestamp"

    def mk(rows):
        return spark.createDataFrame(
            [(i, t) for i, t in rows], "event_id long, ts string"
        ).withColumn("ts", F.to_timestamp("ts"))

    def agg():
        stream = spark.readStream.schema(
            mk([(0, "2024-01-01 00:00:00")]).schema
        ).parquet(src)
        return windowed_agg(
            stream, "ts", "5 minutes", {"n": ("event_id", "count")},
            watermark="10 minutes",
        )

    # run 1: two rows in W1=[10:00,10:05) + one at 10:30 that advances
    # the watermark to 10:20 (past W1's end)
    mk([
        (1, "2024-01-01 10:00:00"),
        (2, "2024-01-01 10:01:00"),
        (3, "2024-01-01 10:30:00"),
    ]).coalesce(1).write.mode("append").parquet(src)
    _drain(agg(), sink, ckpt)

    # run 2: a LATE row for W1 (10:02 < watermark 10:20 -> dropped) and
    # one at 11:00 that pushes the watermark far past everything open
    mk([
        (4, "2024-01-01 10:02:00"),
        (5, "2024-01-01 11:00:00"),
    ]).coalesce(1).write.mode("append").parquet(src)
    _drain(agg(), sink, ckpt)

    # run 3: data-less flush is not a thing — one more advancing row so
    # any window still open at run 2's end finalizes and emits
    mk([(6, "2024-01-01 12:00:00")]).coalesce(1).write.mode("append").parquet(src)
    _drain(agg(), sink, ckpt)

    got = {
        (r["s"].strftime("%H:%M"), r["n"])
        for r in spark.read.parquet(sink)
        .select(F.col("window.start").alias("s"), "n")
        .collect()
    }
    # W1 finalized with ONLY rows 1,2 — the late row 4 never counted,
    # and W1 appears exactly once (append emits a window at most once)
    assert ("10:00", 2) in got, got
    assert not any(s == "10:00" and n != 2 for s, n in got), got


def test_sessionize_closes_session_on_gap_across_batches(spark, tmp_path):
    """A session closes once the watermark passes last-event + gap; a
    later event for the same key in the next run opens a NEW session
    instead of extending the closed one."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def mk(rows):
        return spark.createDataFrame(rows, "user string, ts string").withColumn(
            "ts", F.to_timestamp("ts")
        )

    def sess():
        stream = spark.readStream.schema(
            mk([("u0", "2024-01-01 00:00:00")]).schema
        ).parquet(src)
        return sessionize(
            stream, "ts", "5 minutes", by=["user"], watermark="10 minutes"
        )

    # run 1: u1 session #1 (10:00, 10:02); u9 at 10:30 advances the
    # watermark to 10:20 > session end 10:07 -> session #1 closes
    mk([
        ("u1", "2024-01-01 10:00:00"),
        ("u1", "2024-01-01 10:02:00"),
        ("u9", "2024-01-01 10:30:00"),
    ]).coalesce(1).write.mode("append").parquet(src)
    _drain(sess(), sink, ckpt)

    # run 2: u1 again at 10:40 — a NEW session (> 5 min after 10:02,
    # and session #1 is already finalized); u9 advances the watermark
    mk([
        ("u1", "2024-01-01 10:40:00"),
        ("u9", "2024-01-01 11:10:00"),
    ]).coalesce(1).write.mode("append").parquet(src)
    _drain(sess(), sink, ckpt)

    # run 3: advance once more so run 2's session finalizes and emits
    mk([("u9", "2024-01-01 12:00:00")]).coalesce(1).write.mode("append").parquet(src)
    _drain(sess(), sink, ckpt)

    u1 = sorted(
        (r["s"].strftime("%H:%M"), r["n_events"])
        for r in spark.read.parquet(sink)
        .filter(F.col("user") == "u1")
        .select(F.col("session.start").alias("s"), "n_events")
        .collect()
    )
    assert u1 == [("10:00", 2), ("10:40", 1)], u1


def test_streaming_dedupe_state_across_restarts(spark, tmp_path):
    """dropDuplicatesWithinWatermark state survives the checkpoint: a
    duplicate arriving in the NEXT availableNow run (within the
    watermark horizon) is still dropped."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def mk(rows):
        return spark.createDataFrame(rows, "id long, ts string, text string").withColumn(
            "ts", F.to_timestamp("ts")
        )

    def dd():
        stream = spark.readStream.schema(
            mk([(0, "2024-01-01 00:00:00", "x")]).schema
        ).parquet(src)
        return streaming_dedupe(stream, "text", watermark="1 hour", ts_column="ts")

    mk([(1, "2024-01-01 10:00:00", "same text")]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _drain(dd(), sink, ckpt)

    # run 2: a normalized dup of run 1's row, 5 min later (well inside
    # the 1 h horizon) + a fresh doc
    mk([
        (2, "2024-01-01 10:05:00", "same  TEXT"),
        (3, "2024-01-01 10:06:00", "other text"),
    ]).coalesce(1).write.mode("append").parquet(src)
    _drain(dd(), sink, ckpt)

    kept = {r["id"] for r in spark.read.parquet(sink).collect()}
    assert kept == {1, 3}, kept


def test_foreach_batch_sink(spark, stream_events, tmp_path):
    """foreachBatch runs batch-only verbs (here: dedupe_exact) per
    micro-batch and lands the result wherever the callback says."""
    from pyjanitor_spark.streaming import foreach_batch_sink

    stream, batch = stream_events
    out_path = str(tmp_path / "fb_out")
    ckpt = str(tmp_path / "fb_ckpt")

    def handle(bdf, batch_id):
        deduped = pj.dedupe_exact(bdf.withColumn("t", F.col("event_type")), "t", "event_id")
        deduped.drop("t").write.mode("append").parquet(out_path)

    q = foreach_batch_sink(stream, handle, ckpt, available_now=True)
    q.awaitTermination(120)
    got = spark.read.parquet(out_path)
    # one survivor per event_type (all data arrives in one micro-batch here)
    assert got.count() == batch.select("event_type").distinct().count()


def test_streaming_dedupe_near_multi_batch_single_run(spark, tmp_path):
    """TWO micro-batches inside ONE availableNow run
    (maxFilesPerTrigger=1): the foreachBatch body fires once per source
    file, and the second batch's near-duplicates of the FIRST batch's
    survivors are dropped via the signature store written moments
    earlier in the same run — the live incremental-state path, not a
    query restart."""
    from pyjanitor_spark.streaming import streaming_dedupe_near

    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    schema = "id long, text string"

    spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "one two three four five")],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [
            (10, "alpha beta gamma delta epsilon"),  # dup of batch-1 doc 1
            (11, "fresh words never seen before"),
        ],
        schema,
    ).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = streaming_dedupe_near(
        stream, "id", "text", store, ckpt, available_now=True
    )
    q.awaitTermination(180)
    progress = q.recentProgress
    assert len([p for p in progress if p["numInputRows"] > 0]) >= 2, (
        "expected >=2 non-empty micro-batches, got "
        f"{[p['numInputRows'] for p in progress]}"
    )
    kept = {r["id"] for r in spark.read.parquet(store).collect()}
    assert kept == {1, 2, 11}, kept


def test_foreach_batch_sink_incremental_batches(spark, tmp_path):
    """foreach_batch_sink under maxFilesPerTrigger=1: the callback runs
    once per micro-batch with distinct batch_ids and sees only that
    batch's rows — per-batch-id idempotency is the contract the
    docstring promises, so pin the batch boundary behavior."""
    from pyjanitor_spark.streaming import foreach_batch_sink

    src = str(tmp_path / "src")
    out_path = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "id long, v string"
    spark.createDataFrame([(1, "a"), (2, "b")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame([(3, "c")], schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    def handle(bdf, batch_id):
        bdf.withColumn("bid", F.lit(batch_id)).write.mode("append").parquet(
            out_path
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = foreach_batch_sink(stream, handle, ckpt, available_now=True)
    q.awaitTermination(120)
    got = spark.read.parquet(out_path)
    by_bid = {
        r["bid"]: r["n"]
        for r in got.groupBy("bid").agg(F.count("*").alias("n")).collect()
    }
    assert len(by_bid) == 2 and sum(by_bid.values()) == 3, by_bid


def test_configure_state_store_passthrough_and_rocksdb_runs(spark, tmp_path):
    """configure_state_store sets the session confs it claims, and a
    stateful query started afterwards really executes on the RocksDB
    provider (its custom metrics appear in the query progress)."""
    from pyjanitor_spark.streaming import configure_state_store

    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    try:
        applied = configure_state_store(
            spark, provider="rocksdb", maxMemoryUsageMB=256
        )
        assert applied[key].endswith("RocksDBStateStoreProvider")
        assert spark.conf.get(key) == applied[key]
        assert (
            spark.conf.get(
                "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB"
            )
            == "256"
        )
        assert (
            spark.conf.get(
                "spark.sql.streaming.stateStore.rocksdb."
                "changelogCheckpointing.enabled"
            )
            == "true"
        )

        df = spark.createDataFrame(
            [
                (1, "2024-01-01 00:00:00", "same text"),
                (2, "2024-01-01 00:00:10", "same text"),
                (3, "2024-01-01 00:01:00", "other text"),
            ],
            ["id", "ts", "text"],
        ).withColumn("ts", F.to_timestamp("ts"))
        path = str(tmp_path / "rocks_stream")
        df.write.parquet(path)
        stream = spark.readStream.schema(df.schema).parquet(path)
        out = streaming_dedupe(
            stream, "text", watermark="10 minutes", ts_column="ts"
        )
        q = (
            out.writeStream.format("memory")
            .queryName("rocksdedup")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "rocks_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        kept = {r["id"] for r in spark.sql("select id from rocksdedup").collect()}
        assert len(kept) == 2 and 3 in kept

        progress = q.recentProgress
        assert progress, "no progress recorded"
        metric_keys = set()
        for p in progress:
            for op in p["stateOperators"]:
                metric_keys |= set(op.get("customMetrics", {}))
        assert any("rocksdb" in k.lower() for k in metric_keys), metric_keys

        # bad provider and misdirected conf raise, not misconfigure
        with pytest.raises(ValueError):
            configure_state_store(spark, provider="memory")
        with pytest.raises(ValueError):
            configure_state_store(spark, provider="hdfs", maxMemoryUsageMB=1)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def test_running_counter_drain_terminates(spark, tmp_path):
    """Regression: with processing-time timeouts an availableNow drain
    never terminated (every batch scheduled another to fire pending
    timers); event-time timeouts stop when the data does.
    awaitTermination must return True — a timeout-return False pass
    would hide the non-termination again."""
    from pyjanitor_spark.streaming import running_counter

    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00"), ("a", "2024-01-01 00:01:00"),
         ("b", "2024-01-01 00:00:30")],
        "user string, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    src = str(tmp_path / "src")
    df.coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = running_counter(stream, ["user"], "ts")
    q = (
        out.writeStream.format("memory")
        .queryName("rc_term")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(90) is True, "drain did not terminate"
    got = {
        (r["user"]): r["n_events"]
        for r in spark.sql(
            "select user, max(n_events) n_events from rc_term group by user"
        ).collect()
    }
    assert got == {"a": 2, "b": 1}
