"""Structured Streaming: windowed aggregate and stateful sessions must
match their batch twins on the same data."""

from __future__ import annotations

from retail_sales_etl_spark.catalog import table_path
from retail_sales_etl_spark.operators.events import q_events_windowed
from retail_sales_etl_spark.streaming import events as streaming_events


def test_streaming_windowed_matches_batch(spark, sf_dir):
    stream = streaming_events.read_events_stream(spark, table_path(sf_dir, "events"))
    assert stream.isStreaming
    out = streaming_events.run_to_memory(
        streaming_events.windowed_counts(stream),
        "win_test",
        spark,
        output_mode="complete",
    )
    batch = q_events_windowed(spark, sf_dir).select(
        "window_start", "event_type", "n_events", "total_value"
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in out.collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    assert got == want


def test_stream_static_enrichment(spark, sf_dir):
    from retail_sales_etl_spark.catalog import load_table

    stream = streaming_events.read_events_stream(spark, table_path(sf_dir, "events"))
    customer = load_table(spark, sf_dir, "customer")
    enriched = streaming_events.enrich_with_customers(stream, customer)
    out = streaming_events.run_to_memory(enriched, "enrich_test", spark)
    rows = out.collect()
    ev_count = load_table(spark, sf_dir, "events").count()
    assert len(rows) == ev_count  # left join preserves every event
    joined = [r for r in rows if r["segment"] is not None]
    assert joined  # user_id range overlaps customer keys
    segs = {r["segment"] for r in joined}
    assert segs <= {"AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"}


def test_stream_dedupe_drops_replays(spark, sf_dir, tmp_path):
    import shutil

    from retail_sales_etl_spark.catalog import load_table

    # replayed source: the same events file twice in one directory
    src_dir = str(tmp_path / "replayed")
    import os

    os.makedirs(src_dir)
    shutil.copy(table_path(sf_dir, "events"), f"{src_dir}/events_a.parquet")
    shutil.copy(table_path(sf_dir, "events"), f"{src_dir}/events_b.parquet")
    stream = streaming_events.read_events_stream(spark, src_dir, max_files_per_trigger=2)
    out = streaming_events.run_to_memory(
        streaming_events.dedupe_stream(stream), "dedup_stream_test", spark
    )
    n_unique = load_table(spark, sf_dir, "events").count()
    assert out.count() == n_unique  # every replayed event_id dropped


def test_foreachbatch_sink_idempotent_keys(spark, sf_dir, tmp_path):
    stream = streaming_events.read_events_stream(spark, table_path(sf_dir, "events"))
    out_path = str(tmp_path / "sink")
    q = streaming_events.write_batches_to_parquet(
        stream.select("event_id", "ts", "event_type"),
        out_path,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    from retail_sales_etl_spark.catalog import load_table

    landed = spark.read.parquet(out_path)
    assert landed.count() == load_table(spark, sf_dir, "events").count()
    assert "__batch_id" in landed.columns


def test_stateful_sessions_close_on_gap(spark, sf_dir):
    stream = streaming_events.read_events_stream(spark, table_path(sf_dir, "events"))
    out = streaming_events.run_to_memory(
        streaming_events.stateful_sessions(stream), "sess_test", spark
    )
    rows = out.collect()
    # closed sessions only (the still-open last session per user stays in
    # state), so row count is batch sessions minus open ones: > 0 and
    # every emitted session respects the gap invariant
    assert len(rows) > 0
    for r in rows:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1
