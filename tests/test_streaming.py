"""Structured Streaming: availableNow drain over a pages directory must
reproduce the batch tile counts exactly; checkpointed restart is a no-op."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orthority_spark.functions.geotag import with_geotag
from orthority_spark.operators.tile_join import assign_cells
from orthority_spark.sources.pages import synthetic_pages
from orthority_spark.streaming.pages_stream import (
    stream_pages_dir,
    tile_counts_stream,
    run_available_now,
)

N = 5000


@pytest.fixture(scope="module")
def pages_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pages_stream") / "pages")
    synthetic_pages(spark, N, num_partitions=8).write.parquet(d)
    return d


def test_stream_matches_batch(spark, pages_dir, tmp_path):
    stream = tile_counts_stream(stream_pages_dir(spark, pages_dir))
    run_available_now(stream, str(tmp_path / "ckpt"), query_name="t1")
    got = {
        (r.start, r.end, r.cell): r.n_pages
        for r in spark.sql("SELECT * FROM t1").collect()
    }

    batch = (
        assign_cells(with_geotag(spark.read.parquet(pages_dir), token="float"))
        .groupBy(F.window("warc_ts", "1 hour").alias("win"), F.col("cell"))
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select("win.start", "win.end", "cell", "n_pages")
    )
    exp = {(r.start, r.end, r.cell): r.n_pages for r in batch.collect()}
    assert got == exp
    assert sum(got.values()) == N


def test_checkpointed_restart_is_noop(spark, pages_dir, tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    stream = tile_counts_stream(stream_pages_dir(spark, pages_dir))
    q1 = run_available_now(stream, ckpt, query_name="t2")
    n1 = spark.sql("SELECT SUM(n_pages) s FROM t2").collect()[0].s
    # restart from the same checkpoint: no new files -> no new input rows
    stream2 = tile_counts_stream(stream_pages_dir(spark, pages_dir))
    q2 = run_available_now(stream2, ckpt, query_name="t3")
    progress = q2.lastProgress
    assert n1 == N
    assert progress is None or progress["numInputRows"] == 0


def test_stateful_eviction_processing_time(spark, tmp_path):
    """evict_state=True must REMOVE idle state on ProcessingTimeTimeout:
    after the timeout fires, a later event for the same user restarts
    session numbering at 1 (retained state would continue at 2), and the
    eviction invocation itself emits no rows."""
    import datetime as dt
    import time

    from orthority_spark.streaming.stateful import sessionize_stream

    src = tmp_path / "src"
    src.mkdir()
    stage = tmp_path / "stage"

    def add_file(rows, name):
        d = stage / name
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_id long"
        ).coalesce(1).write.parquet(str(d))
        part = next(d.glob("part-*.parquet"))
        part.rename(src / f"{name}.parquet")

    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    add_file([(1, t0, 100)], "b1")

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, event_id long"
    ).parquet(str(src))
    q = (
        sessionize_stream(stream, evict_state=True, timeout_ms=1500)
        .writeStream.format("memory")
        .queryName("evict_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        def rows():
            return spark.sql(
                "SELECT * FROM evict_t ORDER BY event_id"
            ).collect()

        deadline = time.time() + 60
        while len(rows()) < 1 and time.time() < deadline:
            time.sleep(0.3)
        assert [(r.event_id, r.session_id) for r in rows()] == [(100, 1)]

        # idle past the 1.5 s timeout: no-data micro-batches fire the
        # eviction invocation (state removed, nothing emitted)
        time.sleep(5.0)
        assert len(rows()) == 1

        # event-time gap > 1800 s: retained state would number this
        # session 2; evicted state restarts at 1
        add_file([(1, t0 + dt.timedelta(hours=2), 101)], "b2")
        while len(rows()) < 2 and time.time() < deadline:
            time.sleep(0.3)
        got = [(r.event_id, r.session_id) for r in rows()]
        assert got == [(100, 1), (101, 1)], got
    finally:
        q.stop()
