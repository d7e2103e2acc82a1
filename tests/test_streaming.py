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
