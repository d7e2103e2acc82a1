"""spark-submit entry point: the resumable tile-join pipeline.

Cluster submission (the north-rule mechanism):

    python -c "from orthority_spark.pyfiles import package_zip; \
               print(package_zip('/tmp/orthority_spark.zip'))"
    spark-submit --py-files /tmp/orthority_spark.zip \
        scripts/run_pipeline.py --n-pages 1000000 --out /tmp/ortho_job

Re-running the same command resumes: completed tile partitions are
skipped via the ledger anti-join (per-partition lineage + metrics land in
<out>/ledger). Prints one JSON line of run metrics.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=100_000)
    ap.add_argument("--pages-parquet", default=None,
                    help="existing pages table (else synthesise --n-pages)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--salted", action="store_true",
                    help="use the salted shuffle join (mega-cell skew path)")
    ap.add_argument("--max-partitions", type=int, default=None,
                    help="stop after N partitions (crash simulation)")
    args = ap.parse_args()

    # under spark-submit the session/master comes from the submit command;
    # standalone runs fall back to local[*]
    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.appName("orthority-pipeline").getOrCreate()
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    # local_table builds dimension tables via pandas+Arrow; without this
    # conf (default false) createDataFrame(pandas) falls back to the
    # Python-RDD path and the plan loses its LocalTableScan shape
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    from orthority_spark.functions import checksum
    from orthority_spark.functions.geotag import with_geotag
    from orthority_spark.operators import tile_join
    from orthority_spark.plans.ledger import LedgerJob
    from orthority_spark.sources import footprints as fp
    from orthority_spark.sources.pages import synthetic_pages

    t0 = time.perf_counter()
    if args.pages_parquet:
        pages = spark.read.parquet(args.pages_parquet).select("url", "text")
    else:
        pages = synthetic_pages(spark, args.n_pages).select("url", "text")
    pc = tile_join.assign_cells(with_geotag(pages, token="float"))
    recs = fp.footprint_records()
    join_fn = tile_join.pip_join_salted if args.salted else tile_join.pip_join_broadcast
    joined = join_fn(
        pc,
        fp.footprint_catalog_flat_df(spark, recs),
        fp.footprint_edges_df(spark, recs),
        keep=["cell"],
    )
    job = LedgerJob(spark, args.out, part_col="cell")
    metrics = job.run(
        joined,
        checksum.row_hash_fast(F.col("url"), F.col("filename")),
        max_partitions=args.max_partitions,
    )
    metrics["wall_sec"] = round(time.perf_counter() - t0, 3)
    metrics["out"] = args.out
    print(json.dumps(metrics))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
