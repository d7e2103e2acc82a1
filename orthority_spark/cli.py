"""CLI — the `oty` command-group analogue (reference cli.py:589-1142).

Subcommands map to the reference's entry points, recast for the engine:

- ``pipeline``  <- ``oty frame``: geotag -> cell -> PIP join -> ledger'd
                 per-tile checksums (resumable; per-partition metrics)
- ``sharpen``   <- ``oty sharpen``: two-pass Gram-Schmidt pan-sharpen of
                 numeric band columns in a parquet table
- ``dedup``     <- (new surface): MinHash-LSH near-dup pairs over a
                 documents-shaped parquet table
- ``package``   emit the --py-files zip for spark-submit
- ``bench``     run the bench harness

Usage: ``python -m orthority_spark <subcommand> ...``
"""

from __future__ import annotations

import argparse
import json
import sys


def _spark(args):
    from .session import get_spark

    return get_spark(master=args.master, shuffle_partitions=args.shuffle_partitions)


def cmd_pipeline(args) -> int:
    from pyspark.sql import functions as F

    from .functions import checksum
    from .functions.geotag import with_geotag
    from .operators import tile_join
    from .plans.ledger import LedgerJob
    from .sources import footprints as fp
    from .sources.pages import synthetic_pages

    spark = _spark(args)
    if args.pages_parquet:
        pages = spark.read.parquet(args.pages_parquet).select("url", "text")
    else:
        pages = synthetic_pages(spark, args.n_pages).select("url", "text")
    pc = tile_join.assign_cells(with_geotag(pages, token="float"))
    recs = fp.footprint_records()
    join_fn = (
        tile_join.pip_join_salted if args.salted else tile_join.pip_join_broadcast
    )
    joined = join_fn(
        pc, fp.footprint_catalog_flat_df(spark, recs), fp.footprint_edges_df(spark, recs),
        keep=["cell"],
    )
    job = LedgerJob(spark, args.out, part_col="cell")
    metrics = job.run(
        joined, checksum.row_hash_fast(F.col("url"), F.col("filename"))
    )
    print(json.dumps(metrics))
    spark.stop()
    return 0


def cmd_sharpen(args) -> int:
    from .operators.stats import pan_sharpen
    from .sources.writers import write_table

    spark = _spark(args)
    df = spark.read.parquet(args.input)
    out = pan_sharpen(df, args.bands.split(","), args.pan)
    write_table(out, args.out, overwrite=args.overwrite)
    print(json.dumps({"rows": out.count(), "out": args.out}))
    spark.stop()
    return 0


def cmd_dedup(args) -> int:
    from .operators.dedup import minhash_lsh_neardups

    spark = _spark(args)
    df = spark.read.parquet(args.input)
    pairs = minhash_lsh_neardups(
        df, args.id_col, args.text_col, tau=args.tau
    ).collect()
    for r in pairs:
        print(json.dumps({"id_a": r.id_a, "id_b": r.id_b,
                          "jaccard": round(r.jaccard, 6)}))
    print(json.dumps({"n_pairs": len(pairs)}), file=sys.stderr)
    spark.stop()
    return 0


def cmd_package(args) -> int:
    from .pyfiles import package_zip

    print(package_zip(args.out))
    return 0


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="orthority_spark")
    ap.add_argument("--master", default="local[*]")
    ap.add_argument("--shuffle-partitions", type=int, default=32)
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("pipeline", help="geotag->cell->PIP->checksums (resumable)")
    p.add_argument("--pages-parquet")
    p.add_argument("--n-pages", type=int, default=100_000)
    p.add_argument("--out", required=True)
    p.add_argument("--salted", action="store_true")
    p.set_defaults(fn=cmd_pipeline)

    p = sub.add_parser("sharpen", help="Gram-Schmidt pan-sharpen")
    p.add_argument("--input", required=True)
    p.add_argument("--bands", required=True, help="comma-separated band columns")
    p.add_argument("--pan", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--overwrite", action="store_true")
    p.set_defaults(fn=cmd_sharpen)

    p = sub.add_parser("dedup", help="MinHash-LSH near-dup pairs")
    p.add_argument("--input", required=True)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--tau", type=float, default=0.8)
    p.set_defaults(fn=cmd_dedup)

    p = sub.add_parser("package", help="emit the --py-files zip")
    p.add_argument("--out", default=None)
    p.set_defaults(fn=cmd_package)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
