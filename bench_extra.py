"""Round-6 optimization measurement harness (bench.py stays frozen).

Per-query noop-sink isolation (guide §1.4), same session shape as
bench.run_queries (local[$SPARK_GRAFT_CPUS], shuffle_partitions = 2*cpus,
clearCache between queries), N interleaved rounds with min+median
estimators, and optional .explain("formatted") capture to plans/r06/.

Usage:
  python bench_extra.py [--queries a,b,c] [--rounds 3] [--tag before]
                        [--plans-only] [--sf-dir DIR]
Writes BENCH/r6_extra_<tag>.json and prints one JSON line.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REPO_DIR = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default="")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--plans-only", action="store_true")
    ap.add_argument("--plans", action="store_true",
                    help="also capture explain('formatted') per query")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                           "/root/testdata/sf1.0")
    )
    args = ap.parse_args()

    from orthority_spark.pyfiles import ensure_on_executors
    from orthority_spark.registry import all_queries
    from orthority_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        master=f"local[{cpus}]",
        app_name="bench-extra",
        shuffle_partitions=cpus * 2,
    )
    ensure_on_executors(spark)
    spark.range(1000).count()

    qs = all_queries(include_demoted=True)
    names = [n for n in args.queries.split(",") if n] or list(qs)
    rounds: dict[str, list[float]] = {n: [] for n in names}

    plans_dir = os.path.join(REPO_DIR, "plans", "r06")
    os.makedirs(plans_dir, exist_ok=True)

    if args.plans or args.plans_only:
        for name in names:
            df = qs[name][0](spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(plans_dir, f"{name}_{args.tag}.txt"), "w") as f:
                f.write(buf.getvalue())
            spark.catalog.clearCache()
    if args.plans_only:
        spark.stop()
        print(json.dumps({"plans": names, "tag": args.tag}))
        return

    for rep in range(args.rounds):
        for name in names:
            fn = qs[name][0]
            spark.sparkContext.setJobDescription(f"{name} r{rep}")
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            rounds[name].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(None)
    spark.stop()

    def med(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2

    out = {
        "tag": args.tag,
        "sf_dir": args.sf_dir,
        "cpus": cpus,
        "rounds": args.rounds,
        "queries": {
            n: {"min": min(v), "median": round(med(v), 3), "all": v}
            for n, v in rounds.items()
        },
    }
    path = os.path.join(REPO_DIR, "BENCH", f"r6_extra_{args.tag}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(
        {n: v["min"] for n, v in out["queries"].items()},
        separators=(",", ":"),
    ))


if __name__ == "__main__":
    main()
