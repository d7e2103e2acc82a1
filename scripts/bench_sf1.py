"""sf1-scale bench for the heavy gates (VERDICT r3 #8).

The driver ships sf0.001/0.01/0.1 only; costs like shuffle spill and AQE
coalesce behaviour first appear a decade up. This harness synthesises
10x-sf0.1-SHAPED tables deterministically (documents 50k, embeddings
20k x 64, orders 1.5M — the same schemas the driver tables carry;
hash-arithmetic expressions, zero Python in the generators, no RNG
state) into $BENCH_SF1_DIR once, then times the heavy gates with the
same interleaved min+median methodology as bench.py.

Writes BENCH/sf1.json; bench.py embeds the table into BENCH/BASELINE.md
on its next run. Run: python scripts/bench_sf1.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from orthority_spark.pyfiles import ensure_on_executors  # noqa: E402
from orthority_spark.session import get_spark  # noqa: E402

SF1_DIR = os.environ.get("BENCH_SF1_DIR", "/tmp/bench_sf1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = 50_000
N_VECS = 20_000
N_ORDERS = 1_500_000
# >= 3 interleaved rounds (VERDICT r4 #3: two draws is too thin for a
# min estimator on this drifting VM)
ROUNDS = 3

# the gates whose sf0.1 cost profiles the VERDICT wanted re-read at 10x
SF1_QUERIES = [
    "pip_join",
    "dedup_exact",
    "minhash_signatures",
    "lsh_candidates",
    "jaccard_neardups_lsh",
    "corpus_clean",
    "repetition_ratio",
    "ann_topk",
    "ann_ivf",
    "embedding_neardups_bucketed",
]

_VOCAB = (
    "spark batch part line column order small sort fast value scan hash "
    "slow group query agg table stream filter customer key window join "
    "vector page the a"
).split()


def materialize(spark) -> None:
    if os.path.exists(os.path.join(SF1_DIR, "_DONE")):
        return
    # orders: derived_pages consumes only o_orderkey
    spark.range(N_ORDERS).select(F.col("id").alias("o_orderkey")).write.mode(
        "overwrite"
    ).parquet(f"{SF1_DIR}/orders.parquet")
    # documents: word-salad text from a small vocab (the driver fixture's
    # shape); ~1% planted exact duplicates (id % 100 == 99 reuses id-50's
    # text) so dedup has work to do
    vocab = ", ".join(f"'{w}'" for w in _VOCAB)
    docs = (
        spark.range(N_DOCS)
        .withColumn(
            "k", F.expr("CASE WHEN id % 100 = 99 THEN id - 50 ELSE id END")
        )
        .withColumn("n_words", F.expr("CAST(10 + (k * 2654435761) % 51 AS INT)"))
        # word choice must be pseudo-random per (doc, position): a linear
        # pattern like (k*A + j*B) % V collapses the corpus into V
        # near-identical text families (every doc an arithmetic walk of
        # the same cycle) and near-dup candidate counts explode to ~N^2/V
        .withColumn(
            "text",
            F.expr(
                f"concat_ws(' ', transform(sequence(1, n_words), "
                f"j -> element_at(array({vocab}), "
                f"CAST(1 + pmod(hash(k, j), {len(_VOCAB)}) AS INT))))"
            ),
        )
        .select(
            F.col("id").alias("doc_id"),
            "text",
            F.expr(
                "CASE id % 6 WHEN 0 THEN 'en' WHEN 1 THEN 'zh' WHEN 2 THEN 'de' "
                "WHEN 3 THEN 'fr' WHEN 4 THEN 'es' ELSE 'en' END"
            ).alias("lang"),
            F.expr("'src' || CAST(id % 5 AS STRING)").alias("source"),
            F.length("text").cast("long").alias("n_chars"),
        )
    )
    docs.write.mode("overwrite").parquet(f"{SF1_DIR}/documents.parquet")
    # embeddings: 64-dim floats in [-1, 1] from integer hash arithmetic
    emb = spark.range(N_VECS).select(
        F.col("id").alias("vec_id"),
        (F.col("id") % 20).cast("int").alias("label"),
        F.expr(
            "transform(sequence(0, 63), j -> "
            "CAST(CAST((id * 73 + j * 37 + (id + j) * (id + j) * 11) % 2001 "
            "- 1000 AS DOUBLE) / 1000.0 AS FLOAT))"
        ).alias("embedding"),
    )
    emb.write.mode("overwrite").parquet(f"{SF1_DIR}/embeddings.parquet")
    open(os.path.join(SF1_DIR, "_DONE"), "w").close()


def main() -> None:
    from orthority_spark.registry import all_queries

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="bench-sf1",
        shuffle_partitions=CPUS * 2,
    )
    ensure_on_executors(spark)
    spark.range(1000).count()
    materialize(spark)
    qs = all_queries(include_demoted=True)
    rounds: dict[str, list[float]] = {n: [] for n in SF1_QUERIES}
    for _ in range(ROUNDS):  # interleaved: noise lands on every query
        for name in SF1_QUERIES:
            fn = qs[name][0]
            t0 = time.perf_counter()
            fn(spark, SF1_DIR).write.format("noop").mode("overwrite").save()
            rounds[name].append(round(time.perf_counter() - t0, 3))
            # drop persisted intermediates (LSH shingle caches): each
            # timed round must measure the query, not a warm cache
            spark.catalog.clearCache()
    # result sizes recorded untimed (sanity that each gate did real work)
    rows = {n: qs[n][0](spark, SF1_DIR).count() for n in SF1_QUERIES}
    spark.stop()
    out = {
        "sf": 1,
        "n_docs": N_DOCS,
        "n_vecs": N_VECS,
        "n_orders": N_ORDERS,
        "cpus": CPUS,
        "queries": {
            n: {"min": min(v), "rounds": v, "rows": rows[n]}
            for n, v in rounds.items()
        },
    }
    # write under the REPO's BENCH/ regardless of cwd — bench.py's
    # _sf1_section reads it from there to embed into BASELINE.md
    bench_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH"
    )
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "sf1.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({n: min(v) for n, v in rounds.items()}))


if __name__ == "__main__":
    main()
