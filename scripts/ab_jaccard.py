"""Controlled A/B: the r3 (pre-rework) vs r4 (semi-join + single cached
shingle pass) LSH-verify plans, both timed under the SAME cache regime.

VERDICT r4 #3: `jaccard_neardups_lsh` / `corpus_clean` wall times roughly
doubled between the r3 and r4 recordings, but the cause was confounded —
the same round that reworked the plan (queries_text.py:310, candidate
semi-join + one persisted shingle pass) also added
`spark.catalog.clearCache()` between timed queries (bench review fix),
so r3's numbers were likely flattered by LSH intermediates persisted by
EARLIER queries in the same session. This script settles it: the r3
plan bodies (reconstructed verbatim from commit ff21f75~1; the
`_shingles`/`_band_sigs` helpers they call are unchanged since r3) and
the current plans run interleaved in ONE window, every timed round
preceded by clearCache, identical noop-write action to bench.py's
run_queries. Rows are cross-checked so both plans provably compute the
same result.

Writes BENCH/ab_jaccard.json; bench.py embeds it into BENCH/BASELINE.md
(the attribution note is GENERATED from the measured numbers).

Usage: python scripts/ab_jaccard.py  [$SPARK_GRAFT_SF_DIR, default sf0.1]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_DIR)

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from orthority_spark.pyfiles import ensure_on_executors  # noqa: E402
from orthority_spark.session import get_spark  # noqa: E402
from orthority_spark.queries_text import (  # noqa: E402
    JACCARD_TAU,
    STOPWORDS,
    _band_sigs,
    _docs,
    _shingles,
    q_corpus_clean,
    q_jaccard_neardups_lsh,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "4"))


# --- r3 plan bodies, verbatim from ff21f75~1 (pre-rework) ----------------

def q_jaccard_r3(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _band_sigs(spark, sf_dir).persist()
    a, c = b.alias("a"), b.alias("c")
    cands = (
        a.join(c, ["band", "band_sig"])
        .where(F.col("a.doc_id") < F.col("c.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("c.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sh = _shingles(spark, sf_dir)
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    cand_ids = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .union(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    shc = sh.join(cand_ids, "doc_id", "left_semi")
    a2 = shc.select(F.col("doc_id").alias("doc_a"), "sh")
    b2 = shc.select(F.col("doc_id").alias("doc_b"), "sh")
    common = (
        cands.join(a2, "doc_a")
        .join(b2, ["doc_b", "sh"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    na = counts.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        common.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("common")
            / (F.col("na") + F.col("nb") - F.col("common")).cast("double"),
        )
        .where(F.col("jaccard") >= JACCARD_TAU)
        .select("doc_a", "doc_b", "common", "jaccard")
    )


def q_corpus_clean_r3(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    keep = (
        d.select("doc_id", F.md5("text").alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    losers = q_jaccard_r3(spark, sf_dir).select(
        F.col("doc_b").alias("doc_id")
    ).distinct()
    survivors = keep.join(losers, "doc_id", "left_anti")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).where(F.col("tok") != "")
    stats = toks.groupBy("doc_id", "lang").agg(
        F.count(F.lit(1)).alias("n_tok"),
        F.sum(F.col("tok").isin(STOPWORDS).cast("long")).alias("n_stop"),
    )
    clean = stats.join(survivors, "doc_id", "left_semi").where(
        (F.col("n_stop") >= 2) & (F.col("n_tok") >= 20)
    )
    return clean.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("sum_tokens"),
    )


PLANS = {
    "jaccard_r3": q_jaccard_r3,
    "jaccard_r4": q_jaccard_neardups_lsh,
    "corpus_clean_r3": q_corpus_clean_r3,
    "corpus_clean_r4": q_corpus_clean,
}


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2


def main() -> None:
    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="ab-jaccard",
        shuffle_partitions=CPUS * 2,
    )
    ensure_on_executors(spark)
    spark.range(1000).count()
    rows = {n: fn(spark, SF_DIR).count() for n, fn in PLANS.items()}
    spark.catalog.clearCache()
    assert rows["jaccard_r3"] == rows["jaccard_r4"], rows
    assert rows["corpus_clean_r3"] == rows["corpus_clean_r4"], rows
    rounds: dict[str, list[float]] = {n: [] for n in PLANS}
    for _ in range(ROUNDS):  # interleaved: window drift lands on both plans
        for name, fn in PLANS.items():
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            rounds[name].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    spark.stop()

    stats = {
        n: {"min": min(v), "median": round(_median(v), 3), "rounds": v,
            "rows": rows[n]}
        for n, v in rounds.items()
    }
    # the attribution note is generated from the numbers, never prose-only
    notes = []
    for fam in ("jaccard", "corpus_clean"):
        old, new = stats[f"{fam}_r3"], stats[f"{fam}_r4"]
        ratio = round(old["median"] / new["median"], 2)
        if ratio >= 1.1:
            verdict = (
                f"the r4 rework IS faster cache-free ({ratio}x on the "
                f"median) — the r3->r4 recorded regression was the "
                f"measurement regime (r3 ran without clearCache between "
                f"queries), not the plan"
            )
        elif ratio <= 0.9:
            verdict = (
                f"the r4 rework is SLOWER cache-free ({ratio}x on the "
                f"median) — a real plan regression, not a cache artifact"
            )
        else:
            verdict = (
                f"old and new plans are within noise of each other "
                f"cache-free (ratio {ratio}) — the r3->r4 recorded delta "
                f"was the measurement regime (clearCache), not the plan"
            )
        notes.append(f"{fam}: {verdict}")
    out = {
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "rounds_per_plan": ROUNDS,
        "protocol": (
            "interleaved rounds in one window; clearCache before every "
            "timed run; noop-write action identical to bench run_queries; "
            "r3 bodies verbatim from ff21f75~1"
        ),
        "plans": stats,
        "attribution": notes,
    }
    os.makedirs(os.path.join(REPO_DIR, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO_DIR, "BENCH", "ab_jaccard.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({n: s["median"] for n, s in stats.items()}))
    print("\n".join(notes))


if __name__ == "__main__":
    main()
