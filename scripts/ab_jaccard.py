"""Controlled A/B: the r3 (pre-rework), r4-as-recorded (semi-join +
both persists) and current (r5) LSH-verify plans, all timed under the
SAME cache regime.

VERDICT r4 #3: `jaccard_neardups_lsh` / `corpus_clean` wall times roughly
doubled between the r3 and r4 recordings, but the cause was confounded —
the same round that reworked the plan (queries_text.py:310, candidate
semi-join + one persisted shingle pass) also added
`spark.catalog.clearCache()` between timed queries (bench review fix),
so r3's numbers were likely flattered by LSH intermediates persisted by
EARLIER queries in the same session. This script settles it: the r3
plan bodies (verbatim from commit ff21f75~1; the `_shingles`/
`_band_sigs` helpers they call are unchanged since r3), the r4 plan as
recorded (verbatim from e2e01b4, with both persists) and the current
(r5) plans run interleaved in ONE window, every timed round preceded by
clearCache, identical noop-write action to bench.py's run_queries.
Row counts are cross-checked so all plans provably compute the same
result. The r5 variant sweep behind the current plan (persist band /
persist shingles / neither, at sf0.1 AND the 10x sf1 fixture) is in
NOTES_r5.md §6.

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
    _persist_latest,
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


# --- r4 plan body as RECORDED in round 4 (e2e01b4): candidate-only
# counts + BOTH persists (band table and candidate shingles) ------------

def q_jaccard_r4(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = _persist_latest(_band_sigs(spark, sf_dir), "ab_r4_band_sigs")
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
    cand_ids = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .union(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    shc = _persist_latest(
        sh.join(cand_ids, "doc_id", "left_semi"), "ab_r4_cand_shingles"
    )
    counts = shc.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
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
    "jaccard_r4_recorded": q_jaccard_r4,
    "jaccard_current": q_jaccard_neardups_lsh,
    "corpus_clean_r3": q_corpus_clean_r3,
    "corpus_clean_current": q_corpus_clean,
}


# --- r5 variant sweep: which part of the r4 rework regressed? ----------

def _jaccard_core(
    spark: SparkSession, sf_dir: str,
    persist_band: bool, persist_shc: bool, cand_counts: bool,
) -> DataFrame:
    """The jaccard plan with each r4 design choice toggled independently:
    persist the band table / persist the candidate shingles / compute na,
    nb over candidate docs only (vs the full corpus)."""
    b = _band_sigs(spark, sf_dir)
    if persist_band:
        b = b.persist()
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
    cand_ids = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .union(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    shc = sh.join(cand_ids, "doc_id", "left_semi")
    if persist_shc:
        shc = shc.persist()
    counts = (shc if cand_counts else sh).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n")
    )
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


VARIANTS = {
    # (persist_band, persist_shc, cand_counts)
    "full_counts_persist_band_r3": (True, False, False),
    "cand_counts_both_persists_r4": (True, True, True),
    "cand_counts_no_persist": (False, False, True),
    "cand_counts_persist_band": (True, False, True),
    "cand_counts_persist_shc_r5": (False, True, True),
}


def run_variants() -> None:
    """Sweep the five plan variants at $SPARK_GRAFT_SF_DIR; writes
    BENCH/ab_jaccard_variants_<tag>.json (tag from AB_TAG, default the
    sf dir basename)."""
    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="ab-jaccard-variants",
        shuffle_partitions=CPUS * 2,
    )
    ensure_on_executors(spark)
    spark.range(1000).count()
    rows = {}
    for n, (pb, ps, cc) in VARIANTS.items():
        rows[n] = _jaccard_core(spark, SF_DIR, pb, ps, cc).count()
        spark.catalog.clearCache()
    assert len(set(rows.values())) == 1, rows
    rounds: dict[str, list[float]] = {n: [] for n in VARIANTS}
    for _ in range(ROUNDS):
        for n, (pb, ps, cc) in VARIANTS.items():
            t0 = time.perf_counter()
            _jaccard_core(spark, SF_DIR, pb, ps, cc).write.format(
                "noop"
            ).mode("overwrite").save()
            rounds[n].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    spark.stop()
    tag = os.environ.get("AB_TAG", os.path.basename(SF_DIR.rstrip("/")))
    out = {
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "rounds_per_plan": ROUNDS,
        "rows": rows[next(iter(rows))],
        "variants": {
            n: {"min": min(v), "median": round(_median(v), 3), "rounds": v}
            for n, v in rounds.items()
        },
    }
    path = os.path.join(REPO_DIR, "BENCH", f"ab_jaccard_variants_{tag}.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(
        {n: s["median"] for n, s in out["variants"].items()}
    ))


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
    assert rows["jaccard_r3"] == rows["jaccard_r4_recorded"] == rows[
        "jaccard_current"
    ], rows
    assert rows["corpus_clean_r3"] == rows["corpus_clean_current"], rows
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
    # the attribution notes are generated from the numbers, never
    # prose-only
    def _cmp(fam: str, variants: list[str]) -> str:
        meds = {v: stats[f"{fam}_{v}"]["median"] for v in variants}
        parts = ", ".join(f"{v} {m}s" for v, m in meds.items())
        base = meds[variants[0]]
        cur = meds["current"]
        if "r4_recorded" in meds and meds["r4_recorded"] > 1.1 * base:
            blame = (
                f"the r4-recorded plan IS slower cache-free "
                f"({round(meds['r4_recorded'] / base, 2)}x r3) — a real "
                f"plan regression (the persist barriers), not a cache "
                f"artifact"
            )
        else:
            blame = "no regression attributable to the r4 plan"
        if cur <= 1.1 * base:
            fix = (
                f"the current (r5) plan recovers it: "
                f"{round(cur / base, 2)}x r3 cache-free"
            )
        else:
            fix = (
                f"the current plan is still "
                f"{round(cur / base, 2)}x r3 cache-free"
            )
        return f"{fam} (medians: {parts}): {blame}; {fix}."

    notes = [
        _cmp("jaccard", ["r3", "r4_recorded", "current"]),
        _cmp("corpus_clean", ["r3", "current"]),
    ]
    out = {
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "rounds_per_plan": ROUNDS,
        "protocol": (
            "interleaved rounds in one window; clearCache before every "
            "timed run; noop-write action identical to bench run_queries; "
            "r3 bodies verbatim from ff21f75~1, r4 body verbatim from "
            "e2e01b4; 'current' is the shipped r5 plan"
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
    if "--variants" in sys.argv:
        run_variants()
    else:
        main()
