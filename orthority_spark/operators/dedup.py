"""Deduplication operator family (task-brief first-class component).

Engine-grade APIs over a documents-shaped DataFrame (id_col, text_col):

- :func:`dedup_exact`          hash-groupBy keep-min
- :func:`shingle_set`          distinct word-n-gram shingles (explode)
- :func:`minhash_signatures`   P permutations, partial-agg min
- :func:`lsh_candidate_pairs`  banding equi-join
- :func:`jaccard_verify`       exact Jaccard over candidate pairs ONLY
- :func:`minhash_lsh_neardups` the full pipeline: shingle -> minhash ->
                               band -> bucket-join -> exact verify
- :func:`simhash`              SimHash (n_bits <= 60; near-dup by hamming bands)

Scale shape: every stage is built-ins; the only pairwise work is inside
LSH buckets; the verifier joins candidates to shingle sets (semi-join
pushdown keeps the shingle explode restricted to candidate docs).

The driver-gate queries in queries_text.py use these same fragments with
DuckDB oracles; here the API carries configurable n/perms/bands and the
candidates-only verifier used at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

P31 = 2147483647


def _h31(col: str) -> str:
    return (
        f"CAST(conv(substring(md5({col}), 1, 15), 16, 10) AS BIGINT) % {P31}"
    )


def dedup_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(text_hash, keep_id, n_dupes): exact duplicate groups."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_hash"))
        .groupBy("text_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dupes"))
    )


def shingle_set(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, sh): distinct word-n-gram shingles. Documents with fewer than
    ``n`` tokens yield no shingles (without the guard, sequence(0, -1)
    counts DOWN in Spark and l[i+k] throws INVALID_ARRAY_INDEX)."""
    parts = ", ".join(f"l[i+{k}]" for k in range(n))
    return (
        df.withColumn("l", F.split(F.col(text_col), " "))
        .where(F.size("l") >= n)
        .select(
            F.col(id_col).alias("id"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(l) - {n}), "
                    f"i -> concat_ws(' ', {parts}))"
                )
            ).alias("sh"),
        )
        .distinct()
    )


def minhash_signatures(
    shingles: DataFrame, n_perms: int = 8
) -> DataFrame:
    """(id, perm, sig): min over shingles of (a*h+b) % P31.

    Column-wise: md5 once per shingle, P permutation mins as aggregate
    columns of one partial-agg groupBy (no perms-join row replication);
    stack() restores (perm, sig) rows after aggregation."""
    perms = [(p, 1000003 + p * 101, 12345 + p * 7919) for p in range(n_perms)]
    h = shingles.withColumn("h", F.expr(_h31("sh")))
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(P31)).alias(f"s{p}")
        for p, a, b in perms
    ]
    wide = h.groupBy("id").agg(*aggs)
    stack = ", ".join(f"{p}, s{p}" for p, _, _ in perms)
    return wide.select(
        "id", F.expr(f"stack({n_perms}, {stack}) AS (perm, sig)")
    ).select("id", F.col("perm").cast("int").alias("perm"), "sig")


def lsh_candidate_pairs(sigs: DataFrame, rows_per_band: int = 2) -> DataFrame:
    """(id_a, id_b): pairs sharing >= 1 band signature.

    The band signature is order-exact — md5 over the band's signatures
    concatenated in perm order — so distinct signature tuples never
    collide into one bucket at any ``rows_per_band`` (an unordered sum
    would for bands of > 2 rows). The self-join sides are identical
    subplans, so Catalyst's ReusedExchange computes the band table once
    without pinning it in the block store."""
    bands = (
        sigs.withColumn("band", F.expr(f"perm DIV {rows_per_band}"))
        .groupBy("id", "band")
        .agg(
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("perm", "sig"))),
                        lambda s: s["sig"].cast("string"),
                    ),
                )
            ).alias("band_sig")
        )
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(b, ["band", "band_sig"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def jaccard_verify(
    candidates: DataFrame, shingles: DataFrame, tau: float
) -> DataFrame:
    """Exact shingle-Jaccard over CANDIDATE pairs only (the scale path:
    never all-pairs). Returns (id_a, id_b, jaccard >= tau)."""
    counts = shingles.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    cand_ids = (
        candidates.select(F.col("id_a").alias("id"))
        .union(candidates.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh = shingles.join(cand_ids, "id", "left_semi")
    a = sh.select(F.col("id").alias("id_a"), "sh")
    b = sh.select(F.col("id").alias("id_b"), "sh")
    common = (
        candidates.join(a, "id_a")
        .join(b, ["id_b", "sh"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    return (
        common.join(counts.select(F.col("id").alias("id_a"), F.col("n").alias("na")), "id_a")
        .join(counts.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), "id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("na") + F.col("nb") - F.col("common")).cast("double"),
        )
        .where(F.col("jaccard") >= tau)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_neardups(
    df: DataFrame, id_col: str, text_col: str,
    n: int = 3, n_perms: int = 8, rows_per_band: int = 2, tau: float = 0.8,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline with exact verification."""
    sh = shingle_set(df, id_col, text_col, n)
    sigs = minhash_signatures(sh, n_perms)
    cands = lsh_candidate_pairs(sigs, rows_per_band)
    return jaccard_verify(cands, sh, tau)


def simhash(df: DataFrame, id_col: str, text_col: str, n_bits: int = 31) -> DataFrame:
    """(id, simhash): SimHash from unigram token hashes. Column-wise
    per-bit sign sums in one partial-agg groupBy; no bits-join
    replication. The token hash is the 60-bit md5 prefix, so up to 60
    simhash bits are available (n_bits <= 60; 63 would also overflow a
    signed long under the bit-sum assembly)."""
    if not 1 <= n_bits <= 60:
        raise ValueError("n_bits must be in [1, 60] (60-bit token hash)")
    h = (
        "CAST(conv(substring(md5(token), 1, 15), 16, 10) AS BIGINT)"
        if n_bits > 31
        else _h31("token")
    )
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.col(text_col), " ")).alias("token"),
        )
        .where(F.col("token") != "")
        .distinct()
        .withColumn("h", F.expr(h))
    )
    aggs = [
        F.sum(
            F.expr(f"CASE WHEN (h DIV {2**b}) % 2 = 1 THEN 1 ELSE -1 END")
        ).alias(f"s{b}")
        for b in range(n_bits)
    ]
    wide = toks.groupBy("id").agg(*aggs)
    sig = None
    for b in range(n_bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(2**b)).otherwise(F.lit(0))
        sig = term if sig is None else sig + term
    return wide.select("id", sig.cast("long").alias("simhash"))


def simhash60(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Full-width (60-bit) SimHash — the hamming-band near-dup signature."""
    return simhash(df, id_col, text_col, n_bits=60)


# backwards-compatible alias for the earlier (mis)name; 31 bits as before
simhash64 = simhash
