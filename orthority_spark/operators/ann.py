"""Approximate nearest neighbour over embedding columns (task brief):
brute-force exact baseline + IVF (inverted-file) scale path.

IVF: k-means-style coarse quantiser trained ON the driver from a sampled
centroid seed (labels here; at scale: a sampled k-means), vectors
assigned map-side to their nearest centroid (nprobe buckets per query),
search restricted to same-bucket candidates — an equi-join on bucket id
instead of a cross product. Recall vs the exact baseline is measured in
tests (the standard ANN quality contract).

All scoring uses integer-quantised embeddings (floor(x*1e6)) so dot
products are exact int64 and rankings are deterministic (ties broken by
id), matching queries_vec.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

QUANT = "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))"
# coalesce absorbs zip_with's NULL padding for mixed-length pairs —
# sum over COMMON dims, the same convention as the SQL index equi-join
_DOT = (
    "aggregate(zip_with(a.qe, b.qe, (x, y) -> coalesce(x * y, "
    "CAST(0 AS BIGINT))), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
)


def _qe_matrix(vals: "np.ndarray") -> "np.ndarray":
    """Batch of quantised-embedding lists -> dense int64 matrix; ragged
    rows zero-pad and NULL elements count 0 — exactly _DOT's
    coalesce-to-0 convention (a zero factor kills the same products the
    zip_with NULL padding kills)."""
    try:
        return np.stack([np.asarray(v, dtype=np.int64) for v in vals])
    except (TypeError, ValueError):
        dim = max((0 if v is None else len(v)) for v in vals)
        M = np.zeros((len(vals), dim), dtype=np.int64)
        for i, v in enumerate(vals):
            if v is None:
                continue
            a = np.asarray(v)
            if a.dtype == object:
                a = np.asarray(
                    [0 if x is None else int(x) for x in a], dtype=np.int64
                )
            elif a.dtype.kind == "f":
                a = np.where(np.isnan(a), 0.0, a).astype(np.int64)
            else:
                a = a.astype(np.int64)
            M[i, : len(a)] = a
        return M


def pair_dot():
    """Arrow-vectorized exact int64 pair dot product (guide §4.2): one
    numpy einsum per batch instead of the per-row interpreted zip_with
    fold of _DOT — bit-identical (|qe_i| <= ~1e7, dim <= 64 keeps every
    sum inside int64; pytest asserts equality against _DOT). Returned as
    a fresh UDF per call site so import carries no session state."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def dot(x: pd.Series, y: pd.Series) -> pd.Series:
        X = _qe_matrix(x.to_numpy())
        Y = _qe_matrix(y.to_numpy())
        m = min(X.shape[1], Y.shape[1])
        return pd.Series(np.einsum("ij,ij->i", X[:, :m], Y[:, :m]))

    return dot


def quantize(emb: DataFrame) -> DataFrame:
    return emb.select(
        "vec_id", "label", F.expr(QUANT).alias("qe")
    ).withColumn(
        # coalesce: a NULL embedding element counts 0, matching the SQL
        # twin's SUM-skips-NULL over the unnested dims
        "nn", F.expr("aggregate(qe, CAST(0 AS BIGINT), (acc, v) -> acc + coalesce(v * v, CAST(0 AS BIGINT)))")
    )


def _score_and_rank(cand: DataFrame, k: int, dedup: bool = False) -> DataFrame:
    scored = (
        cand.withColumn("dot", F.expr(_DOT))
        .withColumn(
            "cosine",
            F.col("dot")
            / (
                F.sqrt(F.col("a.nn").cast("double"))
                * F.sqrt(F.col("b.nn").cast("double"))
            ),
        )
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            "cosine",
        )
    )
    if dedup:  # nprobe>1 can produce the same pair via multiple buckets
        scored = scored.dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("int").alias("rank"), "neighbor_id", "cosine")
    )


def ann_bruteforce(qz: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """Exact baseline: broadcast query set x full corpus."""
    queries = qz.where(F.col("vec_id").isin(query_ids)).alias("a")
    corpus = qz.alias("b")
    cand = corpus.join(F.broadcast(queries), F.expr("a.vec_id != b.vec_id"))
    return _score_and_rank(cand, k)


def train_centroids(qz: DataFrame, n_centroids: int = 8) -> np.ndarray:
    """Label-seeded centroid init: per-label mean vectors collected to the
    driver (the cheap seed for :func:`train_centroids_kmeans`)."""
    rows = (
        qz.withColumn("c", F.col("label") % n_centroids)
        .select("c", F.posexplode("qe").alias("i", "v"))
        .groupBy("c", "i")
        .agg(F.avg("v").alias("m"))
        .collect()
    )
    n_dim = max(r.i for r in rows) + 1
    cents = np.zeros((n_centroids, n_dim))
    for r in rows:
        cents[r.c, r.i] = r.m
    return cents


def train_centroids_kmeans(
    qz: DataFrame, n_centroids: int = 8, n_iter: int = 8
) -> tuple[np.ndarray, list[float]]:
    """Distributed Lloyd's k-means over the quantised embeddings — the
    real IVF coarse quantiser (assignment = nearest centroid, same metric
    as :func:`assign_buckets`).

    Each iteration is ONE Spark job: map-side nearest-centroid assignment
    against the broadcast centroids (codegen'd expressions) + a
    partial-aggregated groupBy(bucket, dim) mean; only the K x D centroid
    matrix and a scalar inertia ever reach the driver. Returns
    (centroids, per-iteration Euclidean inertia — classic Lloyd, monotone
    non-increasing; empty clusters keep their previous centroid)."""
    cents = train_centroids(qz, n_centroids)
    sum_nn = float(qz.agg(F.sum("nn")).first()[0])
    inertia: list[float] = []
    for _ in range(n_iter):
        b = assign_buckets(qz, cents, nprobe=1)
        stats = (
            b.select("bucket", F.posexplode("qe").alias("i", "v"))
            .groupBy("bucket", "i")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        new = np.zeros_like(cents)
        seen = set()
        for r in stats:
            new[r.bucket, r.i] = r.m
            seen.add(r.bucket)
        for k in range(n_centroids):
            if k not in seen:
                new[k] = cents[k]
        # inertia = sum ||x||^2 - 2 * sum(best score), best over the NEW
        # centroids' (c.x - ||c||^2/2) — one scalar aggregate
        score_exprs = []
        for c in new:
            bias = -0.5 * float(np.dot(c, c))
            # float() pins plain-float repr (numpy>=2 reprs scalars as
            # 'np.float64(x)', which is not a SQL literal)
            terms = " + ".join(
                f"qe[{i}] * {float(c[i])!r}" for i in range(len(c)) if c[i] != 0.0
            )
            score_exprs.append(f"(({terms or '0.0'}) + {bias!r})")
        best = f"greatest({', '.join(score_exprs)})"
        tot = float(qz.select(F.expr(best).alias("s")).agg(F.sum("s")).first()[0])
        inertia.append(sum_nn - 2.0 * tot)
        cents = new
    return cents, inertia


def assign_buckets(qz: DataFrame, centroids: np.ndarray, nprobe: int = 1) -> DataFrame:
    """Map-side bucket assignment: NEAREST centroid by Euclidean distance
    via the dot identity argmin ||x-c||^2 = argmax (c.x - ||c||^2 / 2)
    (||x||^2 is constant per vector), evaluated as codegen'd expressions
    against the broadcast centroids; nprobe>1 replicates each vector into
    its top-nprobe buckets (query-side fan-out)."""
    exprs = []
    for ci, c in enumerate(centroids):
        bias = -0.5 * float(np.dot(c, c))
        terms = " + ".join(
            f"qe[{i}] * {float(c[i])!r}" for i in range(len(c)) if c[i] != 0.0
        )
        exprs.append(f"struct(({terms or '0.0'}) + {bias!r} AS score, {ci} AS bucket)")
    if nprobe == 1:
        # r6: one numpy matmul + argmax per Arrow batch (guide §4.2).
        # Exact: quantised components (|qe_i| <= ~1e7) and centroid
        # entries (multiples of 1e6, |m| <= 3) are all exactly
        # representable in float64 and every partial sum stays far below
        # 2^53, so scores are exact integers regardless of summation
        # order — bit-equal to the expression form (pytest contract).
        # Ties break to the HIGHER bucket, the head of the reversed
        # ascending sort. Why not JVM: the unrolled K x D score
        # expressions cost ~9 s of one-time codegen compilation per
        # session (every cold bench run paid it), and the CodegenFallback
        # array_sort form re-evaluated them interpreted (~1.8 s at
        # N=20k); the numpy pass is ~0.3 s with no compile.
        return _assign_buckets_np(qz, centroids)
    top = (
        f"slice(reverse(array_sort(array({', '.join(exprs)}))), 1, {nprobe})"
    )
    return qz.withColumn("b_arr", F.expr(top)).select(
        "vec_id", "label", "qe", "nn",
        F.explode(F.expr("transform(b_arr, s -> s.bucket)")).alias("bucket"),
    )


def _assign_buckets_np(qz: DataFrame, centroids: np.ndarray) -> DataFrame:
    """Nearest-centroid (nprobe=1) assignment as a vectorized Arrow
    batch kernel; passes vec_id/label/qe/nn through unchanged. Ragged /
    NULL components count 0 — the SQL twin's sum-over-present-dims
    convention (the expression form instead null-poisons short vectors;
    no caller feeds either shape ragged rows)."""
    import pandas as pd

    C = np.asarray(centroids, dtype="float64")  # (K, D)
    biases = -0.5 * (C * C).sum(axis=1)  # exact: entries are m * 1e6
    k = C.shape[0]

    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in qz.schema.fields
    )

    def assign(it):
        for pdf in it:
            if not len(pdf):
                continue
            vals = pdf["qe"].to_numpy()
            M = _qe_matrix(vals).astype("float64")
            d = min(M.shape[1], C.shape[1])
            S = M[:, :d] @ C[:, :d].T + biases  # (n, K), exact ints
            bucket = (k - 1) - np.argmax(S[:, ::-1], axis=1)
            out = pdf.copy()
            out["bucket"] = bucket.astype("int32")
            yield out

    return qz.mapInPandas(assign, schema=f"{fields}, bucket int")


def ann_ivf(
    qz: DataFrame,
    query_ids: list[int],
    centroids: np.ndarray,
    k: int = 5,
    nprobe: int = 2,
) -> DataFrame:
    """IVF search: queries probe their nprobe nearest buckets; corpus
    vectors live in exactly one bucket; candidates = bucket equi-join."""
    corpus = assign_buckets(qz, centroids, nprobe=1).alias("b")
    queries = assign_buckets(
        qz.where(F.col("vec_id").isin(query_ids)), centroids, nprobe=nprobe
    ).alias("a")
    cand = corpus.join(F.broadcast(queries), "bucket").where(
        F.expr("a.vec_id != b.vec_id")
    )
    return _score_and_rank(cand, k, dedup=True)


def embedding_neardups_lsh(
    qz: DataFrame, centroids: np.ndarray, tau: float
) -> DataFrame:
    """Embedding-cosine near-dup pairs restricted to shared IVF buckets —
    the dedup-at-scale path (all-pairs cosine is O(n^2); bucketed search
    only compares within coarse-quantiser cells). Recall vs the all-pairs
    threshold scan is a test contract, not an equality: pairs straddling
    a bucket boundary are missed by design (raise nprobe to trade cost
    for recall)."""
    b = assign_buckets(qz, centroids, nprobe=2)
    a, c = b.alias("a"), b.alias("b")
    cand = (
        a.join(c, "bucket")
        .where(F.expr("a.vec_id < b.vec_id"))
        .withColumn("dot", F.expr(_DOT))
        .withColumn(
            "cosine",
            F.col("dot")
            / (
                F.sqrt(F.col("a.nn").cast("double"))
                * F.sqrt(F.col("b.nn").cast("double"))
            ),
        )
        .where(F.col("cosine") >= tau)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            "cosine",
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return cand
