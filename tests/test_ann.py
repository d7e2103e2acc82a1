"""ANN: IVF bucketed search vs exact brute force — recall contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from orthority_spark.operators.ann import (
    ann_bruteforce,
    ann_ivf,
    assign_buckets,
    quantize,
    train_centroids,
)

SF = "/root/testdata/sf0.01"
QUERY_IDS = list(range(10))


@pytest.fixture(scope="module")
def qz(spark):
    return quantize(spark.read.parquet(f"{SF}/embeddings.parquet"))


def test_bruteforce_topk_shape(spark, qz):
    out = ann_bruteforce(qz, QUERY_IDS, k=5).collect()
    assert len(out) == 50
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())


def test_bucket_assignment_covers_all(spark, qz):
    cents = train_centroids(qz, n_centroids=8)
    b = assign_buckets(qz, cents, nprobe=1)
    assert b.count() == qz.count()
    n_buckets = b.select("bucket").distinct().count()
    assert 2 <= n_buckets <= 8
    b2 = assign_buckets(qz, cents, nprobe=2)
    assert b2.count() == 2 * qz.count()


def test_ivf_recall_vs_bruteforce(spark, qz):
    cents = train_centroids(qz, n_centroids=8)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in ann_bruteforce(qz, QUERY_IDS, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf(qz, QUERY_IDS, cents, k=5, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    # random unclustered embeddings: nprobe=4 of 8 buckets should recover
    # well over half of the true top-5 (clustered data would be ~1.0)
    assert recall >= 0.5, recall
    # approx never returns a worse-than-candidate neighbor for rank 1 when
    # the true NN shares a probed bucket — sanity: all results valid ids
    assert all(q in QUERY_IDS for q, _ in approx)


def test_kmeans_inertia_monotone_and_recall(spark):
    """Distributed Lloyd's k-means: Euclidean inertia is monotone
    non-increasing across iterations, and the trained quantiser's IVF
    recall vs exact top-k is at least as good as the label-seed's."""
    from orthority_spark.operators.ann import (
        ann_bruteforce, ann_ivf, quantize, train_centroids,
        train_centroids_kmeans,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    qz = quantize(emb).cache()
    cents, inertia = train_centroids_kmeans(qz, n_centroids=8, n_iter=5)
    assert len(inertia) == 5
    assert all(b <= a * (1 + 1e-12) for a, b in zip(inertia, inertia[1:]))

    qids = [int(r.vec_id) for r in qz.select("vec_id").limit(5).collect()]
    exact = {
        (r.query_id, r.neighbor_id)
        for r in ann_bruteforce(qz, qids, k=5).collect()
    }
    got = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf(qz, qids, cents, k=5, nprobe=2).collect()
    }
    recall = len(got & exact) / len(exact)
    seed = train_centroids(qz, 8)
    got_seed = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf(qz, qids, seed, k=5, nprobe=2).collect()
    }
    recall_seed = len(got_seed & exact) / len(exact)
    assert recall >= 0.5
    assert recall >= recall_seed - 0.2  # k-means never collapses recall
    qz.unpersist()
