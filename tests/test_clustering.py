"""k-means + SemDeDup clustering properties (operators/clustering.py).

The registry entries (kmeans_clusters, semantic_dup_pairs,
semantic_dedup_survivors) arbitrate exact values against an unrolled
DuckDB replica; these tests pin the ALGORITHMIC properties the oracle
can't express: assignments really are nearest-centroid, reruns are
bit-identical, intra-cluster blocking has precision 1.0 vs the exact
all-pairs arm, and identical vectors can never be split across clusters
(so exact-twin recall is 1.0 by construction, not by luck).
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from ascii_hydra_spark.operators import clustering, similarity


@pytest.fixture(scope="module")
def emb(spark):
    """40 deterministic 8-dim vectors; ids 30..39 are exact twins of 0..9."""
    rs = np.random.RandomState(7)
    base = rs.randn(30, 8).astype("float32")
    vecs = np.vstack([base, base[:10]])
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_kmeans_deterministic_across_reruns(emb):
    a1 = sorted(map(tuple, clustering.kmeans_assign(emb, k=4, iterations=3).collect()))
    a2 = sorted(map(tuple, clustering.kmeans_assign(emb, k=4, iterations=3).collect()))
    assert a1 == a2


def test_kmeans_assignment_is_nearest_centroid(emb):
    """Recompute centroids from the returned assignment and check every
    vector's cluster minimizes squared distance (ties -> lowest id)."""
    out = clustering.kmeans_assign(emb, k=4, iterations=3).collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()}
    assign = {r["vec_id"]: r["cluster_id"] for r in out}
    cents = {}
    for c in set(assign.values()):
        members = [vecs[i] for i, ci in assign.items() if ci == c]
        cents[c] = np.mean(members, axis=0)
    # one more Lloyd step from these centroids must not move anyone:
    # (fixed point within the returned assignment's final iteration is not
    # guaranteed mid-run, so check the weaker invariant that the reported
    # dist2 equals the distance to the ASSIGNED cluster's pre-update
    # centroid is out of reach; instead assert assigned distance <= any
    # other centroid distance computed from the final centroid recompute
    # only when the assignment is stable)
    stable = all(
        min(cents, key=lambda c: (np.sum((vecs[i] - cents[c]) ** 2), c)) == assign[i]
        for i in assign
    )
    # with 3 iterations on 40 well-separated gaussian points, Lloyd's has
    # converged; if this ever flakes the fixture is pathological, not the op
    assert stable


def test_kmeans_twins_share_cluster(emb):
    """Identical vectors have identical distance rows -> identical argmin
    (same tie-break), so exact twins always co-cluster."""
    out = {r["vec_id"]: r["cluster_id"]
           for r in clustering.kmeans_assign(emb, k=4, iterations=2).collect()}
    for i in range(10):
        assert out[i] == out[30 + i]


def test_semantic_pairs_precision_and_twin_recall(emb):
    got = {
        (r["id_a"], r["id_b"])
        for r in clustering.semantic_dup_pairs(
            emb, k=4, iterations=2, threshold=0.99
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_pairs_blocked(emb, threshold=0.99).collect()
    }
    assert got <= exact, "intra-cluster pairs must be a subset of exact pairs"
    twins = {(i, 30 + i) for i in range(10)}
    assert twins <= got, "exact twins co-cluster, so recall on them is 1.0"


def test_semantic_dedup_drops_twins_keeps_min(emb):
    kept = {r["vec_id"] for r in clustering.semantic_dedup(
        emb, k=4, iterations=2, threshold=0.99
    ).collect()}
    for i in range(10):
        assert i in kept and (30 + i) not in kept
    # non-duplicated vectors all survive
    assert set(range(10, 30)) <= kept


def test_cluster_sizes_partition_the_input(emb):
    sizes = clustering.cluster_sizes(emb, k=4, iterations=2).collect()
    assert sum(r["n_vectors"] for r in sizes) == 40
    assert all(r["n_vectors"] > 0 for r in sizes)


def test_calinski_harabasz_closed_form(spark):
    from ascii_hydra_spark.operators import clustering
    import pytest

    rows = [
        (1, [0.0, 0.0], 0), (2, [0.2, 0.0], 0),
        (3, [10.0, 0.0], 1), (4, [10.2, 0.0], 1),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    row = clustering.calinski_harabasz(emb, "label").collect()[0]
    assert (row["k_clusters"], row["n"]) == (2, 4)
    # per-cluster SSW = 2*(0.1^2) each -> 0.04; SSB = 4 * 25 = 100
    assert row["ss_within"] == pytest.approx(0.04, abs=1e-2)
    assert row["ss_between"] == pytest.approx(100.0, abs=1e-2)
    assert row["ch"] == pytest.approx((100.0 / 1.0) / (0.04 / 2.0), rel=1e-3)
