"""Embedding clustering for corpus organization (SemDeDup-style).

Large-scale training pipelines cluster document embeddings to (a) build
semantic shards for data mixing, and (b) run semantic deduplication —
near-duplicate *meaning*, not near-duplicate *bytes* — by comparing
vectors only WITHIN a cluster (Abbas et al., "SemDeDup", 2023: k-means
then intra-cluster cosine pruning), which turns the O(n²) all-pairs
problem into k independent O((n/k)²) ones.

Everything here is deterministic: centroid init is the k lowest-id
vectors (no RNG), iteration count is fixed (no data-dependent stopping),
and every arg-min tie breaks on cluster id — so results are stable
across reruns/partitionings and a DuckDB oracle can replicate the whole
computation.

Scale notes:
- Assignment is a broadcast cross join against the k-row centroid table
  (k is tens-to-thousands — always broadcast-able) followed by a
  min-struct aggregate per vector: one shuffle on the vector id.
- The centroid update is ONE groupBy(cluster) with `dim` unrolled
  per-component AVG aggregate columns — whole-stage-codegen-friendly,
  and crucially NOT a posexplode (which would multiply shuffle volume
  by the dimension for no information gain).
- Per-iteration lineage is truncated through operators/lineage.py
  (`reliable=True` for executor-loss resilience on long runs); the
  centroid table is k rows, so the checkpoint cost is nil.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ascii_hydra_spark.operators.lineage import truncate_lineage


def _dist2(vec_col, cent_col):
    """Squared L2 distance, left-fold in index order over doubles — the
    exact accumulation order the DuckDB oracle replicates."""
    return F.aggregate(
        F.zip_with(vec_col, cent_col, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def auto_k(n: int, target_cluster_size: int = 1024) -> int:
    """Cluster count that keeps expected cluster size constant as data
    grows — the SemDeDup pair space per task is (n/k)², so k must scale
    with n or the per-cluster GEMM grows quadratically (same lesson as
    the LSH bucket-occupancy auto-sizing in similarity.py)."""
    return max(8, min(4096, n // target_cluster_size))


def kmeans_assign(
    emb: DataFrame,
    k: int | None = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reliable: bool = False,
) -> DataFrame:
    """Deterministic Lloyd's k-means: returns (id, cluster_id, dist2).

    Init: centroids are the vectors of the k smallest ids, numbered
    0..k-1 in id order. Each iteration assigns every vector to the
    nearest centroid (squared L2, ties -> lowest cluster id) and
    recomputes centroids as per-cluster component means; a cluster that
    loses every member keeps its previous centroid. `dist2` is the
    squared distance to the FINAL assigned centroid, rounded to 6.
    k=None sizes the cluster count to the data via :func:`auto_k`.
    """
    if k is None:
        k = auto_k(emb.count())
    dim = emb.select(F.size(vec_col)).first()[0]
    v = F.col(vec_col).cast("array<double>")
    vecs = emb.select(F.col(id_col).alias("__id"), v.alias("__v"))

    # init: k lowest-id vectors; the k-row window sort is trivially bounded
    w = Window.orderBy("__id")
    centroids = (
        vecs.orderBy("__id")
        .limit(k)
        .select(
            (F.row_number().over(w) - 1).alias("cluster_id"),
            F.col("__v").alias("__c"),
        )
    )
    centroids = truncate_lineage(centroids, reliable=reliable)

    assigned = None
    for _ in range(iterations):
        scored = vecs.crossJoin(F.broadcast(centroids)).select(
            "__id", "__v", "cluster_id", _dist2(F.col("__v"), F.col("__c")).alias("__d2")
        )
        assigned = scored.groupBy("__id").agg(
            F.min(F.struct("__d2", "cluster_id")).alias("__m")
        ).select(
            "__id",
            F.col("__m.cluster_id").alias("cluster_id"),
            F.col("__m.__d2").alias("__d2"),
        )
        new_c = (
            assigned.join(vecs, "__id")
            .groupBy("cluster_id")
            .agg(*[F.avg(F.col("__v")[i]).alias(f"__a{i}") for i in range(dim)])
            .select(
                "cluster_id",
                F.array(*[F.col(f"__a{i}") for i in range(dim)]).alias("__c"),
            )
        )
        # empty clusters keep their previous centroid (deterministic)
        centroids = truncate_lineage(
            centroids.alias("old")
            .join(new_c.alias("new"), "cluster_id", "left")
            .select(
                "cluster_id",
                F.coalesce(F.col("new.__c"), F.col("old.__c")).alias("__c"),
            ),
            reliable=reliable,
        )

    return assigned.select(
        F.col("__id").alias(id_col),
        "cluster_id",
        F.round("__d2", 6).alias("dist2"),
    )


def cluster_sizes(
    emb: DataFrame, k: int = 8, iterations: int = 2, **kw
) -> DataFrame:
    """(cluster_id, n_vectors, avg_dist2): the shard-balance summary a
    mixing pipeline reads before sampling per semantic shard."""
    a = kmeans_assign(emb, k=k, iterations=iterations, **kw)
    return a.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("n_vectors"),
        F.round(F.avg("dist2"), 6).alias("avg_dist2"),
    )


def semantic_dup_pairs(
    emb: DataFrame,
    k: int | None = None,
    iterations: int = 2,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    reliable: bool = False,
) -> DataFrame:
    """SemDeDup candidate pairs: cosine >= threshold, compared only
    WITHIN a k-means cluster. Returns (id_a, id_b, sim) with id_a < id_b.

    The cluster key blocks the self-join: the shuffle is on cluster_id
    and each task's pair space is (cluster size)², not (corpus size)².
    Recall caveat (inherent to SemDeDup, documented not hidden): a
    near-dup pair split across two clusters is missed; raising k trades
    recall for speed. The exact arm (similarity.cosine_pairs_blocked)
    is the recall-1.0 reference it is tested against.
    """
    assigned = kmeans_assign(
        emb, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col,
        reliable=reliable,
    )
    side = emb.join(assigned.select(id_col, "cluster_id"), id_col).select(
        F.col(id_col).alias("__id"), "cluster_id", F.col(vec_col).alias("__v")
    )

    # Per-cluster GEMM via applyInPandas: one numpy matmul per cluster
    # instead of 12M+ expression-evaluated dot products (measured 75 s ->
    # ~8 s on 20k x 64 at k=16 in the sf1 stress harness). The block loop
    # bounds peak memory to block_rows * cluster_size similarities even if
    # a cluster degenerates to the whole corpus.
    import pandas as pd  # noqa: PLC0415 — executor-side import by design

    thr = float(threshold)

    def per_cluster(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        ids = pdf["__id"].to_numpy()
        M = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["__v"]])
        norms = np.linalg.norm(M, axis=1)
        norms[norms == 0] = 1.0  # zero vectors -> zero rows, never a match
        U = M / norms[:, None]
        order = np.argsort(ids)
        ids, U = ids[order], U[order]
        out_a, out_b, out_s = [], [], []
        block = 2048
        n = len(ids)
        for s in range(0, n, block):
            S = U[s : s + block] @ U.T
            S = np.round(S, 6)
            rows, cols = np.nonzero(S >= thr)
            keep = (rows + s) < cols  # upper triangle: id_a < id_b
            out_a.append(ids[rows[keep] + s])
            out_b.append(ids[cols[keep]])
            out_s.append(S[rows[keep], cols[keep]])
        a = np.concatenate(out_a) if out_a else np.array([], dtype=np.int64)
        b = np.concatenate(out_b) if out_b else np.array([], dtype=np.int64)
        s_ = np.concatenate(out_s) if out_s else np.array([], dtype=np.float64)
        return pd.DataFrame(
            {
                "id_a": a.astype(np.int64),
                "id_b": b.astype(np.int64),
                "sim": s_.astype(np.float64),
            }
        )

    return side.groupBy("cluster_id").applyInPandas(
        per_cluster, schema="id_a long, id_b long, sim double"
    )


def semantic_dedup(
    emb: DataFrame,
    k: int | None = None,
    iterations: int = 2,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    **kw,
) -> DataFrame:
    """Full SemDeDup decision: intra-cluster cosine pairs -> connected
    components -> keep the minimum-id vector per duplicate group."""
    from ascii_hydra_spark.operators.dedup import cluster_dedup

    pairs = semantic_dup_pairs(
        emb, k=k, iterations=iterations, threshold=threshold, id_col=id_col, **kw
    )
    return cluster_dedup(emb, pairs, id_col)


def calinski_harabasz(
    emb: DataFrame,
    label_col: str,
    vec_col: str = "embedding",
    *,
    scale: int = 4,
) -> DataFrame:
    """One row (k_clusters, n, ss_between, ss_within, ch): the
    Calinski-Harabasz (variance-ratio) clustering quality index over a
    labeled embedding table — CH = (SSB/(k-1)) / (SSW/(n-k)), higher =
    tighter, better-separated clusters. The closed-form quality readout
    for `kmeans_assign` output (or given labels) where silhouette's
    O(n^2) pair distances are unaffordable.

    Algebra keeps everything in sums: SSW = Q - sum_l |S_l|^2/n_l and
    SSB = sum_l |S_l|^2/n_l - |S|^2/n, where Q is the total squared
    norm and S_l the per-label coordinate sums — all exact integers
    after the same 10^scale rounding the covariance/centroid operators
    use; the only floats are the k-bounded final combinations. Same
    2-dp SS / 6-dp ratio output policy as `analytics.anova_oneway`
    (this IS one-way ANOVA in embedding space).
    """
    mult = float(10**scale)
    pe = F.posexplode(F.col(vec_col))
    coords = emb.select(F.col(label_col).alias("__l"), pe).select(
        "__l",
        F.col("pos").alias("__p"),
        F.floor(F.col("col").cast("double") * F.lit(mult) + F.lit(0.5))
        .cast("decimal(28,0)")
        .alias("__x"),
    )
    per_lp = coords.groupBy("__l", "__p").agg(F.sum("__x").alias("__s"))
    q_tot = coords.agg(
        F.sum(F.col("__x") * F.col("__x")).cast("double").alias("__q")
    )
    n_per = emb.groupBy(F.col(label_col).alias("__l")).agg(
        F.count("*").alias("__nl")
    )
    norms = (
        per_lp.groupBy("__l")
        .agg(F.sum(F.col("__s") * F.col("__s")).cast("double").alias("__s2"))
        .join(F.broadcast(n_per), "__l")
    )
    per_label = norms.agg(
        F.count("*").cast("bigint").alias("k_clusters"),
        F.sum("__nl").cast("bigint").alias("n"),
        F.sum(F.col("__s2") / F.col("__nl").cast("double")).alias("__within_sub"),
    )
    glob = per_lp.groupBy("__p").agg(F.sum("__s").alias("__gs")).agg(
        F.sum(F.col("__gs") * F.col("__gs")).cast("double").alias("__g2")
    )
    j = per_label.crossJoin(F.broadcast(q_tot)).crossJoin(F.broadcast(glob))
    nd = F.col("n").cast("double")
    kd = F.col("k_clusters").cast("double")
    descale = F.lit(mult * mult)
    ssw = (F.col("__q") - F.col("__within_sub")) / descale
    ssb = (F.col("__within_sub") - F.col("__g2") / nd) / descale
    ch = (ssb / (kd - F.lit(1.0))) / (ssw / (nd - kd))
    return j.select(
        "k_clusters",
        "n",
        F.round(ssb, 2).alias("ss_between"),
        F.round(ssw, 2).alias("ss_within"),
        F.round(ch, 6).alias("ch"),
    )
