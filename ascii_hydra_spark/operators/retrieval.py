"""Retrieval ranking: Okapi BM25, dense cosine ranking, and
reciprocal-rank-fusion (RRF) hybrid search.

Part of the beyond-reference LLM-pipeline surface (like
``operators/dedup.py`` / ``operators/similarity.py``): the reference's own
workload is relational star joins + group-bys (paper.md:150-155), but a
training-data / RAG pipeline at 100 TB needs first-class sparse + dense
retrieval. Everything here is native Spark SQL (whole-stage codegen, no
UDFs) and DuckDB-oracle-able.

Scale shape:

* BM25 explodes tokens once and filters to the |Q| query terms BEFORE the
  (doc, term) count, so the posting shuffle carries only matching rows —
  an inverted-index probe, not a corpus-wide TF materialization. The
  document-frequency table (|Q| rows) and the (N, avgdl) corpus stats
  (1 row) are broadcast back over the postings; the only corpus-sized
  operations are the token scan and the per-doc-length aggregate, and the
  runtime bloom filter prunes the doc-length side of the final join down
  to the docs that matched a query term.
* RRF fusion ranks with a single-partition ``row_number`` window, which is
  only safe because each input list is already BOUNDED (top-R from a
  ``TakeOrdered``-shaped ranker). The unbounded global sort lives in the
  upstream ranker, never in the fusion step.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window, functions as F

from ascii_hydra_spark.functions import word_tokens
from ascii_hydra_spark.operators.lineage import truncate_lineage

# Okapi defaults, shared with the verification oracle so both engines
# compute with bit-identical constants (0.25 / 0.75 / 2.2 are interpolated
# from THESE floats into the DuckDB SQL).
K1 = 1.2
B = 0.75
RRF_K = 60


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """(id, bm25): Okapi BM25 score of every document that contains at
    least one query term (docs with no match are absent, as in a posting-
    list engine).

    idf is the Lucene non-negative variant ``ln(1 + (N - df + .5)/(df + .5))``;
    N and avgdl are computed over documents with >= 1 token (the only docs
    a posting list can ever surface).
    """
    toks = docs.select(F.col(id_col), F.explode(word_tokens(text_col)).alias("term"))
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = dl.agg(F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl"))
    tf = (
        toks.filter(F.col("term").isin(list(query_terms)))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").join(dl, id_col).crossJoin(F.broadcast(stats))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * F.lit(k1 + 1.0) / denom
    return scored.groupBy(id_col).agg(F.sum(contrib).alias("bm25"))


def bm25_topk(
    docs: DataFrame,
    query_terms: Sequence[str],
    k: int = 25,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Top-k BM25 hits, deterministically tie-broken by id. Scores are
    rounded to 6 dp BEFORE the sort so the cut line is stable across
    engines (a last-ulp summation difference must not reorder the list)."""
    s = bm25_scores(docs, query_terms, id_col=id_col, text_col=text_col, k1=k1, b=b)
    return (
        s.select(F.col(id_col), F.round("bm25", 6).alias("bm25"))
        .orderBy(F.desc("bm25"), F.col(id_col))
        .limit(k)
    )


def rrf_fuse(
    ranked: Sequence[tuple[DataFrame, str]],
    *,
    id_col: str = "doc_id",
    k_rrf: int = RRF_K,
) -> DataFrame:
    """(id, rrf, n_rankers): reciprocal-rank fusion over bounded ranked
    lists — ``rrf = sum over rankers of 1 / (k_rrf + rank)``.

    Each element of ``ranked`` is ``(df, score_col)`` where ``df`` holds
    (id, score) and is ALREADY bounded to its top-R (see module docstring:
    the single-partition ranking window here is safe only on small R).
    Ranks tie-break on id, so fusion is deterministic; each contribution
    ``1/(k_rrf + rank)`` is an exact float ratio of small integers, so the
    fused sum is engine-independent.
    """
    contribs = []
    for df, score_col in ranked:
        w = Window.orderBy(F.desc(score_col), F.col(id_col))
        contribs.append(
            df.select(
                F.col(id_col),
                (F.lit(1.0) / (F.lit(k_rrf) + F.row_number().over(w))).alias("__c"),
            )
        )
    u = reduce(lambda a, b: a.unionByName(b), contribs)
    return u.groupBy(id_col).agg(
        F.sum("__c").alias("rrf"), F.count("*").alias("n_rankers")
    )


def hybrid_search(
    docs: DataFrame,
    emb: DataFrame,
    query_terms: Sequence[str],
    query_vec_id: int,
    *,
    candidates_per_ranker: int = 50,
    k: int = 20,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Hybrid sparse+dense retrieval: BM25 over ``docs`` fused (RRF) with
    exact cosine ranking over ``emb`` against the ``query_vec_id`` row.

    The dense arm reuses :func:`similarity.cosine_topk_by_id` (1-row query
    broadcast, TakeOrdered top-R); at scale it swaps for the IVF arm with
    no change to the fusion step. Returns (id, rrf, n_rankers) top-k.
    """
    from ascii_hydra_spark.operators import similarity

    sparse = bm25_topk(
        docs, query_terms, k=candidates_per_ranker, id_col=id_col
    )
    dense = similarity.cosine_topk_by_id(
        emb, query_id=query_vec_id, k=candidates_per_ranker, id_col=vec_id_col
    ).select(F.col(vec_id_col).alias(id_col), "sim")
    fused = rrf_fuse([(sparse, "bm25"), (dense, "sim")], id_col=id_col)
    return (
        fused.select(id_col, F.round("rrf", 6).alias("rrf"), "n_rankers")
        .orderBy(F.desc("rrf"), F.col(id_col))
        .limit(k)
    )


def tfidf_doc_neighbors(
    docs: DataFrame,
    threshold: float = 0.5,
    *,
    max_df_ratio: float = 1.0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_neighbors, best_cos): for every document, how many other
    documents have TF-IDF cosine similarity >= `threshold`, and the best
    such similarity — all-pairs sparse document similarity via an
    inverted-index self-join (the posting-list formulation of a
    similarity join; cf. DIMSUM, Zadeh & Goel 2013).

    Weights: w = tf * ln(N / df) over documents with >= 1 token; terms
    with df > max_df_ratio * N are dropped BEFORE the self-join — stop
    terms contribute near-zero weight but quadratic join fanout, so
    pruning them is what bounds the posting-list length at corpus scale
    (at 100 TB you would also magnitude-prune low weights, DIMSUM-style).
    Cosines are rounded to 6 dp before the threshold cut so a last-ulp
    summation difference between engines can't flip a pair across the
    line.

    Shape: tf/df/norm are the BM25 aggregates; the only quadratic step is
    the per-term postings self-join, keyed by term (shuffle on term), and
    the pair aggregate is keyed by (doc_a, doc_b). Output is corpus-sized
    (one row per doc with any neighbor).

    This is the EXACT arm (measured quadratic: 2.3 s at sf0.01, ~115 s at
    sf0.1 on the synthetic 31-term vocabulary, where every posting list is
    corpus-length). Its oracle-checked results baseline the approximate
    scale paths — `dedup.minhash_lsh_*` for near-dup text and
    `clustering.semantic_dedup` / `similarity.*_lsh` for embeddings —
    exactly as `sim_pairs` (exact GEMM) baselines `sim_pairs_lsh`.
    """
    toks = docs.select(F.col(id_col).alias("doc"), F.explode(word_tokens(text_col)).alias("term"))
    tf = toks.groupBy("doc", "term").agg(F.count("*").alias("tf"))
    stats = tf.agg(F.count_distinct("doc").alias("n_docs"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    kept = dfreq.crossJoin(F.broadcast(stats)).filter(
        F.col("df") <= F.lit(float(max_df_ratio)) * F.col("n_docs")
    )
    weighted = tf.join(F.broadcast(kept), "term").withColumn(
        "w",
        F.col("tf").cast("double")
        * F.log(F.col("n_docs").cast("double") / F.col("df").cast("double")),
    )
    weighted = truncate_lineage(weighted)  # fans out to norms + both join sides
    norms = weighted.groupBy("doc").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))
    a = weighted.select(F.col("term"), F.col("doc").alias("doc_a"), F.col("w").alias("wa"))
    b = weighted.select(F.col("term"), F.col("doc").alias("doc_b"), F.col("w").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    cos = (
        dots.join(norms.select(F.col("doc").alias("doc_a"), F.col("norm").alias("na")), "doc_a")
        .join(norms.select(F.col("doc").alias("doc_b"), F.col("norm").alias("nb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("cos"),
        )
        .filter(F.col("cos") >= F.lit(float(threshold)))
    )
    sym = cos.select(F.col("doc_a").alias("doc"), "cos").unionAll(
        cos.select(F.col("doc_b").alias("doc"), "cos")
    )
    return sym.groupBy("doc").agg(
        F.count("*").cast("bigint").alias("n_neighbors"),
        F.max("cos").alias("best_cos"),
    ).select(F.col("doc").alias(id_col), "n_neighbors", "best_cos")


def mmr_rerank(
    candidates: DataFrame,
    id_col: str,
    vec_col: str,
    score_col: str,
    *,
    k: int = 10,
    lam: float = 0.7,
) -> DataFrame:
    """(rank, id, relevance, mmr): Maximal Marginal Relevance rerank
    (Carbonell & Goldstein 1998) — greedily pick the item maximizing
    lam * relevance - (1 - lam) * max_cosine_to_already_picked, the
    standard diversity pass between an ANN/BM25 ranker and the user.

    Contract + topology: `candidates` is a BOUNDED top-N list (the
    TakeOrdered output of an upstream ranker — same contract as
    `rrf_fuse`), so the greedy loop runs inside ONE `applyInPandas`
    group on one executor: the distributed part of retrieval is the
    narrowing, the O(N*k) rerank is not worth a shuffle per step. The
    iteration is inherently sequential (each pick changes the next
    penalty), hence no SQL oracle — the registry entry registers
    rows-only and the greedy semantics are pinned by closed-form tests.
    Ties break on (relevance desc, id asc) for run-to-run determinism.
    """
    import numpy as np
    import pandas as pd

    out_schema = (
        f"rank int, {id_col} long, relevance double, mmr double"
    )

    def rerank(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n == 0:
            return pd.DataFrame(
                {"rank": [], id_col: [], "relevance": [], "mmr": []}
            ).astype({"rank": "int32", id_col: "int64"})
        # deterministic candidate order: relevance desc, id asc
        pdf = pdf.sort_values(
            [score_col, id_col], ascending=[False, True]
        ).reset_index(drop=True)
        m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0.0] = 1.0
        unit = m / norms[:, None]
        rel = pdf[score_col].to_numpy(dtype="float64")
        ids = pdf[id_col].to_numpy()
        picked: list[int] = []
        max_sim = np.zeros(n)
        mmrs: list[float] = []
        avail = np.ones(n, dtype=bool)
        for _ in range(min(k, n)):
            scores = lam * rel - (1.0 - lam) * max_sim
            scores[~avail] = -np.inf
            best = int(np.argmax(scores))  # first max = best tiebreak order
            picked.append(best)
            mmrs.append(float(scores[best]))
            avail[best] = False
            max_sim = np.maximum(max_sim, unit @ unit[best])
        return pd.DataFrame(
            {
                "rank": np.arange(1, len(picked) + 1, dtype="int32"),
                id_col: ids[picked],
                "relevance": rel[picked],
                "mmr": mmrs,
            }
        )

    return (
        candidates.select(
            F.lit(1).alias("__g"), F.col(id_col), F.col(vec_col), F.col(score_col)
        )
        .groupBy("__g")
        .applyInPandas(lambda _, pdf: rerank(pdf), out_schema)
    )
