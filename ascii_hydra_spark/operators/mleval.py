"""Model-evaluation metrics over (score, label) columns.

Companion to the training-side primitives (`analytics.decision_stump`,
`clustering.kmeans`, the corpus split/mixing ops): once a pipeline scores
examples, these are the standard readouts — threshold metrics (confusion
matrix, precision/recall/F1), ranking quality (ROC AUC), and probability
quality (calibration / reliability bins). All three are single-pass
aggregate shapes:

* confusion metrics: ONE conditional aggregate over the fact rows — no
  window, no join; every derived rate comes from four exact integers.
* AUC: the rank formulation (AUC = (R_pos - n_pos(n_pos+1)/2) /
  (n_pos*n_neg), the Mann-Whitney identity), with average ranks for ties —
  half-integers, exact in doubles. The global rank window sorts SCORES,
  so the same entity-level-input contract as `analytics.gini_coefficient`
  applies: feed per-entity scores (or a bounded sample), not 100 TB of
  raw rows.
* calibration: NTILE over (score, tiebreak) — deterministic bin edges —
  then a per-bin aggregate with decimal-exact score sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def confusion_metrics(
    df: DataFrame, score_col: str, label_col: str, threshold: float
) -> DataFrame:
    """One row (tp, fp, fn, tn, accuracy, precision, recall, f1) for the
    classifier "score >= threshold". Four exact-integer cells from one
    conditional aggregate; each rate is a single division (F1 from the
    derived precision/recall in one written order), 6-dp-rounded."""
    pred = F.col(score_col) >= F.lit(threshold)
    y = F.col(label_col).cast("bigint") == 1
    agg = df.agg(
        F.sum((pred & y).cast("bigint")).alias("tp"),
        F.sum((pred & ~y).cast("bigint")).alias("fp"),
        F.sum((~pred & y).cast("bigint")).alias("fn"),
        F.sum((~pred & ~y).cast("bigint")).alias("tn"),
    )
    tp = F.col("tp").cast("double")
    fp = F.col("fp").cast("double")
    fn = F.col("fn").cast("double")
    tn = F.col("tn").cast("double")
    prec = tp / F.nullif(tp + fp, F.lit(0.0))
    rec = tp / F.nullif(tp + fn, F.lit(0.0))
    return agg.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round((tp + tn) / (tp + fp + fn + tn), 6).alias("accuracy"),
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(
            F.lit(2.0) * prec * rec / F.nullif(prec + rec, F.lit(0.0)), 6
        ).alias("f1"),
    )


def auc_score(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """One row (n_pos, n_neg, auc): ROC AUC by the rank identity —
    P(score_pos > score_neg) with ties counting half, i.e. the normalized
    Mann-Whitney U over average ranks. Ranks are half-integers (exact in
    doubles, partition-order-independent); the single division is last.

    Entity-level-input contract: the rank window is global (it must
    totally order the scores), so callers feed per-entity scores or a
    bounded candidate set — the same rule as `gini_coefficient`.
    """
    w = Window.orderBy(F.col(score_col))
    w_tie = Window.partitionBy(F.col(score_col))
    ranked = df.select(
        (F.col(label_col).cast("bigint") == 1).alias("__pos"),
        (
            F.rank().over(w).cast("double")
            + (F.count("*").over(w_tie).cast("double") - F.lit(1.0))
            / F.lit(2.0)
        ).alias("__ar"),
    )
    agg = ranked.agg(
        F.sum(F.col("__pos").cast("bigint")).alias("n_pos"),
        F.sum((~F.col("__pos")).cast("bigint")).alias("n_neg"),
        F.sum(F.when(F.col("__pos"), F.col("__ar"))).alias("__rp"),
    )
    np_ = F.col("n_pos").cast("double")
    nn = F.col("n_neg").cast("double")
    auc = (F.col("__rp") - np_ * (np_ + F.lit(1.0)) / F.lit(2.0)) / F.nullif(
        np_ * nn, F.lit(0.0)
    )
    return agg.select("n_pos", "n_neg", F.round(auc, 6).alias("auc"))


def calibration_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    tiebreak: str,
    *,
    n_bins: int = 10,
    scale: int = 2,
) -> DataFrame:
    """(bin, n_obs, mean_score, pos_rate): the reliability diagram — rank
    the scores into n_bins equal-count bins and compare each bin's mean
    score against its observed positive rate. A well-calibrated scorer
    has mean_score ~ pos_rate per bin.

    NTILE over (score, tiebreak) makes bin assignment deterministic under
    tied scores; scores accumulate as DECIMAL(18,scale) so the per-bin
    mean is partition-order-exact. Same global-window contract as
    `auc_score`.
    """
    w = Window.orderBy(F.col(score_col), F.col(tiebreak))
    binned = df.select(
        F.ntile(n_bins).over(w).alias("bin"),
        F.col(score_col).cast(f"decimal(18,{scale})").alias("__s"),
        F.col(label_col).cast("bigint").alias("__y"),
    )
    per = binned.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n_obs"),
        F.sum("__s").cast("double").alias("__sum_s"),
        F.sum("__y").cast("bigint").alias("__n_pos"),
    )
    n = F.col("n_obs").cast("double")
    return per.select(
        "bin",
        "n_obs",
        F.round(F.col("__sum_s") / n, 6).alias("mean_score"),
        F.round(F.col("__n_pos").cast("double") / n, 6).alias("pos_rate"),
    )


def mutual_information(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """One row (n, cells, mi): mutual information in nats between two
    categorical columns — MI = sum (n_xy/n) * ln(n*n_xy / (n_x*n_y)).
    The feature-relevance screen that catches non-linear association
    where correlation reads zero; completes the screening trio with the
    chi-squared test and the Gini stump.

    One (x, y)-keyed aggregate builds the cell table; margins are two
    more bounded aggregates joined back (cell-table-sized, broadcast);
    all log inputs are exact integers and each term follows one written
    order, so the final cell-bounded sum matches the oracle under the
    same 6-dp round as the KL/entropy family.
    """
    cells = df.groupBy(
        F.col(x_col).alias("__x"), F.col(y_col).alias("__y")
    ).agg(F.count("*").alias("__nxy"))
    mx = cells.groupBy("__x").agg(F.sum("__nxy").alias("__nx"))
    my = cells.groupBy("__y").agg(F.sum("__nxy").alias("__ny"))
    tot = cells.agg(F.sum("__nxy").alias("__n"))
    j = (
        cells.join(F.broadcast(mx), "__x")
        .join(F.broadcast(my), "__y")
        .crossJoin(F.broadcast(tot))
    )
    nxy = F.col("__nxy").cast("double")
    nx = F.col("__nx").cast("double")
    ny = F.col("__ny").cast("double")
    n = F.col("__n").cast("double")
    term = (nxy / n) * F.log((n * nxy) / (nx * ny))
    return j.agg(
        F.max(F.col("__n")).cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("cells"),
        F.round(F.sum(term), 6).alias("mi"),
    )
