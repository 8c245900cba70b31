"""Distribution analytics: concentration (Gini, decile lift), data-quality
digit audits (Benford), and equi-width histograms.

Beyond-reference analytics surface in the same spirit as
``operators/corpus.py``: the reference's workload is star joins +
group-bys (paper.md:150-155); these are the standard next-step
distribution diagnostics an analytics engine is asked for on top of them.

Scale notes (every function):

* Inputs are ENTITY-LEVEL aggregates (per-customer revenue, per-order
  totals), never raw fact rows — the caller reduces the 100 TB fact table
  with a keyed groupBy first, so the global windows here (Gini rank,
  NTILE) sort millions of entities, not billions of line items. The
  functions that need a total order document that contract and are the
  only place in the package a global window is accepted (`keyed_window`
  rejects them elsewhere).
* Histograms and digit audits are pure groupBy shapes — partial-
  aggregated map-side, output is bucket-count sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dsum(col: Column, scale: int = 2) -> Column:
    """Decimal-accumulated sum (order-independent), surfaced as double."""
    return F.sum(col.cast(f"decimal(18,{scale})")).cast("double")


def gini_coefficient(
    df: DataFrame, value_col: str, tiebreak: str
) -> DataFrame:
    """One row (n, gini): Gini concentration coefficient of `value_col`
    via the rank formulation G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n with
    x sorted ascending (ties broken by `tiebreak` so the rank — and hence
    the statistic under exact arithmetic — is reproducible).

    Contract: `df` is an entity-level aggregate (e.g. one row per
    customer). The rank is a global window — acceptable because the
    entity table is orders of magnitude smaller than the fact data; for
    billions of entities, swap in a distributed rank (zipWithIndex over a
    range-partitioned sort) before this formula.

    Both sums accumulate exactly: sum(x) as DECIMAL, sum(i*x_i) as
    DECIMAL(38,6) (rank * 2-dp value stays exact), so the one double
    division is bit-identical across engines.
    """
    w = Window.orderBy(F.col(value_col).asc(), F.col(tiebreak).asc())
    ranked = df.select(
        F.col(value_col).cast("decimal(18,2)").alias("__x"),
        F.row_number().over(w).cast("long").alias("__i"),
    )
    agg = ranked.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("__x").alias("__sx"),
        F.sum(F.col("__i").cast("decimal(18,0)") * F.col("__x")).alias("__six"),
    )
    n = F.col("n").cast("double")
    # nullif guards ANSI divide-by-zero: Gini is undefined on an all-zero
    # population (hypothesis-found edge), surfaced as NULL not an error
    sx = F.nullif(F.col("__sx").cast("double"), F.lit(0.0))
    gini = (
        F.lit(2.0) * F.col("__six").cast("double") / (n * sx)
        - (n + F.lit(1.0)) / n
    )
    return agg.select("n", F.round(gini, 6).alias("gini"))


def benford_digits(df: DataFrame, value_col: str) -> DataFrame:
    """(digit, n_obs, share, benford_p, chi2_term): observed first-
    significant-digit distribution of a positive 2-dp money column vs
    Benford's law p(d) = log10(1 + 1/d) — the classic fraud /
    synthetic-data audit.

    The first digit is extracted in integer space (value -> cents ->
    leading character of the decimal string), not via log10/pow, so
    values like exactly 100.00 can't straddle a float boundary
    differently per engine.
    """
    cents = F.round(F.col(value_col) * 100, 0).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    counts = (
        df.filter(F.col(value_col) > 0)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").cast("bigint").alias("n_obs"))
    )
    total = counts.agg(F.sum("n_obs").cast("double").alias("__total"))
    p = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double"))
    out = counts.crossJoin(F.broadcast(total)).withColumn("benford_p", p)
    expected = F.col("__total") * F.col("benford_p")
    diff = F.col("n_obs").cast("double") - expected
    chi2 = diff * diff / expected  # d*d, not pow(d,2): libm pow parity risk
    return out.select(
        "digit",
        "n_obs",
        F.round(F.col("n_obs").cast("double") / F.col("__total"), 6).alias("share"),
        F.round("benford_p", 6).alias("benford_p"),
        F.round(chi2, 6).alias("chi2_term"),
    )


def equi_width_histogram(
    df: DataFrame, value_col: str, lo: float, hi: float, n_buckets: int
) -> DataFrame:
    """(bucket, bucket_lo, n_obs, min_v, max_v): fixed-bound equi-width
    histogram. Bucket = clamp(floor((x - lo) / width)) with `width`
    computed ONCE on the driver and injected as a literal, so both
    engines floor the identical double expression; out-of-range values
    clamp into the edge buckets (a histogram must not drop rows
    silently).

    Pure groupBy — the aggregate is map-side partial, output is
    n_buckets rows. This is the streaming-friendly histogram shape
    (contrast `quantile_buckets`, which needs a percentile pass first).
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    width = (float(hi) - float(lo)) / n_buckets
    x = F.col(value_col).cast("double")
    raw = F.floor((x - F.lit(float(lo))) / F.lit(width))
    bucket = F.least(F.greatest(raw, F.lit(0)), F.lit(n_buckets - 1)).cast("int")
    return (
        df.select(x.alias("__x"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_obs"),
            F.round(F.min("__x"), 6).alias("min_v"),
            F.round(F.max("__x"), 6).alias("max_v"),
        )
        .withColumn(
            "bucket_lo",
            F.round(F.lit(float(lo)) + F.col("bucket") * F.lit(width), 6),
        )
        .select("bucket", "bucket_lo", "n_obs", "min_v", "max_v")
    )


def decile_shares(
    df: DataFrame, value_col: str, tiebreak: str, tiles: int = 10
) -> DataFrame:
    """(tile, n, revenue, share, cum_share): NTILE lift table — rank
    entities by `value_col` descending, split into `tiles` equal groups,
    report each group's share and the cumulative share ("the top decile
    holds X% of revenue").

    Same entity-level-input contract as `gini_coefficient` (the NTILE is
    a global window over the aggregated table). Per-tile revenue
    accumulates in DECIMAL so partition order can't shift a rounding
    boundary; the cumulative sum runs over at most `tiles` rows.
    """
    w = Window.orderBy(F.col(value_col).desc(), F.col(tiebreak).asc())
    tiled = df.select(
        F.col(value_col).alias("__x"),
        F.ntile(tiles).over(w).cast("bigint").alias("tile"),
    )
    per = tiled.groupBy("tile").agg(
        F.count("*").cast("bigint").alias("n"),
        _dsum(F.col("__x")).alias("revenue"),
    )
    total = per.agg(F.sum(F.col("revenue").cast("decimal(18,2)")).cast("double").alias("__t"))
    w_cum = Window.orderBy("tile").rowsBetween(Window.unboundedPreceding, 0)
    cum = F.sum(F.col("revenue").cast("decimal(18,2)")).over(w_cum).cast("double")
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "tile",
            "n",
            "revenue",
            F.round(F.col("revenue") / F.col("__t"), 6).alias("share"),
            F.round(cum / F.col("__t"), 6).alias("cum_share"),
        )
    )
