"""±ε contracts for the approximate aggregate arm (SURVEY.md C20).

approx_count_distinct (HLL++) and percentile_approx can't be hash-matched
against an oracle; instead their documented error bounds are asserted
against the exact values on the same data.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    row = li.agg(
        F.countDistinct("l_suppkey").alias("exact"),
        F.approx_count_distinct("l_suppkey").alias("approx"),  # default rsd 5%
    ).first()
    rel_err = abs(row.approx - row.exact) / row.exact
    assert rel_err <= 0.15, f"HLL rel err {rel_err} (exact={row.exact}, approx={row.approx})"


def test_percentile_approx_within_rank_error(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    n = li.count()
    approx = li.agg(F.percentile_approx("l_quantity", 0.5, 100).alias("m")).first().m
    # rank-error bound: the approx median's rank must be within n/100 of n/2
    rank = li.filter(F.col("l_quantity") <= approx).count()
    assert abs(rank - n / 2) <= n / 100 + 1, f"rank {rank} vs n/2 {n/2}"


def test_hll_sketch_merge_accuracy(spark, sf_dir):
    """Merged per-day HLL sketches must estimate per-type distinct users
    within HLL error bounds of the exact count — the associative-partial
    pattern that replaces exact COUNT(DISTINCT) at 100 TB."""
    from pyspark.sql import functions as F

    from ascii_hydra_spark.verification import REGISTRY

    approx = {
        r["event_type"]: r["approx_users"]
        for r in REGISTRY["hll_sketch_distinct"].fn(spark, sf_dir).collect()
    }
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) / exact[k] < 0.05, (k, est, exact[k])
