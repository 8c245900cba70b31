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
