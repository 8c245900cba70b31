"""distrank: the distributed exact-rank arm must be value-identical to
the single-window formulation (that equivalence is what lets the four
converted statistics keep their unchanged DuckDB oracles) while keeping
every data-sized stage partitioned — asserted here both by value and by
plan shape. The bucket is a pure function of the row's key (percentile
split points), NOT spark_partition_id over a range shuffle: the
RangePartitioner re-samples boundaries per plan instantiation (seeded
by RDD id), and the count branch vs the window branch of the two-pass
rank got DIFFERENT boundary assignments — observed as duplicate global
ranks before the value-derived design.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window, functions as F

from ascii_hydra_spark.operators import distrank


def _rows(spark, n=5000, seed_mod=977):
    # deterministic scrambled values with heavy ties (v has ~97 distinct)
    return spark.createDataFrame(
        [(i, (i * seed_mod) % 97, (i * 31) % n) for i in range(n)],
        "k long, v long, tb long",
    )


def test_global_row_number_matches_single_window(spark):
    df = _rows(spark)
    got = distrank.global_row_number(
        df, F.col("v"), [F.col("tb")], out_col="i"
    )
    want = df.select(
        "k",
        F.row_number()
        .over(Window.orderBy(F.col("v").asc(), F.col("tb").asc()))
        .cast("long")
        .alias("i"),
    )
    assert got.select("k", "i").exceptAll(want).count() == 0


def test_global_row_number_desc_and_total(spark):
    df = _rows(spark, n=1000)
    got = distrank.global_row_number(
        df, F.col("v"), [F.col("tb")], desc=True, out_col="i", total_col="n"
    )
    assert got.filter(F.col("n") != 1000).count() == 0
    want = df.select(
        "k",
        F.row_number()
        .over(Window.orderBy(F.col("v").desc(), F.col("tb").asc()))
        .cast("long")
        .alias("i"),
    )
    assert got.select("k", "i").exceptAll(want).count() == 0


def test_global_running_sum_matches_single_window(spark):
    df = _rows(spark, n=3000).groupBy("v").agg(F.count("*").alias("c"))
    got = distrank.global_running_sum(df, F.col("v"), F.col("c"), out_col="cum")
    want = df.select(
        "v",
        F.sum("c")
        .over(Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum"),
    )
    assert got.select("v", "cum").exceptAll(want).count() == 0


@pytest.mark.parametrize("n,tiles", [(100, 10), (95, 10), (7, 10), (1, 4), (10, 3)])
def test_ntile_formula_matches_spark_ntile(spark, n, tiles):
    df = spark.createDataFrame([(i,) for i in range(n)], "k long")
    ranked = distrank.global_row_number(
        df, F.col("k"), out_col="i", total_col="n"
    )
    got = ranked.select(
        "k",
        distrank.ntile_from_row_number(F.col("i"), F.col("n"), tiles)
        .cast("int")
        .alias("t"),
    )
    want = df.select("k", F.ntile(tiles).over(Window.orderBy("k")).alias("t"))
    assert got.exceptAll(want).count() == 0


def test_single_bucket_degenerate(spark):
    df = _rows(spark, n=40)
    got = distrank.global_row_number(
        df, F.col("v"), [F.col("tb")], out_col="i", num_buckets=1
    )
    want = df.select(
        "k",
        F.row_number()
        .over(Window.orderBy(F.col("v").asc(), F.col("tb").asc()))
        .cast("long")
        .alias("i"),
    )
    assert got.select("k", "i").exceptAll(want).count() == 0


def test_ranks_are_a_permutation(spark):
    # the failure mode of the partition-id design was DUPLICATE ranks;
    # pin the permutation property explicitly
    df = _rows(spark, n=4000)
    got = distrank.global_row_number(df, F.col("v"), [F.col("tb")], out_col="i")
    assert got.select("i").distinct().count() == 4000
    mm = got.agg(F.min("i").alias("lo"), F.max("i").alias("hi")).collect()[0]
    assert (mm.lo, mm.hi) == (1, 4000)


def test_rank_plan_has_no_unpartitioned_data_window(spark):
    import re

    df = _rows(spark, n=2000)
    got = distrank.global_row_number(df, F.col("v"), [F.col("tb")])
    plan = got._jdf.queryExecution().executedPlan().toString()
    # every Window node must carry a partition spec: WindowExec warns
    # (and single-partitions) exactly when the spec list is empty
    for m in re.finditer(r"Window \[[^\]]*\](.*)", plan):
        rest = m.group(1)
        assert rest.strip().startswith(", ["), f"unpartitioned window: {m.group(0)[:120]}"
