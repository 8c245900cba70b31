"""Hand-computed closed-form checks for the round-7 operator wave.

The oracle differential sweep already replays every entry against DuckDB;
these tests pin the MATH itself on tiny fixtures a human can verify, so a
matching-but-wrong oracle can't slip through (both-sides-wrong risk).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ascii_hydra_spark.operators import analytics, asof, text


def test_kruskal_wallis_hand_case(spark):
    # Groups A = {1, 3, 5}, B = {2, 4, 6}: ranks 1..6, no ties.
    # R_A = 1+3+5 = 9, R_B = 2+4+6 = 12.
    # H = 12/(6*7) * (81/3 + 144/3) - 3*7 = (12/42)*75 - 21 = 3/7.
    df = spark.createDataFrame(
        [("A", 1.0), ("B", 2.0), ("A", 3.0), ("B", 4.0), ("A", 5.0), ("B", 6.0)],
        ["g", "x"],
    )
    row = analytics.kruskal_wallis(df, "g", "x").collect()[0]
    assert row["n_total"] == 6 and row["n_groups"] == 2
    assert row["h"] == pytest.approx(3.0 / 7.0, abs=1e-6)
    # no ties -> correction is 1, corrected == raw
    assert row["h_tie_corrected"] == pytest.approx(row["h"], abs=1e-9)


def test_kruskal_wallis_midranks_with_ties(spark):
    # A = {1, 2}, B = {2, 3}: sorted 1, 2, 2, 3 -> midrank of the 2s is
    # 2.5. R_A = 1 + 2.5 = 3.5, R_B = 2.5 + 4 = 6.5.
    # H = 12/(4*5) * (3.5^2/2 + 6.5^2/2) - 3*5 = 0.6*(6.125+21.125) - 15
    #   = 1.35; ties: one group of t=2 -> sum(t^3-t) = 6,
    # C = 1 - 6/(64-4) = 0.9 -> H_c = 1.5.
    df = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("B", 2.0), ("B", 3.0)], ["g", "x"]
    )
    row = analytics.kruskal_wallis(df, "g", "x").collect()[0]
    assert row["h"] == pytest.approx(1.35, abs=1e-6)
    assert row["h_tie_corrected"] == pytest.approx(1.5, abs=1e-6)


def test_bartlett_equal_variances_is_zero(spark):
    # Two groups with IDENTICAL sample variance -> T = 0 exactly
    # (the log of the pooled variance equals the weighted logs).
    df = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 11.0), ("B", 12.0), ("B", 13.0)],
        ["g", "x"],
    )
    row = analytics.bartlett(df, "g", "x").collect()[0]
    assert row["pooled_var"] == pytest.approx(1.0, abs=1e-9)
    assert row["bartlett_t"] == pytest.approx(0.0, abs=1e-9)


def test_quantile_normalize_maps_to_pooled_order_stats(spark):
    # Group A = {10, 20}, B = {30, 40}: pooled sorted = 10,20,30,40.
    # n_g = 2, N = 4 -> rank r maps to pooled position 2r.
    # A: r=1 -> pos 2 (20), r=2 -> pos 4 (40); B likewise -> both groups
    # become {20, 40}.
    df = spark.createDataFrame(
        [("A", 10.0, 1), ("A", 20.0, 2), ("B", 30.0, 3), ("B", 40.0, 4)],
        ["g", "x", "id"],
    )
    d = df.select("g", F.col("x").cast("decimal(12,4)").alias("x"), "id")
    out = analytics.quantile_normalize(d, "g", "x", "id").collect()
    got = {(r["g"], float(r["x"]), float(r["value_norm"])) for r in out}
    assert got == {
        ("A", 10.0, 20.0),
        ("A", 20.0, 40.0),
        ("B", 30.0, 20.0),
        ("B", 40.0, 40.0),
    }


def test_as_of_join_nearest_tie_prefers_backward(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 12:00:00")], ["k", "ts"]
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, 100, "2024-01-01 11:00:00"), (1, 200, "2024-01-01 13:00:00")],
        ["k", "event_id", "ts"],
    ).select("k", "event_id", F.col("ts").cast("timestamp").alias("ts"))
    row = asof.as_of_join_nearest(
        left, right, key="k", right_value_cols=("event_id",)
    ).collect()[0]
    # both candidates exactly 1h away -> backward (earlier) wins
    assert row["nearest_event_id"] == 100
    assert row["nearest_gap_us"] == -3600 * 1_000_000


def test_as_of_join_nearest_picks_closer_side(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 12:00:00")], ["k", "ts"]
    ).select("k", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [(1, 100, "2024-01-01 10:00:00"), (1, 200, "2024-01-01 12:30:00")],
        ["k", "event_id", "ts"],
    ).select("k", "event_id", F.col("ts").cast("timestamp").alias("ts"))
    row = asof.as_of_join_nearest(
        left, right, key="k", right_value_cols=("event_id",)
    ).collect()[0]
    assert row["nearest_event_id"] == 200
    assert row["nearest_gap_us"] == 1800 * 1_000_000


def test_nb_langid_separable_vocab_is_diagonal(spark):
    # Disjoint vocabularies -> the classifier recovers every label.
    rows = []
    for i in range(6):
        rows.append((i, "aa bb aa cc", "en"))
    for i in range(6, 12):
        rows.append((i, "xx yy xx zz", "fr"))
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    got = {
        (r["true_lang"], r["pred_lang"]): r["n_docs"]
        for r in text.nb_langid_confusion(df).collect()
    }
    assert got == {("en", "en"): 6, ("fr", "fr"): 6}


def test_bartlett_known_two_group_value(spark):
    # A = {1,2,3,4} (var 5/3), B = {1,3,5,7} (var 20/3); hand-replay of
    # the statistic pins the formula's constants.
    df = spark.createDataFrame(
        [("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 4.0),
         ("B", 1.0), ("B", 3.0), ("B", 5.0), ("B", 7.0)],
        ["g", "x"],
    )
    row = analytics.bartlett(df, "g", "x").collect()[0]
    va, vb = 5.0 / 3.0, 20.0 / 3.0
    n, k = 8, 2
    pooled = (3 * va + 3 * vb) / (n - k)
    t = (n - k) * math.log(pooled) - 3 * (math.log(va) + math.log(vb))
    c = 1.0 + (1.0 / 3 + 1.0 / 3 - 1.0 / (n - k)) / (3.0 * (k - 1))
    assert row["bartlett_t"] == pytest.approx(round(t / c, 6), abs=2e-6)


def test_grouped_exact_median_odd_and_even(spark):
    # A has 3 values (odd -> middle), B has 4 (even -> mean of middles).
    df = spark.createDataFrame(
        [("A", 1.0), ("A", 5.0), ("A", 9.0),
         ("B", 2.0), ("B", 4.0), ("B", 6.0), ("B", 8.0)],
        ["g", "x"],
    )
    d = df.select("g", F.col("x").cast("decimal(12,4)").alias("x"))
    got = {
        r["g"]: (r["n"], r["median"])
        for r in analytics.grouped_exact_median(d, "g", "x").collect()
    }
    assert got == {"A": (3, 5.0), "B": (4, 5.0)}


def test_grouped_exact_median_with_ties(spark):
    # ties straddling the middle: {1, 3, 3, 7} -> median (3+3)/2 = 3.
    df = spark.createDataFrame(
        [("A", 1.0), ("A", 3.0), ("A", 3.0), ("A", 7.0)], ["g", "x"]
    )
    d = df.select("g", F.col("x").cast("decimal(12,4)").alias("x"))
    row = analytics.grouped_exact_median(d, "g", "x").collect()[0]
    assert (row["n"], row["median"]) == (4, 3.0)


def test_grouped_exact_quantiles_interpolation(spark):
    # {10, 20, 30, 40}: h(q1) = 3*0.25 = 0.75 -> 10 + 10*0.75 = 17.5;
    # median 25; h(q3) = 2.25 -> 30 + 10*0.25 = 32.5.
    df = spark.createDataFrame(
        [("A", 10.0), ("A", 20.0), ("A", 30.0), ("A", 40.0)], ["g", "x"]
    )
    d = df.select("g", F.col("x").cast("decimal(12,4)").alias("x"))
    row = analytics.grouped_exact_quantiles(
        d, "g", "x", quantiles=(0.25, 0.5, 0.75)
    ).collect()[0]
    assert row["n"] == 4
    assert row["q_0_25"] == pytest.approx(17.5, abs=1e-9)
    assert row["q_0_5"] == pytest.approx(25.0, abs=1e-9)
    assert row["q_0_75"] == pytest.approx(32.5, abs=1e-9)


def test_grouped_exact_quantiles_extremes(spark):
    # q=0 and q=1 must return min and max exactly.
    df = spark.createDataFrame(
        [("A", 3.0), ("A", 7.0), ("A", 11.0)], ["g", "x"]
    )
    d = df.select("g", F.col("x").cast("decimal(12,4)").alias("x"))
    row = analytics.grouped_exact_quantiles(
        d, "g", "x", quantiles=(0.0, 1.0)
    ).collect()[0]
    assert row["q_0_0"] == pytest.approx(3.0, abs=1e-9)
    assert row["q_1_0"] == pytest.approx(11.0, abs=1e-9)
