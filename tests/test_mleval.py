"""Known-answer tests for operators/mleval.py (confusion metrics, ROC AUC,
calibration bins) — closed-form inputs so an oracle bug can't mask an
engine bug."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ascii_hydra_spark.operators import mleval


def test_confusion_metrics_balanced(spark):
    df = spark.createDataFrame(
        [(0.9, 1), (0.8, 0), (0.4, 1), (0.3, 0)], "score double, y int"
    )
    row = mleval.confusion_metrics(df, "score", "y", 0.5).collect()[0]
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (1, 1, 1, 1)
    for m in ("accuracy", "precision", "recall", "f1"):
        assert row[m] == pytest.approx(0.5, abs=1e-9)


def test_confusion_metrics_degenerate_guards(spark):
    # no predicted positives: precision (and f1) must be NULL, not a crash
    df = spark.createDataFrame([(0.1, 1), (0.2, 0)], "score double, y int")
    row = mleval.confusion_metrics(df, "score", "y", 0.5).collect()[0]
    assert row["precision"] is None and row["f1"] is None
    assert row["recall"] == pytest.approx(0.0, abs=1e-9)


def test_auc_perfect_and_random(spark):
    perfect = spark.createDataFrame(
        [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)], "score double, y int"
    )
    row = mleval.auc_score(perfect, "score", "y").collect()[0]
    assert (row["n_pos"], row["n_neg"]) == (2, 2)
    assert row["auc"] == pytest.approx(1.0, abs=1e-9)
    # all scores tied: every comparison counts half -> AUC exactly 0.5
    tied = spark.createDataFrame(
        [(7.0, 1), (7.0, 0), (7.0, 1), (7.0, 0)], "score double, y int"
    )
    assert mleval.auc_score(tied, "score", "y").collect()[0][
        "auc"
    ] == pytest.approx(0.5, abs=1e-9)


def test_auc_reversed_ranking_is_zero(spark):
    df = spark.createDataFrame(
        [(4.0, 0), (3.0, 0), (2.0, 1), (1.0, 1)], "score double, y int"
    )
    assert mleval.auc_score(df, "score", "y").collect()[0][
        "auc"
    ] == pytest.approx(0.0, abs=1e-9)


def test_calibration_bins_equal_counts(spark):
    # 10 rows into 2 bins: low-score bin all negative, high all positive
    rows = [(i, float(i), 1 if i > 5 else 0) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "k long, score double, y int")
    out = {
        r["bin"]: r
        for r in mleval.calibration_bins(
            df, "score", "y", "k", n_bins=2
        ).collect()
    }
    assert out[1]["n_obs"] == 5 and out[2]["n_obs"] == 5
    assert out[1]["pos_rate"] == pytest.approx(0.0, abs=1e-9)
    assert out[2]["pos_rate"] == pytest.approx(1.0, abs=1e-9)
    assert out[1]["mean_score"] == pytest.approx(3.0, abs=1e-6)
    assert out[2]["mean_score"] == pytest.approx(8.0, abs=1e-6)


def test_calibration_tiebreak_is_deterministic(spark):
    # identical scores: the bin split must follow the tiebreak column
    rows = [(i, 1.0, i % 2) for i in range(1, 7)]
    df = spark.createDataFrame(rows, "k long, score double, y int")
    a = mleval.calibration_bins(df, "score", "y", "k", n_bins=3).collect()
    b = mleval.calibration_bins(
        df.repartition(5), "score", "y", "k", n_bins=3
    ).collect()
    key = lambda r: (r["bin"], r["n_obs"], r["mean_score"], r["pos_rate"])
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_mutual_information_independent_is_zero(spark):
    # x and y independent by construction: MI must be exactly 0
    rows = [(x, y) for x in ("a", "b") for y in ("u", "v") for _ in range(5)]
    df = spark.createDataFrame(rows, "x string, y string")
    row = mleval.mutual_information(df, "x", "y").collect()[0]
    assert row["n"] == 20 and row["cells"] == 4
    assert row["mi"] == pytest.approx(0.0, abs=1e-9)


def test_mutual_information_deterministic_copy(spark):
    import math

    # y == x (balanced binary): MI = H(x) = ln 2
    rows = [("a", "a")] * 6 + [("b", "b")] * 6
    df = spark.createDataFrame(rows, "x string, y string")
    row = mleval.mutual_information(df, "x", "y").collect()[0]
    assert row["mi"] == pytest.approx(math.log(2), abs=1e-6)
