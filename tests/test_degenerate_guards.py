"""Degenerate-input guards: operators whose denominators can be zero
must return NULL (DuckDB's x/0 semantics — the oracle engine NULLs
division by zero) instead of failing the whole job with an ANSI
DIVIDE_BY_ZERO. Round-6 advisor finding: simpson_diversity with a
1-token group, kendall_tau with an all-tied column, poisson_dispersion
with n=1, char_class_profile / multibyte_ratio with an empty-text
group, max_drawdown with a zero peak. Each test feeds the degenerate
shape directly (the sf fixtures never hit these paths — that is exactly
why they need pinned tests) and asserts the job completes with NULL in
the guarded column and exact values everywhere else.
"""

from __future__ import annotations

import pytest

from ascii_hydra_spark.operators import analytics, relational, text


def test_simpson_diversity_single_token_group_is_null(spark):
    df = spark.createDataFrame(
        [(1, "solo", "a"), (2, "rich", "a b c d")],
        "doc_id long, source string, text string",
    )
    out = {r["grp"]: r for r in text.simpson_diversity(df).collect()}
    assert out["solo"]["n_tokens"] == 1
    assert out["solo"]["simpson"] is None  # N*(N-1) == 0 -> NULL, not error
    assert out["rich"]["simpson"] == pytest.approx(1.0, abs=1e-6)


def test_char_class_profile_empty_text_group_is_null(spark):
    df = spark.createDataFrame(
        [(1, "empty", ""), (2, "full", "Ab1.")],
        "doc_id long, source string, text string",
    )
    out = {r["grp"]: r for r in text.char_class_profile(df).collect()}
    assert out["empty"]["n_chars"] == 0
    for c in ("upper_ratio", "digit_ratio", "punct_ratio", "space_ratio"):
        assert out["empty"][c] is None
    assert out["full"]["upper_ratio"] == pytest.approx(0.25, abs=1e-9)
    assert out["full"]["digit_ratio"] == pytest.approx(0.25, abs=1e-9)
    assert out["full"]["punct_ratio"] == pytest.approx(0.25, abs=1e-9)


def test_multibyte_ratio_empty_text_group_is_null(spark):
    df = spark.createDataFrame(
        [(1, "empty", ""), (2, "ascii", "abcd")],
        "doc_id long, lang string, text string",
    )
    out = {r["grp"]: r for r in text.multibyte_ratio(df).collect()}
    assert out["empty"]["bytes_per_char"] is None
    assert out["ascii"]["bytes_per_char"] == pytest.approx(1.0, abs=1e-9)


def test_max_drawdown_zero_peak_is_null_pct(spark):
    # an all-zero series: running max is 0, drawdown 0, pct undefined
    df = spark.createDataFrame(
        [("2024-01-01", 0.0), ("2024-01-02", 0.0)], "day string, value double"
    )
    row = analytics.max_drawdown(df).collect()[0]
    assert row["max_drawdown"] == 0.0
    assert row["drawdown_pct"] is None


def test_kendall_tau_all_tied_x_is_null(spark):
    df = spark.createDataFrame(
        [(1, 5.0, 1.0), (2, 5.0, 2.0), (3, 5.0, 3.0)],
        "k long, x double, y double",
    )
    row = analytics.kendall_tau(df, "k", "x", "y").collect()[0]
    assert row["n_pairs"] == 3
    assert row["concordant"] == 0 and row["discordant"] == 0
    assert row["tau_b"] is None  # all pairs x-tied -> zero denominator


def test_kendall_tau_untied_still_exact(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 2.0, 2.0), (3, 3.0, 3.0)],
        "k long, x double, y double",
    )
    row = analytics.kendall_tau(df, "k", "x", "y").collect()[0]
    assert row["tau_b"] == pytest.approx(1.0, abs=1e-9)


def test_poisson_dispersion_single_entity_is_null(spark):
    df = spark.createDataFrame([(7,)], "n long")
    row = analytics.poisson_dispersion(df).collect()[0]
    assert row["n_entities"] == 1
    assert row["mean"] == pytest.approx(7.0, abs=1e-9)
    assert row["dispersion"] is None  # n*(n-1) == 0 -> NULL, not error
    assert row["z"] is None and row["p_value"] is None


def test_poisson_dispersion_all_zero_counts_is_null(spark):
    df = spark.createDataFrame([(0,), (0,), (0,)], "n long")
    row = analytics.poisson_dispersion(df).collect()[0]
    assert row["mean"] == pytest.approx(0.0, abs=1e-9)
    assert row["dispersion"] is None  # var/mean with mean == 0


def test_referential_integrity_null_fk_not_orphan(spark):
    # SQL MATCH SIMPLE: a NULL child key is never a violation; it is
    # reported separately so n_keys / n_orphans stay consistent
    child = spark.createDataFrame(
        [(1,), (2,), (None,)], "fk int"
    )
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    row = relational.referential_integrity(
        [("child.fk->parent.pk", child, "fk", parent, "pk")]
    ).collect()[0]
    assert row["n_child"] == 3
    assert row["n_keys"] == 2  # countDistinct excludes NULL
    assert row["n_null_keys"] == 1
    assert row["n_orphans"] == 0  # the advisor's repro: was 1


def test_referential_integrity_real_orphan_still_counted(spark):
    child = spark.createDataFrame([(1,), (99,), (None,)], "fk int")
    parent = spark.createDataFrame([(1,)], "pk int")
    row = relational.referential_integrity(
        [("child.fk->parent.pk", child, "fk", parent, "pk")]
    ).collect()[0]
    assert row["n_orphans"] == 1
    assert row["n_null_keys"] == 1


def test_gram_eigen_respects_id_col(spark):
    # advisor: vec_id was hardcoded while vec_col was parameterized
    from ascii_hydra_spark.operators import similarity

    df = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [1.0, 0.0])], "row_key long, vec array<double>"
    )
    row = similarity.gram_power_iteration_eigen(
        df, vec_col="vec", id_col="row_key"
    ).collect()[0]
    # Gram = [[2,0],[0,0]] -> dominant eigenvalue 2 on dim 1
    assert row["d"] == 2
    assert row["top_dim"] == 1
    assert row["eigenvalue"] == pytest.approx(2.0, abs=1e-6)


def test_peak_concurrency_empty_events_reports_zero_sessions(spark, tmp_path):
    # round-9 review finding: the grouped sweep's n_sessions is a
    # SUM(CASE ...) which is NULL over zero rows; the oracle's scalar
    # COUNT(*) subquery yields 0 — the coalesce pins the 0
    from ascii_hydra_spark.verification import REGISTRY

    empty = spark.createDataFrame(
        [],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string",
    )
    empty.write.parquet(str(tmp_path / "events.parquet"))
    row = REGISTRY["peak_concurrency_sessions"].fn(spark, str(tmp_path)).collect()[0]
    assert row["n_sessions"] == 0
    assert row["peak_concurrent"] is None
    assert row["first_peak_us"] is None
