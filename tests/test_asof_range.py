"""Boundary tests for as-of / interval joins (SURVEY C19)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ascii_hydra_spark.operators import asof


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id BIGINT, user_id BIGINT, ts STRING"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_banded_interval_join_boundaries(spark):
    left = _events(spark, [(1, 1, "2024-01-01 10:00:00")])
    right = _events(
        spark,
        [
            (10, 1, "2024-01-01 09:55:00"),  # exactly -300s: included
            (11, 1, "2024-01-01 10:05:00"),  # exactly +300s: included
            (12, 1, "2024-01-01 10:05:01"),  # +301s: excluded
            (13, 1, "2024-01-01 09:54:59"),  # -301s: excluded
            (14, 2, "2024-01-01 10:00:00"),  # wrong key: excluded
        ],
    )
    out = asof.banded_interval_join(
        left, right, key="user_id", left_ts="ts", right_ts="ts", tolerance_seconds=300
    )
    got = sorted(r.r_event_id for r in out.collect())
    assert got == [10, 11]


def test_banded_matches_theta_join(spark, sf_dir):
    """The banding must find exactly the pairs the direct theta join finds."""
    from ascii_hydra_spark.catalog import Catalog

    e = (
        Catalog.for_dir(sf_dir)
        .load(spark, "events")
        .limit(400)
        .select("event_id", "user_id", "ts")
    )
    tol = 600
    banded = asof.banded_interval_join(
        e, e, key="user_id", left_ts="ts", right_ts="ts", tolerance_seconds=tol
    )
    banded_pairs = {
        (r.l_event_id, r.r_event_id) for r in banded.collect()
    }
    a, b = e.alias("a"), e.alias("b")
    theta = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (
            F.abs(F.unix_micros("a.ts") - F.unix_micros("b.ts"))
            <= tol * 1_000_000
        ),
    ).select(F.col("a.event_id").alias("x"), F.col("b.event_id").alias("y"))
    theta_pairs = {(r.x, r.y) for r in theta.collect()}
    assert banded_pairs == theta_pairs


def test_asof_tolerance_nullifies_stale_matches(spark):
    left = _events(spark, [(1, 1, "2024-01-01 12:00:00")])
    right = _events(spark, [(9, 1, "2024-01-01 09:00:00")])
    out = asof.as_of_join(
        left, right, key="user_id", right_value_cols=("event_id",), tolerance_seconds=3600
    )
    assert out.first().asof_event_id is None
    out2 = asof.as_of_join(left, right, key="user_id", right_value_cols=("event_id",))
    assert out2.first().asof_event_id == 9


def test_jdbc_passthrough_raises_without_driver(spark):
    """B13: the JDBC surface exists; this container ships no driver jar, so
    execution fails at driver-class resolution (not in our code)."""
    from ascii_hydra_spark import sources

    with pytest.raises(Exception):
        sources.read_jdbc(
            spark, "jdbc:postgresql://localhost:5/db", "t", driver="org.postgresql.Driver"
        ).count()


def test_asof_forward_boundaries(spark):
    """Forward as-of: equal timestamps match (inclusive); with several
    right rows at the matched ts the MIN value wins; tolerance bounds how
    far ahead a match may be."""
    from ascii_hydra_spark.operators import asof

    left = spark.createDataFrame(
        [(1, 100, 10), (2, 100, 20), (3, 200, 35)],
        "event_id BIGINT, user_id BIGINT, t BIGINT",
    ).select("event_id", "user_id", F.timestamp_seconds("t").alias("ts"))
    right = spark.createDataFrame(
        [(901, 100, 10), (902, 100, 10), (905, 100, 25), (907, 200, 99)],
        "event_id BIGINT, user_id BIGINT, t BIGINT",
    ).select("event_id", "user_id", F.timestamp_seconds("t").alias("ts"))

    out = {
        r["event_id"]: r["asof_event_id"]
        for r in asof.as_of_join(
            left, right, key="user_id", direction="forward"
        ).collect()
    }
    # equal ts inclusive, min event_id at the boundary; next-ahead otherwise
    assert out == {1: 901, 2: 905, 3: 907}

    out_tol = {
        r["event_id"]: r["asof_event_id"]
        for r in asof.as_of_join(
            left, right, key="user_id", direction="forward", tolerance_seconds=10
        ).collect()
    }
    # 3 -> 907 is 64s ahead: outside tolerance; 2 -> 905 is 5s ahead: inside
    assert out_tol == {1: 901, 2: 905, 3: None}


def test_asof_nearest_keeps_null_bearing_left_rows(spark):
    # a NULL in any left column (key, ts, or a carried column) must not
    # drop the row: the directional join-back is null-safe, matching
    # plain as_of_join where a NULL key forms its own window partition
    left = spark.createDataFrame(
        [
            (1, 1, "2024-01-01 10:00:00"),
            (2, None, "2024-01-01 10:00:00"),   # NULL key
            (3, 1, None),                        # NULL ts
            (None, 1, "2024-01-01 11:00:00"),    # NULL carried column
        ],
        "event_id BIGINT, user_id BIGINT, ts STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [(10, 1, "2024-01-01 09:59:00"), (11, 1, "2024-01-01 10:02:00")],
        "event_id BIGINT, user_id BIGINT, ts STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = asof.as_of_join_nearest(left, right, "user_id").collect()
    assert len(out) == 4  # every left row survives exactly once
    by_ev = {r["event_id"]: r for r in out}
    assert by_ev[1]["nearest_event_id"] == 10  # -60s beats +120s
    assert by_ev[2]["nearest_event_id"] is None  # NULL key: no match
    # NULL ts inherits the directional passes' NULL ordering: the
    # backward pass sees nothing (NULLs sort first), the forward pass
    # matches its direction's tiebreak pick — with a NULL gap
    assert by_ev[3]["nearest_event_id"] == 10
    assert by_ev[3]["nearest_gap_us"] is None
    assert by_ev[None]["nearest_event_id"] == 11  # +120s only side
