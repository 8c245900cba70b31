"""Physical-plan assertions: the 100 TB discipline checks (SURVEY.md §4).

Correctness tests prove the WHAT; these prove the HOW — filters reach the
parquet scan, small dims broadcast, top-k avoids a global sort — because at
1000 executors the difference between these plans and the naive ones is the
whole job.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from ascii_hydra_spark import plans
from ascii_hydra_spark.verification import REGISTRY


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = REGISTRY["projection_filter"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    assert "IsNotNull(p_size)" in plan or "GreaterThanOrEqual(p_size" in plan
    # column pruning: the scan must not read all 9 part columns
    read_schema = [l for l in plan.split("\n") if "ReadSchema" in l][0]
    assert "p_retailprice" not in read_schema


def test_star_join_broadcasts_dimensions(spark, sf_dir):
    df = REGISTRY["region_revenue"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, "dimension joins should broadcast"
    assert "SortMergeJoin" not in plan, "no shuffle join expected for dims"


def test_topk_avoids_global_sort(spark, sf_dir):
    df = REGISTRY["topk_orders"].fn(spark, sf_dir)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan


def test_partition_pruned_scan(spark, sf_dir):
    from ascii_hydra_spark import sources

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    root = tempfile.mkdtemp(prefix="ahs_prune_")
    sources.write_parquet(e, root, partition_by=("event_type",))
    df = sources.read_partitioned(spark, root, event_type="click")
    plan = _plan(df)
    assert "PartitionFilters: [" in plan
    assert "event_type" in plan.split("PartitionFilters")[1][:200]


def test_aggregate_is_partial_then_final(spark, sf_dir):
    df = REGISTRY["pricing_summary"].fn(spark, sf_dir)
    plan = _plan(df)
    # map-side combine: two HashAggregate nodes around the exchange
    assert plan.count("HashAggregate") >= 2
    # codegen annotations appear once the AQE final plan exists, so run
    # THIS df's plan to completion (count() builds a separate execution)
    df.collect()
    executed = _plan(df)
    assert "codegen id" in executed, "hot path fell out of whole-stage codegen"


def test_plan_report_structure(spark, sf_dir):
    rep = plans.plan_report(REGISTRY["region_revenue"].fn(spark, sf_dir))
    assert rep["broadcast_hash_joins"] >= 1 and rep["sort_merge_joins"] == 0
    assert rep["shuffles"] >= 1  # the final group-by
    rep2 = plans.plan_report(REGISTRY["topk_orders"].fn(spark, sf_dir))
    assert rep2["take_ordered"] and rep2["shuffles"] == 0
    rep3 = plans.plan_report(REGISTRY["projection_filter"].fn(spark, sf_dir))
    assert rep3["has_pushed_filters"]


def test_pipeline_dag_runs_in_dependency_order(spark, sf_dir):
    base = tempfile.mkdtemp(prefix="ahs_pipe_")
    pipe = plans.Pipeline(base_path=base)

    @pipe.asset("orders_slim")
    def orders_slim(spark_, deps):
        return spark_.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )

    @pipe.asset("cust_revenue", deps=("orders_slim",))
    def cust_revenue(spark_, deps):
        return (
            deps["orders_slim"]
            .groupBy("o_custkey")
            .agg(F.sum("o_totalprice").alias("rev"))
        )

    reports = pipe.run(spark)
    assert set(reports) == {"orders_slim", "cust_revenue"}
    assert reports["orders_slim"]["row_count"] > 0
    assert reports["cust_revenue"]["row_count"] > 0
    assert spark.read.parquet(f"{base}/cust_revenue").count() == reports[
        "cust_revenue"
    ]["row_count"]
