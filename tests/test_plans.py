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


def test_disjunctive_predicate_partial_pushdown(spark, sf_dir):
    """Q19-shape OR-of-ANDs: the single-side conjuncts extractable from the
    disjunction (p_size bands on part, l_quantity bands on lineitem) must be
    pushed to their scans rather than evaluated only post-join."""
    plan = _plan(REGISTRY["tpch_q19_like"].fn(spark, sf_dir))
    pushed = [l for l in plan.split("\n") if "PushedFilters" in l]
    assert any("p_size" in l or "p_brand" in l for l in pushed), (
        "part-side residual of the disjunction should reach the part scan"
    )
    assert any("l_quantity" in l for l in pushed), (
        "lineitem-side residual should reach the lineitem scan"
    )


def test_not_in_plans_as_anti_join(spark, sf_dir):
    """Q16-shape NOT IN over a non-null key column must become an anti join
    (null-aware only if needed), never a per-row subquery."""
    plan = _plan(REGISTRY["tpch_q16_like"].fn(spark, sf_dir))
    assert "LeftAnti" in plan or "BroadcastNestedLoopJoin" in plan
    # with a broadcastable supplier table the anti join should broadcast
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_lateral_topn_plan_has_limits(spark, sf_dir):
    """The LATERAL top-2 must keep per-group limits (no unbounded global
    sort of the whole customer table)."""
    plan = _plan(REGISTRY["lateral_topn"].fn(spark, sf_dir))
    assert "Limit" in plan or "TakeOrdered" in plan or "WindowGroupLimit" in plan


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts must
    join with NO Exchange above either scan — the co-located large-large
    join that at 100 TB replaces a full-corpus shuffle. sortBy on the
    bucket key also removes the pre-merge Sort."""
    from ascii_hydra_spark import sources

    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey"
    )
    try:
        sources.write_bucketed(
            o, "b_orders", ["o_custkey"], 8, sort_cols=["o_custkey"],
            path=str(tmp_path / "b_orders"),
        )
        sources.write_bucketed(
            c, "b_customer", ["c_custkey"], 8, sort_cols=["c_custkey"],
            path=str(tmp_path / "b_customer"),
        )
        # fixture tables are broadcast-sized; turn broadcast off so the
        # plan shows the large-large path bucketing exists for
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table("b_orders").join(
                spark.table("b_customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            plan = _plan(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan, "bucketed join must not shuffle"
            n = joined.count()
            assert n == o.count(), "inner join on FK should keep every order"
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


# Queries that execute eagerly (write files / run streams) when their fn is
# called — plan/schema sweeps skip them; their plans are inspected in their
# own tests. ONE definition shared by every sweep below.
EAGER_PREFIXES = (
    "stream_", "pyds_", "jdbc_", "csv_", "json_round", "orc_", "xml_",
    "zorder", "partitioned", "hypertable", "text_scan",
)


def test_no_forced_broadcast_of_scaling_tables(spark, sf_dir):
    """customer/supplier grow linearly with the corpus: a broadcast HINT on
    them OOMs executors at 100x. The logical plans of the star/graph queries
    must carry hints only for fixed-cardinality dims (nation/region); any
    broadcast of customer/supplier may come only from AQE/size stats."""
    # Scaling tables: anything that grows with the corpus. Hints are only
    # legitimate on region/nation (fixed cardinality).
    SCALING = ("customer", "supplier", "part.parquet", "orders", "lineitem",
               "documents", "embeddings", "events")
    for name, spec in REGISTRY.items():
        if name.startswith(EAGER_PREFIXES):
            continue
        df = spec.fn(spark, sf_dir)
        lines = df._jdf.queryExecution().analyzed().toString().split("\n")
        for i, line in enumerate(lines):
            if "UnresolvedHint" not in line and "ResolvedHint" not in line:
                continue
            # Inspect the hinted subtree: offense = the hint sits on a raw
            # scan of a scaling table. A hint on a DERIVED relation (e.g. a
            # 1-row aggregate computed from lineitem) is fine — so stop at
            # the first Aggregate, and otherwise flag the first Relation
            # whose path names a scaling table. Heuristic by design (text
            # scan, 30-line window, first-Relation attribution): it catches
            # the hint-on-raw-scan pattern this repo actually uses; a hint
            # wrapping a deeply nested join subtree would need a real tree
            # walk via the py4j plan API.
            for sub in lines[i + 1 : i + 31]:
                if "Aggregate" in sub or "GlobalLimit" in sub:
                    break
                if "Relation" in sub:
                    bad = [t for t in SCALING if t in sub]
                    assert not bad, (
                        f"{name}: broadcast hint on scaling table {bad}:\n{line}\n{sub}"
                    )
                    break
    from ascii_hydra_spark.catalog import DIMENSION_TABLES

    assert "supplier" not in DIMENSION_TABLES
    assert "customer" not in DIMENSION_TABLES


def _unbounded_partition_window_lines(plan: str) -> list[str]:
    """Physical-plan lines holding a window whose partition spec is EMPTY
    or CONSTANT — the single-reducer-sort shape (WindowExec warns and moves
    ALL input to one partition). ``plan`` is ``executedPlan().toString()``.

    Parsing: every ``windowspecdefinition(part..., order..., frame)`` on a
    line is split at top level; partition exprs are the leading args before
    the first sort-order (`ASC|DESC NULLS ...`) or frame arg. Exemptions:

    - a partition spec that is exactly ``pmod(<expr>, 1)`` — the repo's
      ANNOTATED bounded single-partition marker (distrank.single_partition:
      a constant Catalyst can't fold away, used only on inputs provably
      bounded by bucket/tile counts);
    - everything else constant (no ``#<id>`` attribute reference) or empty
      is returned for the caller to check against its bounded-grain
      allowlist.
    """
    import re

    order_pat = re.compile(r"\b(ASC|DESC) NULLS (FIRST|LAST)$")
    out = []
    for raw in plan.split("\n"):
        if "windowspecdefinition(" not in raw:
            continue
        for m in re.finditer(r"windowspecdefinition\(", raw):
            i, depth, buf = m.end(), 1, []
            while i < len(raw) and depth:
                ch = raw[i]
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                if depth:
                    buf.append(ch)
                i += 1
            args, d, cur = [], 0, []
            for ch in "".join(buf):
                if ch == "(":
                    d += 1
                elif ch == ")":
                    d -= 1
                if ch == "," and d == 0:
                    args.append("".join(cur).strip())
                    cur = []
                else:
                    cur.append(ch)
            if cur:
                args.append("".join(cur).strip())
            part = []
            for a in args:
                if a.startswith("specifiedwindowframe") or order_pat.search(a):
                    break
                part.append(a)
            if part and all(re.match(r"pmod\(.*, 1\)$", p) for p in part):
                continue  # the annotated bounded single-partition marker
            if not part or not any("#" in p for p in part):
                out.append(raw.strip().lstrip(":+- ").strip()[:200])
                break  # one offense per line is enough
    return out


# Empty-partition-spec windows whose INPUT is bounded by construction —
# the annotated-grain allowlist (same style as BNLJ_OK below). A
# single-partition sort of a calendar / bucket-grid / vocab / top-N table
# is the right plan; a data-sized one is banned (the distrank conversions
# exist for those). Grain notes name the bound.
GLOBAL_WINDOW_OK = {
    # --- calendar-bounded series (<= ~2.5k days / ~340 weeks / ~84 months
    # on the 7-year order history; grows with TIME, never with data) ---
    "record_days_revenue", "autocorr_daily_revenue", "open_lines_by_day",
    "mom_revenue_growth", "bollinger_daily_revenue",
    "cumulative_user_growth", "runs_test_daily_revenue",
    "hurst_rescaled_range_daily", "seasonal_decompose_dow",
    "chow_break_midpoint", "durbin_watson_daily", "pacf_lag2_daily",
    "weekly_periodogram_power", "best_30d_revenue_window",
    "sn_scale_daily_revenue", "ljung_box_daily", "weekly_wow_volatility",
    "monthly_seasonality_revenue",
    # --- distinct-lifetime-day grain (bounded by the calendar span) ---
    "kaplan_meier_lifetimes", "nelson_aalen_lifetimes",
    # --- bucket/grid grain (fixed histogram edges, category lattices,
    # clamped integer domains) ---
    "power_user_curve",              # <=61 clamped active-day buckets
    "user_type_entropy_hist",        # entropy-decile buckets
    "customer_order_frequency_hist", # clamped count-of-counts buckets
    "sessions_per_user_hist",        # clamped count-of-counts buckets
    "discount_band_effectiveness",   # 3 discount bands
    "brand_type_nested_shares",      # 25-brand x 150-type catalog lattice
    "label_balance_embeddings",      # label-grain (fixed label set)
    "header_line_consistency_audit", # floor(10*ratio) band grid (~11)
    "pareto_chart_priorities",       # 5 priorities
    "bh_fdr_nation_urgency",         # nation-grain p-value table (25)
    "benford_second_digit_totals",   # 10 digits
    "dow_hour_heatmap_events",       # 7 x 24 cells
    "session_entry_exit_types",      # |event_type|^2 pairs
    "cosine_pair_histogram",         # fixed cosine bins
    "order_lines_histogram",         # lines-per-order count-of-counts
                                     # (distinct multiplicities, not rows)
    "supplier_coverage_hist",        # width-10 parts-per-supplier bins
                                     # clamped at 500 (<=51 buckets)
    "weekday_weekend_revenue",       # 2 rows
    "revenue_share_by_nation",       # 25 nations
    # --- vocab grain (post-min_df vocabulary, ~1e5-1e6 rows at web scale;
    # sublinear in the corpus — build_vocab documents the contract) ---
    "vocab_build", "tokenize_ids", "tokenizer_prep_pipeline",
    "zipf_slope_tokens", "part_name_top_words", "vocab_coverage_top100",
    # --- rank over an already-TakeOrdered/limited input (<= top-N rows;
    # the unbounded sort lives in the distributed limit, not the window) ---
    "join_skew_report",              # window over .limit(5)
    "hybrid_rrf_topk",               # top-R candidate lists per ranker
    # --- documented fixture-exact arm with a driver-green broadcast-bounds
    # scale twin (value_quartiles) — accepted in the round-8 verdict ---
    "rfm_segmentation",
}


def test_registry_plans_free_of_join_antipatterns(spark, sf_dir):
    """Sweep every lazily-plannable registry query: no CartesianProduct
    anywhere; BroadcastNestedLoopJoin only where it is the RIGHT plan —
    1-row query-vector/scalar-subquery broadcasts, or the documented exact
    all-pairs oracle arms (whose scale counterparts are LSH-bucketed); no
    window with an empty/constant partition spec (a single-reducer sort of
    its whole input) outside the annotated bounded-grain allowlist."""
    from ascii_hydra_spark.verification import REGISTRY

    BNLJ_OK = {
        "sim_topk",        # single query vector broadcast
        "sim_topk_quantized",  # single quantized query row broadcast
        "sim_topk_ivf",    # single query vector broadcast onto pruned cells
        "ivf_recall_at_k", # the same 1-row query broadcasts, 4 queries
                           # x (exact + IVF) arms
        "tpch_q22_like",   # 1-row scalar-subquery broadcast
        "value_quartiles", # 1-row percentile-bounds broadcast
        "token_drift_snapshots",  # 1-row vocab-totals broadcast
        "sim_pairs",       # exact all-pairs oracle arm (scale arm: sim_pairs_lsh)
        "embedding_dedup", # exact cosine arm (scale arm: LSH/IVF)
        "lm_perplexity_scores",   # 1-row vocab-size (V) broadcast
        "perplexity_gate_counts", # same V broadcast through the gate
        "tokenizer_prep_pipeline",  # composes the perplexity gate (same V)
        "kmeans_clusters",        # k-row centroid-table broadcast per iteration
        "semantic_dup_pairs",     # k-row centroid broadcast (kmeans upstream)
        "bm25_topk",          # 1-row (N, avgdl) corpus-stats broadcast
        "hybrid_rrf_topk",    # same stats broadcast + 1-row query vector
        "pmi_collocations",   # 1-row total-bigram-count broadcast
        "benford_order_totals",   # 1-row observation-total broadcast
        "decision_stump_purchase_value",  # 1-row class-totals broadcast
        "association_rules_parts",        # 1-row basket-total broadcast
        "target_encode_segment",          # 1-row global-prior broadcast
        "mutual_info_value_type",         # 1-row cell-total broadcast
        "weighted_median_price",          # 1-row weight-total broadcast
        "bootstrap_ci_user_value",        # 1-row point-estimate broadcast
        "wasserstein_value_ab",           # 1-row group-totals broadcast
        "anova_value_by_type",            # 1-row moment-totals broadcast
        "bh_fdr_nation_urgency",          # 1-row conversion-totals broadcast
        "calinski_harabasz_labels",       # 1-row norm-totals broadcast
        "cohens_kappa_langid",            # 1-row chance-expectation broadcast
        "ece_value_purchase",             # bin-table (10-row) broadcast
        "psi_value_ab",                   # 1-row decile-edges broadcast
        "conformal_orders_priority",      # 1-row qhat broadcast
        "hbos_event_outliers",            # 1-row per-feature range broadcast
        "theil_sen_revenue_trend",        # day-grain (<2.5k-row) broadcast
                                          # non-equi pair join — quadratic
                                          # in DAYS by design, never rows
        "decile_revenue_lift",    # 1-row revenue-total broadcast
        "dsir_importance_en",           # 1-row corpus-totals broadcast
                                        # (the split_unigram_kl shape)
        "price_ending_profile",         # 1-row observation-total
                                        # broadcast (the benford shape)
        "distinctive_terms_by_lang",  # 1-row corpus-total broadcast
        "winsorized_order_totals",    # 1-row percentile-bounds broadcast
        "segment_priority_chi2",      # 1-row grand-total broadcast
        "chi2_residuals_segment_priority",  # same grand-total broadcast
                                            # (cell-residual drill-down)
        "join_skew_report",           # 1-row (k, total, max) moment broadcast
        "hhi_revenue",                # 1-row (total, n) broadcast
        "negative_pairs_ring",  # 1-row global-min + <=16^shard_chars-row
                                # next-shard-min inequality broadcasts
        "mixing_weights_temperature",  # 1-row total + 1-row Z broadcasts
        "split_unigram_kl",     # 1-row (Np, Nq, V) stats broadcast
        "kaplan_meier_lifetimes",  # 1-row total / global-max broadcasts
        "nelson_aalen_lifetimes",  # same 1-row total broadcast as KM
        "logrank_value_ab",        # 1-row group-totals broadcast (the
                                   # KM shape per arm)
        "ab_conversion_ztest",     # 1-row group-aggregate broadcast
        "ks_two_sample_value_ab",  # 1-row group-totals broadcast
        "cramers_v_segment_priority",  # category-bounded grid cross join
        "theil_revenue",           # 1-row (n, sum) broadcast
        "dow_seasonality_revenue", # 1-row overall-average broadcast
        "format_mask_profile_props", # 1-row mask-total broadcast
        "cusum_changepoint_events", # 1-row (total, n) broadcast
        "moments_order_total",      # 1-row exact-mean broadcast (pass 2
                                    # sums centered powers against it)
        "freshness_audit_event_types",  # 1-row global-max-ts broadcast
        "mann_kendall_daily_revenue",  # day-grain pair join + 1-row
                                       # (n, S, ties) broadcasts — the
                                       # theil_sen contract
        "runs_test_daily_revenue",     # 1-row median broadcast
        "kruskal_wallis_value_by_type",  # 1-row (N, tie-sum) broadcast
        "ccnet_perplexity_buckets",    # the lm_perplexity V broadcast
                                       # (composes the bigram LM)
        "hurst_rescaled_range_daily",  # 1-row (n, s, q) moment broadcast
        "kendall_tau_daily",        # day-grain (<2.5k-row) broadcast
                                    # non-equi pair join — quadratic in
                                    # DAYS by design (theil_sen contract)
        "event_type_lift",          # 1-row user-total broadcast onto
                                    # the catalog-bounded pair table
        "jarque_bera_totals",       # 1-row exact-mean broadcast (the
                                    # moments_order_total two-pass shape)
        "bfs_reachable_3hop",       # three 1-row visited-count
                                    # broadcasts onto 1-row hop stats
        "hits_top_authorities",     # 1-row max-norm broadcast per
                                    # hub/authority iteration
        "graph_reciprocity",        # 1-row reciprocal-count broadcast
        "gram_top_eigenvalue",      # 1-row (max-norm, x-vector)
                                    # broadcast per power iteration
        "stable_rank_embeddings",   # same power-iteration broadcasts
                                    # + 1-row exact-trace broadcast
        "simpsons_paradox_segments",  # 1-row pooled-moments broadcast
        "nb_langid_confusion",      # 5-row language-lattice + 1-row
                                    # (V, doc-total) broadcasts
        "sax_weekly_revenue",       # 1-row (n, s, q) moment broadcast
        "quantile_normalize_by_type",  # 1-row N + k-row group-offset
                                       # broadcasts (distrank composite)
        "markov_entropy_rate_events",  # 1-row folded-term broadcast
        "doc_keywords_top3",           # 1-row doc-count (N) broadcast
        "value_decile_kl_by_type",     # 1-row pooled-total broadcast
        "theil_u_priority_segment",    # 1-row (N, H(Y), H(Y|X)) broadcasts
        "capture_recapture_users",     # three 1-row window-count broadcasts
        "term_burstiness_top",         # 1-row doc-count (N) broadcast
        "jonckheere_priority_value",   # 1-row doubled-J broadcast
        "ks_drift_month_halves",       # 1-row group-totals broadcast
                                       # (the ks_two_sample shape)
        "benford_conformity_verdict",  # 1-row observation-total broadcast
        "interarrival_expfit_ks",      # 1-row (n, sum-gap) + 1-row D
                                       # broadcasts (fitted-CDF compare)
        "durbin_watson_daily",         # 1-row fitted-line broadcast onto
                                       # the day-grain residual array
        "theil_sen_slope_ci",          # day-grain pair join (theil_sen
                                       # shape) + 1-row rank-target
                                       # broadcasts
        "weekly_periodogram_power",    # 1-row mean broadcast onto the
                                       # day-grain series array
        "eb_shrunken_urgent_rates",    # 1-row prior (p0, kappa) broadcast
        "ks_acctbal_customer_supplier",  # 1-row group-totals broadcast
                                         # (the ks_two_sample shape)
        "sn_scale_daily_revenue",      # day-grain pair join (theil_sen
                                       # shape) + 1-row n broadcasts
        "t_closeness_customers",       # 10-row decile-grid + 1-row
                                       # total broadcasts
        "rich_club_coefficient",       # 1-row club-size/edge broadcasts
        "chi2_uniform_quantity",       # 1-row domain-total broadcast
        "dow_share_goodman_ci",        # 1-row grand-total broadcast
        "cramers_v_corrected_segment_priority",  # the contingency
                                       # grand-total broadcast (cramers
                                       # shape)
        "pareto_chart_priorities",     # 1-row grand-total broadcast
        "tpch_q15_like",               # 1-row max-revenue broadcast (the
                                       # round-8 de-windowing of the
                                       # supplier-grain global max)
        "tpch_q11_like",               # 1-row grand-total broadcast
                                       # (part-grain de-windowing)
        "customer_recency_bands",      # 1-row reference-date broadcast
                                       # (customer-grain de-windowing)
        "customer_value_migration",    # 1-row grand-total broadcast over
                                       # the 16-cell migration grid (the
                                       # round-9 distrank conversion)
        "decayed_customer_value",   # 1-row ref-date broadcast
        "priority_mix_drift_monthly",  # 1-row baseline-total broadcast
    }
    offenders = []
    for name, spec in REGISTRY.items():
        if name.startswith(EAGER_PREFIXES):
            continue  # executes writes eagerly; plan inspected elsewhere
        df = spec.fn(spark, sf_dir)
        if spec.sql is not None:
            # canonicalizer safety, piggybacked on this sweep's DataFrame:
            # the driver hash sorts columns in pandas, where array/map/
            # struct/binary cells are unhashable (round 1's collect_sorted
            # failure class) — SQL-checked entries must emit scalars only
            from pyspark.sql.types import (
                ArrayType, BinaryType, MapType, StructType,
            )

            for fld in df.schema.fields:
                if isinstance(fld.dataType, (ArrayType, MapType, StructType, BinaryType)):
                    offenders.append((name, "unhashable:" + fld.name))
        plan = _plan(df)
        if "CartesianProduct" in plan:
            offenders.append((name, "cartesian"))
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            offenders.append((name, "BNLJ"))
        if name not in GLOBAL_WINDOW_OK:
            pstr = df._jdf.queryExecution().executedPlan().toString()
            for line in _unbounded_partition_window_lines(pstr):
                offenders.append((name, "global-window: " + line))
    assert not offenders, offenders


def test_global_window_guard_rejects_global_ntile(spark):
    """The detector must flag a deliberately-reintroduced data-sized
    global NTILE (empty partition spec) and a folded-constant partition
    spec, and must NOT flag a keyed window or the annotated
    pmod(x, 1) bounded marker."""
    from pyspark.sql import Window

    base = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 7).alias("g")
    )
    ntile = base.select(
        F.ntile(10).over(Window.orderBy("id")).alias("t")
    )
    flagged = _unbounded_partition_window_lines(
        ntile._jdf.queryExecution().executedPlan().toString()
    )
    assert flagged, "global NTILE must be flagged"

    # lit(0) partition spec: Catalyst folds it away to the empty spec
    folded = base.select(
        F.sum("id").over(Window.partitionBy(F.lit(0))).alias("s")
    )
    assert _unbounded_partition_window_lines(
        folded._jdf.queryExecution().executedPlan().toString()
    ), "folded-constant partition spec must be flagged"

    keyed = base.select(
        F.row_number()
        .over(Window.partitionBy("g").orderBy("id"))
        .alias("r")
    )
    assert not _unbounded_partition_window_lines(
        keyed._jdf.queryExecution().executedPlan().toString()
    ), "keyed window must pass"

    from ascii_hydra_spark.operators.distrank import single_partition

    marked = base.select(
        F.sum("id")
        .over(Window.partitionBy(single_partition("g")).orderBy("g"))
        .alias("s")
    )
    assert not _unbounded_partition_window_lines(
        marked._jdf.queryExecution().executedPlan().toString()
    ), "the pmod(x, 1) bounded marker must pass"



def test_aqe_skew_join_split_fires(spark):
    """B3 at-scale proof: AQE's OptimizeSkewedJoin actually SPLITS a hot
    partition (not just "the conf is set"). One key holds half the fact
    rows with a fat payload; broadcast is disabled so the join runs
    sort-merge; thresholds are tightened to test scale. The final adaptive
    plan must carry the skew=true marker on the join."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = spark.range(0, 200_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(0))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("payload"),
        )
        dim = spark.range(0, 100).select(
            F.col("id").alias("k"), F.col("id").cast("string").alias("label")
        )
        joined = fact.join(dim, "k")
        rows = joined.collect()  # execute THIS plan (count() builds another)
        assert len(rows) == 200_000  # semantics unchanged by the split
        executed = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in executed, executed[:4000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_cbo_stats_change_join_order(spark, tmp_path):
    """B4 evidence: ANALYZE'd statistics actually CHANGE the join order.
    Written order is fact JOIN mid JOIN small; without rowCount stats
    CostBasedJoinReorder cannot run, so the left-deep as-written order
    survives (mid before small). With table+column stats the estimated
    (fact JOIN small) intermediate is ~1k rows vs ~100k for (fact JOIN
    mid), so CBO must join small first."""
    fact = spark.range(0, 100_000).selectExpr(
        "id % 1000 AS k1", "id % 10000 AS k2", "id AS payload"
    )
    mid = spark.range(0, 10_000).selectExpr("id AS k2", "id AS attr_mid")
    small = spark.range(0, 10).selectExpr("id AS k1", "id AS attr_small")
    names = ["cbo_fact", "cbo_mid", "cbo_small"]
    for df, n in zip([fact, mid, small], names):
        spark.sql(f"DROP TABLE IF EXISTS {n}")
        df.write.saveAsTable(n)
    sql = (
        "SELECT COUNT(*) AS n FROM cbo_fact f "
        "JOIN cbo_mid m ON f.k2 = m.k2 "
        "JOIN cbo_small s ON f.k1 = s.k1"
    )

    def join_order(q):
        plan = q._jdf.queryExecution().optimizedPlan().toString()
        return plan.index("cbo_mid"), plan.index("cbo_small")

    try:
        m_pos, s_pos = join_order(spark.sql(sql))
        assert m_pos < s_pos, "without stats, the as-written order must survive"
        for n in names:
            spark.sql(f"ANALYZE TABLE {n} COMPUTE STATISTICS FOR ALL COLUMNS")
        m_pos2, s_pos2 = join_order(spark.sql(sql))
        assert s_pos2 < m_pos2, "with stats, CBO must join the selective table first"
        assert spark.sql(sql).collect()[0]["n"] == 1_000  # semantics unchanged
    finally:
        for n in names:
            spark.sql(f"DROP TABLE IF EXISTS {n}")


def test_runtime_bloom_filter_join_pruning_fires(spark, tmp_path):
    """Scale evidence for runtime row-level filtering (session.py enables
    spark.sql.optimizer.runtime.bloomFilter.enabled): a selective filter
    on the dim side of a shuffle join must inject a bloom_filter_agg /
    might_contain pre-filter on the FACT side — at 100 TB that prunes
    fact rows before the shuffle instead of after it. Asserted on the
    optimized AND executed plan, with correct join results."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        d = str(tmp_path)
        spark.range(0, 200_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ).write.mode("overwrite").parquet(f"{d}/fact")
        spark.range(0, 10_000).select(
            F.col("id").alias("k"), F.col("id").cast("string").alias("lbl")
        ).write.mode("overwrite").parquet(f"{d}/dim")
        fact = spark.read.parquet(f"{d}/fact")
        dim = spark.read.parquet(f"{d}/dim").filter(F.col("lbl").like("1%"))
        j = fact.join(dim, "k")
        optimized = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in optimized, "bloom pre-filter not injected"
        n = j.count()
        # ids 1, 10-19, 100-199, 1000-1999 -> 1 + 10 + 100 + 1000
        assert n == 1111
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runs_and_interarrival_single_exchange(spark, sf_dir):
    """The gaps-and-islands and inter-arrival operators claim a
    single-shuffle shape: both windows (and the downstream keyed
    aggregate) must reuse ONE hash exchange on user_id; the only other
    exchange allowed is the 1-row SinglePartition collect for global
    aggregates (absent here)."""
    import re

    for name in ("event_runs_stats", "interarrival_user_stats"):
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = _plan(df)
        n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_exchanges == 1, f"{name}: {n_exchanges} exchanges\n{plan}"
        assert plan.count("hashpartitioning(user_id") >= 1, plan


def test_session_bounce_exchange_budget(spark, sf_dir):
    """Gap-rule sessionization + per-session count + global rate: one
    user_id hash exchange (window + same-key aggregates) plus the final
    1-row SinglePartition exchange — anything more means the session
    aggregate re-shuffled data it already owned."""
    import re

    df = REGISTRY["session_bounce_rate"].fn(spark, sf_dir)
    plan = _plan(df)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 2, plan            # user_id hash + final 1-row
    assert plan.count("SinglePartition") <= 1, plan
