"""Benchmark harness (driver contract).

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a checksum reduction (hash of every
output column, summed) so Catalyst cannot prune the interesting work away —
a bare count() would let column pruning skip e.g. window computations.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, functions as F

from ascii_hydra_spark.session import SessionProfile, build_spark
from ascii_hydra_spark.verification import REGISTRY

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline set: one per operator family, weighted toward shuffle/join/window
# heavy shapes. Names must exist in the verification registry.
HEADLINE = [
    "pricing_summary",        # wide aggregation over the fact table
    "star_revenue_by_nation", # multi-join star query
    "region_revenue",         # broadcast-dim star join
    "window_running",         # keyed window with running frames
    "window_rank",            # ranking windows
    "dedup_exact_events",     # keyed dedup
    "sessionize",             # gaps-and-islands sessionization
    "asof_join_events",       # union-sort as-of join
    "tumbling_hourly",        # time-bucketed aggregation
    "sliding_15min",          # sliding windows (4x row expansion)
    "sim_topk",               # exact cosine top-k over embeddings
    "term_freq_top",          # explode-heavy text TF
    "token_counts",           # regex tokenization
    "quality_scores",         # scalar-expression pipeline
    "json_extract",           # JSON path extraction
    "rollup_revenue",         # multi-level rollup
    "tpch_q3_like",           # filtered 3-way join + top-k
    "tpch_q6_like",           # multi-predicate pushdown scan
    "near_dup_minhash",       # MinHash+LSH candidate pipeline
    "sim_pairs_lsh",          # hyperplane LSH similarity join
    "applyinpandas_demean",   # Arrow grouped-map UDF path
    "salted_join_revenue",    # skew-salted join
]

# Round-2 additions: timed and reported separately (extra_queries), NOT in
# the headline total — the headline set is frozen for cross-round
# comparability.
EXTRA = [
    "corpus_split_counts",    # hash split assignment
    "contamination_check",    # n-gram inverted-index train/eval join
    "token_budget_by_source", # windowed budget cut
    "repetition_quality_gate",# no-shuffle array-expression signals
    "retention_cohorts",      # single-shuffle cohort grid
    "value_quartiles",        # broadcast percentile bucketing
    "basket_pairs",           # bounded self-join co-occurrence
    "graph_degree_hist",      # two-level distinct aggregation
    "scd2_user_values",       # LEAD-window dimension versioning
    "dq_audit_orders",        # one-scan rule audit
    "sim_pairs",              # exact all-pairs cosine via blocked GEMM
    "embedding_dedup",        # GEMM pairs -> anti-join survivors
    "pii_redaction",          # zero-shuffle regexp scrub
    "boilerplate_removal",    # segment blacklist + ordered reassembly
    "sequence_packing",       # per-shard window cumsum packing
    "doc_chunking",           # sliding-window chunk explode
    "incremental_dedup",      # batch-vs-corpus fingerprint anti-join
    "vocab_build",            # token agg + post-min_df rank window
    "corpus_diff_counts",     # snapshot diff on fingerprint projections
    "embedding_quantize",     # int8 quantization transform
    "sim_topk_quantized",     # integer-dot-product top-k
    "scd2_temporal_lookup",   # point-in-time dimension join
    "revenue_share_by_nation",# window-over-aggregate share
    "tpch_q21_like",          # EXISTS + NOT EXISTS double self-join
    "forward_fill_values",    # per-key gap repair window
    "zscore_outlier_counts",  # moment-join outlier gate
    "skew_join_hot_key",      # pathological hot-key join under AQE
    "lm_perplexity_scores",   # bigram-LM fluency scoring (counting LM)
    "tokenize_ids",           # vocab-apply tokenizer encode
    "kmeans_clusters",        # deterministic Lloyd's semantic sharding
    "semantic_dedup_survivors",  # SemDeDup: kmeans-blocked cosine dedup
    "bm25_topk",              # Okapi BM25 inverted-index probe
    "hybrid_rrf_topk",        # sparse+dense RRF hybrid retrieval
    "pmi_collocations",       # bigram PMI via one-distribution marginals
    "token_entropy",          # per-doc unigram entropy quality signal
    "event_runs_stats",       # gaps-and-islands single-shuffle runs
    "interarrival_user_stats",# integer-microsecond gap statistics
    "gini_revenue",           # decimal-exact rank-formula concentration
    "decile_revenue_lift",    # NTILE lift table over entity aggregates
    "benford_order_totals",   # first-digit DQ audit
    "histogram_order_totals", # clamped equi-width histogram
    "profile_orders_columns", # one-pass per-column DQ profile
    "time_to_convert_funnel", # join-free funnel latency percentiles
    "event_transitions",      # Markov transition matrix (lag + pair count)
    "distinctive_terms_by_lang",  # log-lift keyness per group
    "powerlaw_alpha_degrees", # CSN scale-free exponent MLE
    "hourly_rate_anomalies",  # exact-moment seasonal z anomalies
    "winsorized_order_totals",# percentile-clip robust mean
    "segment_priority_chi2",  # contingency chi-square screen
    "session_bounce_rate",    # gap-rule session ids + bounce
    "join_skew_report",       # hot-key pre-flight diagnostic
    "hhi_revenue",            # Herfindahl concentration index
    "negative_pairs_ring",    # md5-ring contrastive negative sampling
    "nfc_normalized_fingerprints",  # Unicode NFC canonical fingerprints
    "mixing_weights_temperature",   # p^alpha multi-source rebalancing
    "xml_roundtrip",          # native Spark 4 XML sink/source
    "uniformized_length_by_lang",   # per-group quantile normalization
    "split_unigram_kl",       # train/val distribution-shift KL
    "kaplan_meier_lifetimes", # right-censored survival estimator
    "cms_heavy_hitter_estimates",  # mergeable count-min sketch
    "ab_conversion_ztest",    # A/B two-proportion z-test
    "log2_hist_user_events",  # exact-integer log2 histogram
    "mann_whitney_value_ab",  # nonparametric rank-sum A/B test
    "ks_two_sample_value_ab", # distribution-shape KS test
    "cramers_v_segment_priority",  # chi2 effect size (full-grid cells)
    "source_vocab_jaccard",   # cross-source lexicon overlap matrix
    "theil_revenue",          # decomposable entropy inequality
    "spearman_orders_revenue",# rank correlation on exact half-int ranks
    "autocorr_daily_revenue", # lag-1/lag-7 serial correlation
    "dow_seasonality_revenue",# weekday de-seasonalization index
    "open_lines_by_day",      # sweep-line interval backlog
    "rolling_active_users_7d",# trailing-window distinct actives
    "mad_outliers_quantity",  # robust median/MAD outlier gate
    "trimmed_mean_order_total",# two-sided trimmed mean
    "lexical_diversity_by_source", # TTR + hapax vocabulary richness
    "zipf_slope_tokens",      # Zipf OLS over top-200 terms
    "format_mask_profile_props", # digit/alpha format-mask profiling
    "session_path_topk",      # whole-session event paths
    "touch_attribution_purchase", # first/last-touch attribution
    "item_cf_neighbors",      # item-item CF cosine top-k
    "embedding_norm_hist",    # vector-corpus L2 norm sanity gate
    "mom_revenue_growth",     # month-over-month growth
    "kcore_peel_rounds",      # dense-core survivor curve
    "cusum_changepoint_events", # exact-integer CUSUM argmax
    "skyline_price_size",     # 2-D Pareto front (window sweep)
    # round-5 additions: portable (oracle-replayable) sketch/LSH arms +
    # the new analytics operators
    "near_dup_minhash_portable",  # md5 MinHash+LSH pairs (portable arm)
    "simhash_pairs_portable",     # 48-bit md5 SimHash pairs
    "sim_pairs_lsh_portable",     # Rademacher sign-projection pairs
    "hll_portable_distinct",      # portable-HLL register estimate
    "cms_portable_estimates",     # portable-CMS heavy-hitter probe
    "mmr_rerank_topk",            # greedy MMR diversification (k=10)
    "moments_order_total",        # two-pass central moments
    "tukey_fences_outliers",      # 1.5-IQR fences per priority
    "new_vs_returning_weekly",    # growth accounting split
    "session_duration_percentiles", # gap-rule session lengths
    "dup_rate_by_source",         # per-source exact-dup share
    "simpson_diversity_by_source",  # token concentration index
    "containment_pairs_portable",   # token-CDC partial-dup containment
    # round-5 continuation: graph/stats/DQ/product-analytics additions
    "clustering_coefficient_users", # oriented-triangle transitivity
    "degree_assortativity_users",   # endpoint-degree correlation
    "max_drawdown_revenue",         # decimal running-peak shortfall
    "kendall_tau_daily",            # tie-corrected rank concordance
    "poisson_dispersion_users",     # variance/mean burstiness test
    "referential_integrity_audit",  # 7-FK orphan audit, one plan
    "uniqueness_candidate_keys",    # distinct-tuple key discovery
    "chi2_uniform_dow_orders",      # integer-identity GoF test
    "benford_second_digit_totals",  # second-digit forensic audit
    "abc_classification_parts",     # decimal-exact 80/95 classes
    "pareto_coverage_customers",    # smallest 80%-coverage set
    "returns_ratio_by_nation",      # supply-quality scorecard
    "repeat_interval_segments",     # inter-purchase gap stats
    "monthly_stickiness",           # DAU/MAU engagement ratio
    "dow_hour_heatmap_events",      # 168-cell load heatmap
    "event_type_lift",              # audience-overlap lift matrix
    "session_entry_exit_types",     # navigation-flow matrix
    "ols_price_quantity_discount",  # closed-form 2-feature OLS
    "jarque_bera_totals",           # two-pass normality test
    "l_diversity_customers",        # sensitive-attribute diversity
    "char_class_profile_sources",   # char-class composition
    "token_length_hist_by_lang",    # tokenizer-sanity profile
    "prefix_dup_rate_by_source",    # boilerplate-head screen
    "multibyte_ratio_by_lang",      # UTF-8 expansion profile
    "embedding_dim_stats",          # per-dim drift monitor
    "cosine_pair_histogram",        # ring-pair geometry gate
    "order_lines_histogram",        # fact-join fan-out profile
    "price_spread_by_brand",        # catalog pricing dispersion
    "acctbal_sign_profile",         # balance-sign delinquency screen
    "monthly_order_mix",            # month x priority composition
    "customer_recency_bands",       # recency banding per segment
    "supplier_coverage_hist",       # supply-base concentration
    "top_part_types_per_region",    # top-per-group star join
    "bfs_reachable_3hop",           # persisted frontier expansion
    "event_transition_triples",     # order-2 Markov transitions
    "weekday_weekend_revenue",      # calendar-mix split
    # round-9 pool (round-5 continuation, second wave)
    "user_lifecycle_states",        # new/retained/resurrected matrix
    "power_user_curve",             # active-days engagement histogram
    "intersession_gap_percentiles", # return-cadence percentiles
    "immediate_repeat_tokens_by_source",  # stutter/loop signal
    "nation_trade_balance",         # supply-vs-demand star balance
    "size_price_corr_by_type",      # grouped Pearson correlation
    "stopword_ratio_by_lang",       # function-word fluency signal
    "quantization_error_stats",     # int8 reconstruction gate
    "trigram_top_by_lang",          # phrase-level heavy hitters
    "customer_value_migration",     # quartile transition matrix
    "ship_lead_time_by_priority",   # fulfillment SLA scorecard
    "peak_concurrency_sessions",    # sweep-line capacity number
    "weekly_wow_volatility",        # revenue-change dispersion
    "churn_rate_by_segment",        # period anti-membership churn
    "brand_yoy_growth",             # decimal-exact YoY growth
    "hits_top_authorities",         # 2-iteration HITS authorities
    "graph_reciprocity",            # mutual-link diagnostic
    "demand_curve_price_deciles",   # price-elasticity proxy
    "user_type_entropy_hist",       # behavioral-diversity fold
    "customer_order_frequency_hist",  # RFM F-axis distribution
    "part_name_top_words",          # catalog-text heavy hitters
    "quantity_discount_profile",    # volume-discount interaction
    "supply_hhi_by_nation",         # grouped Herfindahl
    "monthly_seasonality_revenue",  # month-of-year index
    "cohort_ltv_monthly",           # cohort revenue accumulation
    "discount_band_effectiveness",  # decimal-exact promo bands
    "value_profile_by_type",        # value-column DQ profile
    "gram_top_eigenvalue",          # power-iteration spectral gate
    "brand_type_nested_shares",     # hierarchical catalog mix
    "value_ecdf_points",            # fixed-point ECDF probes
    "ytd_revenue_share",            # year-to-date pacing
    "decayed_customer_value",       # recency-weighted LTV fold
    "label_balance_embeddings",     # class balance + norm sanity
    "header_line_consistency_audit",  # cross-table reconciliation
    "linenumber_continuity_audit",  # sequence-integrity DQ
    "nation_mix_entropy_by_segment",  # geographic concentration
    "vocab_coverage_top100",        # tokenizer budget point
    "priority_mix_drift_monthly",   # categorical drift monitor
    "sessions_per_user_hist",       # visit-frequency profile
    "single_source_parts_by_brand", # supply-risk audit
    "region_revenue_share_trend",   # market-mix trend
    "part_size_price_profile",      # size-tier pricing table
    "aov_by_segment",               # AOV scorecard
    "hourly_value_profile",         # monetization day-curve
    "new_customer_order_share_monthly",  # acquisition mix
    # round-6 additions
    "warc_records_scan",            # WARC custom source + SURT (writes
                                    # its own fixture per call)
    "warc_host_dedup",              # SURT-host fingerprint dedup
    "incremental_minhash_portable", # portable batch-vs-corpus near-dup
    "customer_revenue_rank_tiles",  # distributed rank + integer NTILE
    "cumulative_daily_revenue",     # distributed prefix sum
    "distributed_median_price",     # distributed exact order statistic
    "url_canonical_dedup",          # SURT frontier dedup
    "gopher_quality_gate",          # Gopher rule-set curation gate
    "binaryfile_scan",              # binaryFile blob-ingest source
    "dsir_importance_en",           # DSIR hashed-LLR data selection
    "html_text_extraction",         # HTML -> text (regex subset shared
                                    # with RE2; ground-truth verified)
    "price_ending_profile",         # last-cent-digit pricing DQ
    "gini_by_segment",              # grouped concentration
    "stream_quality_gate",          # Gopher gate inside a file stream
    "warc_curation_pipeline",       # scan -> gate -> SURT dedup composite
    # round-8 additions
    "wat_outlink_edges",            # WAT anchor extraction -> SURT edges
    "domain_graph_aggr",            # page edges -> domain-grain rollup
]


def checksum(df: DataFrame) -> int:
    """Force full computation of every output column (no pruning)."""
    row = df.select(
        # bit_xor can't overflow (sum of hashes trips ANSI long-overflow)
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("cs")
    ).collect()[0]
    return row["cs"] or 0


def main() -> None:
    profile = SessionProfile(
        app_name="ahs-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark = build_spark(profile)
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM outside the timed region: parquet footers plus one tiny
    # query through each hot codegen path (decimal agg, window, broadcast
    # join) so the timed numbers measure the engine, not first-call JIT.
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    li.count()
    warm = li.limit(1000)
    warm.groupBy("l_returnflag").agg(
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")),
        F.avg("l_discount"),
    ).collect()
    from pyspark.sql import Window

    warm.select(
        F.row_number().over(
            Window.partitionBy("l_returnflag").orderBy("l_orderkey")
        )
    ).collect()
    warm.join(
        F.broadcast(spark.read.parquet(f"{SF_DIR}/nation.parquet")),
        warm.l_suppkey % 25 == F.col("n_nationkey"),
    ).count()
    # fork the FULL Python/Arrow UDF worker pool outside the timed region:
    # one pandas-UDF task per core, so every worker process is forked and
    # has numpy imported before any timed query runs (worker spin-up is
    # ~3 s of pure process overhead, not engine work)
    from ascii_hydra_spark.functions.udfs import dot_product

    spark.range(0, CPUS * 8).repartition(CPUS).select(
        dot_product(
            F.array(F.lit(1.0), F.lit(2.0)), F.array(F.lit(3.0), F.lit(4.0))
        )
    ).count()

    # Two timed passes per query, report the MIN. The host shows multi-fold
    # CPU-frequency/noisy-neighbor variance between consecutive runs
    # (identical numpy matmuls measured 4.6x apart), so a single-shot
    # timing is dominated by machine state; min-of-2 is the standard
    # noise-robust estimator and reflects the steady-state engine (first
    # calls additionally pay one-time whole-stage-codegen compilation,
    # which amortizes away in any real workload). Methodology is recorded
    # in BASELINE.md — compare like-for-like.
    def time_set(names: list[str]) -> dict[str, float]:
        out: dict[str, float] = {}
        for name in names:
            fn = REGISTRY[name].fn
            best = float("inf")
            for _ in range(2):
                t0 = time.monotonic()
                checksum(fn(spark, SF_DIR))
                best = min(best, time.monotonic() - t0)
                # drop operator-internal persists so the second pass recomputes
                # everything — only JIT/codegen stays warm, data caches do not
                spark.catalog.clearCache()
            out[name] = round(best, 3)
        return out

    timings = time_set(HEADLINE)
    # Round-2 operators, timed but NOT in the headline total: the headline
    # set is frozen so BENCH_r{N} totals compare like-for-like across
    # rounds; these report coverage-perf visibility only. Never allowed to
    # take down the headline output.
    try:
        extra = time_set(EXTRA)
    except Exception as e:  # pragma: no cover - defensive
        print(f"extra-section bench failed: {e!r}", file=sys.stderr)
        extra = {}

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": {f"q_{k}": v for k, v in timings.items()},
                "extra_queries": {f"q_{k}": v for k, v in extra.items()},
                "extra_total": round(sum(extra.values()), 3),
                "sf": sf_val,
            }
        )
    )
    # The capture that records this output keeps only the tail of stdout,
    # and the full line above (85+ extras) can exceed that window, losing
    # the leading headline number. Emit a final compact line so the
    # headline metric always survives a bounded tail capture.
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": {f"q_{k}": v for k, v in timings.items()},
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
