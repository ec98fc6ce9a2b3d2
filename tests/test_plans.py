"""Plan-shape regression tests: pin the physical-plan properties that
make these queries viable at 100 TB (pushdown, pruning, broadcast,
top-k, rank-limit). A change that silently turns a broadcast join
into a shuffle join or loses a pushed filter fails here, not in
production."""

from __future__ import annotations

import pytest

from mcp_iceberg_duckdb_spark import registry
from mcp_iceberg_duckdb_spark.plans import (
    explain_str,
    global_window_count,
    has_broadcast_hash_join,
    has_pushed_filters,
    has_take_ordered,
    has_window_group_limit,
    range_partitioning_count,
    read_schema_columns,
    shuffle_count,
)

registry.load_all()


def _df(name, spark, sf_dir):
    return registry.QUERIES[name].builder(spark, sf_dir)


def test_q1_filter_pushed_and_pruned(spark, sf_dir):
    df = _df("q1_pricing_summary", spark, sf_dir)
    assert has_pushed_filters(df), "l_shipdate filter must reach the parquet scan"
    cols = set(read_schema_columns(df, "lineitem"))
    assert "l_partkey" not in cols and "l_suppkey" not in cols, (
        f"scan reads more columns than the query needs: {cols}"
    )
    assert {"l_returnflag", "l_linestatus", "l_quantity"} <= cols


def test_q6_is_shuffle_free(spark, sf_dir):
    """Q6 is scan+agg: a single-stage partial/final agg — the only
    exchange is the 1-row final-agg gather."""
    df = _df("q6_forecast_revenue", spark, sf_dir)
    assert has_pushed_filters(df)
    assert shuffle_count(df) <= 1


def test_projection_prunes_scan(spark, sf_dir):
    df = _df("p_projection", spark, sf_dir)
    cols = read_schema_columns(df, "part")
    assert set(cols) == {"p_partkey", "p_name", "p_size"}


def test_dim_joins_broadcast(spark, sf_dir):
    for name in ("j_inner_equi", "q3_shipping_priority", "q5_local_supplier_volume",
                 "q10_returned_items", "q14_promo_effect"):
        df = _df(name, spark, sf_dir)
        assert has_broadcast_hash_join(df), f"{name}: dim join must broadcast"


def test_q5_single_fact_shuffle(spark, sf_dir):
    """Q5's only shuffle pair should be lineitem⋈orders (+ final agg);
    all five dims broadcast. Allow the two join exchanges + agg."""
    df = _df("q5_local_supplier_volume", spark, sf_dir)
    assert shuffle_count(df) <= 3, "dimension joins are shuffling"


def test_topk_plans_take_ordered(spark, sf_dir):
    assert has_take_ordered(_df("o_order_limit", spark, sf_dir))
    assert has_take_ordered(_df("q3_shipping_priority", spark, sf_dir))


def test_topk_per_group_uses_window_group_limit(spark, sf_dir):
    assert has_window_group_limit(_df("w_topk_per_group", spark, sf_dir)), (
        "rank<=k filter should push into the window sort"
    )


def test_semi_join_for_exists(spark, sf_dir):
    from mcp_iceberg_duckdb_spark.plans import explain_str

    plan = explain_str(_df("q4_order_priority", spark, sf_dir))
    assert "LeftSemi" in plan or "left_semi" in plan.lower()


def test_anti_join_for_not_exists(spark, sf_dir):
    from mcp_iceberg_duckdb_spark.plans import explain_str

    plan = explain_str(_df("o_subquery_not_exists", spark, sf_dir))
    assert "LeftAnti" in plan or "left_anti" in plan.lower()


def test_exact_dedup_partial_aggregates(spark, sf_dir):
    """Exact dedup must shuffle only the 16-byte hash + partial
    counts, i.e. plan a partial (map-side) aggregate before the
    exchange."""
    from mcp_iceberg_duckdb_spark.plans import explain_str

    plan = explain_str(_df("x_dedup_exact", spark, sf_dir))
    assert "HashAggregate" in plan
    assert plan.count("HashAggregate") >= 2, "no partial aggregation"


def test_q8_seven_joins_one_fact_shuffle(spark, sf_dir):
    """Q8's seven-table join tree: every dimension broadcasts, so the
    only exchanges are the fact-side join pair + final agg."""
    df = _df("q8_market_share", spark, sf_dir)
    assert has_broadcast_hash_join(df)
    assert has_pushed_filters(df)
    assert shuffle_count(df) <= 3, "a dimension join is shuffling"


def test_q13_outer_join_keeps_on_residual(spark, sf_dir):
    """The priority filter must stay in the join condition (ON
    residual), not become a pushed scan filter on orders — pushing it
    to WHERE would drop customers whose only orders are URGENT."""
    from mcp_iceberg_duckdb_spark.plans import explain_str

    df = _df("q13_customer_order_distribution", spark, sf_dir)
    plan = explain_str(df)
    assert "LeftOuter" in plan or "left_outer" in plan.lower()
    assert shuffle_count(df) <= 3


def test_q17_threshold_agg_broadcasts_back(spark, sf_dir):
    """The per-part average is ~|part| rows — it must broadcast back
    into the fact scan, never shuffle lineitem against it."""
    df = _df("q17_small_quantity_revenue", spark, sf_dir)
    assert has_broadcast_hash_join(df)


def test_q21_semi_and_anti_on_same_fact(spark, sf_dir):
    from mcp_iceberg_duckdb_spark.plans import explain_str

    plan = explain_str(_df("q21_waiting_supplier", spark, sf_dir))
    low = plan.lower()
    assert "leftsemi" in low.replace("_", "") or "left_semi" in low
    assert "leftanti" in low.replace("_", "") or "left_anti" in low
    assert has_take_ordered(_df("q21_waiting_supplier", spark, sf_dir))


def test_text_maps_are_shuffle_free(spark, sf_dir):
    """Per-row text ops (stopword strip, quality, token counts) must
    stay pure map stages — zero Exchange at any scale."""
    for name in ("x_text_stopword_strip", "x_text_quality", "x_text_token_count"):
        assert shuffle_count(_df(name, spark, sf_dir)) == 0, name


def test_multimodal_featurizer_is_partition_preserving(spark, sf_dir):
    """mapInPandas decode must not introduce a shuffle — payload
    bytes ride from the scan into the Arrow batches in place."""
    assert shuffle_count(_df("x_multimodal_features", spark, sf_dir)) == 0


def test_span_dedup_single_shuffle(spark, sf_dir):
    """Window expansion is per-row; the only data-keyed exchange is
    the span groupBy (at 100 TB the key becomes xxhash64(span), same
    shape). Round 14: a second, ROUND-ROBIN exchange may precede the
    expansion — operators/_util.parallelize's layout gate spreads the
    one-row-group fixture scan before the per-row span string builds;
    on splittable (production) input the gate is the identity and the
    plan is single-shuffle again (tests/test_parallelize_gate.py pins
    both gate behaviors)."""
    df = _df("x_text_span_dedup", spark, sf_dir)
    n = shuffle_count(df)
    assert n <= 2, "span groupBy + at most the layout-gate round-robin"
    from mcp_iceberg_duckdb_spark.plans.inspect import explain_str

    assert explain_str(df, mode="simple").count("hashpartitioning") == 1, (
        "exactly ONE data-keyed (hash) exchange — the span groupBy; "
        "any second exchange must be the gate's round-robin"
    )


def test_q9_widest_join_tree_single_fact_shuffle(spark, sf_dir):
    """Q9 (5-way join, widest tree in the suite): every dim side
    broadcasts, the single Exchange is the final group-by."""
    df = _df("q9_product_type_profit", spark, sf_dir)
    assert has_broadcast_hash_join(df)
    assert shuffle_count(df) == 1


def test_exact_similarity_joins_have_no_allpairs_plan(spark, sf_dir):
    """The prefix-filtered exact similarity joins (and everything
    built on them: the Jaccard twin, its CC twin, and the approx-op
    contracts' strong-pair baselines) must never plan a cartesian /
    nested-loop join — the round-2 verdict's scale-killer class. The
    only acceptable join strategies are hash-based on candidate keys."""
    from mcp_iceberg_duckdb_spark.plans import explain_str

    for name in (
        "x_dedup_ngram_jaccard",
        "x_dedup_cluster_cc",
        "x_dedup_minhash_lsh",
        "x_dedup_cluster_cc_lsh",
        "x_dedup_incremental",
    ):
        plan = explain_str(_df(name, spark, sf_dir))
        assert "CartesianProduct" not in plan, f"{name} plans a cartesian join"
        assert "BroadcastNestedLoopJoin" not in plan or name in (
            "x_dedup_minhash_lsh",
            "x_dedup_cluster_cc_lsh",
        ), f"{name} plans a nested-loop join"
        # the contracts cross-join three 1-row aggregates — that
        # nested-loop over single rows is fine; what must not appear
        # is a join keyed on nothing over the corpus, which Spark
        # would plan as CartesianProduct (checked above for all).


def test_contamination_broadcasts_eval_ngrams(spark, sf_dir):
    """The eval-set n-gram probe must broadcast (it is tiny by
    construction); the corpus side must not shuffle before the join."""
    df = _df("x_text_contamination", spark, sf_dir)
    assert has_broadcast_hash_join(df), "eval n-gram set must broadcast"


def test_mix_weights_single_groupby_shuffle(spark, sf_dir):
    """Mix weights = one groupBy(source) shuffle + broadcast of the
    1-row total; anything more re-shuffles the k-row weights table."""
    df = _df("x_corpus_mix_weights", spark, sf_dir)
    assert shuffle_count(df) <= 2  # partial/final groupBy + final gather


def test_repetition_is_shuffle_free(spark, sf_dir):
    df = _df("x_text_repetition", spark, sf_dir)
    assert shuffle_count(df) == 0, "per-row quality signal must not shuffle"

def test_split_hash_is_shuffle_free(spark, sf_dir):
    """Hash split/sample assignment is a pure per-row map — it must
    run inside codegen on the scan with zero Exchange."""
    assert shuffle_count(_df("x_corpus_split_hash", spark, sf_dir)) == 0


def test_semdedup_broadcasts_centroids(spark, sf_dir):
    """The k-row centroid table must broadcast into both the
    assignment map and never force a corpus-side extra shuffle; the
    within-cluster pair join must be hash-based on cluster_id, not a
    cartesian."""
    from mcp_iceberg_duckdb_spark.plans import explain_str

    df = _df("x_semdedup", spark, sf_dir)
    assert has_broadcast_hash_join(df) or "BroadcastNestedLoopJoin" in explain_str(df)
    assert "CartesianProduct" not in explain_str(df)


def test_tfidf_topk_rank_limits_window(spark, sf_dir):
    """Per-doc top-3 must plan WindowGroupLimit so only 3 rows per
    doc survive the window shuffle."""
    assert has_window_group_limit(_df("x_text_tfidf_topk", spark, sf_dir))


def test_vocab_coverage_takes_ordered_head(spark, sf_dir):
    """The top-K head must be a TakeOrdered, never a full sort of the
    vocabulary."""
    assert has_take_ordered(_df("x_text_vocab_coverage", spark, sf_dir))


def test_boilerplate_three_linear_shuffles(spark, sf_dir):
    """df-count groupBy, join back, doc-grain groupBy — all keyed on
    linear row counts; anything beyond 4 exchanges means a replan."""
    assert shuffle_count(_df("x_text_boilerplate", spark, sf_dir)) <= 4


def test_text_heavyweights_persist_and_hash_keys(spark, sf_dir):
    """The round-3 bench heavyweights must (a) persist the exploded
    token/shingle relation so the tokenize pipeline evaluates ONCE —
    the plan consumes InMemoryTableScan and the documents scan
    appears at most once (tfidf legitimately adds a count-only second
    scan for n_docs); (b) shuffle 64-bit xxhash64 keys, never raw
    shingle/term strings. Losing either re-opens the 15-second
    x_text_boilerplate regression."""
    from mcp_iceberg_duckdb_spark.plans import explain_str

    for name, max_scans in (
        ("x_text_boilerplate", 1),
        ("x_text_tfidf_topk", 2),
        ("x_text_unigram_logprob", 1),
    ):
        plan = explain_str(_df(name, spark, sf_dir))
        assert "InMemoryTableScan" in plan, f"{name}: persisted relation unused"
        assert plan.count("documents.parquet") <= max_scans, (
            f"{name}: duplicate scan subtree — persist() lost"
        )
        assert "xxhash64" in plan, f"{name}: join key is not hashed"
        spark.catalog.clearCache()


def test_round4_text_ops_plan_shape(spark, sf_dir):
    """Round-4 additions: PMI's top-K head must be a TakeOrdered
    (never a full sort of the scored bigrams); the source-overlap
    intersection join must be hash-keyed on the shingle hash, not
    cartesian; the ExactSubstr scrub must reuse its persisted window
    relation and hash the shuffled window key."""
    from mcp_iceberg_duckdb_spark.plans import explain_str

    assert has_take_ordered(_df("x_text_pmi_bigrams", spark, sf_dir))
    spark.catalog.clearCache()

    p_overlap = explain_str(_df("x_source_overlap_matrix", spark, sf_dir))
    assert "CartesianProduct" not in p_overlap
    assert "xxhash64" in p_overlap
    spark.catalog.clearCache()

    p_scrub = explain_str(_df("x_text_exactsubstr_scrub", spark, sf_dir))
    assert "InMemoryTableScan" in p_scrub
    assert "xxhash64" in p_scrub
    spark.catalog.clearCache()


def test_cms_sketch_partial_aggregates(spark, sf_dir):
    """The Count-Min build must partially aggregate map-side — the
    whole point is that only 4096 (depth, cell) partials cross the
    wire, never the token stream."""
    from mcp_iceberg_duckdb_spark.plans import explain_str

    plan = explain_str(_df("x_sketch_countmin_topk", spark, sf_dir))
    assert plan.count("HashAggregate") >= 2, "no partial aggregation"
    spark.catalog.clearCache()


def test_funnel_latency_single_interval_join(spark, sf_dir):
    """Funnel latency: no cartesian anywhere; the one-row aggregates
    broadcast (the interval join itself is the s_stream_stream_join
    shape, bounded by the time predicate)."""
    from mcp_iceberg_duckdb_spark.plans import explain_str

    plan = explain_str(_df("s_funnel_latency", spark, sf_dir))
    assert "CartesianProduct" not in plan


def test_embedding_cosine_pair_join_is_cluster_keyed(spark, sf_dir):
    """x_dedup_embedding_cosine was the last registered all-pairs
    plan (label-blocked O(block²)); since round 4 its pair join must
    be hash-keyed on the bounded centroid assignment — never a
    cartesian / nested-loop over the corpus."""
    from mcp_iceberg_duckdb_spark.plans import explain_str

    plan = explain_str(_df("x_dedup_embedding_cosine", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "cluster_id" in plan, "pair join lost the cluster key"
    spark.catalog.clearCache()


def test_phash_dedup_banded_never_allpairs(spark, sf_dir):
    """The pHash near-dup join must come from exact-match band
    buckets (hash join on (band, bval)), never a cartesian or
    nested-loop pairing of the asset table with itself."""
    from mcp_iceberg_duckdb_spark.plans import explain_str

    plan = explain_str(_df("x_multimodal_phash_dedup", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_gram_matrix_no_join_single_shuffle(spark, sf_dir):
    """XᵀX must expand index pairs per-row (nested array transform)
    and aggregate with ONE (i, j) shuffle of ≤2080-row partials —
    no self-join of the exploded element relation."""
    from mcp_iceberg_duckdb_spark.plans import explain_str

    df = _df("x_embed_gram_matrix", spark, sf_dir)
    plan = explain_str(df)
    assert "Join" not in plan, "Gram matrix must not plan any join"
    # exchanges: the parallelize() repartition + the (i,j) groupBy
    assert shuffle_count(df) <= 2


def test_pagerank_loop_is_hash_joined(spark, sf_dir):
    """Every PageRank iteration must be a hash join on the src key —
    no cartesian, and the unrolled 5-iteration DAG reuses the
    persisted edge/degree relations instead of rescanning."""
    from mcp_iceberg_duckdb_spark.plans import explain_str

    plan = explain_str(_df("x_graph_pagerank", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_chunking_is_shuffle_free(spark, sf_dir):
    """Chunking is a narrow expression map (split → sequence →
    posexplode → slice): no exchange anywhere — at 100 TB it runs at
    scan bandwidth."""
    df = _df("x_text_chunking", spark, sf_dir)
    assert shuffle_count(df) == 0
    cols = set(read_schema_columns(df, "documents"))
    assert "lang" not in cols and "source" not in cols


def test_bm25_broadcasts_queries_and_rank_limits(spark, sf_dir):
    """The postings⋈query-terms join must broadcast the 8-row query
    side (never shuffle the postings against it), and the per-query
    head must be a rank-limited window."""
    df = _df("x_text_bm25_topk", spark, sf_dir)
    assert has_broadcast_hash_join(df), "query terms must broadcast"
    assert has_window_group_limit(df), "top-k per query must rank-limit"


def test_triangles_degree_ordered_hash_joins(spark, sf_dir):
    """Wedge join + closing-edge semi-join must both be hash joins on
    equality keys — no cartesian/nested-loop pairing — and the degree
    relation joins back by broadcast."""
    from mcp_iceberg_duckdb_spark.plans import explain_str

    df = _df("x_graph_triangles", spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert has_broadcast_hash_join(df)


def test_bloom_broadcasts_set_bits(spark, sf_dir):
    """The set-bit relation (≤ m rows) must broadcast onto the
    probes — the whole point of the sketch is that membership costs
    no shuffle of the probe stream."""
    df = _df("x_sketch_bloom", spark, sf_dir)
    assert has_broadcast_hash_join(df)


def test_anomaly_zscore_single_user_shuffle(spark, sf_dir):
    """One hash partition by user feeds the bounded trailing frame;
    nothing else exchanges."""
    df = _df("s_anomaly_zscore", spark, sf_dir)
    assert shuffle_count(df) <= 1


def test_pii_scrub_is_shuffle_free(spark, sf_dir):
    df = _df("x_text_pii_scrub", spark, sf_dir)
    assert shuffle_count(df) == 0


def test_novelty_persists_hashed_shingles(spark, sf_dir):
    """The distinct (doc, shingle-md5) relation must be persisted for
    its two consumers and take-ordered nowhere; both groupBys hash
    on the 32-byte md5 key."""
    from mcp_iceberg_duckdb_spark.plans import explain_str

    df = _df("x_text_novelty", spark, sf_dir)
    plan = explain_str(df)
    assert "InMemoryTableScan" in plan or "InMemoryRelation" in plan, (
        "shingle relation must be persisted, not recomputed per consumer"
    )


def test_weighted_sample_takes_ordered_head(spark, sf_dir):
    """k-smallest-keys must be a TakeOrdered head, never a global
    sort."""
    df = _df("x_corpus_weighted_sample", spark, sf_dir)
    assert has_take_ordered(df)
    assert shuffle_count(df) == 0


def test_hll_state_is_register_bounded(spark, sf_dir):
    """The HLL build must reduce through the 64-register grid — no
    cartesian, and the only exchanges are the distinct + the
    register groupBy + final 1-row gathers."""
    from mcp_iceberg_duckdb_spark.plans import explain_str

    df = _df("x_sketch_hll", spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan


def test_locf_two_linear_shuffles_one_window(spark, sf_dir):
    """Grid join + LOCF window must stay inside the per-user hash
    partition: expect the hourly/span groupBys and the user window,
    nothing quadratic, no global sort."""
    from mcp_iceberg_duckdb_spark.plans import explain_str

    df = _df("s_locf_resample", spark, sf_dir)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan
    assert "GlobalSort" not in plan and "Sort [hour_start" not in plan.split(
        "Window"
    )[0], "no global sort before the window"


def test_runtime_bloom_filter_fires_on_shuffle_join(spark, sf_dir):
    """100 TB regime capability pin: when the dim side is too big to
    broadcast (fact⋈fact shuffle join), Spark's InjectRuntimeFilter
    must plant a bloom-filter semi-join reduction (might_contain on
    the fact scan) from the filtered creation side — the engine-level
    version of the x_sketch_bloom pre-screen. Thresholds are lowered
    to fixture scale; the default session keeps them at production
    values."""
    import pyspark.sql.functions as F

    from mcp_iceberg_duckdb_spark.sources.tables import load

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load(spark, sf_dir, "lineitem")
        o = load(spark, sf_dir, "orders").where(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_extendedprice", "o_orderdate"
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, "runtime bloom filter not injected"
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_quality_classifier_single_shuffle(spark, sf_dir):
    """The hashing trick means the 'model' is an expression, not a
    table: ONE doc-groupBy exchange and no join anywhere."""
    df = _df("x_quality_classifier_score", spark, sf_dir)
    assert shuffle_count(df) == 1
    assert "Join" not in explain_str(df)


def test_hll_rolling_state_is_register_sized(spark, sf_dir):
    """The merge stage must operate on the days×64 register grid,
    never re-touch raw events per output day: no cartesian/NL-join
    over the event relation, and partial aggregation on the per-day
    register build."""
    plan = explain_str(_df("x_sketch_hll_rolling", spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "partial_max" in plan or "HashAggregate" in plan


def test_mix_weights_broadcasts_totals(spark, sf_dir):
    """Both 1-row totals must broadcast back onto the |sources|-row
    relation — no shuffle beyond the single source groupBy chain."""
    plan = explain_str(_df("x_mix_sample_weights", spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# Queries whose plans legitimately contain a BroadcastNestedLoopJoin:
# every entry is either the crossJoin-of-a-broadcast-1-row/k-row
# AGGREGATE pattern (corpus totals, thresholds, centroid tables —
# bounded build sides by construction), the deliberate CROSS JOIN
# surface op (j_cross), or the non-equi band join whose bucketized
# equi-key variant is the documented scale path (j_range_band).
# A NEW query acquiring a BNLJ must be consciously added here —
# an accidental one (e.g. a dropped join condition) fails the audit.
_BNLJ_ALLOWED = {
    # round-7 third wave: 1-row broadcast scalars joined onto a tiny
    # relation (KS's (n0,n1) totals; chi2's dof) — the sanctioned
    # 1-row-BNLJ aggregate pattern
    "x_source_ks_drift", "x_stats_chi2_independence", "x_source_auc_shift",
    "x_market_basket_lift", "x_skyline_pareto", "x_dedup_minhash_lsh",
    "x_dedup_minhash_mllib", "x_dedup_simhash", "x_dedup_embedding_cosine",
    "x_dedup_cluster_report", "x_diag_key_skew", "x_diag_join_blowup",
    "x_graph_kcore", "j_cross", "x_semdedup", "x_text_tfidf_topk",
    "x_text_vocab_coverage", "x_text_length_filter",
    "x_text_unigram_logprob", "x_dsir_importance",
    "x_quality_stratified_sample", "x_text_bigram_logprob",
    "x_source_kl_divergence", "x_semdedup_hier_assign",
    "x_mix_sample_weights", "a_approx_count_distinct", "p_sample",
    "x_text_bm25_topk", "x_ann_cosine_topk", "x_ann_ivf_topk",
    "x_ann_lsh_topk", "x_embed_centroid_assign", "x_embed_kmeans",
    "x_embed_quantize_int8", "x_embed_pq_encode", "x_ann_pq_adc_topk",
    "x_ann_pq_rerank_topk", "x_ann_ivfpq_topk", "j_range_band",
    "x_text_pmi_bigrams", "x_sketch_hll", "x_sketch_hll_rolling",
    "s_funnel_latency", "s_rolling_active_users", "s_user_rfm",
    "s_trending_decay", "s_mix_drift", "s_agg_delta_merge",
    # round 7: 1-row broadcast total onto the |sources|-row relation
    "x_mix_temperature_weights",
    # round 7: 1-row broadcast quantile cutpoints onto the doc scores
    "x_quality_perplexity_buckets",
    # round 7: 1-row broadcast merge-equality bit onto the pair rows
    "x_sketch_minhash_merge",
    # round 8: 1-row broadcast N joined onto the ranked orders (the
    # two-phase percent_rank/cume_dist rework)
    "w_cume_percent",
    # round 11: the SAME 16-row broadcast-codebook crossJoin as
    # x_ann_pq_adc_topk (only the codebook rows differ — Lloyd-trained
    # vs md5-sampled), plus _ann_contract's 1-row total joins
    "x_ann_pq_adc_trained_topk",
    # round 14: the SAME ≤4-row broadcast query-vector non-equi join
    # as x_ann_cosine_topk (vec_id < 4 queries against the corpus
    # scan), only the scan source differs (vendored Iceberg table
    # instead of the parquet fixture) — build side constant-bounded
    "x_iceberg_fs_embedding_col",
    # round 12: the trained IVF router — the same reviewed pattern
    # twice over: a 10-row broadcast trained-centroid crossJoin for
    # cell assignment/probing (bounded like x_ann_ivfpq_topk's reps)
    # + the 16-row broadcast-codebook crossJoin + _ann_contract's
    # 1-row total joins; every BNLJ side is constant-bounded
    "x_ann_ivfpq_trained_topk",
    # round 8: 1-row broadcast (n0, n1, nb) totals onto the bin grid
    "x_source_psi_drift",
    # round 8: 1-row broadcast N / mid-element / doc-count scalars in
    # the rank-pairing packer
    "x_pack_context_windows",
    # round 8: k-row broadcast centroid table scored against the scan
    # (the x_semdedup pattern)
    "x_eval_calibration_ece",
    # round 8: |days| x |value buckets| cross of two BOUNDED grids
    # (retention window x value domain / 16) + 1-row totals
    "s_value_drift_daily",
    # round 8: 1-row theta/size scalars broadcast in the KMV sketch
    "x_sketch_kmv_setops",
    # round 7: broadcast sampled-query set scored against the corpus
    # scan under a != self-pair guard (the x_ann_cosine_topk shape)
    "x_eval_retrieval_metrics",
    # round 7: 1-row broadcast max-normalizer per HITS half-step
    "x_graph_hits",
}


# One simple-mode explain per registered query, shared by every
# whole-registry audit below (building 269 plans dominates the cost;
# string scans are free).
_PLAN_CENSUS: dict[str, str] = {}


def _census(spark, sf_dir) -> dict[str, str]:
    if not _PLAN_CENSUS:
        for name, spec in registry.QUERIES.items():
            _PLAN_CENSUS[name] = explain_str(
                spec.builder(spark, sf_dir), mode="simple"
            )
    return _PLAN_CENSUS


def test_global_plan_hygiene_no_cartesian_no_accidental_bnlj(spark, sf_dir):
    """Whole-registry plan audit: NO query may plan a
    CartesianProduct, and a BroadcastNestedLoopJoin may appear only
    in the frozen allowlist above. This turns the 'every crossJoin is
    a broadcast of a tiny aggregate' review claim into a test: the
    classic silent scale-killer (a join that lost its equi-condition
    and quietly planned as a product over the corpus) cannot land."""
    cart, rogue = [], []
    for name, plan in _census(spark, sf_dir).items():
        if "CartesianProduct" in plan:
            cart.append(name)
        if "BroadcastNestedLoopJoin" in plan and name not in _BNLJ_ALLOWED:
            rogue.append(name)
    assert not cart, f"cartesian products: {cart}"
    assert not rogue, f"unreviewed BroadcastNestedLoopJoin in: {rogue}"


# Every unpartitioned-but-ordered Window site in the registry, each
# with its PROVEN input-row bound — the relation the window consumes
# must be bounded by a value DOMAIN or a constant, never by corpus
# size. Spark runs such a window in ONE partition ("WindowExec: No
# Partition Defined" at runtime); over anything corpus-scaled that is
# the canonical 100 TB scale-killer. A new query acquiring a global
# window fails this audit until it is either re-shaped (two-phase
# broadcast-offset cumulative sum — see x_corpus_epoch_shuffle,
# w_cume_percent, x_source_ks_drift) or registered here with a bound.
_GLOBAL_WINDOW_BOUNDED: dict[str, tuple[int, str]] = {
    # (max allowed count, proven bound of the window's input relation)
    "x_stats_chi2_independence": (1, "R*C contingency cells (|priorities| x |statuses| = 15)"),
    "x_text_vocab_coverage": (2, "LIMIT _VOCAB_K head (constant 1000)"),
    "x_text_length_filter": (1, "token-length histogram <= length domain (~1e5 at 100 TB)"),
    "x_quality_stratified_sample": (1, "micro-quantized score histogram <= 1e6 grid points"),
    "x_corpus_epoch_shuffle": (1, "16-row hash-bucket offset table"),
    "x_source_ks_drift": (1, "length-bucket grid <= max_len div 256 (domain, not corpus)"),
    "x_source_auc_shift": (1, "length-bucket grid <= max_len div 256 (domain, not corpus)"),
    "x_embed_pq_encode": (1, "LIMIT _PQ_K codebook seeds (constant)"),
    "x_ann_pq_adc_topk": (2, "LIMIT _PQ_K codebook seeds (constant)"),
    "x_ann_pq_rerank_topk": (2, "LIMIT _PQ_K codebook seeds (constant)"),
    "x_ann_ivfpq_topk": (2, "LIMIT _PQ_K codebook seeds (constant)"),
    "x_corpus_mix_weights": (1, "|sources| relation (catalog-sized)"),
    "x_text_zipf_fit": (1, "count-of-counts relation, |distinct freq| = O(sqrt(tokens))"),
    "w_cume_percent": (1, "price-bucket grid <= price domain div 16384"),
    "x_pack_context_windows": (4, "length-value bucket grid <= budget+1 cells (lengths truncate to the 256-token budget); 4 static copies = pair sides + odd-middle + doc-count branches over the persisted rank"),
    "x_sketch_kmv_setops": (3, "union-sketch relation <= 2k rows (k=256) - rank-limit windows, WindowGroupLimit plan-pinned"),
    "s_user_rfm": (3, "three value-bucket grids (recency 2^32us, freq value, money 2^20c) - domain-bounded since the round-8 rank2p rework"),
    "s_slo_burn_rate": (1, "720-row hour grid (30-day SLO window)"),
}


def test_no_unbounded_global_windows(spark, sf_dir):
    """Whole-registry audit: every Window with no partition spec must
    sit at a site registered in _GLOBAL_WINDOW_BOUNDED with a proven
    input-row bound. The r7 bench log's `Moving all data to a single
    partition` warnings become test failures for any NEW site — the
    two genuinely unbounded ones it caught (x_source_ks_drift /
    x_source_auc_shift cumulative ECDFs over a value-distinct
    relation that grows with the corpus) were re-shaped to the
    two-phase broadcast-offset cumulative sum in round 8."""
    rogue, over = [], []
    for name, plan in _census(spark, sf_dir).items():
        n = global_window_count(plan)
        if n == 0:
            continue
        if name not in _GLOBAL_WINDOW_BOUNDED:
            rogue.append((name, n))
        elif n > _GLOBAL_WINDOW_BOUNDED[name][0]:
            over.append((name, n, _GLOBAL_WINDOW_BOUNDED[name][0]))
    assert not rogue, f"unregistered global windows: {rogue}"
    assert not over, f"global-window count grew past the registered bound: {over}"


# Queries allowed a rangepartitioning exchange. Both entries are the
# DELIBERATE distributed global sort that replaces a single-partition
# rank: repartitionByRange + partition-local row_number + broadcast
# P-row offsets (textops.py x_pack_*) — the exchange is the scale
# path, not a regression. Presentation-only ORDER BY heads plan as
# TakeOrderedAndProject and never appear here.
_RANGEPART_ALLOWED = {
    "x_pack_token_shards": 2,
    "x_pack_balanced_shards": 2,
}


def test_global_sort_census(spark, sf_dir):
    """Whole-registry audit: no query may acquire a global sort
    (rangepartitioning exchange) outside the frozen allowlist. A
    global sort samples and total-orders its whole input — legitimate
    only where it IS the algorithm (distributed rank for shard
    packing); an accidental one (an orderBy surviving in front of a
    join or window) silently costs a full extra shuffle + sort at
    100 TB."""
    rogue = []
    for name, plan in _census(spark, sf_dir).items():
        n = range_partitioning_count(plan)
        if n > _RANGEPART_ALLOWED.get(name, 0):
            rogue.append((name, n))
    assert not rogue, f"unreviewed rangepartitioning (global sort) in: {rogue}"


def test_repetition_filter_is_shuffle_free(spark, sf_dir):
    """The Gopher repetition signals must stay a per-row map pipelined
    onto the scan — zero exchanges: n-grams by array expressions,
    distinct counts by array_distinct, mode count by a fold over the
    sorted array. The naive explode+groupBy(doc, gram) shape would
    pay two full-token-stream shuffles at 100 TB."""
    df = _df("x_text_repetition_filter", spark, sf_dir)
    assert shuffle_count(df) == 0
    plan = explain_str(df)
    assert "Join" not in plan


def test_decontaminate_broadcasts_eval_grams(spark, sf_dir):
    """The eval n-gram set (KBs against a 100 TB train corpus) must
    broadcast; the train-side gram stream must reach the join without
    an exchange (its only shuffle is the per-doc hit count)."""
    df = _df("x_text_decontaminate", spark, sf_dir)
    assert has_broadcast_hash_join(df)
    # one aggregate shuffle (per-doc hit count) + the broadcast's own
    # collect-side exchange at most; the big side must not repartition
    assert shuffle_count(df) <= 2


def test_epoch_shuffle_has_no_global_sort(spark, sf_dir):
    """x_corpus_epoch_shuffle's whole point: the exact global order
    index must come from hash-bucketed ranking + a broadcast 16-row
    offset table, never a rangepartitioning exchange (whose sampling
    scan + total-order sort is the thing being avoided at 100 TB).
    The offsets join must broadcast."""
    df = _df("x_corpus_epoch_shuffle", spark, sf_dir)
    plan = explain_str(df)
    assert "rangepartitioning" not in plan.lower(), (
        "global_pos must not be computed via a range-partitioned sort"
    )
    assert has_broadcast_hash_join(df)


def test_kmv_sketch_rank_limits_windows(spark, sf_dir):
    """x_sketch_kmv_setops: the per-source k-minimum selection must
    plan as a WindowGroupLimit rank-limit (only k rows per source
    survive map-side) — without it the 'sketch build' would sort the
    whole distinct-shingle relation inside 2 corpus-scaled window
    partitions."""
    df = _df("x_sketch_kmv_setops", spark, sf_dir)
    assert has_window_group_limit(df)


def test_ece_broadcasts_centroids_and_partial_aggregates(spark, sf_dir):
    """x_eval_calibration_ece: the k-row centroid table must
    broadcast (corpus scanned once, never shuffled for scoring) and
    the per-vector argmax must be a PARTIAL-aggregating max(struct)
    — map-side combine ships one row per vector per task instead of
    the n*k scored rows a row_number window would shuffle (200M rows
    at the 1000-label decade fixture)."""
    df = _df("x_eval_calibration_ece", spark, sf_dir)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" not in plan, "argmax regressed to a window"
    assert plan.count("HashAggregate") >= 2, "no partial aggregation"


def test_chunk_dedup_every_shuffle_is_hash_keyed(spark, sf_dir):
    """x_text_chunk_dedup_rate: chunking is a narrow map; every
    exchange must be keyed on (source, chunk-hash) aggregates — no
    global sort, no cartesian."""
    df = _df("x_text_chunk_dedup_rate", spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert "CartesianProduct" not in plan
    assert range_partitioning_count(plan) == 0


def test_context_packer_joins_on_partner_rank(spark, sf_dir):
    """x_pack_context_windows: the pairing must be a hash join on the
    computed partner rank (dense integer keys), never a sort-merge
    over a range exchange or a nested loop over the corpus."""
    df = _df("x_pack_context_windows", spark, sf_dir)
    plan = explain_str(df, mode="simple")
    assert range_partitioning_count(plan) == 0
    assert "CartesianProduct" not in plan


def test_psi_bin_grid_single_aggregation_pass(spark, sf_dir):
    """x_source_psi_drift: one groupBy to the domain-bounded bin grid
    + the 1-row broadcast totals — no windows at all, bounded shuffle
    count."""
    df = _df("x_source_psi_drift", spark, sf_dir)
    assert global_window_count(df) == 0
    assert shuffle_count(df) <= 4


def test_plan_gate_detectors_fire_on_deliberately_bad_plans(spark, sf_dir):
    """Red-team the scale insurance itself (VERDICT r9 item 6): the
    registry-wide audits above are only worth their ink if the
    detectors actually fire. Build the canonical 100 TB scale-killer
    plans on purpose and assert each detector rejects them — a silent
    detector regression (an explain-format change, a regex slip) now
    fails THIS test instead of letting a bad plan through the audits.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from mcp_iceberg_duckdb_spark.sources.tables import load

    docs = load(spark, sf_dir, "documents")
    orders = load(spark, sf_dir, "orders")

    # 1. a join that lost its equi-condition. Planned as
    # CartesianProduct when neither side broadcasts, as a Cross
    # BroadcastNestedLoopJoin when one does (the small-SF case) —
    # the hygiene audit flags BOTH, so assert its combined predicate
    # fires, plus the pure-product form under a no-broadcast hint.
    bad_cross = docs.select("doc_id").crossJoin(
        orders.select("o_orderkey")
    )
    plan = explain_str(bad_cross, mode="simple")
    assert "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan
    forced = explain_str(
        docs.select("doc_id")
        .hint("shuffle_replicate_nl")
        .crossJoin(orders.select("o_orderkey")),
        mode="simple",
    )
    assert "CartesianProduct" in forced

    # 2. an unpartitioned ordered window over the corpus -> the
    # global-window detector must count it (and the partitioned
    # control must stay at zero)
    bad_window = docs.withColumn(
        "rn", F.row_number().over(Window.orderBy("doc_id"))
    )
    assert global_window_count(bad_window) >= 1
    ok_window = docs.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("source").orderBy("doc_id")
        ),
    )
    assert global_window_count(ok_window) == 0

    # 3. a global sort surviving in front of downstream work ->
    # rangepartitioning exchange
    bad_sort = docs.orderBy("doc_id").withColumn(
        "flag", F.length("text") > 10
    )
    assert range_partitioning_count(bad_sort) >= 1

    # 4. negative control for the shuffle counter: a pure scan-side
    # map plans zero exchanges, the bad sort at least one
    assert shuffle_count(docs.select("doc_id")) == 0
    assert shuffle_count(bad_sort) >= 1
