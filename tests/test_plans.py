"""Physical-plan regression tests: pin the plan properties SCALE.md
claims (filter pushdown, column pruning, broadcast joins, no Python
in JVM-only paths, single-evaluation projections) so they cannot
silently regress. These assert on plan STRINGS, not timings — stable
under load, and they fail loudly when a rewrite changes the shape."""

import pytest

from spark_tsne_spark.plans import queries as Q


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df) -> str:
    """Full `explain("formatted")` text — node details untruncated
    (the one-line toString elides long PushedFilters lists)."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def scan_lines(plan: str) -> list[str]:
    return [ln for ln in plan.splitlines() if "FileScan parquet" in ln]


def test_q1_pushdown_and_single_exchange(spark, sf_dir):
    plan = plan_of(Q.q1_pricing_summary(spark, sf_dir))
    scans = scan_lines(plan)
    assert scans, plan
    # the shipdate predicate reaches the parquet reader
    assert "PushedFilters: [" in scans[0] and "LessThanOrEqual" in scans[0]
    # projection pruning: lineitem has 16 cols, q1 needs 7
    read_schema = scans[0].split("ReadSchema:")[1]
    assert read_schema.count(":") <= 8, read_schema
    # one shuffle: the final groupBy (partial agg is map-side)
    assert plan.count("Exchange") == 1, plan


def test_q6_all_predicates_pushed(spark, sf_dir):
    plan = formatted_plan(Q.q6_revenue_delta(spark, sf_dir))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters:" in ln][0]
    for f in ("GreaterThanOrEqual", "LessThan"):
        assert f in pushed, pushed
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema:" in ln][0]
    assert read_schema.count(":") <= 5, read_schema


@pytest.mark.parametrize("qname", ["q3_top_orders", "q5_nation_revenue"])
def test_dims_broadcast_not_shuffled(spark, sf_dir, qname):
    """Star-schema dims must broadcast into the fact scan; a
    SortMergeJoin here would shuffle the fact table per dim."""
    plan = plan_of(getattr(Q, qname)(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


@pytest.mark.parametrize(
    "qname",
    [
        "text_quality_score",
        "text_lang_id",
        "corpus_hash_sample",
        "text_fingerprint",
        "text_repetition_scores",
    ],
)
def test_text_paths_stay_jvm_side(spark, sf_dir, qname):
    """Text/sampling expressions are built-ins: no Python evaluation
    node and no shuffle anywhere in these narrow passes."""
    plan = plan_of(getattr(Q, qname)(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    assert "Exchange" not in plan, plan


def test_repetition_folds_evaluated_once(spark, sf_dir):
    """The two multiplicity folds (words, bigrams) must survive
    CollapseProject: exactly two sort_array folds in the plan. If the
    struct projection inlines, every fraction column re-runs its fold
    (5 extra O(L log L) passes per row)."""
    plan = plan_of(Q.text_repetition_scores(spark, sf_dir))
    assert plan.count("sort_array") == 2, plan


def test_multiplicity_stats_semantics(spark):
    """Fold result == the GROUP BY statement of the same stats."""
    from pyspark.sql import functions as F

    from spark_tsne_spark.functions.text import multiplicity_stats

    rows = spark.createDataFrame(
        [
            (0, ["a", "b", "a", "c", "a", "b"]),  # a:3 b:2 c:1
            (1, ["x"]),
            (2, []),
            (3, ["y", "y", "y", "y"]),
        ],
        "id long, arr array<string>",
    ).select("id", multiplicity_stats(F.col("arr")).alias("s")).collect()
    got = {r["id"]: (r["s"]["n"], r["s"]["top"], r["s"]["dup"]) for r in rows}
    assert got == {
        0: (6, 3, 5),  # dup: a(3)+b(2); c is a singleton
        1: (1, 1, 0),
        2: (0, 0, 0),
        3: (4, 4, 4),
    }


def test_winnow_hash_array_evaluated_once(spark, sf_dir):
    """The shingle-hash projection must survive CollapseProject: one
    md5 transform in the whole plan. If this regresses to inlining,
    the md5 pass runs once per window slice (measured 29x slower)."""
    plan = plan_of(Q.text_winnow_fingerprints(spark, sf_dir))
    assert plan.count("md5") == 1, plan


def test_hash_sample_prunes_columns(spark, sf_dir):
    scan = scan_lines(plan_of(Q.corpus_hash_sample(spark, sf_dir)))[0]
    read_schema = scan.split("ReadSchema:")[1]
    # only doc_id and text are read, not the whole documents schema
    assert read_schema.count(":") <= 2, read_schema


def test_bm25_plan_shape(spark, sf_dir):
    """BM25 must read like an inverted index: no cartesian between
    corpus and terms, df/stats broadcast (never a SortMergeJoin), the
    top-k as TakeOrdered (no global sort), all JVM-side."""
    plan = plan_of(Q.bm25_search(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_passage_dedup_plan_shape(spark, sf_dir):
    """Passage dedup: uniform md5 join key, no cartesian, no Python."""
    plan = plan_of(Q.passage_dedup(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_q16_distinct_no_expand_dims_broadcast(spark, sf_dir):
    """Q16's single-column countDistinct must plan as a two-phase
    partial distinct (no Expand doubling the fact shuffle), the
    flagged-supplier NOT IN as a broadcast LEFT ANTI, and the part
    dim as a broadcast — no SortMergeJoin anywhere."""
    plan = plan_of(Q.q16_part_supplier_counts(spark, sf_dir))
    assert "Expand" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "LeftAnti" in plan, plan


def test_q9_dim_chain_all_broadcast(spark, sf_dir):
    """Q9's four dim joins (part/orders/supplier/nation) must not
    shuffle the pruned fact side more than once: part+supplier+nation
    broadcast, and the p_name LIKE filter reaches the part scan."""
    plan = formatted_plan(Q.q9_product_profit(spark, sf_dir))
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 3, plan
    pushed = [
        ln
        for ln in plan.splitlines()
        if "PushedFilters:" in ln and "Contains(p_name,gear)" in ln
    ]
    assert pushed, plan


def test_q21_no_expand(spark, sf_dir):
    """Q21's EXISTS/NOT-EXISTS collapse must stay a two-phase
    pre-aggregate: a double countDistinct would plan an Expand that
    duplicates every joined fact row x2 into the shuffle. Also pin
    the fact scan to the three columns the query actually reads."""
    plan = plan_of(Q.q21_waiting_supplier(spark, sf_dir))
    assert "Expand" not in plan, plan
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan, plan
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_suppkey:bigint,l_shipdate:"
        in plan
    ), plan


def test_asof_join_single_exchange(spark, sf_dir):
    """The as-of join's whole point: ONE shuffle (the by-key window),
    never a range join or cartesian product."""
    plan = plan_of(Q.events_asof_join(spark, sf_dir))
    assert plan.count("Exchange") == 1, plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_range_join_is_equi_join(spark, sf_dir):
    """The bucketized range join must plan as a hash/sort-merge equi
    join on the bucket id — a theta-only join would fall back to
    BroadcastNestedLoopJoin and O(n*m) at scale."""
    plan = plan_of(Q.events_range_join(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    ), plan


def test_pivot_single_aggregate_no_discovery_pass(spark, sf_dir):
    """Conditional-aggregation pivot: exactly one exchange over one
    scan — DataFrame.pivot would plan two aggregate exchanges (and an
    extra distinct-values job without explicit values)."""
    df = Q.events_pivot(spark, sf_dir)
    plan = plan_of(df)
    assert len(scan_lines(plan)) == 1, plan
    assert plan.count("Exchange") == 1, plan


def test_json_extract_stays_jvm_side(spark, sf_dir):
    plan = plan_of(Q.events_json_extract(spark, sf_dir))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan
    # parse + project happen below the single aggregation exchange
    assert plan.count("Exchange") == 1, plan


def test_anti_join_prunes_to_keys(spark, sf_dir):
    """left_anti keeps only the join/group keys flowing from both
    scans."""
    plan = formatted_plan(Q.customers_without_orders(spark, sf_dir))
    schemas = [ln for ln in plan.splitlines() if "ReadSchema:" in ln]
    assert len(schemas) == 2, plan
    for ln in schemas:
        assert ln.count(":") <= 3, ln  # ≤2 columns read per side


def test_curation_pipeline_single_exchange(spark, sf_dir):
    """The composed dedup→gate→sample pipeline: ONE shuffle (the
    fingerprint window); gates and sampling fuse above it as filters,
    all JVM-side."""
    plan = plan_of(Q.corpus_curation(spark, sf_dir))
    assert plan.count("Exchange") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, plan


def test_distinct_users_two_stage_with_partials(spark, sf_dir):
    """Skew-safe distinct: two aggregate exchanges, each preceded by a
    map-side partial — never a single-reducer countDistinct funnel."""
    plan = plan_of(Q.events_distinct_users(spark, sf_dir))
    assert plan.count("Exchange") == 2, plan
    assert plan.count("partial") >= 2, plan


def test_catalog_wide_no_accidental_cartesians(spark):
    """Blanket plan sweep over EVERY catalog entry: no CartesianProduct
    and no row-at-a-time Python anywhere, and BroadcastNestedLoopJoin
    only where it is the intended physical op — either a
    contract-quadratic oracle (the reference's own all-pairs
    semantics / a brute-force baseline) or a benign 1-row
    scalar-broadcast crossJoin. A new entry that accidentally plans a
    cartesian fails here before it ever reaches a big cluster."""
    from spark_tsne_spark.plans.queries import catalog

    # these entries RUN heavy driver work on invocation, not lazily
    skip = {
        "tsne_embedding",
        "streaming_windowed_counts",
        "streaming_interval_join",
        "streaming_token_budget",
        "streaming_enrich_join",
        "ann_ivf_index_query",  # builds the on-disk index
        "orc_roundtrip",  # writes the ORC copy on invocation
        "jsonl_roundtrip",  # writes the JSONL copy on invocation
        "schema_evolution_read",  # writes the two batches on invocation
        "partitioned_prune_roundtrip",  # writes the partitioned copy
        "orders_bloom_semijoin",  # builds the bloom bitmap on invocation
        "ann_mmr_diverse",  # collects the candidate head on invocation
        "corpus_wap_publish",  # stages + audits + publishes on invocation
        "embedding_sq8_recall",  # collects the d-row quant stats on invocation
        "streaming_cusum_monitor",  # drains the streaming agg on invocation
        "streaming_sessionize",  # drains the session stream on invocation
        "streaming_decayed_topk",  # drains the daily-count stream
        "nation_lead_time_p90",  # runs the narrowing loop on invocation
        "embedding_procrustes_align",  # accumulates M + SVD on invocation
    }
    # BroadcastNestedLoopJoin intended:
    bnlj_ok = {
        # contract-quadratic (X2P relational oracle stages / brute force)
        "x3_x5_pairwise_sqdist",
        "x6_knn_topk",
        "y1_symmetrize",
        "ann_topk_cosine",
        "dedup_embedding_cosine",
        # 1-row scalar-broadcast crossJoin (stats / grid bounds)
        "bm25_search",
        # nests bm25 + query-likelihood, each with a 1-row stats
        # crossJoin (fusion itself is a k-row equi join)
        "rrf_hybrid_search",
        "events_gapfill_locf",
        "events_gapfill_interp",
        "tfidf_top_terms",
        # 1-row dangling-mass scalar broadcast per power iteration
        "dedup_graph_pagerank",
        # 1-row total-order-count scalar broadcast into the lift
        "part_cooccurrence",
        # eval-set broadcast threshold join (benchmark-sized small side
        # by construction; the big side streams, no shuffle)
        "semantic_contamination",
        # |labels|^2/2 self-join of the TINY centroid table (the
        # corpus-sized scan happens before, in the bounded-shuffle agg)
        "centroid_similarity",
        # point-in-interval lookup against a k-row band table: each
        # fact row scans k broadcast intervals in memory — BNLJ IS the
        # right plan for a non-equi join with a tiny build side
        "orders_price_bands",
        # 1-row scalar-broadcast crossJoins: (N, V) LM normalizers /
        # NB class totals and priors (nested into the eval entries)
        "trigram_lm_ppl",
        "nb_quality_classifier",
        "classifier_auc",
        "classifier_calibration",
        # recall eval: the EXACT side is the query-bounded brute-force
        # baseline (|q| x n broadcast block) — BNLJ is its contract
        "ann_recall_at_k",
        # 1-row scalar-broadcast crossJoin (max-ts "today" anchor)
        "events_decayed_topk",
        # bounded crossJoins: 1-row (n, S) + 24-row lag table + 1-row
        # variance denominator, all against the |hours|-bounded series
        "events_autocorrelation",
        # contract-quadratic PAIR joins of the |hours|-bounded hourly
        # series (h_j > h_i theta join) + 1-row scalar broadcasts
        "events_mann_kendall",
        "events_theil_sen",
        # 1-row scalar-broadcast crossJoin (exact median anchor)
        "events_runs_test",
        # |days|-bounded range join of day list vs per-day registers
        # + nothing corpus-sized (30 x 30*512 at sf0.1)
        "events_rolling_distinct_hll",
        # 1-row scalar-broadcast crossJoin (collision totals)
        "vocab_feature_hashing_collisions",
        # 1-row scalar-broadcast crossJoin (|bigram types| normalizer)
        "bigram_kneser_ney",
        # 1-row scalar-broadcast crossJoins (k+1-th order statistic /
        # within-group sum-of-squares row)
        "events_hill_tail_index",
        "events_seasonality_strength",
        # 1-row scalar-broadcast crossJoins (midpoint cut / floor-mean
        # offset / corpus doc count)
        "customers_rfm_migration",
        "lineitem_moments",
        "text_term_burstiness",
        # 6x6 bounded rank theta-join of the top-term list (15 pairs)
        "docs_topic_coherence",
        # 1-row scalar-broadcast crossJoins (class totals / global
        # prior / gini totals / global bin bounds)
        "orders_woe_iv",
        "orders_target_encoding_loo",
        "customers_gini_lorenz",
        "events_psi_drift",
        # 1-row scalar-broadcast crossJoin (global avg-balance threshold)
        "q22_dormant_customers",
        # 1-row scalar-broadcast crossJoin (global value-total threshold)
        "q11_important_parts",
        # 1-row scalar-broadcast crossJoin (corpus doc count into IDF)
        "allpairs_cosine",
        # contract-quadratic brute-force baseline (label-filtered ANN)
        "ann_hard_negatives",
        # 1-row scalar-broadcast crossJoin (temperature normalizer)
        "corpus_temperature_mix",
        # 1-row scalar-broadcast crossJoin (n_rows into ref-check rows)
        "dq_orders_expectations",
        # 1-row scalar-broadcast crossJoin (doc count into c-TF-IDF)
        "cluster_topics",
        # |qs|-row quantile-list broadcast into the bounded
        # (groups x bins) sketch table — data-size-independent
        "orders_sketch_quantiles",
        # query-bounded brute-force eval block (|q| x |dims| x n),
        # same contract as ann_recall_at_k
        "ann_dim_truncation_recall",
        # |sources| x |vocab| dense-grid build from two bounded
        # aggregates (20 x 200) — data-size-independent
        "source_js_divergence",
        # three 1-row scalar-count crossJoins feeding the metric row;
        # the exact-Jaccard truth side is the bounded 200-doc eval
        # baseline (same quarantine as the dedup oracles)
        "dedup_lsh_recall",
        # same eval harness, simhash generator
        "dedup_simhash_recall",
        # 1-row scalar-broadcast crossJoins: observation-window end
        # into censoring; QI row total into the band shares; exact
        # distinct count next to the sketch estimate
        "events_survival_km",
        "customers_k_anonymity",
        "events_hll_distinct",
        # query-batch broadcast into the candidate matrix (mining
        # contract: bounded |Q| x sharded candidates)
        "bitext_margin_mine",
        # |types|-bounded pair fan-out of the k-row sketches (the
        # KMV pair stage is sketch-sized, never data-sized)
        "events_kmv_intersection",
        # 1-row scalar-broadcast crossJoin (full-vocab normalizer)
        "vocab_negative_sampling",
        # 1-row (min,max) doc-id bounds broadcast into the decile
        # width-bucket — the no-global-sort alternative to row_number
        "docs_ngram_novelty",
        # |types| x |bands| dim-x-dim grid (zero-observed chi2 cells
        # must still contribute E) + the 1-row totals broadcast
        "events_cramers_v",
        # 1-row (min,max event_type) broadcast selecting the pair
        "events_welch_t",
    }
    offenders = {}
    for name, q in sorted(catalog().items()):
        if name in skip:
            continue
        plan = plan_of(q.fn(spark, "/root/testdata/sf0.001"))
        marks = [
            m
            for m in ("CartesianProduct", "BatchEvalPython")
            if m in plan
        ]
        if "BroadcastNestedLoopJoin" in plan and name not in bnlj_ok:
            marks.append("BroadcastNestedLoopJoin")
        if marks:
            offenders[name] = marks
    assert not offenders, offenders


def test_packing_entries_prune_columns(spark, sf_dir):
    """The packing/mixing/gating plans must read only the columns they
    use (doc_id/text[/source]), not the full documents schema — at
    100 TB the difference is the scan itself."""
    # Plan pins must run against a clean cache: a persisted full-schema
    # DataFrame leaked by an earlier test would plan-substitute into
    # these queries and defeat the ReadSchema assertion.
    spark.catalog.clearCache()
    for name, max_cols in [
        ("seq_packing", 2),
        ("corpus_token_budget", 3),
        ("quality_gate_per_source", 3),
    ]:
        plan = plan_of(Q.catalog()[name].fn(spark, sf_dir))
        for line in plan.splitlines():
            if "ReadSchema" in line:
                schema = line.split("ReadSchema:")[1]
                assert schema.count(":") <= max_cols, (name, schema)


def test_anomaly_zscore_stats_broadcast(spark, sf_dir):
    """The per-type stats table must broadcast back onto the fact
    scan — a SortMergeJoin here would shuffle the full event stream
    to join a |types|-row aggregate."""
    plan = plan_of(Q.events_anomaly_zscore(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_sq8_stats_broadcast_and_pruned_scan(spark, sf_dir):
    """The d-row per-dimension stats broadcast onto the exploded
    components, and the embeddings scan reads only (vec_id,
    embedding)."""
    plan = plan_of(Q.embedding_sq8(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    scans = scan_lines(plan)
    assert scans, plan
    read_schema = scans[0].split("ReadSchema:")[1]
    assert "label" not in read_schema, read_schema


def test_part_cooccurrence_joins_after_aggregation(spark, sf_dir):
    """The per-part counts join onto the AGGREGATED pair table (pair
    rows, not raw lineitem²), and the pair self-join is an equi-join
    on the order key — never a cartesian."""
    plan = plan_of(Q.part_cooccurrence(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    # the support filter sits above the pair aggregate, pre-join
    assert "n_pair" in plan, plan


def test_bootstrap_ci_single_scan(spark, sf_dir):
    """All 20 Poisson replicas must come from ONE events scan — the
    whole point of the hash-weighted bootstrap is that B replicas
    never multiply the read. A second FileScan here means someone
    broke the single-aggregate shape."""
    plan = plan_of(Q.events_bootstrap_ci(spark, sf_dir))
    assert len(scan_lines(plan)) == 1, plan


def test_correlation_matrix_single_scan_single_aggregate(spark, sf_dir):
    """All 14 moments accumulate in ONE pass: one lineitem scan, and
    the six pair rows come from exploding the single moment row —
    never per-pair scans."""
    plan = plan_of(Q.lineitem_correlation_matrix(spark, sf_dir))
    assert len(scan_lines(plan)) == 1, plan
    assert "CartesianProduct" not in plan, plan


def test_positional_deletes_anti_join_broadcasts(spark, sf_dir):
    """The delete vector is a thin (file, pos) projection — the
    reconstruction anti join must broadcast it, not shuffle the base
    scan."""
    plan = plan_of(Q.docs_positional_deletes(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "LeftAnti" in plan, plan


def test_similar_items_joins_after_pair_aggregation(spark, sf_dir):
    """Degree tables join onto the AGGREGATED pair table (support
    ≥ 2 applied before the join), and the basket self-join is an
    equi join on the order key — never a cartesian."""
    plan = plan_of(Q.part_similar_items(spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "n_pair" in plan, plan


def test_readability_stays_jvm_side(spark, sf_dir):
    """The three regexp counts are codegen expressions — any
    BatchEvalPython here means a Python UDF crept into the scan
    path."""
    plan = plan_of(Q.docs_readability(spark, sf_dir))
    assert "BatchEvalPython" not in plan, plan
    assert "ArrowEvalPython" not in plan, plan


# Rows-only entries burn a driver correctness slot every round they
# sit in the top-50 sample (`err: "no_oracle"` counts as red — VERDICT
# r6 #1: the three BPE entries shipped sql=None and were the only red
# rows of the round). An entry may skip its oracle ONLY by being
# listed here with a reason; today every entry is value-checkable, so
# the set is empty — keep it that way unless the semantics genuinely
# can't be pinned (even iterative numerics pin via golden parquets:
# tsne_embedding, x2p_affinities, bpe_vocab).
ROWS_ONLY_OK: dict = {}


def test_every_catalog_entry_has_an_oracle():
    missing = sorted(
        n for n, q in Q.catalog().items()
        if q.sql is None and n not in ROWS_ONLY_OK
    )
    assert not missing, (
        f"catalog entries without oracle SQL (add a golden-parquet "
        f"oracle like scripts/make_bpe_golden.py, or document a "
        f"rows-only exemption in ROWS_ONLY_OK): {missing}"
    )
