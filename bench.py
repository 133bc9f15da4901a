"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
``{"metric": "total_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}``

Mix: the relational workhorses over the 600k-row lineitem, the
training-data-pipeline ops over documents/embeddings at full width
(no subset filters — the catalog's oracle variants subset for the
correctness gate; the bench variants don't), and the iterative
t-SNE stages (X2P + 20 Barnes-Hut iterations).
"""

from __future__ import annotations

import json
import os
import re
import time

from pyspark.sql import functions as F

# Stage-breakdown scratchpad: composite bench entries (the distributed
# t-SNE) write their per-stage wall-clock here; main() snapshots it
# per run and emits it under "stages" in the JSON line.
_STAGES: dict = {}

# The flagship's input is FLAGSHIP_COPIES jittered copies of the
# embeddings table. ONE constant shared by the input builder and the
# warm-up's workspace pre-fault sizing: cached_shared_empty keys on
# exact shape, so a drifted copy count would make the pre-fault a
# silent no-op and land the one-time zero-fill back inside the
# flagship's timed run.
FLAGSHIP_COPIES = 25


def bench_queries():
    """name -> callable(spark, sf_dir) returning a DataFrame to exhaust."""
    from spark_tsne_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
        simhash,
    )
    from spark_tsne_spark.operators.knn import knn_exact_block
    from spark_tsne_spark.operators.similarity import cosine_topk_block, ivf_topk
    from spark_tsne_spark.plans import queries as Q
    from spark_tsne_spark.sources.tables import load_table

    def docs(spark, sf_dir):
        return load_table(spark, "documents", sf_dir)

    def emb(spark, sf_dir):
        return load_table(spark, "embeddings", sf_dir)

    def b_minhash_full(spark, sf_dir):
        # max_bucket=512 exercises the mega-clique cap — the
        # production contract at scale (the uncapped variant stays in
        # the correctness catalog, where the oracle needs every pair).
        return minhash_lsh_candidates(
            docs(spark, sf_dir).where(F.length("text") >= 5),
            num_hashes=16, band_size=4, hash_fn="xxhash64", max_bucket=512,
        )

    def b_simhash_full(spark, sf_dir):
        return simhash(docs(spark, sf_dir))

    def b_jaccard_full(spark, sf_dir):
        # Word TRIgrams + a hot-shingle cap: the synthetic corpus has a
        # 931-bigram vocabulary, so a bigram inverted index degenerates
        # to all-pairs (10M+ candidate pairs); trigrams are the
        # standard production shingle for Jaccard dedup and keep the
        # index sparse (27k vocab, 26x less join work here).
        return ngram_jaccard_pairs(
            docs(spark, sf_dir), n=3, min_jaccard=0.2, max_df=100
        )

    def b_exact_dedup(spark, sf_dir):
        return exact_dedup(docs(spark, sf_dir))

    def b_containment_full(spark, sf_dir):
        # full corpus with the production hot-shingle cap (the
        # uncapped exact variant stays in the correctness catalog)
        from spark_tsne_spark.operators.dedup import ngram_containment_pairs

        return ngram_containment_pairs(
            docs(spark, sf_dir), n=3, min_containment=0.6, max_df=100
        )

    def b_dedup_clusters(spark, sf_dir):
        from spark_tsne_spark.operators.dedup import duplicate_clusters

        d = docs(spark, sf_dir).where(F.length("text") >= 5)
        pairs = minhash_lsh_candidates(
            d, num_hashes=16, band_size=4, hash_fn="xxhash64", max_bucket=512
        )
        return duplicate_clusters(pairs, d)

    def b_knn_block(spark, sf_dir):
        return knn_exact_block(emb(spark, sf_dir), k=45, id_col="vec_id", features="embedding")

    def b_knn_lsh_banded(spark, sf_dir):
        # full sf0.1 table, bench-grade k (the catalog variant subsets
        # to 200 rows / k=10 for the golden pin)
        from spark_tsne_spark.operators.knn import knn_lsh_banded

        return knn_lsh_banded(
            emb(spark, sf_dir), k=45, id_col="vec_id", features="embedding"
        )

    def b_knn_lsh_banded_mp(spark, sf_dir):
        # the affinity path's shipped 1M dials (6 tables x 2 symmetric
        # probes; SCALE.md r11) at full sf0.1 width
        from spark_tsne_spark.operators.knn import knn_lsh_banded

        return knn_lsh_banded(
            emb(spark, sf_dir), k=45, id_col="vec_id", features="embedding",
            num_tables=6, n_probe=2,
        )

    def b_ann_topk(spark, sf_dir):
        e = emb(spark, sf_dir)
        qs = e.where(F.col("vec_id") < 100)
        return cosine_topk_block(e, qs, k=10, id_col="vec_id", vec_col="embedding")

    def b_ivf_topk(spark, sf_dir):
        e = emb(spark, sf_dir)
        qs = e.where(F.col("vec_id") < 100)
        return ivf_topk(e, qs, k=10, id_col="vec_id", vec_col="embedding")

    def b_semdedup(spark, sf_dir):
        from spark_tsne_spark.operators.dedup import semdedup

        return semdedup(emb(spark, sf_dir), threshold=0.4, n_clusters=16)

    def b_ivf_pq(spark, sf_dir):
        from spark_tsne_spark.operators.similarity import ivf_pq_topk

        e = emb(spark, sf_dir)
        qs = e.where(F.col("vec_id") < 100)
        return ivf_pq_topk(
            e, qs, k=10, id_col="vec_id", vec_col="embedding",
            profile=_STAGES,
        )

    _IDX_CACHE: dict = {}

    def b_ivf_index_query(spark, sf_dir):
        """The production ANN number: query against the PERSISTENT
        index. The first repeat pays the one-time build; later repeats
        reuse it, so the reported min is the query-only cost — exactly
        the build-once/query-many contract."""
        from spark_tsne_spark.operators.similarity import IvfIndex

        idx = _IDX_CACHE.get(sf_dir)
        if idx is None:
            import re as _re

            tag = _re.sub(r"[^0-9a-zA-Z.]", "_", sf_dir)
            idx = IvfIndex.build(
                emb(spark, sf_dir), f"/tmp/spark_graft_bench_ivf_{tag}"
            )
            _IDX_CACHE[sf_dir] = idx
        qs = emb(spark, sf_dir).where(F.col("vec_id") < 100)
        return idx.query(qs, k=10)

    def b_tsne_bh20(spark, sf_dir):
        from spark_tsne_spark.api import bh_tsne

        e = emb(spark, sf_dir).cache()
        res = bh_tsne(
            e, max_iterations=20, perplexity=30.0, seed=42,
            id_col="vec_id", features="embedding",
        )
        return res.to_df(spark)

    def b_tsne_bh_distributed(spark, sf_dir):
        """The distributed per-iteration loop, actually measured: 50k
        rows (25 deterministic jittered copies of the embeddings
        table) is ~3x above LOCAL_THRESHOLD_BH, so X2P kNN, the β
        calibration, and every one of the 10 BH iterations
        (broadcast (Y, tree) → mapInPandas force pass → driver
        update) run as Spark jobs — the flagship's 100 TB shape, not
        the driver-local shortcut. Fills ``_STAGES`` with the stage
        breakdown (fused affinity job / per-iteration stats) so the
        headline number is attributable."""
        from spark_tsne_spark.api import bh_tsne

        e = emb(spark, sf_dir)
        copies = spark.range(FLAGSHIP_COPIES).select(F.col("id").alias("copy"))
        # LAZY cache — no eager count here: bh_tsne's own input count
        # is the first action, so the build materializes inside the
        # affinity job's input scan (one pass) instead of paying a
        # separate build+count job plus a re-scan (r10 split: ~1.0-1.3s
        # build + 0.2-0.3s count before the affinity job even started).
        # The profile's input_count_sec now carries build+materialize.
        big = (
            e.crossJoin(copies)
            .select(
                (F.col("vec_id") + F.col("copy") * 1_000_000).alias("vid"),
                F.transform(
                    "embedding",
                    lambda x, i: (
                        x
                        + F.pmod(
                            F.xxhash64(F.col("vec_id"), F.col("copy"), i),
                            F.lit(1000),
                        ).cast("double")
                        / 1e4
                    ).cast("float"),
                ).alias("embedding"),
            )
            .withColumnRenamed("vid", "vec_id")
            .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
            .cache()
        )
        res = bh_tsne(
            big, max_iterations=10, perplexity=30.0, seed=42,
            id_col="vec_id", features="embedding", profile=_STAGES,
        )
        return res.to_df(spark)

    _BPE_BENCH_CACHE: dict = {}

    def _bench_merges(spark, sf_dir):
        m = _BPE_BENCH_CACHE.get(sf_dir)
        if m is None:
            from spark_tsne_spark.operators.bpe import train_bpe

            m = train_bpe(
                docs(spark, sf_dir), num_merges=200, max_words=30000
            )
            _BPE_BENCH_CACHE[sf_dir] = m
        return m

    def b_bpe_train(spark, sf_dir):
        # Full training every repeat: histogram shuffle + top-k +
        # driver merge loop — the train-side number.
        from spark_tsne_spark.operators.bpe import merges_df, train_bpe

        return merges_df(
            spark, train_bpe(docs(spark, sf_dir), num_merges=200,
                             max_words=30000)
        )

    def b_bpe_encode(spark, sf_dir):
        # Train-once/encode-many accounting (the tokenizer-model
        # contract, same pattern as ann_ivf_index_query): the first
        # repeat pays training via the cache, the min is encode-only.
        from spark_tsne_spark.operators.bpe import bpe_encode_stats

        return bpe_encode_stats(
            docs(spark, sf_dir), _bench_merges(spark, sf_dir)
        )

    _UNIGRAM_BENCH_CACHE: dict = {}

    def _bench_unigram(spark, sf_dir):
        m = _UNIGRAM_BENCH_CACHE.get(sf_dir)
        if m is None:
            from spark_tsne_spark.operators.unigram import train_unigram

            m = train_unigram(docs(spark, sf_dir), vocab_size=120,
                              max_words=30000)
            _UNIGRAM_BENCH_CACHE[sf_dir] = m
        return m

    def b_unigram_train(spark, sf_dir):
        # Full training every repeat: histogram shuffle + top-k +
        # driver EM/prune loop — the train-side number.
        from spark_tsne_spark.operators.unigram import (
            pieces_df, train_unigram,
        )

        return pieces_df(
            spark, train_unigram(docs(spark, sf_dir), vocab_size=120,
                                 max_words=30000)
        )

    def b_unigram_encode(spark, sf_dir):
        # Train-once/encode-many accounting (same pattern as
        # bpe_encode): first repeat pays training via the cache, the
        # min is Viterbi-encode-only.
        from spark_tsne_spark.operators.unigram import unigram_encode_stats

        return unigram_encode_stats(
            docs(spark, sf_dir), _bench_unigram(spark, sf_dir)
        )

    def b_allpairs_cosine(spark, sf_dir):
        # Full-corpus similarity join; the synthetic corpus is DENSE
        # (template-generated — thousands of docs share single
        # high-weight terms), so the hot-term cap is the production
        # contract being timed, exactly like the MinHash max_bucket:
        # measured at sf0.1, max_bucket=1000 → 2.4 s / 1142 pairs,
        # while 2000 → 92 s / 2507 pairs (the uncapped mega-clique is
        # genuinely quadratic — those pairs ARE similar, and a real
        # pipeline routes cliques that size to the dedup path).
        from spark_tsne_spark.operators.search import allpairs_cosine_pairs

        return allpairs_cosine_pairs(
            docs(spark, sf_dir), threshold=0.9, max_bucket=1000
        )

    def b_fuzzy_ed2(spark, sf_dir):
        from spark_tsne_spark.operators.dedup import fuzzy_prefix_pairs

        return fuzzy_prefix_pairs(
            docs(spark, sf_dir), max_edit=2, max_bucket=4000
        )

    def b_graph_lpa(spark, sf_dir):
        # Communities over the same capped full-corpus near-dup graph
        # as the pagerank entry: 4 synchronous LPA rounds (production
        # path — driver bincount under the 5M-edge gate at this size).
        from spark_tsne_spark.operators.dedup import minhash_lsh_candidates
        from spark_tsne_spark.operators.graph import (
            label_propagation,
            symmetrize_edges,
        )

        d = docs(spark, sf_dir).where(F.length("text") >= 5)
        pairs = minhash_lsh_candidates(
            d, num_hashes=16, band_size=4, hash_fn="xxhash64", max_bucket=512
        )
        return label_propagation(symmetrize_edges(pairs), num_iters=4)

    def b_temperature_mix(spark, sf_dir):
        # Full-corpus temperature reweighting at alpha=0.5: one
        # |sources|-row groupBy + rate join + hash keep filter.
        from spark_tsne_spark.functions.text import token_count
        from spark_tsne_spark.operators.sampling import temperature_mix

        d = docs(spark, sf_dir).select(
            "doc_id", "source", token_count("text").alias("nt")
        )
        return temperature_mix(
            d, key=F.col("doc_id").cast("string"), weight="nt",
            stratum="source", alpha=0.5, target_weight=100_000.0,
            salt="bench:",
        )

    def b_seq_packing(spark, sf_dir):
        from spark_tsne_spark.operators.packing import pack_sequences

        return pack_sequences(docs(spark, sf_dir), block_size=2048)

    def b_token_budget(spark, sf_dir):
        # Fixed per-source budget: partial keeps at every sf (each
        # source holds ~14k tokens at sf0.1), so the boundary-bucket
        # path is what gets timed.
        from spark_tsne_spark.operators.packing import token_budget_sample

        budgets = {f"src{i}": 5000 for i in range(20)}
        return token_budget_sample(docs(spark, sf_dir), budgets, salt="b1")

    def b_graph_pagerank(spark, sf_dir):
        # Full-corpus near-dup pair graph (capped buckets), 5 power
        # iterations: the iterative join+agg loop at bench scale.
        from spark_tsne_spark.operators.dedup import minhash_lsh_candidates
        from spark_tsne_spark.operators.graph import canonical_by_pagerank

        d = docs(spark, sf_dir).where(F.length("text") >= 5)
        pairs = minhash_lsh_candidates(
            d, num_hashes=16, band_size=4, hash_fn="xxhash64", max_bucket=512
        )
        return canonical_by_pagerank(pairs, num_iters=5)

    def b_triangles(spark, sf_dir):
        # Full-corpus near-dup graph (tighter bucket cap than the
        # pagerank entry: triangle volume grows with clique density,
        # and a 512-clique alone holds 22M triangles — the cap is the
        # production contract for clique-heavy dup graphs).
        from spark_tsne_spark.operators.dedup import minhash_lsh_candidates
        from spark_tsne_spark.operators.graph import triangle_counts

        d = docs(spark, sf_dir).where(F.length("text") >= 5)
        pairs = minhash_lsh_candidates(
            d, num_hashes=16, band_size=4, hash_fn="xxhash64", max_bucket=128
        )
        return triangle_counts(pairs)

    def b_term_pmi(spark, sf_dir):
        from spark_tsne_spark.operators.search import term_pmi_pairs

        return term_pmi_pairs(docs(spark, sf_dir))

    def b_tfidf(spark, sf_dir):
        from spark_tsne_spark.operators.search import tfidf_top_terms

        return tfidf_top_terms(docs(spark, sf_dir), top=3)

    return {
        "q1_pricing_summary": Q.q1_pricing_summary,
        "q3_top_orders": Q.q3_top_orders,
        "q5_nation_revenue": Q.q5_nation_revenue,
        "q6_revenue_delta": Q.q6_revenue_delta,
        "rollup_revenue": Q.rollup_revenue,
        "window_top_orders": Q.window_top_orders_per_customer,
        "events_tumbling_agg": Q.events_tumbling_agg,
        "events_sessionize": Q.events_sessionize,
        "events_asof_join": Q.events_asof_join,
        "events_range_join": Q.events_range_join,
        "events_gapfill_locf": Q.events_gapfill_locf,
        "events_hopping_agg": Q.events_hopping_agg,
        "events_funnel": Q.events_funnel,
        "events_cohort_retention": Q.events_cohort_retention,
        "events_ewma": Q.events_ewma,
        "events_nearest_join": Q.events_nearest_join,
        "event_transitions": Q.event_transitions,
        "events_value_histogram": Q.events_value_histogram,
        "user_activity_span": Q.user_activity_span,
        "top_terms_per_source": Q.top_terms_per_source,
        "part_cooccurrence": Q.part_cooccurrence,
        "events_anomaly_zscore": Q.events_anomaly_zscore,
        "embedding_sq8": Q.embedding_sq8,
        "scd2_history": Q.scd2_history,
        "table_checksum": Q.table_checksum,
        "q18_large_orders": Q.q18_large_orders,
        "q8_market_share": Q.q8_market_share,
        "q13_order_distribution": Q.q13_order_distribution,
        "q17_small_quantity": Q.q17_small_quantity,
        "q21_waiting_supplier": Q.q21_waiting_supplier,
        "q2_min_cost_supplier": Q.q2_min_cost_supplier,
        "q9_product_profit": Q.q9_product_profit,
        "q11_important_parts": Q.q11_important_parts,
        "q16_part_supplier_counts": Q.q16_part_supplier_counts,
        "q20_promotion_suppliers": Q.q20_promotion_suppliers,
        "orders_exact_quantiles": Q.orders_exact_quantiles,
        "docs_median_len_per_source": Q.docs_median_len_per_source,
        "docs_byte_weighted_median": Q.docs_byte_weighted_median,
        "cube_revenue": Q.cube_revenue,
        "orc_roundtrip": Q.orc_roundtrip,
        "jsonl_roundtrip": Q.jsonl_roundtrip,
        "embedding_kmeans": Q.embedding_kmeans,
        "corpus_curation": Q.corpus_curation,
        "text_char_entropy": Q.text_char_entropy,
        "multimodal_jpeg": Q.multimodal_jpeg,
        "dedup_exact": b_exact_dedup,
        "dedup_clusters": b_dedup_clusters,
        "dedup_minhash_lsh": b_minhash_full,
        "dedup_simhash": b_simhash_full,
        "dedup_ngram_jaccard": b_jaccard_full,
        "dedup_passages": Q.passage_dedup,
        "text_normalize": Q.text_normalize,
        "dedup_duplicate_spans": Q.dedup_duplicate_spans,
        "shard_plan": Q.shard_plan,
        "source_overlap": Q.source_overlap,
        "dedup_boilerplate": Q.dedup_boilerplate_lines,
        "dedup_bloom_incremental": Q.dedup_bloom_incremental,
        "fuzzy_prefix_pairs": Q.fuzzy_prefix_pairs_q,
        "dedup_semantic": b_semdedup,
        "dedup_graph_rank": b_graph_pagerank,
        "text_quality_score": Q.text_quality_score,
        "text_gopher_gate": Q.text_gopher_gate,
        "text_lm_score": Q.text_lm_score,
        "text_winnow": Q.text_winnow_fingerprints,
        "corpus_upsert": Q.corpus_upsert,
        "bm25_search": Q.bm25_search,
        "dedup_graph_triangles": b_triangles,
        "term_pmi": b_term_pmi,
        "tfidf_top_terms": b_tfidf,
        "seq_packing": b_seq_packing,
        "token_budget_mix": b_token_budget,
        "knn_exact_block": b_knn_block,
        "knn_lsh_banded": b_knn_lsh_banded,
        "knn_lsh_banded_mp": b_knn_lsh_banded_mp,
        "ann_topk_cosine": b_ann_topk,
        "ann_ivf_topk": b_ivf_topk,
        "ann_ivf_pq_topk": b_ivf_pq,
        "ann_ivf_index_query": b_ivf_index_query,
        "tsne_bh_20iter": b_tsne_bh20,
        "tsne_bh_distributed": b_tsne_bh_distributed,
        "bpe_train": b_bpe_train,
        "bpe_encode": b_bpe_encode,
        "unigram_train": b_unigram_train,
        "unigram_encode": b_unigram_encode,
        "tokenizer_fertility": Q.tokenizer_fertility,
        "trigram_lm_ppl": Q.trigram_lm_ppl,
        "nb_quality_classifier": Q.nb_quality_classifier,
        "classifier_auc": Q.classifier_auc,
        "zorder_layout_stats": Q.zorder_layout_stats,
        "ann_recall_at_k": Q.ann_recall_at_k,
        "cms_heavy_hitters": Q.cms_heavy_hitters,
        "rrf_hybrid_search": Q.rrf_hybrid_search,
        "schema_evolution_read": Q.schema_evolution_read,
        "dq_benford_digits": Q.dq_benford_digits,
        "allpairs_cosine": b_allpairs_cosine,
        "fuzzy_prefix_ed2": b_fuzzy_ed2,
        "leakage_safe_split": Q.leakage_safe_split,
        "events_seasonal_baseline": Q.events_seasonal_baseline,
        "graph_communities": b_graph_lpa,
        "temperature_mix": b_temperature_mix,
        "bigram_next_token": Q.bigram_next_token,
        "dq_expectations": Q.dq_orders_expectations,
        "events_user_features": Q.events_user_features,
        "lang_id_join": Q.text_lang_id_join,
        "dedup_sorted_neighborhood": Q.dedup_sorted_neighborhood,
        "dedup_containment": b_containment_full,
        "source_js_divergence": Q.source_js_divergence,
        "source_novelty": Q.source_novelty,
        "sketch_quantiles": Q.orders_sketch_quantiles,
        "matched_sample": Q.corpus_matched_sample,
        "dim_truncation_recall": Q.ann_dim_truncation_recall,
        "corpus_funnel": Q.corpus_funnel_report,
        "bloom_semijoin": Q.orders_bloom_semijoin,
        "mmr_diverse": Q.ann_mmr_diverse,
        "lsh_recall_eval": Q.dedup_lsh_recall,
        "wap_publish": Q.corpus_wap_publish,
        "ab_test": Q.events_ab_test,
        "cusum_changepoint": Q.events_cusum_changepoint,
        "volume_trend": Q.events_volume_trend,
        "forget_users": Q.events_forget_users,
        "dau_wau": Q.events_dau_wau,
        "pareto_abc": Q.orders_pareto_abc,
        "simhash_recall_eval": Q.dedup_simhash_recall,
        "sq8_recall_eval": Q.embedding_sq8_recall,
        "pit_state_join": Q.events_pit_state_join,
        "attribution": Q.events_attribution,
        "rfm_segments": Q.orders_rfm_segments,
        "streaming_cusum": Q.streaming_cusum_monitor,
        "survival_km": Q.events_survival_km,
        "k_anonymity": Q.customers_k_anonymity,
        "hll_distinct": Q.events_hll_distinct,
        "linkage_scores": Q.part_linkage_scores,
        "margin_mine": Q.bitext_margin_mine,
        "holt_forecast": Q.events_holt_forecast,
        "kmv_intersection": Q.events_kmv_intersection,
        "negative_sampling": Q.vocab_negative_sampling,
        "quarantine_bitmask": Q.orders_quarantine_bitmask,
        "robust_scale": Q.orders_robust_scale,
        "streaming_sessionize": Q.streaming_sessionize,
        "incident_overlap": Q.sessions_incident_overlap,
        "anomaly_mad": Q.events_anomaly_mad,
        "trimmed_mean": Q.orders_trimmed_mean,
        "forecast_conformal": Q.events_forecast_conformal,
        "shard_rebalance": Q.docs_shard_rebalance,
        "decayed_topk": Q.events_decayed_topk,
        "woe_iv": Q.orders_woe_iv,
        "target_encoding": Q.orders_target_encoding_loo,
        "gini_lorenz": Q.customers_gini_lorenz,
        "psi_drift": Q.events_psi_drift,
        "ltv_cohort": Q.customers_ltv_cohort,
        "chi2_independence": Q.orders_chi2_independence,
        "readability": Q.docs_readability,
        "graph_assortativity": Q.dedup_graph_assortativity,
        "positional_deletes": Q.docs_positional_deletes,
        "ks_test": Q.events_ks_test,
        "mannwhitney_u": Q.events_mannwhitney_u,
        "zipf_fit": Q.vocab_zipf_fit,
        "bootstrap_ci": Q.events_bootstrap_ci,
        "autocorrelation": Q.events_autocorrelation,
        "correlation_matrix": Q.lineitem_correlation_matrix,
        "gate_kappa": Q.docs_gate_agreement_kappa,
        "trigram_paths": Q.events_top_trigram_paths,
        "mann_kendall": Q.events_mann_kendall,
        "theil_sen": Q.events_theil_sen,
        "ks_fdr": Q.events_ks_per_type_fdr,
        "streaming_decayed_topk": Q.streaming_decayed_topk,
        "supplier_hhi": Q.nation_supplier_hhi,
        "entropy_rate": Q.events_entropy_rate,
        "runs_test": Q.events_runs_test,
        "similar_items": Q.part_similar_items,
        "rolling_hll": Q.events_rolling_distinct_hll,
        "feature_hashing": Q.vocab_feature_hashing_collisions,
        "kneser_ney": Q.bigram_kneser_ney,
        "topic_coherence": Q.docs_topic_coherence,
        "abc_xyz": Q.part_abc_xyz_matrix,
        "hill_tail": Q.events_hill_tail_index,
        "seasonality_strength": Q.events_seasonality_strength,
        "rfm_migration": Q.customers_rfm_migration,
        "moments": Q.lineitem_moments,
        "burstiness": Q.text_term_burstiness,
        "lead_time_p90": Q.nation_lead_time_p90,
        "heaps_law": Q.text_heaps_law,
        "procrustes": Q.embedding_procrustes_align,
        "grouping_sets": Q.revenue_grouping_sets,
        "anova_f": Q.events_anova_f,
        "l_diversity": Q.customers_l_diversity,
        "bucketed_join": Q.bucketed_join_no_shuffle,
        "ngram_novelty": Q.docs_ngram_novelty,
        "lateness_audit": Q.events_lateness_audit,
        "welch_t": Q.events_welch_t,
        "cramers_v": Q.events_cramers_v,
    }


def _release_worker_workspaces(spark, cpus: int) -> None:
    """One task per Python worker: drop + madvise(DONTNEED) every
    process-cached numpy workspace (see runtime.drop_cached_workspaces)."""

    def _release(batches):
        import pandas as _p

        from spark_tsne_spark.runtime import drop_cached_workspaces

        n = drop_cached_workspaces()
        for b in batches:
            yield _p.DataFrame({"n": [n + len(b) * 0]})

    spark.range(cpus).repartition(cpus).mapInPandas(_release, "n long").count()


def _host_control(spark, cpus: int) -> dict:
    """Fixed-workload host-weather control (VERDICT r11 #7): two
    deterministic jobs whose cost is independent of the suite's code —
    a JVM-side shuffle (groupBy + window over 4M synthetic rows) and a
    Python-worker numpy GEMM (one 768^3 fp64 matmul per worker). Their
    wall times are recorded at suite START and END so round-over-round
    bench comparisons can be host-normalized without a same-code
    rerun (adjacent-run spreads up to 2.8x were measured on this host
    class — SCALE.md r11). Each job is timed min-of-2."""
    from pyspark.sql import Window as _W

    def _jvm_job() -> float:
        t0 = time.time()
        df = spark.range(4_000_000).select(
            (F.col("id") % 9973).alias("k"),
            (F.col("id") * 2654435761 % 1_000_003).alias("v"),
        )
        df.withColumn(
            "r", F.row_number().over(_W.partitionBy("k").orderBy("v"))
        ).where(F.col("r") <= 3).groupBy().agg(F.sum("v")).collect()
        return round(time.time() - t0, 3)

    def _gemm(batches):
        import numpy as _np
        import pandas as _p

        rng = _np.random.default_rng(7)
        a = rng.standard_normal((768, 768))
        s = float((a @ a).sum())
        for b in batches:
            yield _p.DataFrame({"s": [s + len(b) * 0.0]})

    def _py_job() -> float:
        t0 = time.time()
        spark.range(cpus).repartition(cpus).mapInPandas(
            _gemm, "s double"
        ).count()
        return round(time.time() - t0, 3)

    return {
        "jvm_shuffle_sec": min(_jvm_job(), _jvm_job()),
        "py_gemm_sec": min(_py_job(), _py_job()),
    }


def headline(total: float, sf: float, n_queries: int) -> dict:
    """The ONE machine-parsed JSON object bench.py prints as its last
    stdout line. Fixed-size by construction — never add a per-query
    field here (tests/test_bench_contract.py pins the serialized size
    against the driver's ~2000-byte tail capture)."""
    return {
        "metric": "total_sec",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": n_queries,
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from spark_tsne_spark.session import get_spark
    from spark_tsne_spark.shipping import ship_package

    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))

    # Warm the Python worker pool (one-time ~20s interpreter+imports
    # cost per worker) and the JVM's shuffle/codegen machinery (first
    # shuffle in a fresh JVM pays ~5s of JIT + infra init) so query
    # timings measure the queries, not process cold-start.
    ship_package(spark)
    import pandas as _pd
    from pyspark.sql import Window as _W

    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()

    # Warm each worker's allocator arena with a real numpy working set
    # (~100 MB touched per worker). On lazily-restored VMs, first-touch
    # of private anonymous pages is ~100x slower than steady-state —
    # without this, the first numpy-heavy query absorbs every worker's
    # page-restore cost into its timing.
    def _warm_arena(batches):
        import numpy as _np
        import pandas as _p

        for pdf in batches:
            a = _np.ones((1024, 1024 * 12), dtype=_np.float64)  # ~100 MB
            a += 1.0
            yield _p.DataFrame({"id": [int(a[0, 0]) + len(pdf)]})

    spark.range(int(cpus)).repartition(int(cpus)).mapInPandas(
        _warm_arena, "id long"
    ).count()
    warm = spark.range(100000).select(
        (F.col("id") % 97).alias("k"), F.col("id").alias("v")
    )
    warm.groupBy("k").agg(F.sum("v")).count()
    warm.join(F.broadcast(warm.limit(100)), "k").count()
    warm.withColumn(
        "r", F.row_number().over(_W.partitionBy("k").orderBy("v"))
    ).where(F.col("r") <= 2).count()
    # Touch every input table once (footer/schema read + OS page cache)
    # so per-query timings measure the queries, not first-scan I/O.
    from spark_tsne_spark.sources.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, t, sf_dir).count()

    # Warm the t-SNE distributed code paths at toy scale (untimed):
    # the first execution of the kNN-broadcast / calibration /
    # symmetrize / per-iteration-pass kernels pays one-time worker
    # imports, JVM codegen, and broadcast machinery — measured ~2
    # minutes of first-run-only cost at 50k rows on a freshly
    # restored VM, vs ~20 s steady-state.
    from spark_tsne_spark.api import bh_tsne

    warm_emb = load_table(spark, "embeddings", sf_dir).limit(2048).cache()
    warm_emb.count()
    bh_tsne(
        warm_emb, max_iterations=3, perplexity=10.0, seed=1,
        id_col="vec_id", features="embedding", local_threshold=0,
    )
    warm_emb.unpersist()
    # Pre-fault the kNN block pass's process-cached workspaces at the
    # REAL flagship matrix size (runtime.cached_shared_empty keys on
    # exact shape): 32 workers x 200 MB of first-touch zero-fill
    # otherwise lands inside the flagship's first timed run — measured
    # ~30 s of one-time cost on this VM's lazily-restored memory.
    n_flagship = load_table(spark, "embeddings", sf_dir).count() * FLAGSHIP_COPIES

    def _warm_knn_ws(batches):
        from spark_tsne_spark.operators.knn import knn_workspace_spec
        from spark_tsne_spark.runtime import cached_shared_empty

        # knn_workspace_spec is the SAME sizing the kernel itself uses
        # (fp32 candidate buffer above KNN_FP32_MIN_N, fp64 below):
        # cached_shared_empty keys on exact (name, shape, dtype), so
        # warming any other spec would be a silent no-op.
        name, shape, dt = knn_workspace_spec(n_flagship)
        for b in batches:
            d = cached_shared_empty(name, shape, dt)
            d[:] = 0
            yield b.iloc[:1]

    spark.range(int(cpus)).repartition(int(cpus)).mapInPandas(
        _warm_knn_ws, "id long"
    ).count()
    spark.catalog.clearCache()

    # Host-weather control at suite start (untimed w.r.t. queries);
    # the matching end-of-suite sample is taken after isolated_ab.
    host_control = {"start": _host_control(spark, int(cpus))}
    print(f"# host_control start: {host_control['start']}", flush=True)

    # Repeat-and-min: on this host class single-shot timings swing
    # 3-5x with VM page-restore, so each query runs `repeat` times and
    # the headline number is the min (the least-perturbed run); all
    # runs are reported under "runs" so variance stays visible. The
    # long-running distributed t-SNE gets fewer repeats — its stage
    # breakdown (under "stages") provides the attribution instead.
    repeat = int(os.environ.get("SPARK_GRAFT_BENCH_REPEAT", "3"))
    # The flagship gets FULL repeats and runs FIRST in the suite (see
    # the ordering below): BENCH_r09 recorded 46.6 s for an entry that
    # measured 19.1 s isolated the same day — both of min-of-2's
    # repeats landed in a late-suite bad window (position ~75 of 189,
    # after an hour of allocator/page-cache churn). Running it
    # directly after the warm-up makes repeat #1 a solo-equivalent
    # measurement, and 3 repeats + the per-run stage splits recorded
    # under "stage_runs" keep the artifact attributable even on a
    # host having bad weather.
    heavy_repeat = {"tsne_bh_distributed": 3}

    # Iteration aid: SPARK_GRAFT_BENCH_ONLY="a,b,c" times just those
    # entries (the recorded bench_detail.json is NOT overwritten on a
    # filtered run — partial numbers must never masquerade as a full
    # pass).
    only = {
        s for s in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if s
    }

    timings: dict[str, float] = {}
    all_runs: dict[str, list[float]] = {}
    stages: dict[str, dict] = {}
    stage_runs: dict[str, list] = {}
    qmap = bench_queries()
    # Flagship-first scheduling (see heavy_repeat note above): its
    # first repeat is then a solo-equivalent number recorded in the
    # same artifact as the suite, instead of whatever window position
    # ~75 of 189 happens to be in.
    ordered = ["tsne_bh_distributed"] + [
        n for n in qmap if n != "tsne_bh_distributed"
    ]
    qi = 0
    for name in ordered:
        fn = qmap[name]
        if only and name not in only:
            continue
        # Periodic driver GC (untimed): Spark's ContextCleaner only
        # reclaims finished broadcasts/shuffles when the DRIVER GC
        # collects their references, and a 100 GB mostly-empty heap
        # can go the whole 189-query session without one — the
        # accumulated block debris measurably degrades late-session
        # queries (the flagship's affinity stage ran 2x its isolated
        # time at position ~150 of the suite).
        qi += 1
        if qi % 10 == 1:
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
        reps = max(1, min(repeat, heavy_repeat.get(name, repeat)))
        runs: list[float] = []
        best_stage: dict | None = None
        for _ in range(reps):
            _STAGES.clear()
            t0 = time.time()
            df = fn(spark, sf_dir)
            n = df.count()  # exhaust the plan
            dt = round(time.time() - t0, 3)
            runs.append(dt)
            if _STAGES:
                stage_runs.setdefault(name, []).append(dict(_STAGES))
                if dt == min(runs):
                    best_stage = dict(_STAGES)
            # Queries are timed independently; drop persisted
            # intermediates so one run's cache doesn't pressure the
            # next one's memory.
            spark.catalog.clearCache()
        timings[name] = min(runs)
        all_runs[name] = runs
        if best_stage is not None:
            stages[name] = best_stage
        print(f"# {name}: min={timings[name]}s runs={runs} rows={n}", flush=True)
        if name == "tsne_bh_distributed":
            # Release the flagship's per-worker state (untimed): the
            # process-cached ~100 MB kNN workspaces stay resident in
            # all 32 Python workers otherwise, and BENCH r10 showed
            # the later numpy-heavy ANN family paying a 2× memory-
            # pressure tax for it (9.9 s in-suite vs 4.63 s isolated
            # for ann_ivf_pq_topk). madvise(DONTNEED) hands the pages
            # back; nothing downstream reuses the flagship's shapes.
            _release_worker_workspaces(spark, int(cpus))

    # In-suite-vs-isolated A/B (untimed suite-wise, recorded in the
    # artifact): re-run the r10 weak-evidence entries at the END of
    # the suite after a GC + cache clear. With the post-flagship
    # workspace release above, the end-of-suite number should sit
    # within ~1.3× of the in-suite min — this is the regression gate
    # for the measurement tax itself.
    iso: dict[str, list[float]] = {}
    if not only:
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        spark.catalog.clearCache()
        for name in ("ann_ivf_pq_topk", "ann_ivf_topk"):
            fn = qmap[name]
            runs = []
            for _ in range(3):
                _STAGES.clear()
                t0 = time.time()
                fn(spark, sf_dir).count()
                runs.append(round(time.time() - t0, 3))
                spark.catalog.clearCache()
            iso[name] = runs
            print(
                f"# isolated_ab {name}: min={min(runs)}s runs={runs} "
                f"(in-suite min={timings.get(name)})",
                flush=True,
            )

    host_control["end"] = _host_control(spark, int(cpus))
    print(f"# host_control end: {host_control['end']}", flush=True)

    total = round(sum(timings.values()), 3)
    # Evidence detail (per-query mins, per-run timings, stage
    # breakdowns) goes to earlier `#`-prefixed lines AND a side file;
    # the LAST stdout line carries ONLY the headline. The driver's
    # tail capture is ~2000 bytes: a per-query dict overflowed it
    # twice (BENCH_r04 at ~50 entries with runs+stages inline,
    # BENCH_r06 at ~90 entries even in "compact" form) and both
    # rounds shipped "parsed": null — so per-query timings are
    # banned from the last line entirely (guarded by
    # tests/test_bench_contract.py).
    detail = {
        "queries": timings,
        "runs": all_runs,
        "repeat": repeat,
        "stages": stages,
        "stage_runs": stage_runs,
        "isolated_ab": iso,
        "host_control": host_control,
        "sf": sf,
    }
    print("# detail: " + json.dumps(detail), flush=True)
    # Per-query signal for the perf channel (VERDICT r12 #6): a
    # dedicated compact stdout line BEFORE the headline (so a stdout
    # reader gets per-entry mins without bench_detail.json), plus the
    # side file flushed before the headline prints. The LAST line
    # stays the fixed-size headline — the driver's ~2000-byte tail
    # capture json-parses only the final line, and a per-query dict
    # there overflowed it twice (see tests/test_bench_contract.py).
    print(
        "# perquery: " + json.dumps(timings, separators=(",", ":")),
        flush=True,
    )
    if not only:
        try:
            with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "bench_detail.json"), "w") as f:
                json.dump(detail, f, indent=1)
                f.flush()
                os.fsync(f.fileno())
        except OSError:
            pass
    line = json.dumps(headline(total, sf, len(timings)))
    assert len(line.encode()) < 1500, len(line)
    print(line, flush=True)


if __name__ == "__main__":
    main()
