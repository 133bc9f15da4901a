"""Bench <-> catalog coverage manifest (round-9 VERDICT task 4).

The correctness catalog (plans/queries.py, 264 entries) and the bench
suite (bench.py, 181 entries) are independently named — the bench is
intentionally full-width where the oracle variants subset — but until
this module nothing documented WHICH catalog entries are deliberately
un-benched and why, so the 2x perf gate's surface wasn't auditable.

Three disjoint buckets cover every catalog entry exactly once:

1. identity-benched — the bench callable IS the registered catalog
   fn (derived by function identity, never by name, so a rename
   can't silently break the mapping);
2. variant-benched — the bench entry wraps the same operator with
   full-width / capped / composite parameters (``BENCH_VARIANT_OF``,
   hand-curated: bench name -> the catalog entry it represents);
3. not benched — ``NOT_BENCHED`` maps the entry to an explicit
   reason (reference-parity micro-stage subsumed by the flagship,
   decode stub where timing would measure the fake codec, plan shape
   already represented by a benched twin, ...).

``python -m spark_tsne_spark.plans.bench_manifest`` regenerates the
committed ``BENCH_MANIFEST.md``; tests/test_bench_manifest.py asserts
(a) the three buckets partition the catalog with nothing unmapped,
(b) no stale rows (every variant source exists in the bench, every
NOT_BENCHED key is genuinely un-benched), and (c) the committed
markdown matches regeneration.
"""

from __future__ import annotations

#: bench entry -> the catalog entry whose operator it times under
#: bench-grade (full-width / capped / composite) parameters.
BENCH_VARIANT_OF: dict[str, str] = {
    # dedup family: bench runs the operators at full corpus width
    # (plus the mega-clique cap on minhash); the catalog variants
    # subset so the DuckDB oracle can replay every pair.
    "dedup_exact": "dedup_exact",
    "dedup_clusters": "dedup_clusters",
    "dedup_minhash_lsh": "dedup_minhash_lsh",
    "dedup_simhash": "dedup_simhash",
    "dedup_ngram_jaccard": "dedup_ngram_jaccard",
    "dedup_containment": "dedup_containment",
    "dedup_semantic": "semdedup_prune",
    "dedup_graph_rank": "dedup_graph_pagerank",
    "graph_communities": "dedup_graph_communities",
    "dedup_graph_triangles": "dedup_graph_triangles",
    # text / packing: full-width operator calls.
    "term_pmi": "term_pmi",
    "tfidf_top_terms": "tfidf_top_terms",
    "seq_packing": "seq_packing",
    "token_budget_mix": "corpus_token_budget",
    "temperature_mix": "corpus_temperature_mix",
    "fuzzy_prefix_ed2": "fuzzy_prefix_pairs_ed2",
    # ANN / kNN: bench sizes k and the query batch for sf0.1.
    "knn_exact_block": "x6_knn_topk",
    "knn_lsh_banded": "knn_lsh_banded_approx",
    "knn_lsh_banded_mp": "knn_lsh_banded_multiprobe",
    "ann_topk_cosine": "ann_topk_cosine",
    "ann_ivf_topk": "ann_ivf_topk",
    "ann_ivf_pq_topk": "ann_ivf_pq_topk",
    "ann_ivf_index_query": "ann_ivf_index_query",
    "allpairs_cosine": "allpairs_cosine",
    # tokenizers: train/encode split into separate timed stages.
    "bpe_train": "bpe_vocab",
    "bpe_encode": "bpe_encode_stats",
    "unigram_train": "unigram_vocab",
    "unigram_encode": "unigram_encode_stats",
    # t-SNE: the catalog entry checks the sf0.001 golden; the bench
    # times the 20-iteration local path and the 50k-row distributed
    # flagship (the 100 TB shape) on the same API.
    "tsne_bh_20iter": "tsne_embedding",
    "tsne_bh_distributed": "tsne_embedding",
}

_TSNE_STAGE = (
    "reference-parity micro-stage of the t-SNE pipeline; the flagship "
    "tsne_bh_distributed times the fused production path that "
    "subsumes it"
)
_DECODE_STUB = (
    "deterministic decode stub (container has no codec libs) — timing "
    "would measure the fake codec, not the Spark plumbing; "
    "multimodal_jpeg is the benched representative of the family"
)
_STREAM_HARNESS = (
    "micro-batch streaming harness — wall is trigger/listener "
    "latency, not plan cost; its batch twin (or the benched "
    "streaming_sessionize / streaming_cusum / streaming_decayed_topk "
    "representatives) carries the perf signal"
)
_CHEAP_TWIN = "scan->agg/window plan shape already timed by benched twin: "
_DIAGNOSTIC = "bounded diagnostic companion of benched entry: "
_SAMPLER = (
    "one-scan deterministic hash sampler — IO-bound at every sf; "
    "corpus_curation (benched) includes the same filter+sample shape"
)

#: catalog entry -> why it is deliberately not in the bench suite.
NOT_BENCHED: dict[str, str] = {
    # --- t-SNE / X2P reference-parity stages -------------------------
    "x1_row_norms": _TSNE_STAGE,
    "x2p_affinities": _TSNE_STAGE,
    "x3_x5_pairwise_sqdist": _TSNE_STAGE + " (quarantined O(n^2) oracle)",
    "y1_symmetrize": _TSNE_STAGE,
    "p1_global_stats": _TSNE_STAGE,
    "p2_standardize": _TSNE_STAGE,
    "p3_pca_project": _TSNE_STAGE,
    "s1_csv_source": (
        "gzip-CSV parity scan — wall is single-threaded gunzip, "
        "already represented by the orc/jsonl roundtrips"
    ),
    "s2_s3_limit_sort": _CHEAP_TWIN + "q3_top_orders (global sort+limit)",
    "knn_lsh_approx": _DIAGNOSTIC + "ann_ivf_topk (bucketed ANN path)",
    # --- TPC-H twins of benched plan shapes --------------------------
    "q4_priority_exists": _CHEAP_TWIN + "q21_waiting_supplier (exists/semijoin)",
    "q7_volume_shipping": _CHEAP_TWIN + "q8_market_share (multi-join agg)",
    "q10_returned_items": _CHEAP_TWIN + "q3_top_orders (join+agg+topk)",
    "q12_late_shipments": _CHEAP_TWIN + "q1_pricing_summary (scan agg)",
    "q14_promo_revenue": _CHEAP_TWIN + "q6_revenue_delta (filtered scan agg)",
    "q15_top_supplier": _CHEAP_TWIN + "q2_min_cost_supplier (agg+argmax join)",
    "q19_disjunctive": _CHEAP_TWIN + "q6_revenue_delta (predicate-heavy scan)",
    "q22_dormant_customers": _CHEAP_TWIN + "q16_part_supplier_counts (anti-join agg)",
    "customers_without_orders": _CHEAP_TWIN + "q22 shape (left-anti join)",
    "orders_deciles": _CHEAP_TWIN + "orders_exact_quantiles",
    "orders_percentiles": _CHEAP_TWIN + "orders_exact_quantiles",
    "orders_price_bands": _CHEAP_TWIN + "q1_pricing_summary (bucketed agg)",
    "incremental_agg_merge": _CHEAP_TWIN + "q1_pricing_summary (partial-agg merge)",
    # --- events twins -------------------------------------------------
    "events_distinct_users": _CHEAP_TWIN + "dau_wau (distinct agg)",
    "approx_distinct_users": _CHEAP_TWIN + "hll_distinct (sketch distinct)",
    "events_gapfill_interp": _CHEAP_TWIN + "events_gapfill_locf (same gapfill scaffold)",
    "events_interarrival": _CHEAP_TWIN + "events_ewma (per-user lag window)",
    "events_json_extract": _CHEAP_TWIN + "events_value_histogram (scan+project)",
    "events_pivot": _CHEAP_TWIN + "events_tumbling_agg (pivoted agg)",
    "events_rate_limit": _CHEAP_TWIN + "events_sessionize (per-user window scan)",
    "events_salted_join": _CHEAP_TWIN + "events_nearest_join (skew-join demo)",
    "events_session_transcripts": _CHEAP_TWIN + "events_sessionize (collect_list finisher)",
    "events_trailing_window": _CHEAP_TWIN + "events_hopping_agg (range frame)",
    "events_trending_topk": _CHEAP_TWIN + "decayed_topk (windowed rank)",
    # --- bounded diagnostics / eval companions ------------------------
    "ann_hard_negatives": _DIAGNOSTIC + "ann_topk_cosine",
    "centroid_similarity": _DIAGNOSTIC + "embedding_kmeans",
    "embedding_centroids": _DIAGNOSTIC + "embedding_kmeans",
    "embedding_kmeans_inertia": _DIAGNOSTIC + "embedding_kmeans",
    "embedding_outliers": _DIAGNOSTIC + "embedding_kmeans",
    "cluster_topics": _DIAGNOSTIC + "embedding_kmeans + tfidf_top_terms",
    "classifier_calibration": _DIAGNOSTIC + "classifier_auc",
    "dedup_minhash_estimate": _DIAGNOSTIC + "dedup_minhash_lsh",
    "dedup_simhash_near": _DIAGNOSTIC + "dedup_simhash",
    "dedup_keep_canonical": _DIAGNOSTIC + "dedup_clusters",
    "dedup_report": _DIAGNOSTIC + "dedup_exact/dedup_clusters",
    "dedup_embedding_cosine": _DIAGNOSTIC + "dedup_semantic (same cosine kernel)",
    "dedup_incremental_exact": _DIAGNOSTIC + "dedup_bloom_incremental",
    "dedup_incremental_minhash": _DIAGNOSTIC + "dedup_minhash_lsh",
    "contamination_check": _DIAGNOSTIC + "source_overlap (shingle-join decontamination)",
    "semantic_contamination": _DIAGNOSTIC + "dedup_semantic",
    "corpus_snapshot_diff": _DIAGNOSTIC + "corpus_upsert (same MERGE scaffold)",
    "table_profile": "bounded per-column profile — one cheap agg row per column",
    "key_skew_profile": "bounded skew diagnostic — one agg over group sizes",
    "quality_gate_per_source": _DIAGNOSTIC + "text_quality_score",
    "doc_length_histogram": _CHEAP_TWIN + "events_value_histogram (width_bucket agg)",
    "vocab_top_terms": _CHEAP_TWIN + "tfidf_top_terms (same explode+agg scaffold)",
    "source_percent_rank": _CHEAP_TWIN + "window_top_orders (rank window)",
    "bpe_token_histogram": _DIAGNOSTIC + "bpe_encode",
    "bpe_word_histogram": _DIAGNOSTIC + "bpe_train (its pre-tokenization pass)",
    "unigram_token_histogram": _DIAGNOSTIC + "unigram_encode",
    # --- deterministic samplers ---------------------------------------
    "corpus_hash_sample": _SAMPLER,
    "corpus_stratified_sample": _SAMPLER,
    "corpus_weighted_sample": _SAMPLER,
    # --- multimodal decode stubs --------------------------------------
    "audio_features": _DECODE_STUB,
    "audio_adpcm_features": _DECODE_STUB,
    "audio_ulaw_features": _DECODE_STUB,
    "multimodal_png": _DECODE_STUB,
    "multimodal_resize": _DECODE_STUB,
    "multimodal_features": _DECODE_STUB,
    "video_frame_sample": _DECODE_STUB,
    # --- streaming harnesses ------------------------------------------
    "streaming_enrich_join": _STREAM_HARNESS,
    "streaming_incremental_dedup": _STREAM_HARNESS,
    "streaming_interval_join": _STREAM_HARNESS,
    "streaming_token_budget": _STREAM_HARNESS,
    "streaming_windowed_counts": _STREAM_HARNESS,
    # --- text micro-expressions ---------------------------------------
    "text_fingerprint": _CHEAP_TWIN + "text_winnow (rolling-hash scan)",
    "text_lang_id": _CHEAP_TWIN + "lang_id_join (the measured join form)",
    "text_oov_rate": _DIAGNOSTIC + "unigram_encode",
    "text_pii_scrub": _CHEAP_TWIN + "text_normalize (regex scan pass)",
    "text_repetition_scores": _CHEAP_TWIN + "text_quality_score (per-doc expression fold)",
    "text_token_counts": _CHEAP_TWIN + "text_quality_score",
    "doc_chunks": _CHEAP_TWIN + "text_normalize (split+explode scan)",
    "doc_sentences": _CHEAP_TWIN + "text_normalize (split+explode scan)",
    "partitioned_prune_roundtrip": (
        "partition-pruning correctness roundtrip — wall is tiny-file "
        "IO at test sf; the pruned-scan plan shape is asserted in "
        "tests, not timed"
    ),
}


def buckets():
    """Return (identity, variants, not_benched) where identity maps
    bench name -> catalog name derived by FUNCTION IDENTITY against
    the registry. Imports bench lazily (no Spark session needed)."""
    import bench as _bench

    from spark_tsne_spark.plans.queries import _REGISTRY

    fn2cat = {q.fn: n for n, q in _REGISTRY.items()}
    bq = _bench.bench_queries()
    identity = {
        bn: fn2cat[fn] for bn, fn in bq.items() if fn in fn2cat
    }
    return identity, dict(BENCH_VARIANT_OF), dict(NOT_BENCHED)


def render() -> str:
    """Render BENCH_MANIFEST.md: one row per catalog entry."""
    from spark_tsne_spark.plans.queries import _REGISTRY

    identity, variants, nb = buckets()
    cat2bench: dict[str, list[tuple[str, str]]] = {}
    for bn, cn in identity.items():
        cat2bench.setdefault(cn, []).append((bn, "identity"))
    for bn, cn in variants.items():
        if bn in identity:
            continue
        cat2bench.setdefault(cn, []).append((bn, "variant"))
    lines = [
        "# Bench <-> catalog coverage manifest",
        "",
        "Generated by `python -m spark_tsne_spark.plans.bench_manifest`;",
        "tests/test_bench_manifest.py asserts the three buckets partition",
        "the catalog and that this file matches regeneration.",
        "",
        "Per-query timings: `bench.py`'s LAST stdout line is the",
        "fixed-size headline (total only — a per-query dict overflowed",
        "the driver's ~2000-byte tail capture twice; see",
        "tests/test_bench_contract.py). The per-query breakdown is the",
        "`# perquery: {...}` stdout line printed immediately before the",
        "headline, and `bench_detail.json` (flushed+fsynced before the",
        "headline prints) — per-entry mins, all runs, stage breakdowns,",
        "isolated A/Bs and the fixed-workload host controls.",
        "",
        f"- catalog entries: {len(_REGISTRY)}",
        f"- benched via identity (bench callable IS the catalog fn): "
        f"{len(set(identity.values()))}",
        f"- benched via a declared variant: "
        f"{len({c for c in variants.values() if c not in set(identity.values())})}",
        f"- deliberately not benched: {len(nb)}",
        "",
        "| catalog entry | bench entry | how / why not |",
        "|---|---|---|",
    ]
    for cn in sorted(_REGISTRY):
        if cn in cat2bench:
            for bn, how in sorted(cat2bench[cn]):
                lines.append(f"| {cn} | {bn} | {how} |")
        else:
            lines.append(f"| {cn} | — | not benched: {nb[cn]} |")
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    print(render(), end="")
