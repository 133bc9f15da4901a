"""Linearity check: do the dedup/text pipelines scale ~linearly in
corpus size? (VERDICT round-1 item 10 — catch any accidental
quadratic before a real cluster would.)

Runs the headline document operators at 1x (the sf0.1 documents
table) and 10x (10 deterministically mutated copies — each copy
prefixes a distinct token so copies are near- but not exact dups,
the adversarial case for candidate generation), and prints the
time ratio per operator. A bucketed plan should land well under
the 10x data ratio once per-job overhead is subtracted; a
quadratic one lands near 100x.

    python scripts/scale_check.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def ops():
    from spark_tsne_spark.functions.text import quality_score, winnow_fingerprints
    from spark_tsne_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
        simhash,
    )

    return {
        "exact_dedup": lambda d: exact_dedup(d),
        "minhash_lsh": lambda d: minhash_lsh_candidates(
            d.where(F.length("text") >= 5), num_hashes=16, band_size=4,
            hash_fn="xxhash64",
        ),
        "simhash": lambda d: simhash(d),
        "ngram_jaccard": lambda d: ngram_jaccard_pairs(
            d, n=3, min_jaccard=0.2, max_df=100
        ),
        "quality_score": lambda d: d.select(
            "doc_id", quality_score("text").alias("q")
        ),
        "winnow": lambda d: d.select(
            "doc_id", F.explode(winnow_fingerprints("text", 5, 4)).alias("fp")
        ),
        "triangles": _run_triangles,
        "term_pmi": _run_pmi,
        "seq_packing": _run_packing,
        "token_budget": _run_token_budget,
        "normalize": _run_normalize,
        "boilerplate_lines": _run_boilerplate,
        "bloom_incremental": _run_bloom,
        "fuzzy_ed2": _run_fuzzy,
        "allpairs_cosine": _run_allpairs,
        "temperature_mix": _run_temp_mix,
        "graph_communities": _run_lpa,
        "unigram_encode": _run_unigram_encode,
        "trigram_lm_ppl": _run_trigram_lm,
        "nb_classifier": _run_nb,
        "sorted_neighborhood": _run_sorted_neighborhood,
        "matched_sample": _run_matched_sample,
        "sketch_quantiles": _run_sketch_quantiles,
        "containment": _run_containment,
        "source_novelty": _run_novelty,
        "curation_funnel": _run_funnel,
        "bloom_semijoin": _run_bloom_semi,
        "k_anonymity": _run_kanon,
        "linkage_scores": _run_linkage,
        "negative_sampling": _run_negsample,
        "ngram_novelty": _run_ngram_novelty,
    }


def _run_ngram_novelty(d):
    from spark_tsne_spark.functions.text import word_ngrams

    grams = (
        d.select(
            "doc_id",
            F.explode_outer(F.array_distinct(word_ngrams("text", 3))).alias("g"),
        )
        .where(F.col("g").isNotNull())
        .distinct()
    )
    first = grams.groupBy("g").agg(F.min("doc_id").alias("fd"))
    per_doc = (
        grams.join(first, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("total_g"),
            F.sum(F.when(F.col("fd") == F.col("doc_id"), 1).otherwise(0)).alias(
                "novel_g"
            ),
        )
    )
    bounds = d.agg(F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"))
    return per_doc.crossJoin(F.broadcast(bounds)).groupBy(
        F.expr("CAST((doc_id - lo) * 10 DIV (hi - lo + 1) AS BIGINT)").alias(
            "decile"
        )
    ).agg(F.sum("total_g"), F.sum("novel_g"))


def _run_negsample(d):
    from spark_tsne_spark.operators.search import tokens

    tf_tbl = (
        d.select(F.explode(tokens("text")).alias("term"))
        .where(F.length("term") >= 1)
        .groupBy("term")
        .agg(F.count("*").alias("tf"))
    )
    wt = tf_tbl.withColumn(
        "w_micro",
        F.expr("CAST(round(pow(tf, 0.75) * 1000000.0, 0) AS BIGINT)"),
    )
    tot = wt.agg(F.sum("w_micro").alias("w_total"))
    return wt.orderBy(F.col("tf").desc(), "term").limit(200).crossJoin(
        F.broadcast(tot)
    )


def _run_kanon(d):
    from spark_tsne_spark.operators.privacy import k_anonymity_report

    dd = d.select(
        "source", (F.length("text") / 50).cast("long").alias("len_band")
    )
    return k_anonymity_report(dd, ["source", "len_band"], k=5)


def _run_linkage(d):
    from spark_tsne_spark.operators.linkage import (
        FieldRule,
        linkage_score_pairs,
    )

    # Block key co-scales with the corpus (doc_id div 64 — the 10x
    # copies occupy disjoint id ranges), so blocks stay ~64 rows and
    # the pair budget stays ~32n: the honest deployment contract
    # (blocking on a FIXED-cardinality key is the known quadratic).
    dd = d.select(
        "doc_id",
        F.expr("doc_id div 64").alias("blk"),
        F.length("text").alias("n_chars"),
        F.substring("text", 1, 12).alias("head"),
    )
    rules = [
        FieldRule("n_chars", lambda a, b: F.abs(a - b) <= 5, 4, -1),
        FieldRule("head", lambda a, b: a == b, 6, -2),
    ]
    return linkage_score_pairs(dd, "doc_id", ["blk"], rules, min_score=3)


def _run_funnel(d):
    from spark_tsne_spark.operators.sampling import curation_funnel

    # The harness corpus drops lang/n_chars — reattach deterministic
    # twins so every funnel stage has work to do.
    dd = d.withColumn(
        "lang",
        F.when(F.xxhash64("doc_id") % 3 == 0, "en").otherwise("xx"),
    ).withColumn("n_chars", F.length("text"))
    return curation_funnel(
        dd, len_lo=80, len_hi=400, lang="en", per_source_cap=200
    )


def _run_bloom_semi(d):
    from spark_tsne_spark.operators.joins import bloom_semijoin

    # Build side co-scales at 2% of the corpus; probe is the corpus.
    build = d.where(F.col("doc_id") % 50 == 0).select("doc_id")
    return bloom_semijoin(d, build, probe_key="doc_id", build_key="doc_id")


def _run_containment(d):
    from spark_tsne_spark.operators.dedup import ngram_containment_pairs

    return ngram_containment_pairs(
        d, n=3, min_containment=0.6, max_df=100
    )


def _run_novelty(d):
    from spark_tsne_spark.functions.text import word_ngrams

    grams = (
        d.select(
            "source",
            F.explode_outer(
                F.array_distinct(word_ngrams("text", 3))
            ).alias("g"),
        )
        .where(F.col("g").isNotNull())
        .distinct()
    )
    first = grams.groupBy("g").agg(F.min("source").alias("source"))
    novel = first.groupBy("source").agg(F.count("*").alias("novel"))
    totals = grams.groupBy("source").agg(F.count("*").alias("total"))
    return totals.join(novel, "source", "left")


def _run_sorted_neighborhood(d):
    from spark_tsne_spark.operators.dedup import sorted_neighborhood_pairs

    return sorted_neighborhood_pairs(d, window=8, max_hamming=3)


def _run_matched_sample(d):
    from spark_tsne_spark.operators.sampling import (
        distribution_matched_sample,
    )

    return distribution_matched_sample(
        d.withColumn("len", F.length("text")),
        ref_cond=F.col("source") == "src0",
        bin_expr=F.expr("len div 50"),
        key=F.col("text"),
        id_col="doc_id",
        salt="match1",
    )


def _run_sketch_quantiles(d):
    from spark_tsne_spark.operators.quantiles import (
        histogram_sketch_quantiles,
    )

    return histogram_sketch_quantiles(
        d.withColumn("len", F.length("text").cast("double")),
        value_col="len", group_col="source",
        qs_permille=[500, 900, 990], lo=0.0, hi=600.0, bins=200,
    )


def _run_triangles(d):
    from spark_tsne_spark.operators.dedup import minhash_lsh_candidates
    from spark_tsne_spark.operators.graph import triangle_counts

    pairs = minhash_lsh_candidates(
        d.where(F.length("text") >= 5), num_hashes=16, band_size=4,
        hash_fn="xxhash64", max_bucket=128,
    )
    return triangle_counts(pairs)


def _run_pmi(d):
    from spark_tsne_spark.operators.search import term_pmi_pairs

    return term_pmi_pairs(d)


def _run_normalize(d):
    from spark_tsne_spark.functions.text import normalize_text

    return d.select("doc_id", normalize_text("text").alias("t"))


def _run_boilerplate(d):
    from spark_tsne_spark.operators.dedup import remove_boilerplate_lines

    return remove_boilerplate_lines(d, max_df=2, min_chars=4)


def _run_bloom(d):
    from spark_tsne_spark.operators.dedup import bloom_incremental_flags

    return bloom_incremental_flags(
        d.where(F.col("doc_id") % 5 == 0), d.where(F.col("doc_id") % 5 != 0)
    )


def _run_fuzzy(d):
    from spark_tsne_spark.operators.dedup import fuzzy_prefix_pairs

    return fuzzy_prefix_pairs(d, max_edit=2, max_bucket=1000)


def _run_allpairs(d):
    from spark_tsne_spark.operators.search import allpairs_cosine_pairs

    return allpairs_cosine_pairs(d, threshold=0.9, max_bucket=1000)


def _run_temp_mix(d):
    from spark_tsne_spark.functions.text import token_count
    from spark_tsne_spark.operators.sampling import temperature_mix

    t = d.select("doc_id", "source", token_count("text").alias("nt"))
    return temperature_mix(
        t, key=F.col("doc_id").cast("string"), weight="nt",
        stratum="source", alpha=0.5, target_weight=100_000.0, salt="sc:",
    )


def _run_lpa(d):
    from spark_tsne_spark.operators.dedup import minhash_lsh_candidates
    from spark_tsne_spark.operators.graph import (
        label_propagation,
        symmetrize_edges,
    )

    pairs = minhash_lsh_candidates(
        d.where(F.length("text") >= 5), num_hashes=16, band_size=4,
        hash_fn="xxhash64", max_bucket=512,
    )
    return label_propagation(symmetrize_edges(pairs), num_iters=4)


_UNIGRAM_SC_MODEL: list = []


def _run_unigram_encode(d):
    # Train ONCE on the 1x corpus (the train-once/encode-many
    # contract); the linearity claim under test is the ENCODE pass.
    from spark_tsne_spark.operators.unigram import (
        train_unigram, unigram_encode_stats,
    )

    if not _UNIGRAM_SC_MODEL:
        _UNIGRAM_SC_MODEL.extend(
            train_unigram(d, vocab_size=120, max_words=30000)
        )
    return unigram_encode_stats(d, _UNIGRAM_SC_MODEL)


def _run_trigram_lm(d):
    from spark_tsne_spark.plans.queries import trigram_lm_ppl_from

    return trigram_lm_ppl_from(d.select("doc_id", "text"))


def _run_nb(d):
    from spark_tsne_spark.plans.queries import nb_classifier_from

    # The 10x mutated corpus drops the lang column in this harness —
    # reattach a deterministic pseudo-label so the model keys exist.
    lab = d.withColumn(
        "lang",
        F.when(F.xxhash64("doc_id") % 5 == 0, "en").otherwise("xx"),
    )
    return nb_classifier_from(lab.select("doc_id", "lang", "text"))


def _run_packing(d):
    from spark_tsne_spark.operators.packing import pack_sequences

    return pack_sequences(d, block_size=2048)


def _run_token_budget(d):
    # 10x the corpus with 10x the budget: the kept set scales with the
    # budget, the classification aggregate with sources x 256 buckets.
    from spark_tsne_spark.operators.packing import token_budget_sample

    n = d.count()
    per_source = 500 * max(1, n // 5000)
    budgets = {f"src{i}": per_source for i in range(20)}
    return token_budget_sample(d, budgets, salt="sc")


def main(sf_dir: str = "/root/testdata/sf0.1") -> None:
    from spark_tsne_spark.session import get_spark
    from spark_tsne_spark.shipping import ship_package
    from spark_tsne_spark.sources.tables import load_table

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("scale-check", master=f"local[{cpus}]",
                      shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    ship_package(spark)
    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        lambda it: (p for p in it), "id long"
    ).count()

    docs1 = load_table(spark, "documents", sf_dir).cache()
    n1 = docs1.count()
    copies = spark.range(10).select(F.col("id").alias("copy"))
    docs10 = (
        docs1.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
            F.concat(
                F.format_string("c%d ", F.col("copy")), F.col("text")
            ).alias("text"),
            "source",
        )
        .repartition(int(cpus))
        .cache()
    )
    n10 = docs10.count()
    print(f"corpora: {n1} and {n10} docs")

    # Events 10x: disjoint 31-day time shifts per copy (more days of
    # data, same density — the realistic growth axis; inflating
    # density instead would quadratically grow the range join's
    # OUTPUT by its semantics, which says nothing about the plan).
    ev1 = load_table(spark, "events", sf_dir).cache()
    ev1.count()
    ev10 = (
        ev1.crossJoin(copies)
        .select(
            (F.col("event_id") + F.col("copy") * 100_000_000).alias("event_id"),
            (
                F.col("ts") + F.make_interval(days=F.col("copy") * 31)
            ).alias("ts"),
            (F.col("user_id") + F.col("copy") * 1_000_000).alias("user_id"),
            "event_type",
            "value",
        )
        .repartition(int(cpus))
        .cache()
    )
    ev10.count()

    def ev_ops():
        from spark_tsne_spark.operators.timeseries import (
            asof_join,
            range_join_buckets,
        )

        def run_asof(ev):
            p = ev.where(F.col("event_type") == "purchase").select(
                "event_id", "user_id", "ts"
            )
            v = ev.where(F.col("event_type") == "view").select(
                "event_id", "user_id", "ts", "value"
            )
            return asof_join(
                p, v, by="user_id", ts="ts",
                right_cols=["event_id"], right_order="event_id",
            ).select("event_id", "user_id", "r_event_id")

        def run_range(ev):
            err = ev.where(F.col("event_type") == "error").select(
                F.col("event_id").alias("err_id"),
                F.col("ts").alias("err_ts"),
            )
            nbr = ev.select(
                F.col("event_id").alias("nbr_id"), F.col("ts").alias("nbr_ts")
            )
            return range_join_buckets(
                err, nbr, "err_ts", "nbr_ts", lower_s=-60.0, upper_s=60.0
            ).select("err_id", "nbr_id")

        def run_ewma(ev):
            from spark_tsne_spark.operators.timeseries import ewma_smooth

            return ewma_smooth(
                ev, by="user_id", ts="ts", value="value",
                tiebreak="event_id", window=16, alpha=0.2,
            )

        def run_nearest(ev):
            from spark_tsne_spark.operators.timeseries import nearest_join

            return nearest_join(
                ev.where(F.col("event_type") == "purchase").select(
                    "user_id", F.col("event_id").alias("purchase_id"), "ts"
                ),
                ev.where(F.col("event_type") == "click").select(
                    "user_id", F.col("event_id").alias("click_id"), "ts"
                ),
                by="user_id", left_id="purchase_id", left_ts="ts",
                right_id="click_id", right_ts="ts", tolerance_s=3600.0,
            )

        def run_km(ev):
            from spark_tsne_spark.operators.survival import km_curve

            t0 = ev.groupBy("user_id").agg(F.min("ts").alias("t0"))
            tp = (
                ev.where(F.col("event_type") == "purchase")
                .groupBy("user_id")
                .agg(F.min("ts").alias("tp"))
            )
            end = ev.agg(F.max("ts").alias("tend"))
            subj = (
                t0.join(tp, "user_id", "left")
                .crossJoin(F.broadcast(end))
                .select(
                    F.when(
                        F.col("tp").isNotNull(),
                        F.datediff("tp", "t0"),
                    )
                    .otherwise(F.datediff("tend", "t0"))
                    .cast("long")
                    .alias("t"),
                    F.when(F.col("tp").isNotNull(), 1)
                    .otherwise(0)
                    .alias("e"),
                )
            )
            return km_curve(subj)

        def run_hll(ev):
            from spark_tsne_spark.operators.sketches import (
                hll_estimate,
                hll_registers,
            )

            return hll_estimate(hll_registers(ev, "user_id", p=9), p=9)

        def run_holt(ev):
            from spark_tsne_spark.operators.timeseries import holt_linear

            c = ev.groupBy(
                "event_type",
                F.date_trunc("day", F.col("ts")).alias("day"),
            ).agg(F.count("*").cast("double").alias("y"))
            return holt_linear(c, "event_type", "day", "y", horizon=3)

        def run_kmv(ev):
            from spark_tsne_spark.operators.sketches import (
                kmv_pair_estimates,
                kmv_sketches,
            )

            return kmv_pair_estimates(
                kmv_sketches(ev, "event_type", "user_id", k=128), k=128
            )

        def run_overlap(ev):
            from pyspark.sql import Window as W

            from spark_tsne_spark.operators.timeseries import (
                interval_overlap_join,
            )

            w = W.partitionBy("user_id").orderBy("ts", "event_id")
            sess = (
                ev.withColumn(
                    "new_s",
                    F.when(
                        F.lag("ts").over(w).isNull()
                        | (
                            F.col("ts")
                            >= F.lag("ts").over(w)
                            + F.expr("INTERVAL 30 MINUTES")
                        ),
                        1,
                    ).otherwise(0),
                )
                .withColumn(
                    "sid",
                    F.sum("new_s").over(
                        w.rowsBetween(W.unboundedPreceding, 0)
                    ),
                )
                .groupBy("user_id", "sid")
                .agg(
                    F.min("ts").alias("s_start"),
                    (
                        F.max("ts") + F.expr("INTERVAL 1 MICROSECOND")
                    ).alias("s_end"),
                )
            )
            inc = (
                ev.where(F.col("event_type") == "error")
                .groupBy(F.date_trunc("hour", F.col("ts")).alias("i0"))
                .agg(F.count("*").alias("ne"))
                .where(F.col("ne") >= 6)
                .withColumn("i1", F.col("i0") + F.expr("INTERVAL 1 HOUR"))
            )
            return interval_overlap_join(
                sess, inc, "s_start", "s_end", "i0", "i1", bucket_s=3600.0
            )

        def run_mad(ev):
            from spark_tsne_spark.plans import queries as Q

            # same shape as the catalog entry, inlined over the
            # harness events (two sort windows + broadcast stats)
            from pyspark.sql import Window as W

            w1 = W.partitionBy("event_type").orderBy("value", "event_id")
            r = ev.where(F.col("value").isNotNull()).select(
                "event_type", "value", "event_id",
                F.row_number().over(w1).alias("rn"),
                F.count("*").over(
                    W.partitionBy("event_type")
                ).alias("n"),
            )
            med = r.groupBy("event_type").agg(
                F.max(
                    F.when(
                        F.col("rn") == F.expr("(n + 1) div 2"),
                        F.col("value"),
                    )
                ).alias("median")
            )
            d = r.join(F.broadcast(med), "event_type").withColumn(
                "dev", F.abs(F.col("value") - F.col("median"))
            )
            w2 = W.partitionBy("event_type").orderBy("dev", "event_id")
            dr = d.withColumn("rn2", F.row_number().over(w2))
            mad = dr.groupBy("event_type").agg(
                F.max(
                    F.when(
                        F.col("rn2") == F.expr("(n + 1) div 2"),
                        F.col("dev"),
                    )
                ).alias("mad")
            )
            return (
                d.join(F.broadcast(mad), "event_type")
                .where(F.col("dev") > 3.0 * F.col("mad"))
                .groupBy("event_type")
                .count()
            )

        def run_bootstrap(ev):
            # one-pass Poisson bootstrap: cost must track the scan,
            # not B (2xB conditional sums in a single aggregate)
            from spark_tsne_spark.plans.queries import (
                _BOOT_B,
                _BOOT_THRESHOLDS,
            )

            cents = F.round(F.col("value") * 100).cast("long")

            def w(b):
                h = F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(f"boot:{b}:"),
                                F.col("event_id").cast("string"),
                            )
                        ),
                        1,
                        13,
                    ),
                    16,
                    10,
                ).cast("long")
                e = F.lit(0)
                for t in _BOOT_THRESHOLDS:
                    e = e + F.when(h >= F.lit(t), 1).otherwise(0)
                return e.cast("long")

            base = ev.select(
                cents.alias("cents"),
                *[w(b).alias(f"w{b}") for b in range(_BOOT_B)],
            )
            aggs = []
            for b in range(_BOOT_B):
                aggs.append(
                    F.sum(F.col(f"w{b}") * F.col("cents")).alias(f"sv{b}")
                )
                aggs.append(F.sum(f"w{b}").alias(f"sw{b}"))
            return base.agg(*aggs)

        def _tsen_core(ev, cap):
            # r9: the gate is CODE now (queries.py::_tsen_gate), not
            # prose. Two points below: the production cap (2000 —
            # 10x days lands just at the cap, pairs bounded at 2M
            # forever after), and a low-cap variant where BOTH scales
            # exceed the cap, demonstrating the asymptote: pair work
            # becomes constant in |days| once the gate engages.
            from pyspark.sql import Window as W

            from spark_tsne_spark.plans.queries import _tsen_gate

            hc = ev.groupBy(
                F.date_trunc("hour", "ts").alias("hour_ts")
            ).agg(F.count("*").cast("long").alias("y"))
            idx = _tsen_gate(
                hc.select(
                    "y",
                    F.row_number()
                    .over(W.partitionBy(F.lit(1)).orderBy("hour_ts"))
                    .cast("long")
                    .alias("h"),
                ),
                cap=cap,
            )
            a = idx.select(F.col("h").alias("ha"), F.col("y").alias("ya"))
            b = idx.select(F.col("h").alias("hb"), F.col("y").alias("yb"))
            sl = a.join(b, F.col("hb") > F.col("ha")).select(
                (
                    (F.col("yb") - F.col("ya")).cast("double")
                    / (F.col("hb") - F.col("ha")).cast("double")
                ).alias("slope")
            )
            wg = W.partitionBy(F.lit(1))
            ws = W.partitionBy(F.lit(1)).orderBy("slope")
            return (
                sl.select(
                    "slope",
                    F.count("*").over(wg).alias("np"),
                    F.row_number().over(ws).alias("rk"),
                )
                .where(F.col("rk") == F.floor((F.col("np") + 1) / 2))
            )

        def run_theil_sen(ev):
            from spark_tsne_spark.plans.queries import TSEN_MAX_POINTS

            return _tsen_core(ev, TSEN_MAX_POINTS)

        def run_theil_sen_gated(ev):
            # cap low enough that 1x (720 h) AND 10x (7200 h) both
            # exceed it -> point counts 360 vs 480, pair work ~1.8x
            # for 10x days (vs 100x ungated). This is the asymptote
            # the production gate reaches past 2000 hours.
            return _tsen_core(ev, 500)

        def run_trigram_paths(ev):
            from pyspark.sql import Window as W

            w = W.partitionBy("user_id").orderBy("ts", "event_id")
            s = ev.select(
                "user_id",
                "event_type",
                F.lead("event_type", 1).over(w).alias("e2"),
                F.lead("event_type", 2).over(w).alias("e3"),
            ).where(F.col("e2").isNotNull() & F.col("e3").isNotNull())
            return s.groupBy(
                F.concat_ws(">", "event_type", "e2", "e3").alias("path")
            ).agg(
                F.count("*").alias("support"),
                F.countDistinct("user_id").alias("n_users"),
            )

        def run_decayed(ev):
            from pyspark.sql import Window as W

            mx = ev.agg(F.date_trunc("day", F.max("ts")).alias("today"))
            d = ev.crossJoin(F.broadcast(mx)).select(
                "event_type",
                "user_id",
                (
                    F.lit(1.0)
                    / F.expr(
                        "CAST(shiftleft(CAST(1 AS BIGINT), CAST(least("
                        "datediff(today, date_trunc('day', ts)), 50)"
                        " AS INT)) AS DOUBLE)"
                    )
                ).alias("w"),
            )
            s = d.groupBy("event_type", "user_id").agg(
                F.count("*").alias("n_events"), F.sum("w").alias("decayed")
            )
            w = W.partitionBy("event_type").orderBy(
                F.col("decayed").desc(), F.col("user_id").asc()
            )
            return s.withColumn("rank", F.row_number().over(w)).where(
                F.col("rank") <= 10
            )

        def run_anova(ev):
            v6 = F.round(F.col("value") * 1000000).cast("long")
            g = ev.groupBy("event_type").agg(
                F.count("*").alias("n"),
                F.sum(v6).alias("s_e6"),
                F.sum(
                    v6.cast("decimal(38,0)") * v6.cast("decimal(38,0)")
                ).alias("q_e12"),
            )
            term = F.struct(
                F.col("event_type").alias("t"),
                (
                    (F.col("s_e6") / 1e6) * (F.col("s_e6") / 1e6)
                    / F.col("n").cast("double")
                ).alias("v"),
            )
            return g.agg(
                F.aggregate(
                    F.sort_array(F.collect_list(term)),
                    F.lit(0.0),
                    lambda acc, x: acc + x["v"],
                ).alias("a"),
                F.sum("n"),
                F.sum("s_e6"),
                F.sum("q_e12"),
            )

        def run_lateness(ev):
            from pyspark.sql import Window as W

            w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(
                W.unboundedPreceding, W.currentRow
            )
            us = F.unix_micros(F.col("ts").cast("timestamp"))
            late = F.greatest(F.lit(0), F.max(us).over(w) - us).alias(
                "late_us"
            )
            return (
                ev.select("user_id", "event_id", "ts")
                .select(late)
                .groupBy((F.col("late_us") > 0).alias("late"))
                .agg(F.count("*"), F.max("late_us"))
            )

        return {
            "asof_join": run_asof,
            "range_join": run_range,
            "ewma": run_ewma,
            "nearest_join": run_nearest,
            "survival_km": run_km,
            "hll_distinct": run_hll,
            "holt_forecast": run_holt,
            "kmv_intersection": run_kmv,
            "incident_overlap": run_overlap,
            "anomaly_mad": run_mad,
            "bootstrap_ci": run_bootstrap,
            "theil_sen": run_theil_sen,
            "theil_sen_gated": run_theil_sen_gated,
            "trigram_paths": run_trigram_paths,
            "decayed_topk": run_decayed,
            "anova_f": run_anova,
            "lateness_audit": run_lateness,
        }

    # Iteration aid: SPARK_GRAFT_SCALE_ONLY="a,b" runs just those ops.
    only = {
        s for s in os.environ.get("SPARK_GRAFT_SCALE_ONLY", "").split(",") if s
    }

    results = {}
    for name, fn in ops().items():
        if only and name not in only:
            continue
        ts = []
        for d in (docs1, docs10):
            t0 = time.time()
            fn(d).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        results[name] = ts
        print(f"{name:16s} 1x={ts[0]:6.2f}s 10x={ts[1]:6.2f}s "
              f"ratio={ts[1] / ts[0]:5.1f}", flush=True)
    for name, fn in ev_ops().items():
        if only and name not in only:
            continue
        ts = []
        for d in (ev1, ev10):
            t0 = time.time()
            fn(d).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        results[name] = ts
        print(f"{name:16s} 1x={ts[0]:6.2f}s 10x={ts[1]:6.2f}s "
              f"ratio={ts[1] / ts[0]:5.1f}", flush=True)

    # Embeddings 10x: jittered copies (distinct vectors, same
    # distribution — k-means work scales with rows, not k).
    emb1 = load_table(spark, "embeddings", sf_dir).cache()
    emb1.count()
    emb10 = (
        emb1.crossJoin(copies)
        .select(
            (F.col("vec_id") + F.col("copy") * 10_000_000).alias("vec_id"),
            F.transform(
                F.col("embedding").cast("array<double>"),
                lambda x: x + F.col("copy").cast("double") * 1e-3,
            ).alias("embedding"),
        )
        .repartition(int(cpus))
        .cache()
    )
    emb10.count()

    from spark_tsne_spark.operators.clustering import kmeans_assign
    from spark_tsne_spark.operators.similarity import margin_mine

    def run_kmeans(d):
        return kmeans_assign(d, k=8, num_iters=3)

    def run_margin(d):
        # FIXED 20-query batch (only copy 0 holds vec_id < 40), the
        # mining contract; the candidate side is what scales.
        return margin_mine(
            d.where(F.col("vec_id") < 40), d, k=4, top_per_query=2
        )

    for name, fn in {"kmeans": run_kmeans,
                     "margin_mine": run_margin}.items():
        if only and name not in only:
            continue
        ts = []
        for d in (emb1, emb10):
            t0 = time.time()
            fn(d).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        results[name] = ts
        print(f"{name:16s} 1x={ts[0]:6.2f}s 10x={ts[1]:6.2f}s "
              f"ratio={ts[1] / ts[0]:5.1f}", flush=True)

    # Lineitem 10x: more ORDERS (disjoint orderkey ranges per copy),
    # same basket sizes — the real growth axis for market-basket
    # co-occurrence. Pair generation is sum(k_o choose 2), so linear
    # in order count; inflating basket size instead would grow the
    # OUTPUT quadratically by the operator's own semantics.
    li1 = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_partkey")
        .cache()
    )
    li1.count()
    li10 = (
        li1.crossJoin(copies)
        .select(
            (F.col("l_orderkey") + F.col("copy") * 1_000_000_000).alias(
                "l_orderkey"
            ),
            "l_partkey",
        )
        .repartition(int(cpus))
        .cache()
    )
    li10.count()

    def run_cooc(li):
        dl = li.distinct()
        tot = dl.select(F.countDistinct("l_orderkey").alias("n"))
        pc = dl.groupBy("l_partkey").agg(F.count("*").alias("n_ord"))
        a, b = dl.alias("a"), dl.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .groupBy(
                F.col("a.l_partkey").alias("p1"),
                F.col("b.l_partkey").alias("p2"),
            )
            .agg(F.count("*").alias("n_pair"))
            .where(F.col("n_pair") >= 2)
        )
        return (
            pairs.join(
                pc.withColumnRenamed("l_partkey", "p1").withColumnRenamed(
                    "n_ord", "n1"
                ),
                "p1",
            )
            .join(
                pc.withColumnRenamed("l_partkey", "p2").withColumnRenamed(
                    "n_ord", "n2"
                ),
                "p2",
            )
            .crossJoin(F.broadcast(tot))
            .select(
                "p1", "p2", "n_pair",
                (F.col("n_pair") * F.col("n") / (F.col("n1") * F.col("n2"))).alias("lift"),
            )
        )

    for name, pair in {"part_cooccurrence": (li1, li10)}.items():
        if only and name not in only:
            continue
        ts = []
        for d in pair:
            t0 = time.time()
            run_cooc(d).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        results[name] = ts
        print(f"{name:16s} 1x={ts[0]:6.2f}s 10x={ts[1]:6.2f}s "
              f"ratio={ts[1] / ts[0]:5.1f}", flush=True)

    # Q21-shaped sole-late-shipper: ONE per-order aggregate + join-back
    # replaces the EXISTS / NOT EXISTS self-join pair, so cost must be
    # linear in the ORDER count (the growth axis at 100 TB), not in
    # (lines per order)^2 as the literal correlated spelling would be.
    o = load_table(spark, "orders", sf_dir).where(
        F.col("o_orderstatus") == "F"
    )
    li_full = load_table(spark, "lineitem", sf_dir)
    j1 = (
        li_full.join(o, li_full["l_orderkey"] == o["o_orderkey"])
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
            ).alias("is_late"),
        )
        .cache()
    )
    j1.count()
    j10 = (
        j1.crossJoin(copies)
        .select(
            (F.col("l_orderkey") + F.col("copy") * 1_000_000_000).alias(
                "l_orderkey"
            ),
            "l_suppkey",
            "is_late",
        )
        .repartition(int(cpus))
        .cache()
    )
    j10.count()

    def run_q21(j):
        per_pair = j.groupBy("l_orderkey", "l_suppkey").agg(
            F.max("is_late").alias("any_late")
        )
        stats = per_pair.groupBy(F.col("l_orderkey").alias("st_key")).agg(
            F.count("*").alias("n_supp"),
            F.sum(F.col("any_late").cast("long")).alias("n_late"),
        )
        return (
            j.where("is_late")
            .join(stats, F.col("l_orderkey") == F.col("st_key"))
            .where((F.col("n_supp") >= 2) & (F.col("n_late") == 1))
            .groupBy("l_suppkey")
            .agg(F.count("*").alias("numwait"))
        )

    for name, pair in {"q21_sole_late": (j1, j10)}.items():
        if only and name not in only:
            continue
        ts = []
        for d in pair:
            t0 = time.time()
            run_q21(d).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        results[name] = ts
        print(f"{name:16s} 1x={ts[0]:6.2f}s 10x={ts[1]:6.2f}s "
              f"ratio={ts[1] / ts[0]:5.1f}", flush=True)

    # Q2-shaped groupwise-min join-back and Q16-shaped single-column
    # countDistinct: both must be linear in the FACT row count because
    # the map-side partial agg collapses duplicate (part, supplier)
    # keys before the shuffle — the pair table (and everything after
    # it) is key-domain-sized, not fact-sized. 10x fact rows over the
    # SAME key domain is exactly the case that exposes a missing
    # partial agg (the shuffle would grow 10x too).
    s1 = (
        li_full.select(
            "l_partkey",
            "l_suppkey",
            F.round(
                F.col("l_extendedprice") * 100 / F.col("l_quantity")
            )
            .cast("long")
            .alias("unit_cents"),
        )
        .cache()
    )
    s1.count()
    s10 = (
        s1.crossJoin(copies)
        .drop("copy")
        .repartition(int(cpus))
        .cache()
    )
    s10.count()

    def run_q2(d):
        supply = d.groupBy("l_partkey", "l_suppkey").agg(
            F.min("unit_cents").alias("ps_unit_cents")
        )
        best = supply.groupBy(F.col("l_partkey").alias("b_key")).agg(
            F.min("ps_unit_cents").alias("min_cents")
        )
        return supply.join(
            best,
            (F.col("l_partkey") == F.col("b_key"))
            & (F.col("ps_unit_cents") == F.col("min_cents")),
        )

    def run_q16(d):
        return d.groupBy("l_partkey").agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt")
        )

    def run_robust(d):
        # robust-scale shape: one sort window per group + broadcast
        # back (grp from suppkey to keep cardinality fixed at 10x —
        # a fixed group count with 10x members is the stress case
        # for the per-group sort).
        from pyspark.sql import Window as W

        w = W.partitionBy(F.col("l_suppkey") % 4).orderBy(
            "unit_cents", "l_partkey"
        )
        r = d.select(
            (F.col("l_suppkey") % 4).alias("grp"),
            F.col("unit_cents").alias("v"),
            F.row_number().over(w).alias("rn"),
            F.count("*").over(
                W.partitionBy(F.col("l_suppkey") % 4)
            ).alias("n"),
        )
        qs = r.groupBy("grp").agg(
            F.max(
                F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("v"))
            ).alias("median"),
            F.max(
                F.when(F.col("rn") == F.expr("(n + 3) div 4"), F.col("v"))
            ).alias("q1"),
            F.max(
                F.when(F.col("rn") == F.expr("(3 * n + 3) div 4"), F.col("v"))
            ).alias("q3"),
        )
        return r.join(F.broadcast(qs), "grp").where(
            F.abs(F.col("v") - F.col("median"))
            > 3 * (F.col("q3") - F.col("q1"))
        ).groupBy("grp").count()

    for name, fn in {"q2_min_join_back": run_q2,
                     "q16_count_distinct": run_q16,
                     "robust_scale": run_robust}.items():
        if only and name not in only:
            continue
        ts = []
        for d in (s1, s10):
            t0 = time.time()
            fn(d).write.format("noop").mode("overwrite").save()
            ts.append(time.time() - t0)
        results[name] = ts
        print(f"{name:16s} 1x={ts[0]:6.2f}s 10x={ts[1]:6.2f}s "
              f"ratio={ts[1] / ts[0]:5.1f}", flush=True)

    if not results:
        return
    worst = max(v[1] / v[0] for v in results.values())
    print(f"worst ratio: {worst:.1f} (10x data; linear => ~10, "
          f"quadratic => ~100)")


if __name__ == "__main__":
    main(*sys.argv[1:])
