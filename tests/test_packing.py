"""Sequence packing + token-budget mixing (operators/packing.py)."""

import pytest
from pyspark.sql import Window, functions as F

from spark_tsne_spark.functions.text import bpe_ish_token_count
from spark_tsne_spark.operators.packing import (
    exclusive_prefix_sum,
    pack_sequences,
    token_budget_sample,
)
from spark_tsne_spark.operators.sampling import hash_bucket

BLOCK = 128


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    # Unpersist on module teardown: a lingering cached `documents`
    # relation would substitute into LATER tests' plans (cached
    # full-schema InMemoryRelation instead of a pruned parquet scan)
    # and break the plan-shape assertions in test_plans.py.
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    df.count()
    yield df
    df.unpersist()


def test_prefix_sum_matches_local_cumsum(spark):
    rows = [(i, (i * 37) % 11 + 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, v long")
    out = {
        r["k"]: r["offset"]
        for r in exclusive_prefix_sum(df, "k", "v", num_partitions=7).collect()
    }
    acc = 0
    for k, v in rows:  # already in k order
        assert out[k] == acc, k
        acc += v


def test_prefix_sum_partition_invariant(spark):
    rows = [(i, i % 5 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long")
    a = exclusive_prefix_sum(df, "k", "v", num_partitions=3).collect()
    b = exclusive_prefix_sum(
        df.repartition(13), "k", "v", num_partitions=8
    ).collect()
    assert sorted((r["k"], r["offset"]) for r in a) == sorted(
        (r["k"], r["offset"]) for r in b
    )


def test_prefix_sum_property_fuzz(spark):
    """Property fuzz of the two-phase distributed prefix scan (it
    underpins packing AND mixing): randomized value distributions,
    input orderings, pre-shuffles, and output partition counts must
    all reproduce the single-partition cumulative sum exactly — this
    locks the TaskContext partition-id/range-partition-order
    assumption against every layout the planner might pick."""
    import random

    rng = random.Random(0xC0FFEE)
    for trial in range(8):
        n = rng.randint(1, 400)
        keys = rng.sample(range(10_000), n)
        rows = [(k, rng.randint(0, 50)) for k in keys]
        shuffled = rows[:]
        rng.shuffle(shuffled)
        df = spark.createDataFrame(shuffled, "k long, v long")
        if rng.random() < 0.5:
            df = df.repartition(rng.randint(1, 17))
        p = rng.randint(1, 40)  # may exceed n: empty partitions
        out = {
            r["k"]: r["offset"]
            for r in exclusive_prefix_sum(df, "k", "v", num_partitions=p).collect()
        }
        acc = 0
        for k, v in sorted(rows):
            assert out[k] == acc, (trial, n, p, k)
            acc += v
        assert len(out) == n, (trial, n, p)


def test_pack_covers_every_token_exactly_once(spark, docs):
    packed = pack_sequences(docs, block_size=BLOCK).cache()
    n_tok = docs.select(
        F.col("doc_id"), bpe_ish_token_count("text").cast("long").alias("n")
    ).where(F.col("n") > 0)

    # per-document: the spans add back up to the doc's token count
    per_doc = packed.groupBy("doc_id").agg(
        F.sum("seg_len").alias("s"), F.first("n_tok").alias("n_tok")
    )
    assert per_doc.where(F.col("s") != F.col("n_tok")).count() == 0
    assert per_doc.count() == n_tok.count()

    # per-block: exactly BLOCK tokens except the final block
    per_block = packed.groupBy("block").agg(F.sum("seg_len").alias("s"))
    last = per_block.agg(F.max("block")).collect()[0][0]
    assert per_block.where(
        (F.col("block") != last) & (F.col("s") != BLOCK)
    ).count() == 0
    total = n_tok.agg(F.sum("n")).collect()[0][0]
    assert packed.agg(F.sum("seg_len")).collect()[0][0] == total

    # spans stay inside their block
    bad = packed.where(
        (F.col("block_off") < 0)
        | (F.col("block_off") >= BLOCK)
        | (F.col("seg_len") <= 0)
        | (F.col("block_off") + F.col("seg_len") > BLOCK)
    )
    assert bad.count() == 0
    packed.unpersist()


def test_pack_block_size_validation(spark, docs):
    with pytest.raises(ValueError):
        pack_sequences(docs, block_size=0)


def test_token_budget_matches_naive_window(spark, docs):
    budgets = {"src0": 150, "src1": 90, "src2": 40}
    got = token_budget_sample(docs, budgets, salt="t1").collect()

    # naive semantics: per-source cumsum over hash order, inclusive <= budget
    h = hash_bucket("text", "t1")
    d = docs.select(
        "doc_id",
        F.col("source").alias("stratum"),
        bpe_ish_token_count("text").cast("long").alias("n_tok"),
        h.alias("h"),
    ).where(F.col("stratum").isin(*budgets))
    w = Window.partitionBy("stratum").orderBy(F.col("h").asc(), F.col("doc_id").asc())
    naive = (
        d.withColumn("cum", F.sum("n_tok").over(w))
        .where(
            F.col("cum")
            <= F.when(F.col("stratum") == "src0", 150)
            .when(F.col("stratum") == "src1", 90)
            .otherwise(40)
        )
        .select("doc_id", "stratum", "n_tok", "cum")
        .collect()
    )
    key = lambda r: (r["stratum"], r["doc_id"], r["n_tok"], r["cum"])
    assert sorted(map(key, got)) == sorted(map(key, naive))


def test_token_budget_is_maximal_and_within_budget(spark, docs):
    budgets = {"src3": 200}
    kept = token_budget_sample(docs, budgets, salt="t2").collect()
    total = sum(r["n_tok"] for r in kept)
    assert total <= 200
    assert all(r["cum"] <= 200 for r in kept)

    # maximality: the first unkept doc in hash order would blow the budget
    h = hash_bucket("text", "t2")
    all_rows = (
        docs.where(F.col("source") == "src3")
        .select(
            "doc_id",
            bpe_ish_token_count("text").cast("long").alias("n_tok"),
            h.alias("h"),
        )
        .orderBy("h", "doc_id")
        .collect()
    )
    kept_ids = {r["doc_id"] for r in kept}
    for r in all_rows:
        if r["doc_id"] not in kept_ids:
            assert total + r["n_tok"] > 200
            break


def test_token_budget_partition_invariant(spark, docs):
    budgets = {"src4": 120, "src5": 300}
    a = token_budget_sample(docs, budgets, salt="t3").collect()
    b = token_budget_sample(docs.repartition(17), budgets, salt="t3").collect()
    key = lambda r: (r["stratum"], r["doc_id"], r["cum"])
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_token_budget_rejects_negative(spark, docs):
    with pytest.raises(ValueError):
        token_budget_sample(docs, {"src0": -1})


def test_tfidf_and_vocab_basic(spark):
    from spark_tsne_spark.operators.search import tfidf_top_terms, vocab_top_terms

    df = spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "banana cherry cherry"),
            (3, "apple durian"),
        ],
        "doc_id long, text string",
    )
    top = tfidf_top_terms(df, top=2).collect()
    by_doc = {}
    for r in top:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: apple tf=2 in 2/3 docs beats cherry tf=1 in 2/3 docs;
    # banana (tf=1, df=2) ties cherry (tf=1, df=2) -> term asc
    d1 = sorted(by_doc[1], key=lambda r: r["rank"])
    assert d1[0]["term"] == "apple" and d1[0]["tf"] == 2
    assert d1[1]["term"] == "banana"
    # doc 3: durian df=1 has the highest idf
    d3 = sorted(by_doc[3], key=lambda r: r["rank"])
    assert d3[0]["term"] == "durian"

    vocab = vocab_top_terms(df, k=2).collect()
    assert [r["term"] for r in sorted(vocab, key=lambda r: r["rank"])] == [
        "apple",
        "cherry",
    ]  # apple and cherry both df=2 tf=3; banana df=2 tf=2 -> term asc picks apple, cherry


def test_chunk_documents_covers_and_overlaps(spark, docs):
    from spark_tsne_spark.operators.packing import chunk_documents
    from spark_tsne_spark.functions.text import tokens

    W, S = 16, 12
    chunks = chunk_documents(docs, width=W, stride=S).cache()
    base = docs.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("n")
    )
    # chunk count formula, one row per doc
    per_doc = chunks.groupBy("doc_id").agg(
        F.count("*").alias("c"), F.max("chunk_off").alias("last_off")
    ).join(base, "doc_id")
    import math

    for r in per_doc.collect():
        want = 1 if r["n"] <= W else math.ceil((r["n"] - W) / S) + 1
        assert r["c"] == want, (r["doc_id"], r["n"], r["c"], want)
        # the final chunk reaches the end of the document
        assert r["last_off"] + W >= r["n"]

    # chunk text is exactly the token slice
    sample = (
        chunks.join(docs.select("doc_id", "text"), "doc_id")
        .where(F.col("doc_id") < 20)
        .collect()
    )
    for r in sample:
        toks = r["text"].split()
        off = r["chunk_off"]
        assert r["chunk_text"] == " ".join(toks[off : off + W])
        assert r["n_chunk_tok"] == min(W, len(toks) - off)
    chunks.unpersist()


def test_chunk_documents_validation(spark, docs):
    from spark_tsne_spark.operators.packing import chunk_documents

    with pytest.raises(ValueError):
        chunk_documents(docs, width=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, width=8, stride=9)


def test_minhash_estimate_tracks_exact_jaccard(spark):
    """The signature-agreement estimate must (a) equal 1 for exact
    copies, (b) land within the k/num_hashes grid, and (c) broadly
    track exact shingle Jaccard on near-dups."""
    from spark_tsne_spark.operators.dedup import minhash_estimate_pairs

    base = "the quick brown fox jumps over the lazy dog " * 4
    rows = [
        (1, base),
        (2, base),  # exact copy -> est 1.0
        (3, base.replace("quick", "rapid")),  # near-dup
        (4, "completely different text about spark catalyst optimizer"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["i"], r["j"]): r["est"]
        for r in minhash_estimate_pairs(
            df, num_hashes=16, band_size=2
        ).collect()
    }
    assert got[(1, 2)] == 1.0
    for est in got.values():
        assert 0.0 <= est <= 1.0
        assert abs(est * 16 - round(est * 16)) < 1e-12
    if (1, 3) in got:
        assert got[(1, 3)] >= 0.5  # heavy overlap
    # unrelated docs should not reach a high estimate even if banded
    assert got.get((1, 4), 0.0) < 0.5


def test_quality_gate_per_stratum(spark, docs):
    from spark_tsne_spark.operators.sampling import quality_gate_per_stratum
    from spark_tsne_spark.functions.text import quality_score

    kept = quality_gate_per_stratum(docs, q=0.5).cache()
    # every kept row clears its own source's threshold
    assert kept.where(F.col("quality") < F.col("thr")).count() == 0
    # threshold is an actual data value of that source (discrete quantile)
    scored = docs.select(
        F.col("source").alias("stratum"),
        F.round(quality_score("text"), 6).alias("quality"),
    )
    bad_thr = (
        kept.select("stratum", "thr")
        .distinct()
        .join(
            scored.withColumnRenamed("quality", "thr").distinct(),
            ["stratum", "thr"],
            "left_anti",
        )
    )
    assert bad_thr.count() == 0
    # roughly the top half survives: at least 50% per source, and the
    # sub-threshold docs (strictly below the median value) are gone
    counts = (
        kept.groupBy("stratum")
        .agg(F.count("*").alias("k"))
        .join(
            docs.groupBy(F.col("source").alias("stratum")).agg(
                F.count("*").alias("n")
            ),
            "stratum",
        )
        .collect()
    )
    assert len(counts) == 20
    for r in counts:
        assert r["k"] >= r["n"] // 2, (r["stratum"], r["k"], r["n"])
        assert r["k"] <= r["n"]
    kept.unpersist()


def test_stratum_quantile_threshold_exactness(spark):
    from spark_tsne_spark.operators.sampling import stratum_quantile_threshold

    rows = [("a", float(v)) for v in [1, 2, 3, 4, 5, 6, 7, 8, 9, 10]] + [
        ("b", 5.0),
        ("b", 5.0),
        ("b", 7.0),
    ]
    df = spark.createDataFrame(rows, "stratum string, value double")
    thr = {
        r["stratum"]: r["thr"]
        for r in stratum_quantile_threshold(df, 0.5).collect()
    }
    # a: ceil(0.5*10)=5 -> smallest value with cum>=5 is 5
    assert thr["a"] == 5.0
    # b: ceil(0.5*3)=2 -> value 5.0 (cum 2)
    assert thr["b"] == 5.0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        stratum_quantile_threshold(df, 0.0)


def test_label_centroids_small(spark):
    from spark_tsne_spark.operators.preprocess import label_centroids

    df = spark.createDataFrame(
        [
            (0, [1.0, 2.0]),
            (0, [3.0, 4.0]),
            (1, [10.0, 20.0]),
        ],
        "label int, embedding array<double>",
    )
    got = {r["label"]: r for r in label_centroids(df).collect()}
    assert got[0]["n"] == 2 and got[0]["centroid"] == [2.0, 3.0]
    assert got[1]["n"] == 1 and got[1]["centroid"] == [10.0, 20.0]
    assert got[0]["counts"] == [2, 2] and got[1]["counts"] == [1, 1]


def test_label_centroids_ragged(spark):
    """Ragged vectors: per-position counts differ across components —
    counts[i] is the exact support of component i, and the mean at a
    position only averages the rows that HAVE that position."""
    from spark_tsne_spark.operators.preprocess import label_centroids

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (0, [5.0, 6.0]), (0, [9.0])],
        "label int, embedding array<double>",
    )
    r = label_centroids(df).collect()[0]
    assert r["counts"] == [3, 2, 1]
    assert r["centroid"] == [5.0, 4.0, 3.0]
    assert r["n"] == 3


def test_profile_table_single_pass(spark):
    from spark_tsne_spark.operators.preprocess import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "b")], "id long, v string"
    )
    got = {r["column"]: r for r in profile_table(df, ["id", "v"]).collect()}
    assert got["id"]["n_rows"] == 4 and got["id"]["n_null"] == 0
    assert got["id"]["n_distinct"] == 4
    assert got["id"]["min_v"] == "1" and got["id"]["max_v"] == "4"
    assert got["v"]["n_null"] == 1 and got["v"]["n_distinct"] == 2
    assert got["v"]["min_v"] == "a" and got["v"]["max_v"] == "b"
    # exactly ONE scan of the input in the plan
    plan = profile_table(df, ["id", "v"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ExistingRDD") <= 1


def test_chunk_documents_random_cross_check(spark):
    """Randomized (seeded) cross-check vs a pure-python model,
    including empty, single-token, unicode-whitespace, and longer
    docs — one Spark job for the whole batch."""
    import random

    from spark_tsne_spark.operators.packing import chunk_documents

    rng = random.Random(7)
    words = ["alpha", "b", "ccc", "dd", "foo1", "x9"]
    rows = [(0, ""), (1, "solo"), (2, "  padded   with\tspaces  ")]
    for i in range(3, 60):
        n = rng.randint(1, 40)
        rows.append((i, " ".join(rng.choice(words) for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    W, S = 5, 3
    got = {}
    for r in chunk_documents(df, width=W, stride=S).collect():
        got.setdefault(r["doc_id"], {})[r["chunk_id"]] = (
            r["chunk_off"], r["n_chunk_tok"], r["chunk_text"]
        )

    for doc_id, text in rows:
        # model Spark's split(trim(t), '\s+'): empty text yields one
        # empty token, not an empty array
        toks = text.split() if text.strip() else [""]
        n = len(toks)
        if n <= W:
            n_chunks = 1
        else:
            n_chunks = -(-(n - W) // S) + 1
        chunks = got[doc_id]
        assert len(chunks) == n_chunks, (doc_id, text)
        for cid in range(n_chunks):
            off = cid * S
            want_toks = toks[off : off + W]
            assert chunks[cid] == (
                off, min(W, n - off), " ".join(want_toks)
            ), (doc_id, cid, text)


def test_upsert_and_snapshot_diff_small(spark):
    from spark_tsne_spark.operators.maintenance import snapshot_diff, upsert_latest

    base = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b"), (3, 1, "c")], "doc_id long, version long, fp string"
    )
    changes = spark.createDataFrame(
        [(2, 2, "b2"), (2, 1, "b-redelivery"), (4, 1, "d")],
        "doc_id long, version long, fp string",
    )
    got = {r["doc_id"]: (r["version"], r["fp"]) for r in upsert_latest(base, changes).collect()}
    assert got == {
        1: (1, "a"),
        2: (2, "b2"),  # higher version wins
        3: (1, "c"),
        4: (1, "d"),  # pure insert
    }
    # version tie: changes side supersedes the stored row
    tie = upsert_latest(
        spark.createDataFrame([(9, 1, "old")], "doc_id long, version long, fp string"),
        spark.createDataFrame([(9, 1, "new")], "doc_id long, version long, fp string"),
    ).collect()
    assert tie[0]["fp"] == "new"

    old = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "doc_id long, fp string")
    new = spark.createDataFrame([(2, "b"), (3, "c2"), (4, "d")], "doc_id long, fp string")
    st = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert st == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_quota_empty_budgets_rejected(spark, docs):
    from spark_tsne_spark.operators.packing import token_budget_sample
    from spark_tsne_spark.streaming.quota import token_quota_admit

    with pytest.raises(ValueError):
        token_budget_sample(docs, {})
    with pytest.raises(ValueError):
        token_quota_admit(docs, {})


def test_lm_score_separates_text_from_noise(spark):
    """The CCNet-style signal: natural English scores far better
    (higher avg log2 prob) than random-ish bytes."""
    from spark_tsne_spark.functions.text import lm_trigram_score

    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog and then "
                "the other animals gathered in the forest for a meeting"),
            (2, "qzxv jkwq pzt vvkx qqj zzprw xkcv qpzm wvxk jjqz"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", lm_trigram_score("text").alias("s")).collect()
    }
    bits = {k: v["cb_sum"] / (100.0 * v["n_grams"]) for k, v in got.items()}
    assert bits[1] > -13.0, bits  # natural English
    assert bits[2] < -17.0, bits  # noise
    assert bits[1] - bits[2] > 4.0


def test_minhash_band_size_must_divide(spark):
    """A band_size that doesn't divide num_hashes would silently drop
    trailing signature rows from banding while still counting them in
    the estimate denominator — rejected up front, in both the
    estimate and the banding entry points."""
    from spark_tsne_spark.operators.dedup import (
        minhash_bands,
        minhash_estimate_pairs,
    )

    df = spark.createDataFrame([(1, "abcdefgh")], "doc_id long, text string")
    with pytest.raises(ValueError):
        minhash_estimate_pairs(df, num_hashes=16, band_size=5)
    with pytest.raises(ValueError):
        minhash_bands(df, num_hashes=16, band_size=3)


def test_plan_shards_contiguous_and_balanced(spark, docs):
    """Shards are contiguous in doc order, each holds ~shard_tokens
    (spilling by at most one document), and every doc is assigned."""
    from spark_tsne_spark.operators.packing import plan_shards

    S = 500
    out = plan_shards(docs, shard_tokens=S).collect()
    assert len(out) == docs.count()
    rows = sorted(out, key=lambda r: r["doc_id"])
    # offsets are the running sum in doc_id order
    acc = 0
    for r in rows:
        assert r["offset"] == acc
        assert r["shard"] == acc // S
        acc += r["n_tok"]
    # shard ids are non-decreasing in doc order and start at 0
    shards = [r["shard"] for r in rows]
    assert shards == sorted(shards) and shards[0] == 0
    # each shard's first-token span stays within one shard width plus
    # the one straddling doc
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for s, rs in by_shard.items():
        tot = sum(r["n_tok"] for r in rs)
        assert tot >= 1
        # all but the straddler start inside the shard window
        assert all(s * S <= r["offset"] < (s + 1) * S for r in rs)

    with pytest.raises(ValueError):
        plan_shards(docs, shard_tokens=0)


def test_source_overlap_matrix_counts(spark):
    """Planted cross-source duplicates: the matrix counts DISTINCT
    shared canonical docs per source pair (whitespace/case variants
    collapse; within-source dups don't create pairs)."""
    from spark_tsne_spark.operators.dedup import source_overlap_matrix

    rows = [
        (1, "shared alpha", "s1"),
        (2, "Shared   ALPHA ", "s2"),   # canonical dup of 1, other source
        (3, "shared beta", "s1"),
        (4, "shared beta", "s2"),
        (5, "shared beta", "s3"),       # beta spans three sources
        (6, "only in s1", "s1"),
        (7, "only in s1", "s1"),        # within-source dup: no pair
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["src_a"], r["src_b"]): r["n_shared"]
        for r in source_overlap_matrix(df).collect()
    }
    assert got == {("s1", "s2"): 2, ("s1", "s3"): 1, ("s2", "s3"): 1}


def test_expectation_report_detects_each_violation_kind(spark):
    """Every check kind fires on a frame with one known violation of
    each: a null key, a duplicate id, an out-of-set status, a negative
    amount, and an orphan foreign key."""
    from spark_tsne_spark.operators.maintenance import expectation_report

    rows = [
        (1, 10, "O", 5.0),
        (2, 20, "F", 3.0),
        (2, 30, "X", -1.0),   # dup id, bad status, negative
        (3, None, "P", 2.0),  # null fk
        (4, 99, "O", 1.0),    # orphan fk
    ]
    df = spark.createDataFrame(
        rows, "id long, cust long, status string, amount double"
    )
    dim = spark.createDataFrame([(10,), (20,), (30,)], "c long")
    rep = {
        (r["check"], r["column"]): (r["violations"], r["n_rows"], r["ok"])
        for r in expectation_report(
            df,
            not_null=("cust",),
            unique=("id",),
            in_set={"status": ("O", "F", "P")},
            non_negative=("amount",),
            refs={"cust": (dim, "c")},
        ).collect()
    }
    assert rep[("not_null", "cust")] == (1, 5, False)
    assert rep[("unique", "id")] == (1, 5, False)
    assert rep[("in_set", "status")] == (1, 5, False)
    assert rep[("non_negative", "amount")] == (1, 5, False)
    assert rep[("ref_integrity", "cust")] == (1, 5, False)

    clean = expectation_report(
        df.where(F.col("id") == 1), not_null=("cust",), unique=("id",)
    )
    assert all(r["ok"] for r in clean.collect())
