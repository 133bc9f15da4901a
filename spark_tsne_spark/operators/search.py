"""Keyword search + passage-level dedup over the ``documents`` table.

Two operators a training-data pipeline runs constantly:

- **BM25 top-k search** (``bm25_topk``): classic Okapi BM25 with an
  inverted-index-shaped plan. The corpus is never cross-joined with
  the query: tokens are intersected with the (small, literal) query
  term set BEFORE the explode, so only postings for query terms flow
  into the shuffle — the DataFrame equivalent of reading an inverted
  index. Per-term document frequencies and the global (N, avgdl)
  stats are tiny aggregates broadcast back onto the postings.

- **Passage-level exact dedup** (``passage_stats``): split each doc
  into fixed-width non-overlapping token windows (the CCNet/Dolma
  paragraph-dedup pattern adapted to unstructured text), fingerprint
  each window, and flag windows whose fingerprint occurs more than
  once corpus-wide. Output is per-document duplication stats — the
  signal used to drop boilerplate-heavy documents.

Scale shape at 100 TB: BM25 is one narrow scan (filter + explode of
query-term matches only), one (doc, term) groupBy with map-side
partial aggregation, two broadcast joins (|terms| rows and 1 row),
and a TakeOrdered top-k — no full sort, no cartesian. Passage dedup
is one explode, one fingerprint groupBy (partial-agg count), one
hash-key join back, one per-doc agg: every shuffle is on a
high-cardinality uniform key (md5), so no skew.

No reference counterpart (saurfang/spark-tsne has no text pipeline);
these extend the engine per the builder's brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from spark_tsne_spark.functions.text import fingerprint, tokens


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Okapi BM25 top-k: ``(doc_id, score, rank)`` for docs matching
    at least one query term.

    idf uses the standard "plus one inside the log" form,
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``, which is non-negative
    for any df. Ranking orders by the ROUNDED score with the id as
    tie-break, per the catalog's hash-stability rules.
    """
    terms = sorted(set(query_terms))
    terms_lit = F.array(*[F.lit(t) for t in terms])

    toks = docs.select(
        F.col(id_col).alias("doc_id"), tokens(text_col).alias("toks")
    ).select(
        "doc_id",
        F.size("toks").alias("dl"),
        # Inverted-index read: keep only query-term tokens. The filter
        # runs inside the row (no shuffle) and bounds the explode to
        # |matches| instead of |tokens|.
        F.filter("toks", lambda t: F.array_contains(terms_lit, t)).alias("hits"),
    )
    # toks feeds the corpus stats AND the postings build; without
    # truncation each reference re-runs the tokenize+filter pass
    # (guide §3.3). The (doc_id, dl, hits) projection is the
    # inverted-index read a production system materializes once.
    # Measured (with the _ql_topk twin): rrf_hybrid_search
    # 2.200 -> 1.748 s mean (6-pair interleaved A/B, sf0.1).
    toks = toks.localCheckpoint(eager=False)
    # Global stats: one row, broadcast onto the postings.
    stats = toks.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    postings = (
        toks.where(F.size("hits") > 0)
        .select("doc_id", "dl", F.explode("hits").alias("term"))
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    # Document frequency per term: at most |terms| rows — broadcast.
    dfreq = postings.groupBy("term").agg(
        F.count("*").cast("double").alias("df")
    )

    scored = (
        postings.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1.0)
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(F.sum("contrib").alias("score"))
    ranked = (
        per_doc.select("doc_id", F.round("score", 6).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return ranked.withColumn("rank", F.row_number().over(w).cast("long"))


def tfidf_top_terms(
    docs: DataFrame,
    top: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``top`` TF-IDF terms per document:
    ``(doc_id, term, tf, score, rank)``.

    ``score = tf * ln(N / df)`` with df = number of documents
    containing the term. Plan shape: ONE explode → (doc, term) groupBy
    (map-side partial agg on a high-cardinality uniform key), a
    term-keyed equi-join against the document-frequency aggregate
    (vocab-sized — AQE broadcasts it when small, hash-joins otherwise),
    a 1-row stats broadcast, and a per-doc window over ≤ |doc's terms|
    rows. No per-row Python, no full sort. Ranking orders by the
    ROUNDED score with the term as tie-break (catalog hash-stability
    rules)."""
    from pyspark.sql import Window

    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    n_docs = docs.select(F.col(id_col)).agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).where(
        F.col("rank") <= top
    )


def vocab_top_terms(
    docs: DataFrame,
    k: int = 100,
    min_len: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary heavy hitters: the ``k`` terms with the
    highest document frequency — ``(term, df, tf, rank)`` with tf the
    total occurrence count. Two partial-aggregated groupBys (the
    (doc, term) distinct then the term rollup) and one
    TakeOrdered top-k: per-partition heaps + driver merge, never a
    global sort. The exact counterpart of the count-min/top-k sketch
    pass a corpus-stats job runs at 100 TB."""
    terms = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("term")
    ).where(F.length("term") >= min_len)
    per_doc = terms.groupBy("doc_id", "term").agg(F.count("*").alias("n"))
    rolled = per_doc.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("n").alias("tf")
    )
    ranked = rolled.orderBy(
        F.col("df").desc(), F.col("tf").desc(), F.col("term").asc()
    ).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("df").desc(), F.col("tf").desc(), F.col("term").asc())
    return ranked.withColumn("rank", F.row_number().over(w).cast("long"))


def passage_windows(
    text: Column | str, width: int = 32
) -> Column:
    """Non-overlapping ``width``-token windows of a document, each
    re-joined with single spaces; the final window keeps the (shorter)
    tail. Empty/short docs yield a single window of the whole text.
    """
    t = tokens(text)
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(t), F.lit(1)), F.lit(width)),
        lambda i: F.concat_ws(" ", F.slice(t, i, width)),
    )


def passage_stats(
    docs: DataFrame,
    width: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document passage-duplication stats:
    ``(doc_id, n_passages, n_dup, dup_ratio)``.

    A passage is "dup" when its fingerprint occurs >1 time corpus-wide
    (including twice within one document — internal boilerplate counts).
    """
    pas = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(passage_windows(text_col, width)).alias("p"),
    ).select("doc_id", fingerprint("p").alias("ph"))
    # Fingerprint multiplicity: partial-agg count on a uniform md5 key.
    counts = pas.groupBy("ph").agg(F.count("*").alias("cnt"))
    return (
        pas.join(counts, "ph")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_passages"),
            F.sum(F.when(F.col("cnt") > 1, 1).otherwise(0)).alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_passages",
            "n_dup",
            F.round(F.col("n_dup") / F.col("n_passages"), 6).alias("dup_ratio"),
        )
    )


def duplicate_span_stats(
    docs: DataFrame,
    width: int = 16,
    stride: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Substring-level duplicate-span signal (the sliding-window form
    of Lee et al. 2022's exact-substring dedup): what fraction of each
    document's tokens lies inside a ``width``-token window that also
    occurs in ANOTHER document.

    Windows start every ``stride`` tokens (stride 1 = the exact
    suffix-array semantics at explode cost n_tokens rows/doc; larger
    strides trade recall for a 1/stride row count — the knob that
    sets the 100 TB price). A window is duplicated when its md5 is
    held by >= 2 distinct documents; per-document coverage merges the
    overlapping duplicated intervals exactly (running-max window
    sweep), so tokens under several windows count once.

    Output: ``(doc_id, n_tokens, n_windows, n_dup_windows,
    dup_tokens, dup_frac)`` — one row per input document (docs
    shorter than ``width`` tokens have zero windows).

    Shape: ONE explode (n_tokens/stride rows, narrow), ONE uniform
    md5-key groupBy for the distinct-doc count, the join back on the
    same key, then per-doc windows bounded by document length. No
    driver state, no collect.
    """
    from pyspark.sql import Window

    if width < 1 or stride < 1:
        raise ValueError(f"width and stride must be >= 1, got {width}, {stride}")
    t = tokens(text_col)
    base = docs.select(
        F.col(id_col).alias("doc_id"), t.alias("toks")
    ).select("doc_id", F.size("toks").alias("n_tokens"), "toks")
    wins = base.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("toks") >= width,
                F.transform(
                    F.sequence(
                        F.lit(1),
                        F.size("toks") - width + 1,
                        F.lit(stride),
                    ),
                    lambda i: F.struct(
                        i.alias("s"),
                        F.md5(
                            F.lower(F.concat_ws(" ", F.slice("toks", i, width)))
                        ).alias("wh"),
                    ),
                ),
            ).otherwise(F.array())
        ).alias("w"),
    ).select("doc_id", F.col("w.s").alias("s"), F.col("w.wh").alias("wh"))

    dup_keys = (
        wins.groupBy("wh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("wh")
    )
    dups = wins.join(dup_keys, on="wh").select(
        "doc_id", "s", (F.col("s") + width).alias("e")
    )
    # Exact interval union per doc: sorted by start, a window's new
    # coverage is e - max(s, max-end-so-far), clamped at 0.
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_doc_dup = (
        dups.withColumn("pm", F.max("e").over(w_prev))
        .withColumn(
            "contrib",
            F.greatest(
                F.lit(0),
                F.col("e")
                - F.greatest(F.col("s"), F.coalesce("pm", F.col("s"))),
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_dup_windows"),
            F.sum("contrib").cast("long").alias("dup_tokens"),
        )
    )
    per_doc_win = wins.groupBy("doc_id").agg(F.count("*").alias("n_windows"))
    return (
        base.select("doc_id", "n_tokens")
        .join(per_doc_win, on="doc_id", how="left")
        .join(per_doc_dup, on="doc_id", how="left")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0))
            .cast("long")
            .alias("n_dup_windows"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.coalesce("dup_tokens", F.lit(0)) / F.col("n_tokens"), 6
            ).alias("dup_frac"),
        )
    )


def term_pmi_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 5,
    max_df_frac: float = 0.9,
    min_pair: int = 3,
    top: int = 50,
    decimals: int = 6,
) -> DataFrame:
    """Top term-pair collocations by pointwise mutual information:
    ``(t1, t2, n_pair, pmi)`` with ``pmi = ln(n_pair * D /
    (df1 * df2))`` over document-level co-occurrence — the standard
    phrase/topic-structure probe over a corpus.

    Scale shape: the vocabulary is DF-bounded on BOTH ends before any
    pair forms — terms in fewer than ``min_df`` docs (noise) or more
    than ``max_df`` docs (stopword-like; they would pair with
    everything and dominate the join) never enter the inverted
    index; the stopword cap is RELATIVE (``max_df_frac`` of the
    corpus) so the same contract holds at any scale — an absolute
    cap silently empties the vocabulary as the corpus grows past it.
    The pair space is then the per-doc self-join of the
    SURVIVING postings (the same bounded inverted-index shape as
    ``ngram_jaccard_pairs``): fan-out per doc is quadratic only in
    its number of *mid-frequency distinct* terms. One groupBy closes
    pair counts; df and D ride in as one broadcast-size table and a
    scalar. Ranking orders by rounded PMI with the (t1, t2) text
    tie-break, so near-equal doubles can't flip ranks cross-engine.
    """
    t = (
        docs.select(
            F.col(id_col).alias("d"), F.explode(tokens(text_col)).alias("term")
        )
        .where(F.length("term") > 0)
        .distinct()
    )
    # Reused by df filter + the pair join; cheap to keep lazy (two
    # scans of a narrow distinct) — no persist needed for two uses
    # of an already-shuffled intermediate.
    n_docs = docs.select(F.col(id_col)).distinct().count()
    # integer arithmetic (frac on the 1e-3 grid) so the cap cannot
    # drift from the SQL oracle's exact-integer rendering
    max_df = (n_docs * int(round(max_df_frac * 1000))) // 1000
    df_counts = t.groupBy("term").agg(F.count("*").alias("df"))
    vocab = df_counts.where(
        (F.col("df") >= min_df) & (F.col("df") <= max_df)
    )
    postings = t.join(vocab, "term").select("d", "term", "df")
    p1 = postings.select(
        "d", F.col("term").alias("t1"), F.col("df").alias("df1")
    )
    p2 = postings.select(
        "d", F.col("term").alias("t2"), F.col("df").alias("df2")
    )
    pairs = (
        p1.join(p2, "d")
        .where(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(
            F.count("*").alias("n_pair"),
            F.first("df1").alias("df1"),
            F.first("df2").alias("df2"),
        )
        .where(F.col("n_pair") >= min_pair)
    )
    pmi = F.round(
        F.log(
            F.col("n_pair").cast("double")
            * F.lit(float(n_docs))
            / (F.col("df1") * F.col("df2")).cast("double")
        ),
        decimals,
    )
    return (
        pairs.select("t1", "t2", "n_pair", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "t1", "t2")
        .limit(top)
    )


def allpairs_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.35,
    max_bucket: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All-pairs lexical similarity join: every document pair whose
    TF-IDF cosine reaches ``threshold`` — ``(i, j, cosine)`` with
    ``i < j``. The sparse-vector counterpart of
    ``dedup.embedding_cosine_pairs`` (template-detection / near-dup
    mining when no embeddings exist), after the AllPairs/L2AP
    prefix-filtering family (Bayardo et al., WWW'07).

    The naive plan is the O(n²) theta join. Here each document's
    normalized TF-IDF terms are sorted by DESCENDING weight and only
    the PREFIX is indexed: a term at tail position p enters the
    inverted index iff the L2 norm of the remaining tail (this term
    included) is ≥ threshold/2. Two docs with cosine ≥ t must then
    share an indexed term: if not, every shared term sits in an
    unindexed tail, and splitting the shared set by which side left
    it unindexed gives dot ≤ ||a_tail||·||b|| + ||b_tail||·||a||
    < t/2 + t/2 = t (Cauchy-Schwarz per side, unit norms) —
    candidate-complete by construction, pinned against brute force
    in tests. High-df stopword-ish terms carry tiny IDF weights, so
    they sort into the unindexed tail and never fan out.

    Plan shape: tokenize → (doc, term) groupBy → term-keyed df join
    (vocab-sized, AQE-broadcast) → per-doc weight window (doc-length
    bounded) → equi self-join on the PRUNED index → exact dot
    verification confined to candidate pairs (join back the two full
    vectors, groupBy pair). ``max_bucket`` drops hot index terms
    (mega-clique cap, same recall contract as the MinHash path).
    Rounding to 6 decimals precedes the threshold test so the
    cross-engine summation-order drift (~1e-14) cannot flip
    membership.
    """
    from pyspark.sql import Window

    # Round 12 measured-rejection: widening the scan here LOSES
    # ~0.6 s at bench shape (ABBA min 2.01 s no-widen vs 2.69 s
    # widened, sf0.1) — the widen exchange is itself part of the
    # subtree every plan reference recomputes, so it multiplies
    # instead of amortizing, and the per-row tokenize work is too
    # light to repay the extra stages. Left un-widened on purpose.
    tf = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(tokens(text_col)).alias("term"),
        )
        .where(F.length("term") > 0)
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").cast("double").alias("df"))
    n_docs = docs.select(F.col(id_col)).agg(
        F.count("*").cast("double").alias("n_docs")
    )
    w = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("w"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm")
    )
    u = w.join(norms, "doc_id").select(
        "doc_id", "term", (F.col("w") / F.col("norm")).alias("u")
    )
    # The normalized vectors are referenced FIVE times downstream
    # (index build, both sides of the candidate self-join, and the
    # two verification sides), and each reference re-expands the
    # whole tokenize→tf→df→norm subtree: 232 HashAggregate /
    # 70 BroadcastExchange nodes in the un-truncated plan at bench
    # shape. localCheckpoint materializes u ONCE (guide §3.3:
    # materialize to truncate very wide plans) — at scale this is
    # one corpus-derived (doc, term, u) table computed once
    # instead of five tokenize+aggregate passes over the corpus.
    # eager=False: blocks build inside the first consuming stage.
    u = u.localCheckpoint(eager=False)
    # Tail-norm window: per doc, descending weight; rsum includes the
    # current row, so `indexed` ⇔ tail-from-here norm ≥ t/2.
    tail = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("u").desc(), F.col("term").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    cut = (threshold / 2.0) ** 2
    idx = u.withColumn(
        "rsum", F.sum(F.col("u") * F.col("u")).over(tail)
    ).where(F.col("rsum") >= cut).select("doc_id", "term")
    if max_bucket is not None:
        hot = idx.groupBy("term").agg(F.count("*").alias("_bw"))
        idx = idx.join(
            hot.where(F.col("_bw") <= max_bucket).drop("_bw"), "term"
        )
    cands = (
        idx.alias("a")
        .join(idx.alias("b"), "term")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("i"), F.col("b.doc_id").alias("j")
        )
        .dropDuplicates(["i", "j"])
    )
    # Exact verification, candidate-bounded: |cands| × doc-length
    # intermediate, never n².
    va = u.select(
        F.col("doc_id").alias("i"), "term", F.col("u").alias("ua")
    )
    vb = u.select(
        F.col("doc_id").alias("j"), "term", F.col("u").alias("ub")
    )
    return (
        cands.join(va, "i")
        .join(vb, ["j", "term"])
        .groupBy("i", "j")
        .agg(F.round(F.sum(F.col("ua") * F.col("ub")), 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def bigram_next_token(
    docs: DataFrame,
    text_col: str = "text",
    min_head_count: int = 30,
    top_k: int = 3,
) -> DataFrame:
    """Word-bigram next-token statistics — the count table behind a
    bigram language model: for every head word seen at least
    ``min_head_count`` times as a bigram head, the ``top_k`` most
    likely next tokens with their conditional probability
    ``p = n_pair / n_head`` (rounded; ties broken by token text so
    ranks are total). Output:
    ``(w1, w2, n_pair, n_head, p)``.

    Complements the char-trigram LM scorer (`functions/text.py`):
    that one scores documents against a fixed profile; this one
    DERIVES the model table from the corpus itself.

    Shape at 100 TB: bigram pairs are built JVM-side with
    ``zip_with`` over each row's own token array (no window over the
    corpus, no per-doc shuffle — adjacency never leaves the row),
    then ONE map-side-combined groupBy on (w1, w2) — bounded by
    distinct-bigram count, not corpus size — and one per-head window
    whose partitions are single head words (skew-bounded: a stopword
    head holds at most |vocab| rows, and heads are hash-distributed).
    """
    from pyspark.sql import Window

    a = tokens(F.lower(F.col(text_col)))
    pairs = F.when(
        F.size(a) >= 2,
        F.zip_with(
            F.slice(a, 1, F.size(a) - 1),
            F.slice(a, 2, F.size(a) - 1),
            lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    ex = docs.select(F.explode(pairs).alias("s")).select("s.w1", "s.w2")
    cnt = (
        ex.where((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_pair"))
    )
    head = Window.partitionBy("w1")
    rank = Window.partitionBy("w1").orderBy(F.desc("n_pair"), "w2")
    return (
        cnt.select(
            "w1",
            "w2",
            "n_pair",
            F.sum("n_pair").over(head).alias("n_head"),
            F.row_number().over(rank).alias("_rn"),
        )
        .where((F.col("_rn") <= top_k) & (F.col("n_head") >= min_head_count))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.col("n_head").cast("long").alias("n_head"),
            F.round(F.col("n_pair") / F.col("n_head"), 6).alias("p"),
        )
    )


def lang_id_join(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Join-formulated language ID — same labels as
    ``functions.text.lang_id`` (pinned in tests), different physical
    strategy: explode each doc's char trigrams, broadcast-join the
    ~1.2k-row profile weight table, ONE map-side-combined per-doc
    aggregation, then the identical argmax / fit-threshold / script-
    census decision. Returns ``(id_col, lang)`` for EVERY input row.

    Why it exists: the Column form's literal-map lookup is a linear
    key scan per trigram (~1.7 ms/KB/core), and — worse for
    composition — a computed lang column referenced from filters
    re-evaluates the whole fold per pushed-down reference. The join
    form is ~1.7x faster on a full materialization (measured 7.3 s →
    4.2 s at sf0.1) and, decisively, its heavy work sits BELOW an
    aggregation boundary, so downstream gates on the label cost
    column references, not fold re-evaluations. This is also the
    DuckDB oracle's own shape, so the cross-engine check covers the
    plan that actually runs at scale.
    """
    from spark_tsne_spark.functions.text import (
        LANG_MIN_MEAN_WEIGHT,
        LANG_TRIGRAM_PROFILES,
        SCRIPT_RANGES,
        _script_class_pattern,
        char_shingles,
    )

    from spark_tsne_spark.partitioning import widen_small_input

    # Both heavy per-row passes below — the 9-regex script census and
    # the ~n_chars-row trigram explode — inherit the SCAN's partition
    # count, which for a small single-file input is 1-3 tasks (round
    # 12: the whole 5M-gram explode ran on 3 of 32 cores at sf0.1).
    # Widen once; both branches fork from the widened child. No-op at
    # scale.
    docs = widen_small_input(docs)
    spark = docs.sparkSession
    langs = sorted(LANG_TRIGRAM_PROFILES)
    nl = len(langs)
    tris = sorted({g for L in langs for g in LANG_TRIGRAM_PROFILES[L]})
    wdf = spark.createDataFrame(
        [
            (g, [int(LANG_TRIGRAM_PROFILES[L].get(g, 0)) for L in langs])
            for g in tris
        ],
        "g string, ws array<long>",
    )
    t = F.lower(F.col(text_col))
    n_chars = F.length(t)
    # script-census override, CASE arms in spec order (kana before
    # Han), NULL when no script fires — cheap codegen regexes,
    # computed ONCE per row before the explode
    script = F.lit(None).cast("string")
    for lang, _cls, permille, ranges in reversed(SCRIPT_RANGES):
        pat = _script_class_pattern(ranges)
        cnt = n_chars - F.length(F.regexp_replace(t, pat, ""))
        script = F.when(
            (cnt > 0) & (cnt * 1000 >= n_chars * permille), F.lit(lang)
        ).otherwise(script)
    # Two frames, joined on the doc id AFTER the aggregation: the
    # script census (9 full-text regexes) and the trigram-count must
    # NOT ride through the explode — CollapseProject folds a
    # projection into the Generate's output, so a per-doc expression
    # carried alongside the exploded grams re-evaluates per GRAM
    # (measured: 5M exploded rows x 9 regexes ≈ 80 s at sf0.1 vs
    # ~1 s evaluated once per doc). first()-style carry has the same
    # trap; the id-keyed join back costs one narrow shuffle of
    # |docs| rows and the agg side is already partitioned on _id.
    meta = docs.select(
        F.col(id_col).alias("_id"),
        script.alias("_script"),
        (n_chars - 2).cast("long").alias("_n"),
    )
    # project_barrier: materialize lower(text) ONCE per row — without
    # the fence CollapseProject inlines it into the shingle lambda and
    # the interpreted HOF re-lowers the whole document PER TRIGRAM
    # (measured 3.7 s -> 2.0 s on the sf0.1 explode)
    from spark_tsne_spark.functions.text import project_barrier

    low = project_barrier(
        docs, F.col(id_col).alias("_id"), t.alias("_t")
    )
    pre = low.select(
        "_id",
        F.explode_outer(char_shingles(F.col("_t"), 3)).alias("g"),
    )
    j = pre.join(F.broadcast(wdf), "g", "left")
    sums = j.groupBy("_id").agg(
        *[
            F.sum(F.coalesce(F.element_at("ws", i + 1), F.lit(0))).alias(
                f"_s{i}"
            )
            for i in range(nl)
        ],
    )
    agg = sums.join(meta, "_id")
    scores = [F.col(f"_s{i}") for i in range(nl)]
    best = F.greatest(*scores)
    pred = F.lit("other")
    for i in reversed(range(nl)):  # FIRST sorted lang wins ties
        pred = F.when(scores[i] == best, F.lit(langs[i])).otherwise(pred)
    trigram_pred = F.when(
        (F.col("_n") > 0) & (best >= F.lit(LANG_MIN_MEAN_WEIGHT) * F.col("_n")),
        pred,
    ).otherwise(F.lit("other"))
    return agg.select(
        F.col("_id").alias(id_col),
        F.coalesce("_script", trigram_pred).alias("lang"),
    )
