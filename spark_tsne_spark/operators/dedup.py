"""Deduplication operators over the ``documents`` table.

The scale-out shapes a 100 TB corpus pipeline needs, each expressed
as declarative DataFrame plans (one or two key-shuffles, map-side
partial aggregation, no driver loops):

- exact dedup: hash-groupBy on a canonical fingerprint
- MinHash + LSH banding: shingle → minhash → band → bucket self-join
- SimHash: per-bit majority over token hashes, hamming buckets
- n-gram Jaccard: shared-shingle join → |A∩B| / (|A|+|B|−|A∩B|)
- embedding-cosine near-dup: normalized dot over candidate pairs

Scale notes: every self-join here is bucket-limited (joins happen on
band/bucket keys, never all-pairs); the Jaccard join's fan-out is
bounded by shingle frequency — at production scale, cap hot shingles
(drop shingles with document-frequency above a threshold) before the
join, which is a single additional groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from spark_tsne_spark.functions.text import (
    char_shingles,
    fingerprint,
    minhash_values,
    project_barrier,
    tokens,
    word_ngrams,
    word_ngrams_of,
)
from spark_tsne_spark.functions.vector import cosine_sim, l2_norm


def exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group by canonical text fingerprint; keep the smallest id.

    Returns ``(fp, keep_id, n_copies)`` — one row per distinct
    document. One shuffle on the fingerprint; partial agg map-side.
    """
    return (
        docs.select(F.col(id_col).alias("doc_id"), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


def minhash_bands(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    band_size: int = 4,
    shingle_k: int = 5,
    hash_fn: str = "md5",
) -> DataFrame:
    """Banded MinHash signatures: ``(doc_id, band, sig)`` — the LSH
    index rows shared by batch (`minhash_lsh_candidates`) and
    incremental (`incremental_minhash_candidates`) dedup.

    Docs shorter than one shingle have an empty shingle set — every
    one of them would fold to the identical sentinel signature and
    collapse into a single bucket whose i<j expansion is O(m²).
    Filtered here (they can't be near-duplicates under this scheme by
    definition) instead of relying on callers to pre-filter.
    """
    from spark_tsne_spark.partitioning import widen_small_input

    if num_hashes % band_size != 0:
        raise ValueError(
            f"band_size={band_size} must divide num_hashes={num_hashes}: "
            "a remainder would silently exclude trailing signature rows "
            "from every band"
        )
    n_bands = num_hashes // band_size
    docs = docs.where(F.length(F.col(text_col)) >= shingle_k)
    sig = widen_small_input(docs).select(
        F.col(id_col).alias("doc_id"),
        minhash_values(text_col, num_hashes, shingle_k, hash_fn).alias("mh"),
    )
    # '|' delimiter: xxhash64 values stringify at variable width (and may
    # be negative), so an undelimited concat could alias distinct minhash
    # tuples ('12'+'345' == '123'+'45') into one bucket.
    return sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|", F.slice("mh", b * band_size + 1, band_size)
                        ).alias("sig"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    band_size: int = 4,
    shingle_k: int = 5,
    hash_fn: str = "md5",
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-duplicate candidate pairs via MinHash banding.

    Documents whose signatures agree on all rows of ≥1 band collide in
    a bucket; the self-join is per-bucket (skew-safe under AQE), never
    all-pairs. Returns distinct ``(i, j)`` with i < j.
    ``hash_fn='xxhash64'`` is the fast production hash; 'md5' is the
    DuckDB-portable oracle hash (see ``minhash_values``).

    ``max_bucket`` caps per-bucket width at scale: a bucket of B docs
    expands B² pairs inside one task, so one pathological mega-clique
    (e.g. a boilerplate page duplicated 10⁶×) would OOM its task.
    Buckets wider than the cap are dropped — the standard production
    contract, since EXACT duplicates are removed by ``exact_dedup``
    BEFORE near-dup detection and legitimate near-dup clusters are
    orders of magnitude smaller. None (default) = uncapped (the
    oracle-comparable setting).
    """
    bands = minhash_bands(
        docs, id_col, text_col, num_hashes, band_size, shingle_k, hash_fn
    )
    # Bucket-grouped pair emit: ONE shuffle groups colliding docs per
    # (band, sig) bucket, then all i<j pairs expand JVM-side — no
    # sort-merge self-join of the full banded table. Bucket fan-out is
    # df²-bounded exactly as the join was; the distinct dedups pairs
    # that collide in several bands.
    grouped = bands.groupBy("band", "sig").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ds")
    )
    grouped = grouped.where(F.size("ds") >= 2)
    if max_bucket is not None:
        grouped = grouped.where(F.size("ds") <= max_bucket)
    pair_expr = F.expr(
        "flatten(transform(ds, (x, k) -> "
        "transform(slice(ds, k + 2, size(ds)), y -> struct(x AS i, y AS j))))"
    )
    return (
        grouped
        .select(F.explode(pair_expr).alias("pr"))
        .select(F.col("pr.i").alias("i"), F.col("pr.j").alias("j"))
        .distinct()
    )


def minhash_estimate_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    band_size: int = 4,
    shingle_k: int = 5,
    hash_fn: str = "md5",
    min_estimate: float = 0.0,
    max_bucket: int | None = None,
) -> DataFrame:
    """LSH candidates + similarity VERIFICATION from the signatures
    themselves: ``(i, j, est)`` where ``est`` is the unbiased MinHash
    Jaccard estimate — the fraction of signature rows on which the two
    documents' minima agree (Broder 1997). The production near-dup
    contract is exactly this two-step: banding proposes, the full
    signature disposes — without a second pass over the shingle sets
    (``ngram_jaccard_pairs`` is the exact-Jaccard alternative when the
    corpus re-read is affordable).

    Shape: signatures are computed ONCE and persisted (banding, the
    i-side join, and the j-side join all read the persisted array);
    candidates come from the bucket-grouped band join (never
    all-pairs); the estimate is one ``zip_with`` per surviving pair.
    ``est`` values lie on the k/num_hashes grid — exact in binary for
    power-of-two ``num_hashes``, so the oracle comparison needs no
    rounding.
    """
    from spark_tsne_spark.partitioning import widen_small_input

    if num_hashes % band_size != 0:
        raise ValueError(
            f"band_size={band_size} must divide num_hashes={num_hashes}: "
            "a remainder would silently drop trailing signature rows "
            "from banding while still counting them in the Jaccard "
            "estimate denominator"
        )
    n_bands = num_hashes // band_size
    base = docs.where(F.length(F.col(text_col)) >= shingle_k)
    # localCheckpoint (not persist): the signatures are reused by the
    # band join and the estimate pass, but must not outlive this
    # operator in the session CacheManager. Durability caveat: the
    # truncated lineage lives on unreplicated executor blocks, so on
    # a real cluster an executor loss mid-operator fails the job
    # (nothing left to recompute from) — prefer reliable
    # checkpointing there if restartability matters.
    sigs = (
        widen_small_input(base)
        .select(
            F.col(id_col).alias("doc_id"),
            minhash_values(text_col, num_hashes, shingle_k, hash_fn).alias("mh"),
        )
        .localCheckpoint(eager=False)
    )
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "|", F.slice("mh", b * band_size + 1, band_size)
                        ).alias("sig"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", F.col("bs.band"), F.col("bs.sig"))
    grouped = bands.groupBy("band", "sig").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ds")
    )
    grouped = grouped.where(F.size("ds") >= 2)
    if max_bucket is not None:
        grouped = grouped.where(F.size("ds") <= max_bucket)
    pair_expr = F.expr(
        "flatten(transform(ds, (x, k) -> "
        "transform(slice(ds, k + 2, size(ds)), y -> struct(x AS i, y AS j))))"
    )
    pairs = (
        grouped.select(F.explode(pair_expr).alias("pr"))
        .select(F.col("pr.i").alias("i"), F.col("pr.j").alias("j"))
        .distinct()
    )
    a = sigs.select(F.col("doc_id").alias("i"), F.col("mh").alias("mh_i"))
    b = sigs.select(F.col("doc_id").alias("j"), F.col("mh").alias("mh_j"))
    est = F.size(
        F.filter(
            F.zip_with("mh_i", "mh_j", lambda x, y: x == y), lambda t: t
        )
    ).cast("double") / F.lit(float(num_hashes))
    out = (
        pairs.join(a, "i")
        .join(b, "j")
        .select("i", "j", est.alias("est"))
    )
    if min_estimate > 0.0:
        out = out.where(F.col("est") >= min_estimate)
    return out


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
) -> DataFrame:
    """SimHash signatures: per-bit majority vote over token md5 bits.

    Each token contributes ±1 per bit position (bit b = top bit of the
    b-th hex digit of md5(token)); the signature sets bit b where the
    sum is positive. Expressed as explode → groupBy(doc) with
    conditional sums — one shuffle, no UDF. Returns
    ``(doc_id, simhash long)``.
    """
    from spark_tsne_spark.partitioning import widen_small_input

    tok = widen_small_input(docs).select(
        F.col(id_col).alias("doc_id"), F.explode(tokens(text_col)).alias("tok")
    ).withColumn("h", F.md5("tok"))
    bit_sums = [
        F.sum(
            F.when(
                F.conv(F.substring("h", b + 1, 1), 16, 10).cast("int") >= 8, 1
            ).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = tok.groupBy("doc_id").agg(*bit_sums)
    sig = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(2 ** (bits - 1 - b))).otherwise(0)
        sig = term if sig is None else sig + term
    return agg.select("doc_id", sig.cast("long").alias("simhash"))


def simhash_near_dups(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
    max_hamming: int = 2,
    max_bucket: int | None = None,
) -> DataFrame:
    """Pairs whose simhash differs in ≤ ``max_hamming`` bits.

    Candidate generation by pigeonhole bucketing: the signature is
    split into ``max_hamming + 1`` disjoint bit chunks, so any pair
    within the hamming budget agrees exactly on at least one chunk
    (``max_hamming`` differing bits cannot touch all ``max_hamming+1``
    chunks). Chunk buckets are grouped and i<j pairs expand JVM-side —
    the same one-shuffle grouped pair-emit as MinHash banding, never a
    self-join of the full chunk table — then hamming is verified with
    ``bit_count(xor)``. Recall is exact for the stated contract.

    ``max_bucket``: same mega-clique task-OOM guard as
    ``minhash_lsh_candidates`` — chunk buckets wider than the cap are
    dropped (run ``exact_dedup`` first; None = uncapped oracle mode).
    """
    n_chunks = max_hamming + 1
    if n_chunks > bits:
        raise ValueError(f"max_hamming={max_hamming} needs {n_chunks} chunks > {bits} bits")
    if bits > 62:
        # 2**len literals overflow LongType at 63 bits, and Spark's
        # sign-following % over an arithmetic shiftright would bucket
        # equal low-chunk bit patterns differently once bit 63 is set
        # (silent recall loss). Cap until simhash grows a wide-sig type.
        raise ValueError("simhash_near_dups supports bits <= 62")
    sig = simhash(docs, id_col, text_col, bits)
    # Even split of the bit range, MSB-first: chunk c covers lens[c]
    # bits starting shifts[c] bits above the LSB. shiftrightunsigned +
    # mask (not %) keeps the chunk value a pure bit-slice even if the
    # top bit were ever set.
    base, rem = divmod(bits, n_chunks)
    lens = [base + 1 if c < rem else base for c in range(n_chunks)]
    shifts, s = [], bits
    for length in lens:
        s -= length
        shifts.append(s)
    chunk_structs = [
        F.struct(
            F.lit(c).alias("c"),
            F.shiftrightunsigned("simhash", shifts[c])
            .bitwiseAND(F.lit(2 ** lens[c] - 1))
            .alias("v"),
        )
        for c in range(n_chunks)
    ]
    chunks = sig.select(
        "doc_id", "simhash", F.explode(F.array(*chunk_structs)).alias("ch")
    ).select("doc_id", "simhash", F.col("ch.c").alias("c"), F.col("ch.v").alias("v"))
    grouped = chunks.groupBy("c", "v").agg(
        F.sort_array(F.collect_list(F.struct("doc_id", "simhash"))).alias("ds")
    )
    grouped = grouped.where(F.size("ds") >= 2)
    if max_bucket is not None:
        grouped = grouped.where(F.size("ds") <= max_bucket)
    pair_expr = F.expr(
        "flatten(transform(ds, (x, k) -> transform(slice(ds, k + 2, size(ds)), "
        "y -> struct(x.doc_id AS i, y.doc_id AS j, x.simhash AS si, y.simhash AS sj))))"
    )
    return (
        grouped
        .select(F.explode(pair_expr).alias("p"))
        .select(
            F.col("p.i").alias("i"),
            F.col("p.j").alias("j"),
            F.bit_count(F.col("p.si").bitwiseXOR(F.col("p.sj"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    min_jaccard: float = 0.2,
    max_df: int | None = None,
) -> DataFrame:
    """n-gram Jaccard similarity via a shared-shingle join.

    |A∩B| comes from a groupBy over the (shingle → doc) inverted
    index joined with itself; |A∪B| = |A| + |B| − |A∩B|. Two shuffles
    (index build, pair count) — never materializes all pairs.

    ``max_df`` caps the join fan-out at scale: shingles appearing in
    more than ``max_df`` documents are dropped from the *intersection*
    join (each contributes O(df²) candidate pairs while carrying no
    discriminative signal). ``|A|``/``|B|`` still count every shingle,
    so Jaccard is slightly *under*-estimated for pairs that share hot
    shingles — the standard production trade for bounded skew. None =
    exact (the oracle path).
    """
    from spark_tsne_spark.partitioning import widen_small_input

    # Shingle once; per-doc set sizes come straight off the unexploded
    # arrays as a NARROW F.size projection (no shuffle, nothing
    # persisted — recomputing the shingling for the sizes branch costs
    # the same scan the groupBy alternative would, without its doc_id
    # exchange).
    # project_barrier + word_ngrams_of: tokenize ONCE per row in a
    # fenced Project — raw word_ngrams(text) re-splits the document
    # per n-gram inside the interpreted HOF lambda (see
    # functions.text.project_barrier)
    toked = project_barrier(
        widen_small_input(docs),
        F.col(id_col).alias("doc_id"),
        tokens(text_col).alias("_toks"),
    )
    base = toked.select(
        "doc_id",
        F.array_distinct(word_ngrams_of(F.col("_toks"), n)).alias("gs"),
    )
    # explode_outer, not explode: a plain explode lets Catalyst infer
    # `size(gs) > 0 AND isnotnull(gs)` (InferFiltersFromGenerate) and
    # push that Filter below the widening Exchange — re-evaluating the
    # whole shingling expression serially on the un-widened scan
    # (measured as a single-task ~6s stage, ~the entire query cost at
    # sf0.1). outer generate has no such constraint; the null rows from
    # gram-less docs are dropped right after, above the exchange.
    grams = (
        base.select("doc_id", F.explode_outer("gs").alias("g"))
        .where(F.col("g").isNotNull())
    )
    # coalesce makes n_grams NON-NULLABLE, which matters for the plan:
    # the final joins' jaccard filter infers IsNotNull(n_grams), and on
    # a nullable column that null-check is pushed below the repartition
    # — re-evaluating the whole shingling expression inside a Filter on
    # the un-widened scan (measured: 2 single-task ~5s stages, the
    # entire query cost). Non-nullable ⇒ Catalyst folds the check away.
    sizes = base.select(
        "doc_id", F.coalesce(F.size("gs"), F.lit(0)).alias("n_grams")
    )
    # Intersection counts via grouped pair-emit: ONE shuffle groups the
    # inverted index by shingle, then all i<j doc pairs per shingle are
    # expanded JVM-side with nested `transform` (no self-join of the
    # full index — the sort-merge of two |index|-row sides is replaced
    # by a groupBy of one). The max_df hot-shingle cap becomes a
    # post-aggregation size filter on the same pass.
    grouped = grams.groupBy("g").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ds")
    )
    if max_df is not None:
        grouped = grouped.where(F.size("ds") <= max_df)
    pair_expr = F.expr(
        "flatten(transform(ds, (x, k) -> "
        "transform(slice(ds, k + 2, size(ds)), y -> struct(x AS i, y AS j))))"
    )
    shared = (
        grouped.select(F.explode(pair_expr).alias("pr"))
        .groupBy(F.col("pr.i").alias("i"), F.col("pr.j").alias("j"))
        .agg(F.count("*").alias("n_shared"))
    )
    # No forced broadcast: `sizes` is one row per document (too big to
    # broadcast at corpus scale); AQE converts these to broadcast joins
    # at runtime whenever the measured side fits.
    sa = sizes.select(F.col("doc_id").alias("i"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("j"), F.col("n_grams").alias("nb"))
    return (
        shared.join(sa, "i")
        .join(sb, "j")
        .select(
            "i",
            "j",
            (
                F.col("n_shared")
                / (F.col("na") + F.col("nb") - F.col("n_shared"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: which corpus documents share any
    word ``n``-gram with a benchmark/eval set (the standard 8-gram
    overlap test used to scrub test-set contamination from training
    corpora). Returns ``(doc_id, bench_id, n_shared)`` — one row per
    contaminated (document, benchmark item) pair with the count of
    distinct shared n-grams.

    Plan shape: both sides shingle narrowly, the inverted-index join
    runs on the n-gram string. The benchmark side is the small one by
    nature (eval sets are thousands of rows, corpora are billions) —
    AQE broadcasts it when it fits; the join never touches corpus
    pairs, only (corpus n-gram, benchmark n-gram) matches.
    """
    from spark_tsne_spark.functions.text import (
        project_barrier,
        tokens,
        word_ngrams_of,
    )

    d = project_barrier(
        docs, F.col(id_col).alias("doc_id"), tokens(text_col).alias("_tk")
    ).select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams_of(F.col("_tk"), n))).alias("g"),
    )
    b = project_barrier(
        benchmark,
        F.col(bench_id_col).alias("bench_id"),
        tokens(bench_text_col).alias("_tk"),
    ).select(
        "bench_id",
        F.explode(F.array_distinct(word_ngrams_of(F.col("_tk"), n))).alias("g"),
    )
    return (
        d.join(b, "g")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_shared"))
    )


def duplicate_clusters(
    pairs: DataFrame,
    vertices: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 20,
    small_edge_threshold: int = 5_000_000,
) -> DataFrame:
    """Connected components over near-dup candidate pairs → clusters.

    The step after candidate generation in a production dedup
    pipeline: documents linked by any chain of candidate pairs collapse
    into one cluster labeled by its minimum id.

    Two physical strategies, picked by edge count:

    - **driver union-find** when the edge set is small (candidate
      pairs after LSH are orders of magnitude smaller than the corpus
      — the usual production case): collect (i, j), union-find on the
      driver, broadcast-join the non-singleton labels back onto the
      vertices. One collect + one broadcast join; no iteration.
    - **iterative min-label propagation** beyond the threshold: each
      round, every vertex takes the min of its own label and its
      neighbors' labels; converges in O(component diameter) rounds
      (near-dup clusters are shallow). Each round is one shuffle
      (groupBy dst) + one join; lineage is cut per round with
      ``localCheckpoint`` so plans stay flat at scale.

    ``pairs``: (i, j) candidate edges. ``vertices``: table carrying
    ``id_col`` (isolated docs form singleton clusters). Returns
    ``(id_col, cluster_id)``.
    """
    pairs = pairs.select("i", "j").localCheckpoint()
    n_edges = pairs.count()
    if n_edges <= small_edge_threshold:
        # One Arrow pull (toPandas, not Row-object collect — the edge
        # set lands as two int64 columns), then linear union-find.
        epdf = pairs.toPandas()
        src, dst = epdf["i"].to_numpy(), epdf["j"].to_numpy()
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for a_, b_ in zip(src.tolist(), dst.tolist()):
            ri, rj = find(a_), find(b_)
            if ri != rj:  # union by min id → label IS the min member
                if rj < ri:
                    ri, rj = rj, ri
                parent[rj] = ri
        import numpy as _np
        import pandas as _pd

        keys = list(parent)
        lab_pdf = _pd.DataFrame(
            {
                "_cc_id": _np.asarray(keys, dtype=_np.int64),
                "_cc_label": _np.asarray(
                    [find(x) for x in keys], dtype=_np.int64
                ),
            }
        )
        spark = pairs.sparkSession
        lab_df = spark.createDataFrame(lab_pdf, "_cc_id long, _cc_label long")
        return vertices.select(F.col(id_col)).join(
            F.broadcast(lab_df), F.col(id_col) == F.col("_cc_id"), "left"
        ).select(
            F.col(id_col),
            F.coalesce(F.col("_cc_label"), F.col(id_col)).alias("cluster_id"),
        )
    edges = pairs.select(F.col("i").alias("src"), F.col("j").alias("dst")).unionAll(
        pairs.select(F.col("j").alias("src"), F.col("i").alias("dst"))
    )
    edges = edges.localCheckpoint()
    labels = vertices.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    labels = labels.localCheckpoint()
    for _ in range(max_iter):
        nbr = (
            edges.join(
                labels.select(
                    F.col("id").alias("src"), F.col("label").alias("src_label")
                ),
                "src",
            )
            .groupBy("dst")
            .agg(F.min("src_label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr, labels["id"] == nbr["dst"], "left")
            .select(
                labels["id"],
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("id").alias(id_col), F.col("label").alias("cluster_id"))


def canonical_corpus(
    vertices: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    **cluster_kwargs,
) -> DataFrame:
    """The deduplicated corpus: one representative row per duplicate
    cluster (the minimum-id member — the cluster's own label), all
    columns of ``vertices`` preserved.

    This is the step pipelines actually consume — candidate pairs and
    cluster labels are intermediates; training reads the kept rows.
    The keep-list (ids where ``cluster_id == id``) is a projection of
    the label frame, and the final semi-join broadcasts it when small
    (AQE converts at runtime), so dedup adds no extra shuffle over the
    clustering itself.
    """
    labels = duplicate_clusters(pairs, vertices, id_col=id_col, **cluster_kwargs)
    keep = labels.where(F.col("cluster_id") == F.col(id_col)).select(id_col)
    return vertices.join(keep, id_col, "semi")


def embedding_near_dups(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.95,
    method: str = "exact",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    'exact': all i<j pairs (small n / verification); 'lsh': random
    hyperplane bucketing first (scale path) — candidates only from
    matching sign-buckets, then exact cosine verify.
    """
    base = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", l2_norm("v"))
    if method == "lsh":
        # 8 random-hyperplane signs via md5-seeded pseudo-projections is
        # overkill here; reuse minhash-style banding on sign pattern of
        # the first 8 dimensions as a cheap, deterministic bucket.
        base = base.withColumn(
            "bucket",
            F.concat_ws(
                "",
                *[(F.element_at("v", i + 1) > 0).cast("int").cast("string") for i in range(8)],
            ),
        )
        a = base.alias("a")
        b = base.alias("b")
        cond = (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id"))
    else:
        par = emb.sparkSession.sparkContext.defaultParallelism
        a = base.repartition(par).alias("a")
        b = base.coalesce(1).alias("b")
        cond = F.col("a.id") < F.col("b.id")
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("i"),
            F.col("b.id").alias("j"),
            cosine_sim(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .where(F.col("cosine") >= min_cosine)
    )


def semdedup(
    emb: DataFrame,
    threshold: float = 0.97,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup
    by clustering embeddings and pruning near-identical points within
    each cluster.

    Plan shape (the paper's pipeline, Spark-first):

    1. coarse k-means on a bounded driver-side sample (reuses the IVF
       quantizer — FAISS-style, deterministic in ``seed``);
    2. one narrow ``mapInPandas`` pass assigns every row to its argmax
       cluster (broadcast centroids, vectorized — no shuffle);
    3. ONE shuffle groups rows by cluster; ``applyInPandas`` computes
       the within-cluster cosine matrix and applies the paper's rule:
       a point is REMOVED when its max cosine to any lower-id point in
       the cluster is ≥ ``threshold`` (the reference implementation's
       ``torch.triu`` max — note the comparison set is lower-*id*
       points, kept or not, exactly as in the paper's code).

    Work is O(Σ c²·d) over cluster sizes c — bounded by choosing
    ``n_clusters`` ∝ n so clusters stay ~10⁴ rows (BLAS-speed
    matmuls); never an all-pairs join across clusters. Output is one
    row per input: ``(id, cluster, keep, max_prior_sim)`` with
    ``max_prior_sim`` rounded to 6 decimals (−1.0 for the cluster's
    lowest id, which is always kept).
    """
    from pyspark.sql import types as T

    from spark_tsne_spark.operators.similarity import _kmeans_centroids
    from spark_tsne_spark.shipping import ship_package

    ship_package(emb.sparkSession)
    base = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    C, n_corpus = _kmeans_centroids(base, n_clusters, seed)
    sc = emb.sparkSession.sparkContext
    b_C = sc.broadcast(C)

    assign_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.ArrayType(T.DoubleType())),
            T.StructField("cluster", T.IntegerType()),
        ]
    )

    def assign(batches):
        import numpy as np
        import pandas as pd

        from spark_tsne_spark.runtime import tune_worker as tune_malloc

        tune_malloc()
        C_ = b_C.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(pdf["v"].tolist(), dtype=np.float64)
            nrm = np.linalg.norm(X, axis=1, keepdims=True)
            Xn = np.divide(X, nrm, out=np.zeros_like(X), where=nrm > 0)
            yield pd.DataFrame(
                {
                    "id": pdf["id"].to_numpy(),
                    "v": pdf["v"],
                    "cluster": np.argmax(Xn @ C_.T, axis=1).astype(np.int32),
                }
            )

    out_schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("keep", T.BooleanType()),
            T.StructField("max_prior_sim", T.DoubleType()),
        ]
    )

    def prune(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values("id").reset_index(drop=True)
        X = np.array(pdf["v"].tolist(), dtype=np.float64)
        nrm = np.linalg.norm(X, axis=1, keepdims=True)
        Xn = np.divide(X, nrm, out=np.zeros_like(X), where=nrm > 0)
        c = len(pdf)
        if c == 1:
            prior = np.array([-1.0])
        else:
            S = Xn @ Xn.T
            # prior[j] = max_{i<j} S[i, j]: entries with row < column
            # are the strict upper triangle, so mask the diagonal and
            # lower triangle before the column-wise max.
            S[np.tril_indices(c)] = -2.0
            prior = S.max(axis=0)
            prior[0] = -1.0
        return pd.DataFrame(
            {
                "id": pdf["id"].to_numpy(),
                "cluster": pdf["cluster"].to_numpy(),
                "keep": prior < threshold,
                "max_prior_sim": np.round(prior, 6),
            }
        )

    # Cluster assignment is row-local — run it over the scan's natural
    # partitioning (the groupBy below shuffles by cluster anyway; a
    # repartition before a map-only kernel is a wasted full-corpus
    # shuffle at scale and a wasted stage at bench scale).
    return (
        base.mapInPandas(assign, assign_schema)
        .groupBy("cluster")
        .applyInPandas(prune, out_schema)
    )


def incremental_exact_flags(
    new_docs: DataFrame,
    corpus_fps: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fp_col: str = "fp",
) -> DataFrame:
    """Incremental exact dedup: flag each NEW document against the
    already-ingested corpus — the daily-increment pattern (a 100 TB
    corpus is deduplicated once; each arriving batch joins the stored
    fingerprint index instead of re-scanning the corpus).

    Returns one row per new doc: ``(doc_id, dup_of_corpus,
    dup_within_batch)`` — ``dup_within_batch`` marks every copy after
    the lowest-id occurrence inside the batch itself.

    Scale shape: the join key is the canonical md5 fingerprint —
    uniform, so no skew; store the corpus index bucketed by ``fp``
    (``.write.bucketBy(N, 'fp')``) and the daily join is
    exchange-free on the corpus side.
    """
    n = new_docs.select(
        F.col(id_col).alias("doc_id"), fingerprint(text_col).alias("fp")
    )
    seen = (
        corpus_fps.select(F.col(fp_col).alias("fp"))
        .distinct()
        .withColumn("in_corpus", F.lit(True))
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        n.join(seen, "fp", "left")
        .withColumn("dup_of_corpus", F.coalesce("in_corpus", F.lit(False)))
        .withColumn("dup_within_batch", F.row_number().over(w) > 1)
        .select("doc_id", "dup_of_corpus", "dup_within_batch")
    )


def incremental_minhash_candidates(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    band_size: int = 4,
    shingle_k: int = 5,
    hash_fn: str = "md5",
    max_bucket: int | None = None,
) -> DataFrame:
    """Incremental MinHash-LSH: near-dup candidates between a NEW
    batch and an existing banded index (rows from
    :func:`minhash_bands`, typically persisted bucketed by
    ``(band, sig)``).

    Returns distinct ``(i, j)`` with ``i`` = corpus doc, ``j`` = new
    doc. Within-batch pairs are NOT included — run
    :func:`minhash_lsh_candidates` on the batch for those (it is tiny
    relative to the corpus). The join is on ``(band, sig)`` only —
    work scales with bucket occupancy of the new batch's signatures,
    never with corpus size. ``max_bucket`` drops buckets where the
    corpus side exceeds the cap (same mega-clique contract as the
    batch path).
    """
    new_bands = minhash_bands(
        new_docs, id_col, text_col, num_hashes, band_size, shingle_k, hash_fn
    )
    ix = index
    if max_bucket is not None:
        counts = ix.groupBy("band", "sig").agg(F.count("*").alias("_bw"))
        ix = ix.join(
            counts.where(F.col("_bw") <= max_bucket).drop("_bw"),
            ["band", "sig"],
        )
    return (
        ix.alias("ix")
        .join(new_bands.alias("nb"), ["band", "sig"])
        .where(F.col("ix.doc_id") != F.col("nb.doc_id"))
        .select(
            F.col("ix.doc_id").alias("i"), F.col("nb.doc_id").alias("j")
        )
        .distinct()
    )


def fuzzy_prefix_pairs(
    docs: DataFrame,
    prefix_len: int = 24,
    max_bucket: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_edit: int = 1,
) -> DataFrame:
    """Document pairs whose normalized ``prefix_len``-char prefix is
    within edit distance ``max_edit`` (1 or 2) — fuzzy entity/title
    matching.

    The naive plan is an all-pairs ``levenshtein`` theta join (O(n²)
    string comparisons). This is the SymSpell deletion-neighborhood
    form: every prefix emits itself plus its single-char deletions
    (and, at ``max_edit=2``, the two-char deletions — bounded
    ``O(prefix_len²)`` fan-out, all built with JVM array
    expressions). Two strings are within edit distance k iff their
    depth-k deletion neighborhoods intersect (align the edit script:
    deleting the edited positions from each side reaches a common
    string), so the pair space collapses to an equi join on the
    variant — work scales with variant-bucket occupancy, never n².
    Shared variants can also join farther pairs (different deletion
    positions), so candidates are verified with ONE exact
    ``levenshtein`` per distinct pair. ``max_bucket`` drops hot
    variants (mega-clique cap, same contract as the MinHash path).

    Returns ``(i, j, dist)`` with ``i < j`` and ``dist ≤ max_edit``.
    """
    if max_edit not in (1, 2):
        raise ValueError(f"max_edit must be 1 or 2, got {max_edit}")
    # INVARIANT: pf is a pure function of the doc row (one pf per id),
    # so any two rows sharing (v, id) downstream are bit-identical —
    # the heavy path's row_number survivor pick relies on this.
    pf = F.lower(F.substring(F.trim(F.col(text_col)), 1, prefix_len))
    base = docs.select(
        F.col(id_col).alias("id"), pf.alias("pf")
    ).where(F.length("pf") >= 2)
    # At max_edit=2 the variant explode multiplies each doc
    # ~prefix_len²/2-fold, so its parallelism is the SCAN's
    # partitioning — a few parquet splits at bench scale (measured:
    # the whole 1.5M-variant build ran on 3 of 32 cores, 0.64 s where
    # 32-way is ~0.2 s). Spread the thin (id, pf) rows across the
    # cluster BEFORE fanning out; no-op when the scan is already
    # parallel (a big input at scale). (guide §2.5/§2.6) At max_edit=1
    # the fan-out is only ~prefix_len rows/doc and the widen's extra
    # exchange+stage floors are a measured net LOSS at bench shape
    # (variant matrix, r12: ed1 uncapped min 0.86 s un-widened vs
    # 1.22 s widened; the one-exchange tail below is a wash there,
    # 0.94 s) — so widen only on the heavy fan-out.
    if max_edit == 2:
        from spark_tsne_spark.partitioning import widen_small_input

        base = widen_small_input(base)

    # Variants are built with PLAIN explode + substring/concat
    # projections, not higher-order array functions: Spark evaluates
    # `transform` lambdas interpreted per element (outside
    # whole-stage codegen), which made the neighborhood build — not
    # the join — the bottleneck (measured 7.1 s of a 9.5 s sf0.1 run
    # for ~1.5M variants; this form generates the same rows inside
    # codegen). Per-doc duplicate variants (repeated chars: deleting
    # either copy lands on the same string) are removed by ONE
    # (id, v) dropDuplicates, matching the old array_union/
    # array_distinct semantics exactly — so bucket counts and results
    # are unchanged.
    L = F.length("pf")
    v0 = base.select("id", "pf", F.col("pf").alias("v"))
    d1 = base.select(
        "id", "pf", F.explode(F.sequence(F.lit(1), L)).alias("i")
    ).select(
        "id",
        "pf",
        F.concat(
            F.substring(F.col("pf"), F.lit(1), F.col("i") - 1),
            F.substring(F.col("pf"), F.col("i") + 1, F.lit(prefix_len)),
        ).alias("v"),
    )
    parts = [v0, d1]
    if max_edit == 2:
        # delete positions i < j of the ORIGINAL string — enumerating
        # ordered pairs once halves the naive depth-2 fan-out
        d2 = (
            base.select(
                "id", "pf", F.explode(F.sequence(F.lit(1), L - 1)).alias("i")
            )
            .select(
                "id",
                "pf",
                "i",
                F.explode(
                    F.sequence(F.col("i") + 1, F.length("pf"))
                ).alias("j"),
            )
            .select(
                "id",
                "pf",
                F.concat(
                    F.substring(F.col("pf"), F.lit(1), F.col("i") - 1),
                    F.substring(
                        F.col("pf"), F.col("i") + 1, F.col("j") - F.col("i") - 1
                    ),
                    F.substring(F.col("pf"), F.col("j") + 1, F.lit(prefix_len)),
                ).alias("v"),
            )
        )
        parts.append(d2)
    exploded = parts[0]
    for p in parts[1:]:
        exploded = exploded.unionByName(p)
    # Tail structure is gated on the fan-out, mirroring the widen
    # (round 12; guide §1 measure-first, §2.4):
    #
    # max_edit=2 (~prefix_len²/2 variants/doc): ONE exchange for the
    # whole tail. The old chain shuffled twice — dropDuplicates(id, v)
    # hash-partitions by (id, v), which does NOT satisfy the
    # v-clustering the bucket window and the self-join need, so a
    # second full exchange by v followed (measured +1.36 s of the
    # 3.7 s sf0.1 run for the dedup exchange alone). An explicit
    # repartition("v") up front instead: HashPartitioning(v) satisfies
    # ClusteredDistribution(v, id), so the per-doc variant dedup
    # (row_number over (v, id) — duplicate rows are bit-identical, any
    # survivor is THE row), the bucket-cap window (count over v; its
    # [v] sort is a satisfied prefix of the (v, id) sort), and both
    # self-join sides (ReusedExchange) all run off the SAME shuffle.
    #
    # max_edit=1 (~prefix_len variants/doc): the volume is too small
    # for the explicit exchange + sorted window to repay their stage
    # floors — measured ABBA at sf0.1 under bench methodology: legacy
    # dropDuplicates tail min 0.96 s vs one-exchange tail min
    # 1.08-1.28 s — so the light path keeps the hash-agg dedup and
    # lets AQE broadcast the tiny self-join.
    #
    # Same rows survive, same bucket counts, same pairs either way —
    # pinned by the unchanged catalog oracles.
    from pyspark.sql import Window

    heavy = max_edit == 2
    if heavy:
        exploded = (
            exploded.repartition("v")
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy("v", "id").orderBy("id")
                ),
            )
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        exploded = exploded.dropDuplicates(["id", "v"])
    if max_bucket is not None:
        exploded = exploded.withColumn(
            "_bw", F.count("*").over(Window.partitionBy("v"))
        ).where(F.col("_bw") <= max_bucket).drop("_bw")
    if max_bucket is not None and heavy:
        # Capped heavy path: the variant self-join RECOMPUTED the
        # whole explode+dedup chain for its second side (the optimizer
        # broadcast-converts the self-join at runtime, and a broadcast
        # build side is a fresh subtree, not a ReusedExchange —
        # measured ~1 s of the 3.3 s sf0.1 chain). With the cap
        # filter in place every bucket is ≤ max_bucket rows, so
        # in-bucket pair emission is memory-bounded: group the capped
        # rows by v (SortAggregate over the SAME v-partitioning/sort —
        # no new exchange) and Generate the i<j pairs from the bucket
        # list. One copy of the chain, same pairs. The uncapped path
        # (catalog entries) keeps the streaming join: an uncapped
        # mega-bucket's collect_list is unbounded state, and bounded
        # memory there matters more than the duplicated subtree.
        bucket = exploded.groupBy("v").agg(
            F.collect_list(F.struct("id", "pf")).alias("m")
        )
        cands = (
            bucket.select(F.explode("m").alias("a"), "m")
            .select("a", F.explode("m").alias("b"))
            .where(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("i"),
                F.col("b.id").alias("j"),
                F.col("a.pf").alias("pi"),
                F.col("b.pf").alias("pj"),
            )
            .dropDuplicates(["i", "j"])
        )
    else:
        a = exploded.alias("a")
        b = exploded.alias("b")
        cands = (
            a.join(b, on="v")
            .where(F.col("a.id") < F.col("b.id"))
            .select(
                F.col("a.id").alias("i"),
                F.col("b.id").alias("j"),
                F.col("a.pf").alias("pi"),
                F.col("b.pf").alias("pj"),
            )
            .dropDuplicates(["i", "j"])
        )
    return (
        cands.withColumn("dist", F.levenshtein("pi", "pj").cast("long"))
        .where(F.col("dist") <= max_edit)
        .select("i", "j", "dist")
    )


def semantic_contamination(
    train: DataFrame,
    evalset: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.8,
) -> DataFrame:
    """Cross-corpus SEMANTIC decontamination: flag training vectors
    whose embedding cosine against ANY eval-set vector reaches
    ``min_cosine`` — the embedding-space counterpart of
    ``ngram_contamination`` (which catches verbatim/near-verbatim
    leakage; this catches paraphrases). Returns
    ``(train_id, eval_id, cosine)`` per offending pair.

    Shape: the eval set is broadcast (benchmark suites are thousands
    of rows — dimension-table-sized by construction) and the train
    corpus streams through ONE narrow pass; no shuffle of the big
    side, cost |train|·|eval|·d JVM-side flops. For eval sets beyond
    broadcast size, route through ``similarity.ivf_topk`` with the
    eval rows as queries instead.
    """
    t = train.select(
        F.col(id_col).alias("train_id"),
        F.col(vec_col).cast("array<double>").alias("tv"),
    )
    e = evalset.select(
        F.col(id_col).alias("eval_id"),
        F.col(vec_col).cast("array<double>").alias("ev"),
    )
    return (
        t.join(F.broadcast(e))
        .select(
            "train_id",
            "eval_id",
            F.round(cosine_sim(F.col("tv"), F.col("ev")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= min_cosine)
    )


def remove_boilerplate_lines(
    docs: DataFrame,
    max_df: int = 2,
    min_chars: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4/CCNet-style boilerplate line removal: drop every line whose
    normalized form (lowercased, whitespace-trimmed) appears in more
    than ``max_df`` distinct documents — headers, footers, cookie
    banners, navigation chrome — and reassemble each document from
    its surviving lines in original order.

    Lines shorter than ``min_chars`` after trimming are never removal
    candidates (blank separators and one-word lines would otherwise
    dominate the frequent set and merge unrelated paragraphs).

    Output: ``(doc_id, text, n_lines, n_removed)`` — ``text`` is the
    cleaned document ('' if every line was boilerplate).

    Shape at 100 TB: ONE posexplode (narrow), ONE line-key groupBy
    with map-side partial ``count(distinct doc)`` (uniform md5 keys —
    no skew), and the join back is against only the FREQUENT keys —
    typically small (each member costs > max_df documents of
    evidence) but not bounded, so the join carries no broadcast hint:
    AQE picks broadcast when the measured set fits and falls back to
    a shuffle join when web-scale boilerplate blows it up. Reassembly
    is one per-doc groupBy. No driver loops, no collect.
    """
    lines = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn(
        "lk",
        F.when(
            F.length(F.trim("line")) >= min_chars,
            F.md5(F.lower(F.trim("line"))),
        ),
    )
    frequent = (
        lines.where(F.col("lk").isNotNull())
        .groupBy("lk")
        .agg(F.countDistinct("doc_id").alias("df"))
        .where(F.col("df") > max_df)
        .select("lk")
    )
    # No explicit broadcast hint: the frequent set is *usually* tiny
    # (each member costs > max_df documents of evidence) but is not
    # bounded — a permissive max_df over web-scale boilerplate can
    # yield millions of rows, and a forced F.broadcast would bypass
    # AQE's size threshold and OOM the driver. Let AQE pick broadcast
    # vs shuffle from the measured size at runtime.
    kept = lines.join(
        frequent.withColumn("_hit", F.lit(True)), on="lk", how="left"
    ).withColumn("_drop", F.coalesce("_hit", F.lit(False)))
    return kept.groupBy("doc_id").agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.filter(
                        F.collect_list(
                            F.struct(
                                "pos", "line", F.col("_drop").alias("d")
                            )
                        ),
                        lambda s: ~s["d"],
                    )
                ),
                lambda s: s["line"],
            ),
        ).alias("text"),
        F.count("*").alias("n_lines"),
        F.sum(F.col("_drop").cast("long")).alias("n_removed"),
    )


def bloom_incremental_flags(
    batch: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> DataFrame:
    """Incremental dedup against a corpus via a DISTRIBUTED Bloom
    filter prefilter + exact confirmation join. Returns
    ``(doc_id, is_new)`` for every batch row — exactly the anti-join
    of batch fingerprints against corpus fingerprints (the Bloom
    stage only prunes; false positives are re-checked, and a Bloom
    filter has no false negatives by construction, which the oracle
    comparison enforces end-to-end).

    Build (pure DataFrame ops, exact integer arithmetic):

    1. each corpus fingerprint sets ``num_hashes`` bit positions
       ``md5("bf{i}" || fp) mod num_bits`` (the catalog's portable
       60-bit md5 bucket primitive);
    2. positions pack into 64-bit words via ``groupBy(word_idx) →
       bit_or(mask)`` — the filter IS a DataFrame of at most
       ``num_bits/64`` rows, built with one uniform-key shuffle and
       map-side partial OR; it is never collected to the driver.
    3. batch probes join the words table on ``word_idx`` (the words
       side is ≤ 16 K rows at the default sizing — AQE broadcasts
       it); a row is a duplicate CANDIDATE iff all ``num_hashes``
       probed bits are set;
    4. only candidates (true dups + the ~(1-e^{-kn/m})^k false
       positives) pay the exact fingerprint semi-join against the
       corpus; everything else is new without touching the corpus.

    At 100 TB the win is step 4's join shrinking from |batch| to
    |dups| + ε: with a mostly-novel batch the corpus-side shuffle
    disappears. Size ``num_bits`` ≈ 10 bits/corpus key for ~1% FP.
    """
    from spark_tsne_spark.operators.sampling import hash_bucket

    if num_bits <= 0 or num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a positive multiple of 64, got {num_bits}")
    if num_hashes < 1:
        raise ValueError(f"num_hashes must be >= 1, got {num_hashes}")

    def positions(fp_col):
        return F.array(
            *[
                F.pmod(hash_bucket(fp_col, f"bf{i}"), F.lit(num_bits))
                for i in range(num_hashes)
            ]
        )

    corpus_fp = corpus.select(fingerprint(text_col).alias("fp")).distinct()
    words = (
        corpus_fp.select(F.explode(positions(F.col("fp"))).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("word"))
    )

    b = batch.select(
        F.col(id_col).alias("doc_id"), fingerprint(text_col).alias("fp")
    )
    probes = b.select("doc_id", F.explode(positions(F.col("fp"))).alias("pos")).select(
        "doc_id",
        (F.col("pos") / 64).cast("long").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias(
            "mask"
        ),
    )
    candidates = (
        probes.join(words, on="word_idx", how="left")
        .withColumn(
            "hit",
            F.coalesce(
                F.col("word").bitwiseAND(F.col("mask")) != 0, F.lit(False)
            ),
        )
        .groupBy("doc_id")
        .agg(F.min("hit").alias("all_hit"))  # bool AND over the k probes
        .where(F.col("all_hit"))
        .select("doc_id")
    )
    confirmed = (
        b.join(candidates, on="doc_id", how="leftsemi")
        .join(corpus_fp, on="fp", how="leftsemi")
        .select("doc_id", F.lit(False).alias("is_new"))
    )
    return b.select("doc_id").join(confirmed, on="doc_id", how="left").select(
        "doc_id", F.coalesce("is_new", F.lit(True)).alias("is_new")
    )


def source_overlap_matrix(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source duplicate contamination matrix: for every pair of
    sources (crawls, dumps, vendors), how many distinct canonical
    documents appear in BOTH — the first report a curation run pulls
    when deciding which overlapping sources to keep.

    Returns ``(src_a, src_b, n_shared)`` with ``src_a < src_b``.

    Shape: ONE (source, fp) distinct (map-side partial), ONE fp
    groupBy collecting the ≤ |sources| distinct sources per
    fingerprint, then JVM-side i<j pair expansion and a pair groupBy
    — the md5 key is uniform so neither shuffle skews, and no
    fp-keyed self-join ever materializes (a fingerprint shared by all
    S sources costs S²/2 emitted pairs, bounded by the source count,
    not the corpus)."""
    fps = docs.select(
        F.col(source_col).alias("src"), fingerprint(text_col).alias("fp")
    ).distinct()
    grouped = fps.groupBy("fp").agg(
        F.array_sort(F.collect_set("src")).alias("ss")
    ).where(F.size("ss") >= 2)
    pair_expr = F.expr(
        "flatten(transform(ss, (x, k) -> "
        "transform(slice(ss, k + 2, size(ss)), y -> struct(x AS a, y AS b))))"
    )
    return (
        grouped.select(F.explode(pair_expr).alias("p"))
        .groupBy(F.col("p.a").alias("src_a"), F.col("p.b").alias("src_b"))
        .agg(F.count("*").alias("n_shared"))
    )


def sorted_neighborhood_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
    window: int = 8,
    max_hamming: int = 3,
    rank_partitions: int = 32,
) -> DataFrame:
    """Sorted-neighborhood near-dup blocking (Hernández–Stolfo): sort
    by (simhash, id), compare each row only to its ``window``
    successors in that order, keep pairs within ``max_hamming`` bits.

    The distinguishing property vs bucket blocking (LSH bands /
    pigeonhole chunks): the comparison budget is EXACTLY n·window no
    matter how skewed the key distribution is — a degenerate corpus
    where half the rows share one signature costs the same as a
    uniform one, so there is no mega-clique cap to tune. The price is
    recall: only neighbors within the window are seen (the classic
    trade; multi-pass with different sort keys recovers recall).

    Scale shape — no global single-partition sort:
    1. global rank via range partitioning: ``repartitionByRange`` on
       the sort key gives ordered, disjoint ranges; per-partition
       ``row_number`` plus a P-row offset table (cumulative sum over
       per-partition counts, the standard two-stage ranking) yields
       the total rank without ever sorting on one node. The offsets
       are computed RELATIONALLY inside the same plan — both the
       count branch and the rank branch hang off the one range
       exchange, which ReuseExchange materializes exactly once.
       (A collect()-then-reuse formulation would run the range
       exchange twice, and repartitionByRange boundaries come from
       reservoir sampling — two executions may bucket rows
       differently, silently corrupting ranks at exactly the scale
       where partitions outgrow the sample. One plan = one sampling
       = one consistent pid assignment.);
    2. window join via rank buckets of width ``window``: a pair at
       rank distance ≤ window lies in the same or adjacent bucket, so
       the right side emits into (bucket, bucket-1) — 2× one side,
       then a plain shuffled equi-join on bucket; every qualifying
       pair is produced exactly once (via b's own bucket when
       co-bucketed, else via b's predecessor emit).

    Output: ``(i, j, hamming)`` with rank(i) < rank(j). Deterministic:
    the (simhash, id) total order is strict, so ranks — and therefore
    pairs — do not depend on partition boundaries.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    sig = simhash(docs, id_col, text_col, bits)
    part = sig.repartitionByRange(
        rank_partitions, "simhash", "doc_id"
    ).withColumn("pid", F.spark_partition_id())
    from pyspark.sql import Window as W

    # P-row offset table: rank offset of partition p = rows in p' < p.
    # Computed as a second branch of the SAME plan so ReuseExchange
    # materializes the range shuffle once and both branches see one
    # consistent pid assignment (see docstring). The offset window is
    # single-partition but runs over only `rank_partitions` rows.
    off = (
        part.groupBy("pid")
        .agg(F.count("*").alias("n"))
        .select(
            "pid",
            F.coalesce(
                F.sum("n").over(
                    W.orderBy("pid").rowsBetween(
                        W.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("off"),
        )
    )
    rn = F.row_number().over(
        W.partitionBy("pid").orderBy("simhash", "doc_id")
    )
    ranked = (
        part.join(F.broadcast(off), "pid")
        .withColumn("rnk", (rn + F.col("off")).cast("long"))
        .select("doc_id", "simhash", "rnk")
    )
    bucket = ((F.col("rnk") - 1) / window).cast("long")
    left = ranked.select(
        bucket.alias("bucket"),
        F.col("doc_id").alias("i"),
        F.col("simhash").alias("sig_i"),
        F.col("rnk").alias("ri"),
    )
    right = ranked.select(
        F.explode(F.array(bucket, bucket - 1)).alias("bucket"),
        F.col("doc_id").alias("j"),
        F.col("simhash").alias("sig_j"),
        F.col("rnk").alias("rj"),
    )
    ham = F.bit_count(
        F.col("sig_i").bitwiseXOR(F.col("sig_j"))
    ).cast("long")
    return (
        left.join(right, "bucket")
        .where(
            (F.col("rj") > F.col("ri"))
            & (F.col("rj") - F.col("ri") <= window)
        )
        .select("i", "j", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def ngram_containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    min_containment: float = 0.6,
    max_df: int | None = None,
) -> DataFrame:
    """ASYMMETRIC n-gram containment: C(src → in) =
    |grams(src) ∩ grams(in)| / |grams(src)|.

    The quote/subset detector Jaccard structurally misses: a short
    document fully embedded in a much longer one has tiny Jaccard
    (union is dominated by the long side) but containment 1.0 from
    the short side. Same inverted-index plan as
    ``ngram_jaccard_pairs`` (shingle once, grouped pair-emit, one
    shared-count shuffle — never an all-pairs join); each unordered
    shared-count row then emits BOTH directions with its own
    normalizer, so asymmetry costs no extra shuffle. ``max_df`` is
    the same hot-shingle fan-out cap (containment slightly
    under-estimated for pairs sharing dropped hot shingles).

    Returns ``(src_doc, in_doc, containment)`` rows where
    containment ≥ ``min_containment``.
    """
    from spark_tsne_spark.partitioning import widen_small_input

    toked = project_barrier(
        widen_small_input(docs),
        F.col(id_col).alias("doc_id"),
        tokens(text_col).alias("_toks"),
    )
    base = toked.select(
        "doc_id",
        F.array_distinct(word_ngrams_of(F.col("_toks"), n)).alias("gs"),
    )
    grams = (
        base.select("doc_id", F.explode_outer("gs").alias("g"))
        .where(F.col("g").isNotNull())
    )
    sizes = base.select(
        "doc_id", F.coalesce(F.size("gs"), F.lit(0)).alias("n_grams")
    )
    grouped = grams.groupBy("g").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ds")
    )
    if max_df is not None:
        grouped = grouped.where(F.size("ds") <= max_df)
    pair_expr = F.expr(
        "flatten(transform(ds, (x, k) -> "
        "transform(slice(ds, k + 2, size(ds)), y -> struct(x AS i, y AS j))))"
    )
    shared = (
        grouped.select(F.explode(pair_expr).alias("pr"))
        .groupBy(F.col("pr.i").alias("i"), F.col("pr.j").alias("j"))
        .agg(F.count("*").alias("n_shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("i"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("j"), F.col("n_grams").alias("nb"))
    both = shared.join(sa, "i").join(sb, "j")
    fwd = both.select(
        F.col("i").alias("src_doc"),
        F.col("j").alias("in_doc"),
        (F.col("n_shared") / F.col("na")).alias("containment"),
    )
    rev = both.select(
        F.col("j").alias("src_doc"),
        F.col("i").alias("in_doc"),
        (F.col("n_shared") / F.col("nb")).alias("containment"),
    )
    return fwd.unionAll(rev).where(
        F.col("containment") >= min_containment
    )
