"""Sequence packing + token-budget corpus mixing.

Two pipeline stages every LLM pretraining run needs between "curated
corpus" and "training batches":

- **Sequence packing** (``pack_sequences``): the GPT-style
  concatenate-and-chunk layout — documents are laid end-to-end in a
  deterministic order and the token stream is cut into fixed-size
  blocks; a document may span blocks. The core primitive is a GLOBAL
  exclusive prefix sum over per-document token counts, implemented as
  the classic two-phase distributed scan (``exclusive_prefix_sum``):
  per-partition totals are a tiny driver-side list, the per-row scan
  is partition-local — no global single-partition window anywhere.

- **Token-budget mixture sampling** (``token_budget_sample``): "take
  5M tokens of source A, 1M of source B, in deterministic content-hash
  order" — the data-mixing step that turns per-source weights into an
  actual training corpus. Naively this is a running sum per source
  (a window partitioned by a LOW-cardinality skewed key — the classic
  scale killer). Here the hash order itself is range-bucketed (the
  top bits of the 60-bit content hash are a prefix of the order key),
  so per-(source, bucket) token sums classify every bucket on the
  driver as fully-kept / fully-dropped / boundary, and only the ONE
  boundary bucket per source (~1/256 of it) ever enters a window.

Both are deterministic functions of the data (content hashes, stable
orders), so re-runs, repartitionings, and the DuckDB oracles agree
exactly. No reference counterpart (saurfang/spark-tsne has no text
pipeline); these extend the engine per the builder's brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.types import LongType, StructField, StructType

from spark_tsne_spark.functions.text import bpe_ish_token_count
from spark_tsne_spark.operators.sampling import hash_bucket

# Boundary-bucket granularity for token_budget_sample: top 8 bits of
# the 60-bit hash -> 256 range buckets per source.
_BUCKET_SHIFT = 52


def exclusive_prefix_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "offset",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exclusive running sum of ``value_col`` in global ``order_col``
    order, without ever forming a global single-partition window.

    Two-phase distributed scan:

    1. range-repartition + sort by ``order_col`` (ONE shuffle; range
       partitioning makes partition index = contiguous key range, so
       partition order IS global order), then ONE tiny job collects
       per-partition value totals (``num_partitions`` rows) to the
       driver and turns them into per-partition starting offsets;
    2. ONE narrow Arrow pass (``mapInPandas``) adds the partition's
       offset to a partition-local cumulative sum — state carries
       across a partition's batches inside the generator.

    The driver state is O(partitions), the scan is O(rows/partition)
    per task: the same plan runs on 32 threads here and 1000
    executors at 100 TB. (A ``Window.orderBy`` with no partitionBy —
    the obvious spelling — funnels every row through one task.)
    """
    sc = df.sparkSession.sparkContext
    p = num_partitions or sc.defaultParallelism
    # localCheckpoint, not persist: the materialized range-sorted rows
    # are reused by the totals job and the scan pass, but are NOT
    # registered in the CacheManager (a persist here leaks for the
    # session lifetime and can plan-substitute an unpruned scan into
    # later unrelated queries) — blocks are freed when the RDD is GC'd.
    # Durability trade-off: localCheckpoint TRUNCATES lineage onto
    # unreplicated executor blocks, so on a real cluster losing an
    # executor after materialization makes this job unrecoverable
    # (no lineage left to recompute). For long-running cluster
    # deployments where recomputation matters, swap in reliable
    # checkpointing (sc.setCheckpointDir + .checkpoint()) or
    # persist(DISK_ONLY_2) with an explicit unpersist.
    rp = (
        df.repartitionByRange(p, F.col(order_col))
        .sortWithinPartitions(order_col)
        .localCheckpoint(eager=False)
    )
    totals = {
        r["pid"]: r["tot"]
        for r in rp.groupBy(
            F.spark_partition_id().alias("pid")
        )
        .agg(F.sum(F.col(value_col).cast("long")).alias("tot"))
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in range(p):
        offsets[pid] = acc
        acc += totals.get(pid, 0)
    b_offsets = sc.broadcast(offsets)

    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, LongType(), False)]
    )
    vcol, ocol = value_col, out_col

    def scan(batches):
        from pyspark import TaskContext

        base = b_offsets.value[TaskContext.get().partitionId()]
        run = 0
        for pdf in batches:
            vals = pdf[vcol].to_numpy("int64")
            cum = vals.cumsum()
            pdf[ocol] = base + run + cum - vals  # exclusive
            run += int(cum[-1]) if len(vals) else 0
            yield pdf

    return rp.mapInPandas(scan, schema)


def pack_sequences(
    docs: DataFrame,
    block_size: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk packing plan: each document's slice of the
    fixed-size training blocks.

    Documents are laid end-to-end in ``id_col`` order (deterministic,
    so the layout is reproducible across runs and engines); the token
    stream is cut every ``block_size`` tokens. Output, one row per
    (document, block) span::

        doc_id, n_tok, offset, block, block_off, seg_len

    where ``offset`` is the doc's global start token, ``block`` the
    training-block index, ``block_off`` the start within that block,
    and ``seg_len`` the tokens the doc contributes there (a long doc
    spans ceil(n/B)+1 blocks at most; seg_lens per doc sum to n_tok,
    per block to exactly ``block_size`` except the final block).

    Shape: the prefix sum is the two-phase scan above; the span
    explode is a per-row ``sequence`` (narrow). Zero-token documents
    are dropped — they occupy no training tokens by definition.
    """
    if block_size <= 0:
        raise ValueError(f"block_size must be positive, got {block_size}")
    n_tok = (
        F.col(n_tokens_col)
        if n_tokens_col
        else bpe_ish_token_count(text_col)
    ).cast("long")
    d = docs.select(
        F.col(id_col).alias("doc_id"), n_tok.alias("n_tok")
    ).where(F.col("n_tok") > 0)
    with_off = exclusive_prefix_sum(d, "doc_id", "n_tok", "offset")
    B = F.lit(block_size).cast("long")
    first = F.floor(F.col("offset") / B).cast("long")
    last = F.floor((F.col("offset") + F.col("n_tok") - 1) / B).cast("long")
    out = with_off.select(
        "doc_id",
        "n_tok",
        "offset",
        F.explode(F.sequence(first, last)).alias("block"),
    )
    seg_start = F.greatest(F.col("offset"), F.col("block") * B)
    seg_end = F.least(F.col("offset") + F.col("n_tok"), (F.col("block") + 1) * B)
    return out.select(
        "doc_id",
        "n_tok",
        "offset",
        "block",
        (seg_start - F.col("block") * B).alias("block_off"),
        (seg_end - seg_start).alias("seg_len"),
    )


def chunk_documents(
    docs: DataFrame,
    width: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token chunks for retrieval/RAG ingestion:
    ``(doc_id, chunk_id, chunk_off, n_chunk_tok, chunk_text)``.

    Chunks start every ``stride`` tokens and span ``width`` tokens
    (``width - stride`` tokens of overlap keep sentences split by a
    boundary retrievable from both sides); the chunk count is
    ``ceil((n - width)/stride) + 1`` so the final chunk always reaches
    the document's end. A doc with ≤ ``width`` tokens is one chunk.

    Shape: the chunk fan-out is a per-row ``sequence`` + ``slice`` —
    narrow, JVM-side, no shuffle, no Python; all-integer bounds so
    the DuckDB oracle replays it exactly.
    """
    if width <= 0 or stride <= 0:
        raise ValueError(f"width/stride must be positive, got {width}/{stride}")
    if stride > width:
        raise ValueError(
            f"stride {stride} > width {width} would skip tokens"
        )
    from spark_tsne_spark.functions.text import tokens

    toks = tokens(text_col)
    d = docs.select(
        F.col(id_col).alias("doc_id"), toks.alias("toks")
    ).select("doc_id", "toks", F.size("toks").cast("long").alias("n_tok"))
    W, S = F.lit(width).cast("long"), F.lit(stride).cast("long")
    n_chunks = F.when(F.col("n_tok") <= W, F.lit(1).cast("long")).otherwise(
        F.floor((F.col("n_tok") - W + S - 1) / S).cast("long") + 1
    )
    out = d.select(
        "doc_id",
        "toks",
        "n_tok",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
            "chunk_id"
        ),
    )
    return out.select(
        "doc_id",
        "chunk_id",
        (F.col("chunk_id") * S).alias("chunk_off"),
        F.least(W, F.col("n_tok") - F.col("chunk_id") * S).alias(
            "n_chunk_tok"
        ),
        F.concat_ws(
            " ", F.slice(F.col("toks"), F.col("chunk_id") * S + 1, width)
        ).alias("chunk_text"),
    )


def token_budget_sample(
    docs: DataFrame,
    budgets: dict[str, int],
    stratum_col: str = "source",
    key: Column | str = "text",
    id_col: str = "doc_id",
    n_tokens_col: str | None = None,
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum token-budget selection: walk each
    stratum's documents in content-hash order and keep them while the
    running (inclusive) token sum stays ≤ the stratum's budget.
    Output: ``(doc_id, stratum, n_tok, cum)`` for every kept doc.

    Semantically a per-stratum cumulative-sum filter; structurally the
    cumsum window is confined to ONE hash-range bucket per stratum:

    1. ``bucket = hash >> 52`` — because the bucket is the order key's
       top bits, buckets partition the hash order into 256 contiguous
       ranges; ONE (stratum × bucket) aggregate (≤ 256·|strata| rows,
       map-side partial agg) goes to the driver;
    2. the driver prefix-sums each stratum's bucket totals: buckets
       strictly under budget are kept WHOLESALE, buckets past it are
       dropped wholesale, and exactly one boundary bucket per stratum
       remains;
    3. only boundary-bucket rows (~1/256 of one stratum) flow through
       the per-stratum cumsum window, seeded with the driver's base
       offset — the low-cardinality window that would hot-spot a
       1000-executor cluster never sees the full data.

    Strata absent from ``budgets`` are dropped (budget 0).
    """
    if not budgets:
        raise ValueError("budgets must name at least one stratum")
    for s, t in budgets.items():
        if t < 0:
            raise ValueError(f"budget for {s!r} must be >= 0, got {t}")
    spark = docs.sparkSession
    n_tok = (
        F.col(n_tokens_col)
        if n_tokens_col
        else bpe_ish_token_count(text_col)
    ).cast("long")
    h = hash_bucket(key, salt)
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        n_tok.alias("n_tok"),
        h.alias("h"),
    ).where(F.col("stratum").isin(*budgets.keys()))
    # Reused by the per-bucket totals job and the final filter join;
    # localCheckpoint (not persist) so the blocks die with the RDD
    # instead of leaking in the session CacheManager. Same durability
    # caveat as exclusive_prefix_sum: lineage is truncated onto
    # unreplicated executor blocks, so executor loss after
    # materialization is unrecoverable — use reliable checkpointing
    # on cluster deployments where that matters.
    d = d.localCheckpoint(eager=False)

    bucket = F.shiftright(F.col("h"), _BUCKET_SHIFT).alias("bucket")
    per_bucket = (
        d.groupBy("stratum", bucket)
        .agg(F.sum("n_tok").alias("tot"))
        .collect()
    )
    sums: dict[str, dict[int, int]] = {}
    for r in per_bucket:
        sums.setdefault(r["stratum"], {})[r["bucket"]] = r["tot"]

    # Driver classification: per stratum, exclusive prefix over bucket
    # order -> (kind, base). kind: 1 = keep wholesale, 2 = boundary.
    cls_rows = []
    for s, per in sums.items():
        budget = budgets[s]
        acc = 0
        for b in sorted(per):
            if acc + per[b] <= budget:
                cls_rows.append((s, b, 1, acc))
            elif acc < budget:
                cls_rows.append((s, b, 2, acc))
            acc += per[b]
    if not cls_rows:
        return (
            d.select("doc_id", "stratum", "n_tok")
            .withColumn("cum", F.col("n_tok"))
            .where(F.lit(False))
        )
    cls = spark.createDataFrame(
        cls_rows, "stratum string, bucket long, kind int, base long"
    )

    joined = d.withColumn("bucket", bucket).join(
        F.broadcast(cls), ["stratum", "bucket"]
    )
    # Wholesale-kept buckets still need their true running sum in the
    # output; within a fully-kept bucket the cumsum is partition-local
    # to (stratum, bucket) + the driver base — a 256x finer window key
    # than the stratum, bounded skew.
    w = Window.partitionBy("stratum", "bucket").orderBy(
        F.col("h").asc(), F.col("doc_id").asc()
    )
    cum = F.col("base") + F.sum("n_tok").over(w)
    scored = joined.select(
        "doc_id", "stratum", "n_tok", "kind", cum.alias("cum")
    )
    budget_expr = F.lit(None).cast("long")
    for s, t in budgets.items():
        budget_expr = F.when(F.col("stratum") == s, F.lit(t)).otherwise(
            budget_expr
        )
    return scored.where(
        (F.col("kind") == 1) | (F.col("cum") <= budget_expr)
    ).select("doc_id", "stratum", "n_tok", "cum")


def plan_shards(
    docs: DataFrame,
    shard_tokens: int = 1 << 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """Token-balanced output sharding: assign each document to a
    training shard of ~``shard_tokens`` tokens, contiguous in
    ``id_col`` order — the planning step before writing uniform
    training files (a shard = one output file / tar / webdataset
    piece).

    ``shard = global_token_offset div shard_tokens`` over the same
    two-phase distributed prefix scan that powers sequence packing
    (:func:`exclusive_prefix_sum` — per-partition totals on the
    driver, partition-local Arrow cumsum; never a global
    single-partition window). A document straddling a boundary is
    assigned to the shard its FIRST token lands in, so shards spill
    by at most one document — the standard contract.

    Output: ``(doc_id, n_tok, offset, shard)``.
    """
    if shard_tokens < 1:
        raise ValueError(f"shard_tokens must be >= 1, got {shard_tokens}")
    from spark_tsne_spark.functions.text import bpe_ish_token_count

    n_tok = (
        F.col(n_tokens_col) if n_tokens_col else bpe_ish_token_count(text_col)
    ).cast("long")
    d = docs.select(F.col(id_col).alias("doc_id"), n_tok.alias("n_tok"))
    with_off = exclusive_prefix_sum(d, "doc_id", "n_tok", out_col="offset")
    return with_off.select(
        "doc_id",
        "n_tok",
        "offset",
        F.floor(F.col("offset") / shard_tokens).cast("long").alias("shard"),
    )
