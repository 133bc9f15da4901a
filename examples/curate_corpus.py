"""End-to-end corpus curation walkthrough — the operators a
training-data run composes, on the sf0.001 fixtures.

    python examples/curate_corpus.py [sf_dir]

Stages (each is a catalog-verified operator; see COVERAGE.md):

1. exact dedup            one fingerprint window
2. near-dup clustering    MinHash-LSH candidates -> connected
                          components -> canonical survivors
3. quality + language     char-entropy / composite-quality /
                          trigram-LID gates (all narrow, JVM-side)
4. decontamination        8-gram overlap vs a held-out eval set
5. deterministic sample   stratified content-hash (reproducible
                          across runs, partitionings, engines)
6. ANN index              persistent IVF index over the embeddings
                          of what survived
7. token-budget mixing    per-source token budgets in content-hash
                          order (skew-safe bucket classification)
8. sequence packing       concat-and-chunk into fixed 512-token
                          training blocks (distributed prefix sum)
9. audit + publish        expectation checks on the STAGED output,
                          then one atomic rename (write-audit-publish)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window, functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from spark_tsne_spark.functions.text import (
        char_entropy,
        fingerprint,
        lang_id,
        quality_score,
    )
    from spark_tsne_spark.operators.dedup import (
        canonical_corpus,
        minhash_lsh_candidates,
        ngram_contamination,
    )
    from spark_tsne_spark.operators.sampling import stratified_hash_sample
    from spark_tsne_spark.operators.similarity import IvfIndex
    from spark_tsne_spark.session import get_spark

    spark = get_spark("curate-corpus", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    n0 = docs.count()

    # 1. exact dedup (keep the lowest doc_id per normalized fingerprint)
    w = Window.partitionBy(fingerprint("text")).orderBy("doc_id")
    exact = (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        .cache()
    )
    n1 = exact.count()

    # 2. near-dup removal (LSH candidates -> CC -> canonical survivors)
    usable = exact.where(F.length("text") >= 5)
    pairs = minhash_lsh_candidates(
        usable, num_hashes=16, band_size=4, hash_fn="xxhash64", max_bucket=512
    )
    near = canonical_corpus(usable, pairs).cache()
    n2 = near.count()

    # 3. quality / language gates (single narrow pass)
    gated = near.where(
        (F.round(quality_score("text"), 6) >= 0.5)
        & (lang_id("text") == "en")
        & (char_entropy("text") >= 3.0)
    ).cache()
    n3 = gated.count()

    # 4. decontamination vs a pretend eval set (the last 50 docs)
    evalset = docs.orderBy(F.col("doc_id").desc()).limit(50).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    contaminated = ngram_contamination(gated, evalset, n=8).select("doc_id")
    clean = gated.join(contaminated, "doc_id", "left_anti").cache()
    n4 = clean.count()

    # 5. deterministic stratified sample (all of src1, half of the rest)
    sampled = stratified_hash_sample(
        clean, key="text", stratum="source",
        fractions={"src1": 1.0}, default_fraction=0.5, salt="demo",
    ).cache()
    n5 = sampled.count()

    # 6. persistent ANN index over surviving docs' embeddings
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    kept_emb = emb.join(
        sampled.select(F.col("doc_id").alias("vec_id")), "vec_id", "semi"
    )
    idx_path = tempfile.mkdtemp(prefix="curate_ivf_")
    idx = IvfIndex.build(kept_emb, idx_path, n_cells=8)
    probe = idx.query(kept_emb.limit(3), k=3)

    # 7. token-budget mixing: cap every source at 300 tokens
    from spark_tsne_spark.operators.packing import (
        pack_sequences,
        token_budget_sample,
    )

    sources = [r["source"] for r in sampled.select("source").distinct().collect()]
    mixed_ids = token_budget_sample(
        sampled, {s: 300 for s in sources}, salt="demo"
    )
    mixed = sampled.join(mixed_ids.select("doc_id"), "doc_id", "semi").cache()
    n6 = mixed.count()

    # 8. sequence packing: lay the surviving docs end-to-end, cut into
    # fixed 512-token training blocks
    packed = pack_sequences(mixed, block_size=512).cache()
    n_blocks = packed.agg(F.countDistinct("block")).collect()[0][0]
    n_tokens = packed.agg(F.sum("seg_len")).collect()[0][0]

    print(f"input docs:          {n0}")
    print(f"after exact dedup:   {n1}  (-{n0 - n1})")
    print(f"after near-dup:      {n2}  (-{n1 - n2})")
    print(f"after quality gates: {n3}  (-{n2 - n3})")
    print(f"after decontam:      {n4}  (-{n3 - n4})")
    print(f"after sampling:      {n5}  (-{n4 - n5})")
    print(f"after token budget:  {n6}  (-{n5 - n6})")
    print(f"packed:              {n_tokens} tokens into {n_blocks} "
          f"blocks of 512")
    print(f"ivf index at {idx_path}; sample query:")
    probe.show(9, truncate=False)

    # 9. write-audit-publish: stage the packed blocks, audit, publish
    # atomically — readers never observe a half-written snapshot.
    staging = tempfile.mkdtemp(prefix="curate_stage_")
    packed.write.mode("overwrite").parquet(staging)
    audit = spark.read.parquet(staging).agg(
        F.count("*").alias("rows"),
        F.sum(F.when(F.col("seg_len") <= 0, 1).otherwise(0)).alias("bad"),
    ).head()
    published = staging + "_published"
    if audit["rows"] > 0 and audit["bad"] == 0:
        os.rename(staging, published)
        print(f"audit clean ({audit['rows']} rows) -> published at "
              f"{published}")
    else:
        print(f"audit FAILED ({audit['bad']} bad rows) -> left staged at "
              f"{staging}")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
