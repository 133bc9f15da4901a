"""Distributed BPE tokenizer training and encoding.

The canonical LLM-tokenizer pipeline: train a byte-pair-encoding
merge table from a corpus word histogram, then encode the corpus
with the trained merges. Mirrors how production tokenizer trainers
(the original Sennrich et al. 2016 subword-nmt recipe, and the
word-histogram fast path every modern trainer uses) actually split
the work at scale:

* **Corpus side (distributed, the only full pass):** ONE
  explode → word groupBy with map-side partial aggregation produces
  the word histogram; the heavy-hitter truncation to ``max_words``
  runs as a TakeOrdered top-k (per-partition heaps + driver merge,
  never a global sort). At 100 TB the histogram shuffle carries
  |distinct words| rows — Zipf-bounded, and the truncation is the
  standard trainer contract (merge statistics are dominated by the
  head of the distribution).
* **Driver side (bounded, corpus-size-independent):** the merge
  loop runs over the ≤``max_words``-row histogram — O(max_words ×
  avg_len) state with incremental pair-count maintenance, the same
  bounded-driver-artifact pattern as the IVF quantizer sample. It
  never sees the corpus.
* **Encode side (distributed, one narrow pass):** merge ranks are a
  broadcast dict; ``mapInPandas`` applies the classic greedy
  lowest-rank merge per word with a per-batch word→tokens cache
  (Zipf again: the cache hit-rate is the corpus' type/token ratio).
  No shuffle at all — encoding is embarrassingly parallel.

Determinism contract (catalog hash-stability rules): ties in pair
frequency break to the lexicographically smallest pair, the
histogram truncation orders by (count DESC, word ASC), and encoding
applies merges strictly by ascending rank — so the merge table and
every encoding are reproducible bit-for-bit across runs and
partitionings.

No reference counterpart (spark-tsne is a visualization engine) —
this is part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

from spark_tsne_spark.functions.text import tokens

EOW = "</w>"  # end-of-word marker, merged into tokens like subword-nmt

# Python-side twin of functions.text.tokens(): Java's \s is the ASCII
# whitespace class, while Python str.split() is Unicode-aware — pin
# the ASCII class so the encode pass tokenizes EXACTLY like the
# word_histogram training pass.
_WS = re.compile(r"[ \t\n\x0b\f\r]+")


def _words(txt: str) -> list[str]:
    return [w for w in _WS.split((txt or "").strip()) if w]


def word_histogram(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """``(word, n)`` corpus word histogram — one explode, one
    map-side-partial groupBy. The single full corpus pass that
    tokenizer training needs."""
    t = F.explode(tokens(text_col)).alias("word")
    out = docs.select(t)
    if lowercase:
        out = out.select(F.lower("word").alias("word"))
    return (
        out.where(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _train_merges(
    word_counts: list[tuple[str, int]], num_merges: int
) -> list[tuple[str, str, int]]:
    """Driver merge loop over a bounded word histogram: returns
    ``[(left, right, freq_at_merge_time), ...]`` in rank order.

    Incremental bookkeeping: pair counts and a pair→word index are
    maintained across merges, so each merge touches only the words
    that contain the merged pair (the ``pair_where`` sets may hold
    stale members after other merges rewrote a word — harmless, the
    rewrite is a no-op and its decrement/increment cancel).
    Tie-break: highest frequency, then lexicographically smallest
    (left, right) — fully deterministic.

    Best-pair selection is a lazy-deletion heap, not a scan: a
    ``min(pair_n.items())`` per merge is O(|pairs|) and dominated the
    real-tokenizer regime (32k merges over a 200k-word histogram:
    ~41 ms/merge ≈ 22 min projected; the heap version trains the same
    run in seconds — entries carry the count they were pushed with
    and are discarded on pop if the live count moved). Heap order
    ``(-freq, pair)`` equals the scan's tie-break, so the merge
    sequence is unchanged (pinned vs the naive reference in
    tests/test_bpe.py).
    """
    import heapq

    words: list[tuple[list[str], int]] = [
        (list(w) + [EOW], c) for w, c in word_counts
    ]
    pair_n: Counter = Counter()
    pair_where: defaultdict = defaultdict(set)
    for wi, (syms, c) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_n[p] += c
            pair_where[p].add(wi)

    heap: list[tuple[int, tuple[str, str]]] = [
        (-n, p) for p, n in pair_n.items()
    ]
    heapq.heapify(heap)

    def push(p: tuple[str, str]) -> None:
        heapq.heappush(heap, (-pair_n[p], p))

    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = None
        while heap:
            negn, p = heapq.heappop(heap)
            live = pair_n.get(p)
            if live is not None and live == -negn:
                best, freq = p, live
                break
            # Stale entry: the pair's count changed (or the pair died)
            # after this entry was pushed. A live pair always has a
            # CURRENT entry too (push() runs on every increment), so
            # dropping stale ones never loses the maximum.
        if best is None:
            break
        merges.append((best[0], best[1], freq))
        joined = best[0] + best[1]
        touched: set = set()
        for wi in sorted(pair_where.pop(best, ())):
            syms, c = words[wi]
            if not any(p == best for p in zip(syms, syms[1:])):
                continue  # stale index member: word was rewritten since
            for p in zip(syms, syms[1:]):
                pair_n[p] -= c
                touched.add(p)
                if pair_n[p] <= 0:
                    del pair_n[p]
            out: list[str] = []
            i = 0
            while i < len(syms):
                if (
                    i + 1 < len(syms)
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = (out, c)
            for p in zip(out, out[1:]):
                pair_n[p] += c
                touched.add(p)
                pair_where[p].add(wi)
        pair_n.pop(best, None)
        # Every pair whose live count moved this merge (increment OR
        # decrement) gets a fresh heap entry at its current count —
        # the invariant the lazy-deletion pop relies on.
        for p in touched:
            if p in pair_n:
                push(p)
    return merges


def train_bpe(
    docs: DataFrame,
    num_merges: int = 200,
    max_words: int = 32768,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> list[tuple[str, str, int]]:
    """Train BPE merges from a corpus: distributed word histogram →
    deterministic top-``max_words`` truncation → driver merge loop.
    Returns the rank-ordered merge list (driver artifact, bounded by
    ``num_merges`` — this is the tokenizer model)."""
    hist = word_histogram(docs, id_col, text_col, lowercase)
    # TakeOrdered top-k on (n DESC, word ASC): per-partition heaps +
    # driver merge; the ONLY rows the driver ever holds.
    head = (
        hist.orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    return _train_merges([(r["word"], r["n"]) for r in head], num_merges)


def merges_df(spark, merges: list[tuple[str, str, int]]) -> DataFrame:
    """The merge table as a DataFrame ``(rank, left, right, freq)`` —
    the persistable tokenizer-model artifact."""
    return spark.createDataFrame(
        [(i, l, r, int(f)) for i, (l, r, f) in enumerate(merges)],
        "rank long, left string, right string, freq long",
    )


def _encode_word(word: str, ranks: dict) -> list[str]:
    """Classic greedy BPE apply: repeatedly merge the present pair
    with the LOWEST rank until none applies. Equivalent to replaying
    the training merges in rank order over this word."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank = r
                best_pair = p
        if best_pair is None:
            break
        joined = best_pair[0] + best_pair[1]
        out: list[str] = []
        i = 0
        while i < len(syms):
            if (
                i + 1 < len(syms)
                and syms[i] == best_pair[0]
                and syms[i + 1] == best_pair[1]
            ):
                out.append(joined)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode_stats(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Encode every document with a trained merge table and report
    per-doc token accounting: ``(doc_id, n_words, n_tokens,
    chars_per_token)`` — the fertility/compression numbers a
    tokenizer eval job produces, and the exact token counts a
    packing/budgeting pass needs (vs the ``bpe_ish_token_count``
    regex estimate).

    ONE narrow ``mapInPandas`` pass: merge ranks ride a broadcast
    (≤ num_merges entries), each Arrow batch keeps a word→len cache
    so repeated words (Zipf head) encode once. No shuffle, no
    collect — scales with corpus bytes.
    """
    sc = docs.sparkSession.sparkContext
    b_ranks = sc.broadcast(
        {(l, r): i for i, (l, r, _) in enumerate(merges)}
    )
    lc = lowercase

    def encode(batches: Iterator) -> Iterator:
        import pandas as pd

        ranks = b_ranks.value
        cache: dict[str, int] = {}
        for pdf in batches:
            ids, n_words, n_toks, n_chars = [], [], [], []
            for did, txt in zip(pdf["doc_id"], pdf["text"]):
                ws = _words(txt)
                nt = 0
                nc = 0
                for w in ws:
                    if lc:
                        w = w.lower()
                    k = cache.get(w)
                    if k is None:
                        k = len(_encode_word(w, ranks))
                        cache[w] = k
                    nt += k
                    nc += len(w)
                ids.append(did)
                n_words.append(len(ws))
                n_toks.append(nt)
                n_chars.append(nc)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_words": n_words,
                    "n_tokens": n_toks,
                    "chars_per_token": [
                        round(c / t, 4) if t else 0.0
                        for c, t in zip(n_chars, n_toks)
                    ],
                }
            )

    return docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).mapInPandas(
        encode,
        "doc_id long, n_words long, n_tokens long, chars_per_token double",
    )


def bpe_token_histogram(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Corpus-wide token histogram under a trained merge table:
    top-``k`` ``(token, n, rank)`` — the vocab-coverage report. The
    encode pass emits (token, count) PARTIALLY AGGREGATED per Arrow
    batch (the word cache maps word → token list once per distinct
    word, counts multiply by occurrences), so the shuffle carries
    |batch-distinct tokens| rows, not one row per token instance;
    the top-k is a TakeOrdered."""
    sc = docs.sparkSession.sparkContext
    b_ranks = sc.broadcast(
        {(l, r): i for i, (l, r, _) in enumerate(merges)}
    )
    lc = lowercase

    def encode(batches: Iterator) -> Iterator:
        import pandas as pd

        ranks = b_ranks.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            counts: Counter = Counter()
            for txt in pdf["text"]:
                for w in _words(txt):
                    if lc:
                        w = w.lower()
                    ts = cache.get(w)
                    if ts is None:
                        ts = _encode_word(w, ranks)
                        cache[w] = ts
                    counts.update(ts)
            if counts:
                yield pd.DataFrame(
                    {
                        "token": list(counts.keys()),
                        "n": list(counts.values()),
                    }
                )

    toks = docs.select(F.col(text_col).alias("text")).mapInPandas(
        encode, "token string, n long"
    )
    from pyspark.sql import Window

    rolled = (
        toks.groupBy("token")
        .agg(F.sum("n").alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return rolled.withColumn("rank", F.row_number().over(w).cast("long"))
