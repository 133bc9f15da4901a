"""Distributed unigram-LM (SentencePiece-style) tokenizer training
and encoding — the other canonical LLM tokenizer family, beside BPE.

Work splits exactly like :mod:`spark_tsne_spark.operators.bpe` (the
production trainer contract):

* **Corpus side (distributed, the only full pass):** the SAME word
  histogram job BPE uses (one explode → map-side-partial groupBy,
  TakeOrdered ``max_words`` truncation). At 100 TB the shuffle
  carries |distinct words| rows — Zipf-bounded.
* **Driver side (bounded, corpus-size-independent):** seed a
  candidate-piece inventory from weighted substring counts, then run
  EM over each word's segmentation lattice (forward–backward expected
  counts → ML re-estimate) with interleaved pruning of the
  lowest-probability multi-char pieces until ``vocab_size`` remains —
  the Kudo (2018, "Subword Regularization") unigram-LM recipe with a
  frequency-seeded inventory instead of a suffix-array ESA. State is
  O(max_words × avg_len × max_piece_len), never the corpus.
* **Encode side (distributed, one narrow pass):** piece log-probs
  ride a broadcast; ``mapInPandas`` Viterbi-decodes each word with a
  per-batch word→tokens cache. No shuffle.

Determinism contract (catalog hash-stability rules): every driver
loop iterates pieces and words in sorted order (fixed float summation
order → bit-reproducible), seeding keeps the top substrings by
(count DESC, piece ASC), pruning drops by (prob ASC, piece ASC), and
Viterbi breaks score ties by (fewer tokens, lexicographically
smallest piece sequence). Single-character pieces are never pruned,
so every word the histogram pass can emit is segmentable.

No reference counterpart (spark-tsne is a visualization engine) —
this is part of the training-data-pipeline extension surface.
"""

from __future__ import annotations

import math
from collections import Counter
from typing import Iterator

from pyspark.sql import DataFrame, functions as F

from spark_tsne_spark.operators.bpe import _words, word_histogram

# Probability floor for single-char pieces: keeps coverage (any word
# is segmentable char-by-char) without letting dead chars distort the
# distribution.
_CHAR_FLOOR = 1e-10


def _seed_pieces(
    word_counts: list[tuple[str, int]], n_seed: int, max_piece_len: int
) -> dict[str, float]:
    """Frequency-seeded candidate inventory: all substrings up to
    ``max_piece_len`` weighted by word count; keep every single char
    plus the top multi-char substrings by (count DESC, piece ASC)."""
    sub_n: Counter = Counter()
    for w, c in word_counts:
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(L, i + max_piece_len) + 1):
                sub_n[w[i:j]] += c
    chars = sorted(s for s in sub_n if len(s) == 1)
    multi = sorted(
        (s for s in sub_n if len(s) > 1),
        key=lambda s: (-sub_n[s], s),
    )[: max(0, n_seed - len(chars))]
    total = sum(sub_n[s] for s in chars) + sum(sub_n[s] for s in multi)
    return {s: sub_n[s] / total for s in chars + multi}


def _em_step(
    word_counts: list[tuple[str, int]],
    probs: dict[str, float],
    max_piece_len: int,
) -> tuple[dict[str, float], float]:
    """One EM iteration over every word's segmentation lattice.
    Returns (expected piece counts, total corpus log-likelihood).
    Forward–backward over positions; all loops in deterministic
    order."""
    exp: dict[str, float] = {}
    loglik = 0.0
    for w, c in word_counts:
        L = len(w)
        # alpha[i]: total prob of segmenting w[:i]
        alpha = [0.0] * (L + 1)
        alpha[0] = 1.0
        for i in range(1, L + 1):
            a = 0.0
            for j in range(max(0, i - max_piece_len), i):
                p = probs.get(w[j:i])
                if p is not None and alpha[j] > 0.0:
                    a += alpha[j] * p
            alpha[i] = a
        z = alpha[L]
        if z <= 0.0:
            continue  # unreachable: single chars always present
        beta = [0.0] * (L + 1)
        beta[L] = 1.0
        for i in range(L - 1, -1, -1):
            b = 0.0
            for j in range(i + 1, min(L, i + max_piece_len) + 1):
                p = probs.get(w[i:j])
                if p is not None and beta[j] > 0.0:
                    b += p * beta[j]
            beta[i] = b
        loglik += c * math.log(z)
        for i in range(L):
            if alpha[i] <= 0.0:
                continue
            for j in range(i + 1, min(L, i + max_piece_len) + 1):
                p = probs.get(w[i:j])
                if p is not None and beta[j] > 0.0:
                    exp[w[i:j]] = exp.get(w[i:j], 0.0) + (
                        c * alpha[i] * p * beta[j] / z
                    )
    return exp, loglik


def _renormalize(exp: dict[str, float], pieces: list[str]) -> dict[str, float]:
    """M-step: ML re-estimate with the single-char floor, renormalized
    over the CURRENT inventory in sorted order (fixed summation
    order)."""
    total = 0.0
    for s in pieces:
        total += exp.get(s, 0.0)
    if total <= 0.0:
        raise ValueError("unigram EM: zero total expected count")
    out: dict[str, float] = {}
    for s in pieces:
        p = exp.get(s, 0.0) / total
        if len(s) == 1 and p < _CHAR_FLOOR:
            p = _CHAR_FLOOR
        out[s] = p
    norm = sum(out[s] for s in pieces)
    return {s: out[s] / norm for s in pieces}


def _train_pieces(
    word_counts: list[tuple[str, int]],
    vocab_size: int,
    max_piece_len: int,
    seed_mult: int,
    em_iters: int,
    prune_frac: float,
) -> list[tuple[str, float]]:
    """Driver training loop over a bounded word histogram. Returns
    ``[(piece, logprob), ...]`` ordered by (prob DESC, piece ASC)."""
    word_counts = sorted(word_counts)
    probs = _seed_pieces(word_counts, seed_mult * vocab_size, max_piece_len)
    pieces = sorted(probs)
    n_chars = sum(1 for s in pieces if len(s) == 1)
    target = max(vocab_size, n_chars)
    while True:
        for _ in range(em_iters):
            exp, _ll = _em_step(word_counts, probs, max_piece_len)
            probs = _renormalize(exp, pieces)
        if len(pieces) <= target:
            break
        # Prune the lowest-probability multi-char pieces — at most
        # prune_frac of the inventory per round, never below target.
        # Drop order (prob ASC, piece ASC) is a fully specified total
        # order, so pruning is deterministic under prob ties.
        multi = sorted(
            (s for s in pieces if len(s) > 1), key=lambda s: (probs[s], s)
        )
        n_drop = min(
            len(pieces) - target, max(1, int(len(pieces) * prune_frac))
        )
        dead = set(multi[:n_drop])
        pieces = [s for s in pieces if s not in dead]
        probs = _renormalize(
            {s: probs[s] for s in pieces}, pieces
        )
    # Final EM polish on the pruned inventory.
    for _ in range(em_iters):
        exp, _ll = _em_step(word_counts, probs, max_piece_len)
        probs = _renormalize(exp, pieces)
    ranked = sorted(pieces, key=lambda s: (-probs[s], s))
    return [(s, math.log(probs[s])) for s in ranked]


def train_unigram(
    docs: DataFrame,
    vocab_size: int = 120,
    max_words: int = 32768,
    max_piece_len: int = 8,
    seed_mult: int = 4,
    em_iters: int = 2,
    prune_frac: float = 0.25,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> list[tuple[str, float]]:
    """Train a unigram-LM tokenizer: distributed word histogram →
    deterministic top-``max_words`` truncation → driver EM + prune
    loop. Returns the (prob DESC, piece ASC)-ranked piece list — the
    tokenizer-model artifact (driver-bounded, corpus-independent)."""
    hist = word_histogram(docs, id_col, text_col, lowercase)
    head = (
        hist.orderBy(F.col("n").desc(), F.col("word").asc())
        .limit(max_words)
        .collect()
    )
    return _train_pieces(
        [(r["word"], r["n"]) for r in head],
        vocab_size, max_piece_len, seed_mult, em_iters, prune_frac,
    )


def pieces_df(spark, model: list[tuple[str, float]]) -> DataFrame:
    """The piece table as a DataFrame ``(rank, piece, logprob)`` —
    the persistable tokenizer-model artifact."""
    return spark.createDataFrame(
        [(i, s, float(lp)) for i, (s, lp) in enumerate(model)],
        "rank long, piece string, logprob double",
    )


def _viterbi(word: str, lp: dict, max_piece_len: int) -> list[str]:
    """Best segmentation by total log-prob. Deterministic tie-break:
    higher score, then FEWER tokens, then lexicographically smallest
    piece at each boundary (compared via the dp tuple)."""
    L = len(word)
    NEG = float("-inf")
    # dp[i] = (score, -n_tokens, last_piece, prev_index)
    dp: list = [None] * (L + 1)
    dp[0] = (0.0, 0, "", -1)
    for i in range(1, L + 1):
        best = None
        for j in range(max(0, i - max_piece_len), i):
            if dp[j] is None:
                continue
            p = lp.get(word[j:i])
            if p is None:
                continue
            cand = (
                dp[j][0] + p,
                dp[j][1] - 1,
                word[j:i],
                j,
            )
            # max on (score, -ntok); ties prefer the SMALLEST piece
            # string (note: piece enters negated comparison below)
            if best is None or (
                (cand[0], cand[1]) > (best[0], best[1])
                or ((cand[0], cand[1]) == (best[0], best[1]) and cand[2] < best[2])
            ):
                best = cand
        dp[i] = best
    if dp[L] is None:
        # Unsegmentable only if the word has a char outside the
        # trained char set (single chars are never pruned) — fall
        # back to raw chars so encoding is total.
        return list(word)
    out: list[str] = []
    i = L
    while i > 0:
        _, _, piece, j = dp[i]
        out.append(piece)
        i = j
    out.reverse()
    return out


def unigram_encode_stats(
    docs: DataFrame,
    model: list[tuple[str, float]],
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    max_piece_len: int = 8,
) -> DataFrame:
    """Per-document token accounting under the trained pieces:
    ``(doc_id, n_words, n_tokens, chars_per_token)`` — the fertility
    report, directly comparable to ``bpe_encode_stats``. ONE narrow
    ``mapInPandas`` pass: log-probs ride a broadcast, each Arrow
    batch keeps a word→len cache (Zipf head encodes once). No
    shuffle — scales with corpus bytes."""
    sc = docs.sparkSession.sparkContext
    b_lp = sc.broadcast(dict(model))
    lc = lowercase
    mpl = max_piece_len

    def encode(batches: Iterator) -> Iterator:
        import pandas as pd

        lp = b_lp.value
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
                        k = len(_viterbi(w, lp, mpl))
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


def unigram_token_histogram(
    docs: DataFrame,
    model: list[tuple[str, float]],
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
    max_piece_len: int = 8,
) -> DataFrame:
    """Top-``k`` corpus token histogram under the trained pieces:
    ``(token, n, rank)``. The encode pass emits per-batch PARTIALLY
    AGGREGATED (token, count) rows (word cache → counts multiply by
    occurrences), so the shuffle carries |batch-distinct tokens|
    rows; the top-k is a TakeOrdered."""
    sc = docs.sparkSession.sparkContext
    b_lp = sc.broadcast(dict(model))
    lc = lowercase
    mpl = max_piece_len

    def encode(batches: Iterator) -> Iterator:
        import pandas as pd

        lp = b_lp.value
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            counts: Counter = Counter()
            for txt in pdf["text"]:
                for w in _words(txt):
                    if lc:
                        w = w.lower()
                    ts = cache.get(w)
                    if ts is None:
                        ts = _viterbi(w, lp, mpl)
                        cache[w] = ts
                    counts.update(ts)
            if counts:
                yield pd.DataFrame(
                    {"token": list(counts.keys()), "n": list(counts.values())}
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
