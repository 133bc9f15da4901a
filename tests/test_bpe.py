"""BPE train/encode vs an INDEPENDENT naive reference.

The reference here is the textbook subword-nmt recipe, re-derived
from scratch with none of the production code's incremental
bookkeeping: every iteration recounts all pairs from the full word
list, and encoding replays the merges sequentially in rank order.
If the production path's pair-index maintenance or greedy-min-rank
apply drifts, these tests catch it on corpora where ties and
overlapping pairs actually occur.
"""

from collections import Counter

import pytest

from spark_tsne_spark.operators.bpe import (
    EOW,
    _encode_word,
    _train_merges,
    bpe_encode_stats,
    bpe_token_histogram,
    train_bpe,
)


def naive_train(word_counts, num_merges):
    words = [(tuple(list(w) + [EOW]), c) for w, c in word_counts]
    merges = []
    for _ in range(num_merges):
        pair_n = Counter()
        for syms, c in words:
            for p in zip(syms, syms[1:]):
                pair_n[p] += c
        if not pair_n:
            break
        best, freq = min(pair_n.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((best[0], best[1], freq))
        joined = best[0] + best[1]
        out_words = []
        for syms, c in words:
            out, i = [], 0
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
            out_words.append((tuple(out), c))
        words = out_words
    return merges


def naive_encode(word, merges):
    syms = list(word) + [EOW]
    for left, right, _ in merges:
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


CORPUS = [
    ("low", 5), ("lower", 2), ("lowest", 9), ("newer", 6), ("new", 3),
    ("wider", 3), ("widest", 1), ("aaaa", 4), ("aaab", 2), ("abab", 7),
    ("banana", 3), ("bandana", 2), ("an", 11), ("a", 13), ("nan", 1),
]


def test_train_matches_naive_reference():
    got = _train_merges(CORPUS, 40)
    want = naive_train(CORPUS, 40)
    assert got == want


def test_train_overlapping_pairs_and_ties():
    # 'aaaa' exercises overlapping-pair counting; equal-frequency
    # pairs exercise the lexicographic tie-break.
    corpus = [("aaaa", 1), ("bbbb", 1), ("ab", 2), ("ba", 2)]
    assert _train_merges(corpus, 10) == naive_train(corpus, 10)


def test_encode_matches_sequential_replay():
    merges = _train_merges(CORPUS, 40)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    for w, _ in CORPUS + [("unseen", 1), ("lowlands", 1), ("x", 1)]:
        assert _encode_word(w, ranks) == naive_encode(w, merges)


def test_encode_roundtrip_property():
    merges = _train_merges(CORPUS, 25)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    for w in ["low", "lowest", "bananas", "zzz", "widener"]:
        toks = _encode_word(w, ranks)
        assert "".join(toks) == w + EOW


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    d.count()
    return d


def test_distributed_train_deterministic(spark, docs):
    m1 = train_bpe(docs, num_merges=30, max_words=2000)
    m2 = train_bpe(docs.repartition(7), num_merges=30, max_words=2000)
    assert m1 == m2
    assert len(m1) == 30


def test_encode_stats_against_local(spark, docs):
    merges = train_bpe(docs, num_merges=30, max_words=2000)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_encode_stats(docs, merges).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        ws = (row["text"] or "").split()
        nt = sum(len(_encode_word(w.lower(), ranks)) for w in ws)
        assert got[row["doc_id"]] == (len(ws), nt)


def test_token_histogram_counts(spark, docs):
    merges = train_bpe(docs, num_merges=30, max_words=2000)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    counts = Counter()
    for row in docs.select("text").collect():
        for w in (row["text"] or "").split():
            counts.update(_encode_word(w.lower(), ranks))
    want = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[:20]
    got = [
        (r["token"], r["n"])
        for r in bpe_token_histogram(docs, merges, k=20)
        .orderBy("rank")
        .collect()
    ]
    assert got == want
