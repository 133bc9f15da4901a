"""Unigram-LM tokenizer invariants: EM monotonicity, Viterbi
optimality vs exhaustive segmentation, input-order determinism,
encode totality, and local ≡ distributed parity."""

import math

import pytest
from pyspark.sql import functions as F

from spark_tsne_spark.operators.unigram import (
    _em_step,
    _renormalize,
    _seed_pieces,
    _train_pieces,
    _viterbi,
    train_unigram,
    unigram_encode_stats,
    unigram_token_histogram,
)

WC = [
    ("hello", 50), ("help", 30), ("yellow", 20), ("low", 40),
    ("lowly", 10), ("he", 25), ("she", 15), ("shell", 12), ("hollow", 8),
]


def brute_best(word, lp, mpl):
    """Exhaustive best segmentation under the SAME tie-break contract
    (score, then fewer tokens, then lexicographic)."""
    best = None

    def segs(w):
        if not w:
            yield []
        for i in range(1, min(len(w), mpl) + 1):
            if w[:i] in lp:
                for rest in segs(w[i:]):
                    yield [w[:i]] + rest

    for s in segs(word):
        sc = sum(lp[p] for p in s)
        if (
            best is None
            or (sc, -len(s)) > (best[0], best[1])
            or ((sc, -len(s)) == (best[0], best[1]) and s < best[2])
        ):
            best = (sc, -len(s), s)
    return best[2] if best else None


def test_em_loglik_monotone():
    probs = _seed_pieces(sorted(WC), 80, 6)
    pieces = sorted(probs)
    lls = []
    for _ in range(6):
        exp, ll = _em_step(sorted(WC), probs, 6)
        lls.append(ll)
        probs = _renormalize(exp, pieces)
    assert all(lls[i + 1] >= lls[i] - 1e-9 for i in range(len(lls) - 1)), lls


def test_train_deterministic_under_input_order():
    m1 = _train_pieces(WC, 20, 6, 4, 2, 0.25)
    m2 = _train_pieces(list(reversed(WC)), 20, 6, 4, 2, 0.25)
    assert m1 == m2


def test_train_keeps_all_single_chars():
    model = dict(_train_pieces(WC, 12, 6, 4, 2, 0.25))
    chars = {c for w, _ in WC for c in w}
    assert chars <= set(model), chars - set(model)


def test_viterbi_matches_bruteforce():
    lp = dict(_train_pieces(WC, 20, 6, 4, 2, 0.25))
    for w in ["hello", "lowly", "shell", "she", "yellowlow", "lowhelp",
              "hell", "owl", "holl"]:
        v = _viterbi(w, lp, 6)
        assert "".join(v) == w
        b = brute_best(w, lp, 6)
        assert b is not None
        assert v == b, (w, v, b)


def test_viterbi_oov_char_fallback_is_total():
    lp = dict(_train_pieces(WC, 20, 6, 4, 2, 0.25))
    v = _viterbi("xyzzy", lp, 6)  # chars not in the training corpus
    assert "".join(v) == "xyzzy"


def test_encode_stats_distributed_matches_local(spark, docs_df):
    model = train_unigram(docs_df, vocab_size=60, max_words=4000)
    lp = dict(model)
    out = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in unigram_encode_stats(docs_df, model).collect()
    }
    from spark_tsne_spark.operators.bpe import _words

    for r in docs_df.select("doc_id", "text").collect():
        ws = _words(r["text"])
        nt = sum(len(_viterbi(w.lower(), lp, 8)) for w in ws)
        assert out[r["doc_id"]] == (len(ws), nt), r["doc_id"]


def test_token_histogram_counts_match_local(spark, docs_df):
    model = train_unigram(docs_df, vocab_size=60, max_words=4000)
    lp = dict(model)
    from collections import Counter

    from spark_tsne_spark.operators.bpe import _words

    local: Counter = Counter()
    for r in docs_df.select("text").collect():
        for w in _words(r["text"]):
            local.update(_viterbi(w.lower(), lp, 8))
    top = sorted(local.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["token"], r["n"])
        for r in unigram_token_histogram(docs_df, model, k=20)
        .orderBy("rank").collect()
    ]
    assert got == top


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
