"""Generate golden parquets for the three unigram-LM catalog oracles.

Unigram training is deterministic by construction (every EM float
summation runs in sorted piece/word order; seeding, pruning, and
Viterbi carry total-order tie-breaks — see operators/unigram.py), and
the encode/report passes are pure per-row functions of the piece
table, so the family is value-pinned against its own reproducible
sf0.01 output — the BPE/tsne_embedding golden pattern:

  unigram_vocab            (rank, piece, logprob)
  unigram_encode_stats     (doc_id, n_words, n_tokens, chars_per_token)
  unigram_token_histogram  (token, n, rank)

Goldens are valid ONLY at the correctness driver's sf0.01 and the
catalog's fixed training params (vocab_size=120, max_words=8000 —
``plans/queries.py:_unigram_model``). Regenerate only when the
algorithm intentionally changes, and say why in the commit:

    python scripts/make_unigram_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
GOLDEN_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden",
)

ENTRIES = {
    "unigram_vocab": ("unigram_vocab_sf001.parquet", ["rank"]),
    "unigram_encode_stats": ("unigram_encode_stats_sf001.parquet", ["doc_id"]),
    "unigram_token_histogram": (
        "unigram_token_histogram_sf001.parquet", ["rank"],
    ),
}


def main() -> None:
    import duckdb

    from spark_tsne_spark.session import get_spark

    spark = get_spark(
        "make-unigram-golden", master="local[8]", shuffle_partitions=8
    )
    from spark_tsne_spark.plans import queries as Q

    cat = Q.catalog()
    con = duckdb.connect()
    for name, (fname, order) in ENTRIES.items():
        fn = cat[name].fn
        pdf = fn(spark, SF_DIR).toPandas()
        assert len(pdf) > 0, name
        # Determinism guard: clear the model cache so the second run
        # retrains from scratch; both results must match exactly.
        Q._UNIGRAM_CACHE.clear()
        pdf2 = fn(spark, SF_DIR).toPandas()
        a = pdf.sort_values(order).reset_index(drop=True)
        b = pdf2.sort_values(order).reset_index(drop=True)
        if not a.equals(b):
            raise SystemExit(f"{name} is not deterministic — refusing to pin")
        out = os.path.join(GOLDEN_DIR, fname)
        con.register("g", a)
        cols = ", ".join(f'"{c}"' for c in pdf.columns)
        ob = ", ".join(f'"{c}"' for c in order)
        con.execute(
            f"COPY (SELECT {cols} FROM g ORDER BY {ob}) "
            f"TO '{out}' (FORMAT PARQUET)"
        )
        con.unregister("g")
        print(f"wrote {len(a)} rows to {out}")
    spark.stop()


if __name__ == "__main__":
    main()
