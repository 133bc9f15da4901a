"""Generate golden parquets for the three BPE catalog oracles.

BPE training is deterministic by construction (the word histogram is
truncated by a total order ``(n DESC, word ASC)``, the driver merge
loop breaks frequency ties by pair lexicographic order — see
``operators/bpe.py``'s tie-break contract, pinned in
``tests/test_bpe.py``), and the encode/report passes are pure per-row
functions of the merge table. So, like ``tsne_embedding``, the three
entries can be value-pinned against their own reproducible output
instead of shipping ``sql=None`` (which the driver records as a red
``err: "no_oracle"`` row — VERDICT r6 #1):

  bpe_vocab            (rank, left, right, freq)
  bpe_encode_stats     (doc_id, n_words, n_tokens, chars_per_token)
  bpe_token_histogram  (token, n, rank)

Goldens are valid ONLY at the correctness driver's sf0.01 and the
catalog's fixed training params (num_merges=60, max_words=8000 —
``plans/queries.py:_bpe_merges``). Regenerate only when the BPE
algorithm intentionally changes, and say why in the commit:

    python scripts/make_bpe_golden.py
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
    # entry name -> (golden filename, ORDER BY columns for stable file)
    "bpe_vocab": ("bpe_vocab_sf001.parquet", ["rank"]),
    "bpe_encode_stats": ("bpe_encode_stats_sf001.parquet", ["doc_id"]),
    "bpe_token_histogram": ("bpe_token_histogram_sf001.parquet", ["rank"]),
}


def main() -> None:
    import duckdb

    from spark_tsne_spark.session import get_spark

    spark = get_spark("make-bpe-golden", master="local[8]", shuffle_partitions=8)
    from spark_tsne_spark.plans import queries as Q

    cat = Q.catalog()
    con = duckdb.connect()
    for name, (fname, order) in ENTRIES.items():
        fn = cat[name].fn
        pdf = fn(spark, SF_DIR).toPandas()
        assert len(pdf) > 0, name
        # Determinism guard: rebuild the plan (fresh model cache) and
        # re-run; the two results must match exactly or pinning is
        # unsound.
        Q._BPE_CACHE.clear()
        pdf2 = fn(spark, SF_DIR).toPandas()
        a = pdf.sort_values(order).reset_index(drop=True)
        b = pdf2.sort_values(order).reset_index(drop=True)
        if not a.equals(b):
            raise SystemExit(f"{name} is not deterministic — refusing to pin")
        out = os.path.join(GOLDEN_DIR, fname)
        con.register("g", a)
        # rank/left/right are DuckDB reserved words — quote everything.
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
