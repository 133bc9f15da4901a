"""Generate the golden final-Y parquet for the tsne_embedding oracle.

The BH t-SNE trajectory is deterministic in-engine (seeded numpy RNG,
and the driver-local and distributed paths are pinned equal by
`tests/test_tsne_e2e.py::test_local_path_matches_distributed`), so
the flagship's final embedding can be value-pinned instead of
rows-only checked: this script runs the `tsne_embedding` catalog
entry itself at the correctness driver's sf0.01 and writes the
rounded result. 8-decimal rounding keeps ~4 significant digits on
the ~1e-4-magnitude coordinates while absorbing float formatting
noise far below any real numerical change.

Regenerate only when the t-SNE numerics intentionally change (new
default schedule, different kernel math) — then say why in the
commit:

    python scripts/make_tsne_golden.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "tsne_embedding_sf001.parquet",
)


def main() -> None:
    import duckdb

    from spark_tsne_spark.session import get_spark

    spark = get_spark("make-tsne-golden", master="local[8]", shuffle_partitions=8)
    from spark_tsne_spark.plans.queries import tsne_embedding

    pdf = tsne_embedding(spark, SF_DIR).toPandas()
    assert len(pdf) > 0 and list(pdf.columns) == ["vec_id", "y0", "y1"]
    # Determinism guard: a second run must reproduce the first exactly.
    pdf2 = tsne_embedding(spark, SF_DIR).toPandas()
    if not pdf.sort_values("vec_id").reset_index(drop=True).equals(
        pdf2.sort_values("vec_id").reset_index(drop=True)
    ):
        raise SystemExit("tsne_embedding is not deterministic — refusing to pin")
    con = duckdb.connect()
    con.register("g", pdf)
    con.execute(
        f"COPY (SELECT vec_id, y0, y1 FROM g ORDER BY vec_id) "
        f"TO '{OUT}' (FORMAT PARQUET)"
    )
    print(f"wrote {len(pdf)} rows to {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
