"""Streaming token-budget admission control.

The streaming twin of ``operators/packing.py::token_budget_sample``:
documents arrive on a stream, and each stratum (source) admits them
until its token budget is exhausted — the data-mixing quota enforced
at INGEST time instead of in a batch pass. Per-stratum consumed-token
totals live in ``GroupState`` (hash-partitioned across executors,
checkpointed, surviving restarts), so a re-run resumes exactly where
the previous drain stopped — the same replay discipline as
``streaming/incremental.py``.

Semantics: within each micro-batch a stratum's rows are ordered by
(content hash, doc_id) — the same deterministic order as the batch
operator — and the running total INCLUDING rejected rows advances the
state, mirroring the batch prefix rule (admission stops permanently
at the first overflow; the cumsum is monotone). When the whole corpus
arrives in one availableNow batch, the admitted set is therefore
IDENTICAL to the batch operator's — which is exactly how the catalog
entry's DuckDB oracle checks it.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from spark_tsne_spark.functions.text import bpe_ish_token_count
from spark_tsne_spark.operators.sampling import hash_bucket

OUTPUT_SCHEMA = "doc_id long, stratum string, n_tok long, cum long"
STATE_SCHEMA = "total long"


def token_quota_admit(
    docs_stream: DataFrame,
    budgets: dict[str, int],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """Stateful per-stratum quota admission over a document stream.

    Returns the admitted rows ``(doc_id, stratum, n_tok, cum)`` where
    ``cum`` is the stratum's running token total at admission —
    matching the batch operator's output column for column.
    """
    if not budgets:
        raise ValueError("budgets must name at least one stratum")
    for s, t in budgets.items():
        if t < 0:
            raise ValueError(f"budget for {s!r} must be >= 0, got {t}")

    prepared = docs_stream.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        bpe_ish_token_count(text_col).cast("long").alias("n_tok"),
        hash_bucket(text_col, salt).alias("h"),
    ).where(F.col("stratum").isin(*budgets.keys()))

    def admit(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (stratum,) = key
        budget = budgets.get(stratum, 0)
        total = state.get[0] if state.exists else 0
        rows = pd.concat(list(pdfs), ignore_index=True)
        if len(rows) == 0:
            return
        rows = rows.sort_values(["h", "doc_id"], kind="mergesort")
        cum = rows["n_tok"].to_numpy("int64").cumsum() + total
        keep = cum <= budget
        # rejected rows advance the total too: the batch prefix rule —
        # once a stratum overflows, nothing later is admitted.
        state.update((int(cum[-1]),))
        if keep.any():
            out = rows.loc[keep, ["doc_id", "stratum", "n_tok"]].copy()
            out["cum"] = cum[keep]
            yield out

    return prepared.groupBy("stratum").applyInPandasWithState(
        admit,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def run_quota_to_parquet(
    stream: DataFrame, out_path: str, checkpoint: str
) -> None:
    """Drain an admission stream with availableNow into parquet; the
    checkpoint carries the per-stratum totals across re-runs."""
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
