"""Corpus/table maintenance: upsert-merge and snapshot diff.

A live training corpus is maintained, not rebuilt: re-crawls supersede
old versions of a document, and every release is audited against the
previous one. Two batch operators cover that lifecycle:

- ``upsert_latest``: MERGE a changes table into a base snapshot,
  latest version per key wins (the Delta/Iceberg ``MERGE INTO ...
  WHEN MATCHED UPDATE`` semantics, expressed engine-neutrally as
  union + one per-key window). ONE shuffle on the key; ties break
  deterministically (changes beat base, then higher version).
- ``snapshot_diff``: classify every key across two snapshots as
  added / removed / changed / unchanged via a single full-outer join
  on the key with a content-fingerprint comparison — the audit job
  run before promoting a corpus release.

Scale: both are single-shuffle plans on the (high-cardinality,
uniform) document key; AQE handles size differences between the
sides. No driver state, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def upsert_latest(
    base: DataFrame,
    changes: DataFrame,
    key: str = "doc_id",
    version: str = "version",
) -> DataFrame:
    """Latest-wins merge of ``changes`` into ``base``: one row per
    key — the highest ``version``; on version ties the changes side
    wins (a re-delivery of the same version supersedes the stored
    row, the standard MERGE contract). Output schema = input schema +
    nothing (the provenance flag is dropped after the window)."""
    b = base.withColumn("_src", F.lit(0))
    c = changes.withColumn("_src", F.lit(1))
    w = Window.partitionBy(key).orderBy(
        F.col(version).desc(), F.col("_src").desc()
    )
    return (
        b.unionByName(c)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    fingerprint_col: str = "fp",
) -> DataFrame:
    """Per-key change classification between two snapshots:
    ``(key, status)`` with status ∈ added | removed | changed |
    unchanged, decided by key presence and fingerprint equality.
    ONE full-outer equi-join on the key."""
    o = old.select(F.col(key).alias("k"), F.col(fingerprint_col).alias("old_fp"))
    n = new.select(F.col(key).alias("k"), F.col(fingerprint_col).alias("new_fp"))
    return (
        o.join(n, "k", "full_outer")
        .select(
            F.col("k").alias(key),
            F.when(F.col("old_fp").isNull(), F.lit("added"))
            .when(F.col("new_fp").isNull(), F.lit("removed"))
            .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
            .otherwise(F.lit("changed"))
            .alias("status"),
        )
    )


def merge_aggregate(
    existing: DataFrame,
    batch: DataFrame,
    keys: list[str],
    count_col: str = "n",
    sum_cols: dict[str, str] | None = None,
) -> DataFrame:
    """Incremental view maintenance for a count/sum aggregate: fold a
    new batch's PARTIAL aggregate into the persisted aggregate table
    without touching history — the pattern that turns an O(corpus)
    nightly recompute into an O(batch) merge (counts and sums are
    the self-maintainable aggregates; avg derives as sum/n at read
    time). ``sum_cols`` maps each aggregate column in ``existing`` to
    the raw batch column it sums.

    Plan: aggregate ONLY the batch (map-side partials over batch-
    sized input), then one full-outer join with the existing
    aggregate on the group keys and coalesce-add the measures. The
    existing side never re-aggregates; shuffle is bounded by
    |distinct keys| + |batch|.
    """
    sum_cols = sum_cols or {}
    b = batch.groupBy(*keys).agg(
        F.count("*").alias(count_col),
        *[F.sum(srcc).alias(aggc) for aggc, srcc in sum_cols.items()],
    )
    ex = existing
    for c in [count_col, *sum_cols]:
        b = b.withColumnRenamed(c, f"_b_{c}")
    out = ex.join(b, on=keys, how="full_outer")
    for c in [count_col, *sum_cols]:
        out = out.withColumn(
            c,
            F.coalesce(F.col(c), F.lit(0))
            + F.coalesce(F.col(f"_b_{c}"), F.lit(0)),
        ).drop(f"_b_{c}")
    return out


def expectation_report(
    df: DataFrame,
    not_null: tuple = (),
    unique: tuple = (),
    in_set: dict | None = None,
    non_negative: tuple = (),
    refs: dict | None = None,
) -> DataFrame:
    """Deequ-style data-quality expectation suite: one report row per
    declared check — ``(check, column, violations, n_rows, ok)`` —
    the release gate a corpus build runs before promoting a snapshot.

    Checks: ``not_null`` (null count), ``unique`` (non-null duplicate
    count: ``count(col) - count(distinct col)``), ``in_set`` (non-null
    values outside the allowed set), ``non_negative`` (values < 0),
    and ``refs`` (referential integrity: ``col -> (dim_df, dim_col)``
    orphan count via a left-anti join).

    Shape at 100 TB: every scalar check folds into ONE
    map-side-combined aggregation pass over the table (a single row of
    conditional sums, exploded into report rows — adding checks adds
    columns to that row, not passes over the data). Each ref check is
    its own anti-join against the dimension's distinct key — AQE
    broadcasts small dims; the fact table never shuffles twice.
    """
    in_set = in_set or {}
    refs = refs or {}
    aggs = [F.count(F.lit(1)).alias("_n")]
    rows = []
    for c in not_null:
        a = f"nn_{c}"
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(a))
        rows.append(("not_null", c, a))
    for c in unique:
        a = f"uq_{c}"
        aggs.append(
            (F.count(F.col(c)) - F.countDistinct(F.col(c))).alias(a)
        )
        rows.append(("unique", c, a))
    for c, allowed in in_set.items():
        a = f"is_{c}"
        aggs.append(
            F.sum(
                F.when(
                    F.col(c).isNotNull() & ~F.col(c).isin(list(allowed)), 1
                ).otherwise(0)
            ).alias(a)
        )
        rows.append(("in_set", c, a))
    for c in non_negative:
        a = f"ng_{c}"
        aggs.append(F.sum(F.when(F.col(c) < 0, 1).otherwise(0)).alias(a))
        rows.append(("non_negative", c, a))
    one = df.agg(*aggs)
    report = one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(kind).alias("check"),
                        F.lit(c).alias("column"),
                        F.col(a).cast("long").alias("violations"),
                    )
                    for kind, c, a in rows
                ]
            )
        ).alias("s"),
        F.col("_n").cast("long").alias("n_rows"),
    ).select("s.check", "s.column", "s.violations", "n_rows")
    parts = [report] if rows else []
    for c, (dim, dim_col) in refs.items():
        orphans = (
            df.select(F.col(c))
            .where(F.col(c).isNotNull())
            .join(
                dim.select(F.col(dim_col).alias(c)).distinct(),
                on=c,
                how="left_anti",
            )
            .agg(F.count(F.lit(1)).cast("long").alias("violations"))
        )
        parts.append(
            orphans.crossJoin(one.select(F.col("_n").cast("long").alias("n_rows")))
            .select(
                F.lit("ref_integrity").alias("check"),
                F.lit(c).alias("column"),
                "violations",
                "n_rows",
            )
        )
    if not parts:
        raise ValueError("expectation_report: no checks declared")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("ok", F.col("violations") == 0)
