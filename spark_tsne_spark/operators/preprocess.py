"""Preprocessing operators (reference example pipeline, SURVEY.md §2.2).

P1 global mean/stdev, P2 standardize, P3 PCA — the reference's MNIST
preprocessing (``MNIST.scala:40-47``) re-expressed declaratively:

- P1: one global scalar mean + *population* stddev over every vector
  component (the reference flattens all pixels; RDD ``stdev()`` is
  population stddev) — explode + agg, Catalyst partial aggregation.
- P2: ``(v − mean) / std`` with the single global pair (NOT
  per-column — reference quirk preserved) via ``F.transform``.
- P3: ``pyspark.ml.feature.PCA`` (Gramian distributed agg, driver
  eigendecomposition, distributed projection — same split as
  RowMatrix.computePrincipalComponents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def global_stats(df: DataFrame, features: str = "features") -> tuple[float, float]:
    """P1: one (mean, population-stddev) pair over all components."""
    row = (
        df.select(F.explode(F.col(features).cast("array<double>")).alias("x"))
        .agg(
            F.avg("x").alias("mean"),
            F.stddev_pop("x").alias("std"),
        )
        .first()
    )
    return float(row["mean"]), float(row["std"])


def standardize(
    df: DataFrame, mean: float, std: float, features: str = "features"
) -> DataFrame:
    """P2: elementwise (v − mean)/std with one global mean/std."""
    return df.withColumn(
        features,
        F.transform(
            F.col(features).cast("array<double>"),
            lambda v: (v - F.lit(mean)) / F.lit(std),
        ),
    )


def pca_project(
    df: DataFrame, k: int, features: str = "features", out_col: str | None = None
) -> DataFrame:
    """P3: PCA to k dims; returns the frame with ``out_col`` as
    array<double> (defaults to replacing ``features``)."""
    from pyspark.ml.feature import PCA
    from pyspark.ml.functions import array_to_vector, vector_to_array

    out_col = out_col or features
    vec = df.withColumn("_v", array_to_vector(F.col(features).cast("array<double>")))
    model = PCA(k=k, inputCol="_v", outputCol="_pca").fit(vec)
    return (
        model.transform(vec)
        .withColumn(out_col, vector_to_array("_pca").cast("array<double>"))
        .drop("_v", "_pca")
    )


def label_centroids(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Per-group embedding centroids: ``(label, n, centroid, counts)``
    with the element-wise mean of every group's vectors and the exact
    per-position support (``counts[i]`` = rows contributing to
    component i — differs across i for ragged vectors / null
    components; ``n = max(counts)``) — the building block under
    cluster statistics, SemDeDup-style cluster summaries, and class
    prototypes.

    Shape: ``posexplode`` widens rows by d, but the (label, pos)
    groupBy partial-aggregates map-side, so the shuffle carries
    |labels|·d rows — independent of corpus size; the re-assembly
    (``array_sort(collect_list(struct(pos, m)))``) runs over d rows
    per label. Means are rounded so cross-engine summation-order
    drift (~1e-12 relative) cannot leak into value hashes.
    """
    e = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "v"),
    )
    agg = e.groupBy("label", "pos").agg(
        F.round(F.avg("v"), decimals).alias("m"), F.count("*").alias("n")
    )
    # The per-(label, pos) count rides through the collect inside the
    # struct, so `counts[i]` is exact even for ragged vectors or null
    # components (where positions have different support); `n` keeps
    # the scalar convenience as the max over positions.
    rolled = agg.groupBy("label").agg(
        F.array_sort(F.collect_list(F.struct("pos", "m", "n"))).alias("s")
    )
    return rolled.select(
        "label",
        F.array_max(F.transform("s", lambda s: s["n"])).alias("n"),
        F.transform("s", lambda s: s["m"]).alias("centroid"),
        F.transform("s", lambda s: s["n"]).alias("counts"),
    )


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass data profile: ``(column, n_rows, n_null, n_distinct,
    min_v, max_v)`` per requested column, min/max computed on the
    NATIVE type then rendered as strings.

    ONE aggregation job over the table: all columns' counts, exact
    distincts, and extrema land in a single agg row (Spark plans the
    multi-column exact distinct via one Expand + shuffle), then the
    1-row result is melted to per-column rows with ``stack`` —
    driver-side cost O(columns), table passes: exactly one. The
    standard first job against any new 100 TB table.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"{c}__nulls"
            ),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__rows, {c}__nulls, {c}__distinct, {c}__min, {c}__max"
        for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_rows, n_null, n_distinct, min_v, max_v)"
        )
    )


def length_histogram(
    df: DataFrame, length_col: str, count_weight: str | None = None
) -> DataFrame:
    """Log2-bucket histogram of a nonnegative integer column:
    ``(bucket, n, total)`` where ``bucket`` is the number of binary
    digits of the value (0 -> 1, 1 -> 1, 2-3 -> 2, 4-7 -> 3, ...) —
    the standard first diagnostic over a corpus's length
    distribution (tokenizer budget planning, truncation policy,
    outlier hunting).

    The bucket id is EXACT-INTEGER (digits of the base-2 rendering),
    not ``floor(log2(x))`` — float log drift at power-of-two
    boundaries can differ between engines' libm; string length of
    the binary rendering cannot. One map-side-combined groupBy over
    at most ~64 buckets: aggregation output is O(1) regardless of
    corpus size.
    """
    v = F.col(length_col).cast("long")
    bucket = F.length(F.bin(v)).alias("bucket")
    w = F.col(count_weight) if count_weight else v
    return (
        df.where(v >= 0)
        .groupBy(bucket)
        .agg(F.count("*").alias("n"), F.sum(w).alias("total"))
    )


def centroid_similarity(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    decimals: int = 6,
) -> DataFrame:
    """Pairwise cosine similarity between per-label centroids:
    ``(label_a, label_b, cos)`` for ``label_a < label_b`` — the
    cluster-confusability diagnostic (which classes/clusters sit close
    in embedding space, which sources duplicate each other's manifold).

    Composes :func:`label_centroids` (shuffle bounded at |labels|*d
    rows) with a |labels|^2/2 self-join of the TINY centroid table —
    the pair space never touches corpus-sized data, so this runs
    identically at 500 rows and 100 TB.
    """
    cents = label_centroids(emb, label_col=label_col, vec_col=vec_col)
    a = cents.select(
        F.col("label").alias("label_a"), F.col("centroid").alias("ca")
    )
    b = cents.select(
        F.col("label").alias("label_b"), F.col("centroid").alias("cb")
    )
    dot = F.aggregate(
        F.zip_with("ca", "cb", lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    return (
        a.crossJoin(b)
        .where(F.col("label_a") < F.col("label_b"))
        .select(
            "label_a",
            "label_b",
            F.round(dot / (nrm(F.col("ca")) * nrm(F.col("cb"))), decimals).alias(
                "cos"
            ),
        )
    )


def key_skew_profile(df: DataFrame, cols: list[str], k: int = 5) -> DataFrame:
    """Top-k heaviest keys per column with their corpus share:
    ``(column, key, cnt, share, rnk)`` — the skew diagnostic run
    BEFORE choosing join/aggregation strategies at 100 TB (a 30%-share
    key means salting or AQE skew handling on any shuffle keyed by
    that column; a flat profile means plain hash partitioning is
    fine).

    ONE scan: every column's key melts through a single ``explode``
    of (name, value) structs, one map-side-combined groupBy counts
    (|distinct keys| shuffle rows), and the top-k window runs per
    column over the already-aggregated counts. Rank ties break on the
    key text so the cut is deterministic.
    """
    kv = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("key"),
                    )
                    for c in cols
                ]
            )
        ).alias("kv")
    ).select("kv.column", "kv.key")
    counts = kv.groupBy("column", "key").agg(F.count("*").alias("cnt"))
    w_tot = Window.partitionBy("column")
    w_rnk = Window.partitionBy("column").orderBy(F.col("cnt").desc(), "key")
    return (
        counts.withColumn("tot", F.sum("cnt").over(w_tot))
        .withColumn("rnk", F.row_number().over(w_rnk).cast("long"))
        .where(F.col("rnk") <= k)
        .select(
            "column",
            "key",
            "cnt",
            F.round(F.col("cnt") / F.col("tot"), 6).alias("share"),
            "rnk",
        )
    )


def procrustes_rotation(
    x_df, y_df, id_col: str, x_col: str = "embedding", y_col: str = "embedding"
):
    """Orthogonal Procrustes between two embedding versions: the
    rotation R (d x d numpy array) minimizing ||X R - Y||_F over
    orthogonal matrices, plus the singular values of the cross-
    covariance — the standard tool for migrating vector stores across
    model versions without re-embedding-dependent consumers.

    R = U V^T from the SVD of M = X^T Y (Schönemann 1966). The ONLY
    distributed work is accumulating M: one id-equi join and one
    ``mapInPandas`` pass emitting per-partition d x d partial sums
    (each partition reduces to d² floats regardless of row count), so
    driver state and the SVD are O(d²)/O(d³) — corpus-size-
    independent. Like the PCA path, the numerics are float sums whose
    partition-order wobble is ~1e-12 relative; callers comparing
    against a golden should round.
    """
    import numpy as np
    from pyspark.sql import functions as F

    x = x_df.select(F.col(id_col).alias("_pid"), F.col(x_col).alias("_x"))
    y = y_df.select(F.col(id_col).alias("_pid"), F.col(y_col).alias("_y"))
    j = x.join(y, "_pid").select("_x", "_y")

    def partials(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            X = _np.array(pdf["_x"].tolist(), dtype=_np.float64)
            Y = _np.array(pdf["_y"].tolist(), dtype=_np.float64)
            M = X.T @ Y
            yield _pd.DataFrame({"m": [M.reshape(-1).tolist()]})

    d = len(j.first()["_x"])
    parts = j.mapInPandas(partials, "m array<double>").collect()
    M = np.zeros((d, d), dtype=np.float64)
    for row in parts:
        M += np.array(row["m"], dtype=np.float64).reshape(d, d)
    U, S, Vt = np.linalg.svd(M)
    R = U @ Vt
    return R, S
