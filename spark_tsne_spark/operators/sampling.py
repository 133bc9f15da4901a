"""Deterministic corpus sampling for training-data pipelines.

``DataFrame.sample`` is seed- *and partitioning*-dependent: the same
seed over a repartitioned input selects different rows, which makes
pipeline re-runs irreproducible. Content-hash sampling instead keys
the include/exclude decision on a hash of the row's own bytes, so the
sample is stable across runs, partitionings, engines (exact SQL
oracle in DuckDB), and cluster sizes — and identical payloads land on
the same side of the cut, composing cleanly with dedup.

All expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen) and the predicate sits directly above the scan,
so Catalyst can prune columns; one narrow pass, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# 15 lowercase-hex md5 chars = 60 bits: fits a signed 64-bit int in
# both Spark (conv base 16 -> 10) and DuckDB (('0x' || h)::BIGINT).
_HASH_BITS = 60
_HASH_SPACE = 1 << _HASH_BITS


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def hash_bucket(key: Column | str, salt: str = "") -> Column:
    """Uniform 60-bit bucket from md5(salt || key) — the shared
    primitive under sampling and train/test splitting. DuckDB oracle:
    ``('0x' || substring(md5(salt || key), 1, 15))::BIGINT``.
    """
    h = F.md5(F.concat(F.lit(salt), _col(key)))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def hash_sample(
    df: DataFrame, key: Column | str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep rows whose content-hash bucket falls below ``fraction`` of
    the hash space. Change ``salt`` to draw an independent sample."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    return df.where(hash_bucket(key, salt) < int(fraction * _HASH_SPACE))


def weighted_hash_sample(
    df: DataFrame,
    key: Column | str,
    weight: Column | str,
    n: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES): each row gets priority
    ``u^(1/w)`` — equivalently ``-ln(u)/w`` minimized — with ``u``
    drawn from the row's own content hash, and the global top-``n``
    priorities win. Inclusion probability is proportional to weight,
    the draw is reproducible across runs/partitionings/engines (u is
    the content hash, not an RNG), and the whole selection is one
    ``TakeOrderedAndProject`` — per-partition top-n + driver merge,
    no global sort shuffle.
    """
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    u = (hash_bucket(key, salt).cast("double") + F.lit(1.0)) / F.lit(
        float(_HASH_SPACE)
    )
    w = _col(weight).cast("double")
    pri = -F.log(u) / w
    # smallest exponential variate wins (≡ largest u^(1/w));
    # deterministic tie-break on the hash itself (coincidental float
    # ties only — u is content-derived, never structural)
    return df.withColumn("_pri", pri).orderBy(
        F.col("_pri").asc(), hash_bucket(key, salt).asc()
    ).limit(n).drop("_pri")


def stratified_hash_sample(
    df: DataFrame,
    key: Column | str,
    stratum: Column | str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. keep 20% of 'en' docs
    but 5% of 'other'): one CASE over the stratum column picks the
    threshold, the same content-hash bucket decides membership. Still
    a single narrow pass — the stratum never becomes a shuffle key."""
    threshold = F.lit(int(default_fraction * _HASH_SPACE))
    for value, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction must be in [0, 1], got {frac}")
        threshold = F.when(
            _col(stratum) == value, F.lit(int(frac * _HASH_SPACE))
        ).otherwise(threshold)
    return df.where(hash_bucket(key, salt) < threshold)


def stratum_quantile_threshold(
    scored: DataFrame,
    q: float,
    stratum_col: str = "stratum",
    value_col: str = "value",
) -> DataFrame:
    """Per-stratum EXACT discrete q-quantile — ``(stratum, thr)``
    where ``thr`` is the smallest value whose cumulative count reaches
    ``ceil(q · n)`` within its stratum.

    The trick that makes this exact AND scale-safe: the cumsum window
    runs over the per-(stratum, value) HISTOGRAM, not the corpus — for
    grid-valued inputs (e.g. a quality score rounded to 6 decimals)
    the histogram is bounded by the grid size (≤ ~10⁶ rows/stratum)
    regardless of corpus size, and the groupBy that builds it is
    map-side combined. No interpolation anywhere, so there is no
    engine-dependent half-point arithmetic — the threshold is always
    an actual data value.
    """
    if not 0.0 < q <= 1.0:
        raise ValueError(f"q must be in (0, 1], got {q}")
    from pyspark.sql import Window

    hist = scored.groupBy(stratum_col, value_col).agg(
        F.count("*").alias("_cnt")
    )
    totals = hist.groupBy(stratum_col).agg(F.sum("_cnt").alias("_n"))
    w = Window.partitionBy(stratum_col).orderBy(F.col(value_col).asc())
    return (
        hist.join(totals, stratum_col)
        .withColumn("_cum", F.sum("_cnt").over(w))
        .where(F.col("_cum") >= F.ceil(F.lit(q) * F.col("_n")))
        .groupBy(stratum_col)
        .agg(F.min(value_col).alias("thr"))
    )


def quality_gate_per_stratum(
    docs: DataFrame,
    q: float = 0.5,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-source quality gating (the FineWeb/CCNet pattern: a global
    quality threshold over-prunes clean sources and under-prunes noisy
    ones — gate each source against its OWN distribution): keep
    documents whose rounded quality score is ≥ their source's exact
    discrete q-quantile. Output ``(doc_id, stratum, quality, thr)``.

    One histogram aggregate + a broadcast of |strata| thresholds back
    onto a narrow scan — the corpus is never windowed by the skewed
    source key."""
    from spark_tsne_spark.functions.text import quality_score

    scored = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        F.round(quality_score(text_col), 6).alias("quality"),
    )
    thr = stratum_quantile_threshold(
        scored, q, stratum_col="stratum", value_col="quality"
    )
    return scored.join(F.broadcast(thr), "stratum").where(
        F.col("quality") >= F.col("thr")
    ).select("doc_id", "stratum", "quality", "thr")


def train_test_split(
    df: DataFrame, key: Column | str, test_fraction: float, salt: str = ""
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive (train, test) split on the content hash:
    a document can never leak across the boundary between re-runs,
    the property random splits lose the moment data is re-partitioned."""
    cut = int(test_fraction * _HASH_SPACE)
    bucket = hash_bucket(key, salt)
    return df.where(bucket >= cut), df.where(bucket < cut)


def temperature_mix(
    df: DataFrame,
    key: Column | str,
    weight: Column | str,
    stratum: Column | str | None = None,
    alpha: float = 0.5,
    target_weight: float = 1_000_000.0,
    salt: str = "",
) -> DataFrame:
    """Temperature-based source mixing — the standard LLM-pretraining
    reweighting (GPT-3 / PaLM style): source ``s`` with total weight
    ``W_s`` (e.g. token count) is sampled with probability mass
    proportional to ``W_s**alpha``, so ``alpha=1`` reproduces natural
    proportions and ``alpha -> 0`` flattens toward uniform-per-source
    — upweighting small high-quality sources without hand-tuned
    budgets. Per-source keep rate::

        rate_s = min(1, target_weight * W_s**alpha / sum_t(W_t**alpha) / W_s)

    rounded to 9 decimals (shared grid with the SQL oracle), then rows
    keep deterministically via the content-hash bucket — stable across
    runs, partitionings, and engines; change ``salt`` for an
    independent draw. Adds a ``mix_rate`` column.

    Shape at 100 TB: ONE map-side-combined groupBy to |sources| rows,
    one scalar aggregate, and a rate join back that AQE turns into a
    broadcast when the source catalog fits (no explicit hint: a
    pathological stratum key — e.g. URL-per-row — must fall back to a
    shuffle join, not OOM the driver). The keep filter is a narrow
    JVM-side predicate over the scan.
    """
    if alpha <= 0 or alpha > 1:
        raise ValueError(f"need 0 < alpha <= 1, got {alpha}")
    if target_weight <= 0:
        raise ValueError(f"need target_weight > 0, got {target_weight}")
    stratum = "source" if stratum is None else stratum
    s_col = F.col(stratum) if isinstance(stratum, str) else stratum
    per = df.groupBy(s_col.alias("_stratum")).agg(
        F.sum(_col(weight)).cast("double").alias("_w")
    )
    z = per.agg(F.sum(F.pow("_w", F.lit(alpha))).alias("_z"))
    rates = per.crossJoin(z).select(
        "_stratum",
        F.round(
            F.least(
                F.lit(1.0),
                F.lit(float(target_weight))
                * F.pow("_w", F.lit(alpha))
                / F.col("_z")
                / F.col("_w"),
            ),
            9,
        ).alias("mix_rate"),
    )
    u = hash_bucket(key, salt).cast("double") / F.lit(float(_HASH_SPACE))
    return (
        df.join(rates, s_col == F.col("_stratum"))
        .where(u < F.col("mix_rate"))
        .drop("_stratum")
    )


def grouped_split(
    df: DataFrame,
    group_key: Column | str,
    val_fraction: float = 0.1,
    test_fraction: float = 0.1,
    salt: str = "",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: the hash bucket is
    computed on a GROUP key (e.g. the duplicate-cluster canonical id,
    or a normalized-content fingerprint), so every member of a group
    lands in the SAME split — the property row-level
    ``train_test_split`` loses when duplicates or near-duplicates of
    one document exist (a train/test pair of near-identical docs is
    eval contamination). Adds a ``split`` column ('train'/'val'/
    'test'); deterministic across runs, partitionings, and engines
    (content hash, no RNG).

    One narrow projection — the group key is an expression over the
    row (or a previously-joined cluster id); no shuffle is added
    here. The standard composition is
    ``dedup -> grouped_split(canonical_id) -> write partitioned by
    split``.
    """
    if val_fraction < 0 or test_fraction < 0 or (
        val_fraction + test_fraction
    ) >= 1.0:
        raise ValueError(
            "need val_fraction, test_fraction >= 0 with sum < 1, got "
            f"{val_fraction}/{test_fraction}"
        )
    b = hash_bucket(group_key, salt)
    t_cut = int(test_fraction * _HASH_SPACE)
    v_cut = t_cut + int(val_fraction * _HASH_SPACE)
    return df.withColumn(
        "split",
        F.when(b < t_cut, F.lit("test"))
        .when(b < v_cut, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def distribution_matched_sample(
    df: DataFrame,
    ref_cond: Column,
    bin_expr: Column,
    key: Column | str,
    id_col: str,
    salt: str = "",
) -> DataFrame:
    """Distribution-matched sampling: draw from the candidate rows
    (``NOT ref_cond``) so the sample's histogram over ``bin_expr``
    equals the reference rows' histogram — the curation move for
    building a control corpus matched on length / quality / domain
    composition (propensity matching on one observed covariate).

    Per bin b: keep the ``n_ref(b)`` candidates with the smallest
    content-hash (``hash_bucket(key, salt)``, ``id_col`` tie-break) —
    deterministic across runs, partitionings, and engines, and an
    unbiased uniform draw within the bin because the hash is
    independent of every row attribute. Bins where candidates <
    n_ref(b) keep everything (the match is then best-effort short).

    Plan: one aggregation of the reference side to a |bins|-row table
    (broadcast), then a per-bin ranked window over candidates. The
    window partitions by bin — bounded shuffle, but a hot bin sorts
    in one task; at extreme per-bin cardinality swap the rank for a
    per-bin hash threshold from ``histogram_sketch_quantiles``'s
    count table (filter, no sort) at the cost of ±1 bin-width count
    error.

    Output: candidate rows + ``bin`` + ``want`` (the matched target).
    """
    from pyspark.sql import Window

    want = df.where(ref_cond).groupBy(bin_expr.alias("bin")).agg(
        F.count("*").alias("want")
    )
    cand = (
        df.where(~ref_cond)
        .withColumn("bin", bin_expr)
        .withColumn("hb", hash_bucket(key, salt))
    )
    w = Window.partitionBy("bin").orderBy("hb", id_col)
    return (
        cand.join(F.broadcast(want), "bin")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= F.col("want"))
        .drop("hb", "rn")
    )


def curation_funnel(
    docs: DataFrame,
    len_lo: int,
    len_hi: int,
    lang: str = "en",
    per_source_cap: int = 20,
) -> DataFrame:
    """Per-stage attrition report for the standard cleaning funnel
    (the Dolma/FineWeb "how much survived each gate" artifact):
    raw → length gate → language gate → exact dedup (first copy per
    canonical-text fingerprint wins) → per-source cap (longest docs
    first). Returns one row per stage: (stage, docs, chars).

    Scale shape: a naive funnel recounts the corpus once per stage —
    5 scans of 100 TB. This plan tags every row with the furthest
    stage it survives in ONE pass: the dedup and cap stages become
    CONDITIONAL running counts (``sum(case when survives)`` over the
    fingerprint / source windows), so "rank among survivors" is
    computed without materializing the intermediate corpora, and all
    five stage totals fold into a single aggregation row that
    unpivots to the report. Two window shuffles + one agg, total.
    """
    from spark_tsne_spark.functions.text import fingerprint
    from pyspark.sql import Window

    d = docs.select("doc_id", "text", "lang", "source", "n_chars")
    s1 = F.col("n_chars").between(len_lo, len_hi)
    s2 = s1 & (F.col("lang") == lang)
    w_fp = (
        Window.partitionBy(fingerprint("text"))
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_fp = F.sum(F.when(s2, 1).otherwise(0)).over(w_fp)
    d = d.withColumn("_s2", s2).withColumn("_s3", s2 & (cum_fp == 1))
    w_src = (
        Window.partitionBy("source")
        .orderBy(F.col("n_chars").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_src = F.sum(F.when(F.col("_s3"), 1).otherwise(0)).over(w_src)
    d = d.withColumn("_s4", F.col("_s3") & (cum_src <= per_source_cap))

    def pair(cond, tag):
        return [
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"d_{tag}"),
            F.sum(F.when(cond, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias(f"c_{tag}"),
        ]

    agg = d.agg(
        *pair(F.lit(True), "raw"),
        *pair(s1, "len"),
        *pair(F.col("_s2"), "lang"),
        *pair(F.col("_s3"), "dedup"),
        *pair(F.col("_s4"), "cap"),
    )
    stages = ["raw", "len", "lang", "dedup", "cap"]
    stack = ", ".join(
        f"'{i}_{s}', d_{s}, c_{s}" for i, s in enumerate(stages)
    )
    return (
        agg.selectExpr(f"stack(5, {stack}) AS (stage, docs, chars)")
        .orderBy("stage")
    )
