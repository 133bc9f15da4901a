"""Structured Streaming: file-source windowed aggs must equal their
batch twins; the t-SNE progress sink must be stream-readable."""

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_tsne_spark.sources.tables import load_table
from spark_tsne_spark.streaming.progress import IterationSink, read_progress_stream
from spark_tsne_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
    session_counts,
    windowed_counts,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Re-land events as µs-timestamped parquet files (the raw fixture
    may be TIMESTAMP(NANOS), which file streaming reads like batch)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, "events", sf_dir).repartition(4).write.mode("overwrite").parquet(out)
    return out


def test_windowed_counts_match_batch(spark, sf_dir, events_dir):
    stream = windowed_counts(read_events_stream(spark, events_dir))
    run_to_memory(stream, "win_counts")
    got = {
        (r["hour_ts"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("win_counts").collect()
    }
    batch = (
        load_table(spark, "events", sf_dir)
        .groupBy(F.date_trunc("hour", "ts").alias("hour_ts"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("s"))
        .collect()
    )
    want = {(r["hour_ts"], r["event_type"]): (r["n"], r["s"]) for r in batch}
    assert got == want


def test_session_counts_total(spark, sf_dir, events_dir):
    stream = session_counts(read_events_stream(spark, events_dir))
    run_to_memory(stream, "sess_counts")
    rows = spark.table("sess_counts").collect()
    total_events = sum(r["n_events"] for r in rows)
    assert total_events == load_table(spark, "events", sf_dir).count()
    for r in rows:
        assert r["session_start"] <= r["session_end"]


def test_progress_sink_stream_roundtrip(spark, tmp_path):
    out = str(tmp_path / "progress")
    ids = np.arange(5)
    sink = IterationSink(out, ids)
    rng = np.random.default_rng(0)
    for it in range(1, 4):
        sink(it, rng.standard_normal((5, 2)), loss=float(it))
    # cost file has one line per reported loss
    with open(os.path.join(out, "cost.txt")) as f:
        assert len(f.readlines()) == 3
    stream = read_progress_stream(spark, out)
    q = (
        stream.writeStream.format("memory")
        .queryName("progress")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("progress").collect()
    assert len(rows) == 15  # 3 iterations × 5 points
    assert {r["iteration"] for r in rows} == {1, 2, 3}


def test_stateful_running_stats(spark, sf_dir, events_dir):
    """applyInPandasWithState custom operator: running per-user counts
    over one availableNow drain must equal the batch per-user counts."""
    from spark_tsne_spark.streaming.stateful import running_user_stats

    stream = running_user_stats(read_events_stream(spark, events_dir))
    q = (
        stream.writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.table("user_stats").collect()
    got = {}
    for r in rows:  # keep the latest running row per user
        got[r["user_id"]] = (r["n_events"], round(r["sum_value"], 4))
    batch = (
        load_table(spark, "events", sf_dir)
        .groupBy("user_id")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("s"))
        .collect()
    )
    want = {r["user_id"]: (r["n"], r["s"]) for r in batch}
    assert got == want


def test_player_json_fold(spark, tmp_path):
    """IterationSink CSVs fold into the d3 player's JSON shape
    (iterations list + per-point pos trajectories)."""
    import json
    import numpy as np

    from spark_tsne_spark.streaming.progress import IterationSink
    from spark_tsne_spark.streaming.player import fold_progress_to_player_json

    out = str(tmp_path / "prog")
    ids = np.arange(4)
    sink = IterationSink(out, ids)
    rng = np.random.default_rng(0)
    for it in range(1, 13):
        sink(it, rng.standard_normal((4, 2)), loss=None)
    res = fold_progress_to_player_json(
        out, str(tmp_path / "player.json"), labels={0: 7},
        early_exaggeration=10, stride=2,
    )
    # iterations 1..9 all kept; then 10, 12
    assert res["iterations"] == [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 12]
    assert len(res["data"]) == 4
    assert res["data"][0]["label"] == 7
    assert all(len(d["pos"]) == len(res["iterations"]) for d in res["data"])
    on_disk = json.load(open(tmp_path / "player.json"))
    assert on_disk["iterations"] == res["iterations"]


def test_bundled_viewer_pairs_with_player_json(spark, tmp_path):
    """The repo bundles an original viewer for the player JSON: it
    must exist, be fully self-contained (no external script/style
    fetches — works offline), and reference the exact JSON fields the
    fold produces (iterations / data / pos / label)."""
    import json
    import os
    import re
    import numpy as np

    from spark_tsne_spark.streaming.player import fold_progress_to_player_json
    from spark_tsne_spark.streaming.progress import IterationSink

    html_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples", "player.html",
    )
    html = open(html_path).read()
    # self-contained: no src=/href= pointing at http(s) or protocol-
    # relative URLs (fetch of the sibling tsne_run.json is relative)
    assert not re.search(r"""(src|href)\s*=\s*["'](https?:)?//""", html)
    for field in ("iterations", "data", "pos", "label", "tsne_run.json"):
        assert field in html
    # the JSON the example writes satisfies the viewer's contract
    out = str(tmp_path / "prog")
    sink = IterationSink(out, np.arange(3))
    rng = np.random.default_rng(1)
    for it in range(1, 4):
        sink(it, rng.standard_normal((3, 2)), loss=None)
    fold_progress_to_player_json(out, str(tmp_path / "tsne_run.json"))
    doc = json.load(open(tmp_path / "tsne_run.json"))
    assert isinstance(doc["iterations"], list) and doc["iterations"]
    for d in doc["data"]:
        assert {"key", "label", "pos"} <= set(d)
        assert all({"x", "y"} <= set(p) for p in d["pos"])
        assert len(d["pos"]) == len(doc["iterations"])


def test_streaming_dedup_matches_batch(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark keep-set == batch distinct
    fingerprints when all duplicates arrive inside the watermark."""
    from spark_tsne_spark.functions.text import fingerprint
    from spark_tsne_spark.streaming.dedup import dedup_stream

    docs = (
        load_table(spark, "documents", sf_dir)
        .limit(100)
        .select("doc_id", "text")
        .withColumn(
            "ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id"))
        )
    )
    # every doc re-arrives 10 minutes later under a new id
    dups = docs.withColumn("doc_id", F.col("doc_id") + 1000).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 10 MINUTES")
    )
    path = str(tmp_path / "docs_stream")
    docs.write.parquet(path)
    dups.write.mode("append").parquet(path)

    stream = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .parquet(path)
    )
    q = (
        dedup_stream(stream, watermark="2 hours")
        .writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM sdedup")
    want_n = (
        docs.unionByName(dups).select(fingerprint("text").alias("fp"))
        .distinct()
        .count()
    )
    assert got.count() == want_n
    # one emitted row per fingerprint, each a real ingested row
    assert got.select("fp").distinct().count() == want_n


def test_incremental_dedup_replay_is_self_cleaning(spark, tmp_path):
    """The fingerprint index makes reprocessing idempotent: draining
    the SAME files again (fresh stream, same index) emits zero new
    rows, and the first drain kept each fingerprint exactly once."""
    from pyspark.sql import functions as F

    from spark_tsne_spark.streaming.incremental import dedup_ingest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    with_dups = docs.unionAll(
        docs.where(F.col("doc_id") < 10).select(
            (F.col("doc_id") + 5000).alias("doc_id"), "text"
        )
    )
    root = str(tmp_path)
    with_dups.repartition(3).write.parquet(f"{root}/in")

    def drain():
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{root}/in")
        )
        q = dedup_ingest(stream, f"{root}/index", f"{root}/out")
        q.awaitTermination()

    drain()
    out = spark.read.parquet(f"{root}/out")
    n_first = out.count()
    # each fingerprint exactly once, set == batch-global distinct
    assert out.groupBy("fp").count().agg(F.max("count")).first()[0] == 1
    expected = with_dups.select(
        F.md5(
            F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))
        ).alias("fp")
    ).distinct()
    assert n_first == expected.count()

    drain()  # full replay of the same files
    assert spark.read.parquet(f"{root}/out").count() == n_first


def test_streaming_quota_state_carries_across_drains(spark, tmp_path):
    """Per-stratum consumed-token totals live in the checkpoint: a
    second availableNow drain over NEW files resumes the budget where
    the first stopped (never re-admitting beyond it), and a single
    all-at-once drain equals the batch operator."""
    from pyspark.sql import functions as F

    from spark_tsne_spark.operators.packing import token_budget_sample
    from spark_tsne_spark.streaming.quota import (
        run_quota_to_parquet,
        token_quota_admit,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").where(
        F.col("source") == "src0"
    )
    budgets = {"src0": 400}
    root = str(tmp_path)

    # single-batch drain == batch operator
    docs.select("doc_id", "source", "text").write.parquet(f"{root}/all")
    stream = spark.readStream.schema(
        "doc_id long, source string, text string"
    ).parquet(f"{root}/all")
    run_quota_to_parquet(
        token_quota_admit(stream, budgets, salt="qt"),
        f"{root}/out_all",
        f"{root}/ck_all",
    )
    got = spark.read.schema(
        "doc_id long, stratum string, n_tok long, cum long"
    ).parquet(f"{root}/out_all")
    want = token_budget_sample(docs, budgets, salt="qt")
    key = lambda r: (r["doc_id"], r["n_tok"], r["cum"])
    assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))

    # two-drain restart: first half, then the rest against the SAME
    # checkpoint — totals must carry (grand total admitted <= budget)
    half = docs.where(F.col("doc_id") % 2 == 0)
    rest = docs.where(F.col("doc_id") % 2 == 1)
    half.select("doc_id", "source", "text").write.parquet(f"{root}/in2")

    def drain():
        s = spark.readStream.schema(
            "doc_id long, source string, text string"
        ).parquet(f"{root}/in2")
        run_quota_to_parquet(
            token_quota_admit(s, budgets, salt="qt"),
            f"{root}/out2",
            f"{root}/ck2",
        )

    drain()
    n_first = spark.read.schema(
        "doc_id long, stratum string, n_tok long, cum long"
    ).parquet(f"{root}/out2").agg(F.sum("n_tok")).collect()[0][0]
    rest.select("doc_id", "source", "text").write.mode("append").parquet(
        f"{root}/in2"
    )
    drain()
    out2 = spark.read.schema(
        "doc_id long, stratum string, n_tok long, cum long"
    ).parquet(f"{root}/out2")
    total = out2.agg(F.sum("n_tok")).collect()[0][0]
    assert n_first is not None and n_first <= 400
    assert total <= 400  # the second drain respected the carried state
    assert out2.count() >= 1
    # no doc admitted twice
    assert out2.select("doc_id").distinct().count() == out2.count()
