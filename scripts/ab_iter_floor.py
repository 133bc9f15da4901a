"""Attack the flagship's per-iteration fixed overhead (VERDICT r12 #4).

The 50k flagship pays ~0.33 s/iteration of Python-stage scheduling
floor on top of ~0.1-0.2 s of kernel+boundary. Candidate levers that
do NOT touch update semantics, measured here ABBA-style (min-of-4):

  A. today: bh pass over the CACHED adjacency (full kNN lineage in
     every per-iteration plan) + toPandas
  B. bh pass over adjacency.localCheckpoint() (leaf plan — is
     per-iteration analysis/optimization of the big lineage a cost?)
  C. A with AQE disabled for the collect
  D. A with fewer adjacency partitions (8 instead of 32) — trades
     kernel parallelism against task-launch count
  E. construction-only cost: build the pass DataFrame without running

    python scripts/ab_iter_floor.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

from spark_tsne_spark.session import get_spark  # noqa: E402
from spark_tsne_spark.shipping import ship_package  # noqa: E402

spark = get_spark(
    "ab_iter_floor", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
)
ship_package(spark)
sc = spark.sparkContext

spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
    lambda it: (pdf for pdf in it), "id long"
).count()

from spark_tsne_spark.sources.tables import load_table  # noqa: E402

FLAGSHIP_COPIES = 25
e = load_table(spark, "embeddings", sf_dir)
copies = spark.range(FLAGSHIP_COPIES).select(F.col("id").alias("copy"))
big = (
    e.crossJoin(copies)
    .select(
        (F.col("vec_id") + F.col("copy") * 1_000_000).alias("vid"),
        F.transform(
            "embedding",
            lambda x, i: (
                x
                + F.pmod(
                    F.xxhash64(F.col("vec_id"), F.col("copy"), i), F.lit(1000)
                ).cast("double")
                / 1e4
            ).cast("float"),
        ).alias("embedding"),
    )
    .withColumnRenamed("vid", "vec_id")
    .repartition(int(cpus))
    .cache()
)

from spark_tsne_spark.api import (  # noqa: E402
    TREE_COARSE_MIN_N,
    TREE_LEAF_SIZE,
    _prepare,
)
from spark_tsne_spark.gradient import bh_gradient_pass  # noqa: E402
from spark_tsne_spark.sptree import FlatTree  # noqa: E402

prof: dict = {}
t0 = time.time()
adjacency, ids, n = _prepare(
    big, 30.0, "vec_id", "embedding", "auto", "bh", profile=prof
)
print(f"prepare total {time.time()-t0:.2f}s", flush=True)

rng = np.random.default_rng(42)
Y = rng.standard_normal((n, 2)) * 1e-4
bc_ids = sc.broadcast(ids)
tree = FlatTree.build(Y, leaf_size=TREE_LEAF_SIZE if n >= TREE_COARSE_MIN_N else 1)
bc_state = sc.broadcast((Y, tree))


def timeit(label, fn, reps=6):
    ts = []
    for _ in range(reps):
        t = time.time()
        fn()
        ts.append(round(time.time() - t, 3))
    print(f"{label}: min={min(ts)} runs={ts}", flush=True)
    return min(ts)


# A: today's per-iteration shape (fresh DataFrame each rep, like _loop)
sc.setJobDescription("A today cached-lineage toPandas")
timeit(
    "A today (cached lineage, fresh plan/iter, toPandas)",
    lambda: bh_gradient_pass(adjacency, bc_state, bc_ids, 0.5, 12.0).toPandas(),
)

# B: leaf-plan adjacency (localCheckpoint truncates the kNN lineage)
t = time.time()
adj_ckpt = adjacency.localCheckpoint(eager=True)
print(f"localCheckpoint {time.time()-t:.2f}s", flush=True)
sc.setJobDescription("B ckpt-leaf toPandas")
timeit(
    "B leaf plan (localCheckpoint, fresh plan/iter, toPandas)",
    lambda: bh_gradient_pass(adj_ckpt, bc_state, bc_ids, 0.5, 12.0).toPandas(),
)

# C: AQE off around the collect
def run_aqe_off():
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        bh_gradient_pass(adjacency, bc_state, bc_ids, 0.5, 12.0).toPandas()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")

sc.setJobDescription("C AQE off")
timeit("C AQE off (cached lineage)", run_aqe_off)

def run_aqe_off_ckpt():
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        bh_gradient_pass(adj_ckpt, bc_state, bc_ids, 0.5, 12.0).toPandas()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")

sc.setJobDescription("C2 AQE off + ckpt")
timeit("C2 AQE off + leaf plan", run_aqe_off_ckpt)

# D: fewer partitions (8) — fewer task launches, less parallel kernel
adj8 = adj_ckpt.coalesce(8)
sc.setJobDescription("D 8-partition ckpt")
timeit(
    "D leaf plan coalesce(8)",
    lambda: bh_gradient_pass(adj8, bc_state, bc_ids, 0.5, 12.0).toPandas(),
)

# E: plan construction only (no execution)
def construct_only():
    bh_gradient_pass(adjacency, bc_state, bc_ids, 0.5, 12.0)

timeit("E construct-only (cached lineage)", construct_only, reps=8)

def construct_only_ckpt():
    bh_gradient_pass(adj_ckpt, bc_state, bc_ids, 0.5, 12.0)

timeit("E2 construct-only (leaf)", construct_only_ckpt, reps=8)

spark.stop()
