"""Attribute the flagship's per-iteration cost (round 12, guide §1).

Builds the bench flagship input (50k rows), runs _prepare, then times:
  A. cached-adjacency noop scan            (cache read floor)
  B. identity mapInPandas + noop           (A + Python boundary)
  C. full BH force pass + noop             (B + kernel)
  D. full BH force pass + toPandas         (C + driver collect)
  E. flatten-only mapInPandas + noop       (B + _flatten_edges)
and the driver-side assemble/update tail.
"""
import os
import time

import numpy as np

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
sf_dir = os.environ["SPARK_GRAFT_SF_DIR"]
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F  # noqa: E402

from spark_tsne_spark.session import get_spark  # noqa: E402
from spark_tsne_spark.shipping import ship_package  # noqa: E402

spark = get_spark(
    "profile_flagship", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
)
ship_package(spark)
sc = spark.sparkContext

# warm boundary
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

from spark_tsne_spark.api import _prepare  # noqa: E402

prof: dict = {}
t0 = time.time()
adjacency, ids, n = _prepare(
    big, 30.0, "vec_id", "embedding", "auto", "bh", profile=prof
)
print(f"prepare total {time.time()-t0:.2f}s profile={prof}", flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(label, fn, reps=4):
    ts = []
    for _ in range(reps):
        t = time.time()
        fn()
        ts.append(round(time.time() - t, 3))
    print(f"{label}: min={min(ts)} runs={ts}", flush=True)
    return min(ts)


sc.setJobDescription("A: adjacency noop scan")
timeit("A adjacency noop scan", lambda: noop(adjacency))

ident = adjacency.mapInPandas(
    lambda it: (pdf for pdf in it), adjacency.schema
)
sc.setJobDescription("B: identity mapInPandas")
timeit("B identity mapInPandas+noop", lambda: noop(ident))


def flatten_pass(batches):
    from spark_tsne_spark.gradient import _flatten_edges
    import pandas as pd

    for pdf in batches:
        if len(pdf) == 0:
            continue
        row_of, jpos, p = _flatten_edges(pdf, ids, 1.0)
        yield pd.DataFrame({"i": pdf["i"], "m": [float(len(jpos))] * len(pdf)})


sc.setJobDescription("E: flatten-only pass")
flat = adjacency.mapInPandas(flatten_pass, "i long, m double")
timeit("E flatten-only+noop", lambda: noop(flat))

from spark_tsne_spark.gradient import assemble, bh_gradient_pass  # noqa: E402
from spark_tsne_spark.sptree import FlatTree  # noqa: E402
from spark_tsne_spark.api import TREE_COARSE_MIN_N, TREE_LEAF_SIZE  # noqa: E402

rng = np.random.default_rng(42)
Y = rng.standard_normal((n, 2)) * 1e-4
bc_ids = sc.broadcast(ids)

t = time.time()
tree = FlatTree.build(Y, leaf_size=TREE_LEAF_SIZE if n >= TREE_COARSE_MIN_N else 1)
print(f"tree build {time.time()-t:.3f}s", flush=True)
t = time.time()
bc_state = sc.broadcast((Y, tree))
print(f"broadcast {time.time()-t:.3f}s", flush=True)

pass_df = bh_gradient_pass(adjacency, bc_state, bc_ids, 0.5, 12.0)
sc.setJobDescription("C: full BH pass noop")
timeit("C bh pass+noop", lambda: noop(pass_df))

res = [None]


def collect_pass():
    res[0] = pass_df.toPandas()


sc.setJobDescription("D: full BH pass toPandas")
timeit("D bh pass+toPandas", collect_pass)

t = time.time()
dY, Z, loss = assemble(res[0], ids, n, 2, "bh")
print(f"assemble {time.time()-t:.3f}s", flush=True)

spark.stop()
