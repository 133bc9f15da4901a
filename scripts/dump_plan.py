"""Dump .explain('formatted') for one or more bench entries.

Usage: python scripts/dump_plan.py <out_dir> <suffix> <entry> [<entry>...]

Writes <out_dir>/<entry>_<suffix>.txt. Run with PYTHONPATH pointing at
the repo root (or a worktree of an older commit, which is how the
*_before.txt files under plans/r12/ were generated — the script
resolves `bench` and the package from PYTHONPATH).
"""
import io
import os
import sys
from contextlib import redirect_stdout

out_dir, suffix = sys.argv[1], sys.argv[2]
entries = sys.argv[3:]

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

from spark_tsne_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402

spark = get_spark(
    "dump_plan", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
)
qmap = bench.bench_queries()
os.makedirs(out_dir, exist_ok=True)
for name in entries:
    df = qmap[name](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    path = os.path.join(out_dir, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(buf.getvalue())
    print(f"wrote {path} ({len(buf.getvalue())} bytes)", flush=True)
spark.stop()
