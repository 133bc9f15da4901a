"""Interleaved A/B of env-gated plan-truncation changes (round 13
part 2). Usage:

    SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
        python scripts/ab_ckpt_r13.py <entry> <ENV_VAR> [pairs]

Runs the bench entry warm once, then `pairs` interleaved (A=env off,
B=env on) noop-timed runs, printing min/mean per arm.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spark_tsne_spark.session import get_spark
from spark_tsne_spark.shipping import ship_package


def main():
    entry = sys.argv[1]
    env_var = sys.argv[2]
    pairs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        "ab_ckpt", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    ship_package(spark)
    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).count()

    import bench as B

    fn = B.bench_queries()[entry]
    fn = fn.fn if hasattr(fn, "fn") else fn

    def once():
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    os.environ[env_var] = "0"
    once()  # warm A
    os.environ[env_var] = "1"
    once()  # warm B
    a, b = [], []
    for _ in range(pairs):
        os.environ[env_var] = "0"
        a.append(once())
        os.environ[env_var] = "1"
        b.append(once())
    os.environ.pop(env_var, None)
    print(f"{entry} A(off)={a} min={min(a)} mean={sum(a)/len(a):.3f}")
    print(f"{entry} B(on)={b}  min={min(b)} mean={sum(b)/len(b):.3f}")


if __name__ == "__main__":
    main()
