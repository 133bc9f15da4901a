"""Drive the driver contract exactly as the verify driver would:
import __spark_entry__, run entry(spark), then run every queries()
entry against its oracle_sql() in DuckDB at sf0.01."""
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import __spark_entry__ as E
from pyspark.sql import SparkSession

SF = "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master("local[8]")
    .appName("drive-verify")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

t0 = time.time()
df = E.entry(spark)
rows = df.collect()
print(f"ENTRY: rows={len(rows)} schema={df.schema.simpleString()} "
      f"sample={rows[0] if rows else None} t={time.time()-t0:.1f}s", flush=True)

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

qs = E.queries()
oracles = E.oracle_sql()
print(f"CATALOG: {len(qs)} queries, {len(oracles)} with oracle", flush=True)


def norm(pdf):
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


def eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    try:
        import pandas as _pd

        if _pd.isna(a) and _pd.isna(b):  # None, NaT
            return True
    except (TypeError, ValueError):
        pass
    return a == b


fails = []
for name, fn in sorted(qs.items()):
    t0 = time.time()
    try:
        got = norm(fn(spark, SF).toPandas())
    except Exception as ex:
        fails.append(name)
        print(f"  {name}: SPARK ERROR {type(ex).__name__}: {ex}", flush=True)
        continue
    el = time.time() - t0
    if name not in oracles:
        print(f"  {name}: rows-only rows={len(got)} cols={list(got.columns)} t={el:.1f}s", flush=True)
        continue
    try:
        want = norm(con.execute(oracles[name]).df())
    except Exception as ex:
        fails.append(name)
        print(f"  {name}: DUCKDB ERROR {type(ex).__name__}: {ex}", flush=True)
        continue
    ok = True
    if list(got.columns) != list(want.columns):
        ok = False
        print(f"  {name}: COLS spark={list(got.columns)} duck={list(want.columns)}", flush=True)
    elif len(got) != len(want):
        ok = False
        print(f"  {name}: ROWS spark={len(got)} duck={len(want)}", flush=True)
    else:
        for col in got.columns:
            bad = [
                (i, x, y)
                for i, (x, y) in enumerate(zip(got[col].tolist(), want[col].tolist()))
                if not eq(x, y)
            ]
            if bad:
                ok = False
                print(f"  {name}.{col}: MISMATCH {bad[:3]}", flush=True)
                break
    if ok:
        print(f"  {name}: MATCH rows={len(got)} t={el:.1f}s", flush=True)
    else:
        fails.append(name)

print(f"RESULT: {len(qs) - len(fails)}/{len(qs)} ok; fails={fails}", flush=True)
