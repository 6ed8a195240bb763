"""Simulate the harness driver: vanilla SparkSession (NOT the repo's
builder — probes that the contract works on a driver-created session),
entry() smoke, then every queries() entry vs oracle_sql() via DuckDB at
sf0.01 with an order-insensitive value hash."""
import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

import __spark_entry__ as e

SF = os.environ.get("SF", "/root/testdata/sf0.01")

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.ui.enabled", "false")
    .appName("driver-sim")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# --- entry smoke
df = e.entry(spark)
n = df.count()
print(f"entry(): {n} rows, {len(df.schema.fields)} cols -> OK" if n >= 0 else "entry FAIL")

# --- correctness gate
con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events documents embeddings").split():
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def value_hash(pdf: pd.DataFrame) -> str:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("datetime64[ns]")
    rows = sorted(
        "|".join(str(v) for v in row) for row in pdf.itertuples(index=False, name=None)
    )
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()[:16]

qs, oracles = e.queries(), e.oracle_sql()
fails = 0
for name, fn in qs.items():
    t0 = time.time()
    sdf = fn(spark, SF).toPandas()
    if name not in oracles:
        print(f"  {name}: rows-only, {len(sdf)} rows [{time.time()-t0:.1f}s]")
        continue
    odf = con.sql(oracles[name]).df()
    sh, oh = value_hash(sdf), value_hash(odf)
    ok = sh == oh and len(sdf) == len(odf) and sorted(sdf.columns) == sorted(odf.columns)
    print(f"  {name}: rows {len(sdf)}/{len(odf)} hash {sh}/{oh} {'MATCH' if ok else '** MISMATCH **'} [{time.time()-t0:.1f}s]")
    fails += 0 if ok else 1

print("RESULT:", "ALL MATCH" if fails == 0 else f"{fails} MISMATCHES")
sys.exit(1 if fails else 0)
