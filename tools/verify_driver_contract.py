"""Verify skill surface 1: driver contract on a PLAIN SparkSession.

Mirrors the external driver: fresh process, plain local session (no
engine session factory), `entry()` + every `queries()` row counted and
checked against the DuckDB oracle's row count at sf0.01.
"""

import importlib.util

import duckdb
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
spec = importlib.util.spec_from_file_location(
    "__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
print(len(mod.entry(spark).collect()), "entry rows", flush=True)
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('/root/testdata/sf0.01/{t}.parquet')")
qs, osql = mod.queries(), mod.oracle_sql()
for name, fn in qs.items():
    n = fn(spark, "/root/testdata/sf0.01").count()
    m = len(con.execute(osql[name]).fetchall()) if name in osql else None
    assert m is None or n == m, f"{name}: {n} vs {m}"
    print(name, "ok", flush=True)
print("all", len(qs), "queries consistent")
