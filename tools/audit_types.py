"""Audit Spark vs DuckDB result dtypes for every oracle-checked query."""
import sys
sys.path.insert(0, "/root/repo")
import duckdb
import __spark_entry__ as m
from projectdatalake_spark.session import get_spark

TABLES = ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]
sf = "/root/testdata/sf0.001"
con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
spark = get_spark("typeaudit")
qs, os_ = m.queries(), m.oracle_sql()
CANON = {
  "tinyint":"i32","smallint":"i32","int":"i32","integer":"i32","INTEGER":"i32","TINYINT":"i32","SMALLINT":"i32",
  "bigint":"i64","BIGINT":"i64","HUGEINT":"i64+","UBIGINT":"i64",
  "double":"f64","DOUBLE":"f64","float":"f32","FLOAT":"f32",
  "string":"str","VARCHAR":"str","boolean":"bool","BOOLEAN":"bool",
  "timestamp_ntz":"ts","timestamp":"ts","TIMESTAMP":"ts","TIMESTAMP_NS":"ts_ns",
  "date":"date","DATE":"date","binary":"bin","BLOB":"bin",
}
def canon(t):
    if t.startswith("decimal") or t.startswith("DECIMAL"): return "dec"
    if t.startswith("array") or t.endswith("[]"): return "list"
    return CANON.get(t, t)
for name, fn in qs.items():
    if name not in os_: continue
    sdt = {c: canon(t) for c, t in fn(spark, sf).dtypes}
    res = con.execute(os_[name])
    ddt = {d[0]: canon(str(rt)) for d, rt in zip(res.description, [c[1] for c in res.description])}
    # duckdb description types are type objects; use a fresh approach:
    rel = con.sql(os_[name])
    ddt = {c: canon(str(t)) for c, t in zip(rel.columns, rel.types)}
    diffs = {c: (sdt.get(c), ddt.get(c)) for c in sdt if sdt.get(c) != ddt.get(c)}
    if diffs:
        print(name, diffs)
spark.stop()
print("AUDIT DONE")
