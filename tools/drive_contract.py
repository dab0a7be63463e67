"""Simulate the driver: smoke entry(), then queries() vs oracle_sql() at sf0.01."""
import sys, hashlib
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import __spark_entry__ as E
import duckdb
from gfs_to_prometheus_spark.session import get_spark

spark = get_spark(app="drive", cpus=8)

# 1. smoke
df = E.entry(spark)
rows = df.count()
print(f"SMOKE entry(): rows={rows} schema={[f.name for f in df.schema.fields]}")
assert rows > 0

# 2. correctness gate rehearsal
con = duckdb.connect()
SF = "/root/testdata/sf0.01"
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def vhash(pdf):
    cols = sorted(pdf.columns)
    pdf = pdf[cols].sort_values(cols, ignore_index=True)
    return hashlib.md5(pdf.to_csv(index=False, float_format="%.17g").encode()).hexdigest()

qs, os_ = E.queries(), E.oracle_sql()
ok = bad = 0
for name, fn in qs.items():
    a = fn(spark, SF).toPandas()
    if name in os_:
        b = con.sql(os_[name]).df()
        ha, hb = vhash(a), vhash(b)
        status = "MATCH" if (ha == hb and len(a) == len(b)) else "MISMATCH"
        if status == "MATCH": ok += 1
        else: bad += 1
        print(f"{status:9s} {name:24s} rows={len(a)}/{len(b)}")
    else:
        print(f"{'ROWS-ONLY':9s} {name:24s} rows={len(a)}")
print(f"RESULT: {ok} match, {bad} mismatch, {len(qs)-ok-bad} rows-only")
