"""Local replica of the driver's correctness gate: run each queries() entry
on Spark and its oracle_sql() on DuckDB at the given sf, compare."""
import sys, math
import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")
import importlib
entry_mod = importlib.import_module("__spark_entry__")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
only = sys.argv[2:] if len(sys.argv) > 2 else None

from metric_store_release_spark.session import get_spark
spark = get_spark(master="local[8]", shuffle_partitions=8)

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

qs = entry_mod.queries()
oracles = entry_mod.oracle_sql()
fails = []
for name, fn in qs.items():
    if only and name not in only:
        continue
    try:
        # lease: a 158-query session would otherwise accumulate one
        # pinned band/gram index per dedup builder call
        from metric_store_release_spark.pipeline.dedup import leased
        with leased(fn(spark, SF_DIR)) as df:
            sdf = df.toPandas()
    except Exception as e:
        print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
        fails.append(name); continue
    if name not in oracles:
        print(f"ROWS-ONLY {name}: {len(sdf)} rows")
        continue
    try:
        odf = con.execute(oracles[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {type(e).__name__}: {str(e)[:300]}")
        fails.append(name); continue
    def norm(df):
        df = df[sorted(df.columns)]
        df = df.round(6)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)
    s, o = norm(sdf), norm(odf)
    if sorted(s.columns) != sorted(o.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}")
        fails.append(name); continue
    if len(s) != len(o):
        print(f"FAIL {name}: rows {len(s)} vs {len(o)}")
        fails.append(name); continue
    mismatch = 0
    drift = []
    for c in s.columns:
        a, b = s[c], o[c]
        ak, bk = a.dtype.kind, b.dtype.kind
        # The driver's gate hashes values EXACTLY, so an integer column on the
        # Spark side vs float64 on the oracle side (DuckDB windowed SUM over
        # BIGINT -> HUGEINT -> pandas float64) is a driver failure even when
        # every value is numerically identical. Flag the dtype drift here so
        # the local gate predicts the driver's verdict.
        if (ak in "iu") != (bk in "iu") and {ak, bk} <= set("iuf"):
            drift.append(f"{c}: {a.dtype} vs {b.dtype}")
        if ak in "iu" and bk in "iu":
            bad = a.astype("int64") != b.astype("int64")
        elif ak in "fc" or bk in "fc":
            af = pd.to_numeric(a, errors="coerce").astype(float)
            bf = pd.to_numeric(b, errors="coerce").astype(float)
            bad = ~((af - bf).abs() <= 1e-5) & ~(af.isna() & bf.isna())
        else:
            bad = a.astype(str) != b.astype(str)
        mismatch += int(bad.sum())
    if drift:
        print(f"FAIL {name}: int-vs-float dtype drift ({'; '.join(drift)}) "
              f"— driver exact-hash would be red")
        fails.append(name)
    elif mismatch:
        print(f"FAIL {name}: {mismatch} cell mismatches over {len(s)} rows")
        fails.append(name)
    else:
        print(f"OK   {name}: {len(s)} rows")
print()
print("FAILURES:", fails if fails else "none")
