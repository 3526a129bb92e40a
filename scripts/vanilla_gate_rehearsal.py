"""Driver-environment rehearsal: run the first-50 window queries on a
VANILLA SparkSession (no engine confs — the driver may not set ours) and
compare each row count against the DuckDB oracle's row count for the same
query. Catches conf-dependence (ANSI mode, shuffle partitions, timezone)
that check_oracle.py's tuned get_spark() session would mask — both crashes
AND silently-different results. Queries without an oracle run
execution-only (reported as RAN)."""
import sys

sys.path.insert(0, "/root/repo")
import importlib

import duckdb
from pyspark.sql import SparkSession

entry_mod = importlib.import_module("__spark_entry__")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

qs = entry_mod.queries()
oracles = entry_mod.oracle_sql()
window = list(qs)[:50]
fails = []
for name in window:
    try:
        from metric_store_release_spark.pipeline.dedup import leased

        with leased(qs[name](spark, SF_DIR)) as df:
            n = df.count()
    except Exception as e:  # noqa: BLE001 - rehearsal must report, not die
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
        fails.append(name)
        continue
    if name not in oracles:
        print(f"RAN  {name}: {n} rows (no oracle — execution-only check)")
        continue
    try:
        expected = con.execute(
            f"SELECT COUNT(*) FROM ({oracles[name]})"
        ).fetchone()[0]
    except Exception as e:  # noqa: BLE001
        print(f"FAIL {name}: oracle error {type(e).__name__}: {str(e)[:200]}")
        fails.append(name)
        continue
    if n != expected:
        print(f"FAIL {name}: vanilla rows {n} != oracle rows {expected}")
        fails.append(name)
    else:
        print(f"OK   {name}: {n} rows (== oracle)")
print()
print("VANILLA FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
