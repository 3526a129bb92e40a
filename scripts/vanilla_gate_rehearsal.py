"""Driver-environment rehearsal: run the first-50 window queries on a
VANILLA SparkSession (no engine confs — the driver may not set ours) and
compare row counts against the tuned-session gate's expectations. Catches
conf-dependence that check_oracle.py's get_spark() session would mask."""
import sys

sys.path.insert(0, "/root/repo")
import importlib

from pyspark.sql import SparkSession

entry_mod = importlib.import_module("__spark_entry__")

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

qs = entry_mod.queries()
window = list(qs)[:50]
fails = []
for name in window:
    try:
        n = qs[name](spark, SF_DIR).count()
        print(f"OK   {name}: {n} rows")
    except Exception as e:  # noqa: BLE001 - rehearsal must report, not die
        print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")
        fails.append(name)
print()
print("VANILLA FAILURES:", fails if fails else "none")
sys.exit(1 if fails else 0)
