"""Derive sfN bench data from the driver's sf0.1 parquet by replica expansion.

The driver ships sf{0.001,0.01,0.1}; the scale story (VERDICT r3 ask #1)
needs a bench run at sf1+. This derives sfN = N/0.1 replicas of sf0.1,
scaling each table along the dimension that actually grows in production:

  events      same 30-day window, same 50-series space, Nx sample density.
              Replica i shifts ts by a per-replica prime ms offset and
              user_id into a fresh id range; a final dedup on
              (event_type, user_id%10, epoch-ms) enforces the engine's
              one-row-per-(series, ts) contract (collisions across
              replicas are ~1e-5 of rows at sf1).
  documents   Nx corpus. Replica i>0 suffixes every word with ':i' —
              replica vocabularies are disjoint, so the word-shingle
              structure of each replica is ISOMORPHIC to the original
              (exact/near-dup groups replicate per replica; dup density
              stays constant as the corpus grows) while cross-replica
              shingle overlap is exactly zero. A seeded permutation was
              tried first and rejected: it keeps each doc's word BAG, and
              on this low-entropy vocabulary that still produces ~37k
              spurious cross-replica LSH candidates at sf1.
  embeddings  Nx corpus via per-replica cyclic component rotation —
              norm-preserving, cluster structure kept per replica,
              decorrelated across replicas.
  tpch        orders/lineitem/customer/part/supplier replicated with
              consistent key shifts (joins stay FK-valid); nation/region
              are dims, copied as-is.

Writes ts-range-partitioned, ts-sorted events (row-group stats feed the
admission pruner) and size-appropriate file counts elsewhere.

Usage: python scripts/make_scale_data.py [factor] [out_dir]
       default: factor=10 (sf1), out_dir=/root/repo/.scaledata/sf1
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

SRC = "/root/testdata/sf0.1"

# key strides: one above the max key in sf0.1 so replica id ranges never
# overlap (orders/lineitem orderkey max 149_999, partkey 19_999, suppkey
# 999, custkey 14_999, user_id 1_500-ish, doc_id / vec_id small)
OK, PK, SK, CK = 1_000_000, 100_000, 10_000, 100_000
UID, DOC, VEC = 1_000_000, 1_000_000, 1_000_000


def _union(parts: list[DataFrame]) -> DataFrame:
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def scale_events(spark, factor: int) -> DataFrame:
    ev = spark.read.parquet(f"{SRC}/events.parquet")
    parts = []
    for i in range(factor):
        parts.append(
            ev.select(
                (F.col("event_id") + F.lit(i * 10_000_000)).alias("event_id"),
                # per-replica prime ms shift keeps replicas from landing on
                # identical wall-clock ms; stays inside the query window
                F.expr(f"ts + INTERVAL {i * 7} MILLISECONDS").alias("ts"),
                # fresh user id range, same %10 bucketing -> same 50 series
                (F.col("user_id") + F.lit(i * UID)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    out = _union(parts)
    # enforce the engine contract: one sample per (series, epoch-ms)
    w_ms = F.unix_millis(F.col("ts").cast("timestamp"))
    out = (
        out.withColumn("_ms", w_ms)
        .withColumn("_bucket", F.col("user_id") % 10)
        .dropDuplicates(["event_type", "_bucket", "_ms"])
        .drop("_ms", "_bucket")
    )
    return out


def scale_documents(spark, factor: int) -> DataFrame:
    doc = spark.read.parquet(f"{SRC}/documents.parquet")
    parts = [doc]
    for i in range(1, factor):
        # per-replica word suffix: disjoint vocabularies across replicas,
        # isomorphic shingle structure within each replica
        suffixed = F.expr(
            f"array_join(transform(split(text, ' '), w -> concat(w, ':{i}')), ' ')"
        )
        p = (
            doc.withColumn("text", suffixed)
            .select(
                (F.col("doc_id") + F.lit(i * DOC)).alias("doc_id"),
                "text",
                "lang",
                "source",
                F.length("text").cast("long").alias("n_chars"),
            )
        )
        parts.append(p)
    return _union(parts)


def scale_embeddings(spark, factor: int) -> DataFrame:
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    dim = 64
    parts = [emb]
    for i in range(1, factor):
        k = (i * 7) % dim or 1
        rotated = F.concat(
            F.slice("embedding", k + 1, dim - k), F.slice("embedding", 1, k)
        )
        parts.append(
            emb.select(
                (F.col("vec_id") + F.lit(i * VEC)).alias("vec_id"),
                rotated.alias("embedding"),
                "label",
            )
        )
    return _union(parts)


def scale_tpch(spark, factor: int) -> dict[str, DataFrame]:
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    od = spark.read.parquet(f"{SRC}/orders.parquet")
    cu = spark.read.parquet(f"{SRC}/customer.parquet")
    pa = spark.read.parquet(f"{SRC}/part.parquet")
    su = spark.read.parquet(f"{SRC}/supplier.parquet")
    li_p, od_p, cu_p, pa_p, su_p = [], [], [], [], []
    for i in range(factor):
        li_p.append(
            li.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(i * OK))
            .withColumn("l_partkey", F.col("l_partkey") + F.lit(i * PK))
            .withColumn("l_suppkey", F.col("l_suppkey") + F.lit(i * SK))
        )
        od_p.append(
            od.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * OK))
            .withColumn("o_custkey", F.col("o_custkey") + F.lit(i * CK))
        )
        cu_p.append(cu.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * CK)))
        pa_p.append(pa.withColumn("p_partkey", F.col("p_partkey") + F.lit(i * PK)))
        su_p.append(su.withColumn("s_suppkey", F.col("s_suppkey") + F.lit(i * SK)))
    return {
        "lineitem": _union(li_p),
        "orders": _union(od_p),
        "customer": _union(cu_p),
        "part": _union(pa_p),
        "supplier": _union(su_p),
    }


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = (
        sys.argv[2]
        if len(sys.argv) > 2
        else f"/root/repo/.scaledata/sf{factor / 10:g}"
    )
    from metric_store_release_spark.session import get_spark

    spark = get_spark(app_name="make-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out_dir, exist_ok=True)

    # events: range-partition + sort by ts so parquet row-group ts stats
    # are tight (the admission pruner and scan pruning rely on them)
    ev = scale_events(spark, factor)
    n_ev_files = max(8, factor)
    (
        ev.repartitionByRange(n_ev_files, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(f"{out_dir}/events.parquet")
    )
    print("events done", file=sys.stderr)

    scale_documents(spark, factor).repartition(max(4, factor // 2)).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/documents.parquet")
    print("documents done", file=sys.stderr)

    scale_embeddings(spark, factor).repartition(4).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )
    print("embeddings done", file=sys.stderr)

    tpch = scale_tpch(spark, factor)
    for name, df in tpch.items():
        n_files = max(4, factor) if name in ("lineitem", "orders") else 2
        sort_col = {"lineitem": "l_shipdate", "orders": "o_orderdate"}.get(name)
        w = df.repartition(n_files)
        if sort_col:
            w = w.sortWithinPartitions(sort_col)
        w.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"{name} done", file=sys.stderr)

    for name in ("nation", "region"):
        spark.read.parquet(f"{SRC}/{name}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{name}.parquet")
    print(f"wrote {out_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
