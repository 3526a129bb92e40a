"""Z-order (Morton) clustering: multi-column data skipping for big scans.

Bucketing (sources.bucketed) kills the shuffle for ONE key; it does
nothing for range scans on a second dimension. At 100 TB the other big
lever is SKIPPING: parquet keeps min/max statistics per row group and per
file, and the reader drops whole row groups whose stats exclude the
pushed-down predicate — but stats only help if the layout makes them
tight. A table sorted by `ts` alone has every file spanning ALL users:
a `user_id BETWEEN … AND ts BETWEEN …` scan reads every file. Interleaving
the bits of both columns (the Morton/Z curve — Morton 1966; the technique
behind ZORDER in lakehouse table formats) gives every file a narrow span
in BOTH dimensions, so a 2-D range predicate prunes multiplicatively.

All pieces are plain DataFrame ops:
  - `zorder_key` builds the interleaved key as a flat codegen-friendly
    OR/shift expression tree (no UDF, no HOF fold);
  - `write_zordered` range-partitions by the key and sorts within
    partitions before writing, so both FILE boundaries and ROW-GROUP
    boundaries follow the curve;
  - `file_spans` measures the result: per-file min/max spans of the
    clustered columns via `input_file_name()` — the direct, engine-level
    evidence that a range predicate can skip (asserted in
    tests/test_zorder.py, measured at scale in SCALING.md).

The write is one range-shuffle of the fact table — paid once, amortized
across every subsequent selective scan, exactly like the bucketed layout.
Column bounds (`lo`/`hi`) are passed in, not scanned: a warehouse keeps
them in table metadata/statistics; recomputing them per write would add a
full extra pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def normalize_to_rank(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column linearly onto the integer grid [0, 2^bits):
    the per-dimension rank that zorder_key interleaves. Values outside
    [lo, hi] clamp to the grid edges (stats drift must not corrupt the
    curve, only coarsen it at the boundary)."""
    cells = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    rank = F.floor(scaled * F.lit(float(cells)))
    return F.least(F.lit(cells).cast("long"), F.greatest(F.lit(0).cast("long"), rank))


def zorder_key(ranks: Sequence[Column], bits: int = 16) -> Column:
    """Morton interleave of per-dimension ranks (each in [0, 2^bits)):
    result bit d·b + j holds bit b of dimension j. Flat OR/shiftleft
    expression — stays inside whole-stage codegen; d·bits must fit a
    64-bit long."""
    d = len(ranks)
    if d * bits > 63:
        raise ValueError(f"{d} dims × {bits} bits exceeds a signed long")
    acc = F.lit(0).cast("long")
    for b in range(bits):
        for j, r in enumerate(ranks):
            bit = F.shiftright(r.cast("long"), b).bitwiseAND(F.lit(1).cast("long"))
            acc = acc.bitwiseOR(F.shiftleft(bit, d * b + j))
    return acc


def hilbert_key(xrank: Column, yrank: Column, bits: int = 16) -> Column:
    """2-D Hilbert-curve index of per-dimension ranks (each in
    [0, 2^bits)) — the classic iterative xy→d walk (Hilbert 1891; the
    bit-twiddling form popularized by Warren's Hacker's Delight and the
    Wikipedia reference implementation). Hilbert preserves locality
    strictly better than Morton: the curve never makes the long diagonal
    jumps Z-order takes between quadrant boundaries, so per-file spans
    (file_spans) are tighter for the same file count — measured against
    zorder_key in SCALING.md, same multiplicative-pruning read path.

    Expressed as an F.aggregate fold over the bit levels (struct
    accumulator (x, y, d)): the rotation step references x and y several
    times, so a flat nested-when expansion would grow exponentially with
    ``bits`` — the fold keeps the expression linear and evaluates
    ``bits`` steps per row. Layout writes are one-time setup; the read
    path never computes the key."""
    zero = F.lit(0).cast("long")
    one = F.lit(1).cast("long")

    def step(acc: Column, e: Column) -> Column:
        s = F.pow(F.lit(2.0), e.cast("double")).cast("long")
        x, y, d = acc["x"], acc["y"], acc["d"]
        rx = F.when(x.bitwiseAND(s) > 0, one).otherwise(zero)
        ry = F.when(y.bitwiseAND(s) > 0, one).otherwise(zero)
        d2 = d + s * s * (rx * 3).bitwiseXOR(ry)
        flip = (ry == 0) & (rx == 1)
        fx = F.when(flip, s - 1 - x).otherwise(x)
        fy = F.when(flip, s - 1 - y).otherwise(y)
        return F.struct(
            F.when(ry == 0, fy).otherwise(x).alias("x"),
            F.when(ry == 0, fx).otherwise(y).alias("y"),
            d2.alias("d"),
        )

    init = F.struct(
        xrank.cast("long").alias("x"),
        yrank.cast("long").alias("y"),
        zero.alias("d"),
    )
    return F.aggregate(
        F.sequence(F.lit(bits - 1), F.lit(0), F.lit(-1)), init, step,
        lambda a: a["d"],
    )


def write_zordered(
    df: DataFrame,
    path: str,
    zkey: Column,
    n_files: int,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered along ``zkey``: range-partition
    into ``n_files`` splits of the curve (file-level locality), sort
    within each (row-group-level locality). ``n_files`` is the write
    parallelism AND the pruning granularity — size it to the target
    cluster and file-size budget (e.g. 100 TB / 512 MB ≈ 200k files),
    not the test machine."""
    (
        df.withColumn("__z", zkey)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def read_zordered(spark: SparkSession, path: str) -> DataFrame:
    """Read a z-ordered layout. Nothing special at read time — the payoff
    arrives through ordinary predicate pushdown meeting tight per-file /
    per-row-group statistics."""
    return spark.read.parquet(path)


def file_spans(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per input-file min/max of ``cols``: (file, n_rows, <c>_min, <c>_max
    …). The clustering quality metric — for a well-z-ordered layout each
    file's span in EVERY clustered dimension is a small fraction of the
    global range, which is exactly the condition under which min/max
    pruning skips it."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"{c}_min"), F.max(c).alias(f"{c}_max")]
    return (
        df.withColumn("__file", F.input_file_name())
        .groupBy("__file")
        .agg(*aggs)
    )
