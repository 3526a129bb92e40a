"""Document-corpus ingestion sources and the training-shard export sink.

The parquet `documents` table is the engine's canonical corpus input, but
real pipelines start from JSONL dumps, CSV manifests, or
one-file-per-document trees, and end by exporting sharded training data.
These connectors wrap the built-in Spark sources with the three policies
that matter at 100 TB:

  - EXPLICIT schemas only. Schema inference is a full extra pass over the
    data before the real job starts; every reader here takes (or defaults)
    a schema and never infers.
  - Malformed input is data, not an exception. JSONL/CSV read in
    PERMISSIVE mode with a `_corrupt_record` column; callers either get
    the quarantine frame (audit it, count it, store it) or drop it
    explicitly. A single bad line in shard 40,000 of a crawl must not
    kill the job (FAILFAST) or silently vanish (DROPMALFORMED without
    accounting).
  - Deterministic layout out. Export shards are assigned by the same
    md5 rule as every sampler (pipeline.text.hash_bucket), so a re-run
    of the same corpus produces the same shard membership — resumable,
    diffable exports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: default corpus schema, matching the documents parquet table
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)

_CORRUPT = "_corrupt_record"


def _with_corrupt(schema: T.StructType) -> T.StructType:
    if _CORRUPT in schema.fieldNames():
        return schema
    return T.StructType(list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())])


def read_jsonl_documents(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    drop_corrupt: bool = False,
) -> DataFrame:
    """JSON-lines corpus reader (the interchange format of most public
    text dumps). PERMISSIVE: rows that fail to parse or type-check keep
    their raw line in `_corrupt_record` with nulls elsewhere. With
    ``drop_corrupt`` the quarantine column is filtered and dropped —
    count it first if you care how much you lost.

    Spark restriction worth knowing: a query whose referenced columns are
    ONLY `_corrupt_record` is rejected on raw JSON/CSV (the source can't
    produce the corrupt column alone) — select at least one data column
    alongside it when auditing the quarantine, or cache first."""
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    if drop_corrupt:
        df = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    return df


def read_csv_documents(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    header: bool = True,
    drop_corrupt: bool = False,
) -> DataFrame:
    """CSV manifest/corpus reader with the same quarantine contract as
    :func:`read_jsonl_documents`. multiLine stays OFF (the default): a
    multiline CSV cannot be split across tasks, which serializes the whole
    file onto one executor — store multi-line text as JSONL instead.

    Quarantine caveat specific to CSV: the parser re-parses ONLY the
    pruned columns, so a projection that omits the malformed column sees
    the row as clean (`_corrupt_record` null). Audit the quarantine with
    a full-row read (select *) before projecting."""
    df = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("header", str(header).lower())
        .csv(path)
    )
    if drop_corrupt:
        df = df.filter(F.col(_CORRUPT).isNull()).drop(_CORRUPT)
    return df


def read_text_dir_documents(spark: SparkSession, path: str) -> DataFrame:
    """One document per file: (path, text), doc identity = file path.

    Uses the `text` source with wholetext — each file is one row and one
    task unit; fine for document trees, wrong for a few giant files (no
    intra-file parallelism — convert those to JSONL)."""
    return spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("path"),
        F.col("value").alias("text"),
    )


def export_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
    max_records_per_file: int = 1_000_000,
    mode: str = "error",
) -> None:
    """Write the corpus as `shard=NN/` parquet partitions with
    DETERMINISTIC membership: shard = hash_bucket(id, salt) % n_shards —
    the same engine-portable md5 rule as every sampler, so re-running the
    same corpus reproduces the same shards (resumable, diffable exports,
    and any consumer can compute a row's shard without reading the data).

    One repartition ON THE SHARD KEY before the write: each shard's rows
    arrive at one task, so the layout is n_shards files (plus
    maxRecordsPerFile splits), not n_shards x n_input_partitions
    fragments. Rows sort by id within files for stable diffs and
    row-group stats."""
    from metric_store_release_spark.pipeline.text import hash_bucket

    shard = (hash_bucket(F.col(id_col), salt) % n_shards).cast("int")
    (
        df.withColumn("shard", shard)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", id_col)
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard")
        .parquet(path)
    )
