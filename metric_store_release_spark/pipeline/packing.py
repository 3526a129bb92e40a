"""Sequence packing for LLM training-data preparation.

Packing concatenates documents into fixed-size token sequences ("concat
then chunk", the standard pre-training data layout). The distributed form
here is deterministic and shard-parallel:

- Every document is assigned a shard by hash — the unit of parallelism.
  Packing is independent per shard, so a 100 TB corpus packs with one hash
  shuffle into `n_shards` streams plus a per-shard sort; no global order,
  no driver-side state.
- Within a shard, documents are ordered by their md5 hash (collision-free
  for distinct ids, reproducible on any engine) and laid head-to-tail into
  a virtual token stream; chunk `i` of the stream is tokens
  `[i*budget, (i+1)*budget)`. A document may span chunk boundaries — by
  design (its remainder fills the next sequence; no padding waste).

Output is the pack manifest: where each document's tokens land. The
actual token materialization is a downstream gather keyed on
`(shard, pack_id)` — the manifest is the part that needs a correct
distributed plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import hex_word, token_count


def sequence_pack(
    df: DataFrame,
    budget: int = 512,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic shard-parallel sequence-packing manifest.

    Returns one row per document: `shard`, `n_tokens`, `start_offset`
    (position of its first token in the shard's concatenated stream),
    `pack_id` (chunk holding that first token) and `n_packs` (how many
    chunks the document spans; 0 for empty documents).

    Plan shape: one hash shuffle on `shard` + a per-shard sort for the
    running-sum window — the minimal cost of any order-dependent layout.
    `n_shards` is the parallelism knob: at warehouse scale set it to a
    multiple of cluster cores so each shard's sort fits one task.
    """
    h = F.md5(F.concat(F.lit("pack:"), F.col(id_col).cast("string")))
    base = df.select(
        F.col(id_col),
        h.alias("__h"),
        (hex_word(h) % n_shards).cast("int").alias("shard"),
        token_count(F.col(text_col)).cast("long").alias("n_tokens"),
    )
    # explicit ROWS frame: the default RANGE frame treats tied sort keys as
    # one group, which would give duplicate ids identical start offsets and
    # break the head-to-tail invariant (the oracle pins ROWS too)
    w = (
        Window.partitionBy("shard")
        .orderBy("__h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("start_offset")
    first_pack = F.floor((cum - F.col("n_tokens")) / F.lit(budget)).cast("long")
    last_pack = F.floor((cum - 1) / F.lit(budget)).cast("long")
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        start,
        first_pack.alias("pack_id"),
        F.when(F.col("n_tokens") == 0, F.lit(0).cast("long"))
        .otherwise(last_pack - first_pack + 1)
        .alias("n_packs"),
    )
