"""Streaming benchmark decontamination: a stateless bloom filter pass.

The crawl-ingest composition of pipeline.dedup.bloom_flag_docs: documents
arrive as a stream and every micro-batch drops the ones whose 13-gram
windows hit the benchmark's bloom bitmap. Unlike the minhash dedup stream
([[streaming/dedup_stream.py]]), there is NO state anywhere — the bitmap
is a fixed artifact baked into the query (the benchmark set changes by
redeploying the stream with a rebuilt bitmap), the flag is a pure
projection, and the query runs in append mode with no watermark, no state
store, and no shuffle; a restart needs only the checkpoint's source
offsets. That is exactly why decontamination belongs on the ingest path
at 100 TB: it is the one dedup-family operator with zero marginal state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from metric_store_release_spark.pipeline.dedup import bloom_flag_docs


def streaming_bloom_decontaminate(
    stream: DataFrame,
    words: list[int],
    m_bits: int,
    k: int = 8,
    text_col: str = "text",
    window_n: int = 13,
) -> DataFrame:
    """Filter a streaming document frame to the docs that do NOT hit the
    benchmark bloom (``words`` from sketches.bloom_dense_words, built once
    over the benchmark's gram pairs — see pipeline.dedup
    .bloom_contamination for sizing). Returns the surviving stream,
    original columns intact."""
    flagged = bloom_flag_docs(
        stream, words, m_bits, k, text_col, window_n,
        flag_col="__contaminated",
    )
    return flagged.filter(~flagged["__contaminated"]).drop("__contaminated")
