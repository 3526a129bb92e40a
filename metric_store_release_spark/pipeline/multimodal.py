"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are `binary` columns with a `media_type` and a
metadata struct. The Spark-side plumbing — schema, Arrow-batched
mapInPandas, partition sizing — is real and tested; the actual codec calls
are stubbed behind `_decode_stub` (the container has no image/audio libs),
raising NotImplementedError for real media types and producing a
deterministic fake for `"fake/raw"` payloads so the pipeline is testable
end-to-end.

At 100 TB: mapInPandas streams Arrow batches, so peak memory is one batch of
payloads per task; repartition by size-bucket upstream keeps batches even.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", IntegerType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_luma", DoubleType(), True),
    ]
)


def _decode_stub(media_type: str, payload: bytes) -> tuple[int | None, int | None, float | None]:
    """Codec stub. Real deployments plug a decoder here (PIL/ffmpeg).

    "fake/raw" payloads are b"WxH:" + pixel bytes — decoded deterministically
    so tests exercise the full path.
    """
    if media_type == "fake/raw":
        header, _, pixels = payload.partition(b":")
        w_s, _, h_s = header.partition(b"x")
        w, h = int(w_s), int(h_s)
        mean = (sum(pixels) / len(pixels)) if pixels else 0.0
        return w, h, float(mean)
    raise NotImplementedError(
        f"no codec for {media_type!r} in this environment — plug a decoder "
        "into _decode_stub"
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else None),
            }
            dims = pdf.apply(
                lambda r: _decode_stub(r["media_type"], r["payload"]), axis=1
            )
            out["width"] = dims.map(lambda d: d[0])
            out["height"] = dims.map(lambda d: d[1])
            out["mean_luma"] = dims.map(lambda d: d[2])
            yield pd.DataFrame(out)

    return media.mapInPandas(extract, schema=FEATURES_SCHEMA)


def fake_media_from_documents(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from `documents` (test input):
    payload = '8x4:' + first 32 bytes of the text."""
    return documents.select(
        F.col("doc_id"),
        F.lit("fake/raw").alias("media_type"),
        F.concat(
            F.lit("8x4:"), F.substring(F.col("text"), 1, 32)
        ).cast("binary").alias("payload"),
    )


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emit (doc_id, frame_idx) rows for a
    stubbed frame count derived from payload size; the decode itself stays
    in extract_media_features."""
    n_frames = (F.length(F.col("payload")) / every_n).cast("int")
    return media.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias(
            "frame_idx"
        ),
    )
