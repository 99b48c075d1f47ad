"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Design for 100 TB multimodal corpora:

* media lives in **BinaryType** columns (or object-store URIs); metadata
  (format, dims, duration) in sibling typed columns.
* decode / feature-extract / resize / frame-sample run as **Arrow-batched
  ``mapInPandas``** — one Python worker per partition, whole column batches
  across the boundary, bounded memory via ``maxRecordsPerBatch``.
* this container has no image/audio libraries, so the actual decode is a
  clearly-marked stub (``decode_image``) plus a deterministic fake
  (``fake_decode_features``) that keeps the Spark-side plumbing — schema,
  batch shape, partitioning — real and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("magic_hex", StringType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("checksum", LongType()),
    ]
)

_MAGIC = {
    "89504e47": "image/png",
    "ffd8ffe0": "image/jpeg",
    "52494646": "audio/wav",
    "00000018": "video/mp4",
}


def as_media_table(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "text"
) -> DataFrame:
    """Wrap any column as an opaque binary payload with sniffed metadata.

    In production the payload comes from ``spark.read.format("binaryFile")``
    or a parquet BinaryType column; here the documents table stands in.
    """
    payload = F.encode(F.col(payload_col), "UTF-8")
    magic = F.lower(F.hex(F.substring(F.col(payload_col), 1, 4)))
    media_type = F.lit("application/octet-stream")
    for sig, mtype in _MAGIC.items():
        media_type = F.when(magic == sig, F.lit(mtype)).otherwise(media_type)
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        media_type.alias("media_type"),
        F.octet_length(F.col(payload_col)).cast("long").alias("n_bytes"),
        magic.alias("magic_hex"),
    )


def read_media_dir(
    spark, path: str, glob: str = "*", min_partitions: int | None = None
) -> DataFrame:
    """Ingest raw media files via Spark's ``binaryFile`` source into the
    MEDIA_SCHEMA shape (the production entry point ``as_media_table``
    stands in for when media already lives in a table column).

    Scale: ``binaryFile`` splits the listing across the cluster but each
    file is one row — repartition after load when files are few and
    large so decode parallelism isn't bound by file count.
    """
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    if min_partitions:
        df = df.repartition(min_partitions)
    magic = F.lower(F.hex(F.substring(F.col("content"), 1, 4)))
    media_type = F.lit("application/octet-stream")
    for sig, mtype in _MAGIC.items():
        media_type = F.when(magic == sig, F.lit(mtype)).otherwise(media_type)
    return df.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.col("content").alias("payload"),
        media_type.alias("media_type"),
        F.length(F.col("content")).cast("long").alias("n_bytes"),
        magic.alias("magic_hex"),
    )


def decode_image(payload: bytes) -> object:
    """Real image decode — requires PIL/opencv, absent in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv (not installed); "
        "use fake_decode_features for plumbing tests"
    )


def fake_decode_features(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for decode: (width, height, checksum)."""
    n = len(payload)
    checksum = 0
    for b in payload:
        checksum = (checksum * 131 + b) % 1_000_000_007
    return (n % 64) + 1, (n % 48) + 1, checksum


def extract_features(media: DataFrame, batch_log=None) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    The ``mapInPandas`` shape here is exactly what a real decoder uses —
    swap ``fake_decode_features`` for a PIL/ffmpeg call and the plan,
    partitioning and schema stay identical.
    """
    import pandas as pd  # noqa: PLC0415 — executor-side import

    def _run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if batch_log is not None:
                batch_log(len(pdf))
            feats = [fake_decode_features(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "checksum": [f[2] for f in feats],
                }
            )

    return media.mapInPandas(_run, schema=FEATURE_SCHEMA)
