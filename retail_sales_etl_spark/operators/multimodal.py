"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the payload as a binary
column next to a typed metadata struct; keep filtering/routing on the
metadata (JVM-side, prunable) and run decode/feature-extraction as
Arrow-batched ``mapInPandas`` over repartitioned payload batches.

The container has no codec libraries, so the decoders are STUBS with a
deterministic fake implementation (documented below); the Spark-side
plumbing — schema, batching, partitioning, UDF signatures — is real and
tested. Swap ``_decode_image_stub`` for a PIL/ffmpeg call in production.

``multimodal_bytes`` (oracle-checked) exercises the JVM-side path:
utf-8 payload encode, byte stats, checksum, synthesized metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..catalog import load_table

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime_type", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("feature_checksum", LongType()),
    ]
)


def to_media_table(docs: DataFrame) -> DataFrame:
    """Documents -> media table: binary payload + typed metadata."""
    payload = F.encode("text", "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("text/plain").alias("mime_type"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def _decode_image_stub(payload: bytes) -> dict:
    """STUB decoder. Real impl would be e.g. PIL.Image.open(BytesIO(...)).

    Deterministic fake: derives (width, height, n_frames, checksum) from
    the byte content so tests exercise real data flow through Arrow.
    """
    n = len(payload)
    checksum = 0
    for i, b in enumerate(payload[:256]):
        checksum = (checksum * 131 + b + i) % (1 << 31)
    return {
        "width": (n % 64) + 1,
        "height": (n % 48) + 1,
        "n_frames": 1,
        "feature_checksum": checksum,
    }


def extract_features(media: DataFrame, batch_partitions: int | None = None) -> DataFrame:
    """Arrow-batched decode/feature-extract over ``mapInPandas``.

    ``batch_partitions`` controls payload batch sizing: at scale,
    repartition so each Arrow batch fits executor memory (payloads are
    the dominant bytes — do NOT let one partition hold 10k 4K frames).
    """
    if batch_partitions:
        media = media.repartition(batch_partitions)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_decode_image_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "n_bytes", pdf["n_bytes"].values)
            out.insert(0, "mime_type", pdf["mime_type"].values)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_offset", LongType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, frame_size: int = 64, stride: int = 256) -> DataFrame:
    """Frame sampling over binary payloads: one input row -> N frame rows.

    The video/audio pattern: slice fixed-size windows out of the payload
    at a stride (a real decoder would seek keyframes; this deterministic
    slicer exercises the same 1->N Arrow plumbing and output schema).
    Frames explode data volume — at scale, repartition the OUTPUT, not
    the input, before any downstream shuffle.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_offset": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                buf = bytes(payload)
                for i, off in enumerate(range(0, max(len(buf) - frame_size, 1), stride)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(off)
                    out["frame_bytes"].append(buf[off : off + frame_size])
            yield pd.DataFrame(out)

    return media.mapInPandas(_sample, schema=FRAME_SCHEMA)


def q_multimodal_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JVM-side byte stats over the binary payload column (oracle-checked)."""
    media = to_media_table(load_table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        "mime_type",
        "n_bytes",
        F.md5("payload").alias("payload_md5"),
        ((F.col("n_bytes") % 64) + 1).alias("synth_width"),
        ((F.col("n_bytes") % 48) + 1).alias("synth_height"),
    )


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling rollup: run the 1->N ``mapInPandas`` frame slicer
    over every payload and aggregate per asset (frame count, frame
    bytes, last offset).

    The slicer is the deterministic stub (documented above), so the
    whole Arrow round-trip — binary in, exploded frames out, JVM agg
    back — is oracle-checkable from closed-form arithmetic on the
    payload length. In production only the decoder body changes.
    """
    media = to_media_table(load_table(spark, sf_dir, "documents"))
    frames = sample_frames(media)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_frames"),
        F.sum(F.length("frame_bytes")).cast("bigint").alias("total_frame_bytes"),
        F.max("frame_offset").alias("max_offset"),
    )


QUERIES = {
    "multimodal_bytes": q_multimodal_bytes,
    "multimodal_frames": q_multimodal_frames,
}

ORACLE = {
    "multimodal_bytes": """
        SELECT doc_id,
               'text/plain' AS mime_type,
               octet_length(encode(text)) AS n_bytes,
               md5(text) AS payload_md5,
               (octet_length(encode(text)) % 64) + 1 AS synth_width,
               (octet_length(encode(text)) % 48) + 1 AS synth_height
        FROM documents
    """,
    "multimodal_frames": """
        SELECT doc_id,
               n_frames,
               CAST(CASE WHEN n_bytes <= 64 THEN n_bytes
                         ELSE 64 * n_frames END AS BIGINT) AS total_frame_bytes,
               CAST(256 * (n_frames - 1) AS BIGINT) AS max_offset
        FROM (
            SELECT doc_id, n_bytes,
                   ((greatest(n_bytes - 64, 1) - 1) // 256) + 1 AS n_frames
            FROM (
                SELECT doc_id, octet_length(encode(text)) AS n_bytes
                FROM documents
            )
        )
    """,
}
