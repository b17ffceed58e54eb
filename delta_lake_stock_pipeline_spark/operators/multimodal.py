"""Multimodal-column operators (north-star extension).

The fixtures carry no real image/audio/video payloads, so media bytes are
synthesized deterministically (UTF-8 encode of ``documents.text``) into an
opaque ``binary`` column with typed metadata -- exactly the storage model a
100 TB multimodal lake uses: payload as parquet BINARY, metadata as scalar
columns, decode deferred to Arrow-batched Python.

The Spark-side plumbing is real and tested: binary schema, ``mapInPandas``
batch decode (Arrow transfer), explode fan-out for frame sampling. The codec
step itself is a STUB: ``decode_image_real`` raises NotImplementedError
(PIL/ffmpeg are not in this container); ``_fake_decode_meta`` is the
deterministic stand-in whose arithmetic the DuckDB oracle mirrors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.fixtures import load_table

_FRAME_FPS = 2
_MAX_FRAMES = 16
_CHUNK_BYTES = 256


def decode_image_real(payload: bytes):  # pragma: no cover - documented stub
    """Real decoder entry point (PIL / libvips). Not available here."""
    raise NotImplementedError(
        "image codec libraries are not installed in this environment; "
        "wire PIL.Image.open(io.BytesIO(payload)) here when available"
    )


def _media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> opaque media table: (doc_id, payload binary, n_bytes)."""
    return load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.octet_length(F.encode("text", "utf-8")).cast("bigint").alias("n_bytes"),
    )


def binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over the opaque binary column: size + content hash.
    Pure JVM expressions; the payload never crosses into Python."""
    media = _media_table(spark, sf_dir)
    return media.select(
        "doc_id",
        "n_bytes",
        F.md5("payload").alias("payload_md5"),
    )


def _fake_decode_meta(buf: bytes) -> tuple[int, int]:
    """Deterministic fake decode: pretend the byte length encodes image
    dimensions. Stands in for a real header parse; same arithmetic as the
    SQL oracle."""
    width = len(buf) % 64 + 1
    height = (len(buf) // 64) % 64 + 1
    return width, height


def image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch 'decode' via ``mapInPandas``: Arrow-batched transfer of binary
    payloads into Python, per-batch vectorized feature extraction, typed
    struct back out. This is the real plumbing a production decode uses --
    only ``_fake_decode_meta`` is the stand-in codec."""
    media = _media_table(spark, sf_dir)

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = pdf["payload"].map(_fake_decode_meta)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                    "n_pixels": dims.map(lambda d: d[0] * d[1]),
                }
            )

    return media.mapInPandas(
        decode_batches, "doc_id bigint, width int, height int, n_pixels bigint"
    ).orderBy("doc_id")


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-frame sampling plumbing: synthesize duration from metadata,
    fan out one row per sampled frame via ``explode(sequence(...))``.
    At scale this is the map-side row multiplier feeding a frame-decode
    stage; no shuffle is introduced by the explode itself."""
    media = _media_table(spark, sf_dir)
    duration_s = (F.col("n_bytes") % 120 + 1).alias("duration_s")
    n_frames = F.least(F.col("duration_s") * _FRAME_FPS, F.lit(_MAX_FRAMES))
    frames = media.select("doc_id", duration_s).withColumn(
        "n_frames", n_frames.cast("int")
    )
    return (
        frames.select(
            "doc_id",
            "duration_s",
            "n_frames",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1)).alias("frame_idx"),
        )
        .withColumn(
            "frame_ms",
            F.floor(F.col("frame_idx") * (F.col("duration_s") * 1000.0 / F.col("n_frames"))).cast(
                "bigint"
            ),
        )
        .orderBy("doc_id", "frame_idx")
    )


def audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-chunking plumbing: fixed-size windows over the byte stream,
    one row per chunk with offset/length -- the shape a feature-extraction
    UDF consumes."""
    media = _media_table(spark, sf_dir)
    n_chunks = F.ceil(F.col("n_bytes") / _CHUNK_BYTES).cast("int")
    return (
        media.select("doc_id", "n_bytes")
        .withColumn("n_chunks", n_chunks)
        .select(
            "doc_id",
            "n_bytes",
            "n_chunks",
            F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"),
        )
        .withColumn("chunk_offset", (F.col("chunk_idx") * _CHUNK_BYTES).cast("bigint"))
        .withColumn(
            "chunk_len",
            F.least(F.lit(_CHUNK_BYTES).cast("bigint"), F.col("n_bytes") - F.col("chunk_offset")),
        )
        .orderBy("doc_id", "chunk_idx")
    )


QUERIES = {
    "m_binary_metadata": binary_metadata,
    "m_image_features": image_features,
    "m_frame_sample": frame_sample,
    "m_audio_chunks": audio_chunks,
}

ORACLES = {
    "m_binary_metadata": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS payload_md5
        FROM documents
    """,
    "m_image_features": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) % 64 + 1 AS INTEGER) AS width,
               CAST((octet_length(encode(text)) // 64) % 64 + 1 AS INTEGER) AS height,
               CAST((octet_length(encode(text)) % 64 + 1)
                    * ((octet_length(encode(text)) // 64) % 64 + 1) AS BIGINT)
                   AS n_pixels
        FROM documents
    """,
    "m_frame_sample": """
        WITH meta AS (
            SELECT doc_id,
                   octet_length(encode(text)) % 120 + 1 AS duration_s,
                   LEAST((octet_length(encode(text)) % 120 + 1) * 2, 16) AS n_frames
            FROM documents
        )
        SELECT doc_id,
               CAST(duration_s AS BIGINT) AS duration_s,
               CAST(n_frames AS INTEGER) AS n_frames,
               CAST(unnest(range(0, n_frames)) AS INTEGER) AS frame_idx,
               CAST(floor(unnest(range(0, n_frames))
                          * (duration_s * 1000.0 / n_frames)) AS BIGINT) AS frame_ms
        FROM meta
        ORDER BY doc_id, frame_idx
    """,
    "m_audio_chunks": """
        WITH meta AS (
            SELECT doc_id,
                   CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                   CAST(ceil(octet_length(encode(text)) / 256.0) AS INTEGER) AS n_chunks
            FROM documents
        )
        SELECT doc_id, n_bytes, n_chunks,
               CAST(unnest(range(0, n_chunks)) AS INTEGER) AS chunk_idx,
               CAST(unnest(range(0, n_chunks)) * 256 AS BIGINT) AS chunk_offset,
               LEAST(256, n_bytes - unnest(range(0, n_chunks)) * 256) AS chunk_len
        FROM meta
        ORDER BY doc_id, chunk_idx
    """,
}
