"""Multimodal columns: opaque binary payloads + typed metadata.

Beyond-reference surface (BASELINE.json north star). Images/audio/video are
carried as ``binary`` columns with a metadata struct; decode / feature-
extract run as Arrow-batched ``mapInPandas`` operators so the Python stage
streams batches instead of rows. The actual media decoding is STUBBED (no
image/audio libraries in this container — ``decode_image`` raises
NotImplementedError by design); the Spark-side plumbing — schema, batch
iteration, UDF signatures, partitioning — is real and tested, and a
deterministic fake feature extractor stands in for the codec so the
pipeline shape can be verified end-to-end.

Scale notes: mapInPandas keeps data in Arrow record batches (no per-row
pickling); feature extraction is a narrow map — no shuffle — so it scales
with executors. Batch size is controlled by
spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_SCHEMA = (
    "doc_id bigint, payload binary, media_type string, byte_len int"
)

FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, byte_len int, "
    "first_byte int, checksum_mod int"
)


def to_blob_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Wrap a text corpus as a multimodal blob table: payload = utf-8 bytes
    (standing in for image/audio bytes), plus typed metadata columns."""
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(F.col(text_col)).cast("int").alias("byte_len"),
    )


def decode_image(payload: bytes) -> "object":
    """Decode an image payload → pixel array. STUB: the container has no
    imaging libraries; a real deployment plugs Pillow/libvips in here."""
    raise NotImplementedError(
        "image decoding is stubbed in this environment; plug in PIL/libvips"
    )


def _fake_features(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic stand-in for a codec: cheap byte-level features."""
    payloads = pdf["payload"]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "media_type": pdf["media_type"],
            "byte_len": payloads.map(len).astype("int32"),
            "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype(
                "int32"
            ),
            "checksum_mod": payloads.map(lambda b: sum(b[:64]) % 997).astype("int32"),
        }
    )


RESIZE_SCHEMA = "doc_id bigint, payload binary, byte_len int, media_type string"


def resize_payloads(blobs: DataFrame, target_bytes: int = 256) -> DataFrame:
    """'Resize' stub for image-shaped payloads: a real deployment decodes,
    resizes via PIL/libvips, and re-encodes inside this same mapInPandas
    shape; the deterministic fake truncates/zero-pads to the target size so
    the downstream contract (fixed-size payloads, updated metadata) is
    testable without codec libraries."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda b: bytes(b[:target_bytes]).ljust(target_bytes, b"\x00")
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": resized,
                    "byte_len": resized.map(len).astype("int32"),
                    "media_type": pdf["media_type"],
                }
            )

    return blobs.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, n_frames int, n_sampled int, first_frame_byte int"


def sample_frames(
    blobs: DataFrame, frame_bytes: int = 16, every: int = 4
) -> DataFrame:
    """Frame sampling for video-shaped payloads: chunk the byte stream into
    fixed-size frames, keep every ``every``-th. The per-frame decode is the
    stubbed step; frame accounting and the sampled-frame bytes are real.
    Arrow-batched like extract_features — a narrow map, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_frames = payloads.map(lambda b: len(b) // frame_bytes)
            n_sampled = n_frames.map(lambda n: 0 if n == 0 else (n + every - 1) // every)
            first_byte = payloads.map(
                lambda b: b[0] if len(b) >= frame_bytes else -1
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_frames": n_frames.astype("int32"),
                    "n_sampled": n_sampled.astype("int32"),
                    "first_frame_byte": first_byte.astype("int32"),
                }
            )

    return blobs.mapInPandas(run, schema=FRAME_SCHEMA)


def extract_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_features(pdf)

    return blobs.mapInPandas(run, schema=FEATURE_SCHEMA)
