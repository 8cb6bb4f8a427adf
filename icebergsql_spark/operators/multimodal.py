"""Multimodal columns: opaque binary payloads + typed metadata.

Beyond-reference surface (BASELINE.json north star). Images/audio/video are
carried as ``binary`` columns with a metadata struct; decode / feature-
extract run as Arrow-batched ``mapInPandas`` operators so the Python stage
streams batches instead of rows. ``decode_image`` REALLY decodes the
uncompressed formats (netpbm P6/P5 and 24-bit BMP — pure numpy, no
imaging library; round 6 removed the stub); compressed codecs (JPEG/PNG)
are where a deployment plugs Pillow/libvips into the same batch shape.
A deterministic byte-level feature extractor additionally covers opaque
payloads where no decode applies.

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


def decode_image(payload: bytes) -> tuple[int, int, int, "object"]:
    """Decode an image payload → ``(height, width, channels, uint8
    ndarray[h, w, ch])``. Pure-Python/numpy decoders for the uncompressed
    formats (netpbm P6/P5, 24-bit BI_RGB BMP) — real bytes end-to-end
    with no imaging library; a deployment extends this with Pillow/libvips
    for compressed codecs (JPEG/PNG/WebP)."""
    import numpy as np

    if payload[:2] in (b"P6", b"P5"):
        # netpbm header: magic, then 3 decimal tokens (width, height,
        # maxval) separated by whitespace/comments, then ONE whitespace
        # byte, then the raster
        toks: list[int] = []
        i = 2
        while len(toks) < 3:
            while i < len(payload) and payload[i : i + 1].isspace():
                i += 1
            if payload[i : i + 1] == b"#":
                while i < len(payload) and payload[i : i + 1] != b"\n":
                    i += 1
                continue
            j = i
            while j < len(payload) and not payload[j : j + 1].isspace():
                j += 1
            toks.append(int(payload[i:j]))
            i = j
        i += 1
        w, h, maxval = toks
        if maxval > 255:
            raise ValueError("16-bit netpbm rasters are not supported")
        ch = 3 if payload[:2] == b"P6" else 1
        n = w * h * ch
        if len(payload) - i < n:
            raise ValueError("truncated netpbm raster")
        data = np.frombuffer(payload, dtype=np.uint8, count=n, offset=i)
        return h, w, ch, data.reshape(h, w, ch)
    if payload[:2] == b"BM":
        import struct

        (off,) = struct.unpack_from("<I", payload, 10)
        _hsz, w, h = struct.unpack_from("<Iii", payload, 14)
        _planes, bpp = struct.unpack_from("<HH", payload, 26)
        (comp,) = struct.unpack_from("<I", payload, 30)
        if bpp != 24 or comp != 0:
            raise ValueError("only uncompressed 24-bit (BI_RGB) BMP")
        bottom_up = h > 0
        h = abs(h)
        row_sz = (w * 3 + 3) & ~3  # rows pad to 4-byte boundaries
        arr = np.zeros((h, w, 3), np.uint8)
        for r in range(h):
            row = np.frombuffer(
                payload, np.uint8, w * 3, off + r * row_sz
            ).reshape(w, 3)
            arr[h - 1 - r if bottom_up else r] = row[:, ::-1]  # BGR→RGB
        return h, w, 3, arr
    raise ValueError("unsupported image payload (netpbm P6/P5, BMP)")


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal binary-PPM (P6) encoder: the test/fixture counterpart of
    ``decode_image`` (``rgb`` is ``3*width*height`` row-major bytes)."""
    if len(rgb) != 3 * width * height:
        raise ValueError(f"need {3 * width * height} bytes, got {len(rgb)}")
    return b"P6\n%d %d\n255\n" % (width, height) + bytes(rgb)


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


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Minimal 24-bit BI_RGB BMP encoder (bottom-up rows, 4-byte row
    padding, RGB→BGR) — the second real-bytes fixture format."""
    import struct

    if len(rgb) != 3 * width * height:
        raise ValueError(f"need {3 * width * height} bytes, got {len(rgb)}")
    row_sz = (width * 3 + 3) & ~3
    img = bytearray()
    for r in range(height - 1, -1, -1):
        row = bytearray()
        for c in range(width):
            off = (r * width + c) * 3
            row += bytes((rgb[off + 2], rgb[off + 1], rgb[off]))
        row += b"\x00" * (row_sz - len(row))
        img += row
    data_off = 14 + 40
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(img), 0, 0, data_off)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(img),
        2835, 2835, 0, 0,
    )
    return bytes(hdr + dib + img)


PIXEL_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, "
    "r_sum bigint, g_sum bigint, b_sum bigint"
)


def pixel_stats(blobs: DataFrame) -> DataFrame:
    """Decode every payload with the REAL ``decode_image`` and emit exact
    integer per-channel sums (int64 — order-independent, oracle-exact).
    Arrow-batched narrow map: decode cost scales with executors, no
    shuffle; a grayscale payload reports its single channel in all three
    sums."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                h, w, ch, arr = decode_image(bytes(payload))
                sums = arr.reshape(-1, ch).astype("int64").sum(axis=0)
                r, g, b = (
                    (int(sums[0]), int(sums[1]), int(sums[2]))
                    if ch == 3
                    else (int(sums[0]),) * 3
                )
                rows.append((did, w, h, ch, r, g, b))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "channels",
                    "r_sum", "g_sum", "b_sum",
                ],
            )

    return blobs.mapInPandas(run, schema=PIXEL_SCHEMA)


def extract_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fake_features(pdf)

    return blobs.mapInPandas(run, schema=FEATURE_SCHEMA)


def encode_wav(samples: "object", sample_rate: int = 16000) -> bytes:
    """Minimal PCM WAV encoder (RIFF, mono, 16-bit little-endian) — the
    audio counterpart of encode_ppm/encode_bmp. ``samples`` is an
    iterable of int16 values."""
    import struct

    import numpy as np

    pcm = np.asarray(list(samples), dtype="<i2").tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate,
                      sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
    )
    return hdr + pcm


def decode_audio(payload: bytes) -> tuple[int, int, "object"]:
    """Decode a PCM WAV payload → ``(n_channels, sample_rate, int16
    ndarray)``. Pure numpy/struct, chunk-walking the RIFF structure (so
    extra chunks like LIST/INFO are skipped); compressed codecs (MP3,
    AAC, FLAC) are where a deployment plugs a real audio library into
    the same Arrow batch shape."""
    import struct

    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("unsupported audio payload (PCM WAV only)")
    pos, n_ch, rate, bits, data = 12, None, None, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            fmt, n_ch, rate = struct.unpack_from("<HHI", payload, body)
            (bits,) = struct.unpack_from("<H", payload, body + 14)
            if fmt != 1:
                raise ValueError("only uncompressed PCM WAV")
        elif cid == b"data":
            data = payload[body : body + sz]
        pos = body + sz + (sz & 1)  # chunks pad to even offsets
    if n_ch is None or data is None:
        raise ValueError("truncated WAV: missing fmt or data chunk")
    if bits != 16:
        raise ValueError("only 16-bit PCM")
    return n_ch, rate, np.frombuffer(data, dtype="<i2")


AUDIO_SCHEMA = (
    "doc_id bigint, n_samples int, sample_rate int, "
    "amp_sum bigint, abs_sum bigint, max_abs int"
)


def audio_stats(blobs: DataFrame) -> DataFrame:
    """Decode every payload with the REAL ``decode_audio`` and emit exact
    integer amplitude statistics (int64 sums — order-independent,
    oracle-exact). Arrow-batched narrow map, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                _ch, rate, pcm = decode_audio(bytes(payload))
                a = pcm.astype("int64")
                rows.append(
                    (
                        did,
                        len(a),
                        rate,
                        int(a.sum()),
                        int(abs(a).sum()),
                        int(abs(a).max()) if len(a) else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "sample_rate",
                    "amp_sum", "abs_sum", "max_abs",
                ],
            )

    return blobs.mapInPandas(run, schema=AUDIO_SCHEMA)
