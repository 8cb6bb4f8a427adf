"""Multimodal columns: opaque binary payloads + typed metadata.

Beyond-reference surface (BASELINE.json north star). Images/audio/video are
carried as ``binary`` columns with a metadata struct; decode / transform /
feature-extract run as Arrow-batched ``mapInPandas`` operators so the
Python stage streams batches instead of rows. Every codec path here is
REAL for the uncompressed formats: netpbm P6/P5 and 24-bit BMP images
(``decode_image``), PCM WAV audio (``decode_audio``), RIFF AVI-layout
video frame indexes (``parse_riff_frames``) — pure numpy/struct, no
media library — and round 7 made the TRANSFORMS real too:
``resize_image`` is decode→box-mean→re-encode and ``extract_features``
dispatches on magic bytes to the actual decoders. Compressed codecs
(JPEG/PNG/MP3/H.264) are where a deployment plugs Pillow/libvips/ffmpeg
into the same batch shapes. Byte-level statistics remain as the honest
fallback for OPAQUE payloads only.

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


def byte_features(pdf: pd.DataFrame) -> pd.DataFrame:
    """Byte-level statistics of an OPAQUE payload (length, first byte,
    bounded checksum) — the honest fallback for media whose codec is not
    wired in; images/audio go through the real decoders in
    ``extract_features``/``pixel_stats``/``audio_stats``."""
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


def resize_image(blobs: DataFrame, factor: int = 2) -> DataFrame:
    """REAL image downsample (round 7 — the byte-truncation stub is gone):
    decode via ``decode_image`` (netpbm P6/P5, 24-bit BMP), box-filter by
    ``factor`` with the exact pixel-area mean (integer sum of each
    factor×factor block, truncated division — deterministic, no float),
    and RE-ENCODE as netpbm (P6 for RGB, P5 for grayscale). Trailing rows/
    columns that do not fill a block are cropped (the standard box-filter
    contract). Arrow-batched narrow map: decode→transform→encode scales
    with executors, no shuffle."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:2] not in (b"P6", b"P5", b"BM"):
                    # same magic-byte dispatch as extract_features: a
                    # non-image payload in a mixed-media column passes
                    # through untouched instead of failing the whole
                    # mapInPandas batch on a decode error
                    rows.append((did, b, len(b), "application/octet-stream"))
                    continue
                h, w, ch, arr = decode_image(b)
                hh, ww = h - h % factor, w - w % factor
                oh, ow = hh // factor, ww // factor
                block = (
                    arr[:hh, :ww]
                    .astype("int64")
                    .reshape(oh, factor, ow, factor, ch)
                    .sum(axis=(1, 3))
                    // (factor * factor)
                ).astype(np.uint8)
                if ch == 3:
                    out = encode_ppm(ow, oh, block.tobytes())
                    mt = "image/x-portable-pixmap"
                else:
                    out = b"P5\n%d %d\n255\n" % (ow, oh) + block.tobytes()
                    mt = "image/x-portable-graymap"
                rows.append((did, out, len(out), mt))
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload", "byte_len", "media_type"]
            )

    return blobs.mapInPandas(run, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, n_frames int, n_sampled int, first_frame_byte int"


def sample_frames(
    blobs: DataFrame, frame_bytes: int = 16, every: int = 4
) -> DataFrame:
    """Frame sampling for RAW fixed-size frame streams (uncompressed
    video where every frame is ``frame_bytes``): chunk the byte stream,
    keep every ``every``-th. Container formats with a real frame index
    go through ``riff_frame_index`` instead. Arrow-batched narrow map,
    no shuffle."""

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


OPPONENT_SCHEMA = (
    "doc_id bigint, n_px bigint, rg2_sum bigint, rg2_sq_sum bigint, "
    "yb2_sum bigint, yb2_sq_sum bigint"
)


def image_opponent_stats(blobs: DataFrame) -> DataFrame:
    """Decode every payload with the REAL ``decode_image`` and emit
    exact integer sufficient statistics of the Hasler-Susstrunk
    opponent channels, DOUBLED to stay integral: rg2 = 2*(R - G),
    yb2 = R + G - 2*B per pixel (so the colorfulness composed from
    these is 2x the textbook value — a documented fixed scale). Sums
    and sums-of-squares are int64 — order-independent, oracle-exact.
    Grayscale payloads see R = G = B, so rg2 = 0 and yb2 = 0
    everywhere. Arrow-batched narrow map, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                _h, _w, ch, arr = decode_image(bytes(payload))
                px = arr.reshape(-1, ch).astype("int64")
                if ch == 3:
                    r, g, b = px[:, 0], px[:, 1], px[:, 2]
                else:
                    r = g = b = px[:, 0]
                rg2 = 2 * (r - g)
                yb2 = r + g - 2 * b
                rows.append(
                    (
                        did,
                        int(px.shape[0]),
                        int(rg2.sum()),
                        int((rg2 * rg2).sum()),
                        int(yb2.sum()),
                        int((yb2 * yb2).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_px", "rg2_sum", "rg2_sq_sum",
                    "yb2_sum", "yb2_sq_sum",
                ],
            )

    return blobs.mapInPandas(run, schema=OPPONENT_SCHEMA)


def opaque_features(blobs: DataFrame) -> DataFrame:
    """Arrow-batched byte-level statistics over opaque payloads (see
    ``byte_features``)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield byte_features(pdf)

    return blobs.mapInPandas(run, schema=FEATURE_SCHEMA)


MEDIA_FEATURE_SCHEMA = (
    "doc_id bigint, media_kind string, byte_len int, "
    "width int, height int, channels int, px_sum bigint, "
    "n_samples int, sample_rate int, amp_abs_sum bigint, checksum_mod int"
)


def extract_features(blobs: DataFrame) -> DataFrame:
    """REAL media feature extraction (round 7 — the byte-checksum codec
    stand-in is gone): dispatch on magic bytes — netpbm/BMP payloads
    decode through ``decode_image`` (exact int64 pixel sum + dims), RIFF
    WAV through ``decode_audio`` (exact amplitude stats), anything else
    falls back to the honest opaque byte statistics. One Arrow-batched
    narrow map; columns not applicable to a payload's kind are NULL
    (nullable Int32/Int64 pandas extension arrays survive the Arrow
    boundary)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n = len(b)
                if b[:2] in (b"P6", b"P5", b"BM"):
                    h, w, ch, arr = decode_image(b)
                    rows.append(
                        (did, "image", n, w, h, ch,
                         int(arr.astype("int64").sum()),
                         None, None, None, None)
                    )
                elif b[:4] == b"RIFF" and b[8:12] == b"WAVE":
                    _ch, rate, pcm = decode_audio(b)
                    a = pcm.astype("int64")
                    rows.append(
                        (did, "audio", n, None, None, None, None,
                         len(a), rate, int(abs(a).sum()), None)
                    )
                else:
                    rows.append(
                        (did, "opaque", n, None, None, None, None,
                         None, None, None, sum(b[:64]) % 997)
                    )
            out = pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "media_kind", "byte_len", "width", "height",
                    "channels", "px_sum", "n_samples", "sample_rate",
                    "amp_abs_sum", "checksum_mod",
                ],
            )
            for c in ("width", "height", "channels", "n_samples",
                      "sample_rate", "checksum_mod"):
                out[c] = out[c].astype("Int32")
            for c in ("px_sum", "amp_abs_sum"):
                out[c] = out[c].astype("Int64")
            yield out

    return blobs.mapInPandas(run, schema=MEDIA_FEATURE_SCHEMA)


def encode_rvid(frames: "list[bytes]", fps: int = 30) -> bytes:
    """Minimal RIFF video container (the AVI layout: 'RIFF..AVI ' with an
    'avih'-carrying header chunk and a 'movi' LIST whose '00dc' chunks
    are the frames) — the fixture counterpart of ``riff_frame_index``,
    like encode_ppm/encode_wav for their decoders. Only the pieces a
    frame-index parse needs are written; a deployment swaps real AVI/MP4
    demuxing into the same batch shape."""
    import struct

    avih = b"avih" + struct.pack("<I", 8) + struct.pack(
        "<II", 1_000_000 // max(fps, 1), len(frames)
    )
    movi_body = b"movi"
    for fr in frames:
        movi_body += b"00dc" + struct.pack("<I", len(fr)) + fr
        if len(fr) & 1:
            movi_body += b"\x00"  # chunks pad to even offsets
    movi = b"LIST" + struct.pack("<I", len(movi_body)) + movi_body
    body = b"AVI " + avih + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_riff_frames(payload: bytes) -> "list[tuple[int, int]]":
    """Walk a RIFF 'AVI ' container's chunk tree and return the frame
    index: ``[(offset, size), ...]`` of every '00dc'/'00db' video chunk
    inside the 'movi' LIST — offsets point at the frame BYTES. Pure
    struct chunk-walking (even-offset padding honored), the same shape as
    ``decode_audio``'s RIFF walk."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("unsupported video payload (RIFF AVI only)")
    frames: list[tuple[int, int]] = []
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"LIST" and payload[body : body + 4] == b"movi":
            mpos = body + 4
            end = body + sz
            while mpos + 8 <= end:
                fcc = payload[mpos : mpos + 4]
                (fsz,) = struct.unpack_from("<I", payload, mpos + 4)
                if fcc in (b"00dc", b"00db"):
                    frames.append((mpos + 8, fsz))
                mpos += 8 + fsz + (fsz & 1)
        pos = body + sz + (sz & 1)
    return frames


VIDEO_FRAME_SCHEMA = (
    "doc_id bigint, n_frames int, n_sampled int, "
    "sampled_bytes bigint, sampled_sum bigint"
)


def riff_frame_index(blobs: DataFrame, every: int = 4) -> DataFrame:
    """REAL container frame sampling (round 7 — replaces the fixed-size
    chunking assumption for container media): parse the RIFF frame index
    with ``parse_riff_frames``, keep every ``every``-th frame, and emit
    exact integer accounting (frame count, sampled count, sampled byte
    total, sampled byte SUM — int64, order-independent). Variable-size
    frames exercise the index for real. Arrow-batched narrow map."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                idx = parse_riff_frames(b)
                picked = idx[::every]
                total = sum(sz for _off, sz in picked)
                ssum = 0
                for off, sz in picked:
                    ssum += sum(b[off : off + sz])
                rows.append((did, len(idx), len(picked), total, ssum))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "n_sampled",
                    "sampled_bytes", "sampled_sum",
                ],
            )

    return blobs.mapInPandas(run, schema=VIDEO_FRAME_SCHEMA)


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


def decimate_audio(blobs: DataFrame, factor: int = 4) -> DataFrame:
    """REAL audio resample by integer decimation (round 7 — completes the
    transform half of the audio path next to ``resize_image`` on the
    image side): decode via ``decode_audio``, keep every ``factor``-th
    sample, RE-ENCODE as PCM WAV at ``rate // factor``. Integer
    decimation is exact and deterministic (no filter kernel, no float);
    a production anti-aliased resampler plugs into the same
    decode→transform→encode Arrow batch shape. Narrow map, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
                    # non-WAV payloads pass through untouched (the same
                    # mixed-media dispatch contract as resize_image)
                    rows.append((did, b, len(b)))
                    continue
                _ch, rate, pcm = decode_audio(b)
                out = encode_wav(pcm[::factor], rate // factor)
                rows.append((did, out, len(out)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "payload", "byte_len"]
            )

    return blobs.mapInPandas(
        run, schema="doc_id bigint, payload binary, byte_len int"
    )


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


CLIP_SCHEMA = (
    "doc_id bigint, n_samples int, n_clipped bigint, clip_ppm bigint, "
    "max_abs int, abs_sum bigint"
)


def audio_clipping(blobs: DataFrame, ceiling: int = 2047) -> DataFrame:
    """Per-document clipping audit over decoded WAV payloads: a sample
    is counted as clipped when it sits at the rail — ``s >= ceiling`` or
    ``s <= -ceiling - 1`` (the asymmetric int16-style range).  Emits the
    exact integer ``(n_samples, n_clipped, clip_ppm, max_abs,
    abs_sum)`` per doc, with ``clip_ppm = n_clipped * 1e6 // n_samples``
    (non-negative operands, so floor == truncate across engines).  The
    audio-quality gate a speech-curation pipeline thresholds on before
    spending GPU time on transcription; a rail-pinned recording is
    unrecoverable no matter the SNR.  Arrow-batched narrow map, no
    shuffle — same 100-TB shape as ``audio_stats``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                _ch, _rate, pcm = decode_audio(bytes(payload))
                a = pcm.astype("int64")
                n = len(a)
                clipped = int(
                    ((a >= ceiling) | (a <= -ceiling - 1)).sum()
                )
                rows.append(
                    (
                        did,
                        n,
                        clipped,
                        (clipped * 1_000_000) // n if n else 0,
                        int(abs(a).max()) if n else 0,
                        int(abs(a).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_samples", "n_clipped", "clip_ppm",
                    "max_abs", "abs_sum",
                ],
            )

    return blobs.mapInPandas(run, schema=CLIP_SCHEMA)


FRAME_PIXEL_SCHEMA = (
    "doc_id bigint, n_frames int, n_sampled int, n_decoded int, "
    "r_sum bigint, g_sum bigint, b_sum bigint"
)


def riff_frame_pixels(blobs: DataFrame, every: int = 2) -> DataFrame:
    """Decode a RIFF container's sampled frame PAYLOADS as embedded
    images (round 8 — the frame bytes stop being opaque): walk the frame
    index with ``parse_riff_frames``, keep every ``every``-th frame,
    route each frame's bytes through the real ``decode_image``
    (netpbm P6/P5, 24-bit BMP — the ``extract_features`` magic-byte
    dispatch), and emit exact int64 per-channel pixel sums across the
    decoded frames (grayscale frames report their channel in all three
    sums; frames whose magic is not an image are counted sampled but not
    decoded). One Arrow-batched narrow map — demux→decode→reduce runs
    frame-local with no shuffle, so a 100 TB video corpus scales with
    executors. Reference analogue: the blob/feature surface SURVEY.md §2
    maps to multimodal columns."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                idx = parse_riff_frames(b)
                picked = idx[::every]
                n_dec = 0
                r = g = bl = 0
                for off, sz in picked:
                    fr = b[off : off + sz]
                    if fr[:2] not in (b"P6", b"P5", b"BM"):
                        continue
                    _h, _w, ch, arr = decode_image(fr)
                    sums = arr.reshape(-1, ch).astype("int64").sum(axis=0)
                    if ch == 3:
                        r += int(sums[0])
                        g += int(sums[1])
                        bl += int(sums[2])
                    else:
                        r += int(sums[0])
                        g += int(sums[0])
                        bl += int(sums[0])
                    n_dec += 1
                rows.append(
                    (did, len(idx), len(picked), n_dec, r, g, bl)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "n_sampled", "n_decoded",
                    "r_sum", "g_sum", "b_sum",
                ],
            )

    return blobs.mapInPandas(run, schema=FRAME_PIXEL_SCHEMA)


KEYFRAME_SCHEMA = (
    "doc_id long, n_frames int, n_keyframes int, keyframe_idx string, "
    "mean_jump_q long"
)


def keyframe_select(blobs: DataFrame, threshold_q: int = 10_000) -> DataFrame:
    """Content-based keyframe selection over RIFF frame payloads — the
    scene-change sampling policy a video curation pipeline uses instead
    of blind striding (``riff_frame_index``'s every-k cousin): decode
    each frame (netpbm/BMP via ``decode_image``; non-image frames are
    skipped), track the per-frame mean pixel level as an EXACT scaled
    integer (pixel_sum * 1e6 DIV pixel_count — engine-stable, no
    floats), and keep frame 0 plus every frame whose level jumps by at
    least ``threshold_q`` (millionths of a pixel level) versus the last
    KEPT frame. Emits the kept index list (comma-joined, bounded by
    frame count) and the max observed jump, so thresholds can be
    calibrated from the output itself. One Arrow-batched narrow map,
    frame-local — no shuffle at any corpus size."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                idx = parse_riff_frames(b)
                kept: list[int] = []
                last_level = None
                max_jump = 0
                for i, (off, sz) in enumerate(idx):
                    fr = b[off : off + sz]
                    if fr[:2] not in (b"P6", b"P5", b"BM"):
                        continue
                    _h, _w, _ch, arr = decode_image(fr)
                    flat = arr.reshape(-1).astype("int64")
                    level = int(flat.sum()) * 1_000_000 // int(flat.size)
                    if last_level is None:
                        kept.append(i)
                        last_level = level
                        continue
                    jump = abs(level - last_level)
                    max_jump = max(max_jump, jump)
                    if jump >= threshold_q:
                        kept.append(i)
                        last_level = level
                rows.append(
                    (
                        did,
                        len(idx),
                        len(kept),
                        ",".join(str(i) for i in kept),
                        max_jump,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "n_keyframes", "keyframe_idx",
                    "mean_jump_q",
                ],
            )

    return blobs.mapInPandas(run, schema=KEYFRAME_SCHEMA)


VAD_FRAME_SCHEMA = "doc_id bigint, frame_idx int, energy bigint"


def audio_frame_energy(blobs: DataFrame, frame_len: int = 16) -> DataFrame:
    """Per-frame energy of decoded WAV payloads: decode with the REAL
    ``decode_audio`` (RIFF chunk walker), split the PCM stream into
    ``frame_len``-sample frames, emit the exact int64 sum of squares per
    frame.  Arrow-batched narrow map — the framing step every
    speech-pipeline front end (VAD, diarization, feature windows) runs
    before anything model-shaped.  Trailing partial frames are kept
    (energy over however many samples remain)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                _ch, _rate, pcm = decode_audio(bytes(payload))
                a = pcm.astype("int64")
                for f in range(0, (len(a) + frame_len - 1) // frame_len):
                    seg = a[f * frame_len: (f + 1) * frame_len]
                    rows.append((did, f, int((seg * seg).sum())))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "energy"]
            )

    return blobs.mapInPandas(run, schema=VAD_FRAME_SCHEMA)


def audio_zcr(blobs: DataFrame, frame_len: int = 64) -> DataFrame:
    """Zero-crossing count per non-overlapping PCM frame — the classic
    voiced/unvoiced and noisiness feature (noise and fricatives cross
    often, voiced speech and tones rarely): for each full
    ``frame_len``-sample frame, ``zcr = #{i : s[i-1]*s[i] < 0}`` over
    within-frame neighbors.  The STRICT sign product means zero
    samples never count and the quantity is an exact integer any SQL
    oracle can replay with a LAG product.  Trailing partial frames are
    dropped (a rate over a different denominator would not be
    comparable).  Emits one row per (doc_id, frame).  Arrow-batched
    narrow map; no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                _ch, _rate, pcm = decode_audio(bytes(payload))
                a = pcm.astype("int64")
                for f in range(len(a) // frame_len):
                    seg = a[f * frame_len: (f + 1) * frame_len]
                    rows.append(
                        (
                            int(did),
                            f,
                            int(((seg[:-1] * seg[1:]) < 0).sum()),
                        )
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "frame", "zcr"])

    return blobs.mapInPandas(
        run, schema="doc_id bigint, frame int, zcr bigint"
    )


def audio_vad_segments(
    frames: DataFrame, threshold: int = 0
) -> DataFrame:
    """Energy-threshold voice-activity segmentation over per-frame
    energies: frames with ``energy > threshold`` are active; consecutive
    active frames form a segment (gaps-and-islands: frame_idx minus the
    active-frame row_number is constant within an island — the
    session_window-equivalent for integer indexes).  Returns per doc the
    exact (n_frames, n_active, n_segments, max_segment_len,
    first_active_frame) — every column an exact integer, so the whole
    VAD decision is oracle-checkable.  Scale shape: one window over
    (doc, frame_idx) — partitioned by doc, never global — plus two
    bounded groupBys."""
    from pyspark.sql import Window

    totals = frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_frames")
    )
    active = frames.filter(F.col("energy") > threshold)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    runs = active.withColumn(
        "grp", F.col("frame_idx") - F.row_number().over(w)
    )
    per_seg = runs.groupBy("doc_id", "grp").agg(
        F.count(F.lit(1)).cast("int").alias("seg_len"),
        F.min("frame_idx").alias("seg_start"),
    )
    per_doc = per_seg.groupBy("doc_id").agg(
        F.sum("seg_len").cast("int").alias("n_active"),
        F.count(F.lit(1)).cast("int").alias("n_segments"),
        F.max("seg_len").cast("int").alias("max_segment_len"),
        F.min("seg_start").cast("int").alias("first_active_frame"),
    )
    return (
        totals.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_frames",
            F.coalesce("n_active", F.lit(0)).cast("int").alias("n_active"),
            F.coalesce("n_segments", F.lit(0)).cast("int").alias("n_segments"),
            F.coalesce("max_segment_len", F.lit(0))
            .cast("int")
            .alias("max_segment_len"),
            F.coalesce("first_active_frame", F.lit(-1))
            .cast("int")
            .alias("first_active_frame"),
        )
    )


AHASH_SCHEMA = (
    "doc_id bigint, b0 bigint, b1 bigint, b2 bigint, b3 bigint, "
    "popcount int"
)


def image_average_hash(blobs: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual average-hash of decoded images — the image-dedup
    fingerprint (aHash): decode with the REAL ``decode_image``
    (netpbm/BMP), sum channels to an integer grayscale, split the
    raster into a ``grid x grid`` cell matrix (image dims must divide
    by ``grid``), and set bit k iff cell_sum * grid^2 > total_sum —
    the exact-integer form of "cell mean above global mean", no float
    anywhere.  The 64 bits are emitted as four 16-bit band integers
    (b0..b3, little-endian within a band) — the same banding the
    SimHash pipeline uses, so near-duplicate candidate pairs come from
    band equi-joins, never an all-pairs scan.  Arrow-batched narrow
    map; no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                h, w, _c, px = decode_image(bytes(payload))
                # px is always (h, w, ch) — grayscale arrives as ch=1
                gray = px.astype("int64").sum(axis=2)
                ch, cw = h // grid, w // grid
                cells = (
                    gray.reshape(grid, ch, grid, cw).sum(axis=(1, 3))
                )
                total = int(gray.sum())
                bits = (cells * (grid * grid) > total).astype("int64")
                flat = bits.reshape(-1)
                bands = []
                for j in range(4):
                    v = 0
                    for t in range(16):
                        v |= int(flat[j * 16 + t]) << t
                    bands.append(v)
                rows.append(
                    (did, bands[0], bands[1], bands[2], bands[3],
                     int(flat.sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "b0", "b1", "b2", "b3", "popcount"],
            )

    return blobs.mapInPandas(run, schema=AHASH_SCHEMA)


def image_difference_hash(blobs: DataFrame, grid: int = 8) -> DataFrame:
    """Perceptual difference-hash (dHash) of decoded images — the
    gradient sibling of ``image_average_hash``: bit (r, c) is set iff
    cell(r, c+1) > cell(r, c) on the integer-grayscale ``grid x grid``
    cell matrix, so the fingerprint tracks horizontal luminance
    GRADIENTS (robust to global brightness shifts that flip aHash
    bits).  grid x (grid-1) = 56 bits, emitted as four 14-bit band
    integers for the same band-equi-join candidate generation.  All
    comparisons are exact integers on exact cell sums.  Arrow-batched
    narrow map; no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                h, w, _c, px = decode_image(bytes(payload))
                gray = px.astype("int64").sum(axis=2)
                ch, cw = h // grid, w // grid
                cells = gray.reshape(grid, ch, grid, cw).sum(axis=(1, 3))
                bits = []
                for r in range(grid):
                    for c in range(grid - 1):
                        bits.append(
                            1 if int(cells[r][c + 1]) > int(cells[r][c])
                            else 0
                        )
                bands = []
                for j in range(4):
                    v = 0
                    for t in range(14):
                        v |= bits[j * 14 + t] << t
                    bands.append(v)
                rows.append(
                    (did, bands[0], bands[1], bands[2], bands[3],
                     int(sum(bits)))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "b0", "b1", "b2", "b3", "popcount"],
            )

    return blobs.mapInPandas(run, schema=AHASH_SCHEMA)


def dct_int_coefs(
    n: int = 16, block: int = 8, scale: int = 16384
) -> "list[list[int]]":
    """Quantized DCT-II basis, the EXACT INTEGER CONTRACT behind
    ``image_dct_hash``: C[u][x] = round(cos((2x+1)·u·π / 2n) · scale).
    The trig runs ONCE, here, on the driver — both the Spark operator
    and any SQL oracle consume the SAME integer table (embedded as
    literals), so no cross-engine cos()/rounding boundary can ever
    diverge the hash (the ln 1-ulp lesson, applied preemptively).
    Returns ``block`` rows (the low frequencies pHash keeps) of ``n``
    coefficients."""
    import math

    return [
        [
            round(math.cos((2 * x + 1) * u * math.pi / (2 * n)) * scale)
            for x in range(n)
        ]
        for u in range(block)
    ]


def dct_coef_values_sql(
    n: int = 16, block: int = 8, scale: int = 16384
) -> str:
    """The ``dct_int_coefs`` table as a SQL VALUES list ``(u, x, c)`` —
    paste into an oracle CTE ``coef(u, x, c) AS (VALUES ...)`` so DuckDB
    replays the integer DCT from the identical constants."""
    C = dct_int_coefs(n, block, scale)
    return ", ".join(
        f"({u}, {x}, {C[u][x]})" for u in range(block) for x in range(n)
    )


def image_dct_hash(
    blobs: DataFrame, size: int = 16, block: int = 8
) -> DataFrame:
    """Perceptual DCT hash (pHash) — the frequency-domain tier above
    aHash/dHash: decode, integer-grayscale, average-pool to
    ``size x size`` (exact integer SUM pooling — a constant positive
    scale that cannot flip a sign), apply the quantized integer DCT-II
    basis on both axes (D = C @ g @ Cᵀ, all int64, |D| < 2^46), and
    set bit (u, v) iff the AC coefficient is strictly positive (DC is
    always 0).  Sign-of-frequency bits need no median/mean threshold,
    so the whole hash is exact integer arithmetic end-to-end — an SQL
    oracle replays it from the ``dct_coef_values_sql`` literals.
    64 bits as four 16-bit band integers (b0..b3) — the same banding as
    aHash/dHash, so candidate pairs come from band equi-joins, never an
    all-pairs scan.  Arrow-batched narrow map; no shuffle."""
    import numpy as np

    C = np.array(dct_int_coefs(size, block), dtype="int64")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                h, w, _c, px = decode_image(bytes(payload))
                gray = px.astype("int64").sum(axis=2)
                if (h, w) != (size, size):
                    if h % size or w % size:
                        raise ValueError(
                            f"image {h}x{w} does not pool to {size}x{size}"
                        )
                    gray = gray.reshape(
                        size, h // size, size, w // size
                    ).sum(axis=(1, 3))
                D = C @ gray @ C.T  # D[u][v]: u over rows(y), v over cols(x)
                bits = (D > 0).astype("int64")
                bits[0][0] = 0  # DC carries global brightness, not shape
                flat = bits.reshape(-1)
                bands = []
                for j in range(4):
                    v = 0
                    for t in range(16):
                        v |= int(flat[j * 16 + t]) << t
                    bands.append(v)
                rows.append(
                    (did, bands[0], bands[1], bands[2], bands[3],
                     int(flat.sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "b0", "b1", "b2", "b3", "popcount"],
            )

    return blobs.mapInPandas(run, schema=AHASH_SCHEMA)


CANON_HASH_SCHEMA = (
    "doc_id bigint, b0 bigint, b1 bigint, b2 bigint, b3 bigint, "
    "p0 bigint, p1 bigint, p2 bigint, p3 bigint, popcount int"
)


def image_dct_hash_canonical(
    blobs: DataFrame, size: int = 16, block: int = 8
) -> DataFrame:
    """Dihedral-CANONICAL pHash: ``image_dct_hash`` made invariant to
    the 8 rotations/reflections of the square (the D4 group), so a
    mirrored or rotated near-duplicate lands in the SAME dedup bucket.

    No extra DCTs are needed — the quantized integer basis satisfies
    ``C[u][n-1-x] = (-1)^u * C[u][x]`` EXACTLY (cosine half-turn
    antisymmetry survives symmetric rounding), so for D = C g Cᵀ:
    a horizontal flip maps D[u][v] -> (-1)^v D[u][v], a vertical flip
    -> (-1)^u D[u][v], and a transpose -> D[v][u].  The 8 dihedral
    images therefore correspond one-to-one to the 8 coefficient
    transforms {optional transpose} x {sign flips by u/v parity}; the
    canonical hash is the minimum of the 8 variant hashes under the
    fixed (b3, b2, b1, b0) key order.  Still exact integer arithmetic
    end-to-end — an SQL oracle replays every variant from the shared
    DCT literals.  Emits both the canonical bands (b0..b3, the dedup
    key) and the plain identity-variant bands (p0..p3, for tier
    comparison), plus the canonical popcount.  Arrow-batched narrow
    map; no shuffle."""
    import numpy as np

    C = np.array(dct_int_coefs(size, block), dtype="int64")
    U, V = np.indices((block, block))
    sign_mats = {
        (fu, fv): ((-1) ** (fu * U + fv * V)).astype("int64")
        for fu in (0, 1)
        for fv in (0, 1)
    }

    def pack(bits: "object") -> tuple[int, int, int, int]:
        flat = bits.reshape(-1)
        return tuple(
            sum(int(flat[j * 16 + t]) << t for t in range(16))
            for j in range(4)
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                h, w, _c, px = decode_image(bytes(payload))
                gray = px.astype("int64").sum(axis=2)
                if (h, w) != (size, size):
                    if h % size or w % size:
                        raise ValueError(
                            f"image {h}x{w} does not pool to "
                            f"{size}x{size}"
                        )
                    gray = gray.reshape(
                        size, h // size, size, w // size
                    ).sum(axis=(1, 3))
                D = C @ gray @ C.T
                plain = None
                best = None
                for sw in (0, 1):
                    M = D.T if sw else D
                    for (fu, fv), S in sign_mats.items():
                        bits = ((M * S) > 0).astype("int64")
                        bits[0][0] = 0
                        bands = pack(bits)
                        if sw == 0 and fu == 0 and fv == 0:
                            plain = bands
                        key = (
                            (bands[3] << 48) | (bands[2] << 32)
                            | (bands[1] << 16) | bands[0]
                        )
                        if best is None or key < best[0]:
                            best = (key, bands, int(bits.sum()))
                rows.append(
                    (did, *best[1], *plain, best[2])
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "b0", "b1", "b2", "b3",
                    "p0", "p1", "p2", "p3", "popcount",
                ],
            )

    return blobs.mapInPandas(run, schema=CANON_HASH_SCHEMA)


FRAME_HASH_SCHEMA = (
    "doc_id bigint, frame_idx int, b0 bigint, b1 bigint, b2 bigint, "
    "b3 bigint"
)


def video_frame_phash(
    blobs: DataFrame, size: int = 16, block: int = 8
) -> DataFrame:
    """Per-FRAME perceptual DCT hash of a RIFF video container: walk the
    real chunk index (``parse_riff_frames``), decode every frame through
    ``decode_image``, and emit the same exact-integer pHash bands as
    ``image_dct_hash`` keyed by (doc_id, frame_idx).  The demux ->
    decode -> hash pass behind shot-boundary (scene-cut) detection:
    consecutive-frame Hamming distance is a band XOR popcount, and
    because the DC coefficient is dropped a uniform brightness drift
    within a scene leaves the hash untouched while a content change
    flips many sign bits.  Arrow-batched narrow map, frame-local, no
    shuffle."""
    import numpy as np

    C = np.array(dct_int_coefs(size, block), dtype="int64")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for j, (off, sz) in enumerate(parse_riff_frames(b)):
                    fr = b[off : off + sz]
                    if fr[:2] not in (b"P6", b"P5", b"BM"):
                        continue
                    h, w, _c, px = decode_image(fr)
                    gray = px.astype("int64").sum(axis=2)
                    if (h, w) != (size, size):
                        if h % size or w % size:
                            raise ValueError(
                                f"frame {h}x{w} does not pool to "
                                f"{size}x{size}"
                            )
                        gray = gray.reshape(
                            size, h // size, size, w // size
                        ).sum(axis=(1, 3))
                    D = C @ gray @ C.T
                    bits = (D > 0).astype("int64")
                    bits[0][0] = 0
                    flat = bits.reshape(-1)
                    bands = [
                        sum(int(flat[q * 16 + t]) << t for t in range(16))
                        for q in range(4)
                    ]
                    rows.append((did, j, *bands))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_idx", "b0", "b1", "b2", "b3"],
            )

    return blobs.mapInPandas(run, schema=FRAME_HASH_SCHEMA)


def image_gray_histogram(blobs: DataFrame, buckets: int = 8) -> DataFrame:
    """Per-image luminance histogram — the cheap content signature for
    dedup prefilters and corpus quality audits: decode with the REAL
    ``decode_image`` (netpbm/BMP), sum channels to an integer grayscale
    in [0, 765] (single-channel rasters are scaled x3 so the range
    matches), bucket each pixel by ``gray * buckets DIV 768`` (exact
    integer), and emit the per-bucket counts as columns h0..h{n-1}.
    Identical images produce identical histograms regardless of
    container format; small local edits move only the edited pixels'
    buckets, so histogram L1 distance lower-bounds 2x the number of
    changed pixels.  Arrow-batched narrow map; no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                h, w, c, px = decode_image(bytes(payload))
                gray = px.astype("int64").sum(axis=2).ravel()
                if c == 1:
                    gray = gray * 3
                b = (gray * buckets) // 768
                counts = np.bincount(b, minlength=buckets)
                rows.append(
                    [int(did)] + [int(v) for v in counts[:buckets]]
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id"] + [f"h{k}" for k in range(buckets)],
            )

    schema = "doc_id bigint, " + ", ".join(
        f"h{k} bigint" for k in range(buckets)
    )
    return blobs.mapInPandas(run, schema=schema)


def image_gray_pixels(blobs: DataFrame) -> DataFrame:
    """Per-pixel integer luminance rows (doc_id, p, g): gray = channel
    sum in [0, 765] (single-channel rasters scaled x3), p the
    row-major pixel index — the exact pixel plane that downstream
    PAIRWISE metrics (SSIM, MSE/PSNR, changed-pixel counts) equi-join
    on.  Row volume is pixels x images, which is why real pipelines
    run pairwise metrics on thumbnails; the join/aggregate shape is
    unchanged at any resolution.  Arrow-batched narrow map; no
    shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dids: list = []
            ps: list = []
            gs: list = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                _h, _w, c, px = decode_image(bytes(payload))
                gray = px.astype("int64").sum(axis=2).ravel()
                if c == 1:
                    gray = gray * 3
                n = int(gray.shape[0])
                dids.extend([int(did)] * n)
                ps.extend(range(n))
                gs.extend(int(v) for v in gray)
            yield pd.DataFrame({"doc_id": dids, "p": ps, "g": gs})

    return blobs.mapInPandas(run, schema="doc_id bigint, p int, g bigint")


def image_gradient_stats(blobs: DataFrame, thresh: int = 100) -> DataFrame:
    """Per-image gradient statistics — the blur/flatness quality score
    for image curation: decode to the integer grayscale (channel sum,
    [0, 765]), take absolute horizontal and vertical adjacent-pixel
    differences, and emit exact integers: ``tv`` (total variation =
    sum of all |d|), ``n_edges`` (count of |d| >= thresh), and
    ``n_grads`` (number of difference terms, a pure function of the
    dimensions).  A near-uniform (blurry/empty) image scores tv ~ 0;
    a textured one scores high — threshold on tv DIV n_grads for a
    keep/drop verdict.  Arrow-batched narrow map; no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                h, w, c, px = decode_image(bytes(payload))
                gray = px.astype("int64").sum(axis=2)
                if c == 1:
                    gray = gray * 3
                dx = np.abs(gray[:, 1:] - gray[:, :-1])
                dy = np.abs(gray[1:, :] - gray[:-1, :])
                rows.append(
                    (
                        int(did),
                        int(dx.sum() + dy.sum()),
                        int((dx >= thresh).sum() + (dy >= thresh).sum()),
                        int(dx.size + dy.size),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "tv", "n_edges", "n_grads"]
            )

    return blobs.mapInPandas(
        run, schema="doc_id bigint, tv bigint, n_edges bigint, n_grads bigint"
    )


def dft_int_coefs(
    n: int = 64, bins: "tuple[int, ...]" = (4, 8, 16), scale: int = 16384
) -> "list[tuple[int, int, int, int]]":
    """Quantized DFT basis rows for the probed ``bins`` — the exact
    integer contract behind ``audio_tone_powers`` (the ``dct_int_coefs``
    discipline applied to audio): per (bin k, sample i),
    ``cq = round(cos(2*pi*k*i/n) * scale)`` and
    ``sq = round(sin(2*pi*k*i/n) * scale)``.  The trig runs ONCE, here,
    on the driver — the Spark operator and any SQL oracle consume the
    SAME integer table, so no cross-engine cos()/rounding boundary can
    diverge the detected tone."""
    import math

    return [
        (
            k,
            i,
            round(math.cos(2 * math.pi * k * i / n) * scale),
            round(math.sin(2 * math.pi * k * i / n) * scale),
        )
        for k in bins
        for i in range(n)
    ]


def dft_coef_values_sql(
    n: int = 64, bins: "tuple[int, ...]" = (4, 8, 16), scale: int = 16384
) -> str:
    """The ``dft_int_coefs`` table as a SQL VALUES list
    ``(k, i, cq, sq)`` for oracle CTEs."""
    return ", ".join(
        f"({k}, {i}, {cq}, {sq})"
        for (k, i, cq, sq) in dft_int_coefs(n, bins, scale)
    )


def audio_tone_powers(
    blobs: DataFrame,
    n: int = 64,
    bins: "tuple[int, ...]" = (4, 8, 16),
    scale: int = 16384,
) -> DataFrame:
    """Integer DFT power of the first ``n`` PCM samples at the probed
    ``bins`` — tone/DTMF-style detection with an exact arithmetic
    contract: re = sum(s_i * cq), im = sum(s_i * sq), power = re^2 +
    im^2, all int64 on the quantized ``dft_int_coefs`` basis (|re| <=
    n * 32768 * scale < 2^36, so power < 2^72 would overflow — callers
    keep amplitudes <= 2^11 as the fixture does, bounding power below
    2^63).  Emits one row per (doc_id, bin).  Arrow-batched narrow
    map; no shuffle."""
    import numpy as np

    table = dft_int_coefs(n, bins, scale)
    C = {
        k: np.array(
            [(cq, sq) for (kk, i, cq, sq) in table if kk == k],
            dtype="int64",
        )
        for k in bins
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                _ch, _rate, pcm = decode_audio(bytes(payload))
                s = pcm.astype("int64")[:n]
                for k in bins:
                    re = int((s * C[k][: len(s), 0]).sum())
                    im = int((s * C[k][: len(s), 1]).sum())
                    rows.append((int(did), k, re, im, re * re + im * im))
            yield pd.DataFrame(
                rows, columns=["doc_id", "bin", "re_q", "im_q", "power"]
            )

    return blobs.mapInPandas(
        run,
        schema="doc_id bigint, bin int, re_q bigint, im_q bigint,"
        " power bigint",
    )


def audio_tone_windows(
    blobs: DataFrame,
    n: int = 64,
    hop: int = 64,
    bins: "tuple[int, ...]" = (4, 8, 16),
    scale: int = 16384,
) -> DataFrame:
    """SLIDING tone detection (the Goertzel use case: evaluate the DFT
    at a handful of probe bins per window position, never a full FFT):
    for every window start ``w*hop`` that fits, the integer DFT power
    at the probed ``bins`` over the next ``n`` PCM samples — the same
    exact arithmetic contract as ``audio_tone_powers`` (re/im are int64
    dot products against the quantized ``dft_int_coefs`` basis, power =
    re^2 + im^2), extended with a window index so frequency HOPS become
    visible as tone changes across windows.  Classic Goertzel runs the
    recurrence s_t = x_t + 2cos(w)s_{t-1} - s_{t-2}; the quantity it
    computes per (window, bin) is exactly this windowed DFT sample, and
    the dot-product form keeps it in the exact-integer contract the
    oracles replay.  Emits one row per (doc_id, win, bin).
    Arrow-batched narrow map; no shuffle."""
    import numpy as np

    table = dft_int_coefs(n, bins, scale)
    C = {
        k: np.array(
            [(cq, sq) for (kk, i, cq, sq) in table if kk == k],
            dtype="int64",
        )
        for k in bins
    }

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                _ch, _rate, pcm = decode_audio(bytes(payload))
                s = pcm.astype("int64")
                win = 0
                while win * hop + n <= len(s):
                    seg = s[win * hop : win * hop + n]
                    for k in bins:
                        re = int((seg * C[k][:, 0]).sum())
                        im = int((seg * C[k][:, 1]).sum())
                        rows.append(
                            (int(did), win, k, re, im, re * re + im * im)
                        )
                    win += 1
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "win", "bin", "re_q", "im_q", "power"],
            )

    return blobs.mapInPandas(
        run,
        schema="doc_id bigint, win int, bin int, re_q bigint,"
        " im_q bigint, power bigint",
    )


def audio_autocorr(
    blobs: DataFrame, n: int = 64, lags: "tuple[int, ...]" = (2, 4, 8, 16)
) -> DataFrame:
    """Exact integer autocorrelation of the first ``n`` PCM samples at
    the probed ``lags``: R(tau) = sum_{i} s_i * s_{i+tau} over the
    n - tau overlapping pairs, all int64 (|R| <= n * 32768^2 < 2^37) —
    the time-domain pitch/periodicity probe complementing the
    frequency-domain ``audio_tone_powers``.  R is deliberately NOT
    normalized per-lag: a shorter lag with full correlation wins on
    term count, which is exactly the shortest-period tie-break a pitch
    detector wants.  Emits one row per (doc_id, lag).  Arrow-batched
    narrow map; no shuffle."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf["doc_id"], pdf["payload"]):
                _ch, _rate, pcm = decode_audio(bytes(payload))
                s = pcm.astype("int64")[:n]
                for tau in lags:
                    r = int((s[:-tau] * s[tau:]).sum()) if tau < len(s) else 0
                    rows.append((int(did), tau, r))
            yield pd.DataFrame(rows, columns=["doc_id", "lag", "r"])

    return blobs.mapInPandas(
        run, schema="doc_id bigint, lag int, r bigint"
    )
