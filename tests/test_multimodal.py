"""Real image decode (round 6): pure-numpy netpbm/BMP parsers replacing
the round-1..5 codec stub. Round-trips lock header parsing, row order,
channel order, and BMP row padding; pixel_stats locks the Arrow-batched
decode operator end-to-end."""

from __future__ import annotations

import numpy as np
import pytest

from icebergsql_spark.operators.multimodal import (
    decode_image,
    encode_bmp,
    encode_ppm,
    pixel_stats,
)


def _rgb(w: int, h: int, seed: int = 7) -> bytes:
    return bytes((seed * 31 + i) % 256 for i in range(3 * w * h))


def test_ppm_roundtrip():
    w, h = 5, 4
    rgb = _rgb(w, h)
    hh, ww, ch, arr = decode_image(encode_ppm(w, h, rgb))
    assert (hh, ww, ch) == (h, w, 3)
    assert bytes(arr.reshape(-1)) == rgb


def test_ppm_header_comments_and_whitespace():
    raw = b"P6 # a comment\n# another\n 3\t2 # wh\n255\n" + _rgb(3, 2)
    hh, ww, ch, arr = decode_image(raw)
    assert (hh, ww, ch) == (2, 3, 3)
    assert bytes(arr.reshape(-1)) == _rgb(3, 2)


def test_pgm_grayscale():
    gray = bytes(range(12))
    hh, ww, ch, arr = decode_image(b"P5\n4 3\n255\n" + gray)
    assert (hh, ww, ch) == (3, 4, 1)
    assert bytes(arr.reshape(-1)) == gray


@pytest.mark.parametrize("w,h", [(4, 3), (5, 2), (7, 3), (1, 1)])
def test_bmp_roundtrip_with_padding(w, h):
    # non-multiple-of-4 widths exercise the 4-byte row padding path
    rgb = _rgb(w, h, seed=w * 10 + h)
    hh, ww, ch, arr = decode_image(encode_bmp(w, h, rgb))
    assert (hh, ww, ch) == (h, w, 3)
    assert bytes(arr.reshape(-1)) == rgb


def test_bmp_matches_ppm_pixels():
    w, h = 8, 6
    rgb = _rgb(w, h, seed=99)
    _, _, _, a1 = decode_image(encode_ppm(w, h, rgb))
    _, _, _, a2 = decode_image(encode_bmp(w, h, rgb))
    assert np.array_equal(a1, a2)


def test_decode_errors():
    with pytest.raises(ValueError, match="unsupported image payload"):
        decode_image(b"\x89PNG\r\n\x1a\n garbage")
    with pytest.raises(ValueError, match="truncated"):
        decode_image(b"P6\n4 4\n255\n\x00\x01")
    with pytest.raises(ValueError, match="16-bit"):
        decode_image(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="need 12 bytes"):
        encode_ppm(2, 2, b"\x00")


def test_pixel_stats_operator(spark):
    w, h = 5, 3
    rows = [
        (1, encode_ppm(w, h, _rgb(w, h, seed=1))),
        (2, encode_bmp(w, h, _rgb(w, h, seed=2))),
        (3, b"P5\n2 2\n255\n\x01\x02\x03\x04"),  # grayscale
    ]
    blobs = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r["doc_id"]: r for r in pixel_stats(blobs).collect()}
    for did, seed in ((1, 1), (2, 2)):
        px = _rgb(w, h, seed=seed)
        assert (got[did]["width"], got[did]["height"]) == (w, h)
        assert got[did]["channels"] == 3
        for c, col in enumerate(("r_sum", "g_sum", "b_sum")):
            assert got[did][col] == sum(px[c::3])
    g = got[3]
    assert (g["width"], g["height"], g["channels"]) == (2, 2, 1)
    assert g["r_sum"] == g["g_sum"] == g["b_sum"] == 10


# ----------------------------------------------------- property tests --
try:
    from hypothesis import given, settings, strategies as st

    @given(
        w=st.integers(1, 12),
        h=st.integers(1, 9),
        data=st.data(),
    )
    @settings(max_examples=60, deadline=None)
    def test_codec_roundtrip_property(w, h, data):
        """For ANY dims and pixel bytes, encode->decode is identity for
        both PPM and BMP (padding widths included)."""
        rgb = bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=3 * w * h,
                    max_size=3 * w * h,
                )
            )
        )
        for enc in (encode_ppm, encode_bmp):
            hh, ww, ch, arr = decode_image(enc(w, h, rgb))
            assert (hh, ww, ch) == (h, w, 3)
            assert bytes(arr.reshape(-1)) == rgb

except ImportError:  # pragma: no cover - hypothesis is in the container
    pass


def test_wav_roundtrip_and_chunk_walk():
    from icebergsql_spark.operators.multimodal import decode_audio, encode_wav

    samples = [0, 1, -1, 32767, -32768, 123, -456]
    ch, rate, pcm = decode_audio(encode_wav(samples, 8000))
    assert (ch, rate) == (1, 8000)
    assert pcm.tolist() == samples
    # extra RIFF chunk before data (LIST/INFO shape) is skipped; odd-sized
    # chunks pad to even offsets
    raw = encode_wav(samples, 8000)
    fmt = raw[12:36]
    data = raw[36:]
    extra = b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    patched = (
        b"RIFF"
        + (len(fmt) + len(extra) + len(data) + 4).to_bytes(4, "little")
        + b"WAVE" + fmt + extra + data
    )
    ch2, rate2, pcm2 = decode_audio(patched)
    assert pcm2.tolist() == samples and (ch2, rate2) == (1, 8000)


def test_wav_decode_errors():
    from icebergsql_spark.operators.multimodal import decode_audio

    with pytest.raises(ValueError, match="PCM WAV only"):
        decode_audio(b"OggS....")
    with pytest.raises(ValueError, match="missing fmt"):
        decode_audio(b"RIFF\x04\x00\x00\x00WAVE")


def test_audio_stats_operator(spark):
    from icebergsql_spark.operators.multimodal import audio_stats, encode_wav

    rows = [
        (1, encode_wav([10, -20, 30], 44100)),
        (2, encode_wav([], 16000)),
    ]
    blobs = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r["doc_id"]: r for r in audio_stats(blobs).collect()}
    assert got[1]["n_samples"] == 3 and got[1]["sample_rate"] == 44100
    assert got[1]["amp_sum"] == 20 and got[1]["abs_sum"] == 60
    assert got[1]["max_abs"] == 30
    assert got[2]["n_samples"] == 0 and got[2]["max_abs"] == 0


def test_resize_image_box_mean_exact():
    """Round 7: resize_image must equal the exact integer block mean —
    verified against a hand-computed 4x2 → 2x1 case, crop semantics for
    non-divisible dims, and the P5 grayscale re-encode path."""
    import numpy as np

    from icebergsql_spark.operators.multimodal import (
        decode_image,
        encode_ppm,
    )

    # direct numpy check of the block-mean math the operator uses
    rgb = bytes(range(4 * 2 * 3))  # 4x2 RGB, bytes 0..23
    h, w, ch, arr = decode_image(encode_ppm(4, 2, rgb))
    a = arr.astype("int64")
    blk = a.reshape(1, 2, 2, 2, 3).sum(axis=(1, 3)) // 4
    # out pixel (0,0) ch0 = mean(bytes 0, 3, 12, 15) = 30//4 = 7
    assert blk[0, 0, 0] == (0 + 3 + 12 + 15) // 4


def test_resize_image_operator_roundtrip(spark):
    """decode→box-mean→re-encode→decode round trip through Spark: P6 in,
    P6 out with exact truncated means; odd dims crop; P5 stays P5."""
    import pandas as pd

    from icebergsql_spark.operators import multimodal

    rgb = bytes((7 * i + 3) % 256 for i in range(6 * 4 * 3))
    gray = bytes((11 * i + 5) % 256 for i in range(5 * 3))
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "payload": [
                multimodal.encode_ppm(6, 4, rgb),
                b"P5\n5 3\n255\n" + gray,
            ],
        }
    )
    blobs = spark.createDataFrame(pdf)
    out = {
        r["doc_id"]: r
        for r in multimodal.resize_image(blobs, factor=2).collect()
    }
    h1, w1, c1, a1 = multimodal.decode_image(bytes(out[1]["payload"]))
    assert (h1, w1, c1) == (2, 3, 3)
    assert out[1]["media_type"] == "image/x-portable-pixmap"
    # exact block mean of the generator bytes, ch 0, out pixel (0,0)
    import numpy as np

    src = np.frombuffer(rgb, dtype="uint8").reshape(4, 6, 3).astype("int64")
    expect = (src[0, 0, 0] + src[0, 1, 0] + src[1, 0, 0] + src[1, 1, 0]) // 4
    assert int(a1[0, 0, 0]) == int(expect)
    h2, w2, c2, a2 = multimodal.decode_image(bytes(out[2]["payload"]))
    assert (h2, w2, c2) == (1, 2, 1)  # 5x3 crops to 4x2 then halves
    assert out[2]["media_type"] == "image/x-portable-graymap"


def test_extract_features_dispatches_by_magic(spark):
    """The round-7 real dispatcher: image payloads get dims+pixel sums,
    WAV payloads get sample stats, opaque bytes fall back to checksums —
    NULLs (not garbage) in the inapplicable columns."""
    import pandas as pd

    from icebergsql_spark.operators import multimodal

    rgb = bytes(range(48))  # 4x4 RGB
    wav = multimodal.encode_wav([3, -4, 5], sample_rate=8000)
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "payload": [
                multimodal.encode_ppm(4, 4, rgb), wav, b"\x01\x02\x03",
            ],
        }
    )
    rows = {
        r["doc_id"]: r
        for r in multimodal.extract_features(
            spark.createDataFrame(pdf)
        ).collect()
    }
    assert rows[1]["media_kind"] == "image"
    assert (rows[1]["width"], rows[1]["height"], rows[1]["channels"]) == (4, 4, 3)
    assert rows[1]["px_sum"] == sum(range(48))
    assert rows[1]["n_samples"] is None
    assert rows[2]["media_kind"] == "audio"
    assert (rows[2]["n_samples"], rows[2]["sample_rate"]) == (3, 8000)
    assert rows[2]["amp_abs_sum"] == 12
    assert rows[2]["width"] is None
    assert rows[3]["media_kind"] == "opaque"
    assert rows[3]["checksum_mod"] == 6


def test_riff_container_roundtrip():
    """encode_rvid → parse_riff_frames recovers every frame's exact bytes,
    including odd-size frames (pad byte must be skipped, not consumed)."""
    from icebergsql_spark.operators.multimodal import (
        encode_rvid,
        parse_riff_frames,
    )

    frames = [b"abc", b"defgh", b"\x00" * 7, b"Z"]  # odd sizes on purpose
    payload = encode_rvid(frames, fps=24)
    idx = parse_riff_frames(payload)
    assert len(idx) == 4
    got = [payload[off : off + sz] for off, sz in idx]
    assert got == frames


def test_riff_rejects_non_avi():
    import pytest

    from icebergsql_spark.operators.multimodal import (
        encode_wav,
        parse_riff_frames,
    )

    with pytest.raises(ValueError, match="RIFF AVI"):
        parse_riff_frames(encode_wav([1, 2, 3]))
    with pytest.raises(ValueError, match="RIFF AVI"):
        parse_riff_frames(b"nope")


def test_decimate_audio_roundtrip(spark):
    """decode → every-4th-sample → re-encode at rate//4: the decimated
    payload decodes back to exactly pcm[::4] and the new rate; byte_len
    is the 44-byte header plus 2 bytes per kept sample."""
    import numpy as np

    from icebergsql_spark.operators.multimodal import (
        decimate_audio,
        decode_audio,
        encode_wav,
    )

    samples = [((i * 37) % 65536) - 32768 for i in range(103)]  # odd length
    blob = encode_wav(samples, 16000)
    df = spark.createDataFrame([(1, bytearray(blob))],
                               "doc_id long, payload binary")
    row = decimate_audio(df, factor=4).collect()[0]
    ch, rate, pcm = decode_audio(bytes(row["payload"]))
    assert (ch, rate) == (1, 4000)
    assert pcm.tolist() == samples[::4]
    assert row["byte_len"] == 44 + 2 * len(samples[::4])
    assert np.asarray(samples[::4], dtype="<i2").tobytes() in bytes(
        row["payload"]
    )


def test_keyframe_select_scene_changes(spark):
    """Hand-built video: flat gray frames with two level jumps — the
    keyframe policy must keep frame 0 and exactly the jump frames, and
    the kept-vs-last-KEPT semantics must ignore sub-threshold drift."""
    from icebergsql_spark.operators.multimodal import (
        encode_ppm,
        encode_rvid,
        keyframe_select,
    )

    def flat(level: int) -> bytes:
        return encode_ppm(4, 4, bytes([level] * 48))

    # levels: 10,10,10, 200 (jump), 201 (drift), 50 (jump), 50
    frames = [flat(v) for v in (10, 10, 10, 200, 201, 50, 50)]
    payload = encode_rvid(frames)
    blobs = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    out = keyframe_select(blobs, threshold_q=5_000_000).collect()[0]
    assert out["n_frames"] == 7
    # frame 0 always; 3 jumps 10->200; 5 jumps 200->50 (201 drift is
    # below threshold AND measured against the last KEPT frame 3)
    assert out["keyframe_idx"] == "0,3,5"
    assert out["n_keyframes"] == 3
    # max jump observed: |200-10| = 190 levels = 190e6 in q units
    assert out["mean_jump_q"] == 190_000_000


def test_keyframe_select_skips_non_image_frames(spark):
    from icebergsql_spark.operators.multimodal import (
        encode_ppm,
        encode_rvid,
        keyframe_select,
    )

    frames = [
        encode_ppm(2, 2, bytes([10] * 12)),
        b"\x00\x01garbage-not-an-image",
        encode_ppm(2, 2, bytes([250] * 12)),
    ]
    payload = encode_rvid(frames)
    blobs = spark.createDataFrame(
        [(7, bytearray(payload))], "doc_id long, payload binary"
    )
    out = keyframe_select(blobs, threshold_q=1_000_000).collect()[0]
    assert out["n_frames"] == 3
    # the opaque middle frame is invisible to the policy: kept = 0 and 2
    assert out["keyframe_idx"] == "0,2"
