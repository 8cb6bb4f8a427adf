"""Unit tests for the integer-DFT tone operators
(operators/multimodal.py): coefficient-table anchors and power
detection against a numpy replay of the same quantized basis."""

import numpy as np

from icebergsql_spark.operators.multimodal import (
    audio_tone_powers,
    dft_int_coefs,
    encode_wav,
)


def test_dft_coef_anchors():
    table = {(k, i): (cq, sq) for (k, i, cq, sq) in dft_int_coefs(64)}
    # i = 0 is always (scale, 0); bin 16 at i = 1 is a quarter turn
    for k in (4, 8, 16):
        assert table[(k, 0)] == (16384, 0)
    assert table[(16, 1)] == (0, 16384)
    assert table[(16, 2)] == (-16384, 0)
    # k=4, i=8 is angle 2*pi*32/64 = pi: a half turn
    assert table[(4, 8)] == (-16384, 0)
    # k=4, i=4 is angle pi/2: a quarter turn
    assert table[(4, 4)] == (0, 16384)


def test_tone_powers_match_numpy_replay(spark):
    rng = np.random.default_rng(7)
    docs = []
    raw = {}
    for did in range(6):
        s = rng.integers(-2000, 2000, size=64).astype(np.int64)
        raw[did] = s
        docs.append((did, encode_wav([int(v) for v in s], 16000)))
    blobs = spark.createDataFrame(docs, "doc_id bigint, payload binary")
    got = {
        (r["doc_id"], r["bin"]): r
        for r in audio_tone_powers(blobs).collect()
    }
    table = dft_int_coefs(64)
    for did, s in raw.items():
        for k in (4, 8, 16):
            cq = np.array([c for (kk, i, c, _s) in table if kk == k])
            sq = np.array([ss for (kk, i, _c, ss) in table if kk == k])
            re, im = int((s * cq).sum()), int((s * sq).sum())
            row = got[(did, k)]
            assert (row["re_q"], row["im_q"]) == (re, im)
            assert row["power"] == re * re + im * im


def test_tone_powers_detect_planted_square(spark):
    # square wave period 8 -> fundamental at bin 64/8 = 8
    s = [1000 if (i // 4) % 2 == 0 else -1000 for i in range(64)]
    blobs = spark.createDataFrame(
        [(1, encode_wav(s, 16000))], "doc_id bigint, payload binary"
    )
    p = {r["bin"]: r["power"] for r in audio_tone_powers(blobs).collect()}
    assert p[8] > 1000 * p[4] and p[8] > 1000 * p[16]


def test_audio_zcr_counts_strict_sign_flips(spark):
    from icebergsql_spark.operators.multimodal import audio_zcr

    # square wave half-period p over 64 samples: 63 // p within-frame
    # flips; a zero sample never counts (strict product)
    sq = [100 if (i // 4) % 2 == 0 else -100 for i in range(64)]
    with_zero = [1, 0, -1, 0, 1, 0, -1, 0] * 8  # zeros break products
    blobs = spark.createDataFrame(
        [
            (1, encode_wav(sq + sq, 16000)),  # 2 full frames
            (2, encode_wav(with_zero, 16000)),
            (3, encode_wav(sq[:40], 16000)),  # partial frame dropped
        ],
        "doc_id bigint, payload binary",
    )
    rows = {
        (r["doc_id"], r["frame"]): r["zcr"]
        for r in audio_zcr(blobs, frame_len=64).collect()
    }
    assert rows[(1, 0)] == 63 // 4 and rows[(1, 1)] == 63 // 4
    assert rows[(2, 0)] == 0  # every neighbor product touches a zero
    assert (3, 0) not in rows
