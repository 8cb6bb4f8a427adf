"""Unit tests for the image histogram / gradient operators
(operators/multimodal.py): exact-integer contracts against hand
computations, container-format parity, and the grayscale x3 scaling."""

import numpy as np

from icebergsql_spark.operators.multimodal import (
    encode_bmp,
    encode_ppm,
    image_gradient_stats,
    image_gray_histogram,
)


def _rgb(w, h, seed=0):
    return bytes((seed * 31 + i * 7) % 256 for i in range(w * h * 3))


def test_histogram_counts_and_format_parity(spark):
    w, h = 8, 6
    raw = _rgb(w, h, seed=3)
    blobs = spark.createDataFrame(
        [(1, encode_ppm(w, h, raw)), (2, encode_bmp(w, h, raw))],
        "doc_id bigint, payload binary",
    )
    got = {r["doc_id"]: r for r in image_gray_histogram(blobs).collect()}
    px = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
    gray = px.reshape(h * w, 3).sum(axis=1)
    expected = np.bincount((gray * 8) // 768, minlength=8)
    for did in (1, 2):  # PPM and BMP decode to identical histograms
        hs = [got[did][f"h{k}"] for k in range(8)]
        assert hs == [int(v) for v in expected]
        assert sum(hs) == w * h


def test_histogram_grayscale_scaled_to_rgb_range(spark):
    # P5 gray value v must histogram like an RGB pixel (v, v, v)
    gray = bytes(range(16))
    p5 = b"P5\n4 4\n255\n" + gray
    rgb = b"".join(bytes((v, v, v)) for v in gray)
    blobs = spark.createDataFrame(
        [(1, p5), (2, encode_ppm(4, 4, rgb))],
        "doc_id bigint, payload binary",
    )
    got = {r["doc_id"]: r for r in image_gray_histogram(blobs).collect()}
    assert [got[1][f"h{k}"] for k in range(8)] == [
        got[2][f"h{k}"] for k in range(8)
    ]


def test_gradient_stats_uniform_and_step(spark):
    w, h = 6, 4
    flat = bytes([10, 20, 30] * (w * h))  # constant gray everywhere
    # one bright column: pixels in column 0 are (255,255,255)
    arr = bytearray(flat)
    for y in range(h):
        for c in range(3):
            arr[(y * w) * 3 + c] = 255
    blobs = spark.createDataFrame(
        [(1, encode_ppm(w, h, flat)), (2, encode_ppm(w, h, bytes(arr)))],
        "doc_id bigint, payload binary",
    )
    got = {
        r["doc_id"]: r
        for r in image_gradient_stats(blobs, thresh=100).collect()
    }
    n_grads = h * (w - 1) + w * (h - 1)
    assert got[1]["tv"] == 0 and got[1]["n_edges"] == 0
    assert got[1]["n_grads"] == n_grads
    # step image: the only nonzero diffs are the h horizontal
    # col0 -> col1 transitions, each |765 - 60| = 705
    assert got[2]["tv"] == h * (765 - 60)
    assert got[2]["n_edges"] == h
    assert got[2]["n_grads"] == n_grads
