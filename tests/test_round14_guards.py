"""Unit tests for round-14 shared infrastructure: the nonempty()
vacuous-wave guard and the image_opponent_stats operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_nonempty_passes_through_and_raises(spark):
    from icebergsql_spark.plans.registry import nonempty

    df = spark.range(10)
    out = nonempty(df.filter(F.col("id") % 2 == 0), "evens")
    assert out.count() == 5
    with pytest.raises(AssertionError, match="vacuously empty"):
        nonempty(df.filter(F.col("id") < 0), "impossible")


def test_image_opponent_stats_ppm_bmp_parity_and_gray(spark):
    """The opponent sufficient statistics must be codec-independent
    (PPM and BMP of the same pixels agree) and exactly zero for a
    grayscale image (R = G = B)."""
    import pandas as pd

    from icebergsql_spark.operators import multimodal

    rgb = bytes((i * i * 7 + 13) % 256 for i in range(144))
    gray = bytes(((i // 3) * 5) % 256 for i in range(48) for _ in range(3))
    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "payload": [
                multimodal.encode_ppm(8, 6, rgb),
                multimodal.encode_bmp(8, 6, rgb),
                multimodal.encode_ppm(8, 6, gray),
            ],
        }
    )
    blobs = spark.createDataFrame(pdf)
    rows = {
        r["doc_id"]: r
        for r in multimodal.image_opponent_stats(blobs).collect()
    }
    # codec parity: identical pixels -> identical sufficient stats
    for col in ("n_px", "rg2_sum", "rg2_sq_sum", "yb2_sum",
                "yb2_sq_sum"):
        assert rows[0][col] == rows[1][col], col
    # grayscale: opponent channels vanish exactly
    assert rows[2]["rg2_sum"] == 0 and rows[2]["rg2_sq_sum"] == 0
    assert rows[2]["yb2_sum"] == 0 and rows[2]["yb2_sq_sum"] == 0
    # replica check of the doubled-opponent formula on the RGB image
    px = [
        (rgb[3 * p], rgb[3 * p + 1], rgb[3 * p + 2]) for p in range(48)
    ]
    rg2 = [2 * (r - g) for r, g, _ in px]
    yb2 = [r + g - 2 * b for r, g, b in px]
    assert rows[0]["rg2_sum"] == sum(rg2)
    assert rows[0]["rg2_sq_sum"] == sum(v * v for v in rg2)
    assert rows[0]["yb2_sum"] == sum(yb2)
    assert rows[0]["yb2_sq_sum"] == sum(v * v for v in yb2)


def test_partial_stream_markers_mode_matches_batch_distinct(spark):
    """distinct_markers mode of the ONE parameterized fixture must
    reproduce the batch DISTINCT sighting set regardless of
    micro-batch chopping (set-mergeability by algebra)."""
    from icebergsql_spark.plans.pipeline30 import _partial_stream
    from icebergsql_spark.plans.registry import events_ts_to_nanos

    sf = "/root/testdata/sf0.001"
    _partial_stream(
        spark,
        sf,
        "tguard",
        cols=[
            F.col("user_id"),
            F.expr("ts DIV 86400000000000").alias("day"),
        ],
        keys=["user_id", "day"],
        out_alias="",
        suffix="sightings",
        pre_filter=F.col("event_type") == "purchase",
        distinct_markers=True,
    )
    streamed = {
        (r["user_id"], r["day"])
        for r in spark.table("tguard_sightings").collect()
    }
    ev = events_ts_to_nanos(spark.read.parquet(f"{sf}/events.parquet"))
    batch = {
        (r["user_id"], r["day"])
        for r in ev.filter(F.col("event_type") == "purchase")
        .select(
            "user_id", F.expr("ts DIV 86400000000000").alias("day")
        )
        .distinct()
        .collect()
    }
    assert streamed == batch
