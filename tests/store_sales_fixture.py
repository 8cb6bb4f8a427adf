"""Synthetic store_sales fixture matching FIXTURES.md §1 invariants.

Layout invariants (reference README.md:138-158 + the predicated-overwrite
arithmetic at :298-337):
  - 6 partitions ss_sold_date_sk in 0905245..0910245, 5 files each, 2109 rows
  - partition 0906245 has exactly 236 rows
  - partition 0905245 has exactly 232 rows with ss_item_sk >= 5000
    (so overwriting it with its own `ss_item_sk < 5000` rows → 1877 total)
  - every partition's ss_item_sk range spans 5000
  - ss_sold_month = ss_sold_date_sk[:2], ss_sold_day = ss_sold_date_sk[:4]

Generated deterministically (numpy seed 7); no reference data is copied.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITIONS = ["0905245", "0906245", "0907245", "0908245", "0909245", "0910245"]
ROWS = {"0905245": 350, "0906245": 236, "0907245": 380, "0908245": 380,
        "0909245": 380, "0910245": 383}  # total 2109
FILES_PER_PARTITION = 5

SCHEMA_DDL = (
    "ss_sold_time_sk int, ss_item_sk int, ss_customer_sk int, ss_cdemo_sk int, "
    "ss_hdemo_sk int, ss_addr_sk int, ss_store_sk int, ss_promo_sk int, "
    "ss_quantity int, ss_wholesale_cost decimal(7,2), ss_list_price decimal(7,2), "
    "ss_sales_price decimal(7,2), ss_ext_sales_price decimal(7,2), "
    "ss_sold_month string, ss_sold_day string, ss_sold_date_sk string"
)

COLUMN_DEPENDENCIES = (
    "ss_sold_date_sk=ss_sold_month:truncate[2], "
    "ss_sold_date_sk=ss_sold_day:truncate[4]"
)


def build_store_sales_pdf() -> pd.DataFrame:
    rng = np.random.default_rng(7)
    frames = []
    for date_sk in PARTITIONS:
        n = ROWS[date_sk]
        if date_sk == "0905245":
            # exactly 232 rows >= 5000 (for the 1877 golden number)
            items = np.concatenate([
                rng.integers(100, 5000, size=n - 232),
                rng.integers(5000, 18000, size=232),
            ])
        else:
            # span 5000: roughly half below, half above
            lo = n // 2
            items = np.concatenate([
                rng.integers(100, 5000, size=lo),
                rng.integers(5000, 18000, size=n - lo),
            ])
        rng.shuffle(items)
        wholesale = np.round(rng.uniform(1, 90, size=n), 2)
        frames.append(pd.DataFrame({
            "ss_sold_time_sk": rng.integers(0, 86400, size=n),
            "ss_item_sk": items,
            "ss_customer_sk": rng.integers(1, 100000, size=n),
            "ss_cdemo_sk": rng.integers(1, 1_900_000, size=n),
            "ss_hdemo_sk": rng.integers(1, 7200, size=n),
            "ss_addr_sk": rng.integers(1, 50000, size=n),
            "ss_store_sk": rng.integers(1, 12, size=n),
            "ss_promo_sk": rng.integers(1, 300, size=n),
            "ss_quantity": rng.integers(1, 100, size=n),
            "ss_wholesale_cost": wholesale,
            "ss_list_price": np.round(wholesale * 1.5, 2),
            "ss_sales_price": np.round(wholesale * 1.2, 2),
            "ss_ext_sales_price": np.round(wholesale * 1.2 * 3, 2),
            "ss_sold_month": date_sk[:2],
            "ss_sold_day": date_sk[:4],
            "ss_sold_date_sk": date_sk,
        }))
    return pd.concat(frames, ignore_index=True)


def build_store_sales_df(spark: SparkSession) -> DataFrame:
    """Source DataFrame pre-distributed into exactly 5 tasks per partition,
    so an insert writes the reference's 6×5 file layout. Uses an explicit
    RDD partitioner (combo id → partition index) because hash/range
    repartitioning cannot guarantee one (date, slot) group per task."""
    pdf = build_store_sales_pdf()
    part_index = {p: i for i, p in enumerate(PARTITIONS)}
    pdf["combo_id"] = pdf.apply(
        lambda r: part_index[r["ss_sold_date_sk"]] * FILES_PER_PARTITION
        + int(r["ss_item_sk"]) % FILES_PER_PARTITION,
        axis=1,
    )
    df = spark.createDataFrame(pdf)
    for c in ("ss_wholesale_cost", "ss_list_price", "ss_sales_price", "ss_ext_sales_price"):
        df = df.withColumn(c, F.col(c).cast("decimal(7,2)"))
    n_combos = len(PARTITIONS) * FILES_PER_PARTITION
    schema = df.schema
    rdd = (
        df.rdd.map(lambda r: (r["combo_id"], r))
        .partitionBy(n_combos, lambda k: k)
        .map(lambda kv: kv[1])
    )
    return spark.createDataFrame(rdd, schema).drop("combo_id")
