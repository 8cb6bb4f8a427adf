"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Queries are materialized with the noop sink (full execution, no driver
transfer). The set covers the reference-parity relational surface, the
managed-table layer (write + pruned scan + time travel), and the pipeline
operators — the same code paths the correctness gate checks, timed.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from icebergsql_spark.plans import REGISTRY, load_all
from icebergsql_spark.session import get_spark

BENCH_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "q18_large_volume_customer",
    "filter_compound_predicates",
    "agg_groupby_having",
    "window_row_number_topn",
    "events_json_time_bucket",
    "subquery_in_scalar",
    "set_ops",
    "dedup_minhash_signatures",
    "dedup_simhash",
    "dedup_lsh_neardup_pairs",
    "text_quality_fingerprint",
    "ann_bruteforce_topk",
    "ann_signbit_lsh_topk",
    "multimodal_blob_features",
    "managed_pruned_scan",
    "managed_time_travel",
    "managed_partition_overwrite",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    load_all()
    spark = get_spark(app_name="icebergsql-bench")

    # warm the JVM + parquet footers with a trivial action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        spec = REGISTRY[name]
        t0 = time.time()
        df = spec.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
