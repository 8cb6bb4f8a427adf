"""Per-gate profiling harness (optimization rounds).

For each named gate, measures — in one long-lived session, mirroring
bench.py methodology — the split between driver-side plan construction
(``spec.spark(...)``, which for scenario gates includes the fixture build)
and execution (noop sink), plus the number of Spark jobs each phase ran.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/profile_gates.py q1_pricing_summary events_hurst ...
    SPARK_GRAFT_SF_DIR=... python tools/profile_gates.py --sample 40   # stratified sample
    SPARK_GRAFT_SF_DIR=... python tools/profile_gates.py --all

Writes JSON lines to stdout; one line per gate:
    {"name": ..., "build_s": ..., "exec_s": ..., "build_jobs": N, "exec_jobs": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icebergsql_spark.plans import REGISTRY, load_all
from icebergsql_spark.session import get_spark
from icebergsql_spark.operators.util import release_caches


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    args = sys.argv[1:]
    if args and args[0] == "--all":
        names = sorted(REGISTRY)
    elif args and args[0] == "--sample":
        k = int(args[1]) if len(args) > 1 else 40
        names = sorted(REGISTRY)[:: max(1, len(REGISTRY) // k)]
    else:
        names = args
    spark = get_spark(app_name="gate-profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm the JVM like bench.py does
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint")))
        .write.format("noop").mode("overwrite").save()
    )

    def jobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else 0

    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(json.dumps({"name": name, "error": "unknown"}), flush=True)
            continue
        try:
            j0 = jobs()
            t0 = time.time()
            df = spec.spark(spark, sf_dir)
            t1 = time.time()
            j1 = jobs()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            j2 = jobs()
            release_caches()
            print(
                json.dumps(
                    {
                        "name": name,
                        "build_s": round(t1 - t0, 3),
                        "exec_s": round(t2 - t1, 3),
                        "build_jobs": j1 - j0,
                        "exec_jobs": j2 - j1,
                    }
                ),
                flush=True,
            )
        except Exception as e:  # noqa: BLE001
            print(
                json.dumps({"name": name, "error": str(e)[:200]}), flush=True
            )


if __name__ == "__main__":
    main()
