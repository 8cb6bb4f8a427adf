"""Warm per-gate p50 (optimization rounds): run each named gate K times in
one long-lived session (bench.py methodology: build + noop sink per run,
release_caches between runs), report per-run seconds and the median.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/warm_gate.py [-k3] name ...
"""

from __future__ import annotations

import json
import os
import statistics
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
    k = 3
    if args and args[0].startswith("-k"):
        k = int(args[0][2:])
        args = args[1:]
    spark = get_spark(app_name="gate-warm")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    def jobs() -> int:
        ids = tracker.getJobIdsForGroup(None)
        return max(ids) if ids else 0

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

    for name in args:
        spec = REGISTRY.get(name)
        if spec is None:
            print(json.dumps({"name": name, "error": "unknown"}), flush=True)
            continue
        runs = []
        j_first = None
        for i in range(k):
            try:
                j0 = jobs()
                t0 = time.time()
                df = spec.spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 3))
                if j_first is None:
                    j_first = jobs() - j0
                release_caches()
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"name": name, "error": str(e)[:300]}), flush=True)
                runs = []
                break
        if runs:
            print(
                json.dumps(
                    {
                        "name": name,
                        "runs": runs,
                        "p50": round(statistics.median(runs), 3),
                        "jobs_run1": j_first,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
