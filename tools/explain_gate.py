"""Dump .explain('formatted') for named gates to plans/r14/<name>_<tag>.txt.

Usage:
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/explain_gate.py before q1_pricing_summary graph_pagerank ...
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icebergsql_spark.plans import REGISTRY, load_all
from icebergsql_spark.session import get_spark
from icebergsql_spark.operators.util import release_caches


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    tag = sys.argv[1]
    names = sys.argv[2:]
    load_all()
    spark = get_spark(app_name="gate-explain")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r14",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        spec = REGISTRY[name]
        df = spec.spark(spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(txt)
        release_caches()
        print(f"wrote {name}_{tag}.txt ({len(txt)} chars)", flush=True)


if __name__ == "__main__":
    main()
