"""Round-13 gate wave #3 (pipeline41): the gap statistic for k-means.

Each gate is driver-sim verified at sf0.001 + 0.01 + 0.1 in a fresh
vanilla-session process before registration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401

from icebergsql_spark.plans.registry import register

# -------------------------------------------------- gap statistic --

_GAP_CAP = 500  # bounded universe (the Hopkins-gate discipline)
_GAP_B = 2  # reference draws
_GAP_K = 8

# Tibshirani's gap statistic: compare the data's within-cluster
# dispersion W against W of B reference datasets drawn UNIFORMLY in
# the data's per-dimension bounding box, at the same k.  Reference
# coordinates are md5-deterministic integers inside the exact q-space
# box (the deterministic-coin discipline), so BOTH engines replay the
# identical three k-means chains.  Coarse 1e3 q-space keeps every
# squared-distance sum orders of magnitude under the bigint ceiling
# even for the (dispersed) uniform references.  Per the hill rule the
# gate emits the exact integer W's and the pure-double dispersion
# RATIO (w_ref1*w_ref2 / w_data^2 — double mult/div are bit-identical
# engines-wise); gap = 0.5*ln(ratio) is left to the consumer (ln is
# 1-ulp fragile).

_GAP_HX_SPARK = (
    "CAST(conv(substring(md5(concat('gap:', CAST(b.b AS STRING), ':',"
    " CAST(v.vid AS STRING), ':', CAST(s.pos AS STRING))), 1, 13),"
    " 16, 10) AS BIGINT)"
)
_GAP_HX_DUCK = (
    "CAST('0x' || substr(md5('gap:' || CAST(b.b AS VARCHAR) || ':'"
    " || CAST(v.vid AS VARCHAR) || ':' || CAST(s.pos AS VARCHAR)),"
    " 1, 13) AS BIGINT)"
)


def _gap_chain(hx: str, div: str, mat: str) -> str:
    parts = [
        f"""dq0 AS {mat}(
          SELECT vec_id AS vid, i AS pos,
                 CAST(round({{emb_i}} * 1000) AS BIGINT) + 2000 AS q
          FROM embeddings {{spine}}
          WHERE vec_id < {_GAP_CAP}
        ),
        box AS {mat}(
          SELECT pos, CAST(MIN(q) AS BIGINT) AS qlo,
                 CAST(MAX(q) AS BIGINT) AS qhi
          FROM dq0 GROUP BY pos
        ),
        refs AS {mat}(
          SELECT b.b AS ds, v.vid, s.pos,
                 box.qlo + ({hx}) % (box.qhi - box.qlo + 1) AS q
          FROM (SELECT DISTINCT vid FROM dq0) v
          CROSS JOIN (SELECT DISTINCT pos FROM dq0) s
          CROSS JOIN (SELECT r AS b
                      FROM (VALUES (1), (2)) AS t(r)) b
          JOIN box ON box.pos = s.pos
        ),
        xq AS {mat}(
          SELECT 0 AS ds, vid, pos, q FROM dq0
          UNION ALL
          SELECT ds, vid, pos, q FROM refs
        ),
        c0 AS (
          SELECT ds, vid AS cell, pos, q AS cq FROM xq
          WHERE vid < {_GAP_K}
        )"""
    ]
    argmin = "CAST(MIN(dq * 100 + cell) % 100 AS INTEGER)"
    for it in range(2):
        parts.append(f"""
        d{it + 1} AS (
          SELECT x.ds, x.vid, c.cell,
                 CAST(SUM((x.q - c.cq) * (x.q - c.cq)) AS BIGINT) AS dq
          FROM xq x JOIN c{it} c ON c.ds = x.ds AND c.pos = x.pos
          GROUP BY 1, 2, 3
        ),
        a{it + 1} AS (
          SELECT ds, vid, {argmin} AS cell
          FROM d{it + 1} GROUP BY ds, vid
        ),
        c{it + 1} AS {mat}(
          SELECT x.ds, a.cell, x.pos,
                 CAST(SUM(x.q) {div} COUNT(*) AS BIGINT) AS cq
          FROM xq x
          JOIN a{it + 1} a ON a.ds = x.ds AND a.vid = x.vid
          GROUP BY 1, 2, 3
        )""")
    parts.append("""
        dfin AS (
          SELECT x.ds, x.vid, c.cell,
                 CAST(SUM((x.q - c.cq) * (x.q - c.cq)) AS BIGINT) AS dq
          FROM xq x JOIN c2 c ON c.ds = x.ds AND c.pos = x.pos
          GROUP BY 1, 2, 3
        ),
        wmin AS (SELECT ds, vid, MIN(dq) AS d2 FROM dfin GROUP BY 1, 2),
        w AS (
          SELECT ds, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(d2) AS BIGINT) AS wq
          FROM wmin GROUP BY ds
        ),
        piv AS (
          SELECT MAX(CASE WHEN ds = 0 THEN n END) AS n,
                 MAX(CASE WHEN ds = 0 THEN wq END) AS w_data,
                 MAX(CASE WHEN ds = 1 THEN wq END) AS w_ref1,
                 MAX(CASE WHEN ds = 2 THEN wq END) AS w_ref2
          FROM w
        )
        SELECT n, w_data, w_ref1, w_ref2,
               (CAST(w_ref1 AS DOUBLE) * CAST(w_ref2 AS DOUBLE))
                 / (CAST(w_data AS DOUBLE) * CAST(w_data AS DOUBLE))
                 AS dispersion_ratio_sq
        FROM piv""")
    return "WITH " + ",".join(parts)


@register(
    "emb_gap_statistic",
    oracle=_gap_chain(_GAP_HX_DUCK, "//", "MATERIALIZED ").format(
        emb_i="embedding[i]::DOUBLE",
        spine="CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i) g",
    ),
    doc="Gap statistic (Tibshirani) for the k=8 k-means partition over "
    "a bounded embedding universe (vec_id < 500): the data's "
    "within-cluster dispersion W vs TWO uniform reference datasets "
    "drawn md5-deterministically inside the data's exact per-dim "
    "integer bounding box, each run through the identical "
    "2-round integer k-means chain. Clustered data has "
    "W_data << W_ref; uniform data has ratio near 1 — the "
    "is-this-k-real check after Hopkins says 'clustered'. Emits the "
    "three EXACT bigint W's (coarse 1e3 q-space keeps the uniform "
    "references' dispersion far under the bigint ceiling) and the "
    "pure-double ratio w_ref1*w_ref2/w_data^2; gap = 0.5*ln(ratio) "
    "is left to the consumer per the hill rule. Scale shape: "
    "reference generation is a per-(b, vid, dim) hash — "
    "embarrassingly parallel; the chains are centroid equi-joins, "
    "never all-pairs; B and the probe cap bound the cost, not the "
    "corpus.",
    tags=("embeddings", "curation", "stats"),
)
def emb_gap_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from icebergsql_spark.operators.util import ensure_parallelism
    from icebergsql_spark.plans.registry import load_tables

    ensure_parallelism(
        load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    ).createOrReplaceTempView("embeddings")
    # r15 (the VERDICT item-7 / emb_top_eigvec shape): as one SQL
    # statement the chain referenced xq FIVE times (the md5 reference
    # generation replayed per reference) and planned ~35 tiny stages —
    # 4.7 s warm at sf0.1 for a universe the gate itself caps at 500
    # vectors x 64 dims x 3 datasets. Now the only Spark work is the dq0
    # quantization (engine round() semantics); the md5 reference draws
    # and the three 2-round integer k-means chains run driver-side as a
    # bit-exact replica (_gap_driver_tail: pure int64 numpy + Python
    # ints, DIV on non-negative operands == //, the argmin's
    # MIN(dq*100+cell)%100 encoding replayed literally; the ONLY float
    # op is the final ratio with the same operand order). The oracle
    # string is untouched; old-vs-new frame identity is locked in
    # tests/test_opt_r15_gap_driver.py.
    dq0_sql = _GAP_DQ0_SQL.format(
        emb_i="CAST(element_at(embedding, CAST(i AS INT)) AS DOUBLE)",
        spine="CROSS JOIN (SELECT explode(sequence(1, 64)) AS i) g",
        cap=_GAP_CAP,
    )
    rows = spark.sql(dq0_sql).collect()
    out = _gap_driver_tail(rows)
    from icebergsql_spark.plans.registry import local_result

    return local_result(
        spark,
        [out],
        "n bigint, w_data bigint, w_ref1 bigint, w_ref2 bigint, "
        "dispersion_ratio_sq double",
    )


_GAP_DQ0_SQL = """
        SELECT vec_id AS vid, i AS pos,
               CAST(round({emb_i} * 1000) AS BIGINT) + 2000 AS q
        FROM embeddings {spine}
        WHERE vec_id < {cap}
"""


def _gap_driver_tail(dq0_rows) -> tuple:
    """Bit-exact driver replica of the gap-statistic chain over the
    collected dq0 quantization.

    Exactness, op by op against the SQL template (_gap_chain):
      - box/refs/kmeans rounds are ALL integer arithmetic; Spark ``DIV``
        truncates and every operand is non-negative (q >= ~1000), so
        Python ``//`` is identical;
      - the md5 reference draw replays ``conv(substring(md5(...),1,13),
        16,10) % (qhi-qlo+1)`` with hashlib (bit-identical md5, the
        standing oracle contract);
      - the argmin is the literal ``MIN(dq*100 + cell) % 100`` encoding;
      - the only float is the final ratio, composed in the template's
        operand order (w_ref1 * w_ref2) / (w_data * w_data).
    """
    import hashlib

    import numpy as np

    vids = sorted({r["vid"] for r in dq0_rows})
    poss = sorted({r["pos"] for r in dq0_rows})
    vidx = {v: k for k, v in enumerate(vids)}
    pidx = {p: k for k, p in enumerate(poss)}
    n_v, n_p = len(vids), len(poss)
    data = np.zeros((n_v, n_p), dtype=np.int64)
    for r in dq0_rows:
        data[vidx[r["vid"]], pidx[r["pos"]]] = r["q"]
    qlo = data.min(axis=0)
    qhi = data.max(axis=0)
    span = qhi - qlo + 1
    dsets = {0: data}
    for b in range(1, _GAP_B + 1):
        ref = np.zeros((n_v, n_p), dtype=np.int64)
        for vi, vid in enumerate(vids):
            for pi, pos in enumerate(poss):
                hx = int(
                    hashlib.md5(
                        f"gap:{b}:{vid}:{pos}".encode()
                    ).hexdigest()[:13],
                    16,
                )
                ref[vi, pi] = qlo[pi] + hx % span[pi]
        dsets[b] = ref
    w = {}
    for ds, X in sorted(dsets.items()):
        # c0: initial centroids = the rows with vid < _GAP_K
        cent = {
            vid: X[vidx[vid]].copy() for vid in vids if vid < _GAP_K
        }
        for _ in range(2):
            # d/a: per vid, argmin cell by MIN(dq*100 + cell) % 100
            assign = {}
            for vi, vid in enumerate(vids):
                best = None
                for cell, cq in cent.items():
                    d = X[vi] - cq
                    dq = int((d * d).sum())
                    enc = dq * 100 + cell
                    if best is None or enc < best:
                        best = enc
                assign[vid] = best % 100
            # c: per (cell, pos), SUM(q) DIV COUNT (non-negative //)
            new_cent = {}
            members: dict[int, list[int]] = {}
            for vid, cell in assign.items():
                members.setdefault(cell, []).append(vidx[vid])
            for cell, idxs in members.items():
                s = X[idxs].sum(axis=0, dtype=np.int64)
                new_cent[cell] = s // len(idxs)
            cent = new_cent
        # dfin/wmin: min over FINAL centroids, no assignment encoding
        wq = 0
        for vi in range(n_v):
            d2 = min(
                int(((X[vi] - cq) * (X[vi] - cq)).sum())
                for cq in cent.values()
            )
            wq += d2
        w[ds] = (n_v, wq)
    n, w_data = w[0]
    w_ref1 = w[1][1]
    w_ref2 = w[2][1]
    ratio = (float(w_ref1) * float(w_ref2)) / (
        float(w_data) * float(w_data)
    )
    return (n, w_data, w_ref1, w_ref2, ratio)
