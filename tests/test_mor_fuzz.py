"""Model-based fuzz of the merge-on-read stack.

Hypothesis drives random sequences of DML + maintenance ops against a
managed table whose delete/update/merge modes are ALL merge-on-read, and a
30-line in-memory dict model computes the expected key→value state. After
the sequence, the table's live rows must equal the model exactly, the
metadata COUNT fast path must agree whenever it claims decidability, and a
final convert+rewrite maintenance pass must be a no-op on contents — the
invariant web (position-subtracted DV counts, strict-seq equality masking,
live-read rewrites) holds under arbitrary interleavings, not just the
scenarios the unit tests pick.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings, strategies as st

from icebergsql_spark.table import Catalog

DDL = "k bigint, v bigint, part int"

_op = st.one_of(
    st.tuples(st.just("insert"), st.integers(0, 3)),
    st.tuples(st.just("mor_delete"), st.integers(2, 5), st.integers(0, 4)),
    st.tuples(
        st.just("delete_keys"), st.lists(st.integers(0, 79), max_size=6)
    ),
    st.tuples(
        st.just("upsert"),
        st.lists(st.integers(0, 99), max_size=6),
        st.integers(-5, 5),
    ),
    st.tuples(
        st.just("update"), st.integers(2, 5), st.integers(0, 4), st.integers(1, 9)
    ),
    st.tuples(st.just("compact")),
    st.tuples(st.just("rewrite_dv")),
    st.tuples(st.just("convert_eq")),
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=1, max_size=6), seed=st.integers(0, 3))
def test_mor_random_op_sequences_match_model(spark, tmp_path_factory, ops, seed):
    cat = Catalog(
        spark, str(tmp_path_factory.mktemp("wh_fuzz"))
    )
    tbl = cat.create_table(
        f"t_fuzz_{seed}",
        DDL,
        partition_cols=["part"],
        properties={
            "write.delete.mode": "merge-on-read",
            "write.update.mode": "merge-on-read",
            "write.merge.mode": "merge-on-read",
        },
    )
    base = list(range(seed * 7, seed * 7 + 40))
    tbl.insert(
        spark.createDataFrame(
            [(k, k * 2, k % 2) for k in base], DDL
        )
    )
    model: dict[int, int] = {k: k * 2 for k in base}
    next_new = 1000

    for op in ops:
        kind = op[0]
        if kind == "insert":
            newk = [next_new + i for i in range(op[1] + 1)]
            next_new += len(newk)
            tbl.insert(
                spark.createDataFrame([(k, k * 3, k % 2) for k in newk], DDL)
            )
            model.update({k: k * 3 for k in newk})
        elif kind == "mor_delete":
            _, mod, rem = op
            tbl.delete_where(f"k % {mod} = {rem}")
            model = {k: v for k, v in model.items() if k % mod != rem}
        elif kind == "delete_keys":
            keys = sorted(set(op[1]))
            if not keys:
                continue
            tbl.delete_by_keys(
                spark.createDataFrame([(k,) for k in keys], "k bigint"), ["k"]
            )
            for k in keys:
                model.pop(k, None)
        elif kind == "upsert":
            _, keys, val = op
            keys = sorted(set(keys))
            if not keys:
                continue
            tbl.upsert_by_keys(
                spark.createDataFrame(
                    [(k, val, k % 2) for k in keys], DDL
                ),
                ["k"],
            )
            for k in keys:
                model[k] = val
        elif kind == "update":
            _, mod, rem, delta = op
            tbl.update_where({"v": f"v + {delta}"}, f"k % {mod} = {rem}")
            for k in list(model):
                if k % mod == rem:
                    model[k] += delta
        elif kind == "compact":
            tbl.compact(min_input_files=2)
        elif kind == "rewrite_dv":
            tbl.rewrite_position_deletes()
        elif kind == "convert_eq":
            tbl.convert_equality_deletes()

    got = {
        r["k"]: r["v"] for r in tbl.to_df().select("k", "v").collect()
    }
    assert got == model
    cfs = tbl.scan().count_from_stats()
    if cfs is not None:
        assert cfs == len(model)
    # maintenance must never change contents
    tbl.convert_equality_deletes()
    tbl.rewrite_position_deletes()
    got2 = {
        r["k"]: r["v"] for r in tbl.to_df().select("k", "v").collect()
    }
    assert got2 == model
    assert tbl.scan().count_from_stats() == len(model)
