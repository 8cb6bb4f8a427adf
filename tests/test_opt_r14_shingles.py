"""Round-14 optimization lock: the hoisted-tokenization shingle rewrite.

The r14 optimization round hoisted ``split(trim(text), ' ')`` out of the
higher-order-function lambdas in ``dedup.word_shingles`` (and its copies in
``curation.passage_dedup_stats`` / ``curation.decontaminate``): Spark does
not subexpression-eliminate inside HOF lambdas, so the in-lambda form
re-tokenizes the document once per element — O(tokens²) per doc.  The
rewrite must be ROW-IDENTICAL to the original formulation (the DuckDB
oracles replay the original semantics), so this test pins the new operator
output against the old in-lambda expression on adversarial inputs:
empty text, repeated tokens, multiple/leading/trailing spaces, and docs
shorter than the shingle width.
"""

import pytest
from pyspark.sql import functions as F

from icebergsql_spark.operators import dedup

DOCS = [
    (0, "a b c d e"),
    (1, "a a a"),
    (2, ""),
    (3, "   x   y  "),
    (4, "solo"),
    (5, "b a c a b"),
    (6, "one two"),
]


def _old_shingles(df, n, text_col="text"):
    return df.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"transform(sequence(1, greatest(size(split(trim({text_col}), ' ')) - {n - 1}, 1)),"
                    f" i -> array_join(slice(split(trim({text_col}), ' '), i, {n}), ' '))"
                )
            )
        ).alias("shingle"),
    )


@pytest.mark.parametrize("n", [1, 2, 3])
def test_word_shingles_matches_old_formulation(spark, n):
    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    new = dedup.word_shingles(df, n=n)
    old = _old_shingles(df, n)
    assert new.columns == ["doc_id", "shingle"]
    assert sorted(map(tuple, new.collect())) == sorted(
        map(tuple, old.collect())
    )


def test_passage_dedup_hoist_matches_rows(spark):
    from icebergsql_spark.operators import curation

    df = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    out = curation.passage_dedup_stats(df, k=2).collect()
    # every doc keeps a row; n_passages = ceil(tokens/2) with the old
    # greatest(...,1) floor; dup accounting unchanged
    by_id = {r["doc_id"]: r for r in out}
    assert set(by_id) == {d for d, _ in DOCS}
    assert by_id[0]["n_passages"] == 3  # 'a b','c d','e'
    assert by_id[1]["n_passages"] == 2  # 'a a','a'
    assert by_id[4]["n_passages"] == 1


def test_decontaminate_hoist_matches_rows(spark):
    from icebergsql_spark.operators import curation

    corpus = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    bench = spark.createDataFrame(
        [(100, "a b c z")], "doc_id bigint, text string"
    )
    out = {
        r["doc_id"]: (r["hit_shingles"], r["contaminated"])
        for r in curation.decontaminate(corpus, bench, n=2).collect()
    }
    assert out[0] == (2, True)  # 'a b' and 'b c'
    assert out[6] == (0, False)
    assert set(out) == {d for d, _ in DOCS}
