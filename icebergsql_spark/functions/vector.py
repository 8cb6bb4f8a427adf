"""Vector math over array columns — fixed-order folds, JVM-side.

Float determinism contract: every reduction is a SEQUENTIAL ``aggregate()``
fold so results are bit-identical across engines and partitionings (DuckDB's
``list_sum`` folds the same way; numpy's pairwise summation does NOT and
must never replace these in an oracle-checked path).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cosine_expr(a: str, b: str, dims: int) -> Column:
    """Cosine of two double-array columns with a FIXED sequential fold, so
    the float result is bit-identical across engines/partitionings."""
    dot = F.expr(
        f"aggregate(transform(sequence(1, {dims}),"
        f" i -> cast(element_at({a}, i) as double) * cast(element_at({b}, i) as double)),"
        " cast(0 as double), (acc, x) -> acc + x)"
    )
    na = F.expr(
        f"aggregate(transform(sequence(1, {dims}),"
        f" i -> cast(element_at({a}, i) as double) * cast(element_at({a}, i) as double)),"
        " cast(0 as double), (acc, x) -> acc + x)"
    )
    nb = F.expr(
        f"aggregate(transform(sequence(1, {dims}),"
        f" i -> cast(element_at({b}, i) as double) * cast(element_at({b}, i) as double)),"
        " cast(0 as double), (acc, x) -> acc + x)"
    )
    return dot / F.sqrt(na * nb)


def with_double_vec_and_norm(
    df: DataFrame, vec_col: str, vd: str = "vd", nrm: str = "nrm"
) -> DataFrame:
    """Precompute the double-cast vector and its squared norm ONCE per row.

    In a pairwise join this turns O(pairs·3·dims) work into O(rows·2·dims)
    precompute + O(pairs·dims) dot products — the difference between 12s and
    ~1s at 500 vectors, and the only viable shape at 10^8 vectors. The
    addition/multiplication sequence is identical to the inline form, so
    results stay bit-equal to the oracle's per-pair formula.

    The interpreted-HOF math is CPU-bound, so the input is spread across
    cores first when the scan produced fewer splits than the cluster has
    (no-op at corpus scale — see ensure_parallelism)."""
    from icebergsql_spark.operators.util import ensure_parallelism

    df = ensure_parallelism(df)
    return df.withColumn(
        vd, F.expr(f"transform({vec_col}, x -> cast(x as double))")
    ).withColumn(
        nrm,
        F.expr(f"aggregate({vd}, cast(0 as double), (acc, x) -> acc + x * x)"),
    )


def dot_expr(va: str, vb: str) -> Column:
    """Sequential-fold dot product of two pre-cast double arrays."""
    return F.expr(
        f"aggregate(zip_with({va}, {vb}, (x, y) -> x * y),"
        " cast(0 as double), (acc, x) -> acc + x)"
    )


def signbit_bucket(vec_col: str, n_bits: int = 6) -> Column:
    """LSH bucket id from the signs of the first n_bits dimensions —
    axis-aligned random projection (dims are i.i.d., so leading dims are as
    good as random hyperplanes and need no shared random state).

    ``n_bits=0`` is the degenerate single-bucket id (every row maps to
    0) — it turns the bucketed BLAS scorer into a global all-pairs
    candidate generator for the small-n exact baselines."""
    if n_bits == 0:
        return F.lit(0).cast("int")
    bit_terms = [
        F.when(F.expr(f"element_at({vec_col}, {i + 1})") >= 0, 2**i).otherwise(0)
        for i in range(n_bits)
    ]
    out = bit_terms[0]
    for t in bit_terms[1:]:
        out = out + t
    return out.cast("int")
