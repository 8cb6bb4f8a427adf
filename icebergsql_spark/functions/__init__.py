"""Reusable column-level functions (the engine's `F`-style namespace).

Shared primitives used across operators and query plans. Everything here is
a pure Catalyst column expression (JVM-side, whole-stage-codegen friendly) —
no UDFs, no driver actions — and every hash/float construct is chosen to be
bit-identical in the DuckDB oracle (md5/ascii/substr; sequential aggregate()
folds, NOT pairwise/numpy summation — see CLAUDE.md float-determinism rules).
"""

from icebergsql_spark.functions.vector import (
    cosine_expr,
    dot_expr,
    signbit_bucket,
    with_double_vec_and_norm,
)
from icebergsql_spark.functions.hashing import hex_bit, seeded_md5

__all__ = [
    "cosine_expr",
    "dot_expr",
    "signbit_bucket",
    "with_double_vec_and_norm",
    "hex_bit",
    "seeded_md5",
]
