"""Portable hash primitives.

md5 + ascii + substr are the only hash building blocks used engine-wide,
chosen because they are bit-identical between Spark and the DuckDB oracle
(xxhash64 would be faster JVM-side but has no portable twin; the trade is
documented in VERDICT r1 and accepted).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def seeded_md5(col: Column | str, seed: int) -> Column:
    """The j-th independent hash function h_j(s) = md5('<j>:' || s) — the
    MinHash family's seeded hash."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat(F.lit(f"{seed}:"), c))


def hex_bit(hash_col: Column, j: int) -> Column:
    """Deterministic bit j of a hex digest: parity of the ascii code of its
    j-th hex char — portable to any SQL engine with ascii/substr."""
    return F.ascii(F.substring(hash_col, j + 1, 1)) % 2
