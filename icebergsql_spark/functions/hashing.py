"""Portable hash primitives.

Two hash families, selected per call:

- ``md5`` (default): bit-identical between Spark and the DuckDB oracle —
  every GATE query stays on md5 so the driver's hash comparison holds.
- ``xxhash64`` (opt-in production variant): Spark-native 8-byte bigint —
  a minhash signature/band value shuffles as one long instead of a 32-char
  hex string (~4× less shuffle width on the dedup paths, and bigint
  equi-join keys hash/compare faster than strings). No portable DuckDB
  twin, so it is validated by an invariant test (identical VERIFIED
  near-dup output on the fixture corpus — the exact-Jaccard rescore makes
  the final output hash-family-independent) rather than by the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def seeded_md5(col: Column | str, seed: int) -> Column:
    """The j-th independent hash function h_j(s) = md5('<j>:' || s) — the
    MinHash family's seeded hash."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat(F.lit(f"{seed}:"), c))


def seeded_hash(col: Column | str, seed: int, method: str = "md5") -> Column:
    """Seeded hash in the chosen family: md5 → hex string (oracle-
    portable), xxhash64 → bigint (narrow shuffle, JVM-native)."""
    c = F.col(col) if isinstance(col, str) else col
    if method == "md5":
        return F.md5(F.concat(F.lit(f"{seed}:"), c))
    if method == "xxhash64":
        return F.xxhash64(F.lit(seed), c)
    raise ValueError(f"unknown hash method {method!r} (md5|xxhash64)")


def combine_hash(cols: list[Column], method: str = "md5") -> Column:
    """Collapse several hash values into one band key."""
    if method == "md5":
        return F.md5(F.concat(*cols))
    if method == "xxhash64":
        return F.xxhash64(*cols)
    raise ValueError(f"unknown hash method {method!r} (md5|xxhash64)")


def hex_bit(hash_col: Column, j: int) -> Column:
    """Deterministic bit j of a hex digest: parity of the ascii code of its
    j-th hex char — portable to any SQL engine with ascii/substr."""
    return F.ascii(F.substring(hash_col, j + 1, 1)) % 2


def hash_bit(hash_col: Column, j: int, method: str = "md5") -> Column:
    """Bit j of a hash in either family (0/1 int column)."""
    if method == "md5":
        return hex_bit(hash_col, j)
    if method == "xxhash64":
        return F.shiftright(hash_col, j).bitwiseAND(F.lit(1)).cast("int")
    raise ValueError(f"unknown hash method {method!r} (md5|xxhash64)")
