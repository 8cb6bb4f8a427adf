"""Partition transforms with Iceberg semantics.

Re-expresses the reference's transform surface (parsed by
/root/reference/src/main/scala/org/apache/spark/sql/iceberg/utils/
Transforms.scala:46-110 from the `columnDependencies` table option, applied
by ColumnDependenciesExprVisitor.scala:47-66): ``identity``, ``truncate[W]``,
``bucket[N]``, ``year``, ``month``, ``day``, ``hour`` per the Iceberg 0.6.3
spec. Each transform knows how to

  - ``apply(value)``    — compute the transformed value, and
  - ``project(op, v)``  — inclusively project a source predicate to a
                          predicate on the transformed column (the derived
                          predicate machinery of the reference; see
                          IceTableScanExec.scala:68-74).

Projection rules (standard Iceberg inclusive projection):
  - eq  → eq(T(v)); in → in(T(v)…)          (all transforms)
  - lt/le → le(T(v)); gt/ge → ge(T(v))      (order-preserving transforms
                                             only — everything but bucket)
Bucket projects equality only (hash destroys order).

Temporal transforms produce integers: year → calendar year, month →
(year*12 + month-1), day → epoch days, hour → epoch hours. These are
monotonic in the source timestamp, which is all projection needs.
"""

from __future__ import annotations

import datetime as _dt
import struct
from dataclasses import dataclass
from decimal import Decimal

# ------------------------------------------------------------- murmur3 ----
# Pure-python murmur3_x86_32 (public algorithm, Austin Appleby) — used for
# bucket[N]. Iceberg hashes int/long as the little-endian 8 bytes of the
# long value, strings as UTF-8 bytes.


def murmur3_32(data: bytes, seed: int = 0) -> int:
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n_blocks = len(data) // 4
    for i in range(n_blocks):
        k = struct.unpack_from("<I", data, i * 4)[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[n_blocks * 4 :]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h


def _bucket_hash(value) -> int:
    if isinstance(value, bool):
        raise TypeError("bucket transform does not support boolean")
    if isinstance(value, int):
        data = struct.pack("<q", value)
    elif isinstance(value, str):
        data = value.encode("utf-8")
    elif isinstance(value, bytes):
        data = value
    elif isinstance(value, _dt.datetime):
        micros = int(value.replace(tzinfo=_dt.timezone.utc).timestamp() * 1_000_000)
        data = struct.pack("<q", micros)
    elif isinstance(value, _dt.date):
        days = (value - _dt.date(1970, 1, 1)).days
        data = struct.pack("<q", days)
    else:
        raise TypeError(f"bucket transform unsupported for {type(value)}")
    return murmur3_32(data)


def _to_dt(value) -> _dt.datetime:
    if isinstance(value, _dt.datetime):
        return value
    if isinstance(value, _dt.date):
        return _dt.datetime(value.year, value.month, value.day)
    if isinstance(value, str):
        return _dt.datetime.fromisoformat(value.replace(" ", "T"))
    raise TypeError(f"cannot interpret {value!r} as a timestamp")


EPOCH = _dt.datetime(1970, 1, 1)

ORDER_PRESERVING_PROJECTIONS = {
    "=": "=",
    "<": "<=",
    "<=": "<=",
    ">": ">=",
    ">=": ">=",
}


@dataclass(frozen=True)
class Transform:
    name: str

    def apply(self, value):
        raise NotImplementedError

    @property
    def preserves_order(self) -> bool:
        return True

    def project(self, op: str, value) -> tuple[str, object] | None:
        """Inclusive projection of ``srcCol <op> value`` onto the transformed
        column; None when the predicate cannot be projected."""
        if op == "=":
            return ("=", self.apply(value))
        if not self.preserves_order:
            return None
        mapped = ORDER_PRESERVING_PROJECTIONS.get(op)
        if mapped is None:
            return None
        return (mapped, self.apply(value))


@dataclass(frozen=True)
class Identity(Transform):
    def apply(self, value):
        return value


@dataclass(frozen=True)
class Truncate(Transform):
    width: int

    def apply(self, value):
        w = self.width
        if isinstance(value, str):
            return value[:w]
        if isinstance(value, bytes):
            return value[:w]
        if isinstance(value, bool):
            raise TypeError("truncate does not support boolean")
        if isinstance(value, int):
            return value - (value % w)  # floor semantics, negatives included
        if isinstance(value, Decimal):
            unscaled = int(value.scaleb(-value.as_tuple().exponent))
            scale = -value.as_tuple().exponent
            truncated = unscaled - (unscaled % w)
            return Decimal(truncated).scaleb(-scale)
        raise TypeError(f"truncate unsupported for {type(value)}")


@dataclass(frozen=True)
class Bucket(Transform):
    n: int

    @property
    def preserves_order(self) -> bool:
        return False

    def apply(self, value):
        return (_bucket_hash(value) & 0x7FFFFFFF) % self.n


@dataclass(frozen=True)
class Year(Transform):
    def apply(self, value):
        return _to_dt(value).year


@dataclass(frozen=True)
class Month(Transform):
    def apply(self, value):
        dt = _to_dt(value)
        return dt.year * 12 + (dt.month - 1)


@dataclass(frozen=True)
class Day(Transform):
    def apply(self, value):
        return (_to_dt(value) - EPOCH).days


@dataclass(frozen=True)
class Hour(Transform):
    def apply(self, value):
        return int((_to_dt(value) - EPOCH).total_seconds() // 3600)


def parse_transform(text: str) -> Transform:
    """Parse ``identity | truncate[W] | bucket[N] | year | month | day | hour``
    (grammar of the reference's Transforms.fromOption, Transforms.scala:46-110).
    """
    t = text.strip().lower()
    simple = {
        "identity": Identity("identity"),
        "year": Year("year"),
        "month": Month("month"),
        "day": Day("day"),
        "hour": Hour("hour"),
    }
    if t in simple:
        return simple[t]
    for prefix, cls in (("truncate", Truncate), ("bucket", Bucket)):
        if t.startswith(prefix + "[") and t.endswith("]"):
            arg = t[len(prefix) + 1 : -1]
            if not arg.isdigit() or int(arg) <= 0:
                raise ValueError(f"invalid {prefix} width in transform: {text!r}")
            if cls is Truncate:
                return Truncate("truncate", width=int(arg))
            return Bucket("bucket", n=int(arg))
    raise ValueError(f"unknown transform: {text!r}")
