"""Unit tests: transforms, predicate parser, stats-based pruning decisions."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest
from hypothesis import given, strategies as st

from icebergsql_spark.catalog.metadata import ColStats
from icebergsql_spark.deps import (
    ColumnDependencyError,
    augment_predicate,
    parse_column_dependencies,
)
from icebergsql_spark.expressions import (
    AlwaysTrue,
    And,
    Comparison,
    In,
    IsNull,
    NotNull,
    Not,
    Or,
    Residual,
    may_match,
    must_match_all,
    parse_predicate,
    parse_predicate_lenient,
)
from icebergsql_spark.transforms import (
    Bucket,
    Truncate,
    murmur3_32,
    parse_transform,
)


class TestTransforms:
    def test_truncate_string_reference_example(self):
        # the known example from SURVEY.md §7: truncate[2]('0906245') == '09'
        t = parse_transform("truncate[2]")
        assert t.apply("0906245") == "09"
        assert parse_transform("truncate[4]").apply("0906245") == "0906"

    def test_truncate_int_floor_semantics(self):
        t = parse_transform("truncate[10]")
        assert t.apply(37) == 30
        assert t.apply(-3) == -10  # floor, not trunc-toward-zero
        assert t.apply(Decimal("12.37")) == Decimal("12.30")

    def test_temporal(self):
        ts = dt.datetime(2024, 3, 15, 13, 45)
        assert parse_transform("year").apply(ts) == 2024
        assert parse_transform("month").apply(ts) == 2024 * 12 + 2
        assert parse_transform("day").apply(ts) == (ts - dt.datetime(1970, 1, 1)).days
        assert parse_transform("hour").apply(ts) == int(
            (ts - dt.datetime(1970, 1, 1)).total_seconds() // 3600
        )

    def test_murmur3_known_vectors(self):
        # public murmur3_x86_32 test vectors (seed 0)
        assert murmur3_32(b"") == 0
        assert murmur3_32(b"hello") == 0x248BFA47

    def test_bucket_range_and_stability(self):
        b = Bucket("bucket", n=16)
        vals = [b.apply(i) for i in range(1000)]
        assert all(0 <= v < 16 for v in vals)
        assert b.apply(42) == b.apply(42)
        assert b.apply("abc") == b.apply("abc")

    @given(st.integers(min_value=-(2**40), max_value=2**40), st.integers(1, 1000))
    def test_truncate_int_property(self, v, w):
        r = Truncate("truncate", width=w).apply(v)
        assert r <= v < r + w and r % w == 0

    def test_projection(self):
        t = parse_transform("truncate[2]")
        assert t.project("=", "0906245") == ("=", "09")
        assert t.project("<", "0906245") == ("<=", "09")
        assert t.project(">=", "0906245") == (">=", "09")
        b = parse_transform("bucket[8]")
        assert b.project("=", 5) == ("=", b.apply(5))
        assert b.project("<", 5) is None  # bucket destroys order

    def test_parse_errors(self):
        for bad in ("truncate[0]", "truncate[x]", "bucket[]", "wat"):
            with pytest.raises(ValueError):
                parse_transform(bad)


class TestPredicateParser:
    def test_shapes(self):
        p = parse_predicate("a = 1 AND (b < 2.5 OR c IN ('x','y')) AND d IS NOT NULL")
        assert isinstance(p, And)
        flat = repr(p)
        assert "Comparison(op='='" in flat and "In(col='c'" in flat

    def test_literals(self):
        p = parse_predicate("ts >= TIMESTAMP '2024-01-01 00:00:00'")
        assert p == Comparison(">=", "ts", dt.datetime(2024, 1, 1))
        p = parse_predicate("d = DATE '2024-06-01'")
        assert p == Comparison("=", "d", dt.date(2024, 6, 1))
        p = parse_predicate("s = 'it''s'")
        assert p == Comparison("=", "s", "it's")

    def test_between_not_null(self):
        p = parse_predicate("x BETWEEN 3 AND 7")
        assert p == And(Comparison(">=", "x", 3), Comparison("<=", "x", 7))
        assert parse_predicate("x IS NULL") == IsNull("x")
        assert parse_predicate("NOT x > 5") == Not(Comparison(">", "x", 5))

    def test_literal_on_left_flip(self):
        # reference's operand flip (ExpressionConversions.scala:47-58)
        assert parse_predicate("5 < x") == Comparison(">", "x", 5)
        assert parse_predicate("5 >= x") == Comparison("<=", "x", 5)
        assert parse_predicate("'a' = s") == Comparison("=", "s", "a")

    def test_null_safe_eq(self):
        assert parse_predicate("x <=> 5") == Comparison("=", "x", 5)

    def test_strict_vs_lenient(self):
        with pytest.raises(ValueError):
            parse_predicate("name LIKE '%foo%'")
        # lenient degrades the unsupported leaf to Residual (NOT-safe),
        # keeping the prunable part
        p = parse_predicate_lenient("a = 1 AND name LIKE '%foo%'")
        assert p == And(Comparison("=", "a", 1), Residual("name"))

    def test_like_prefix_is_a_range(self):
        # startsWith ⟺ half-open range [prefix, prefix+1)
        p = parse_predicate("name LIKE 'foo%'")
        assert p == And(Comparison(">=", "name", "foo"), Comparison("<", "name", "fop"))
        assert parse_predicate("name LIKE 'exact'") == Comparison("=", "name", "exact")
        assert parse_predicate_lenient("name NOT LIKE '%x%'") == Not(Residual("name"))

    def test_residual_is_sound_under_not(self):
        # ADVICE.md high: Not(degraded) must never prune
        st_ = _stats(name=("a", "z", 0, 10))
        assert may_match(Not(Residual("name")), st_)
        assert not must_match_all(Residual("name"), st_)


def _stats(**cols):
    return {c: ColStats(*v) for c, v in cols.items()}


class TestStatsPruning:
    def test_range_pruning(self):
        st_ = _stats(x=(10, 20, 0, 100))
        assert may_match(parse_predicate("x = 15"), st_)
        assert not may_match(parse_predicate("x = 25"), st_)
        assert not may_match(parse_predicate("x > 20"), st_)
        assert may_match(parse_predicate("x >= 20"), st_)
        assert not may_match(parse_predicate("x < 10"), st_)
        assert may_match(parse_predicate("x IN (1, 12)"), st_)
        assert not may_match(parse_predicate("x IN (1, 2)"), st_)

    def test_null_pruning(self):
        no_nulls = _stats(x=(1, 5, 0, 10))
        all_nulls = {"x": ColStats(None, None, 10, 10)}
        assert not may_match(IsNull("x"), no_nulls)
        assert may_match(NotNull("x"), no_nulls)
        assert may_match(IsNull("x"), all_nulls)
        assert not may_match(NotNull("x"), all_nulls)
        assert not may_match(parse_predicate("x = 3"), all_nulls)

    def test_and_or_not(self):
        st_ = _stats(x=(10, 20, 0, 100), y=(0, 1, 0, 100))
        assert not may_match(parse_predicate("x = 15 AND y = 5"), st_)
        assert may_match(parse_predicate("x = 99 OR y = 1"), st_)
        # NOT x < 30: every row has x in [10,20] < 30 ⇒ no row matches
        assert not may_match(parse_predicate("NOT x < 30"), st_)
        assert may_match(parse_predicate("NOT x < 15"), st_)

    def test_unknown_column_never_prunes(self):
        assert may_match(parse_predicate("zzz = 1"), _stats(x=(1, 2, 0, 5)))


class TestColumnDependencies:
    SCHEMA = ["ss_sold_date_sk", "ss_sold_month", "ss_sold_day", "ss_item_sk"]

    def test_parse_reference_option(self):
        deps = parse_column_dependencies(
            "ss_sold_date_sk=ss_sold_month:truncate[2], "
            "ss_sold_date_sk=ss_sold_day:truncate[4]",
            self.SCHEMA,
        )
        assert set(deps["ss_sold_date_sk"]) == {"ss_sold_month", "ss_sold_day"}

    def test_validation_errors_aggregate(self):
        with pytest.raises(ColumnDependencyError) as ei:
            parse_column_dependencies(
                "nope=ss_sold_month:truncate[2], ss_sold_date_sk=bad:wat[2]",
                self.SCHEMA,
            )
        msg = str(ei.value)
        assert "nope" in msg and "bad" in msg and "wat" in msg

    def test_augment_derives_reference_example(self):
        deps = parse_column_dependencies(
            "ss_sold_date_sk=ss_sold_month:truncate[2]", self.SCHEMA
        )
        p = augment_predicate(parse_predicate("ss_sold_date_sk = '0906245'"), deps)
        assert p == And(
            Comparison("=", "ss_sold_date_sk", "0906245"),
            Comparison("=", "ss_sold_month", "09"),
        )

    def test_augment_inside_or_branches(self):
        deps = parse_column_dependencies(
            "ss_sold_date_sk=ss_sold_month:truncate[2]", self.SCHEMA
        )
        p = augment_predicate(
            parse_predicate("ss_sold_date_sk = '0906245' OR ss_item_sk = 1"), deps
        )
        assert isinstance(p, Or)
        assert p.left == And(
            Comparison("=", "ss_sold_date_sk", "0906245"),
            Comparison("=", "ss_sold_month", "09"),
        )
