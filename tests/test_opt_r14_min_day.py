"""Round-14 optimization lock: footer-stat min-day == computed min-day.

``events_min_day`` answers the streaming fixtures' chunk-split anchor
(min epoch-day of events.ts) from parquet footer statistics instead of
a Spark scan+aggregate job.  This locks it against an independent
DuckDB computation of the same quantity at every SF.
"""

from __future__ import annotations

import duckdb
import pytest

from icebergsql_spark.plans.registry import events_min_day


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_footer_min_day_matches_duckdb(sf):
    path = f"/root/testdata/{sf}/events.parquet"
    con = duckdb.connect()
    expected = con.execute(
        "SELECT CAST(min(epoch_ns(ts)) // 86400000000000 AS BIGINT) "
        f"FROM parquet_scan('{path}')"
    ).fetchone()[0]
    assert events_min_day(path) == expected
