"""Property test: file pruning NEVER changes results.

For any predicate, scan(where=p) ≡ full-scan → filter(p). This is the
invariant that makes manifest/stats pruning safe to apply everywhere
(IceTableScanExec's contract in the reference — pruning only skips files
that provably contain no matching rows)."""

from __future__ import annotations

import pytest

from icebergsql_spark.table import Catalog
from tests.store_sales_fixture import COLUMN_DEPENDENCIES, SCHEMA_DDL, build_store_sales_df

PREDICATES = [
    "ss_sold_date_sk = '0906245'",
    "ss_sold_date_sk != '0906245'",
    "ss_sold_date_sk IN ('0905245', '0907245')",
    "ss_item_sk < 5000",
    "ss_item_sk >= 5000 AND ss_sold_date_sk = '0908245'",
    "ss_item_sk BETWEEN 4000 AND 6000",
    "ss_sold_month = '09' AND ss_sold_day = '0910'",
    "ss_sold_date_sk = '0906245' OR ss_item_sk > 17000",
    "NOT ss_sold_date_sk = '0905245'",
    "NOT (ss_item_sk < 17990)",
    "ss_quantity IS NOT NULL",
    "ss_sold_date_sk IS NULL",
    "ss_sold_date_sk > '0907'",
    "ss_item_sk = 123456",  # matches nothing
    "ss_wholesale_cost < 10.5",  # decimal col without footer bounds
    # LIKE family — regression for the round-1 unsoundness where a degraded
    # LIKE under NOT pruned every file (ADVICE.md high):
    "ss_sold_date_sk LIKE '0906%'",        # pure prefix → exact range pruning
    "NOT ss_sold_date_sk LIKE '0906%'",
    "ss_sold_date_sk LIKE '%245'",         # suffix → Residual, no pruning
    "NOT ss_sold_date_sk LIKE '%245'",
    "NOT (ss_sold_date_sk LIKE '%245')",
    "ss_sold_date_sk LIKE '0906245'",      # wildcard-free → equality
    "NOT (ss_item_sk < 5000 AND ss_sold_date_sk LIKE '09_62%')",
]


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    catalog = Catalog(spark, str(tmp_path_factory.mktemp("wh_sound")))
    tbl = catalog.create_table(
        "sound", SCHEMA_DDL, partition_cols=["ss_sold_date_sk"],
        properties={"columnDependencies": COLUMN_DEPENDENCIES},
    )
    tbl.insert(build_store_sales_df(spark))
    return tbl


@pytest.mark.parametrize("pred", PREDICATES)
def test_pruned_scan_equals_filtered_full_scan(spark, table, pred):
    full = table.scan()  # no predicate → all files
    expected = sorted(
        tuple(r) for r in full.dataframe().filter(pred).collect()
    )
    scan = table.scan(where=pred)
    got = sorted(tuple(r) for r in scan.dataframe().collect())
    assert got == expected
    assert scan.files_scanned <= full.files_scanned


def test_like_prefix_actually_prunes(table):
    """Prefix LIKE converts to a string range and skips files, it doesn't
    just stay sound."""
    full = table.scan().files_scanned
    scan = table.scan(where="ss_sold_date_sk LIKE '0906%'")
    assert 0 < scan.files_scanned < full


def test_not_nonprefix_like_scans_everything_but_returns_rows(table):
    """The ADVICE.md high bug: NOT over a degraded LIKE must not prune all
    files (previously returned 0 rows with files_scanned=0)."""
    scan = table.scan(where="NOT ss_sold_date_sk LIKE '%zzzz%'")
    assert scan.files_scanned == table.scan().files_scanned
    assert scan.dataframe().count() > 0
