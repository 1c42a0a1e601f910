"""Every __spark_entry__ query vs its DuckDB oracle at sf0.001 — the
in-repo twin of the driver's CORRECTNESS gate (row count + columns +
order-insensitive values)."""

from __future__ import annotations

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

from fluent_server_spark.queries import all_queries  # noqa: E402
from scripts.check_entry import TABLES, compare  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


_SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(_SPECS))
def test_query_matches_oracle(spark, duck, name):
    spec = _SPECS[name]
    sdf = spec.fn(spark, SF_DIR).toPandas()
    if spec.sql is None:
        assert len(sdf) >= 0  # rows-only: semantics pinned elsewhere
        return
    ddf = duck.sql(spec.sql).df()
    err = compare(sdf, ddf)
    assert err is None, f"{name}: {err}"
