"""Driver-contract consistency (no Spark needed): every query has an
oracle, every oracle is a single well-formed SQL string over the
pre-registered views, and DuckDB can PARSE and PLAN each one (catches
SQL drift without paying a full execution)."""

import duckdb
import pytest

import __spark_entry__ as entrymod

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]
SF = "/root/testdata/sf0.001"


def test_every_query_has_an_oracle():
    qs = set(entrymod.queries())
    os_ = set(entrymod.oracle_sql())
    assert qs == os_, f"mismatch: only-queries={qs - os_} only-oracles={os_ - qs}"
    assert len(qs) >= 34


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_oracle_sql_plans(con, name):
    sql = entrymod.oracle_sql()[name]
    # EXPLAIN parses + binds + plans (and rejects multi-statements)
    con.sql(f"EXPLAIN {sql}")
