from __future__ import annotations

import os

import pytest

from selium_spark import StreamCatalog, get_spark

SF_DIR = os.environ.get("SELIUM_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE_DIR = os.environ.get("SELIUM_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="selium_spark_tests", cpus=8, shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def catalog(spark):
    cat = StreamCatalog(spark)
    cat.register_testdata(SF_DIR)
    return cat


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in StreamCatalog.TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    return con


def assert_df_matches_duck(spark_df, duck_con, sql, round_decimals=9):
    """Order-insensitive compare of a Spark DataFrame vs a DuckDB query
    (the driver's correctness-gate protocol: sorted rows, columns sorted
    by name, doubles rounded)."""
    import math

    cols = sorted(spark_df.columns)
    s_rows = [tuple(r[c] for c in cols) for r in spark_df.collect()]
    d_df = duck_con.sql(sql).df()
    assert sorted(cols) == sorted(d_df.columns.tolist()), (
        f"column mismatch: spark={sorted(spark_df.columns)} duck={sorted(d_df.columns.tolist())}"
    )
    d_rows = [tuple(row[c] for c in cols) for _, row in d_df.iterrows()]

    def canon(rows):
        out = []
        for row in rows:
            vals = []
            for v in row:
                if isinstance(v, float):
                    if math.isnan(v):
                        vals.append("nan")
                    else:
                        vals.append(round(v, round_decimals))
                elif hasattr(v, "isoformat"):
                    vals.append(v.isoformat())
                elif isinstance(v, (list, tuple)):
                    vals.append(tuple(v))
                else:
                    vals.append(v)
            out.append(tuple(vals))
        return sorted(out, key=repr)

    sc, dc = canon(s_rows), canon(d_rows)
    assert len(sc) == len(dc), f"row count: spark={len(sc)} duck={len(dc)}"
    for i, (a, b) in enumerate(zip(sc, dc)):
        assert a == b, f"row {i} differs:\n  spark={a}\n  duck ={b}"


@pytest.fixture(scope="session")
def spark_h(spark):
    """Alias fixture for hypothesis tests (function-scoped @given can't
    take the session fixture name directly in older plugin combos)."""
    return spark
