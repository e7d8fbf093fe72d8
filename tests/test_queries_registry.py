"""Registry-wide guards: every query runs at sf0.001 with a stable schema,
every oracle is valid DuckDB SQL, and names/columns line up — the cheap
full-coverage net under the per-query differential tests that
tools/verify_local.py (and the driver) run at sf0.01."""

from __future__ import annotations

import duckdb
import pytest

from etl_cloud_logistics_spark.queries import REGISTRY, _load_all

_load_all()


@pytest.fixture(scope="module")
def duck(sf_small):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_small}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_runs_small(spark, sf_small, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_small)
    assert df.schema.fields, f"{name}: empty schema"
    assert df.count() >= 0


@pytest.mark.parametrize("name", sorted(n for n, s in REGISTRY.items() if s.oracle))
def test_oracle_parses_and_columns_match(spark, sf_small, duck, name):
    spec = REGISTRY[name]
    oracle_cols = [d[0] for d in duck.execute(spec.oracle).description]
    spark_cols = spec.fn(spark, sf_small).columns
    assert sorted(oracle_cols) == sorted(spark_cols), f"{name}: column drift"
