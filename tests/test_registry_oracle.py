"""Every registered query must match its DuckDB oracle at sf0.001 — the
same gate the driver applies at sf0.01 (kept at the smoke scale here so the
full suite stays fast)."""

import duckdb
import pandas as pd
import pytest

from simple_cdc_service_spark.registry import REGISTRY
from simple_cdc_service_spark.sources.tables import TABLES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def oracle():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    yield con
    con.close()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", [n for n, s in REGISTRY.items() if s.oracle])
def test_matches_oracle(spark, oracle, name):
    spec = REGISTRY[name]
    got = _norm(spec.fn(spark, SF_DIR).toPandas())
    want = _norm(oracle.execute(spec.oracle).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        a, b = got[c], want[c]
        assert (a.astype(str) == b.astype(str)).all(), f"column {c} differs"


@pytest.mark.parametrize("name", [n for n, s in REGISTRY.items() if not s.oracle])
def test_rows_only_runs(spark, name):
    df = REGISTRY[name].fn(spark, SF_DIR)
    assert df.count() >= 0
