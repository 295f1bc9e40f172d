"""Mirror of the driver's correctness gate: run every queries() entry at
sf0.01 (the driver's gate scale — the tokens-corpus oracles read the
scale-1.0 parquet that sf0.01 maps to) and compare against the DuckDB
oracle (row count + schema + order-insensitive values)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle_sql keys without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, duck, ray_session):
    got = _canon(_to_df(QUERIES[name](SF_DIR)))
    want = _canon(duck.execute(ORACLES[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, ray_session):
    result = QUERIES[name](SF_DIR)
    df = _to_df(result)
    assert len(df) >= 0
    assert len(df.columns) > 0


def test_entry_smoke(ray_session):
    out = entrymod.entry()
    df = _to_df(out)
    assert len(df) > 0
    assert set(df.columns) == {"doc_id", "tokens", "n_tok", "source"}
