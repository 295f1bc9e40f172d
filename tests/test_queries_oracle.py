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


def _arrow_types(result) -> dict[str, str]:
    """Column -> Arrow type of a query result, without re-executing a
    Dataset pipeline (schema() resolves from the lazy plan)."""
    if isinstance(result, pa.Table):
        return {f.name: str(f.type) for f in result.schema}
    if isinstance(result, pd.DataFrame):
        t = pa.Table.from_pandas(result, preserve_index=False)
        return {f.name: str(f.type) for f in t.schema}
    s = result.schema()  # ray Dataset
    return dict(zip(s.names, [str(t) for t in s.types]))


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
    result = QUERIES[name](SF_DIR)
    # dtype-strict BEFORE the value compare: the driver's value hash is
    # dtype-sensitive (r4's running_totals red row was int64 vs the
    # oracle's HUGEINT with identical values), while the pandas compare
    # below is not — without this check a dtype-only red can pass here
    # and fail the driver
    got_types = _arrow_types(result)
    want_types = {
        f.name: str(f.type) for f in duck.execute(ORACLES[name]).arrow().schema
    }
    assert got_types == want_types, (
        f"{name}: arrow dtypes differ (query vs oracle): "
        f"{ {c: (got_types.get(c), want_types.get(c)) for c in set(got_types) | set(want_types) if got_types.get(c) != want_types.get(c)} }"
    )
    got = _canon(_to_df(result))
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
