"""Driver-contract validation: every ``queries()`` entry runs at sf0.01; the
SQL-expressible ones must match their ``oracle_sql()`` exactly (row count,
schema column set, order-insensitive values) — mimicking the driver's
CORRECTNESS gate."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * "
              f"FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _to_df(result) -> pd.DataFrame:
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    return result


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
        try:
            import numpy as np
            if isinstance(df[c].iloc[0] if len(df) else None, np.ndarray):
                df[c] = df[c].map(tuple)
        except Exception:
            pass
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_runs_and_matches_oracle(ray_session, con, name):
    q = entrymod.queries()[name]
    result = _to_df(q(SF_DIR))
    assert len(result) >= 0
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert len(result) > 0  # rows-only check
        return
    expected = con.sql(oracles[name]).df()
    got = _norm(result)
    exp = _norm(expected)
    assert list(got.columns) == list(exp.columns), \
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    assert len(got) == len(exp), f"{name}: {len(got)} rows != {len(exp)}"
    for c in got.columns:
        if str(exp[c].dtype) != str(got[c].dtype):
            try:
                exp[c] = exp[c].astype(got[c].dtype)
            except (TypeError, ValueError):
                pass
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_entry_smoke(ray_session):
    out = entrymod.entry()
    df = _to_df(out)
    assert len(df) > 0
    assert {"doc_id", "span_idx", "lat", "lng", "zone_id"} <= set(df.columns)
