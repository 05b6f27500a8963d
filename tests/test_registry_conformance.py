"""In-repo replica of the driver's conformance gate (SURVEY.md §5.6):
every ``queries()`` entry with an ``oracle_sql()`` runs on sf0.001 and
must match DuckDB on row count, column names, and values (order-
insensitive, exact)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _as_df(res) -> pd.DataFrame:
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    return pd.DataFrame(res)


def _entries():
    from engine import registry

    qs = registry.queries()
    sqls = registry.oracle_sql()
    return [(n, qs[n], sqls.get(n)) for n in sorted(qs)]


@pytest.mark.parametrize("name", [n for n, _, _ in _entries()])
def test_entry_matches_oracle(name, ray_session, duck):
    from engine import registry

    fn = registry.queries()[name]
    sql = registry.oracle_sql().get(name)
    mine = _as_df(fn(SF))
    if sql is None:
        # rows-only contract: runs and returns a well-formed frame
        assert mine is not None
        return
    want = duck.sql(sql).df()
    a, b = _norm(mine), _norm(want)
    assert list(a.columns) == list(b.columns), \
        f"{name}: cols {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
    for c in a.columns:
        x, y = a[c].to_numpy(), b[c].to_numpy()
        if x.dtype.kind == "f" or y.dtype.kind == "f":
            assert np.array_equal(
                x.astype(np.float64), y.astype(np.float64)), \
                f"{name}: float col {c} differs"
        else:
            assert (pd.Series(x).astype(str)
                    == pd.Series(y).astype(str)).all(), \
                f"{name}: col {c} differs"


def test_registry_contract_consistency():
    """Every oracle key has a queries() entry; names unique; every
    callable takes exactly one positional arg (sf_dir)."""
    import inspect

    from engine import registry

    qs = registry.queries()
    sqls = registry.oracle_sql()
    assert set(sqls) <= set(qs), sorted(set(sqls) - set(qs))
    for name, fn in qs.items():
        sig = inspect.signature(fn)
        req = [p for p in sig.parameters.values()
               if p.default is inspect.Parameter.empty
               and p.kind in (p.POSITIONAL_ONLY,
                              p.POSITIONAL_OR_KEYWORD)]
        assert len(req) == 1, (name, sig)
