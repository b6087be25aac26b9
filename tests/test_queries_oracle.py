"""Driver-style correctness gate, run locally at sf0.001: every queries()
entry vs its oracle_sql() via DuckDB — row count, column names, and
order-insensitive value equality (mirrors the driver's value-hash)."""

import duckdb
import pandas as pd
import pytest

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], bytes):
            df[c] = df[c].map(lambda b: b.hex())
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.fixture(scope="module")
def duck(sf_dir_module):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir_module}/{t}.parquet')")
    return con


@pytest.fixture(scope="module")
def sf_dir_module():
    import os

    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _query_names():
    from buteo_ray.pipelines.queries import ORACLE_SQL, QUERIES

    assert set(ORACLE_SQL) <= set(QUERIES)
    return sorted(ORACLE_SQL)


@pytest.mark.parametrize("name", _query_names())
def test_query_matches_oracle(name, ray_session, duck, sf_dir_module):
    from buteo_ray.pipelines.queries import ORACLE_SQL, QUERIES

    ours = _canon(_to_pandas(QUERIES[name](sf_dir_module)))
    theirs = _canon(duck.execute(ORACLE_SQL[name]).fetchdf())

    assert list(ours.columns) == list(theirs.columns), f"{name}: column mismatch"
    assert len(ours) == len(theirs), f"{name}: row count {len(ours)} vs {len(theirs)}"
    pd.testing.assert_frame_equal(ours, theirs, check_dtype=False, check_exact=True)


def test_entry_smoke(ray_session):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    entry_mod = importlib.import_module("__ray_entry__")
    res = entry_mod.entry()
    n = res.count()
    assert n >= 0
    schema = res.schema()
    for col in ["doc_id", "text", "lat", "lon", "cell_r5", "aoi_id", "tile_x", "tile_y"]:
        assert col in schema.names, col
