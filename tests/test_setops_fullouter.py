"""setops (INTERSECT/EXCEPT) and full_outer_join_auto: SQL semantics
incl. NULL rows, both join plan tiers, and schema validation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from buteo_ray.stages.join_partitioned import full_outer_join_auto
from buteo_ray.stages.reshape import unpivot_longer
from buteo_ray.stages.setops import except_distinct, intersect_distinct


def _sides():
    a = rd.from_pandas(pd.DataFrame({
        "x": [1, 1, 2, 3, None], "y": ["a", "a", "b", "c", None],
    })).repartition(3)
    b = rd.from_pandas(pd.DataFrame({
        "x": [2, 3, 4, None], "y": ["b", "c", "d", None],
    })).repartition(2)
    return a, b


@pytest.mark.parametrize("driver_bytes", [64 << 20, 0])
def test_intersect_distinct_with_null_row(ray_session, driver_bytes):
    # driver_bytes=0 forces the distributed bucketed-fold tier
    a, b = _sides()
    got = (intersect_distinct(a, b, driver_bytes=driver_bytes)
           .to_pandas().sort_values("x").reset_index(drop=True))
    # SQL INTERSECT: NULLs compare NOT DISTINCT → the all-null row is
    # in both sides and appears once.
    assert len(got) == 3
    assert got["y"].dropna().tolist() == ["b", "c"]
    assert got["x"].isna().sum() == 1


@pytest.mark.parametrize("driver_bytes", [64 << 20, 0])
def test_except_distinct(ray_session, driver_bytes):
    a, b = _sides()
    got = except_distinct(a, b, driver_bytes=driver_bytes).to_pandas()
    assert got["y"].tolist() == ["a"]
    # deduped: 'a' appeared twice in the input, once in the result
    assert len(got) == 1


def test_intersect_schema_mismatch_raises(ray_session):
    a = rd.from_pandas(pd.DataFrame({"x": [1]}))
    b = rd.from_pandas(pd.DataFrame({"z": [1]}))
    with pytest.raises(ValueError, match="column names"):
        intersect_distinct(a, b)


def _join_data():
    left = pa.table({"k": pa.array([1, 2, 3, None], pa.int64()),
                     "v": pa.array([10, 20, 30, 40], pa.int64())})
    right = pa.table({"rk": pa.array([2, 3, 5], pa.int64()),
                      "name": pa.array(["b", "c", "e"])})
    return (rd.from_arrow(left).repartition(2),
            rd.from_arrow(right).repartition(2))


def _want_full_outer():
    # k carries COALESCE(left key, right key); null-key left row is
    # unmatched (NULL matches nothing), right key 5 pads a null-left row.
    return pd.DataFrame({
        "k": [1.0, 2.0, 3.0, np.nan, 5.0],
        "v": [10.0, 20.0, 30.0, 40.0, np.nan],
        "name": [None, "b", "c", None, "e"],
    })


@pytest.mark.parametrize("thr", [64 << 20, 0])
def test_full_outer_join_both_tiers(ray_session, thr):
    L, R = _join_data()
    got = (full_outer_join_auto(L, R, "k", "rk", broadcast_threshold=thr)
           .to_pandas().sort_values(["v", "k"], na_position="last")
           .reset_index(drop=True)[["k", "v", "name"]])
    pd.testing.assert_frame_equal(got, _want_full_outer(),
                                  check_dtype=False)


@pytest.mark.parametrize("thr", [64 << 20, 0])
def test_full_outer_join_matches_pandas_merge(ray_session, thr):
    rng = np.random.default_rng(7)
    lk = rng.integers(0, 40, 200)
    rk = rng.permutation(np.arange(60))[:35]  # unique right keys
    left = pd.DataFrame({"k": lk, "v": np.arange(200)})
    right = pd.DataFrame({"rk": rk, "w": rk * 10})
    got = (full_outer_join_auto(rd.from_pandas(left).repartition(4),
                                rd.from_pandas(right).repartition(3),
                                "k", "rk", broadcast_threshold=thr)
           .to_pandas())
    m = left.merge(right, left_on="k", right_on="rk", how="outer")
    m["k"] = m["k"].fillna(m["rk"])
    want = (m.drop(columns="rk").sort_values(["k", "v"])
            .reset_index(drop=True))
    got = (got.sort_values(["k", "v"]).reset_index(drop=True)
           [["k", "v", "w"]])
    pd.testing.assert_frame_equal(got, want[["k", "v", "w"]],
                                  check_dtype=False)


def test_unpivot_longer_roundtrip(ray_session):
    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "a": pa.array([1.5, None], pa.float64()),
                  "b": pa.array([3, 4], pa.int64())})
    got = (unpivot_longer(rd.from_arrow(t), ["id"], ["a", "b"])
           .to_pandas().sort_values(["id", "variable"])
           .reset_index(drop=True))
    assert len(got) == 4  # nulls kept (INCLUDE NULLS form)
    assert got["variable"].tolist() == ["a", "b", "a", "b"]
    # ints cast to the common float64 type
    assert got["value"].tolist()[1] == 3.0
    assert np.isnan(got["value"].tolist()[2])


def test_unpivot_empty_value_cols_raises(ray_session):
    t = rd.from_arrow(pa.table({"id": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError, match="non-empty"):
        unpivot_longer(t, ["id"], [])


def test_mode_by_group_tiebreak(ray_session):
    from buteo_ray.stages.aggregate import mode_by_group

    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 2, 2, 3],
        "v": ["b", "a", "b", "z", "y", "y", "z", None],
    })
    got = (mode_by_group(rd.from_pandas(df).repartition(3), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert got["mode_val"].tolist()[:2] == ["b", "y"]  # tie 2→smaller
    assert got["mode_n"].tolist() == [2, 2, 1]
    assert got["mode_val"].isna().tolist() == [False, False, True]


@pytest.mark.parametrize("seed", [0, 1])
def test_setops_match_duckdb_on_random_typed_data(ray_session, seed):
    import duckdb

    rng = np.random.default_rng(seed)

    def mk(n):
        return pd.DataFrame({
            "i": rng.integers(0, 5, n),
            "f": rng.choice([1.5, 2.5, np.nan], n),
            "s": rng.choice(["a", "b", None], n),
        })

    a, b = mk(60), mk(40)
    con = duckdb.connect()
    con.register("ta", a)
    con.register("tb", b)

    def canon(df):
        df = df.copy()
        return (df.sort_values(list(df.columns), na_position="last",
                               kind="stable").reset_index(drop=True))

    for op, fn in [("INTERSECT", intersect_distinct),
                   ("EXCEPT", except_distinct)]:
        want = con.execute(
            f"SELECT i, f, s FROM ta {op} SELECT i, f, s FROM tb"
        ).fetchdf()
        got = fn(rd.from_pandas(a).repartition(3),
                 rd.from_pandas(b).repartition(2)).to_pandas()
        pd.testing.assert_frame_equal(canon(got), canon(want),
                                      check_dtype=False)


def test_setops_type_mismatch_raises(ray_session):
    a = rd.from_arrow(pa.table({"x": pa.array([2], pa.int64())}))
    b = rd.from_arrow(pa.table({"x": pa.array([2.0], pa.float64())}))
    with pytest.raises(ValueError, match="types differ"):
        intersect_distinct(a, b)


def test_setops_driver_tier_keeps_int64_precision(ray_session):
    # int64-with-null → must NOT float64-degrade and merge 2^60, 2^60+1
    a = rd.from_arrow(pa.table({
        "x": pa.array([2**60, None], pa.int64())}))
    b = rd.from_arrow(pa.table({
        "x": pa.array([2**60 + 1], pa.int64())}))
    got = intersect_distinct(a, b).to_pandas()
    assert len(got) == 0  # distinct above 2^53 — no bogus match


def test_unpivot_mixed_int_widths_widen(ray_session):
    t = pa.table({"id": pa.array([1], pa.int64()),
                  "a": pa.array([7], pa.int32()),
                  "b": pa.array([2**40], pa.int64())})
    got = unpivot_longer(rd.from_arrow(t), ["id"], ["a", "b"]).to_pandas()
    assert sorted(got["value"].tolist()) == [7, 2**40]


def test_mode_by_group_int64_values_with_nulls(ray_session):
    from buteo_ray.stages.aggregate import mode_by_group

    df = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                   "v": pa.array([2**60, 2**60, None], pa.int64())})
    got = mode_by_group(rd.from_arrow(df), "k", "v").to_pandas()
    assert int(got["mode_val"].iloc[0]) == 2**60
    assert got["mode_n"].iloc[0] == 2


def test_full_outer_join_duplicate_right_keys(ray_session):
    # non-unique right keys force the shuffle tier even under the byte
    # gate (broadcast requires a dimension table); semantics must stay
    # full-outer with row multiplication on matches
    import duckdb

    left = pd.DataFrame({"k": [1, 2, 2, 9], "v": [10, 20, 21, 90]})
    right = pd.DataFrame({"rk": [2, 2, 3], "w": [100, 200, 300]})
    got = (full_outer_join_auto(rd.from_pandas(left).repartition(2),
                                rd.from_pandas(right).repartition(2),
                                "k", "rk").to_pandas())
    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = con.execute(
        "SELECT COALESCE(l.k, r.rk) AS k, l.v, r.w FROM l "
        "FULL JOIN r ON l.k = r.rk").fetchdf()
    key = ["k", "v", "w"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key, na_position="last").reset_index(drop=True),
        want[key].sort_values(key, na_position="last").reset_index(drop=True),
        check_dtype=False)


@pytest.mark.parametrize("seed", [3, 4])
def test_mode_by_group_matches_duckdb_random(ray_session, seed):
    import duckdb

    from buteo_ray.stages.aggregate import mode_by_group

    rng = np.random.default_rng(seed)
    df = pd.DataFrame({"k": rng.integers(0, 9, 300),
                       "v": rng.choice(["x", "y", "z", None], 300)})
    got = (mode_by_group(rd.from_pandas(df).repartition(4), "k", "v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT k, v AS mode_val, CAST(n AS BIGINT) AS mode_n FROM (
          SELECT k, v, COUNT(*) AS n,
                 ROW_NUMBER() OVER (PARTITION BY k
                   ORDER BY COUNT(*) DESC, v ASC) AS rn
          FROM t GROUP BY k, v) s WHERE rn = 1
        ORDER BY k""").fetchdf()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
