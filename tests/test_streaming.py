"""Streaming-shaped operators: sessions, tumbling + sliding windows."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


@pytest.fixture
def events_df():
    base = pd.Timestamp("2024-01-01")
    rows = []
    # user 1: two sessions (gap 45min between event 2 and 3)
    for i, mins in enumerate([0, 10, 20, 65, 70]):
        rows.append({"event_id": i, "user_id": 1, "ts": base + pd.Timedelta(minutes=mins), "value": 1.0})
    # user 2: one session
    for i, mins in enumerate([5, 15]):
        rows.append({"event_id": 10 + i, "user_id": 2, "ts": base + pd.Timedelta(minutes=mins), "value": 2.0})
    return pd.DataFrame(rows)


def test_sessionize(ray_session, events_df):
    import ray.data as rd

    from buteo_ray.stages.streaming import sessionize

    out = sessionize(rd.from_pandas(events_df)).to_pandas().sort_values("event_id")
    u1 = out[out["user_id"] == 1]["session_id"].tolist()
    assert u1 == [0, 0, 0, 1, 1]
    u2 = out[out["user_id"] == 2]["session_id"].tolist()
    assert u2 == [0, 0]


def test_session_stats(ray_session, events_df):
    import ray.data as rd

    from buteo_ray.stages.streaming import session_stats

    out = session_stats(rd.from_pandas(events_df)).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("session_id")
    assert u1["n_events"].tolist() == [3, 2]
    assert u1["duration_sec"].tolist() == [1200.0, 300.0]


def test_tumbling_window(ray_session, events_df):
    import ray.data as rd

    from buteo_ray.stages.streaming import tumbling_window

    out = tumbling_window(rd.from_pandas(events_df), window="1h",
                          keys=["user_id"]).to_pandas()
    u1 = out[out["user_id"] == 1].sort_values("window_id")
    assert u1["n_events"].tolist() == [3, 2]


def test_sliding_window(ray_session, events_df):
    import ray.data as rd

    from buteo_ray.stages.streaming import sliding_window_counts

    out = sliding_window_counts(rd.from_pandas(events_df), window="1h",
                                slide="30min", keys=["user_id"]).to_pandas()
    # Every event is in exactly 2 overlapping 1h/30min windows.
    assert out[out["user_id"] == 1]["n_events"].sum() == 5 * 2
    assert out[out["user_id"] == 2]["n_events"].sum() == 2 * 2


def test_ewma_matches_naive_recurrence(ray_session):
    from buteo_ray.stages.streaming import ewma_by_key

    rng = np.random.default_rng(5)
    n = 400
    df = pd.DataFrame({
        "k": rng.integers(0, 7, n),
        "o": np.arange(n),
        "v": np.where(rng.random(n) < 0.15, np.nan,
                      rng.normal(0, 3, n)),
    })
    a = 0.25
    got = (ewma_by_key(rd.from_pandas(df).repartition(4), "k", ["o"],
                       "v", alpha=a)
           .to_pandas().sort_values("o").reset_index(drop=True))
    # naive per-row reference with the documented null rules
    state = {}
    want = []
    for _, row in df.iterrows():
        k, x = row["k"], row["v"]
        prev = state.get(k, np.nan)
        if np.isnan(x):
            y = prev
        elif np.isnan(prev):
            y = x
        else:
            y = a * x + (1.0 - a) * prev
        state[k] = y
        want.append(y)
    assert np.allclose(got["ewma"].to_numpy(), np.array(want),
                       equal_nan=True, rtol=0, atol=0)


def test_ewma_bad_alpha(ray_session):
    from buteo_ray.stages.streaming import ewma_by_key

    with pytest.raises(ValueError, match="alpha"):
        ewma_by_key(rd.from_pandas(pd.DataFrame({"k": [1], "o": [1],
                                                 "v": [1.0]})),
                    "k", ["o"], "v", alpha=0.0)


def test_cume_dist_ties_and_nulls(ray_session):
    from buteo_ray.stages.streaming import rank_stats

    df = pd.DataFrame({"k": [1, 1, 1, 1], "id": [0, 1, 2, 3],
                       "v": [5.0, 5.0, 1.0, np.nan]})
    got = (rank_stats(rd.from_pandas(df), "k", "v", cume_col="cd")
           .to_pandas().sort_values("id").reset_index(drop=True))
    # ORDER BY v: 1.0 (cd=1/4), 5.0 & 5.0 peers (cd=3/4), null last (cd=1)
    assert got["cd"].tolist() == [0.75, 0.75, 0.25, 1.0]


def test_ewma_null_carry_matches_duckdb_recursive(ray_session):
    import duckdb

    from buteo_ray.stages.streaming import ewma_by_key

    rng = np.random.default_rng(11)
    n = 120
    df = pd.DataFrame({
        "k": rng.integers(0, 4, n), "o": np.arange(n),
        "v": np.where(rng.random(n) < 0.3, np.nan, rng.normal(0, 2, n)),
    })
    got = (ewma_by_key(rd.from_pandas(df).repartition(3), "k", ["o"],
                       "v", alpha=0.3)
           .to_pandas().sort_values("o").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t0", df)
    want = con.execute("""
        WITH RECURSIVE s AS (
          SELECT k, o, v, ROW_NUMBER() OVER (PARTITION BY k ORDER BY o)
                 AS rn FROM t0),
        r AS (
          SELECT k, o, rn, v AS y FROM s WHERE rn = 1
          UNION ALL
          SELECT s.k, s.o, s.rn,
                 CASE WHEN s.v IS NULL THEN r.y
                      WHEN r.y IS NULL THEN s.v
                      ELSE 0.3 * s.v + (1.0 - 0.3) * r.y END
          FROM s JOIN r ON s.k = r.k AND s.rn = r.rn + 1)
        SELECT o, y FROM r ORDER BY o""").fetchdf()
    assert np.allclose(got["ewma"].to_numpy(), want["y"].to_numpy(),
                       equal_nan=True, rtol=0, atol=0)
