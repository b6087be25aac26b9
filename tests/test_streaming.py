"""Streaming-shaped operators: sessions, tumbling + sliding windows."""

import numpy as np
import pandas as pd
import pytest


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
