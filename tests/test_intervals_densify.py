"""interval_cover and densify_days vs simple per-key reference
implementations — exact equality, including touching/nested/duplicate
intervals and pre-epoch timestamps."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from buteo_ray.stages.streaming import densify_days, interval_cover


def _ref_cover(rows):
    """Per-key O(n log n) merge with explicit loops."""
    byk = {}
    for k, lo, hi in rows:
        byk.setdefault(k, []).append((lo, hi))
    out = {}
    for k, ivs in byk.items():
        ivs.sort()
        islands = []
        for lo, hi in ivs:
            if islands and lo <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], hi)
            else:
                islands.append([lo, hi])
        out[k] = (len(ivs), len(islands),
                  sum(h - l for l, h in islands))
    return out


def test_interval_cover_matches_reference(ray_session):
    rng = np.random.default_rng(7)
    n = 3000
    keys = rng.integers(0, 40, n)
    lo = rng.integers(-1000, 1000, n)
    length = rng.integers(0, 50, n)
    rows = list(zip(keys.tolist(), lo.tolist(), (lo + length).tolist()))
    ds = rd.from_arrow(pa.table({
        "k": pa.array(keys, pa.int64()),
        "lo": pa.array(lo, pa.int64()),
        "hi": pa.array(lo + length, pa.int64())})).repartition(7)
    got = (interval_cover(ds, "k", "lo", "hi").to_pandas()
           .sort_values("k").reset_index(drop=True))
    want = _ref_cover(rows)
    assert list(got["k"]) == sorted(want)
    for _, r in got.iterrows():
        n_in, n_m, cov = want[r["k"]]
        assert (r["n_intervals"], r["n_merged"], r["covered"]) == \
            (n_in, n_m, cov), r["k"]


def test_interval_cover_touching_and_nested(ray_session):
    # [0,5] + [5,9] touch → one island; [1,3] nested → absorbed;
    # [20,20] zero-length island of length 0.
    ds = rd.from_arrow(pa.table({
        "k": pa.array([1] * 4, pa.int64()),
        "lo": pa.array([0, 5, 1, 20], pa.int64()),
        "hi": pa.array([5, 9, 3, 20], pa.int64())}))
    got = interval_cover(ds, "k", "lo", "hi").to_pandas()
    assert len(got) == 1
    assert int(got["n_intervals"][0]) == 4
    assert int(got["n_merged"][0]) == 2
    assert int(got["covered"][0]) == 9


def _us(day: int, sec: int = 0) -> int:
    return day * 86400 * 10**6 + sec * 10**6


def test_densify_days_fills_gaps(ray_session):
    # user 1: days 3,3,6 → rows for 3,4,5,6 with counts 2,0,0,1.
    # user 2: pre-epoch day -2 .. day 1 (floor-div correctness).
    ts = ([_us(3, 10), _us(3, 20), _us(6)]
          + [_us(-2, 5), _us(1, 86000)])
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us"))})).repartition(3)
    got = (densify_days(ds, "user_id").to_pandas()
           .sort_values(["user_id", "day"]).reset_index(drop=True))
    u1 = got[got["user_id"] == 1]
    assert list(u1["day"]) == [3, 4, 5, 6]
    assert list(u1["n_events"]) == [2, 0, 0, 1]
    u2 = got[got["user_id"] == 2]
    assert list(u2["day"]) == [-2, -1, 0, 1]
    assert list(u2["n_events"]) == [1, 0, 0, 1]


def test_densify_days_matches_pandas_reference(ray_session):
    rng = np.random.default_rng(11)
    n = 2000
    uid = rng.integers(0, 25, n)
    day = rng.integers(-5, 60, n)
    sec = rng.integers(0, 86400, n)
    ts = (day * 86400 + sec) * 10**6
    ds = rd.from_arrow(pa.table({
        "user_id": pa.array(uid, pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us"))})).repartition(5)
    got = (densify_days(ds, "user_id").to_pandas()
           .sort_values(["user_id", "day"]).reset_index(drop=True))
    df = pd.DataFrame({"user_id": uid, "day": day})
    parts = []
    for k, g in df.groupby("user_id"):
        full = np.arange(g["day"].min(), g["day"].max() + 1)
        cnt = g.groupby("day").size().reindex(full, fill_value=0)
        parts.append(pd.DataFrame({"user_id": k, "day": full,
                                   "n_events": cnt.to_numpy()}))
    want = pd.concat(parts, ignore_index=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
