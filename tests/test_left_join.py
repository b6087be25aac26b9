"""left_join_auto: broadcast tier ≡ shuffle tier ≡ pandas LEFT merge,
plus the null-key rule, empty-side short-circuits and collision
suffixing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from buteo_ray.stages.join_partitioned import left_join_auto


def _data():
    rng = np.random.default_rng(31)
    left = pd.DataFrame({
        "k": rng.integers(0, 30, 500),
        "v": np.arange(500, dtype=np.int64)})
    right = pd.DataFrame({
        "rk": np.arange(0, 20, dtype=np.int64),  # keys 20..29 unmatched
        "name": [f"n{i}" for i in range(20)],
        "w": np.linspace(0, 1, 20)})
    return left, right


def _want(left, right):
    m = left.merge(right, left_on="k", right_on="rk", how="left")
    return (m.drop(columns="rk").sort_values(["v"])
            .reset_index(drop=True))


def _got(out):
    return (out.to_pandas().sort_values(["v"])
            .reset_index(drop=True)[["k", "v", "name", "w"]])


def test_left_join_broadcast_matches_pandas(ray_session):
    left, right = _data()
    out = left_join_auto(rd.from_pandas(left).repartition(4),
                         rd.from_pandas(right), "k", "rk")
    pd.testing.assert_frame_equal(_got(out), _want(left, right),
                                  check_dtype=False)


def test_left_join_shuffle_tier_matches_broadcast(ray_session):
    left, right = _data()
    out = left_join_auto(rd.from_pandas(left).repartition(4),
                         rd.from_pandas(right).repartition(3),
                         "k", "rk", broadcast_threshold=0)
    pd.testing.assert_frame_equal(_got(out), _want(left, right),
                                  check_dtype=False)


def test_left_join_null_key_matches_nothing(ray_session):
    left = pa.table({"k": pa.array([1, None, 2], pa.int64()),
                     "v": pa.array([0, 1, 2], pa.int64())})
    right = pa.table({"rk": pa.array([1, 2], pa.int64()),
                      "name": pa.array(["a", "b"])})
    got = (left_join_auto(rd.from_arrow(left), rd.from_arrow(right),
                          "k", "rk").to_pandas()
           .sort_values("v").reset_index(drop=True))
    assert got["name"].tolist()[0] == "a"
    assert pd.isna(got["name"].tolist()[1])
    assert got["name"].tolist()[2] == "b"


def test_left_join_empty_right_pads_nulls(ray_session):
    left = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                   "v": pa.array([0, 1], pa.int64())}))
    right = rd.from_arrow(pa.table({
        "rk": pa.array([], pa.int64()),
        "name": pa.array([], pa.string())}))
    got = left_join_auto(left, right, "k", "rk").to_pandas()
    assert len(got) == 2 and got["name"].isna().all()
    # empty LEFT → empty result with the joined schema
    eleft = rd.from_arrow(pa.table({"k": pa.array([], pa.int64()),
                                    "v": pa.array([], pa.int64())}))
    r2 = rd.from_arrow(pa.table({"rk": pa.array([1], pa.int64()),
                                 "name": pa.array(["a"])}))
    empty = left_join_auto(eleft, r2, "k", "rk")
    assert empty.count() == 0
    # Ray's to_pandas drops columns on a 0-row dataset; assert on the
    # Dataset schema instead.
    assert sorted(empty.schema().names) == ["k", "name", "v"]


def test_left_join_collision_requires_suffix(ray_session):
    left = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                   "name": pa.array(["L"])}))
    right = rd.from_arrow(pa.table({"rk": pa.array([1], pa.int64()),
                                    "name": pa.array(["R"])}))
    with pytest.raises(Exception, match="collides"):
        left_join_auto(left, right, "k", "rk").materialize()
    got = left_join_auto(left, right, "k", "rk",
                         right_suffix="_r").to_pandas()
    assert got["name"][0] == "L" and got["name_r"][0] == "R"


def test_semi_anti_join_tiers_match_pandas(ray_session):
    from buteo_ray.stages.join_partitioned import (anti_join_auto,
                                                   semi_join_auto)

    left, right = _data()
    lds = rd.from_pandas(left).repartition(4)
    rds = rd.from_pandas(right)
    match = left["k"].isin(right["rk"])
    want_semi = left[match].sort_values("v").reset_index(drop=True)
    want_anti = left[~match].sort_values("v").reset_index(drop=True)
    for thr in (64 << 20, 0):  # broadcast tier, then shuffle tier
        semi = (semi_join_auto(lds, rds, "k", "rk",
                               broadcast_threshold=thr).to_pandas()
                .sort_values("v").reset_index(drop=True))
        anti = (anti_join_auto(lds, rds, "k", "rk",
                               broadcast_threshold=thr).to_pandas()
                .sort_values("v").reset_index(drop=True))
        pd.testing.assert_frame_equal(semi[["k", "v"]], want_semi,
                                      check_dtype=False)
        pd.testing.assert_frame_equal(anti[["k", "v"]], want_anti,
                                      check_dtype=False)


def test_semi_anti_null_keys_and_empty_right(ray_session):
    from buteo_ray.stages.join_partitioned import (anti_join_auto,
                                                   semi_join_auto)

    left = rd.from_arrow(pa.table({"k": pa.array([1, None, 9], pa.int64()),
                                   "v": pa.array([0, 1, 2], pa.int64())}))
    right = rd.from_arrow(pa.table({"rk": pa.array([1, None], pa.int64())}))
    semi = semi_join_auto(left, right, "k", "rk").to_pandas()
    assert semi["v"].tolist() == [0]  # null never matches
    anti = (anti_join_auto(left, right, "k", "rk").to_pandas()
            .sort_values("v"))
    assert anti["v"].tolist() == [1, 2]  # null kept by anti
    eright = rd.from_arrow(pa.table({"rk": pa.array([], pa.int64())}))
    assert semi_join_auto(left, eright, "k", "rk").count() == 0
    assert anti_join_auto(left, eright, "k", "rk").count() == 3
