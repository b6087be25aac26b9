"""weighted_bernoulli_sample / weighted_topk_per_group (A-ES) vs exact
replications of their hash formulas, and group_entropy vs a pandas
reference."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from buteo_ray.stages.aggregate import group_entropy
from buteo_ray.stages.dedup import _splitmix64
from buteo_ray.stages.selection import (weighted_bernoulli_sample,
                                        weighted_topk_per_group)


def _uniform(ids: np.ndarray) -> np.ndarray:
    return ((_splitmix64(ids.astype(np.uint64)) >> np.uint64(11))
            .astype(np.float64) * 2.0**-53)


def test_weighted_bernoulli_matches_formula(ray_session):
    rng = np.random.default_rng(3)
    ids = np.arange(5000, dtype=np.int64)
    p = rng.uniform(0, 1, ids.size)
    ds = rd.from_arrow(pa.table({"id": ids, "p": p})).repartition(6)
    got = np.sort(weighted_bernoulli_sample(ds, "id", "p")
                  .to_pandas()["id"].to_numpy())
    want = ids[_uniform(ids) < p]
    np.testing.assert_array_equal(got, want)
    # sanity: realized rate tracks the mean probability
    assert abs(got.size / ids.size - p.mean()) < 0.03


def test_weighted_bernoulli_edges(ray_session):
    ids = np.arange(2000, dtype=np.int64)
    ds0 = rd.from_arrow(pa.table({"id": ids, "p": np.zeros(ids.size)}))
    assert weighted_bernoulli_sample(ds0, "id", "p").count() == 0
    ds1 = rd.from_arrow(pa.table({"id": ids, "p": np.ones(ids.size)}))
    assert weighted_bernoulli_sample(ds1, "id", "p").count() == ids.size
    # null probability keeps nothing; null id raises
    dsn = rd.from_arrow(pa.table({"id": pa.array([1, 2], pa.int64()),
                                  "p": pa.array([None, 1.0])}))
    assert (weighted_bernoulli_sample(dsn, "id", "p")
            .to_pandas()["id"].tolist() == [2])
    dsbad = rd.from_arrow(pa.table({"id": pa.array([None], pa.int64()),
                                    "p": pa.array([1.0])}))
    with pytest.raises(Exception, match="null ids"):
        weighted_bernoulli_sample(dsbad, "id", "p").materialize()


def _ref_aes(df: pd.DataFrame, k: int):
    u = _uniform(df["id"].to_numpy(dtype=np.uint64))
    w = df["w"].to_numpy(dtype=np.float64)
    pri = np.where(w > 0, u ** (1.0 / np.where(w > 0, w, 1.0)), np.nan)
    d = df.assign(__pri=pri)
    d = d[~np.isnan(pri)]
    d = d.sort_values(["g", "__pri", "id"], ascending=[True, False, True])
    return d.groupby("g", sort=False).head(k).drop(columns="__pri")


def test_weighted_topk_matches_reference(ray_session):
    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame({
        "g": rng.integers(0, 25, n),
        "id": np.arange(n, dtype=np.int64),
        "w": np.round(rng.uniform(-0.5, 5.0, n), 3)})  # some w ≤ 0
    ds = rd.from_pandas(df).repartition(7)
    k = 6
    got = (weighted_topk_per_group(ds, "g", "id", "w", k).to_pandas()
           .sort_values(["g", "id"]).reset_index(drop=True))
    want = (_ref_aes(df, k).sort_values(["g", "id"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["g", "id", "w"]],
                                  want[["g", "id", "w"]])


def test_weighted_topk_small_groups_and_bias(ray_session):
    # Groups smaller than k come back whole; across many groups the
    # heavy item wins far more often than the light one.
    n_groups = 400
    rows = []
    for g in range(n_groups):
        rows += [(g, g * 10 + 0, 10.0), (g, g * 10 + 1, 0.1)]
    df = pd.DataFrame(rows, columns=["g", "id", "w"])
    ds = rd.from_pandas(df)
    whole = weighted_topk_per_group(ds, "g", "id", "w", 5).to_pandas()
    assert len(whole) == len(df)
    picked = weighted_topk_per_group(ds, "g", "id", "w", 1).to_pandas()
    heavy = (picked["id"] % 10 == 0).mean()
    assert heavy > 0.9
    with pytest.raises(ValueError):
        weighted_topk_per_group(ds, "g", "id", "w", 0)


def test_group_entropy_matches_reference(ray_session):
    rng = np.random.default_rng(9)
    n = 6000
    df = pd.DataFrame({"k": rng.integers(0, 30, n),
                       "c": rng.integers(0, 8, n).astype(str)})
    # one single-category key: entropy exactly 0, hhi exactly 1
    df = pd.concat([df, pd.DataFrame({"k": [99] * 5, "c": ["only"] * 5})],
                   ignore_index=True)
    ds = rd.from_pandas(df).repartition(6)
    got = (group_entropy(ds, "k", "c").to_pandas()
           .sort_values("k").reset_index(drop=True))

    cnt = df.groupby(["k", "c"]).size().rename("n").reset_index()
    tot = cnt.groupby("k")["n"].transform("sum")
    p = cnt["n"] / tot
    ref = (cnt.assign(pl=p * np.log(p), p2=p * p)
           .groupby("k")
           .agg(n=("n", "sum"), n_cats=("n", "size"),
                entropy=("pl", lambda s: -s.sum()),
                hhi=("p2", "sum"))
           .reset_index().sort_values("k").reset_index(drop=True))
    assert got["k"].tolist() == ref["k"].tolist()
    assert got["n"].tolist() == ref["n"].tolist()
    assert got["n_cats"].tolist() == ref["n_cats"].tolist()
    np.testing.assert_allclose(got["entropy"], ref["entropy"],
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(got["hhi"], ref["hhi"], rtol=0, atol=1e-12)
    one = got[got["k"] == 99].iloc[0]
    assert one["entropy"] == 0.0 and one["hhi"] == 1.0
