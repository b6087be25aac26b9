"""winsorize_by_group (exact quantile_disc thresholds + clip) and
pareto_front (skyline) vs brute-force/pandas references."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from buteo_ray.stages.selection import pareto_front, winsorize_by_group


def _disc_q(v, q):
    v = np.sort(np.asarray(v))
    n = len(v)
    r = -(-int(round(q * 10000)) * n // 10000)  # ⌈q·n⌉ exactly
    return v[r - 1]


def test_winsorize_matches_reference(ray_session):
    rng = np.random.default_rng(3)
    df = pd.DataFrame({"g": rng.integers(0, 4, 500),
                       "v": rng.normal(0, 10, 500).round(2)})
    got = (winsorize_by_group(rd.from_pandas(df).repartition(4),
                              "g", "v", 0.1, 0.9)
           .to_pandas().sort_values(["g", "v"]).reset_index(drop=True))
    for g, sub in got.groupby("g"):
        src = df.loc[df["g"] == g, "v"]
        lo, hi = _disc_q(src, 0.1), _disc_q(src, 0.9)
        assert (sub["q_lo"] == lo).all() and (sub["q_hi"] == hi).all()
        want = src.clip(lo, hi).sort_values().to_numpy()
        assert np.allclose(np.sort(sub["v_w"].to_numpy()), want)


def test_winsorize_null_values_pass_through(ray_session):
    t = pa.table({"g": pa.array([1, 1, 1, 1], pa.int64()),
                  "v": pa.array([1.0, None, 100.0, 2.0], pa.float64())})
    got = (winsorize_by_group(rd.from_arrow(t), "g", "v", 0.25, 0.75)
           .to_pandas())
    assert got["v_w"].isna().sum() == 1  # the null row stays null


def test_winsorize_bad_quantiles(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"g": [1], "v": [1.0]}))
    with pytest.raises(ValueError, match="decimals"):
        winsorize_by_group(ds, "g", "v", q_lo=0.123456)
    with pytest.raises(ValueError, match="q_lo"):
        winsorize_by_group(ds, "g", "v", q_lo=0.9, q_hi=0.1)


def _brute_front(vals):
    n = len(vals)
    keep = np.ones(n, bool)
    for i in range(n):
        for j in range(n):
            if i != j and (vals[j] >= vals[i]).all() \
                    and (vals[j] > vals[i]).any():
                keep[i] = False
                break
    return keep


@pytest.mark.parametrize("d", [2, 3])
def test_pareto_front_matches_brute_force(ray_session, d):
    rng = np.random.default_rng(d)
    vals = rng.integers(0, 8, (120, d)).astype(float)
    df = pd.DataFrame(vals, columns=[f"c{i}" for i in range(d)])
    got = (pareto_front(rd.from_pandas(df).repartition(5),
                        list(df.columns)).to_pandas())
    want = df[_brute_front(vals)]
    key = lambda fr: sorted(map(tuple, fr.to_numpy().tolist()))  # noqa: E731
    assert key(got) == key(want)  # duplicates of front points kept


def test_pareto_front_duplicates_and_distinct(ray_session):
    df = pd.DataFrame({"x": [5.0, 5.0, 1.0, 5.0],
                       "y": [2.0, 2.0, 9.0, 1.0]})
    got = pareto_front(rd.from_pandas(df), ["x", "y"]).to_pandas()
    assert len(got) == 3  # both (5,2) copies + (1,9); (5,1) dominated
    got_d = pareto_front(rd.from_pandas(df), ["x", "y"],
                         distinct=True).to_pandas()
    assert len(got_d) == 2


def test_pareto_front_rejects_nan(ray_session):
    df = pd.DataFrame({"x": [1.0, np.nan], "y": [2.0, 3.0]})
    with pytest.raises(Exception, match="NaN"):
        pareto_front(rd.from_pandas(df), ["x", "y"]).to_pandas()


def test_winsorize_all_null_group_int_column(ray_session):
    # an all-null group's NaN thresholds must become Arrow nulls, not
    # crash the int64 cast; its rows pass through unclipped
    t = pa.table({"g": pa.array([1, 1, 2, 2], pa.int64()),
                  "v": pa.array([1, 100, None, None], pa.int64())})
    got = (winsorize_by_group(rd.from_arrow(t), "g", "v", 0.25, 0.75)
           .to_pandas().sort_values(["g"]).reset_index(drop=True))
    assert got.loc[got["g"] == 2, "v_w"].isna().all()
    assert got.loc[got["g"] == 2, "q_lo"].isna().all()


def test_group_quantiles_cont_edges(ray_session):
    from buteo_ray.stages.aggregate import group_quantiles_cont

    t = pa.table({"g": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
                  "v": pa.array([10.0, 20.0, 30.0, 40.0, None, None])})
    got = (group_quantiles_cont(rd.from_arrow(t), "g", "v",
                                [0.0, 0.5, 1.0])
           .to_pandas().sort_values("g").reset_index(drop=True))
    row1 = got.iloc[0]
    assert row1["q0"] == 10.0 and row1["q100"] == 40.0
    assert row1["q50"] == 25.0  # interpolated median, even count
    assert got.iloc[1][["q0", "q50", "q100"]].isna().all()

    with pytest.raises(ValueError, match="outside"):
        group_quantiles_cont(rd.from_arrow(t), "g", "v", [1.5])


@pytest.mark.parametrize("seed", [2, 5])
def test_winsorize_matches_duckdb_random(ray_session, seed):
    import duckdb

    rng = np.random.default_rng(seed)
    df = pd.DataFrame({"g": rng.integers(0, 6, 400),
                       "v": rng.normal(0, 5, 400).round(3)})
    got = (winsorize_by_group(rd.from_pandas(df).repartition(4),
                              "g", "v", 0.05, 0.95)
           .to_pandas().sort_values(["g", "v"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("""
        SELECT t.g, t.v,
               LEAST(GREATEST(t.v, q.q_lo), q.q_hi) AS v_w,
               q.q_lo, q.q_hi
        FROM t JOIN (SELECT g, quantile_disc(v, 0.05) AS q_lo,
                            quantile_disc(v, 0.95) AS q_hi
                     FROM t GROUP BY g) q USING (g)
        ORDER BY g, v""").fetchdf()
    pd.testing.assert_frame_equal(
        got[["g", "v", "v_w", "q_lo", "q_hi"]].reset_index(drop=True),
        want.reset_index(drop=True), check_dtype=False)


def test_winsorize_approx_tier_within_bin_width(ray_session):
    from buteo_ray.stages.selection import winsorize_by_group

    rng = np.random.default_rng(8)
    df = pd.DataFrame({"g": rng.integers(0, 3, 600),
                       "v": rng.normal(0, 10, 600)})
    exact = (winsorize_by_group(rd.from_pandas(df).repartition(3),
                                "g", "v", 0.1, 0.9)
             .to_pandas().drop_duplicates("g").sort_values("g"))
    apx = (winsorize_by_group(rd.from_pandas(df).repartition(3),
                              "g", "v", 0.1, 0.9, approx=True)
           .to_pandas().drop_duplicates("g").sort_values("g"))
    for g in range(3):
        lo, hi = df.loc[df["g"] == g, "v"].agg(["min", "max"])
        bin_w = (hi - lo) / 4096
        e = exact.loc[exact["g"] == g].iloc[0]
        a = apx.loc[apx["g"] == g].iloc[0]
        # approx is a lower bound of quantile_disc, within one bin
        assert e["q_lo"] - bin_w <= a["q_lo"] <= e["q_lo"] + 1e-12
        assert e["q_hi"] - bin_w <= a["q_hi"] <= e["q_hi"] + 1e-12


def test_winsorize_approx_int_column_and_equal_quantiles(ray_session):
    t = pa.table({"g": pa.array([0] * 40 + [1] * 40, pa.int64()),
                  "v": pa.array(list(range(40)) + list(range(100, 140)),
                                pa.int64())})
    # int value column + approx tier: fractional bin-edge thresholds
    # must round into the clip interval, not crash the int cast
    got = (winsorize_by_group(rd.from_arrow(t), "g", "v", 0.1, 0.9,
                              approx=True).to_pandas())
    assert got["v_w"].notna().all()
    assert (got["v_w"] >= got["q_lo"]).all()
    assert (got["v_w"] <= got["q_hi"]).all()
    # q_lo == q_hi (clip to a single quantile) must work in approx mode
    got2 = (winsorize_by_group(rd.from_arrow(t), "g", "v", 0.5, 0.5,
                               approx=True).to_pandas())
    assert (got2["q_lo"] == got2["q_hi"]).all()
    assert got2.groupby("g")["v_w"].nunique().tolist() == [1, 1]


def test_approx_quantile_exact_rank_boundary(ray_session):
    # q*n float boundary: q=0.05, n=20 → exact-rational rank 1, while
    # float ceil(0.05*20)=ceil(1.0000000000000002)=2 — the approx rank
    # must use the rational rule (here every value is its own bin, so
    # the quantile equals the exact quantile_disc value)
    from buteo_ray.stages.sketch import approx_quantile_by_group

    df = pd.DataFrame({"g": [0] * 20, "v": np.arange(20, dtype=float)})
    got = approx_quantile_by_group(rd.from_pandas(df), ["g"], "v",
                                   [0.05]).to_pandas()
    # rank 1 → first value (0.0); the old float rank would give ~1.0
    assert got["q_0.05"].iloc[0] == 0.0


def test_approx_quantile_null_group_key(ray_session):
    from buteo_ray.stages.sketch import approx_quantile_by_group

    t = pa.table({"g": pa.array([1, 1, None, None], pa.int64()),
                  "v": pa.array([1.0, 3.0, 10.0, 30.0], pa.float64())})
    got = (approx_quantile_by_group(rd.from_arrow(t), ["g"], "v",
                                    [1.0]).to_pandas())
    # the NULL-keyed group has real values — its max quantile must be
    # computed (≈30 within a bin), not silently NaN
    nullrow = got[got["g"].isna()]
    assert len(nullrow) == 1 and np.isfinite(nullrow["q_1.0"].iloc[0])
    assert nullrow["q_1.0"].iloc[0] >= 10.0
