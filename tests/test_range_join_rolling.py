"""Range join (both tiers) and rolling row-window vs brute-force
pandas oracles on randomized inputs (fixed seeds)."""

import numpy as np
import pandas as pd
import pytest


def _brute_range_join(probe: pd.DataFrame, intervals: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, p in probe.iterrows():
        if pd.isna(p["__ts"]):
            continue
        hit = intervals[(intervals["__lo"] <= p["__ts"]) &
                        (p["__ts"] < intervals["__hi"])]
        for _, i in hit.iterrows():
            rows.append({**p.to_dict(), **i.to_dict()})
    cols = list(probe.columns) + list(intervals.columns)
    return pd.DataFrame(rows, columns=cols)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].astype("float64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.fixture
def rj_frames():
    rng = np.random.default_rng(42)
    n_p, n_i = 300, 60
    probe = pd.DataFrame({
        "pid": np.arange(n_p, dtype=np.int64),
        "__ts": rng.integers(0, 10_000, n_p).astype(np.int64),
    })
    lo = rng.integers(0, 10_000, n_i).astype(np.int64)
    # Variable durations spanning 1..2500 ticks: some intervals cross
    # several max-duration cells' worth of probes, some are empty-width.
    dur = rng.integers(1, 2_500, n_i).astype(np.int64)
    intervals = pd.DataFrame({
        "iid": np.arange(n_i, dtype=np.int64),
        "__lo": lo,
        "__hi": lo + dur,
    })
    return probe, intervals


@pytest.mark.parametrize("mode,cell_width", [
    ("broadcast", None),
    ("partitioned", None),       # width derived = max duration
    ("partitioned", 100),        # tiny width → up to 25-cell replication
    ("partitioned", 1_000_000),  # huge width → everything in few cells
])
def test_range_join_matches_brute_force(ray_session, rj_frames, mode,
                                        cell_width):
    import ray.data as rd

    from buteo_ray.stages.range_join import range_join

    probe, intervals = rj_frames
    out = range_join(rd.from_pandas(probe), rd.from_pandas(intervals),
                     "__ts", "__lo", "__hi", mode=mode,
                     cell_width=cell_width).to_pandas()
    want = _brute_range_join(probe, intervals)
    assert len(want) > 100  # the fixture must actually exercise matches
    pd.testing.assert_frame_equal(_canon(out), _canon(want))


@pytest.mark.parametrize("mode", ["broadcast", "partitioned"])
def test_range_join_negative_ticks(ray_session, mode):
    """Ticks spanning zero: numpy floor-division cells and searchsorted
    bounds must stay exact for negative timestamps (pre-epoch dates)."""
    import ray.data as rd

    from buteo_ray.stages.range_join import range_join

    rng = np.random.default_rng(3)
    probe = pd.DataFrame({
        "pid": np.arange(200, dtype=np.int64),
        "__ts": rng.integers(-5_000, 5_000, 200).astype(np.int64),
    })
    lo = rng.integers(-5_000, 5_000, 40).astype(np.int64)
    intervals = pd.DataFrame({
        "iid": np.arange(40, dtype=np.int64),
        "__lo": lo,
        "__hi": lo + rng.integers(1, 1_500, 40).astype(np.int64),
    })
    out = range_join(rd.from_pandas(probe), rd.from_pandas(intervals),
                     "__ts", "__lo", "__hi", mode=mode).to_pandas()
    want = _brute_range_join(probe, intervals)
    assert len(want) > 20
    pd.testing.assert_frame_equal(_canon(out), _canon(want))


@pytest.mark.parametrize("mode", ["broadcast", "partitioned"])
def test_range_join_null_bounds_never_match(ray_session, mode):
    import ray.data as rd

    from buteo_ray.stages.range_join import range_join

    probe = pd.DataFrame({"pid": [1, 2, 3],
                          "__ts": pd.array([5, None, 7], dtype="Int64")})
    intervals = pd.DataFrame({"iid": [10, 11],
                              "__lo": pd.array([0, None], dtype="Int64"),
                              "__hi": pd.array([100, None], dtype="Int64")})
    out = range_join(rd.from_pandas(probe), rd.from_pandas(intervals),
                     "__ts", "__lo", "__hi", mode=mode).to_pandas()
    assert sorted(out["pid"].tolist()) == [1, 3]
    assert set(out["iid"]) == {10}


@pytest.mark.parametrize("mode", ["broadcast", "partitioned"])
def test_range_join_empty_interval_side(ray_session, mode):
    import ray.data as rd

    from buteo_ray.stages.range_join import range_join

    probe = pd.DataFrame({"pid": [1], "__ts": np.array([5], dtype=np.int64)})
    intervals = pd.DataFrame({
        "iid": np.array([], dtype=np.int64),
        "__lo": np.array([], dtype=np.int64),
        "__hi": np.array([], dtype=np.int64),
    })
    out = range_join(rd.from_pandas(probe), rd.from_pandas(intervals),
                     "__ts", "__lo", "__hi", mode=mode)
    # Dataset schema keeps the full joined layout (Ray's to_pandas()
    # drops columns on fully-empty datasets, so assert on the schema).
    assert set(out.schema().names) == {"pid", "__ts", "iid", "__lo", "__hi"}
    assert out.count() == 0


@pytest.mark.parametrize("mode", ["broadcast", "partitioned"])
def test_range_join_inverted_intervals_never_match(ray_session, mode):
    """hi <= lo can never satisfy lo <= ts < hi: dropped on entry in
    both tiers (the broadcast tier's max-duration arithmetic would
    otherwise go negative and crash candidate expansion)."""
    import ray.data as rd

    from buteo_ray.stages.range_join import range_join

    probe = pd.DataFrame({"pid": [1, 2],
                          "__ts": np.array([20, 5], dtype=np.int64)})
    intervals = pd.DataFrame({
        "iid": np.array([10, 11, 12], dtype=np.int64),
        "__lo": np.array([22, 7, 0], dtype=np.int64),
        "__hi": np.array([15, 7, 100], dtype=np.int64),  # two inverted/empty
    })
    out = range_join(rd.from_pandas(probe), rd.from_pandas(intervals),
                     "__ts", "__lo", "__hi", mode=mode).to_pandas()
    assert sorted(out["pid"].tolist()) == [1, 2]
    assert set(out["iid"]) == {12}


def test_range_join_rejects_mixed_tick_units(ray_session):
    """timestamp[ns] probe vs int64 bounds (and mismatched timestamp
    units) must raise, not silently return an empty join."""
    import ray.data as rd

    from buteo_ray.stages.range_join import range_join

    probe = pd.DataFrame({"pid": [1],
                          "__ts": [pd.Timestamp("2024-01-01")]})
    intervals = pd.DataFrame({"iid": np.array([1], dtype=np.int64),
                              "__lo": np.array([0], dtype=np.int64),
                              "__hi": np.array([10], dtype=np.int64)})
    with pytest.raises(ValueError, match="tick domain"):
        range_join(rd.from_pandas(probe), rd.from_pandas(intervals),
                   "__ts", "__lo", "__hi")


def test_range_join_partitioned_rejects_reserved_columns(ray_session):
    """A user column named __cell/__side would be silently overwritten
    by the partitioned tier's routing columns — must raise instead."""
    import ray.data as rd

    from buteo_ray.stages.range_join import range_join

    probe = pd.DataFrame({"pid": [1], "__ts": np.array([5], dtype=np.int64),
                          "__cell": [9]})
    intervals = pd.DataFrame({"iid": np.array([1], dtype=np.int64),
                              "__lo": np.array([0], dtype=np.int64),
                              "__hi": np.array([10], dtype=np.int64)})
    with pytest.raises(ValueError, match="routing columns"):
        range_join(rd.from_pandas(probe), rd.from_pandas(intervals),
                   "__ts", "__lo", "__hi", mode="partitioned").count()


def test_range_join_rejects_shared_columns(ray_session):
    import ray.data as rd

    from buteo_ray.stages.range_join import range_join

    df = pd.DataFrame({"x": [1], "__ts": np.array([0], dtype=np.int64),
                       "__lo": np.array([0], dtype=np.int64),
                       "__hi": np.array([1], dtype=np.int64)})
    with pytest.raises(ValueError, match="disjoint"):
        range_join(rd.from_pandas(df), rd.from_pandas(df),
                   "__ts", "__lo", "__hi")


def _brute_rolling(df: pd.DataFrame, preceding: int) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts", "event_id"],
                        kind="stable").reset_index(drop=True)
    means, sums, ns = [], [], []
    for _, g in df.groupby("user_id", sort=False):
        v = g["value"].to_numpy()
        for i in range(len(v)):
            w = v[max(0, i - preceding): i + 1]
            w = w[~np.isnan(w)]
            means.append(w.mean() if len(w) else np.nan)
            sums.append(w.sum() if len(w) else np.nan)
            ns.append(len(w))
    df["roll_mean"], df["roll_sum"], df["roll_n"] = means, sums, ns
    df["roll_n"] = df["roll_n"].astype(np.int64)
    return df


def test_rolling_window_matches_brute_force(ray_session):
    import ray.data as rd

    from buteo_ray.stages.streaming import rolling_window

    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        # Coarse ts forces ties within users — event_id must break them.
        "ts": rng.integers(0, 50, n).astype(np.int64),
        "value": rng.normal(100.0, 30.0, n),
    })
    out = rolling_window(rd.from_pandas(df), key_col="user_id",
                         order_cols=["ts", "event_id"],
                         value_col="value", preceding=3).to_pandas()
    want = _brute_rolling(df, preceding=3)
    out = out.sort_values("event_id").reset_index(drop=True)
    want = want.sort_values("event_id").reset_index(drop=True)
    for c in ["roll_mean", "roll_sum"]:
        np.testing.assert_allclose(out[c], want[c], rtol=1e-9, atol=1e-9)
    assert out["roll_n"].tolist() == want["roll_n"].tolist()
    # Pass-through columns intact.
    for c in ["user_id", "ts", "value"]:
        np.testing.assert_array_equal(out[c], want[c])


def test_rolling_window_nan_values_excluded(ray_session):
    """NaN values: excluded from count, skipped by mean (matching SQL
    COUNT(value)/AVG(value) null semantics — pandas rolling skips NaN
    with min_periods=1)."""
    import ray.data as rd

    from buteo_ray.stages.streaming import rolling_window

    df = pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "user_id": np.zeros(4, dtype=np.int64),
        "ts": np.arange(4, dtype=np.int64),
        "value": [1.0, np.nan, 3.0, np.nan],
    })
    out = rolling_window(rd.from_pandas(df), key_col="user_id",
                         order_cols=["ts", "event_id"],
                         value_col="value", preceding=1).to_pandas()
    out = out.sort_values("event_id")
    assert out["roll_n"].tolist() == [1, 1, 1, 1]
    np.testing.assert_allclose(out["roll_mean"], [1.0, 1.0, 3.0, 3.0])


def test_mixture_sample_rates_and_determinism(ray_session):
    """Per-key keep rates approximate the targets; re-runs keep the
    identical row set; missing keys drop (default=0); raising a rate
    only ADDS rows (superset stability)."""
    import ray.data as rd

    from buteo_ray.stages.selection import mixture_sample

    n = 4000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "src": np.where(np.arange(n) % 2 == 0, "a", "b"),
    })
    ds = rd.from_pandas(df)
    out1 = mixture_sample(ds, "src", {"a": 0.8, "b": 0.2}, "id").to_pandas()
    out2 = mixture_sample(ds, "src", {"a": 0.8, "b": 0.2}, "id").to_pandas()
    assert sorted(out1["id"]) == sorted(out2["id"])
    ra = len(out1[out1["src"] == "a"]) / (n / 2)
    rb = len(out1[out1["src"] == "b"]) / (n / 2)
    assert abs(ra - 0.8) < 0.05 and abs(rb - 0.2) < 0.05
    # superset stability: raising b's rate only adds rows
    out3 = mixture_sample(ds, "src", {"a": 0.8, "b": 0.5}, "id").to_pandas()
    assert set(out1["id"]) <= set(out3["id"])
    # missing key → default 0 → dropped entirely
    out4 = mixture_sample(ds, "src", {"a": 0.8}, "id").to_pandas()
    assert (out4["src"] == "a").all()


def _brute_shift(df: pd.DataFrame, lag: int, lead: int,
                 default: float) -> pd.DataFrame:
    df = df.sort_values(["user_id", "ts", "event_id"],
                        kind="stable").reset_index(drop=True)
    g = df.groupby("user_id", sort=False)
    df["row_num"] = g.cumcount() + 1
    lag_v = g["value"].shift(lag)
    df["lag_value"] = lag_v.fillna(default)
    df["lead_value"] = g["value"].shift(-lead).fillna(default)
    df["delta"] = (df["value"] - lag_v).fillna(default)
    return df


def test_window_shift_matches_brute_force(ray_session):
    import ray.data as rd

    from buteo_ray.stages.streaming import window_shift

    rng = np.random.default_rng(11)
    n = 600
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        # 0..59 keys plus a few singleton keys (row_num=1, all defaults)
        "user_id": np.concatenate([
            rng.integers(0, 60, n - 3), [1000, 1001, 1002]]).astype(np.int64),
        "ts": rng.integers(0, 40, n).astype(np.int64),
        "value": rng.normal(0.0, 5.0, n),
    })
    for lag, lead in [(1, 1), (2, 3)]:
        out = window_shift(rd.from_pandas(df), key_col="user_id",
                           order_cols=["ts", "event_id"],
                           value_col="value", lag=lag, lead=lead,
                           default=-1.0).to_pandas()
        want = _brute_shift(df.copy(), lag, lead, -1.0)
        out = out.sort_values("event_id").reset_index(drop=True)
        want = want.sort_values("event_id").reset_index(drop=True)
        assert out["row_num"].tolist() == want["row_num"].tolist()
        for c in ["lag_value", "lead_value", "delta"]:
            # exact: shifts copy untouched doubles, delta is one IEEE op
            np.testing.assert_array_equal(out[c].to_numpy(),
                                          want[c].to_numpy(), err_msg=c)


def test_window_shift_singleton_key_defaults(ray_session):
    import ray.data as rd

    from buteo_ray.stages.streaming import window_shift

    df = pd.DataFrame({
        "event_id": [0], "user_id": [7], "ts": [0], "value": [3.5]})
    out = window_shift(rd.from_pandas(df), key_col="user_id",
                       order_cols=["ts", "event_id"],
                       value_col="value", default=-1.0).to_pandas()
    assert out["row_num"].tolist() == [1]
    assert out["lag_value"].tolist() == [-1.0]
    assert out["lead_value"].tolist() == [-1.0]
    assert out["delta"].tolist() == [-1.0]


def test_pivot_counts_semantics(ray_session):
    """Counts/sums per pivot value; out-of-list and null pivot values
    count nowhere. SQL CASE-WHEN null rules: a matched row with a null
    value is skipped (k=2: NULL + ELSE-0 row → 0.0, like SQL
    SUM({NULL, 0})); a key where EVERY row matches with a null value
    sums to NULL (k=4: SQL SUM({NULL, NULL}))."""
    import ray.data as rd

    from buteo_ray.stages.aggregate import pivot_counts

    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 3, 3, 4, 4],
        "cat": ["a", "b", "zzz", "a", None, "b", "b", "a", "a"],
        "v": [1.0, 2.0, 99.0, np.nan, 5.0, 3.0, 4.0, np.nan, np.nan],
    })
    out = pivot_counts(rd.from_pandas(df), ["k"], "cat", ["a", "b"],
                       value_col="v").to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out["n_a"].tolist() == [1, 1, 0, 2]
    assert out["n_b"].tolist() == [1, 0, 2, 0]
    np.testing.assert_allclose(out["sum_a"].to_numpy(),
                               [1.0, 0.0, 0.0, np.nan])
    np.testing.assert_allclose(out["sum_b"].to_numpy(),
                               [2.0, 0.0, 7.0, 0.0])


def test_pivot_counts_no_value_col(ray_session):
    import ray.data as rd

    from buteo_ray.stages.aggregate import pivot_counts

    df = pd.DataFrame({"k": [1, 2, 1], "cat": ["x", "x", "y"]})
    out = pivot_counts(rd.from_pandas(df), ["k"], "cat",
                       ["x", "y"]).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert list(out.columns) == ["k", "n_x", "n_y"]
    assert out["n_x"].tolist() == [1, 1]
    assert out["n_y"].tolist() == [1, 0]


def test_group_standardize_matches_brute(ray_session):
    """z/mean/std vs a pandas transform oracle; null-key and null-value
    rows dropped; constant groups (std=0) dropped entirely."""
    import ray.data as rd

    from buteo_ray.stages.aggregate import group_standardize

    rng = np.random.default_rng(3)
    n = 400
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "a": rng.choice(["x", "y", None], n),
        "b": rng.integers(0, 3, n).astype(np.int64),
        "v": rng.normal(50.0, 9.0, n),
    })
    df.loc[5, "v"] = np.nan          # null value → dropped
    df.loc[df["b"] == 2, "v"] = 7.0  # constant groups → dropped

    out = group_standardize(rd.from_pandas(df), ["a", "b"], "v") \
        .to_pandas().sort_values("id").reset_index(drop=True)

    want = df.dropna(subset=["a", "v"]).copy()
    g = want.groupby(["a", "b"])["v"]
    want["grp_mean"] = g.transform("mean")
    want["grp_std"] = g.transform(lambda s: s.std(ddof=0))
    want = want[want["grp_std"] > 0]
    want["z"] = (want["v"] - want["grp_mean"]) / want["grp_std"]
    want = want.sort_values("id").reset_index(drop=True)

    assert out["id"].tolist() == want["id"].tolist()
    for c in ["grp_mean", "grp_std", "z"]:
        np.testing.assert_allclose(out[c], want[c], rtol=1e-9, atol=1e-12,
                                   err_msg=c)


def test_collect_ordered_null_rules(ray_session):
    """NULL values skipped in the path but the group row survives;
    all-null group → NULL path, count 0; order follows order_cols with
    the stable tiebreak."""
    import ray.data as rd

    from buteo_ray.stages.aggregate import collect_ordered

    df = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 3],
        "o": [3, 1, 2, 1, 2, 1],
        "t": [2, 9, 5, 0, 0, 0],
        "v": ["c", "a", None, None, None, "solo"],
    })
    out = collect_ordered(rd.from_pandas(df), "k", ["o", "t"], "v") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert out["path"].tolist()[0] == "a>c"       # o=1 → 'a', o=2 None, o=3 'c'
    assert out["path"].isna().tolist() == [False, True, False]
    assert out["n_items"].tolist() == [2, 0, 1]
    assert out["path"].tolist()[2] == "solo"


def test_quantile_threshold_filter_matches_duckdb(ray_session):
    """Engine thresholds == DuckDB quantile_disc across q values on a
    skewed small-domain distribution with heavy ties, including the
    float-trap case q=0.9 with group sizes that make q*n integral."""
    import duckdb
    import ray.data as rd

    from buteo_ray.stages.selection import quantile_threshold_filter

    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "id": np.arange(1000, dtype=np.int64),
        "g": rng.choice(["a", "b", "c"], 1000, p=[0.5, 0.3, 0.2]),
        "v": rng.integers(0, 12, 1000).astype(np.int64),  # heavy ties
    })
    # make group 'd' have exactly 10 rows → q=0.9 rank boundary
    extra = pd.DataFrame({"id": np.arange(1000, 1010, dtype=np.int64),
                          "g": "d",
                          "v": np.arange(10, dtype=np.int64)})
    df = pd.concat([df, extra], ignore_index=True)
    con = duckdb.connect()
    con.register("t", df)
    for q in [0.25, 0.5, 0.75, 0.9]:
        out = quantile_threshold_filter(
            rd.from_pandas(df), "g", "v", q=q).to_pandas()
        want = con.execute(
            "WITH th AS (SELECT g, quantile_disc(v, ?) AS thr "
            "FROM t GROUP BY g) SELECT t.id, t.g, t.v, th.thr "
            "FROM t JOIN th USING (g) WHERE t.v > th.thr", [q]).fetchdf()
        out = out.sort_values("id").reset_index(drop=True)
        want = want.sort_values("id").reset_index(drop=True)
        assert out["id"].tolist() == want["id"].tolist(), q
        assert out["thr"].tolist() == want["thr"].tolist(), q


def test_quantile_threshold_filter_null_and_gate(ray_session):
    import ray.data as rd
    import pytest as _pytest

    from buteo_ray.stages.selection import quantile_threshold_filter

    df = pd.DataFrame({
        "id": [1, 2, 3, 4, 5],
        "g": ["a", "a", "a", None, "a"],
        "v": pd.array([1, 2, 3, 4, None], dtype="Int64"),
    })
    out = quantile_threshold_filter(rd.from_pandas(df), "g", "v",
                                    q=0.5).to_pandas()
    # threshold for 'a' over {1,2,3} at q=0.5 → 2; null group/value drop
    assert sorted(out["id"].tolist()) == [3]
    with _pytest.raises(ValueError, match="max_pairs"):
        quantile_threshold_filter(rd.from_pandas(df), "g", "v",
                                  q=0.5, max_pairs=1).to_pandas()
    with _pytest.raises(ValueError, match="4 decimals"):
        quantile_threshold_filter(rd.from_pandas(df), "g", "v",
                                  q=0.33333)
