"""Property test: bucketed_count == pandas groupby(dropna=False) for
every key dtype the hash router supports — the invariant the whole
bucketed-groupby family rests on (same-key rows must meet in one bucket
regardless of block layout, nulls, NaN, or bucket count)."""

import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st


def _int_keys():
    return st.lists(st.one_of(st.integers(-5, 5),
                              st.just(2**62), st.just(None)),
                    min_size=1, max_size=40)


def _float_keys():
    return st.lists(st.one_of(
        st.sampled_from([0.0, -0.0, 1.5, -3.25, float("nan"),
                         1e300, None])),
        min_size=1, max_size=40)


def _str_keys():
    return st.lists(st.one_of(st.sampled_from(["a", "b", "", "käse"]),
                              st.just(None)),
                    min_size=1, max_size=40)


def _date_keys():
    return st.lists(st.one_of(
        st.sampled_from([datetime.date(2020, 1, 1),
                         datetime.date(1999, 12, 31), None])),
        min_size=1, max_size=40)


def _key(k):
    """Canonical key: every missing flavor (None/NaN/pd.NA/NaT) is one
    null; numerics compare as float64 (the bucketed path keeps exact
    Int64 where pandas' default conversion would have gone float64)."""
    if pd.isna(k):
        return "<null>"
    if isinstance(k, (int, np.integer, float, np.floating)):
        return float(k)
    return repr(k)


def _expected(tbl: pa.Table) -> dict:
    df = tbl.to_pandas()
    out = df.groupby("k", sort=False, dropna=False).size()
    return {_key(k): int(v) for k, v in out.items()}


def _got(ds_count: pd.DataFrame) -> dict:
    return {_key(k): int(v) for k, v in zip(ds_count["k"], ds_count["n"])}


@pytest.mark.parametrize("keys_strategy,arrow_type", [
    (_int_keys, pa.int64()),
    (_float_keys, pa.float64()),
    (_str_keys, pa.string()),
    (_date_keys, pa.date32()),
], ids=["int64", "float64", "string", "date32"])
def test_bucketed_count_matches_pandas(ray_session, keys_strategy,
                                       arrow_type):
    import ray.data as rd

    from buteo_ray.stages.aggregate import bucketed_count

    @settings(max_examples=6, deadline=None)
    @given(keys=keys_strategy(), num_buckets=st.sampled_from([1, 3, 7]))
    def run(keys, num_buckets):
        tbl = pa.table({"k": pa.array(keys, type=arrow_type)})
        out = bucketed_count(rd.from_arrow(tbl), ["k"], alias="n",
                             num_buckets=num_buckets).to_pandas()
        assert _got(out) == _expected(tbl)

    run()


@settings(max_examples=6, deadline=None)
@given(
    lk=st.lists(st.integers(0, 6), min_size=0, max_size=25),
    rk=st.lists(st.integers(0, 6), min_size=0, max_size=25),
    force_shuffle=st.booleans(),
)
def _join_property(ray_session_holder, lk, rk, force_shuffle):
    import ray.data as rd

    from buteo_ray.stages.join_partitioned import hash_join_auto

    ldf = pd.DataFrame({"k": pd.Series(lk, dtype="int64"),
                        "v": np.arange(len(lk), dtype=np.int64)})
    rdf = pd.DataFrame({"rk": pd.Series(rk, dtype="int64"),
                        "w": np.arange(len(rk), dtype=np.int64) * 10})
    out = hash_join_auto(
        rd.from_pandas(ldf), rd.from_pandas(rdf), "k", "rk",
        broadcast_threshold=0 if force_shuffle else 64 << 20).to_pandas()
    exp = ldf.merge(rdf, left_on="k", right_on="rk").drop(columns=["rk"])
    cols = ["k", "v", "w"]
    got_s = out[cols].sort_values(cols).reset_index(drop=True) \
        if len(out) else pd.DataFrame(columns=cols)
    exp_s = exp[cols].sort_values(cols).reset_index(drop=True) \
        if len(exp) else pd.DataFrame(columns=cols)
    assert len(got_s) == len(exp_s)
    if len(got_s):
        pd.testing.assert_frame_equal(got_s, exp_s, check_dtype=False)


def test_hash_join_auto_matches_pandas_merge(ray_session):
    """Both plans (size-gated broadcast AND forced hash-partitioned
    shuffle) must equal a pandas inner merge — duplicate keys on either
    side included (dup right keys auto-fall to the shuffle plan)."""
    _join_property(ray_session)


@settings(max_examples=6, deadline=None)
@given(
    left=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 20)),
                  min_size=1, max_size=25),
    right=st.lists(st.tuples(st.integers(0, 4), st.integers(0, 20),
                             st.integers(-5, 5)),
                   min_size=1, max_size=25),
)
def _asof_property(left, right):
    import ray.data as rd

    from buteo_ray.stages.streaming import asof_join

    ldf = pd.DataFrame(left, columns=["user_id", "ts"]).astype("int64")
    ldf["lv"] = np.arange(len(ldf), dtype=np.int64)
    rdf = pd.DataFrame(right, columns=["user_id", "ts", "rv"]).astype("int64")
    out = asof_join(rd.from_pandas(ldf), rd.from_pandas(rdf),
                    right_cols=["rv"]).to_pandas()
    # Global oracle: per-(key, ts) MAX on the right (the documented tie
    # rule), merge_asof backward, inner semantics.
    r2 = rdf.groupby(["user_id", "ts"], as_index=False).max()
    r2 = r2.rename(columns={"rv": "right_rv"})
    r2["right_ts"] = r2["ts"]
    exp = pd.merge_asof(ldf.sort_values("ts", kind="stable"),
                        r2.sort_values("ts", kind="stable"),
                        on="ts", by="user_id", direction="backward")
    exp = exp.dropna(subset=["right_ts"])
    cols = ["user_id", "ts", "lv", "right_rv", "right_ts"]
    assert len(out) == len(exp)
    if len(exp) == 0:
        return  # empty Ray results surface with no columns (display quirk)
    got_s = out[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    exp_s = exp[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(got_s, exp_s)


def test_asof_join_matches_global_merge_asof(ray_session):
    """The bucketed/tagged asof plan must equal ONE global merge_asof —
    random keys, duplicate timestamps on both sides, ties included."""
    _asof_property()


@settings(max_examples=6, deadline=None)
@given(events=st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 10_000)),
    min_size=1, max_size=40))
def _sessionize_property(events):
    import ray.data as rd

    from buteo_ray.stages.streaming import sessionize

    df = pd.DataFrame(events, columns=["user_id", "sec"])
    df["user_id"] = df["user_id"].astype("int64")
    df["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(df["sec"], "s")
    df = df.drop(columns=["sec"])
    gap = pd.Timedelta(seconds=600)
    out = sessionize(rd.from_pandas(df), gap=gap).to_pandas()

    def brute(g):
        g = g.sort_values("ts", kind="stable").reset_index(drop=True)
        g["session_id"] = (g["ts"].diff() > gap).cumsum() \
            .fillna(0).astype("int64")
        return g

    exp = pd.concat([brute(g) for _, g in df.groupby("user_id")],
                    ignore_index=True)
    cols = ["user_id", "ts", "session_id"]
    got_s = out[cols].sort_values(cols).reset_index(drop=True)
    exp_s = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, exp_s)
    assert (out["session_key"]
            == out["user_id"].astype(str) + "#"
            + out["session_id"].astype(str)).all()


def test_sessionize_matches_brute(ray_session):
    """Bucketed sessionization == per-key pandas gap-cumsum, random
    event streams with duplicate timestamps."""
    _sessionize_property()


@settings(max_examples=6, deadline=None)
@given(rows=st.lists(
    st.tuples(st.integers(0, 200), st.sampled_from(["a", "b", "c", ""])),
    min_size=1, max_size=40))
def _dedup_exact_property(rows):
    import ray.data as rd

    from buteo_ray.stages.dedup import exact_dedup

    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df["doc_id"] = df["doc_id"].astype("int64")
    out = exact_dedup(rd.from_pandas(df), text_col="text",
                      id_col="doc_id").to_pandas()
    exp = df.sort_values("doc_id", kind="stable") \
        .drop_duplicates(subset="text", keep="first")
    assert sorted(out["doc_id"]) == sorted(exp["doc_id"])
    assert sorted(out["text"]) == sorted(exp["text"])


def test_dedup_exact_matches_pandas(ray_session):
    """Exact dedup keeps the MIN id per identical text — random ids with
    duplicates across blocks."""
    _dedup_exact_property()


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(st.tuples(st.integers(0, 4), st.integers(-10, 10)),
                  min_size=1, max_size=40),
    k=st.sampled_from([1, 2, 5]),
    ascending=st.booleans(),
)
def _topk_property(rows, k, ascending):
    import ray.data as rd

    from buteo_ray.stages.selection import topk_per_group

    df = pd.DataFrame(rows, columns=["g", "v"]).astype("int64")
    df["rid"] = np.arange(len(df), dtype=np.int64)  # unique tie-break
    out = topk_per_group(rd.from_pandas(df), "g", ["v", "rid"], k,
                         ascending=ascending).to_pandas()
    exp = (df.sort_values(["v", "rid"], ascending=ascending, kind="stable")
           .groupby("g", sort=False).head(k))
    cols = ["g", "v", "rid"]
    got_s = out[cols].sort_values(cols).reset_index(drop=True)
    exp_s = exp[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, exp_s)


def test_topk_per_group_matches_pandas(ray_session):
    """Partial+bucketed top-k per key == one global pandas sort+head,
    both directions, duplicate sort values included."""
    _topk_property()


@settings(max_examples=6, deadline=None)
@given(events=st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 20_000), st.integers(-5, 5)),
    min_size=1, max_size=40))
def _tumbling_property(events):
    import ray.data as rd

    from buteo_ray.stages.streaming import tumbling_window

    df = pd.DataFrame(events, columns=["k", "sec", "value"])
    df["k"] = df["k"].astype("int64")
    df["value"] = df["value"].astype("int64")
    df["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(df["sec"], "s")
    df = df.drop(columns=["sec"])
    out = tumbling_window(rd.from_pandas(df), window="1h",
                          keys=["k"]).to_pandas()
    epoch = df["ts"].astype("int64")  # ns since epoch
    df["window_id"] = epoch // (3600 * 10**9)
    exp = df.groupby(["k", "window_id"], as_index=False).agg(
        n_events=("value", "size"), sum_value=("value", "sum"))
    cols = ["k", "window_id", "n_events", "sum_value"]
    got_s = out[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    exp_s = exp[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(got_s, exp_s)


def test_tumbling_window_matches_pandas(ray_session):
    """Partial+bucketed tumbling aggregate == one pandas groupby over
    epoch//width windows."""
    _tumbling_property()


@settings(max_examples=6, deadline=None)
@given(events=st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 8_000)),
    min_size=1, max_size=30))
def _sliding_property(events):
    import ray.data as rd

    from buteo_ray.stages.streaming import sliding_window_counts

    df = pd.DataFrame(events, columns=["k", "sec"])
    df["k"] = df["k"].astype("int64")
    df["ts"] = pd.Timestamp("2024-01-01") + pd.to_timedelta(df["sec"], "s")
    df = df.drop(columns=["sec"])
    out = sliding_window_counts(rd.from_pandas(df), window="1h",
                                slide="30min", keys=["k"]).to_pandas()
    # Brute oracle: event at tick t belongs to every window starting at
    # w*slide with w*slide <= t < w*slide + width.
    ticks = df["ts"].astype("int64").to_numpy()  # ns
    slide, width = 1800 * 10**9, 3600 * 10**9
    rows = []
    for kk, t in zip(df["k"], ticks):
        w = t // slide
        while w * slide + width > t >= 0:
            if w * slide <= t:
                rows.append((kk, w * slide))
            w -= 1
            if w < t // slide - 3:
                break
    exp = pd.DataFrame(rows, columns=["k", "window_start"]) \
        .groupby(["k", "window_start"], as_index=False).size() \
        .rename(columns={"size": "n_events"})
    cols = ["k", "window_start", "n_events"]
    got_s = out[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    exp_s = exp[cols].sort_values(cols).reset_index(drop=True).astype("int64")
    pd.testing.assert_frame_equal(got_s, exp_s)


def test_sliding_window_counts_matches_brute(ray_session):
    """flat_map window explosion + bucketed count == brute per-event
    window membership (width 2x slide → every event in 2 windows)."""
    _sliding_property()


@settings(max_examples=6, deadline=None)
@given(rows=st.lists(st.integers(0, 3), min_size=1, max_size=40),
       n=st.sampled_from([1, 2, 4]))
def _sample_per_group_property(rows, n):
    import ray.data as rd

    from buteo_ray.stages.selection import sample_per_group

    df = pd.DataFrame({"g": pd.Series(rows, dtype="int64")})
    df["doc_id"] = np.arange(len(df), dtype=np.int64)
    out = sample_per_group(rd.from_pandas(df), "g", n,
                           id_col="doc_id").to_pandas()
    # Cap respected, deterministic, and a subset of the input.
    sizes = out.groupby("g").size()
    assert (sizes <= n).all()
    exp_sizes = df.groupby("g").size().clip(upper=n)
    assert sizes.reindex(exp_sizes.index, fill_value=0).equals(exp_sizes)
    assert set(out["doc_id"]).issubset(set(df["doc_id"]))
    # Rerun == same rows (order-free determinism).
    out2 = sample_per_group(rd.from_pandas(df.sample(frac=1, random_state=7)),
                            "g", n, id_col="doc_id").to_pandas()
    assert sorted(out2["doc_id"]) == sorted(out["doc_id"])


def test_sample_per_group_deterministic_cap(ray_session):
    _sample_per_group_property()


@given(keys=st.lists(st.one_of(st.integers(-3, 3), st.just(None),
                               st.just(2**61)),
                     min_size=1, max_size=120),
       thr=st.integers(1, 8),
       nb=st.sampled_from([2, 16, 1 << 14]),
       nblocks=st.sampled_from([1, 3]))
@settings(max_examples=6, deadline=None)
def test_heavy_hitters_matches_pandas(ray_session, keys, thr, nb,
                                      nblocks):
    """heavy_hitters == GROUP BY HAVING count >= thr for any data,
    threshold, bucket count (incl. degenerate B=2) and block layout —
    the exactness invariant behind the prefilter."""
    import ray.data as rd

    from buteo_ray.stages.sketch import heavy_hitters

    df = pd.DataFrame({"k": pd.array(keys, dtype="Int64")})
    ds = rd.from_pandas(df).repartition(nblocks)
    got = heavy_hitters(ds, "k", threshold=thr, num_buckets=nb) \
        .to_pandas()
    vc = df.groupby("k", sort=False, dropna=False).size()
    want = {(_key(k)): int(v) for k, v in vc.items() if v >= thr}
    got_d = {} if got.empty else \
        {_key(k): int(v) for k, v in zip(got["k"], got["n"])}
    assert got_d == want


@given(vals=st.lists(st.floats(-100, 100, allow_nan=False),
                     min_size=1, max_size=200),
       q=st.sampled_from([0.0, 0.25, 0.5, 0.9, 1.0]),
       nblocks=st.sampled_from([1, 4]))
@settings(max_examples=6, deadline=None)
def test_approx_quantile_bound_property(ray_session, vals, q, nblocks):
    """quantile_disc(q) - one bin width <= approx <= quantile_disc(q)
    for arbitrary data, q and block layout."""
    import ray.data as rd

    from buteo_ray.stages.sketch import approx_quantile_by_group

    B = 512
    df = pd.DataFrame({"g": ["x"] * len(vals), "v": vals})
    out = approx_quantile_by_group(
        rd.from_pandas(df).repartition(nblocks), ["g"], "v", [q],
        num_bins=B).to_pandas()
    sv = np.sort(np.asarray(vals, dtype=np.float64))
    exact = sv[max(int(np.ceil(q * len(sv))), 1) - 1]
    width = (sv[-1] - sv[0]) / B
    got = out[f"q_{q}"].iloc[0]
    assert got <= exact + 1e-9
    assert exact - got <= width + 1e-9


@given(ncols=st.integers(1, 3), nblocks=st.sampled_from([1, 2]))
@settings(max_examples=6, deadline=None)
def test_union_by_name_matches_pandas_concat(ray_session, ncols,
                                             nblocks):
    """union_by_name == pd.concat (by-name alignment, null padding)."""
    import ray.data as rd

    from buteo_ray.stages.vector_ops import union_by_name

    a = pd.DataFrame({"x": [1, 2], "y": ["p", "q"]})
    cols = {"x": [9.0], "z": [7], "w": ["r"]}
    b = pd.DataFrame({k: cols[k] for k in list(cols)[:ncols]})
    got = union_by_name([
        rd.from_pandas(a).repartition(nblocks),
        rd.from_pandas(b).repartition(nblocks),
    ]).to_pandas()
    want = pd.concat([a, b], ignore_index=True)
    want = want[[c for c in got.columns]]
    got_s = got.sort_values(list(got.columns), na_position="last") \
        .reset_index(drop=True)
    want_s = want.sort_values(list(want.columns), na_position="last") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)


@settings(max_examples=6, deadline=None)
@given(
    lk=st.lists(st.one_of(st.integers(0, 6), st.none()),
                min_size=0, max_size=25),
    rk=st.lists(st.integers(0, 6), min_size=0, max_size=25),
    force_shuffle=st.booleans(),
)
def _outer_filter_join_property(ray_session_holder, lk, rk,
                                force_shuffle):
    """left/semi/anti joins: both tiers ≡ the pandas references,
    nullable left keys included (null matches nothing; anti keeps it)."""
    import ray.data as rd

    from buteo_ray.stages.join_partitioned import (anti_join_auto,
                                                   left_join_auto,
                                                   semi_join_auto)

    thr = 0 if force_shuffle else 64 << 20
    ldf = pd.DataFrame({"k": pd.Series(lk, dtype="Int64"),
                        "v": np.arange(len(lk), dtype=np.int64)})
    # unique right keys so the broadcast tier of the LEFT join engages
    rkeys = sorted(set(rk))
    rdf = pd.DataFrame({"rk": pd.Series(rkeys, dtype="int64"),
                        "w": np.arange(len(rkeys), dtype=np.int64) * 10})
    # typed Arrow construction: an all-NA pandas Int64 column would
    # degrade to arrow `null` type, which Acero rejects as a join key
    lds = rd.from_arrow(pa.table({
        "k": pa.array(lk, pa.int64()),
        "v": pa.array(np.arange(len(lk), dtype=np.int64))}))
    rds = rd.from_pandas(rdf)

    match = ldf["k"].isin(rdf["rk"]).fillna(False)

    def _vals(df):
        # empty Ray results surface with no columns (display quirk)
        return sorted(df["v"]) if len(df) else []

    semi = semi_join_auto(lds, rds, "k", "rk",
                          broadcast_threshold=thr).to_pandas()
    assert _vals(semi) == sorted(ldf.loc[match, "v"])
    anti = anti_join_auto(lds, rds, "k", "rk",
                          broadcast_threshold=thr).to_pandas()
    assert _vals(anti) == sorted(ldf.loc[~match, "v"])

    left = left_join_auto(lds, rds, "k", "rk",
                          broadcast_threshold=thr).to_pandas()
    exp = ldf.merge(rdf, left_on="k", right_on="rk",
                    how="left").drop(columns=["rk"])
    assert len(left) == len(exp)
    if len(exp):
        cols = ["v", "w"]
        got_s = (left[cols].astype("float64").sort_values(cols)
                 .reset_index(drop=True))
        exp_s = (exp[cols].astype("float64").sort_values(cols)
                 .reset_index(drop=True))
        pd.testing.assert_frame_equal(got_s, exp_s)


def test_outer_filter_joins_match_pandas(ray_session):
    _outer_filter_join_property(ray_session)
