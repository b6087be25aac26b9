"""Exact-equality tests for the round-5 session ops: group_corr, ntile,
cohort_retention, transition_counts, prune_frequent_tokens — each vs a
brute-force pandas/numpy oracle on randomized inputs, plus the edge
rules their docstrings promise (null handling, floor division,
threshold guards)."""

import numpy as np
import pandas as pd
import pytest
import ray


def _ds(df):
    return ray.data.from_pandas(df.reset_index(drop=True))


# ------------------------------------------------------------- group_corr

def test_group_corr_matches_numpy(ray_session):
    from buteo_ray.stages.aggregate import group_corr

    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 60, n),
        "x": rng.normal(size=n),
        "y": rng.normal(size=n),
    })
    # nulls in either column drop the PAIR (SQL rule)
    df.loc[rng.choice(n, 100, replace=False), "x"] = np.nan
    df.loc[rng.choice(n, 100, replace=False), "y"] = np.nan
    got = (group_corr(_ds(df), ["k"], "x", "y").to_pandas()
           .sort_values("k").reset_index(drop=True))

    exp_rows = []
    for k, g in df.dropna(subset=["x", "y"]).groupby("k"):
        x, y = g["x"].to_numpy(), g["y"].to_numpy()
        m = len(x)
        if m < 2:
            continue
        cov = (x * y).mean() - x.mean() * y.mean()
        vx = (x * x).mean() - x.mean() ** 2
        vy = (y * y).mean() - y.mean() ** 2
        if vx <= 0 or vy <= 0:
            continue
        exp_rows.append((k, m, cov, cov / np.sqrt(vx * vy)))
    exp = pd.DataFrame(exp_rows, columns=["k", "n", "cov_pop", "corr"])

    assert len(got) == len(exp)
    assert (got["k"].to_numpy() == exp["k"].to_numpy()).all()
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    # engine folds partials per block — same moments, reassociated sums
    np.testing.assert_allclose(got["cov_pop"], exp["cov_pop"], rtol=1e-12)
    np.testing.assert_allclose(got["corr"], exp["corr"], rtol=1e-12)


def test_group_corr_drops_constant_and_small_groups(ray_session):
    from buteo_ray.stages.aggregate import group_corr

    df = pd.DataFrame({
        "k": ["const"] * 5 + ["tiny"] + ["ok"] * 3,
        "x": [1.0] * 5 + [2.0] + [1.0, 2.0, 3.0],
        "y": [1.0, 2.0, 3.0, 4.0, 5.0] + [1.0] + [2.0, 4.0, 6.0],
    })
    got = group_corr(_ds(df), ["k"], "x", "y").to_pandas()
    assert set(got["k"]) == {"ok"}          # const: vx==0; tiny: n<2
    assert got["corr"].iloc[0] == pytest.approx(1.0)


# ------------------------------------------------------------------ ntile

def _ntile_oracle(n, k):
    q, rem = divmod(n, k)
    out = []
    for tile in range(1, k + 1):
        out.extend([tile] * (q + 1 if tile <= rem else q))
    return out


@pytest.mark.parametrize("k", [1, 3, 4, 7])
def test_ntile_matches_standard_semantics(ray_session, k):
    from buteo_ray.stages.selection import ntile

    rng = np.random.default_rng(k)
    frames = []
    for key in range(40):
        m = int(rng.integers(1, 12))  # includes n < k
        frames.append(pd.DataFrame({
            "key": key, "ord": np.arange(m), "pay": rng.normal(size=m)}))
    df = pd.concat(frames, ignore_index=True)
    got = (ntile(_ds(df), "key", ["ord"], k).to_pandas()
           .sort_values(["key", "ord"]).reset_index(drop=True))
    for key, g in got.groupby("key"):
        assert list(g["tile"]) == _ntile_oracle(len(g), k), key
    # payload columns pass through untouched
    assert set(got.columns) == {"key", "ord", "pay", "tile"}


def test_ntile_rejects_bad_k(ray_session):
    from buteo_ray.stages.selection import ntile

    with pytest.raises(ValueError):
        ntile(_ds(pd.DataFrame({"k": [1], "o": [1]})), "k", ["o"], 0)


# ------------------------------------------------------- cohort_retention

def test_cohort_retention_matches_pandas(ray_session):
    from buteo_ray.stages.aggregate import cohort_retention

    rng = np.random.default_rng(11)
    n = 3000
    week = 7 * 86400 * 10 ** 6
    us = rng.integers(0, 20 * week, n)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 150, n),
        "ts": pd.to_datetime(us, unit="us"),
    })
    got = (cohort_retention(_ds(df), "user_id", "ts").to_pandas()
           .sort_values(["cohort_week", "week_offset"])
           .reset_index(drop=True))

    wk = us // week
    t = pd.DataFrame({"u": df["user_id"], "wk": wk})
    t["cw"] = t.groupby("u")["wk"].transform("min")
    t["off"] = t["wk"] - t["cw"]
    exp = (t.groupby(["cw", "off"])
           .agg(n_users=("u", "nunique"), n_events=("u", "size"))
           .reset_index().sort_values(["cw", "off"])
           .reset_index(drop=True))
    assert len(got) == len(exp)
    for a, b in [("cohort_week", "cw"), ("week_offset", "off"),
                 ("n_users", "n_users"), ("n_events", "n_events")]:
        assert (got[a].to_numpy() == exp[b].to_numpy()).all(), a


def test_cohort_retention_floors_pre_epoch(ray_session):
    """Engine period ids FLOOR (numpy //); DuckDB's integer // truncs —
    pin the engine rule on negative epochs so the divergence stays a
    documented oracle scope, not silent behavior drift."""
    from buteo_ray.stages.aggregate import cohort_retention

    week = 7 * 86400 * 10 ** 6
    # one user: first event 1 µs BEFORE the epoch → cohort week -1
    df = pd.DataFrame({
        "user_id": [1, 1],
        "ts": pd.to_datetime([-1, week + 1], unit="us"),
    })
    got = (cohort_retention(_ds(df), "user_id", "ts").to_pandas()
           .sort_values("week_offset").reset_index(drop=True))
    assert list(got["cohort_week"]) == [-1, -1]
    assert list(got["week_offset"]) == [0, 2]


# ------------------------------------------------------ transition_counts

def test_transition_counts_matches_pandas(ray_session):
    from buteo_ray.stages.streaming import transition_counts

    rng = np.random.default_rng(3)
    n = 2500
    df = pd.DataFrame({
        "u": rng.integers(0, 80, n),
        "o": rng.permutation(n),
        "v": rng.choice(list("abcd"), n),
    })
    # null mid-sequence: drops the pair it ends, starts the next as src
    df.loc[rng.choice(n, 60, replace=False), "v"] = None
    got = (transition_counts(_ds(df), "u", ["o"], "v").to_pandas()
           .sort_values(["src", "dst"]).reset_index(drop=True))

    s = df.sort_values(["u", "o"], kind="stable")
    nxt = s.groupby("u")["v"].shift(-1)
    p = pd.DataFrame({"src": s["v"], "dst": nxt}).dropna(subset=["dst"])
    exp = (p.groupby(["src", "dst"], dropna=False).size()
           .reset_index(name="n")
           .sort_values(["src", "dst"]).reset_index(drop=True))
    assert len(got) == len(exp)
    assert (got["n"].to_numpy() == exp["n"].to_numpy()).all()
    assert got["src"].astype(str).tolist() == exp["src"].astype(str).tolist()
    assert got["dst"].astype(str).tolist() == exp["dst"].astype(str).tolist()


def test_transition_counts_all_singletons_empty(ray_session):
    from buteo_ray.stages.streaming import transition_counts

    df = pd.DataFrame({"u": range(300), "o": range(300),
                       "v": ["a"] * 300})
    assert transition_counts(_ds(df), "u", ["o"], "v").count() == 0


# -------------------------------------------------- prune_frequent_tokens

def _brute_prune(docs, threshold):
    from collections import Counter

    c = Counter(w for t in docs.values() for w in t.split(" "))
    freq = {w for w, n in c.items() if n >= threshold}
    out = {}
    for i, t in docs.items():
        toks = t.split(" ")
        kept = [w for w in toks if w not in freq]
        out[i] = (len(toks), len(kept), " ".join(kept))
    return out


def test_prune_frequent_tokens_matches_brute_force(ray_session):
    from buteo_ray.stages.text import prune_frequent_tokens

    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(30)] + ["hot"] * 0
    docs = {}
    for i in range(200):
        toks = list(rng.choice(vocab, rng.integers(3, 25)))
        if i % 3 == 0:
            toks += ["hot", "hot"]  # force one clearly-frequent token
        docs[i] = " ".join(toks)
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    got = (prune_frequent_tokens(_ds(df), min_count=90).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = _brute_prune(docs, 90)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        n_tok, n_kept, clean = exp[r["doc_id"]]
        assert r["n_tokens"] == n_tok
        assert r["n_kept"] == n_kept
        assert r["clean_text"] == clean


def test_prune_frequent_tokens_guards(ray_session):
    from buteo_ray.stages.text import prune_frequent_tokens

    df = pd.DataFrame({"doc_id": [1, 2, None],
                       "text": ["a b a", None, "c d"]})
    # null id / null text rows are dropped
    got = prune_frequent_tokens(_ds(df), min_count=2).to_pandas()
    assert list(got["doc_id"]) == [1]
    assert got["clean_text"].iloc[0] == "b"

    with pytest.raises(ValueError):
        prune_frequent_tokens(_ds(df))  # neither phi nor min_count
    with pytest.raises(ValueError):
        prune_frequent_tokens(_ds(df), phi=0.1, min_count=2)  # both
    with pytest.raises(ValueError):
        # every token is frequent at min_count=1 > max_frequent=1 guard
        prune_frequent_tokens(_ds(df), min_count=1, max_frequent=1)


# ------------------------------------------------------------- rank_stats

def test_rank_stats_matches_sql_tie_semantics(ray_session):
    import duckdb

    from buteo_ray.stages.streaming import rank_stats

    rng = np.random.default_rng(9)
    n = 2000
    df = pd.DataFrame({
        "k": rng.integers(0, 50, n),
        "id": np.arange(n),
        # coarse values -> plenty of ties within groups
        "v": rng.integers(0, 8, n).astype(float),
    })
    df.loc[rng.choice(n, 50, replace=False), "v"] = np.nan
    got = (rank_stats(_ds(df), "k", "v").to_pandas()
           .sort_values("id").reset_index(drop=True))
    exp = duckdb.sql("""
        SELECT id, RANK() OVER w AS rnk, DENSE_RANK() OVER w AS drnk,
               PERCENT_RANK() OVER w AS prnk
        FROM df WINDOW w AS (PARTITION BY k ORDER BY v)
        ORDER BY id""").df()
    assert (got["rnk"].to_numpy() == exp["rnk"].to_numpy()).all()
    assert (got["drnk"].to_numpy() == exp["drnk"].to_numpy()).all()
    # exact-int division on both sides — bit equality
    assert (got["prnk"].to_numpy() == exp["prnk"].to_numpy()).all()


# ---------------------------------------------------------- running_total

def test_running_total_null_rules(ray_session):
    from buteo_ray.stages.streaming import running_total

    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 2],
        "o": [1, 2, 3, 4, 1],
        "v": [None, 2.0, None, 3.0, None],
    })
    got = (running_total(_ds(df), "k", ["o"], "v").to_pandas()
           .sort_values(["k", "o"]).reset_index(drop=True))
    # before the first non-null: NULL sum; nulls never advance the sum
    assert np.isnan(got["run_sum"].iloc[0])
    assert list(got["run_sum"].iloc[1:4]) == [2.0, 2.0, 5.0]
    assert np.isnan(got["run_sum"].iloc[4])
    assert list(got["run_n"]) == [0, 1, 1, 2, 0]


def test_running_total_matches_pandas_big(ray_session):
    from buteo_ray.stages.streaming import running_total

    rng = np.random.default_rng(13)
    n = 3000
    df = pd.DataFrame({
        "k": rng.integers(0, 70, n),
        "o": rng.permutation(n),
        "v": rng.normal(size=n),
    })
    got = (running_total(_ds(df), "k", ["o"], "v").to_pandas()
           .sort_values(["k", "o"]).reset_index(drop=True))
    s = df.sort_values(["k", "o"], kind="stable").reset_index(drop=True)
    exp = s.groupby("k")["v"].cumsum()
    np.testing.assert_allclose(got["run_sum"], exp, rtol=1e-12)
    assert (got["run_n"].to_numpy()
            == s.groupby("k").cumcount().to_numpy() + 1).all()
