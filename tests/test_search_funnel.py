"""bm25_topk vs an explicit-loop BM25, and funnel_steps vs a per-user
scan — exact equality across multi-block partitioning."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from buteo_ray.stages.search import bm25_topk
from buteo_ray.stages.streaming import funnel_steps


def _ref_bm25(docs, q, k, k1=1.2, b=0.75):
    toks = {i: t.split(" ") for i, t in docs}
    n = float(len(docs))
    avgdl = sum(len(v) for v in toks.values()) / n
    idf = {}
    for t in q:
        df = sum(1 for v in toks.values() if t in v)
        if df:
            idf[t] = np.log(1.0 + (n - df + 0.5) / (df + 0.5))
    rows = []
    for i, v in toks.items():
        s = 0.0
        for t in q:
            tf = float(v.count(t))
            if tf and t in idf:
                s += (idf[t] * (tf * (k1 + 1.0))
                      / (tf + k1 * (1.0 - b + b * len(v) / avgdl)))
        if s > 0:
            rows.append((i, np.floor(s * 1e8 + 0.5) / 1e8))
    rows.sort(key=lambda r: (-r[1], r[0]))
    return rows[:k]


def test_bm25_matches_reference(ray_session):
    rng = np.random.default_rng(17)
    vocab = ["hash", "join", "scan", "sort", "merge", "spill", "page"]
    docs = [(i, " ".join(vocab[int(v)]
                         for v in rng.integers(0, len(vocab),
                                               int(rng.integers(3, 60)))))
            for i in range(200)]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs])})).repartition(6)
    q = ["hash", "spill", "absent_token"]
    got = bm25_topk(ds, q, k=15).to_pandas()
    want = _ref_bm25(docs, q, 15)
    assert got["doc_id"].tolist() == [w[0] for w in want]
    np.testing.assert_allclose(got["score8"], [w[1] for w in want],
                               rtol=0, atol=0)
    with pytest.raises(ValueError):
        bm25_topk(ds, [], k=5)
    with pytest.raises(ValueError):
        bm25_topk(ds, q, k=0)


def _ref_funnel(df, steps, missing=-1):
    out = {}
    for uid, g in df.groupby("u"):
        g = g.sort_values("t")
        ts, evs = g["t"].to_numpy(), g["e"].to_numpy()
        reached, prev = [], None
        for s in steps:
            cand = ts[(evs == s) if prev is None
                      else ((evs == s) & (ts > prev))]
            if cand.size == 0:
                break
            prev = int(cand.min())
            reached.append(prev)
        if reached:
            row = reached + [missing] * (len(steps) - len(reached))
            out[uid] = (row, len(reached))
    return out


def test_funnel_matches_reference(ray_session):
    rng = np.random.default_rng(23)
    n = 5000
    df = pd.DataFrame({
        "u": rng.integers(0, 60, n),
        "t": rng.integers(0, 10**9, n),
        "e": np.array(["A", "B", "C", "x"])[rng.integers(0, 4, n)]})
    df = df.drop_duplicates(["u", "t"])  # strict-> semantics need no ts ties
    ds = rd.from_arrow(pa.table({
        "u": pa.array(df["u"], pa.int64()),
        "ts": pa.array(df["t"].to_numpy().astype("datetime64[us]")),
        "e": pa.array(df["e"])})).repartition(7)
    got = (funnel_steps(ds, "u", "ts", "e", ["A", "B", "C"]).to_pandas()
           .sort_values("u").reset_index(drop=True))
    ref = _ref_funnel(df, ["A", "B", "C"])
    assert got["u"].tolist() == sorted(ref)
    for _, r in got.iterrows():
        row, nsteps = ref[r["u"]]
        assert [r["t1"], r["t2"], r["t3"]] == row
        assert r["steps_completed"] == nsteps


def test_funnel_strictly_after(ray_session):
    # B at the SAME instant as A does not count; a later B does.
    ds = rd.from_arrow(pa.table({
        "u": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array(np.array([100, 100, 200],
                                dtype="datetime64[us]")),
        "e": pa.array(["A", "B", "B"])}))
    got = funnel_steps(ds, "u", "ts", "e", ["A", "B"]).to_pandas()
    assert got["t1"][0] == 100 and got["t2"][0] == 200
    with pytest.raises(ValueError):
        funnel_steps(ds, "u", "ts", "e", [])
