"""edit_distance: banded-DP kernel vs reference DP, PassJoin pipeline
vs DuckDB levenshtein brute force (id-level and counts-level), short-
string bucket, and orientation edge cases."""

import random

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from buteo_ray.stages.edit_distance import (banded_levenshtein,
                                            edit_distance_pair_counts,
                                            edit_distance_pairs, _pack)


def _ref_lev(a: bytes, b: bytes) -> int:
    la, lb = len(a), len(b)
    D = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, D[0] = D[0], i
        for j in range(1, lb + 1):
            cur = D[j]
            D[j] = min(D[j] + 1, D[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return D[lb]


def _dist_matrices(pairs):
    a, la = _pack([p[0] for p in pairs])
    b, lb = _pack([p[1] for p in pairs])
    L = max(a.shape[1], b.shape[1], 1)
    a = np.pad(a, ((0, 0), (0, L - a.shape[1])))
    b = np.pad(b, ((0, 0), (0, L - b.shape[1])))
    return a, la, b, lb


@pytest.mark.parametrize("k", [1, 2, 3])
def test_banded_dp_matches_reference(k):
    random.seed(k)
    pairs = [(bytes(random.choices(b"abc", k=random.randint(0, 12))),
              bytes(random.choices(b"abc", k=random.randint(0, 12))))
             for _ in range(800)]
    a, la, b, lb = _dist_matrices(pairs)
    got = banded_levenshtein(a, la, b, lb, k)
    want = np.array([min(_ref_lev(x, y), k + 1) for x, y in pairs])
    assert (got == want).all()


def _brute_pairs(df, k):
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(f"""
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(levenshtein(a.s, b.s) AS INT) AS dist
        FROM t a, t b WHERE a.id < b.id
          AND levenshtein(a.s, b.s) <= {k}
        ORDER BY id_a, id_b""").fetchdf()


def _rand_corpus(n, seed):
    random.seed(seed)
    base = ["widget", "gadget", "grommet", "bolt", "washer", "ring"]
    adj = ["cold", "old", "bold", "gold", "red", "read", "x", "ax", ""]
    rows = []
    for i in range(n):
        s = random.choice(adj) + " " + random.choice(base)
        # random mutation to create near-dups at varying distances
        if random.random() < 0.5 and len(s) > 2:
            p = random.randrange(len(s))
            s = s[:p] + random.choice("abcz") + s[p + 1:]
        rows.append((i, s.strip()))
    return pd.DataFrame({"id": [r[0] for r in rows],
                         "s": [r[1] for r in rows]})


@pytest.mark.parametrize("k", [1, 2])
def test_id_pairs_match_duckdb_brute_force(ray_session, k):
    df = _rand_corpus(300, seed=k)
    got = (edit_distance_pairs(rd.from_pandas(df).repartition(4),
                               "s", "id", k).to_pandas()
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    want = _brute_pairs(df, k)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_short_strings_bucket(ray_session):
    # strings shorter than k+1 cannot be segmented — dedicated bucket
    df = pd.DataFrame({"id": range(6),
                       "s": ["a", "b", "ab", "abcd", "", "a"]})
    got = (edit_distance_pairs(rd.from_pandas(df), "s", "id", 2)
           .to_pandas().sort_values(["id_a", "id_b"])
           .reset_index(drop=True))
    want = _brute_pairs(df, 2)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("driver_bytes", [64 << 20, 0])
def test_pair_counts_aggregate_form(ray_session, driver_bytes):
    # driver_bytes=0 forces the fully-distributed tier; default takes
    # the size-gated driver tier — identical output required
    df = pd.DataFrame({"id": range(7),
                       "s": ["cold widget", "cold widget", "cold widgex",
                             "bolt", "bolt", "bolt", "zzzz"]})
    got = (edit_distance_pair_counts(rd.from_pandas(df), "s", 2,
                                     driver_bytes=driver_bytes)
           .to_pandas().sort_values(["text_a", "text_b"])
           .reset_index(drop=True))
    # dup groups: cold widget (m=2) → 1 pair; bolt (m=3) → 3 pairs
    # cross: cold widget ↔ cold widgex dist 1, 2·1 id pairs
    want = pd.DataFrame({
        "text_a": ["bolt", "cold widget", "cold widget"],
        "text_b": ["bolt", "cold widget", "cold widgex"],
        "dist": [0, 0, 1], "n_pairs": [3, 1, 2],
    })
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_max_dist_zero_rejected(ray_session):
    from buteo_ray.stages.edit_distance import edit_distance_text_pairs

    with pytest.raises(ValueError, match="max_dist"):
        edit_distance_text_pairs(
            rd.from_pandas(pd.DataFrame({"s": ["x"]})), "s", 0)


def test_id_pairs_null_texts_dropped(ray_session):
    df = pd.DataFrame({"id": [0, 1, 2, 3],
                       "s": ["bolt", "bolt", None, None]})
    got = (edit_distance_pairs(rd.from_pandas(df), "s", "id", 2)
           .to_pandas())
    # only the bolt pair; null texts emit nothing (no crash, no
    # bogus dist-0 null-group pairs)
    assert got[["id_a", "id_b"]].values.tolist() == [[0, 1]]


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_id_pairs_tiny_alphabet_adversarial(ray_session, seed):
    # tiny alphabet + short lengths = maximal segment sharing and
    # boundary traffic between the short bucket and segmentation
    random.seed(100 + seed)
    rows = [(i, "".join(random.choices("ab", k=random.randint(0, 6))))
            for i in range(120)]
    df = pd.DataFrame({"id": [r[0] for r in rows],
                       "s": [r[1] for r in rows]})
    got = (edit_distance_pairs(rd.from_pandas(df).repartition(4),
                               "s", "id", 2).to_pandas()
           .sort_values(["id_a", "id_b"]).reset_index(drop=True))
    want = _brute_pairs(df, 2)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
