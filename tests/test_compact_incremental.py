"""compact_cells vs an explicit-loop quadtree compaction, dedup_against
vs a set-difference reference, normalize_text vs Python re."""

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from buteo_ray.stages.dedup import dedup_against
from buteo_ray.stages.text import normalize_text
from buteo_ray.stages.tiling import compact_cells


def _brute_compact(cells, res, min_res):
    out, cur = [], set(cells)
    for lvl in range(res, min_res, -1):
        c = Counter((x >> 1, y >> 1) for x, y in cur)
        out += [(lvl, x, y) for x, y in cur if c[(x >> 1, y >> 1)] < 4]
        cur = set(p for p, n in c.items() if n == 4)
    out += [(min_res, x, y) for x, y in cur]
    return sorted(out)


@pytest.mark.parametrize("driver_max", [64 << 20, 0])  # driver / dist
def test_compact_cells_matches_reference(ray_session, driver_max):
    rng = np.random.default_rng(4)
    pts = set((int(a), int(b)) for a, b in rng.integers(0, 32, (900, 2)))
    ds = rd.from_arrow(pa.table({
        "cx": pa.array([p[0] for p in pts], pa.int64()),
        "cy": pa.array([p[1] for p in pts], pa.int64())})).repartition(5)
    got = compact_cells(ds, res=5, min_res=1, x_col="cx", y_col="cy",
                        driver_max_bytes=driver_max).to_pandas()
    got_t = sorted(map(tuple, got[["res", "x", "y"]].to_numpy()))
    assert got_t == _brute_compact(pts, 5, 1)


def test_compact_cells_full_grid_collapses_to_one(ray_session):
    # A complete 4x4 grid at res 2 compacts to the single res-0 cell.
    xs, ys = np.meshgrid(np.arange(4), np.arange(4))
    ds = rd.from_arrow(pa.table({"x": xs.ravel().astype(np.int64),
                                 "y": ys.ravel().astype(np.int64)}))
    got = compact_cells(ds, res=2, min_res=0).to_pandas()
    assert got[["res", "x", "y"]].values.tolist() == [[0, 0, 0]]
    with pytest.raises(ValueError):
        compact_cells(ds, res=2, min_res=3)


def test_dedup_against_matches_set_difference(ray_session):
    texts = [f"t{i % 40}" for i in range(200)]  # heavy duplication
    new = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                        "text": texts})
    seen_texts = set(f"t{i}" for i in range(0, 40, 2))  # even ids seen
    seen = pd.DataFrame({
        "text": sorted(seen_texts),
        "extra": np.arange(len(seen_texts), dtype=np.int64)})
    for thr in (64 << 20, 0):  # broadcast and partitioned anti tiers
        got = dedup_against(
            rd.from_pandas(new).repartition(4), rd.from_pandas(seen),
            broadcast_threshold=thr).to_pandas()
        want = new[~new["text"].isin(seen_texts)]
        assert sorted(got["doc_id"]) == sorted(want["doc_id"])
    # empty seen side: nothing dropped
    eseen = rd.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    assert dedup_against(rd.from_pandas(new), eseen).count() == len(new)


def test_normalize_text_matches_python_re(ray_session):
    texts = ["  Hello, WORLD!! 42 ", "a--b__c", "", "ALL CAPS",
             "tabs\tand\nnewlines", "ünïcode ÅÄÖ x", "a  b   c"]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts)}))
    got = (normalize_text(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    def ref(s):
        s = s.lower()
        s = re.sub(r"[^a-z0-9 ]+", " ", s)
        s = re.sub(r" +", " ", s)
        return s.strip(" ")

    assert got["text_norm"].tolist() == [ref(t) for t in texts]
