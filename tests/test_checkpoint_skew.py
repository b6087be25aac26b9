"""Checkpoint/resume manifests, salted aggregation, and the co-partitioned
large-large spatial join (vs the broadcast join as oracle)."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest


def test_resumable_write_and_resume(ray_session, tmp_path):
    import ray.data as rd

    from buteo_ray.state.checkpoint import (
        completed_partitions,
        read_manifest,
        read_partitioned,
        write_partitioned_resumable,
    )

    out = str(tmp_path / "ckpt")
    df = pd.DataFrame({"k": np.arange(100) % 5, "v": np.arange(100)})

    rows = write_partitioned_resumable(rd.from_pandas(df), out, "k", op_version="v1")
    assert len(rows) == 5
    assert completed_partitions(out) == {"0", "1", "2", "3", "4"}
    man = read_manifest(out)
    assert all(r["rows"] == 20 and r["op_version"] == "v1" for r in man)

    back = read_partitioned(out).to_pandas()
    assert len(back) == 100
    assert set(back["v"]) == set(range(100))

    # Resume: simulate a partial failure by deleting partition 3's dir +
    # its manifest row, then re-run — ONLY partition 3 is rewritten.
    shutil.rmtree(os.path.join(out, "k=3"))
    keep = [r for r in man if r["partition"] != "3"]
    with open(os.path.join(out, "_manifest.jsonl"), "w") as f:
        import json

        for r in keep:
            f.write(json.dumps(r) + "\n")

    rows2 = write_partitioned_resumable(rd.from_pandas(df), out, "k", op_version="v1")
    assert [r["partition"] for r in rows2] == ["3"]
    back2 = read_partitioned(out).to_pandas()
    assert len(back2) == 100

    # Fully complete → rerun writes nothing.
    rows3 = write_partitioned_resumable(rd.from_pandas(df), out, "k")
    assert rows3 == []


def test_salted_count_matches_plain(ray_session):
    import ray.data as rd

    from buteo_ray.state.skew import hot_keys, salted_count

    # Skewed: key 7 has 5000 rows, others ~50.
    ks = np.concatenate([np.full(5000, 7), np.arange(500) % 10])
    df = pd.DataFrame({"k": ks, "id": np.arange(len(ks))})
    ds = rd.from_pandas(df)

    hot = hot_keys(ds, "k", threshold=1000)
    assert set(hot) == {7}

    out = salted_count(rd.from_pandas(df), "k", salt_factor=4, id_col="id",
                       threshold=1000).to_pandas().set_index("k")["n"]
    expected = pd.Series(ks).value_counts()
    for k in expected.index:
        assert out[k] == expected[k]


def test_salted_count_high_cardinality_stays_distributed(ray_session):
    """1e6 distinct keys: salted_count must not materialize the
    (key × salt) table on the driver — the fold is a second distributed
    aggregate and the return value is a lazy Dataset."""
    import ray.data as rd

    from buteo_ray.state.skew import salted_count

    n = 1_000_000
    df = pd.DataFrame({"k": np.arange(n, dtype=np.int64),
                       "id": np.arange(n, dtype=np.int64)})
    out = salted_count(rd.from_pandas(df), "k", salt_factor=4, id_col="id",
                       threshold=10)
    import ray.data
    assert isinstance(out, ray.data.Dataset)
    # Spot-check a bounded slice instead of pulling 1e6 rows back.
    assert out.count() == n
    top = out.sort("n", descending=True).limit(5).to_pandas()
    assert (top["n"] == 1).all()


def test_partitioned_join_matches_broadcast(ray_session):
    import ray.data as rd

    from buteo_ray.sources.aoi import synth_aoi_polygons
    from buteo_ray.stages.geocode import geocode
    from buteo_ray.stages.join import broadcast_pip_join
    from buteo_ray.stages.join_partitioned import cell_partitioned_pip_join

    docs = pd.DataFrame({"doc_id": np.arange(2000)})
    aoi = synth_aoi_polygons(300)

    pts = geocode(rd.from_pandas(docs))
    expected = broadcast_pip_join(pts, aoi, how="inner", exact=True) \
        .select_columns(["doc_id", "aoi_id"]).to_pandas()

    got = cell_partitioned_pip_join(
        geocode(rd.from_pandas(docs)), rd.from_arrow(aoi), res=5
    ).to_pandas()

    key = lambda d: set(zip(d["doc_id"], d["aoi_id"]))
    assert key(got) == key(expected)
    assert len(got) == len(expected)  # no duplicate pairs from replication


def test_partitioned_join_salted_same_result(ray_session):
    import ray.data as rd

    from buteo_ray.sources.aoi import synth_aoi_polygons
    from buteo_ray.stages.geocode import geocode
    from buteo_ray.stages.join_partitioned import cell_partitioned_pip_join
    from buteo_ray.state.skew import hot_keys
    from buteo_ray.grid.cells import cell_xy

    docs = pd.DataFrame({"doc_id": np.arange(2000)})
    aoi = synth_aoi_polygons(300)

    plain = cell_partitioned_pip_join(
        geocode(rd.from_pandas(docs)), rd.from_arrow(aoi), res=5
    ).to_pandas()

    # Hot cells from the point distribution at the join resolution.
    from buteo_ray.stages.geocode import hash_coords_from_ids

    lat, lon = hash_coords_from_ids(np.arange(2000))
    cx, cy = cell_xy(lat, lon, 5)
    keys, counts = np.unique((cy.astype(np.int64) << 32) | cx, return_counts=True)
    hot = {int(k): int(c) for k, c in zip(keys, counts) if c > 100}
    assert hot, "fixture should have at least one hot cell"

    salted = cell_partitioned_pip_join(
        geocode(rd.from_pandas(docs)), rd.from_arrow(aoi), res=5,
        hot_cells=hot, salt_factor=4,
    ).to_pandas()

    key = lambda d: set(zip(d["doc_id"], d["aoi_id"]))
    assert key(salted) == key(plain)
    assert len(salted) == len(plain)


def test_hot_keys_high_cardinality(ray_session):
    """The hot-key probe must not driver-materialize the full counts
    table: 50k distinct keys (one row each) plus two hot keys; default
    (median-derived) threshold still isolates the hot pair."""
    import ray.data as rd

    from buteo_ray.state.skew import hot_keys, key_counts

    ks = np.concatenate([
        np.arange(50_000),           # 50k singleton keys
        np.full(3000, 1_000_001),    # hot
        np.full(2500, 1_000_002),    # hot
    ])
    ds = rd.from_pandas(pd.DataFrame({"k": ks}))

    hot = hot_keys(ds, "k")  # median=1 → threshold=max(10,1000)=1000
    assert hot == {1_000_001: 3000, 1_000_002: 2500}

    # top-N key_counts keeps only the heaviest keys on the driver.
    top = key_counts(ds, "k", top=2)
    assert len(top) == 2
    assert set(top["k"]) == {1_000_001, 1_000_002}

    # max_keys caps the collected hot set at the heaviest keys.
    capped = hot_keys(ds, "k", threshold=2000, max_keys=1)
    assert capped == {1_000_001: 3000}
