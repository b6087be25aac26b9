"""dup_clusters (connected components over dup pairs) and the
decontamination ops vs brute-force oracles."""

import numpy as np
import pyarrow as pa
import pytest
import ray


def _pairs_ds(pairs):
    a, b = (list(x) for x in zip(*pairs)) if pairs else ([], [])
    return ray.data.from_arrow(pa.table({
        "id_a": pa.array(a, type=pa.int64()),
        "id_b": pa.array(b, type=pa.int64()),
    }))


def _brute_components(pairs):
    """Union-find oracle: {node: min reachable id}."""
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize("threshold", [64 << 20, 0],
                         ids=["driver-fold", "distributed"])
@pytest.mark.parametrize("pairs", [
    [(1, 2), (2, 3), (3, 7), (10, 20)],          # chain + separate pair
    [(5, 1), (2, 5), (9, 9)],                     # reversed ids, self-loop
    [(100, 1), (2, 100), (3, 2), (4, 3), (5, 4)],  # long chain (diameter 5)
    [(1, 2)],
])
def test_dup_clusters_matches_union_find(ray_session, pairs, threshold):
    from buteo_ray.stages.dedup import dup_clusters

    out = dup_clusters(_pairs_ds(pairs),
                       driver_threshold=threshold).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == _brute_components(pairs)


def test_dup_clusters_empty(ray_session):
    from buteo_ray.stages.dedup import dup_clusters

    assert dup_clusters(_pairs_ds([])).count() == 0


def test_dup_clusters_over_minhash_pairs(ray_session, sf_dir):
    """Full pipeline: corpus → LSH pairs → components, vs union-find on
    the SAME pair list (the cluster step must add no pairs and lose
    none)."""
    import pyarrow.compute as pc

    from buteo_ray.stages.dedup import dup_clusters, minhash_lsh_pairs

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    docs = docs.map_batches(
        lambda t: t.filter(pc.greater_equal(pc.utf8_length(t["text"]), 5)),
        batch_format="pyarrow", batch_size=None)
    pairs_ds = minhash_lsh_pairs(docs, threshold=0.5).materialize()
    pairs = [(r["id_a"], r["id_b"]) for r in pairs_ds.take_all()]
    assert pairs, "corpus should contain planted near-dups"
    out = dup_clusters(pairs_ds).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == _brute_components(pairs)
    # representative rule: every cluster id is a member of its cluster
    assert set(out["cluster_id"]).issubset(set(out["doc_id"]))


def _brute_grams(text, n):
    toks = ("" if text is None else text).split(" ")
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def test_ngram_overlap_matches_brute(ray_session):
    from buteo_ray.stages.text import eval_ngram_hashes, ngram_overlap

    docs = pa.table({"doc_id": list(range(6)), "text": [
        "a b c d e f g h",
        "x y z w q r s t",          # no overlap
        "a b c d x y z w",          # shares 'a b c d'
        "short",                    # fewer than n tokens
        None,                       # null text
        "a b c d e f x x a b c d e f y y",  # duplicate grams count once
    ]})
    ev_tbl = pa.table({"doc_id": [100, 101],
                       "text": ["p p a b c d e f q q", "unrelated eval text here"]})
    n = 4
    ev = eval_ngram_hashes(ray.data.from_arrow(ev_tbl), n=n)
    eval_set = _brute_grams(ev_tbl["text"][0].as_py(), n) | \
        _brute_grams(ev_tbl["text"][1].as_py(), n)
    assert len(ev) == len(eval_set)
    out = ngram_overlap(ray.data.from_arrow(docs), ev, n=n).to_pandas()
    got = dict(zip(out["doc_id"], out["n_overlap"]))
    exp = {}
    for i, txt in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        k = len(_brute_grams(txt, n) & eval_set)
        if k:
            exp[i] = k
    assert got == exp


def test_decontaminate_drops_contaminated(ray_session):
    from buteo_ray.stages.text import decontaminate

    docs = pa.table({"doc_id": [1, 2, 3], "text": [
        "the quick brown fox jumps over the lazy dog",
        "completely unrelated words in this document body",
        "prefix the quick brown fox suffix words",
    ]})
    ev = pa.table({"doc_id": [9], "text": ["xx the quick brown fox yy"]})
    clean = decontaminate(ray.data.from_arrow(docs), ray.data.from_arrow(ev),
                          n=4).to_pandas()
    assert sorted(clean["doc_id"]) == [2]
    # higher threshold keeps single-gram hits
    clean2 = decontaminate(ray.data.from_arrow(docs), ray.data.from_arrow(ev),
                           n=4, min_overlap=3).to_pandas()
    assert sorted(clean2["doc_id"]) == [1, 2, 3]


def test_eval_ngram_hashes_cap(ray_session):
    from buteo_ray.stages.text import eval_ngram_hashes

    ev = pa.table({"doc_id": [1], "text": ["a b c d e f g h i j"]})
    with pytest.raises(ValueError, match="max_grams"):
        eval_ngram_hashes(ray.data.from_arrow(ev), n=2, max_grams=2)


def test_eval_ngram_hashes_empty(ray_session):
    from buteo_ray.stages.text import eval_ngram_hashes

    ev = pa.table({"doc_id": pa.array([], pa.int64()),
                   "text": pa.array([], pa.string())})
    out = eval_ngram_hashes(ray.data.from_arrow(ev), n=4)
    assert out.dtype == np.uint64 and len(out) == 0


def test_assign_shuffle_shards_deterministic(ray_session):
    from buteo_ray.stages.dedup import _splitmix64
    from buteo_ray.stages.selection import assign_shuffle_shards

    ids = np.arange(100, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"doc_id": ids}))
    out = assign_shuffle_shards(ds, "doc_id", n_shards=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    h = _splitmix64(ids.view(np.uint64))
    assert (out["shard"].to_numpy() == (h % np.uint64(8)).astype(np.int64)).all()
    assert (out["skey_hi"].to_numpy() == (h >> np.uint64(32)).astype(np.int64)).all()
    assert out["shard"].between(0, 7).all()
    # seed changes the permutation; n_shards=0 fails loudly
    out2 = assign_shuffle_shards(ds, "doc_id", n_shards=8, seed=1).to_pandas()
    assert not (out2.sort_values("doc_id")["shard"].to_numpy()
                == out["shard"].to_numpy()).all()
    with pytest.raises(ValueError, match="n_shards"):
        assign_shuffle_shards(ds, "doc_id", n_shards=0)
