"""Rows-only operators vs in-test oracles: cell-partitioned kNN vs brute
force, MinHash-LSH vs exact n-gram Jaccard, SimHash properties, language
ID, LSH bucketing, per-label centroids."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def docs_ds(ray_session_module, sf_dir_module):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir_module}/documents.parquet", columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def ray_session_module():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    yield


@pytest.fixture(scope="module")
def sf_dir_module():
    import os

    return os.environ.get("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def test_knn_cells_matches_brute(ray_session_module, sf_dir_module):
    import ray.data as rd

    from buteo_ray.stages.geocode import geocode, hash_coords_from_ids
    from buteo_ray.stages.knn import haversine_m, knn_cells

    ds = rd.read_parquet(f"{sf_dir_module}/documents.parquet", columns=["doc_id"])
    all_ids = ds.to_pandas()["doc_id"].to_numpy()
    qids = all_ids[all_ids % 101 == 0]
    qlat, qlon = hash_coords_from_ids(qids)
    clat, clon = hash_coords_from_ids(all_ids)

    # Ring sized generously so the partitioning assumption holds → exact.
    out = knn_cells(geocode(ds), qids, qlat, qlon, k=3, res=3, ring=4,
                    metric="haversine").to_pandas()

    for i, q in enumerate(qids):
        d = haversine_m(np.full_like(clat, qlat[i]), np.full_like(clon, qlon[i]), clat, clon)
        d[all_ids == q] = np.inf
        order = np.lexsort((all_ids, d))[:3]
        got = out[out["query_id"] == q].sort_values(["dist", "neighbor_id"])
        np.testing.assert_array_equal(got["neighbor_id"].to_numpy(), all_ids[order])


def test_minhash_lsh_finds_near_dups(ray_session_module):
    import ray.data as rd

    from buteo_ray.stages.dedup import jaccard_pairs_brute, minhash_lsh_pairs

    # Corpus with planted near-duplicates.
    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
    base = [" ".join(rng.choice(words, 30)) for _ in range(40)]
    texts, ids = [], []
    for i, t in enumerate(base):
        texts.append(t)
        ids.append(2 * i)
        mutated = t.split(" ")
        mutated[5] = "MUT"
        texts.append(" ".join(mutated))  # near-dup of t
        ids.append(2 * i + 1)

    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts}))
    got = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    got_pairs = set(zip(got["id_a"], got["id_b"]))

    expected = {(a, b) for a, b, _ in jaccard_pairs_brute(texts, ids, 0.6)}
    planted = {(2 * i, 2 * i + 1) for i in range(40)} & expected
    recall = len(got_pairs & planted) / max(len(planted), 1)
    assert recall >= 0.9, f"LSH recall {recall} on planted near-dups"
    # And estimates are sane (no wildly-low-similarity pairs claimed high).
    assert (got["est_jaccard"] >= 0.5).all()


def test_exact_dedup_removes_duplicates(ray_session_module):
    import ray.data as rd

    from buteo_ray.stages.dedup import exact_dedup

    df = pd.DataFrame({
        "doc_id": [5, 3, 9, 1, 7],
        "text": ["aaa", "bbb", "aaa", "aaa", "bbb"],
    })
    out = exact_dedup(rd.from_pandas(df)).to_pandas()
    assert sorted(out["doc_id"]) == [1, 3]  # min id per distinct text


def test_simhash_similarity(ray_session_module):
    from buteo_ray.stages.dedup import simhash64

    a = "the quick brown fox jumps over the lazy dog again and again today"
    b = "the quick brown fox jumps over the lazy cat again and again today"
    c = "completely different words entirely unrelated content here now ok yes"
    ha, hb, hc = simhash64([a, b, c])

    def ham(x, y):
        return bin(int(x) ^ int(y)).count("1")

    assert ham(ha, hb) < ham(ha, hc)
    # Deterministic across calls.
    ha2 = simhash64([a])[0]
    assert ha == ha2


def test_lang_pred(ray_session_module):
    import ray.data as rd

    from buteo_ray.stages.text import add_lang_pred

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "the cat and the dog sat in the garden of the house",
            "der hund und die katze ist nicht mit den kindern",
            "le chat et la souris est un animal du jardin que",
            "zzz qqq xxx",
        ],
    })
    out = add_lang_pred(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    assert out["lang_pred"].tolist() == ["en", "de", "fr", "und"]


def test_ann_lsh_buckets(ray_session_module, sf_dir_module):
    import ray.data as rd

    from buteo_ray.stages.ann import lsh_bucket_assign

    emb = rd.read_parquet(f"{sf_dir_module}/embeddings.parquet")
    out = lsh_bucket_assign(emb, nbits=8).to_pandas()
    assert "lsh_bucket" in out.columns
    assert out["lsh_bucket"].nunique() > 1
    # Deterministic: same input → same buckets.
    out2 = lsh_bucket_assign(rd.read_parquet(f"{sf_dir_module}/embeddings.parquet"),
                             nbits=8).to_pandas()
    m = out.set_index("vec_id")["lsh_bucket"]
    m2 = out2.set_index("vec_id")["lsh_bucket"]
    pd.testing.assert_series_equal(m.sort_index(), m2.sort_index())


def test_ann_lsh_topk_recall(ray_session_module, sf_dir_module):
    """End-to-end bucketed ANN (VERDICT r01 item 8): measured recall vs
    the exact brute-force path — reported, not promised; the floor below
    is what nbits=8 + 1-bit multiprobe achieves on the clustered
    synthetic embeddings."""
    import ray.data as rd

    from buteo_ray.stages.ann import ann_cosine_topk, ann_lsh_topk

    emb = rd.read_parquet(f"{sf_dir_module}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    pdf = emb.to_pandas()
    qdf = pdf[pdf["vec_id"] % 29 == 0]
    qids = qdf["vec_id"].to_numpy()
    qvecs = np.stack(qdf["embedding"].to_numpy())

    exact = ann_cosine_topk(emb, qids, qvecs, k=5).to_pandas()
    approx = ann_lsh_topk(emb, qids, qvecs, k=5, nbits=8, n_tables=4,
                          probe_bits=2).to_pandas()

    exact_set = set(zip(exact["query_id"], exact["neighbor_id"]))
    approx_set = set(zip(approx["query_id"], approx["neighbor_id"]))
    recall = len(exact_set & approx_set) / len(exact_set)
    # Deterministic inputs + deterministic hyperplanes → this measured
    # recall (0.878 at sf0.001) is reproducible; 0.6 is the guard floor.
    assert recall >= 0.6, f"recall {recall:.2f}"
    # approx similarities are true cosines (no estimation): every
    # reported pair's cos_sim must equal the exact computation's.
    merged = approx.merge(exact, on=["query_id", "neighbor_id"],
                          suffixes=("_a", "_e"))
    np.testing.assert_allclose(merged["cos_sim_a"], merged["cos_sim_e"], rtol=1e-12)
    # wider probing and more tables only add candidates: recall monotone
    approx0 = ann_lsh_topk(emb, qids, qvecs, k=5, nbits=8, n_tables=4,
                           probe_bits=0).to_pandas()
    set0 = set(zip(approx0["query_id"], approx0["neighbor_id"]))
    assert len(exact_set & set0) <= len(exact_set & approx_set)


def test_centroids_per_label(ray_session_module, sf_dir_module):
    import ray.data as rd

    from buteo_ray.stages.ann import centroids_per_label

    emb = rd.read_parquet(f"{sf_dir_module}/embeddings.parquet")
    got = centroids_per_label(emb).to_pandas().set_index("label")

    pdf = emb.to_pandas()
    for label, g in pdf.groupby("label"):
        expected = np.stack(g["embedding"].to_numpy()).astype(np.float64).mean(axis=0)
        np.testing.assert_allclose(np.array(got.loc[label, "centroid"]), expected, rtol=1e-12)
        assert got.loc[label, "n"] == len(g)


def test_minhash_lsh_broadcast_and_semijoin_paths_agree(ray_session):
    """The size-gated broadcast hot-bucket filter and the distributed
    left-semi fallback produce identical pair sets."""
    import ray.data as rd

    from buteo_ray.stages.dedup import minhash_lsh_pairs

    base = "the quick brown fox jumps over the lazy dog near the river bank "
    texts = [base + f"variant {i}" for i in range(40)]
    texts += [base + "variant 0"]          # near-dup of doc 0
    df = pd.DataFrame({"doc_id": np.arange(len(texts)), "text": texts})
    ds = rd.from_pandas(df)

    a = minhash_lsh_pairs(ds, threshold=0.5).to_pandas()
    b = minhash_lsh_pairs(ds, threshold=0.5, broadcast_threshold=0).to_pandas()
    key = ["id_a", "id_b"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert ((a["id_a"] == 0) & (a["id_b"] == 40)).any()


def test_knn_cells_exact_matches_broadcast_any_ring(ray_session, rng):
    """knn_cells_exact == exact broadcast kNN regardless of ring size:
    a too-small ring triggers the certificate + broadcast rescue, a big
    ring passes the certificate outright."""
    import ray.data as rd

    from buteo_ray.stages.knn import knn_broadcast, knn_cells_exact

    n = 400
    df = pd.DataFrame({
        "doc_id": np.arange(n),
        "lat": rng.uniform(-80, 80, n),
        "lon": rng.uniform(-179, 179, n),
    })
    qm = df["doc_id"] % 37 == 0
    qid = df.loc[qm, "doc_id"].to_numpy()
    qlat = df.loc[qm, "lat"].to_numpy()
    qlon = df.loc[qm, "lon"].to_numpy()
    ds = rd.from_pandas(df).repartition(4)

    want = (knn_broadcast(ds, qid, qlat, qlon, k=4, metric="planar2")
            .to_pandas().sort_values(["query_id", "neighbor_id"])
            .reset_index(drop=True)[["query_id", "neighbor_id", "dist"]])
    for ring in (1, 6):   # ring=1 at res=6: sparse → rescue fires
        got = (knn_cells_exact(ds, qid, qlat, qlon, k=4, res=6, ring=ring)
               .to_pandas().sort_values(["query_id", "neighbor_id"])
               .reset_index(drop=True)[["query_id", "neighbor_id", "dist"]])
        pd.testing.assert_frame_equal(got, want)


def test_cosine_dup_pairs_matches_brute(ray_session_module):
    """Block-pair exact all-pairs == brute-force numpy, and the result is
    invariant to the block count (each unordered pair scored exactly once
    regardless of partitioning)."""
    import ray.data as rd

    from buteo_ray.stages.dedup import cosine_dup_pairs

    rng = np.random.default_rng(11)
    n, d = 120, 16
    base = rng.normal(size=(n, d)).astype(np.float32)
    # Plant near-dups: rows 0..9 get a slightly-perturbed twin.
    base[10:20] = base[0:10] + rng.normal(scale=0.05, size=(10, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64) * 3 + 1  # non-contiguous ids
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": ids, "embedding": [v.tolist() for v in base]}))

    q = np.floor(base.astype(np.float64) * 1000.0 + 0.5)
    nrm = np.sqrt((q * q).sum(axis=1))
    cos = (q @ q.T) / (nrm[:, None] * nrm[None, :])
    r, s = np.triu_indices(n, 1)
    keep = cos[r, s] >= 0.8
    expect = sorted(zip(ids[r[keep]], ids[s[keep]], cos[r, s][keep]))
    assert len(expect) >= 10  # the planted twins are all above 0.8

    prev = None
    for nb in (1, 3, 7):
        got = cosine_dup_pairs(ds, threshold=0.8, n_blocks=nb).to_pandas()
        got = got.sort_values(["id_a", "id_b"]).reset_index(drop=True)
        rows = list(zip(got["id_a"], got["id_b"], got["cos_sim"]))
        assert rows == expect, f"n_blocks={nb}"
        if prev is not None:
            assert rows == prev
        prev = rows


def test_ann_ivf_topk_recall(ray_session_module, sf_dir_module):
    """IVF-flat scale path: high recall on genuinely clustered data, and
    measured (not promised) recall on the weakly-clustered synthetic
    embeddings; all reported similarities are true cosines."""
    import ray.data as rd

    from buteo_ray.stages.ann import ann_cosine_topk, ann_ivf_topk

    # Planted clusters — the regime IVF is built for.
    rng = np.random.default_rng(5)
    centers = rng.normal(size=(8, 32)) * 4.0
    X = np.concatenate([
        c + rng.normal(scale=0.3, size=(40, 32)) for c in centers
    ]).astype(np.float32)
    ids = np.arange(X.shape[0], dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame(
        {"vec_id": ids, "embedding": [v.tolist() for v in X]}))
    qids = ids[::17]
    qvecs = X[::17].astype(np.float64)
    exact = ann_cosine_topk(ds, qids, qvecs, k=5).to_pandas()
    ivf = ann_ivf_topk(ds, qids, qvecs, k=5, n_centroids=8, nprobe=2,
                       train_sample=320).to_pandas()
    e = set(zip(exact["query_id"], exact["neighbor_id"]))
    g = set(zip(ivf["query_id"], ivf["neighbor_id"]))
    assert len(e & g) / len(e) >= 0.9, f"clustered recall {len(e & g) / len(e):.2f}"
    # Reported similarities equal the exact computation's for shared pairs.
    merged = ivf.merge(exact, on=["query_id", "neighbor_id"],
                       suffixes=("_a", "_e"))
    np.testing.assert_allclose(merged["cos_sim_a"], merged["cos_sim_e"],
                               rtol=1e-12)

    # Weakly-clustered sf embeddings: measured 0.86 at (16, 8); 0.5 floor.
    emb = rd.read_parquet(f"{sf_dir_module}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    pdf = emb.to_pandas()
    qdf = pdf[pdf["vec_id"] % 29 == 0]
    sq_ids = qdf["vec_id"].to_numpy()
    sq_vecs = np.stack(qdf["embedding"].to_numpy())
    exact2 = ann_cosine_topk(emb, sq_ids, sq_vecs, k=5).to_pandas()
    ivf2 = ann_ivf_topk(emb, sq_ids, sq_vecs, k=5, n_centroids=16,
                        nprobe=8).to_pandas()
    e2 = set(zip(exact2["query_id"], exact2["neighbor_id"]))
    g2 = set(zip(ivf2["query_id"], ivf2["neighbor_id"]))
    assert len(e2 & g2) / len(e2) >= 0.5, f"sf recall {len(e2 & g2) / len(e2):.2f}"


def test_simhash_dup_pairs_exact_vs_brute(ray_session_module, sf_dir_module):
    """Pigeonhole banding finds EVERY pair within the Hamming radius
    (exact wrt signatures — no recall loss), each emitted exactly once
    (first-matching-band ownership)."""
    import ray.data as rd

    from buteo_ray.stages.dedup import _popcount64, simhash64, simhash_dup_pairs

    docs = rd.read_parquet(f"{sf_dir_module}/documents.parquet",
                           columns=["doc_id", "text"])
    pdf = docs.to_pandas()
    sig = simhash64(pdf["text"].tolist())
    ids = pdf["doc_id"].to_numpy()
    h = _popcount64(sig[:, None] ^ sig[None, :]).astype(int)
    r, s = np.triu_indices(len(sig), 1)
    for radius in (3, 8):
        keep = h[r, s] <= radius
        brute = set(zip(np.minimum(ids[r[keep]], ids[s[keep]]),
                        np.maximum(ids[r[keep]], ids[s[keep]])))
        got = simhash_dup_pairs(docs, max_hamming=radius).to_pandas()
        assert len(got) == len(brute)          # no duplicate emissions
        assert set(zip(got["id_a"], got["id_b"])) == brute
        assert (got["hamming"] <= radius).all()


def test_nested_join_pack_unpack_roundtrip(ray_session):
    """Byte-packing for join payloads round-trips fixed lists, ragged
    lists, nulls and sliced chunks, and survives an actual anti-join."""
    import pyarrow as pa
    import ray.data as rd

    from buteo_ray.stages.nested_join import (_pack_column, _unpack_column,
                                              nested_payload_columns,
                                              pack_nested, unpack_nested)

    def plan_for(arrow_type, name="c"):
        return nested_payload_columns(pa.schema([(name, arrow_type)]))[name]

    # Fixed-size list, sliced (non-zero offset) to exercise buffer math.
    fsl2 = pa.list_(pa.float64(), 2)
    cp = plan_for(fsl2)
    fixed = pa.chunked_array(
        [pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]], fsl2).slice(1, 2)])
    out = _unpack_column(pa.chunked_array([_pack_column(fixed, cp)]), cp)
    assert out.to_pylist() == [[3.0, 4.0], [5.0, 6.0]]
    assert out.type == fsl2

    # A fixed-size-list block WITH a null must pack to the same arrow
    # type as a null-free block (per-batch type divergence would crash
    # the downstream join's schema unification) and round-trip the null.
    withnull = pa.chunked_array(
        [pa.array([[1.0, 2.0], None, [5.0, 6.0]], fsl2)])
    p_clean = _pack_column(fixed, cp)
    p_null = _pack_column(withnull, cp)
    assert p_clean.type == p_null.type
    out = _unpack_column(pa.chunked_array([p_null]), cp)
    assert out.to_pylist() == [[1.0, 2.0], None, [5.0, 6.0]]
    assert out.type == fsl2

    # Ragged list with a null and a slice restores the original type.
    li32 = pa.list_(pa.int32())
    cp = plan_for(li32)
    ragged = pa.chunked_array(
        [pa.array([[1], [2, 3, 4], None, [5, 6]], li32).slice(1, 3)])
    out = _unpack_column(pa.chunked_array([_pack_column(ragged, cp)]), cp)
    assert out.to_pylist() == [[2, 3, 4], None, [5, 6]]
    assert out.type == li32

    # Ray tensor-extension columns pack on the fixed path (width from
    # the type's shape) and come back as the equivalent plain list.
    from ray.data.extensions.tensor_extension import ArrowTensorArray
    tens = ArrowTensorArray.from_numpy(
        np.arange(12, dtype=np.float32).reshape(3, 4))
    cp = plan_for(tens.type)
    assert cp.width == 4
    packed = _pack_column(pa.chunked_array([tens]), cp)
    assert packed.type == pa.binary(16)
    out = _unpack_column(pa.chunked_array([packed]), cp)
    assert out.to_pylist() == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]]

    # A tensor column WITH a null row must take the per-row fallback
    # (ArrowTensorArray.to_numpy crashes on nulls) and round-trip.
    tens_null = tens.take(pa.array([0, None, 2]))
    assert tens_null.null_count == 1
    p = _pack_column(pa.chunked_array([tens_null]), cp)
    assert p.type == pa.binary(16)
    out = _unpack_column(pa.chunked_array([p]), cp)
    assert out.to_pylist() == [[0, 1, 2, 3], None, [8, 9, 10, 11]]

    # Variable-shaped tensor columns (struct storage, per-row shapes)
    # are rejected loudly at plan time, not silently skipped.
    from ray.data.extensions.tensor_extension import \
        ArrowVariableShapedTensorArray
    ragged_t = ArrowVariableShapedTensorArray.from_numpy(
        np.array([np.zeros((2, 2), np.float32),
                  np.zeros((3, 1), np.float32)], dtype=object))
    with pytest.raises(TypeError, match="variable-shaped"):
        nested_payload_columns(pa.schema([("c", ragged_t.type)]))

    # End-to-end: anti-join a Dataset carrying an embedding column.
    df = pd.DataFrame({
        "id": np.arange(6, dtype=np.int64),
        "embedding": [np.arange(4, dtype=np.float64) + i for i in range(6)],
    })
    ds = rd.from_pandas(df)
    plan = nested_payload_columns(ds.schema())
    assert "embedding" in plan
    drops = rd.from_items([{"id_b": 2}, {"id_b": 4}])
    joined = unpack_nested(
        pack_nested(ds, plan).join(drops, join_type="left_anti",
                                   num_partitions=2,
                                   on=("id",), right_on=("id_b",)),
        plan).to_pandas().sort_values("id")
    assert list(joined["id"]) == [0, 1, 3, 5]
    row3 = joined[joined["id"] == 3]["embedding"].iloc[0]
    assert list(np.asarray(row3)) == [3.0, 4.0, 5.0, 6.0]

    # Non-numeric nested values are refused loudly.
    strs = rd.from_items([{"id": 1, "toks": ["a", "b"]}])
    with pytest.raises(TypeError, match="non-numeric"):
        nested_payload_columns(strs.schema())


def _lsh_pairs_per_band_reference(texts, ids, bands=16, threshold=0.5,
                                  max_bucket=None):
    """Straight-loop banded-LSH reference: per (band, band_hash) group
    sorted by id, all intra-group pairs with signature-estimated Jaccard
    >= threshold, emitted only by the FIRST band whose signature chunk
    matches (the ownership rule). The vectorized bucket kernel in
    stages/dedup.py must reproduce this exactly."""
    import collections

    from buteo_ray.stages.dedup import _BINS, _splitmix64, oph_minhash

    sig = oph_minhash(texts)
    rows = _BINS // bands
    n = len(texts)
    bh = np.zeros((n, bands), dtype=np.uint64)
    for b in range(bands):
        chunk = sig[:, b * rows:(b + 1) * rows]
        h = np.zeros(n, dtype=np.uint64)
        for j in range(rows):
            h = h * np.uint64(1099511628211) + chunk[:, j]
        bh[:, b] = _splitmix64(h + np.uint64(b))
    groups = collections.defaultdict(list)
    for i in range(n):
        for b in range(bands):
            groups[(b, bh[i, b])].append(i)
    out = set()
    for (b, _h), mem in groups.items():
        mem = sorted(mem, key=lambda i: ids[i])
        if max_bucket is not None:
            mem = mem[:max_bucket]
        for x in range(len(mem)):
            for y in range(x + 1, len(mem)):
                i, j = mem[x], mem[y]
                eq = sig[i] == sig[j]
                if eq.mean() < threshold:
                    continue
                ce = eq.reshape(bands, rows).all(axis=1)
                if not ce.any() or ce.argmax() != b:
                    continue
                out.add((ids[i], ids[j], round(float(eq.mean()), 9)))
    return out


def test_minhash_lsh_pairs_match_per_band_reference(ray_session, monkeypatch):
    """The hash-bucket vectorized pair kernel (boundary-diff grouping +
    same-size tensor pairing + blockwise fallback) is pair-for-pair
    identical to the per-band loop semantics, including max_bucket
    truncation, duplicate clusters and the oversized-group path."""
    import ray.data as rd

    import buteo_ray.stages.dedup as D

    rng = np.random.default_rng(11)
    texts, ids = [], []
    k = 0
    for i in range(60):
        base = f"the quick brown fox jumps over the lazy dog number {i} " * 3
        texts.append(base); ids.append(k); k += 1
        for _ in range(int(rng.integers(0, 3))):
            t = list(base)
            for _ in range(int(rng.integers(0, 3))):
                t[int(rng.integers(0, len(t)))] = "x"
            texts.append("".join(t)); ids.append(k); k += 1
    # A degenerate boilerplate cluster forces the blockwise fallback
    # once _PAIR_CHUNK is shrunk below its size.
    for _ in range(12):
        texts.append("boilerplate navigation footer copyright notice")
        ids.append(k); k += 1

    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts}))
    for max_bucket, chunk in [(None, 512), (4, 512), (None, 8)]:
        monkeypatch.setattr(D, "_PAIR_CHUNK", chunk)
        got = D.minhash_lsh_pairs(ds, max_bucket=max_bucket).to_pandas()
        got_set = set(zip(got["id_a"], got["id_b"],
                          got["est_jaccard"].round(9)))
        exp = _lsh_pairs_per_band_reference(texts, ids,
                                            max_bucket=max_bucket)
        assert got_set == exp, (max_bucket, chunk,
                                len(got_set), len(exp))


def test_duplicate_spans_matches_brute(ray_session_module):
    """duplicate_spans == brute-force window counting, including a doc
    shorter than the window (no rows), an in-doc repeat, and multibyte
    UTF-8 (byte positions on both sides)."""
    import ray.data as rd
    from buteo_ray.stages.dedup import duplicate_spans, duplicate_spans_brute

    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "delta", "omega", "zeta"]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(40)]
    texts += [texts[0], "short", texts[3] + " tail " + texts[3],
              "héllo wörld " * 6]  # multibyte
    ids = list(range(len(texts)))

    ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "text": texts})).repartition(5)
    got = duplicate_spans(ds, window=24, stride=8).to_pandas()
    got_pairs = sorted(map(tuple, got[["doc_id", "pos"]].to_numpy()))
    want = duplicate_spans_brute(texts, ids, window=24, stride=8)
    assert got_pairs == want
    assert len(want) > 0


def test_sample_per_group_cap_and_determinism(ray_session_module):
    """sample_per_group keeps <= n per key, exactly n where the key has
    >= n rows, and the selected ids are independent of block layout."""
    import ray.data as rd
    from buteo_ray.stages.selection import sample_per_group

    df = pd.DataFrame({
        "doc_id": np.arange(200, dtype=np.int64),
        "grp": np.repeat([f"g{i}" for i in range(8)], 25),
    })
    df = pd.concat([df, pd.DataFrame({"doc_id": [900, 901], "grp": ["tiny", "tiny"]})])

    outs = []
    for parts in (1, 7):
        ds = rd.from_pandas(df).repartition(parts)
        out = sample_per_group(ds, key_col="grp", n=10, id_col="doc_id").to_pandas()
        outs.append(out.sort_values(["grp", "doc_id"]).reset_index(drop=True))
    assert outs[0].equals(outs[1])

    sizes = outs[0].groupby("grp").size()
    assert (sizes[sizes.index != "tiny"] == 10).all()
    assert sizes["tiny"] == 2

    # Matches the SQL-window-function definition of the same priority.
    p1 = (df["doc_id"] % 1048573) * 2654435761 % 1048573
    p2 = (df["doc_id"] % 999983) * 97003 % 999983
    want = (df.assign(__p1=p1, __p2=p2).sort_values(["__p1", "__p2", "doc_id"])
            .groupby("grp").head(10)[["doc_id", "grp"]]
            .sort_values(["grp", "doc_id"]).reset_index(drop=True))
    assert outs[0][["doc_id", "grp"]].reset_index(drop=True).equals(want)

    # The selection is NOT head-n-by-id (the priority actually mixes):
    # sequential ids per group must not all come from the id prefix.
    first_grp = outs[0][outs[0]["grp"] == "g0"]["doc_id"].to_numpy()
    assert not np.array_equal(np.sort(first_grp), np.arange(10))


def test_sample_per_group_ignores_nested_columns(ray_session_module):
    """A nested (list) payload column must stream through sample_per_group
    untouched — it is excluded from the tie-break sort."""
    import ray.data as rd
    from buteo_ray.stages.selection import sample_per_group

    df = pd.DataFrame({
        "doc_id": np.arange(60, dtype=np.int64),
        "grp": np.repeat(["a", "b", "c"], 20),
        "emb": [list(np.arange(4) + i) for i in range(60)],
    })
    out = sample_per_group(rd.from_pandas(df).repartition(4),
                           key_col="grp", n=5, id_col="doc_id").to_pandas()
    assert out.groupby("grp").size().eq(5).all()
    got = out.sort_values("doc_id")
    want = df.set_index("doc_id").loc[got["doc_id"]]
    assert all(list(a) == list(b) for a, b in zip(got["emb"], want["emb"]))


def test_duplicate_spans_fuzz_configs(ray_session_module):
    """Window/stride sweep over a mixed fuzz corpus (tiny alphabet to
    force repeats, unicode, empties, exact-window-length docs, nulls)
    must match the brute counter for every config."""
    import ray.data as rd
    from buteo_ray.stages.dedup import duplicate_spans, duplicate_spans_brute

    rng = np.random.default_rng(123)
    alpha = list("abc ")
    texts = ["".join(rng.choice(alpha, size=int(n)))
             for n in rng.integers(0, 120, size=80)]
    texts += ["", "x" * 16, "x" * 17, "ü" * 20, "héllo wörld" * 4,
              texts[0], texts[1]]
    ids = list(range(len(texts)))

    df = pd.DataFrame({"doc_id": ids, "text": texts})
    df.loc[len(df)] = {"doc_id": 999, "text": None}  # null → empty string
    ds = rd.from_pandas(df).repartition(6)

    for window, stride in [(16, 16), (16, 4), (8, 8), (24, 16)]:
        got = duplicate_spans(ds, window=window, stride=stride).to_pandas()
        got_pairs = sorted(map(tuple, got[["doc_id", "pos"]].to_numpy()))
        want = duplicate_spans_brute(
            [t or "" for t in df["text"]], list(df["doc_id"]),
            window=window, stride=stride)
        assert got_pairs == want, (window, stride)


def test_doc_freq_matches_brute(ray_session_module):
    """doc_freq == pandas brute distinct-doc counts, with the limit
    binding (k < vocab) and repeated tokens inside one doc counted once."""
    import ray.data as rd
    from buteo_ray.stages.text import doc_freq

    df = pd.DataFrame({
        "doc_id": np.arange(30, dtype=np.int64),
        "text": [f"common tok{i % 7} tok{i % 7} rare{i}" for i in range(30)],
    })
    out = doc_freq(rd.from_pandas(df).repartition(5), k=5).to_pandas()

    pairs = (df.assign(token=df["text"].str.split(" ")).explode("token")
             [["doc_id", "token"]].drop_duplicates())
    want = (pairs.groupby("token").size().rename("n_docs").reset_index()
            .sort_values(["n_docs", "token"], ascending=[False, True])
            .head(5).reset_index(drop=True))
    got = out.sort_values(["n_docs", "token"], ascending=[False, True]).reset_index(drop=True)
    assert got[["token", "n_docs"]].astype({"n_docs": "int64"}).equals(
        want[["token", "n_docs"]].astype({"n_docs": "int64"}))
    assert got["n_docs"].iloc[0] == 30  # 'common' in every doc, once each


def test_tfidf_topk_matches_brute(ray_session_module):
    """tf_idf_topk == brute pandas TF-IDF with the same quantization:
    k binds (docs with > k distinct tokens), short docs emit < k rows,
    tf > 1 weights repeats, and score ties break by token desc."""
    import ray.data as rd
    from buteo_ray.stages.text import tf_idf_topk

    df = pd.DataFrame({
        "doc_id": np.arange(24, dtype=np.int64),
        # 'common' everywhere (idf 0), per-doc rares, a repeated token,
        # and doc 0 with only two distinct tokens (< k output rows).
        "text": (["common common short0"]
                 + [f"common rep{i % 5} rep{i % 5} rare{i}a rare{i}b"
                    for i in range(1, 24)]),
    })
    n = len(df)
    out = (tf_idf_topk(rd.from_pandas(df).repartition(5), n_docs=n, k=3)
           .to_pandas().sort_values(["doc_id", "token"])
           .reset_index(drop=True))

    pairs = (df.assign(token=df["text"].str.split(" ")).explode("token")
             .groupby(["doc_id", "token"]).size().rename("tf").reset_index())
    dfreq = pairs.groupby("token")["doc_id"].nunique().rename("df")
    pairs = pairs.join(dfreq, on="token")
    idf = np.floor(np.log(n / pairs["df"].to_numpy(np.float64)) * 1e6 + 0.5) / 1e6
    pairs["tfidf"] = np.floor(pairs["tf"].to_numpy(np.float64) * idf * 1e4 + 0.5) / 1e4
    want = (pairs.sort_values(["doc_id", "tfidf", "token"],
                              ascending=[True, False, False], kind="stable")
            .groupby("doc_id").head(3)[["doc_id", "token", "tfidf"]]
            .sort_values(["doc_id", "token"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(out[["doc_id", "token", "tfidf"]], want)
    assert (out.groupby("doc_id").size() == 3).sum() == 23
    assert (out[out["doc_id"] == 0]["token"] == ["common", "short0"]).all()


def test_pii_scrub_patterns(ray_session_module):
    """pii_scrub redacts email/IPv4/phone spans, counts per row, and
    leaves clean rows untouched."""
    import ray.data as rd
    from buteo_ray.stages.text import pii_scrub

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [
            "write a.b-c_9@exa-mple.co.uk or ping 10.0.0.1 today",
            "call +1(555)123-4567 and 555.123.4567 now",
            "clean row with no sensitive spans at all",
            "two mails x@y.io z@w.dev one ip 8.8.8.8",
        ],
    })
    out = (pii_scrub(rd.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["text"].tolist() == [
        "write <EMAIL> or ping <IP> today",
        "call <PHONE> and <PHONE> now",
        "clean row with no sensitive spans at all",
        "two mails <EMAIL> <EMAIL> one ip <IP>",
    ]
    assert out["n_redactions"].tolist() == [2, 2, 0, 3]


def test_rep_ngrams_matches_brute(ray_session_module):
    """rep_ngrams == per-doc brute bigram counting, including boilerplate
    (high repetition), a 1-token doc and an empty-ish doc."""
    import ray.data as rd
    from buteo_ray.stages.text import rep_ngrams

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["buy now buy now buy now buy now",
                 "all tokens here are fully distinct words",
                 "single",
                 "a b a b c"],
    })
    out = (rep_ngrams(rd.from_pandas(df).repartition(3)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    def brute(s):
        t = s.split(" ")
        bgs = [f"{x} {y}" for x, y in zip(t, t[1:])]
        return len(bgs), len(set(bgs))

    want = [brute(s) for s in df["text"]]
    assert list(zip(out["n_bigrams"], out["n_distinct_bigrams"])) == want
    assert want[0] == (7, 2)   # boilerplate: huge dup gap
    assert want[2] == (0, 0)   # single token → no bigrams


def test_pii_scrub_null_text(ray_session_module):
    """Null text rows count 0 redactions and stay null (no NaN poisoning
    of the int64 accumulator)."""
    import ray.data as rd
    from buteo_ray.stages.text import pii_scrub

    df = pd.DataFrame({"doc_id": [1, 2], "text": ["ping 10.0.0.1", None]})
    out = (pii_scrub(rd.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_redactions"].tolist() == [1, 0]
    assert out["text"].iloc[0] == "ping <IP>"
    assert out["text"].iloc[1] is None or pd.isna(out["text"].iloc[1])


def test_rep_ngrams_oracle_position_cap(sf_dir_module):
    """sql_rep_ngrams enumerates 16383 positions; a doc with more tokens
    would make the ORACLE (not the engine) undercount. Pin the corpus
    fact the oracle relies on, at the sf the driver compares at."""
    import pyarrow.parquet as pq

    for sf in (sf_dir_module, "/root/testdata/sf0.01"):
        t = pq.read_table(f"{sf}/documents.parquet", columns=["text"])
        max_toks = max(len(s.split(" ")) for s in t["text"].to_pylist())
        assert max_toks < 16383, f"{sf}: {max_toks}"


def test_doc_freq_counts_ids_not_rows(ray_session_module):
    """Document identity is id_col, not the physical row: a doc_id split
    across two rows IN THE SAME BLOCK counts once per token."""
    import ray.data as rd
    from buteo_ray.stages.text import doc_freq

    df = pd.DataFrame({"doc_id": [1, 1, 2],
                       "text": ["alpha beta", "alpha gamma", "alpha"]})
    out = doc_freq(rd.from_pandas(df), k=10).to_pandas()
    got = dict(zip(out["token"], out["n_docs"]))
    assert got["alpha"] == 2  # not 3: both id-1 rows share one block


def test_chunk_documents_matches_brute(ray_session_module):
    """chunk_documents == per-doc brute slicing: overlap windows, short
    docs (one chunk), exact-boundary lengths, multibyte UTF-8, empty and
    null texts (one empty chunk each)."""
    import ray.data as rd
    from buteo_ray.stages.text import chunk_documents

    rng = np.random.default_rng(5)
    vocab = ["aa", "b", "cccc", "ü", "日本", "x"]
    texts = [" ".join(rng.choice(vocab, size=int(n)))
             for n in rng.integers(1, 40, size=30)]
    texts += ["", " ".join(["t"] * 12), " ".join(["u"] * 13),
              " ".join(["v"] * 11)]  # around the 12-token boundary
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    df.loc[len(df)] = {"doc_id": 900, "text": None}

    out = (chunk_documents(rd.from_pandas(df).repartition(4),
                           chunk_tokens=12, overlap=4).to_pandas()
           .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))

    want = []
    for _, r in df.iterrows():
        toks = (r["text"] or "").split(" ")
        s, i = 0, 0
        while s < len(toks):
            w = toks[s:s + 12]
            want.append((r["doc_id"], i, " ".join(w), len(w)))
            s += 8
            i += 1
    got = list(map(tuple, out[["doc_id", "chunk_id", "chunk",
                               "n_tokens_chunk"]].to_numpy()))
    assert got == want
    # Overlap invariant: consecutive chunks share their boundary tokens.
    g0 = out[out["doc_id"] == 31]  # the 12-token doc
    if len(g0) > 1:
        first, second = g0["chunk"].iloc[0].split(" "), g0["chunk"].iloc[1].split(" ")
        assert first[8:] == second[:len(first) - 8]

    with pytest.raises(ValueError):
        chunk_documents(rd.from_pandas(df), chunk_tokens=8, overlap=8)


def test_duplicate_spans_hash_mode_matches_exact(ray_session_module):
    """exact=False (hash-only exchange, the 100-TB knob) returns the
    same spans as exact mode on a corpus where 64-bit collisions are
    statistically impossible."""
    import ray.data as rd
    from buteo_ray.stages.dedup import duplicate_spans

    rng = np.random.default_rng(11)
    alpha = list("abcd ")
    texts = ["".join(rng.choice(alpha, size=int(n)))
             for n in rng.integers(0, 150, size=60)]
    texts += [texts[0], texts[5]]
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(len(texts), dtype=np.int64),
         "text": texts})).repartition(5)

    a = duplicate_spans(ds, window=16, stride=8, exact=True).to_pandas()
    b = duplicate_spans(ds, window=16, stride=8, exact=False).to_pandas()
    key = ["doc_id", "pos"]
    assert (a[key].sort_values(key).reset_index(drop=True)
            .equals(b[key].sort_values(key).reset_index(drop=True)))
    assert len(a) > 0


def test_canonicalize_urls(ray_session_module):
    """Rule-by-rule: fragments, http/https default ports (non-default
    ports kept), trailing + duplicate slashes; null-safe."""
    import ray.data as rd
    from buteo_ray.stages.text import canonicalize_urls

    df = pd.DataFrame({"doc_id": range(6), "url": [
        "http://a.com:80/x#frag",
        "https://a.com:443//b//c/",
        "http://a.com:8080/keep",
        "https://x.io/",
        "http://a.b:80",
        None,
    ]})
    out = (canonicalize_urls(rd.from_pandas(df)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["url_canon"].tolist()[:5] == [
        "http://a.com/x",
        "https://a.com/b/c",
        "http://a.com:8080/keep",
        "https://x.io",
        "http://a.b",
    ]
    assert out["url_canon"].iloc[5] is None or pd.isna(out["url_canon"].iloc[5])


def test_canonicalize_urls_preserves_query_strings(ray_session_module):
    """Slash normalization must not touch query strings — slashes there
    are significant, and collapsing them would merge distinct URLs."""
    import ray.data as rd
    from buteo_ray.stages.text import canonicalize_urls

    df = pd.DataFrame({"doc_id": [1, 2, 3], "url": [
        "http://a.com/p?x=a//b",
        "http://a.com/p?q=1/",
        "http://a.com//p//q/?y=//z//",
    ]})
    out = (canonicalize_urls(rd.from_pandas(df)).to_pandas()
           .sort_values("doc_id"))
    assert out["url_canon"].tolist() == [
        "http://a.com/p?x=a//b",
        "http://a.com/p?q=1/",
        "http://a.com/p/q?y=//z//",
    ]


# ----------------------------------------------- char-n-gram LM scoring

def _brute_lm(texts, model_texts):
    """Direct per-doc mean log2 Laplace trigram prob, pure Python."""
    import collections
    import math

    cnt = collections.Counter()
    for t in model_texts:
        b = t.encode()
        for i in range(len(b) - 2):
            cnt[(b[i] << 16) | (b[i + 1] << 8) | b[i + 2]] += 1
    total = sum(cnt.values())
    out = []
    for t in texts:
        b = t.encode()
        codes = [(b[i] << 16) | (b[i + 1] << 8) | b[i + 2]
                 for i in range(len(b) - 2)]
        if not codes:
            out.append(0.0)
            continue
        m = sum(math.log2((cnt.get(c, 0) + 1.0) / (total + 2.0 ** 24))
                for c in codes) / len(codes)
        out.append(math.floor(m * 1e6 + 0.5) / 1e6)
    return out


def test_char_lm_score_matches_brute_force(ray_session):
    import ray.data as rd

    from buteo_ray.stages.text import add_lm_score, train_char_lm

    texts = ["the quick brown fox jumps over the lazy dog",
             "pack my box with five dozen liquor jugs",
             "aa",  # < 3 bytes -> no trigram -> 0.0
             "the the the the the"]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = rd.from_pandas(df)
    model = train_char_lm(ds)
    got = (add_lm_score(ds, model).to_pandas()
           .sort_values("doc_id")["lm_logp"].tolist())
    want = _brute_lm(texts, texts)
    assert got == pytest.approx(want, abs=1e-9)
    assert got[2] == 0.0


def test_char_lm_score_unseen_trigrams(ray_session):
    """Scoring against a model from a DIFFERENT corpus exercises the
    unseen-code smoothing path (count 0 -> 1/(total+V))."""
    import ray.data as rd

    from buteo_ray.stages.text import add_lm_score, train_char_lm

    model_texts = ["aaaa bbbb cccc"]
    score_texts = ["zzzz yyyy", "aaaa"]
    model = train_char_lm(rd.from_pandas(
        pd.DataFrame({"doc_id": [0], "text": model_texts})))
    ds = rd.from_pandas(pd.DataFrame(
        {"doc_id": range(len(score_texts)), "text": score_texts}))
    got = (add_lm_score(ds, model).to_pandas()
           .sort_values("doc_id")["lm_logp"].tolist())
    want = _brute_lm(score_texts, model_texts)
    assert got == pytest.approx(want, abs=1e-9)
    # unseen-only doc scores strictly below the in-model doc
    assert got[0] < got[1]


def test_char_lm_max_model_cap(ray_session):
    """The cap keeps the most frequent codes (count desc, code asc) and
    capped-out codes fall back to unseen smoothing."""
    import ray.data as rd

    from buteo_ray.stages.text import train_char_lm

    texts = ["aaaaaaaaaa", "abcd"]  # 'aaa' dominates
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [0, 1], "text": texts}))
    codes, counts, total = train_char_lm(ds, max_model=1)
    assert len(codes) == 1
    aaa = (ord("a") << 16) | (ord("a") << 8) | ord("a")
    assert codes[0] == aaa and counts[0] == 8
    # total is the UNCAPPED corpus mass: 8 + 2 ('abc','bcd')
    assert total == 10.0


def test_char_lm_score_trailing_short_doc(ray_session):
    """Regression: a batch ENDING in a < 3-byte doc must not truncate the
    previous doc's trigram sum (the reduceat sentinel path)."""
    import ray.data as rd

    from buteo_ray.stages.text import add_lm_score, train_char_lm

    texts = ["abcd", "aa"]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [0, 1], "text": texts}))
    model = train_char_lm(ds)
    got = (add_lm_score(ds, model).to_pandas()
           .sort_values("doc_id")["lm_logp"].tolist())
    want = _brute_lm(texts, texts)
    assert got == pytest.approx(want, abs=1e-9)
    assert got[1] == 0.0


def test_pack_sequences_modes(ray_session):
    import ray.data as rd

    from buteo_ray.stages.text import pack_sequences

    df = pd.DataFrame({
        "shard": [0, 0, 0, 0, 1, 1],
        "doc_id": [1, 2, 3, 4, 5, 6],
        "n_tokens": [300, 300, 300, 900, 100, 100],
    })
    # cumsum contract: bin = (running - own) // budget
    got = (pack_sequences(rd.from_pandas(df).repartition(3),
                          budget=512, mode="cumsum")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got["bin"].tolist() == [0, 0, 1, 1, 0, 0]
    # greedy: new bin when adding would exceed; over-budget doc alone
    got_g = (pack_sequences(rd.from_pandas(df).repartition(3),
                            budget=512, mode="greedy")
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert got_g["bin"].tolist() == [0, 1, 2, 3, 0, 0]
    # greedy never overruns budget except single over-budget docs
    sums = got_g.groupby(["shard", "bin"])["n_tokens"].sum()
    assert ((sums <= 512) | (got_g.groupby(["shard", "bin"])
                             .size() == 1).reindex(sums.index)).all()


def test_pack_sequences_null_tokens_raise(ray_session):
    import ray.data as rd

    from buteo_ray.stages.text import pack_sequences

    df = pd.DataFrame({"shard": [0], "doc_id": [1],
                       "n_tokens": [np.nan]})
    with pytest.raises(Exception, match="null token"):
        pack_sequences(rd.from_pandas(df), budget=10).to_pandas()


def test_pack_sequences_null_shard_raises(ray_session):
    import ray.data as rd

    from buteo_ray.stages.text import pack_sequences

    df = pd.DataFrame({"shard": [0.0, np.nan], "doc_id": [1, 2],
                       "n_tokens": [5, 5]})
    with pytest.raises(Exception, match="null shard"):
        pack_sequences(rd.from_pandas(df), budget=10).to_pandas()


def test_random_projection_preserves_similarity_order(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from buteo_ray.stages.ann import (_rp_signs, quantize,
                                      random_projection)

    rng = np.random.default_rng(9)
    base = rng.normal(0, 1, 64)
    # three vectors: near-dup of base, and an unrelated one
    vecs = np.stack([base, base + rng.normal(0, 0.01, 64),
                     rng.normal(0, 1, 64)]).astype(np.float32)
    t = pa.table({"vec_id": pa.array([0, 1, 2], pa.int64()),
                  "embedding": pa.array([v.tolist() for v in vecs],
                                        pa.list_(pa.float32()))})
    got = (random_projection(rd.from_arrow(t), out_dim=16)
           .to_pandas().pivot(index="vec_id", columns="dim",
                              values="proj").to_numpy())
    d01 = np.sum((got[0] - got[1]) ** 2)
    d02 = np.sum((got[0] - got[2]) ** 2)
    assert d01 < d02  # near-dup stays nearer after projection
    # exactness: matches the direct integer matmul
    S = _rp_signs(64, 16).astype(np.float64)
    want = (quantize(vecs.astype(np.float64)) @ S.T).astype(np.int64)
    assert (got == want).all()

    with pytest.raises(ValueError, match="out_dim"):
        random_projection(rd.from_arrow(t), out_dim=0)
