"""North-rule invariants: per-row text byte-identity through the whole
pipeline, and the exact-PiP join vs a from-first-principles brute force."""

import numpy as np
import pandas as pd
import pytest


def test_text_byte_identity_through_flagship(ray_session, sf_dir):
    """input_hint invariant: extracted text must be byte-identical per
    document through the full flagship chain (geocode → cells → join →
    tiles)."""
    import duckdb

    from buteo_ray.pipelines.flagship import flagship_pipeline

    out = flagship_pipeline(sf_dir).to_pandas()
    src = duckdb.connect().execute(
        f"SELECT doc_id, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchdf().set_index("doc_id")["text"]

    assert len(out) > 0
    for _, row in out.iterrows():
        expected = src.loc[row["doc_id"]]
        assert row["text"] == expected, f"text mutated for doc {row['doc_id']}"
        assert row["text"].encode() == expected.encode()


def test_pip_join_exact_vs_brute_force(ray_session):
    """Broadcast exact PiP join vs an independent brute force over every
    (point, polygon) pair using the pinned even-odd + boundary rule."""
    import ray.data as rd

    from buteo_ray.geom.predicates import points_in_polygon
    from buteo_ray.geom.wkb import parse_wkb
    from buteo_ray.sources.aoi import synth_aoi_polygons
    from buteo_ray.stages.geocode import geocode, hash_coords_from_ids
    from buteo_ray.stages.join import broadcast_pip_join

    n_docs, n_polys = 400, 80
    aoi = synth_aoi_polygons(n_polys)
    docs = pd.DataFrame({"doc_id": np.arange(n_docs)})
    got = broadcast_pip_join(geocode(rd.from_pandas(docs)), aoi, how="inner",
                             exact=True).select_columns(["doc_id", "aoi_id"]).to_pandas()
    got_pairs = set(zip(got["doc_id"], got["aoi_id"]))

    lat, lon = hash_coords_from_ids(np.arange(n_docs))
    expected = set()
    for j, wkb in enumerate(aoi["geom_wkb"].to_pylist()):
        kind, rings = parse_wkb(wkb)
        inside = points_in_polygon(lon, lat, rings)
        for i in np.nonzero(inside)[0]:
            expected.add((int(i), j))

    assert got_pairs == expected
    assert len(got) == len(expected)  # no duplicates


def test_flagship_partition_and_resume_consistency(ray_session, sf_dir, tmp_path):
    """Same rows whether returned directly or via the resumable sink."""
    from buteo_ray.pipelines.flagship import flagship_pipeline
    from buteo_ray.state.checkpoint import read_partitioned

    direct = flagship_pipeline(sf_dir).to_pandas()
    out_dir = str(tmp_path / "flag")
    flagship_pipeline(sf_dir, write_to=out_dir)
    written = read_partitioned(out_dir).to_pandas()

    key = lambda d: sorted(zip(d["doc_id"], d["aoi_id"], d["tile_x"], d["tile_y"]))
    assert key(direct) == key(written)


def test_training_data_pipeline(ray_session, tmp_path):
    """End-to-end: lang filter → quality → exact + near dedup → split →
    resumable write."""
    import pandas as pd
    import ray.data as rd

    from buteo_ray.pipelines.training_data import training_data_pipeline

    rows = []
    for i in range(60):
        base = "the cat and the dog sat in the house with the mouse " * 3
        rows.append({"page_id": i, "text": base + f"variant {i % 20}"})
    # Exact duplicates: ids 100..104 duplicate id 0's text.
    for i in range(100, 105):
        rows.append({"page_id": i, "text": rows[0]["text"]})
    # Junk rows: too short.
    for i in range(200, 205):
        rows.append({"page_id": i, "text": "short junk"})
    df = pd.DataFrame(rows)

    out = training_data_pipeline(
        rd.from_pandas(df), keep_langs={"en"}, min_tokens=10,
        near_dup_threshold=0.97, val_frac=0.2,
    ).to_pandas()

    assert (out["n_tokens"] >= 10).all()
    assert (out["lang_pred"] == "en").all()
    # Exact dupes collapsed to the min id.
    assert 0 in set(out["page_id"]) and not ({100, 101, 102} & set(out["page_id"]))
    # Near-dups (same variant text) deduped: each variant text appears once
    # unless the LSH threshold let distinct variants through.
    assert out["text"].duplicated().sum() == 0
    assert set(out["split"]) <= {"train", "val"}

    # Resumable write path.
    lineage = training_data_pipeline(
        rd.from_pandas(df), keep_langs={"en"}, min_tokens=10,
        near_dup_threshold=0.97, write_to=str(tmp_path / "td"),
    )
    assert {r["partition"] for r in lineage} <= {"train", "val"}


def test_training_data_pipeline_mixture(ray_session):
    """mixture_fractions: a zero-rate source vanishes, a rate-1.0 source
    passes untouched, and the stage composes with the rest of the chain
    (kept set is exactly the standalone mixture_sample intersection)."""
    import pandas as pd
    import ray.data as rd

    from buteo_ray.pipelines.training_data import training_data_pipeline

    rows = []
    for i in range(80):
        # Distinct-per-row filler so the near-dup stage has no pairs —
        # this test isolates the mixture stage.
        filler = " ".join(f"w{(i * 7919 + k * 104729) % 99991}"
                          for k in range(20))
        rows.append({"page_id": i,
                     "text": f"the cat sat {filler}",
                     "source": "keep" if i % 2 == 0 else "drop"})
    df = pd.DataFrame(rows)

    out = training_data_pipeline(
        rd.from_pandas(df), min_tokens=5, near_dup_threshold=0.99,
        mixture_fractions={"keep": 1.0},  # 'drop' absent → rate 0
    ).to_pandas()
    assert (out["source"] == "keep").all()
    assert set(out["page_id"]) == {i for i in range(80) if i % 2 == 0}


def test_training_data_pipeline_alt_near_dup_methods(ray_session):
    """The simhash and embedding near-dup modes drop planted near-dups
    end-to-end; an unknown mode fails loudly."""
    import pandas as pd
    import pytest as _pytest
    import ray.data as rd

    from buteo_ray.pipelines.training_data import training_data_pipeline

    rng = np.random.default_rng(23)
    vocab = [f"word{j}" for j in range(400)]
    rows = []
    for i in range(30):
        # Distinct random texts: far apart in SimHash space, unlike a
        # shared-boilerplate corpus where everything is a near-dup.
        words = rng.choice(vocab, size=60, replace=True)
        vec = rng.normal(size=8)
        rows.append({"page_id": i, "text": " ".join(words),
                     "embedding": vec.tolist()})
    # Planted near-dup of id 3: one-word change + near-identical vector.
    twin = dict(rows[3])
    twin["page_id"] = 500
    twin["text"] = "changed " + twin["text"].split(" ", 1)[1]
    twin["embedding"] = (np.asarray(rows[3]["embedding"]) + 1e-4).tolist()
    rows.append(twin)
    df = pd.DataFrame(rows)

    # Twin sits at hamming 8 under the FNV-polynomial token hashes;
    # nearest non-dup is at 24, so 10 stays selective.
    sim = training_data_pipeline(
        rd.from_pandas(df), min_tokens=5, near_dup_method="simhash",
        near_dup_hamming=10).to_pandas()
    assert 3 in set(sim["page_id"]) and 500 not in set(sim["page_id"])

    emb = training_data_pipeline(
        rd.from_pandas(df), min_tokens=5, near_dup_method="embedding",
        emb_col="embedding", near_dup_cosine=0.999).to_pandas()
    assert 3 in set(emb["page_id"]) and 500 not in set(emb["page_id"])
    # Distinct random vectors survive the 0.999 cut.
    assert len(emb) == 30

    with _pytest.raises(ValueError, match="near_dup_method"):
        training_data_pipeline(rd.from_pandas(df), near_dup_method="bogus")
    with _pytest.raises(ValueError, match="emb_col"):
        training_data_pipeline(rd.from_pandas(df), near_dup_method="embedding")


def test_training_pipeline_anti_paths_agree(ray_session):
    """The size-gated broadcast anti-filter and the partitioned Acero
    left-anti join drop exactly the same near-dup victims."""
    import pandas as pd
    import ray.data as rd

    from buteo_ray.pipelines.training_data import training_data_pipeline

    rows = []
    base = "the cat and the dog sat in the house with the mouse " * 3
    for i in range(40):
        rows.append({"page_id": i, "text": base + f"variant {i % 8}"})
    df = pd.DataFrame(rows)

    outs = []
    for thresh in ((64 << 20), 0):  # broadcast path, then forced Acero path
        out = training_data_pipeline(
            rd.from_pandas(df), keep_langs={"en"}, min_tokens=10,
            near_dup_threshold=0.9, drop_broadcast_threshold=thresh,
        ).to_pandas()
        outs.append(out.sort_values("page_id")[["page_id", "split"]]
                    .reset_index(drop=True))
    assert len(outs[0]) < len(df)  # near-dups were actually dropped
    assert outs[0].equals(outs[1])


def test_training_pipeline_scrub_and_repetition_gate(ray_session):
    """scrub_pii collapses docs differing only in an email into one exact
    duplicate, and max_dup_bigram_frac drops boilerplate rows."""
    import pandas as pd
    import ray.data as rd

    from buteo_ray.pipelines.training_data import training_data_pipeline

    base = "the cat and the dog sat in the house with the mouse today fine"
    rows = [
        {"page_id": 1, "text": base + " mail alice@example.com"},
        {"page_id": 2, "text": base + " mail bob@other.org"},     # dup after scrub
        {"page_id": 3, "text": "buy now " * 12 + "only the best deal today"},
        {"page_id": 4, "text": "the quick brown fox jumps over the lazy dog and sleeps well"},
    ]
    out = training_data_pipeline(
        rd.from_pandas(pd.DataFrame(rows)), keep_langs={"en"}, min_tokens=5,
        near_dup_threshold=0.99, scrub_pii=True, max_dup_bigram_frac=0.5,
    ).to_pandas()

    ids = set(out["page_id"])
    assert 1 in ids and 2 not in ids      # exact dup post-scrub, min id kept
    assert 3 not in ids                   # repetition gate
    assert 4 in ids
    assert out.loc[out["page_id"] == 1, "text"].iloc[0].endswith("mail <EMAIL>")
    assert (out["n_redactions"] >= 0).all()


def test_training_pipeline_chunking(ray_session):
    """chunk_tokens explodes docs into overlap windows AFTER the split:
    every chunk of one doc carries the same split label, and the chunk
    text column replaces the document text."""
    import pandas as pd
    import ray.data as rd

    from buteo_ray.pipelines.training_data import training_data_pipeline

    rows = [{"page_id": i,
             "text": " ".join(f"w{i}t{j}" for j in range(30)) +
                     " the and of to in is that it was for"}
            for i in range(12)]
    out = training_data_pipeline(
        rd.from_pandas(pd.DataFrame(rows)), keep_langs={"en"}, min_tokens=5,
        near_dup_threshold=0.99, chunk_tokens=16, chunk_overlap=4,
    ).to_pandas()

    assert {"chunk_id", "n_tokens_chunk", "text", "split"} <= set(out.columns)
    assert out.groupby("page_id")["chunk_id"].count().ge(2).all()  # 40 toks → 3 chunks
    assert (out["n_tokens_chunk"] <= 16).all()
    # split constant within a doc (chunked after the split)
    assert (out.groupby("page_id")["split"].nunique() == 1).all()
    # chunk text is at most 16 tokens of the original doc
    assert (out["text"].str.split(" ").str.len() == out["n_tokens_chunk"]).all()


def test_training_data_pipeline_cluster_drop(ray_session):
    """Star-shaped near-dup graph (hub has the LARGEST id): the default
    drop-id_b rule keeps both leaves; cluster_drop keeps exactly one
    doc per connected component."""
    import math

    import pandas as pd
    import ray.data as rd

    from buteo_ray.pipelines.training_data import training_data_pipeline

    def _unit(deg):
        a = math.radians(deg)
        return [math.cos(a), math.sin(a), 0.0, 0.0]

    # cos(17°)=0.956 ≥ 0.95 pairs each leaf with the hub; cos(34°)=0.829
    # keeps the leaves unpaired — a pure star through doc 2.
    rows = pd.DataFrame({
        "page_id": [0, 1, 2, 3],
        "text": [
            "leaf one text with plenty of distinct tokens for quality "
            "gates one two three four five",
            "leaf two text with plenty of distinct tokens for quality "
            "gates six seven eight nine ten",
            "hub text with plenty of distinct tokens for quality gates "
            "eleven twelve thirteen fourteen fifteen",
            "unrelated document with plenty of distinct tokens for the "
            "quality gates sixteen seventeen eighteen nineteen twenty",
        ],
        "emb": [_unit(17), _unit(-17), _unit(0), [0.0, 0.0, 1.0, 0.0]],
    })

    kw = dict(min_tokens=5, near_dup_method="embedding", emb_col="emb",
              near_dup_cosine=0.95, val_frac=0.0)
    default = training_data_pipeline(rd.from_pandas(rows), **kw).to_pandas()
    assert set(default["page_id"]) == {0, 1, 3}  # hub (max id) dropped only

    clustered = training_data_pipeline(rd.from_pandas(rows),
                                       cluster_drop=True, **kw).to_pandas()
    assert set(clustered["page_id"]) == {0, 3}  # one rep per component


def test_training_pipeline_para_dedup_stage(ray_session):
    """para_dedup_tokens collapses repeated boilerplate within docs so
    repetition-only variants fall to the exact-dedup stage."""
    import pandas as pd
    import ray.data as rd

    from buteo_ray.pipelines.training_data import training_data_pipeline

    para = "the cat and the dog sat in the house with the mouse and ate"
    rows = [
        # same paragraph repeated 2x vs 4x: cleaned text identical
        {"page_id": 0, "text": " ".join([para] * 2)},
        {"page_id": 1, "text": " ".join([para] * 4)},
        # a distinct doc that must survive
        {"page_id": 2, "text": ("a completely different sentence about "
                                "rivers and maps and tiles and the long "
                                "road home tonight")},
    ]
    df = pd.DataFrame(rows)
    out = training_data_pipeline(
        rd.from_pandas(df), min_tokens=5, near_dup_threshold=0.99,
        para_dedup_tokens=14, val_frac=0.0).to_pandas()
    kept = set(out["page_id"])
    assert 0 in kept and 1 not in kept and 2 in kept
    assert (out.loc[out["page_id"] == 0, "text"].iloc[0] == para)

    # default off: text passes through unmodified (the near-dup LSH
    # stage still drops the repetition variant — they share shingles)
    out2 = training_data_pipeline(
        rd.from_pandas(df), min_tokens=5, near_dup_threshold=0.99,
        val_frac=0.0).to_pandas()
    assert (out2.loc[out2["page_id"] == 0, "text"].iloc[0]
            == " ".join([para] * 2))
