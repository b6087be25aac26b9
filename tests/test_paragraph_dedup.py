"""dedup_paragraphs (corpus-wide CCNet paragraph dedup) and
drop_repeated_paras (within-doc, map-only) vs explicit-loop references —
byte-exact string equality, including fully-duplicated docs, short docs,
empty texts and multi-block partitioning."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from buteo_ray.stages.dedup import dedup_paragraphs
from buteo_ray.stages.text import drop_repeated_paras

K = 4  # small window so repeats are easy to engineer


def _paras(text: str):
    toks = text.split(" ")
    return [" ".join(toks[i:i + K]) for i in range(0, len(toks), K)]


def _ref_within(text: str):
    seen, kept = set(), []
    for p in _paras(text):
        if p not in seen:
            seen.add(p)
            kept.append(p)
    return " ".join(kept), len(_paras(text)), len(kept)


def _ref_global(docs):
    """docs: list[(id, text)] → {id: (text_clean, n_kept)} (docs with
    zero survivors absent)."""
    first = {}
    for i, text in sorted(docs):
        for j, p in enumerate(_paras(text)):
            if p not in first:
                first[p] = (i, j)
    out = {}
    for i, text in docs:
        kept = [p for j, p in enumerate(_paras(text))
                if first[p] == (i, j)]
        if kept:
            out[i] = (" ".join(kept), len(kept))
    return out


def _corpus():
    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "x", "yy", "zzz"]
    docs = []
    for i in range(60):
        n = int(rng.integers(1, 40))
        toks = [vocab[int(v)] for v in rng.integers(0, len(vocab), n)]
        docs.append((i, " ".join(toks)))
    # Engineered cases: exact duplicate of doc 0 (must vanish from the
    # global dedup), a doc repeating one window 4x, a short doc, an
    # empty doc, and a doc duplicating doc 1's first window.
    docs.append((100, docs[0][1]))
    docs.append((101, " ".join(["alpha beta gamma delta"] * 4)))
    docs.append((102, "beta"))
    docs.append((103, ""))
    first_para_of_1 = _paras(docs[1][1])[0]
    docs.append((104, first_para_of_1 + " zzz zzz zzz zzz"))
    return docs


@pytest.mark.parametrize("k", [1, 4, 7])
def test_drop_repeated_paras_matches_reference(ray_session, k):
    global K
    K0, K = K, k
    try:
        docs = _corpus()
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs])})).repartition(5)
        got = (drop_repeated_paras(ds, para_tokens=k).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert len(got) == len(docs)  # map-only: no row disappears
        for _, r in got.iterrows():
            text, n_in, n_kept = _ref_within(dict(docs)[r["doc_id"]])
            assert r["text"] == text
            assert r["n_paras_in"] == n_in
            assert r["n_paras_kept"] == n_kept
    finally:
        K = K0


def test_drop_repeated_paras_all_same_windows(ray_session):
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["a b c d a b c d a b c d"])}))
    got = drop_repeated_paras(ds, para_tokens=K).to_pandas()
    assert got["text"][0] == "a b c d"
    assert got["n_paras_in"][0] == 3 and got["n_paras_kept"][0] == 1


def test_drop_repeated_paras_rejects_bad_window():
    with pytest.raises(ValueError):
        drop_repeated_paras(None, para_tokens=0)


@pytest.mark.parametrize("k", [1, 4, 7])
def test_dedup_paragraphs_matches_reference(ray_session, k):
    global K
    K0, K = K, k
    try:
        _run_dedup_paragraphs_case(k)
    finally:
        K = K0


def _run_dedup_paragraphs_case(k):
    docs = _corpus()
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs])})).repartition(5)
    got = (dedup_paragraphs(ds, para_tokens=k).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    ref = _ref_global(docs)
    assert sorted(got["doc_id"]) == sorted(ref)
    for _, r in got.iterrows():
        text, n_kept = ref[r["doc_id"]]
        assert r["text_clean"] == text
        assert r["n_paras_kept"] == n_kept
    # the byte-identical duplicate of doc 0 must have vanished entirely
    assert 100 not in set(got["doc_id"])


def test_dedup_paragraphs_within_doc_repeat_collapses(ray_session):
    # Within-doc repeats are the (id, idx) special case: earlier wins.
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["p q r s p q r s tail"])}))
    got = dedup_paragraphs(ds, para_tokens=K).to_pandas()
    assert got["text_clean"][0] == "p q r s tail"
    assert got["n_paras_kept"][0] == 2
