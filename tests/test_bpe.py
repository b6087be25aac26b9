"""BPE merge training: both tiers vs an independent reference
implementation (classic get_stats/merge_vocab over a dict — Sennrich
et al. ACL'16) and a handcrafted expected-merge corpus."""

import collections

import pandas as pd
import pytest
import ray.data as rd

from buteo_ray.stages.bpe import bpe_train


def _ref_bpe(texts, n_merges):
    vocab = collections.Counter()
    for t in texts:
        for w in t.split(" "):
            vocab[tuple(w) + ("</w>",)] += 1
    merges = []
    for rank in range(n_merges):
        stats = collections.Counter()
        for syms, n in vocab.items():
            for i in range(len(syms) - 1):
                stats[(syms[i], syms[i + 1])] += n
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, best[0], best[1], stats[best]))
        new = collections.Counter()
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if (i < len(syms) - 1 and syms[i] == best[0]
                        and syms[i + 1] == best[1]):
                    out.append(best[0] + best[1])
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] += n
        vocab = new
    return merges


TEXTS = ["low low low low low", "lower lower", "newest newest newest",
         "newest newest newest", "widest widest widest", "low lowest"]


@pytest.mark.parametrize("gate", [64 << 20, 0])
def test_bpe_matches_reference(ray_session, gate):
    df = pd.DataFrame({"text": TEXTS})
    got = (bpe_train(rd.from_pandas(df).repartition(3), "text",
                     n_merges=8, driver_vocab_bytes=gate)
           .to_pandas().sort_values("rank").reset_index(drop=True))
    want = _ref_bpe(TEXTS, 8)
    assert list(map(tuple, got.to_numpy().tolist())) == want


def test_bpe_first_merges_handcrafted(ray_session):
    # "aa aa aa" → word (a, a, </w>) ×3: pairs (a,a):3 and (a,</w>):3
    # TIE — the documented rule picks the lexicographically smallest
    # pair, and '<' sorts before 'a', so (a, </w>) merges first;
    # the word becomes (a, a</w>) and (a, a</w>):3 merges second.
    df = pd.DataFrame({"text": ["aa aa aa"]})
    got = (bpe_train(rd.from_pandas(df), "text", n_merges=2)
           .to_pandas().sort_values("rank").reset_index(drop=True))
    assert got[["left", "right"]].values.tolist() == [
        ["a", "</w>"], ["a", "a</w>"]]
    assert got["n"].tolist() == [3, 3]


def test_bpe_empty_and_validation(ray_session):
    empty = rd.from_pandas(pd.DataFrame({"text": pd.Series([], dtype=str)}))
    assert bpe_train(empty, "text", 3).count() == 0
    with pytest.raises(ValueError, match="n_merges"):
        bpe_train(empty, "text", 0)
