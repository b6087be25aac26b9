"""Byte-pair-encoding merge training (Sennrich, Haddow, Birch —
ACL'16; public literature) over a document Dataset: the tokenizer-prep
step of a pretraining pipeline.

BPE statistics depend only on the WORD-FREQUENCY table, so the corpus
collapses first: one bucketed count produces (word, count) — word
occurrences cross the wire once, as partial counts, never as text.
Merge ranks are then computed over that vocabulary:

* driver tier (vocab under ``driver_vocab_bytes``): the classic
  get-stats / merge-vocab loop on the collected vocab — identical to
  the reference algorithm, deterministic tiebreak (max count, then
  lexicographically smallest (left, right) pair);
* distributed tier: per merge iteration, a map emits per-shard
  adjacent-pair partial counts over the symbolized vocab, a bucketed
  fold sums them, and a driver-side top-1 (count desc, pair asc) picks
  the merge; the vocab Dataset is rewritten by a map applying the
  merge and re-materialized. State pinned per iteration = the vocab
  table (symbol lists + counts), never the corpus. O(n_merges)
  supersteps — the documented cost of training past the driver gate.

Words are SINGLE-SPACE tokens (the engine-wide token contract shared
with text.py:add_token_count — tabs/newlines stay inside a word; pass
normalized text for the published whitespace formulation); each word
is a char-symbol sequence with the terminal ``</w>`` marker. Ties at
equal counts break to the smallest (left, right) pair so both tiers
and any reference implementation agree bit-for-bit.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import pyarrow as pa

_EOW = "</w>"


def _word_counts(ds, text_col: str):
    """Distributed (word, count) vocabulary: per-block Arrow
    split+count partials, one bucketed fold."""
    import pyarrow.compute as pc

    from buteo_ray.stages.aggregate import bucketed_sum

    def _partial(t: pa.Table) -> pa.Table:
        toks = pc.split_pattern(t[text_col], " ")
        flat = pc.list_flatten(toks)
        out = (pa.table({"word": flat})
               .group_by(["word"]).aggregate([([], "count_all")]))
        return out.rename_columns(["word", "__n"])

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None)
    return bucketed_sum(partials, ["word"], {"n": "__n"})


def _symbolize(word: str) -> Tuple[str, ...]:
    return tuple(word) + (_EOW,)


def _pair_stats(vocab: "list[tuple[tuple, int]]"):
    stats: dict = {}
    for syms, n in vocab:
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            stats[p] = stats.get(p, 0) + n
    return stats


def _best_pair(stats: dict) -> Optional[Tuple[str, str]]:
    if not stats:
        return None
    # max count, ties to the lexicographically SMALLEST pair — the
    # deterministic rule both tiers and the oracle tests share
    return min(stats.items(), key=lambda kv: (-kv[1], kv[0]))[0]


def _apply_merge(syms: Tuple[str, ...], a: str, b: str,
                 ab: str) -> Tuple[str, ...]:
    out: List[str] = []
    i, L = 0, len(syms)
    while i < L:
        if i < L - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(ab)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(ds, text_col: str = "text", n_merges: int = 50,
              driver_vocab_bytes: int = 64 << 20,
              num_buckets: Optional[int] = None):
    """Learn ``n_merges`` BPE merges from the corpus. Returns
    Dataset[(rank:int64, left:string, right:string, n:int64)] — the
    merge table in rank order (``n`` = the pair's frequency when
    merged). Deterministic for a given corpus regardless of
    partitioning (the vocabulary count and the tiebreak are both
    order-free)."""
    import ray

    from buteo_ray.stages.aggregate import nonempty_arrow_blocks

    if n_merges <= 0:
        raise ValueError(f"n_merges must be positive, got {n_merges}")

    vocab_ds = _word_counts(ds, text_col).materialize()

    def _merge_table(merges: list) -> "pa.Table":
        # ONE epilogue for both tiers so their output schemas can
        # never desynchronize
        return pa.table({
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "n": pa.array([m[3] for m in merges], pa.int64()),
        })

    if vocab_ds.count() == 0:
        return ray.data.from_arrow(_merge_table([]))

    if (vocab_ds.size_bytes() or 0) <= driver_vocab_bytes:
        vt = pa.concat_tables(nonempty_arrow_blocks(vocab_ds))
        vocab = [(_symbolize(w), int(n)) for w, n in
                 zip(vt["word"].to_pylist(),
                     vt["n"].to_numpy(zero_copy_only=False))]
        merges = []
        for rank in range(n_merges):
            stats = _pair_stats(vocab)
            best = _best_pair(stats)
            if best is None:
                break
            a, b = best
            merges.append((rank, a, b, stats[best]))
            ab = a + b
            vocab = [(_apply_merge(s, a, b, ab), n) for s, n in vocab]
        return ray.data.from_arrow(_merge_table(merges))

    # --- distributed tier: vocab as Dataset[(syms:list<string>, n)] --
    from buteo_ray.stages.aggregate import bucketed_sum

    def _to_syms(t: pa.Table) -> pa.Table:
        words = t["word"].to_pylist()
        return pa.table({
            "syms": pa.array([list(_symbolize(w)) for w in words],
                             pa.list_(pa.string())),
            "n": t["n"],
        })

    cur = vocab_ds.map_batches(_to_syms, batch_format="pyarrow",
                               batch_size=None).materialize()

    def _pairs(t: pa.Table) -> pa.Table:
        ls, rs, cs = [], [], []
        ns = t["n"].to_numpy(zero_copy_only=False)
        for syms, n in zip(t["syms"].to_pylist(), ns):
            for i in range(len(syms) - 1):
                ls.append(syms[i])
                rs.append(syms[i + 1])
                cs.append(int(n))
        out = (pa.table({"l": pa.array(ls, pa.string()),
                         "r": pa.array(rs, pa.string()),
                         "__c": pa.array(cs, pa.int64())})
               .group_by(["l", "r"]).aggregate([("__c", "sum")]))
        return out.rename_columns(["l", "r", "__c"])

    merges = []
    for rank in range(n_merges):
        pair_counts = bucketed_sum(
            cur.map_batches(_pairs, batch_format="pyarrow",
                            batch_size=None),
            ["l", "r"], {"c": "__c"}, num_buckets)
        # top-1 via distributed sort (count desc, pair asc), limit 1
        top = pair_counts.sort(["c", "l", "r"],
                               descending=[True, False, False]) \
            .limit(1).to_pandas()
        if len(top) == 0:
            break
        a, b, cnt = str(top["l"][0]), str(top["r"][0]), int(top["c"][0])
        merges.append((rank, a, b, cnt))
        ab = a + b

        def _apply(t: pa.Table, _a=a, _b=b, _ab=ab) -> pa.Table:
            return pa.table({
                "syms": pa.array(
                    [list(_apply_merge(tuple(s), _a, _b, _ab))
                     for s in t["syms"].to_pylist()],
                    pa.list_(pa.string())),
                "n": t["n"],
            })

        cur = cur.map_batches(_apply, batch_format="pyarrow",
                              batch_size=None).materialize()

    return ray.data.from_arrow(_merge_table(merges))
