"""Exact edit-distance (Levenshtein) near-dup self-join — the
string-similarity member of the dedup family (SURVEY.md §2.10 /
beyond-reference training-data ops; complements MinHash/SimHash
which target long documents, where this targets short fields: names,
titles, URLs, OCR labels).

Algorithm: PassJoin partitioning (Li, Deng, Wang, Feng — VLDB'12;
public literature) re-expressed as Ray Data stages:

1. collapse to DISTINCT texts (edit distance is a function of the text
   alone — duplicate strings would re-verify the same DP millions of
   times; at web scale the distinct set is orders of magnitude smaller
   than the corpus);
2. every distinct text of length l ≥ k+1 is split into k+1 segments
   (pigeonhole: two strings within distance k share at least one
   segment VERBATIM, at a start offset within ±k). Index rows emit the
   (partner_len, seg_idx, seg_str) key per segment; probe rows emit
   the same key for every substring of the matching length within the
   ±k position window, for every partner length in [l−k, l]. Texts
   shorter than k+1 route through one dedicated short-strings bucket
   (they cannot be segmented; their partners are ≤ 2k chars).
   The ±k window is a slight superset of PassJoin's multi-match-aware
   window — exact, marginally more candidates, much simpler;
3. ``groupby(key)`` → within-group cross product index×probe =
   candidate text pairs (oriented shorter→longer, ties lexicographic,
   so each unordered pair is generated once per shared segment);
4. distinct candidates → vectorized banded-DP verification
   (anti-diagonal band of width 2k+1, numpy over the whole batch of
   pairs at once — no per-pair Python DP);
5. optional id expansion: same-text groups contribute C(m,2)
   distance-0 pairs; cross-text pairs expand through two equi-joins
   against the (text, id) map.

Distances are over UTF-8 BYTES (≡ characters for ASCII corpora —
matching DuckDB ``levenshtein`` on the test tables; documented
divergence for multi-byte text).

At 100 TB: shuffles touch only the distinct-text set (index rows
(k+1)×, probe rows O(k²)× that set) and the candidate pairs; the
corpus itself is scanned once for the distinct fold and once per
expansion join. Pinned bytes: none — every stage is a map or a
bucketed groupby. The id-level pair output is inherently quadratic in
duplicate-group size (a string duplicated m times yields C(m,2)
pairs); use the text-level form + group sizes when that bites.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa

_SHORT = -1  # seg_idx sentinel for the short-strings bucket


def _seg_bounds(l: int, k: int) -> "list[tuple[int, int]]":
    """PassJoin segment (start, len) scheme: k+1 segments, the first
    ``(k+1) - l % (k+1)`` of length ⌊l/(k+1)⌋, the rest one longer."""
    n = k + 1
    base = l // n
    n_short = n - (l % n)
    out, pos = [], 0
    for i in range(n):
        ln = base if i < n_short else base + 1
        out.append((pos, ln))
        pos += ln
    return out


def banded_levenshtein(a: np.ndarray, la: np.ndarray, b: np.ndarray,
                       lb: np.ndarray, k: int) -> np.ndarray:
    """Vectorized banded Levenshtein over P pairs at once.

    ``a``/``b``: (P, Lmax) uint8 matrices (0-padded), ``la``/``lb``
    true byte lengths. Returns (P,) int32 distances, with k+1 meaning
    "> k" (the band cannot resolve beyond k). The DP walks rows of the
    |i−j| ≤ k band; each row update is 2k+1 numpy ops over all pairs —
    no per-pair Python.
    """
    P = a.shape[0]
    if P == 0:
        return np.empty(0, np.int32)
    INF = np.int32(k + 1)
    W = 2 * k + 3  # band + one INF guard column each side
    prev = np.full((P, W), INF, np.int32)
    cur = np.full((P, W), INF, np.int32)
    # row 0: D[0, j] = j for j ≤ min(k, lb)
    for d in range(0, k + 1):
        prev[:, d + k + 1] = np.where(d <= lb, d, INF)
    imax = int(la.max()) if P else 0
    for i in range(1, imax + 1):
        cur.fill(INF)
        active = la >= i
        ai = a[:, i - 1]
        for d in range(-k, k + 1):
            j = i + d
            if j < 0:
                continue
            col = d + k + 1
            if j == 0:
                v = np.full(P, i, np.int32)
            elif j - 1 >= b.shape[1]:
                continue  # j beyond every lb in the batch
            else:
                cost = (ai != b[:, j - 1]).astype(np.int32)
                v = np.minimum(prev[:, col + 1] + 1,
                               np.minimum(prev[:, col] + cost,
                                          cur[:, col - 1] + 1))
            valid = active & (j <= lb)
            cur[:, col] = np.where(valid, np.minimum(v, INF), cur[:, col])
        # freeze finished pairs: their `prev` row already holds row la
        prev[active] = cur[active]
    d = lb - la
    dist = np.full(P, INF, np.int32)
    in_band = np.abs(d) <= k
    cols = np.clip(d + k + 1, 0, W - 1)
    dist[in_band] = prev[np.arange(P), cols][in_band]
    return np.minimum(dist, INF)


def _pack(texts: "list[bytes]") -> "tuple[np.ndarray, np.ndarray]":
    lens = np.fromiter((len(t) for t in texts), np.int32, len(texts))
    L = int(lens.max()) if len(texts) else 0
    mat = np.zeros((len(texts), L), np.uint8)
    for i, t in enumerate(texts):
        mat[i, :lens[i]] = np.frombuffer(t, np.uint8)
    return mat, lens


def verify_pairs_table(t: pa.Table, k: int, a_col: str = "text_a",
                       b_col: str = "text_b") -> pa.Table:
    """Batch-verify candidate pairs: keep rows with dist ≤ k, append
    ``dist:int32``."""
    ta = [s.encode() for s in t[a_col].to_pylist()]
    tb = [s.encode() for s in t[b_col].to_pylist()]
    a, la = _pack(ta)
    b, lb = _pack(tb)
    # pad the narrower matrix so column indexing is in range
    if a.shape[1] < b.shape[1]:
        a = np.pad(a, ((0, 0), (0, b.shape[1] - a.shape[1])))
    elif b.shape[1] < a.shape[1]:
        b = np.pad(b, ((0, 0), (0, a.shape[1] - b.shape[1])))
    dist = banded_levenshtein(a, la, b, lb, k)
    keep = dist <= k
    out = t.filter(pa.array(keep))
    return out.append_column("dist", pa.array(dist[keep], pa.int32()))


def _emit_keys(texts: "list[str]", k: int, probe: bool) -> pd.DataFrame:
    """Index rows (probe=False) or probe rows (probe=True) for the
    PassJoin groupby. Key = (plen, seg_idx, seg_str); orientation is
    shorter-indexes / longer-probes, equal lengths both (deduped by a
    lexicographic post-filter in the group stage)."""
    plens, segs, idxs, txts = [], [], [], []
    for s in texts:
        bs = s.encode()
        l = len(bs)
        if not probe:
            if l <= k:  # unsegmentable — short bucket
                plens.append(0); idxs.append(_SHORT); segs.append("")
                txts.append(s)
                continue
            for i, (p, ln) in enumerate(_seg_bounds(l, k)):
                plens.append(l); idxs.append(i)
                segs.append(bs[p:p + ln].decode("latin1"))
                txts.append(s)
        else:
            if l <= 2 * k:  # may partner with a short (≤ k) string
                plens.append(0); idxs.append(_SHORT); segs.append("")
                txts.append(s)
            for lp in range(max(k + 1, l - k), l + 1):
                for i, (p, ln) in enumerate(_seg_bounds(lp, k)):
                    lo = max(0, p - k)
                    hi = min(l - ln, p + k)
                    for q in range(lo, hi + 1):
                        plens.append(lp); idxs.append(i)
                        segs.append(bs[q:q + ln].decode("latin1"))
                        txts.append(s)
    return pd.DataFrame({"plen": np.asarray(plens, np.int32),
                         "seg_i": np.asarray(idxs, np.int32),
                         "seg": segs, "text": txts})


def edit_distance_text_pairs(texts_ds, text_col: str, max_dist: int = 2,
                             num_buckets: Optional[int] = None):
    """All UNORDERED pairs of DISTINCT texts with Levenshtein ≤
    ``max_dist`` (and > 0 — identical texts are the caller's
    duplicate-group concern). Input must already be distinct on
    ``text_col``. Returns Dataset[(text_a, text_b, dist:int32)] with
    ``(len, text)`` of a ≤ b (shorter first, ties lexicographic)."""
    from buteo_ray.stages.aggregate import bucketed_fold, bucketed_group_map

    k = int(max_dist)
    if k < 1:
        raise ValueError("max_dist must be ≥ 1 (use exact dedup for 0)")

    def _index_rows(t: pa.Table) -> pd.DataFrame:
        df = _emit_keys(t[text_col].to_pylist(), k, probe=False)
        df["side"] = np.int8(0)
        return df

    def _probe_rows(t: pa.Table) -> pd.DataFrame:
        df = _emit_keys(t[text_col].to_pylist(), k, probe=True)
        df["side"] = np.int8(1)
        return df

    import ray.data  # noqa: F401  (ds.union needs the module loaded)

    idx = texts_ds.map_batches(_index_rows, batch_format="pyarrow",
                               batch_size=None)
    prb = texts_ds.map_batches(_probe_rows, batch_format="pyarrow",
                               batch_size=None)

    def _candidates(g: pd.DataFrame) -> Optional[pd.DataFrame]:
        side = g["side"].to_numpy()
        ia = g.loc[side == 0, "text"].to_numpy()
        pb = g.loc[side == 1, "text"].to_numpy()
        if len(ia) == 0 or len(pb) == 0:
            return None
        # BYTE lengths (the orientation _emit_keys used), computed once
        # per group row, not per pair
        bla = np.fromiter((len(s.encode()) for s in ia), np.int32, len(ia))
        blb = np.fromiter((len(s.encode()) for s in pb), np.int32, len(pb))
        a = np.repeat(ia, len(pb))
        b = np.tile(pb, len(ia))
        la = np.repeat(bla, len(pb))
        lb = np.tile(blb, len(ia))
        # orient: index strictly shorter, or equal-length and lex-smaller
        keep = (la < lb) | ((la == lb) & (a < b))
        if not keep.any():
            return None
        return pd.DataFrame({"text_a": a[keep], "text_b": b[keep]})

    cand = bucketed_group_map(
        idx.union(prb), ["plen", "seg_i", "seg"], _candidates,
        num_buckets=num_buckets,
        empty=pd.DataFrame({"text_a": pd.Series([], dtype=str),
                            "text_b": pd.Series([], dtype=str)}))

    # distinct (a pair is generated once per shared segment) — one
    # bucketed fold, then verify each surviving candidate exactly once.
    def _distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["text_a", "text_b"])

    uniq = bucketed_fold(cand, ["text_a", "text_b"], _distinct,
                         num_buckets)

    def _verify(t: pa.Table) -> pa.Table:
        return verify_pairs_table(t, k)

    return uniq.map_batches(_verify, batch_format="pyarrow")


def edit_distance_pairs(ds, text_col: str, id_col: str, max_dist: int = 2,
                        num_buckets: Optional[int] = None):
    """Id-level near-dup pairs: all (id_a < id_b) with
    Levenshtein(text_a, text_b) ≤ ``max_dist``, INCLUDING exact
    duplicates (dist 0). Returns Dataset[(id_a, id_b, dist:int32)].

    Quadratic-in-duplicates caveat: a text repeated m times emits
    C(m,2) zero-distance pairs — prefer the text-level form plus group
    sizes when duplicate groups are huge.
    """
    from buteo_ray.stages.aggregate import (bucketed_fold,
                                            bucketed_group_map)

    k = int(max_dist)

    def _drop_null(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # null texts carry no edit-distance semantics — dropped, same
        # rule as edit_distance_pair_counts (they would otherwise
        # crash _emit_keys and emit bogus dist-0 pairs)
        return t.filter(pc.is_valid(t[text_col]))

    proj = ds.select_columns([id_col, text_col]).map_batches(
        _drop_null, batch_format="pyarrow", batch_size=None)

    # distinct texts (per-block Arrow distinct → bucketed fold)
    def _local_distinct(t: pa.Table) -> pa.Table:
        return t.select([text_col]).group_by([text_col]).aggregate([])

    def _fold_distinct(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates([text_col])

    texts = bucketed_fold(
        proj.map_batches(_local_distinct, batch_format="pyarrow",
                         batch_size=None),
        [text_col], _fold_distinct, num_buckets)

    # tp feeds the expansion twice; materialize it (pinned bytes: the
    # near-dup text-pair set) so the whole PassJoin sub-DAG runs once.
    # `proj` (the corpus scan) is reused three times and deliberately
    # NOT materialized — re-reading pruned parquet columns streams,
    # pinning the corpus would not.
    tp = edit_distance_text_pairs(texts, text_col, k,
                                  num_buckets).materialize()

    # dist-0 pairs from duplicate groups: C(m,2) per text group
    def _dup_pairs(g: pd.DataFrame) -> Optional[pd.DataFrame]:
        ids = np.sort(g[id_col].to_numpy())
        m = len(ids)
        if m < 2:
            return None
        iu, ju = np.triu_indices(m, 1)
        return pd.DataFrame({"id_a": ids[iu], "id_b": ids[ju],
                             "dist": np.full(len(iu), 0, np.int32)})

    zero = bucketed_group_map(
        proj, [text_col], _dup_pairs, num_buckets=num_buckets,
        empty=pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                            "id_b": pd.Series([], dtype=np.int64),
                            "dist": pd.Series([], dtype=np.int32)}))

    # cross-text expansion: two bucketed group-joins against the
    # (text, id) map (the engine's own machinery — Ray's Acero-backed
    # Dataset.join rejects the schemaless empty blocks a sparse pair
    # set produces; see join_partitioned.py's known-empty note).
    def _tag_map(key_name):
        def _fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                key_name: t[text_col],
                "side": pa.array(np.zeros(n, np.int8)),
                "id": t[id_col].cast(pa.int64()),
                "text_b": pa.array([""] * n, pa.string()),
                "dist": pa.array(np.zeros(n, np.int32)),
            })
        return _fn

    def _tag_pairs_a(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "text_a": t["text_a"],
            "side": pa.array(np.ones(n, np.int8)),
            "id": pa.array(np.zeros(n, np.int64)),
            "text_b": t["text_b"],
            "dist": t["dist"],
        })

    _EMPTY1 = pd.DataFrame({"text_b": pd.Series([], dtype=str),
                            "id_a": pd.Series([], dtype=np.int64),
                            "dist": pd.Series([], dtype=np.int32)})

    def _expand_a(g: pd.DataFrame) -> Optional[pd.DataFrame]:
        side = g["side"].to_numpy()
        ids = g.loc[side == 0, "id"].to_numpy()
        pr = g.loc[side == 1]
        if len(ids) == 0 or len(pr) == 0:
            return None
        m = len(pr)
        return pd.DataFrame({
            "text_b": np.tile(pr["text_b"].to_numpy(), len(ids)),
            "id_a": np.repeat(ids, m),
            "dist": np.tile(pr["dist"].to_numpy(), len(ids)),
        })

    stage1 = bucketed_group_map(
        proj.map_batches(_tag_map("text_a"), batch_format="pyarrow",
                         batch_size=None)
        .union(tp.map_batches(_tag_pairs_a, batch_format="pyarrow",
                              batch_size=None)),
        ["text_a"], _expand_a, num_buckets=num_buckets, empty=_EMPTY1)

    def _tag_map_b(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "text_b": t[text_col],
            "side": pa.array(np.zeros(n, np.int8)),
            "id": t[id_col].cast(pa.int64()),
            "id_a": pa.array(np.zeros(n, np.int64)),
            "dist": pa.array(np.zeros(n, np.int32)),
        })

    def _tag_pairs_b(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "text_b": t["text_b"],
            "side": pa.array(np.ones(n, np.int8)),
            "id": pa.array(np.zeros(n, np.int64)),
            "id_a": t["id_a"],
            "dist": t["dist"],
        })

    _EMPTY2 = pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                            "id_b": pd.Series([], dtype=np.int64),
                            "dist": pd.Series([], dtype=np.int32)})

    def _expand_b(g: pd.DataFrame) -> Optional[pd.DataFrame]:
        side = g["side"].to_numpy()
        ids = g.loc[side == 0, "id"].to_numpy()
        pr = g.loc[side == 1]
        if len(ids) == 0 or len(pr) == 0:
            return None
        m = len(pr)
        a = np.tile(pr["id_a"].to_numpy(), len(ids))
        b = np.repeat(ids, m)
        return pd.DataFrame({
            "id_a": np.minimum(a, b), "id_b": np.maximum(a, b),
            "dist": np.tile(pr["dist"].to_numpy(), len(ids)),
        })

    cross = bucketed_group_map(
        proj.map_batches(_tag_map_b, batch_format="pyarrow",
                         batch_size=None)
        .union(stage1.map_batches(_tag_pairs_b, batch_format="pyarrow",
                                  batch_size=None)),
        ["text_b"], _expand_b, num_buckets=num_buckets, empty=_EMPTY2)

    return zero.union(cross)


def _pair_counts_driver(cnt_df: pd.DataFrame, text_col: str,
                        k: int) -> pd.DataFrame:
    """Driver tier of :func:`edit_distance_pair_counts`: the same
    PassJoin keys + banded-DP kernels, run in-process over the (small)
    distinct-count table. Candidate join = ONE vectorized pandas merge
    on (plen, seg_i, seg) instead of a Ray shuffle."""
    texts = cnt_df[text_col].tolist()
    idx = _emit_keys(texts, k, probe=False)
    prb = _emit_keys(texts, k, probe=True)
    cand = idx.merge(prb, on=["plen", "seg_i", "seg"],
                     suffixes=("_a", "_b"))
    a = cand["text_a"].to_numpy()
    b = cand["text_b"].to_numpy()
    enc_a = [s.encode() for s in a]
    enc_b = [s.encode() for s in b]
    la = np.fromiter(map(len, enc_a), np.int64, len(enc_a))
    lb = np.fromiter(map(len, enc_b), np.int64, len(enc_b))
    keep = (la < lb) | ((la == lb) & (a < b))
    pairs = pd.DataFrame({"text_a": a[keep], "text_b": b[keep]})
    pairs = pairs.drop_duplicates(["text_a", "text_b"])
    if len(pairs):
        ta = [s.encode() for s in pairs["text_a"]]
        tb = [s.encode() for s in pairs["text_b"]]
        am, al = _pack(ta)
        bm, bl = _pack(tb)
        L = max(am.shape[1], bm.shape[1], 1)
        am = np.pad(am, ((0, 0), (0, L - am.shape[1])))
        bm = np.pad(bm, ((0, 0), (0, L - bm.shape[1])))
        dist = banded_levenshtein(am, al, bm, bl, k)
        pairs = pairs.loc[dist <= k].copy()
        pairs["dist"] = dist[dist <= k]
    else:
        pairs["dist"] = pd.Series([], dtype=np.int32)
    m = cnt_df.set_index(text_col)["__m"]
    pairs["n_pairs"] = (m.loc[pairs["text_a"]].to_numpy(np.int64)
                        * m.loc[pairs["text_b"]].to_numpy(np.int64)
                        if len(pairs) else
                        pd.Series([], dtype=np.int64))
    dups = cnt_df.loc[cnt_df["__m"] > 1]
    md = dups["__m"].to_numpy(np.int64)
    zero = pd.DataFrame({"text_a": dups[text_col].to_numpy(),
                         "text_b": dups[text_col].to_numpy(),
                         "dist": np.zeros(len(dups), np.int32),
                         "n_pairs": md * (md - 1) // 2})
    out = pd.concat([zero, pairs], ignore_index=True)
    out["dist"] = out["dist"].astype(np.int32)
    out["n_pairs"] = out["n_pairs"].astype(np.int64)
    return out[["text_a", "text_b", "dist", "n_pairs"]]


def edit_distance_pair_counts(ds, text_col: str, max_dist: int = 2,
                              num_buckets: Optional[int] = None,
                              driver_bytes: int = 64 << 20):
    """Scale-friendly aggregate form: one row per DISTINCT near-dup
    text pair with the id-pair multiplicity, instead of the (possibly
    quadratic) id-level expansion. Returns Dataset[(text_a, text_b,
    dist:int32, n_pairs:int64)] where ``n_pairs`` = m_a·m_b for
    cross-text pairs and C(m,2) for exact-duplicate groups
    (text_a == text_b, dist 0). Output volume is bounded by the
    distinct-text pair set — independent of duplication skew.
    """
    import ray

    from buteo_ray.stages.aggregate import bucketed_group_map

    k = int(max_dist)
    if k < 1:
        raise ValueError("max_dist must be ≥ 1 (use exact dedup for 0)")

    # Size-gated driver tier (the compact_cells / dup_clusters
    # pattern): per-block distinct counts are map-only; when that
    # partial table fits under ``driver_bytes``, the PassJoin merge +
    # banded DP run in-process with the SAME numpy kernels — a toy/
    # moderate distinct set pays zero Ray shuffles instead of six.
    # The distributed tier below engages above the gate and is
    # pytest-forced via driver_bytes=0.
    def _local_count(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # null texts carry no edit-distance semantics — dropped (both
        # tiers; documented)
        t = t.filter(pc.is_valid(t[text_col]))
        out = (t.select([text_col]).group_by([text_col])
               .aggregate([([], "count_all")]))
        return out.rename_columns([text_col, "__m"])

    partials = ds.select_columns([text_col]).map_batches(
        _local_count, batch_format="pyarrow",
        batch_size=None).materialize()
    if partials.size_bytes() < driver_bytes:
        pdf = partials.to_pandas()
        cnt_df = (pdf.groupby(text_col, sort=False, as_index=False)
                  ["__m"].sum())
        return ray.data.from_pandas(
            _pair_counts_driver(cnt_df, text_col, k))

    def _fold_cnt(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby([text_col], sort=False, dropna=False,
                          as_index=False)["__m"].sum())

    from buteo_ray.stages.aggregate import bucketed_fold as _bf

    cnt = _bf(partials, [text_col], _fold_cnt, num_buckets)
    # cnt feeds FOUR branches (text universe, two attach passes, the
    # dup-group arm) and tp two — materialize both or the lazy DAG
    # re-executes the distinct fold once per consumer (the
    # compact_cells lesson). Pinned bytes: cnt = one (text, int64) row
    # per DISTINCT text; tp = the near-dup text-pair set — both the
    # smallest tables in the plan by construction.
    cnt = cnt.materialize()
    tp = edit_distance_text_pairs(cnt.select_columns([text_col]),
                                  text_col, k, num_buckets).materialize()

    def _tag_cnt(key_name):
        def _fn(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                key_name: t[text_col],
                "side": pa.array(np.zeros(n, np.int8)),
                "m": t["__m"].cast(pa.int64()),
                "other": pa.array([""] * n, pa.string()),
                "dist": pa.array(np.zeros(n, np.int32)),
                "m_a": pa.array(np.zeros(n, np.int64)),
            })
        return _fn

    def _tag_tp_a(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "text_a": t["text_a"],
            "side": pa.array(np.ones(n, np.int8)),
            "m": pa.array(np.zeros(n, np.int64)),
            "other": t["text_b"],
            "dist": t["dist"],
            "m_a": pa.array(np.zeros(n, np.int64)),
        })

    _E1 = pd.DataFrame({"text_b": pd.Series([], dtype=str),
                        "text_a": pd.Series([], dtype=str),
                        "dist": pd.Series([], dtype=np.int32),
                        "m_a": pd.Series([], dtype=np.int64)})

    def _attach_a(g: pd.DataFrame) -> Optional[pd.DataFrame]:
        side = g["side"].to_numpy()
        maps = g.loc[side == 0]
        pr = g.loc[side == 1]
        if len(maps) == 0 or len(pr) == 0:
            return None
        m = int(maps["m"].iloc[0])  # cnt is distinct on text
        return pd.DataFrame({
            "text_b": pr["other"].to_numpy(),
            "text_a": pr["text_a"].to_numpy(),
            "dist": pr["dist"].to_numpy(),
            "m_a": np.full(len(pr), m, np.int64),
        })

    s1 = bucketed_group_map(
        cnt.map_batches(_tag_cnt("text_a"), batch_format="pyarrow",
                        batch_size=None)
        .union(tp.map_batches(_tag_tp_a, batch_format="pyarrow",
                              batch_size=None)),
        ["text_a"], _attach_a, num_buckets=num_buckets, empty=_E1)

    def _tag_s1(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "text_b": t["text_b"],
            "side": pa.array(np.ones(n, np.int8)),
            "m": pa.array(np.zeros(n, np.int64)),
            "other": t["text_a"],
            "dist": t["dist"],
            "m_a": t["m_a"],
        })

    _E2 = pd.DataFrame({"text_a": pd.Series([], dtype=str),
                        "text_b": pd.Series([], dtype=str),
                        "dist": pd.Series([], dtype=np.int32),
                        "n_pairs": pd.Series([], dtype=np.int64)})

    def _attach_b(g: pd.DataFrame) -> Optional[pd.DataFrame]:
        side = g["side"].to_numpy()
        maps = g.loc[side == 0]
        pr = g.loc[side == 1]
        if len(maps) == 0 or len(pr) == 0:
            return None
        m = int(maps["m"].iloc[0])
        return pd.DataFrame({
            "text_a": pr["other"].to_numpy(),
            "text_b": pr["text_b"].to_numpy(),
            "dist": pr["dist"].to_numpy(),
            "n_pairs": pr["m_a"].to_numpy() * m,
        })

    cross = bucketed_group_map(
        cnt.map_batches(_tag_cnt("text_b"), batch_format="pyarrow",
                        batch_size=None)
        .union(s1.map_batches(_tag_s1, batch_format="pyarrow",
                              batch_size=None)),
        ["text_b"], _attach_b, num_buckets=num_buckets, empty=_E2)

    def _dups(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        d = t.filter(pc.greater(t["__m"], 1))
        m = d["__m"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "text_a": d[text_col], "text_b": d[text_col],
            "dist": pa.array(np.zeros(len(d), np.int32)),
            "n_pairs": pa.array(m * (m - 1) // 2),
        })

    zero = cnt.map_batches(_dups, batch_format="pyarrow",
                           batch_size=None)
    return zero.union(cross)
