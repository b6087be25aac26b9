"""Full-text relevance retrieval over the documents table: BM25 top-k —
the ranked keyword-search primitive a corpus-exploration / eval-set
mining pipeline runs against a web crawl (the retrieval dual of the
decontamination and TF-IDF operators in :mod:`buteo_ray.stages.text`).

Okapi BM25 (Robertson & Zaragoza, FnTIR 2009 — public formula):

    score(d, Q) = Σ_{t∈Q} ln(1 + (N − df_t + 0.5)/(df_t + 0.5))
                  · tf_td·(k1+1) / (tf_td + k1·(1 − b + b·dl_d/avgdl))

All corpus statistics are computed in two streaming passes; nothing
corpus-sized is ever pinned:

  pass 1 — per-block partials for N (doc count), Σdl (token count) and
  df_t (docs containing t, distinct-per-block then summed): each block
  contributes ≤ 1 + |Q| tiny rows, folded driver-side (bounded by
  #blocks · |Q| — |Q| is a user query of a few terms, not data);
  pass 2 — scoring: tokens exploded per block, filtered to Q,
  tf via one hash aggregate, idf joined from a broadcast dict, per-doc
  sum; a per-block LOCAL top-k (combiner) so the global sort sees at
  most k rows per block.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def bm25_topk(ds, query_tokens: Sequence[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text", id_col: str = "doc_id"):
    """Top-``k`` documents by BM25 against ``query_tokens`` (exact
    whitespace-token match — the corpus tokenizer is the single-space
    split used engine-wide). Returns Dataset[(id_col, score8)] ordered
    by (score8 DESC, id ASC); ``score8`` is the score floored half-up
    at 8 dp so the ranking (and any SQL twin) is stable against libm
    ``ln`` ulps and per-term summation order. Documents containing no
    query token are absent (score 0 rows carry no information at
    corpus scale).
    """
    if k <= 0:
        raise ValueError(f"need k > 0 (got {k})")
    q: List[str] = list(dict.fromkeys(query_tokens))
    if not q:
        raise ValueError("bm25_topk: empty query")
    qarr = pa.array(q, pa.string())

    def _explode(t: pa.Table):
        toks = pc.split_pattern(pc.fill_null(t[text_col], ""), " ")
        n_tok = pc.list_value_length(toks).cast(pa.int64())
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        mask = pc.is_in(flat, value_set=qarr)
        return (n_tok, pa.table({"i": pc.filter(parent, mask),
                                 "tok": pc.filter(flat, mask)}))

    # -- pass 1: corpus stats + document frequencies (tiny partial rows)
    def _partial(t: pa.Table) -> pa.Table:
        n_tok, hits = _explode(t)
        dfp = (hits.group_by(["i", "tok"]).aggregate([])
               .group_by(["tok"]).aggregate([([], "count_all")])
               .rename_columns(["tok", "n"]))
        stats = pa.table({
            "tok": pa.array([None], pa.string()),
            "n": pa.array([len(t)], pa.int64()),
            "ntok": pa.array([int(pc.sum(n_tok).as_py() or 0)], pa.int64())})
        dfp = dfp.append_column("ntok", pa.array(np.zeros(len(dfp),
                                                          dtype=np.int64)))
        return pa.concat_tables([stats, dfp.select(["tok", "n", "ntok"])])

    # Driver fold of the partials: bounded by #blocks · (|Q| + 1) rows —
    # a user query of a few terms, never corpus-sized.
    part = ds.map_batches(_partial, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    stats = part[part["tok"].isna()]
    n_docs = float(stats["n"].sum())
    if n_docs == 0:
        raise ValueError("bm25_topk: empty corpus")
    avgdl = float(stats["ntok"].sum()) / n_docs
    dfs = (part[part["tok"].notna()].groupby("tok")["n"].sum())
    # idf of the Robertson/BM25+ form; natural log (ln in SQL).
    idf = {t: float(np.log(1.0 + (n_docs - c + 0.5) / (c + 0.5)))
           for t, c in dfs.items()}

    one_minus_b = 1.0 - b
    k1p1 = k1 + 1.0

    # -- pass 2: score + per-block local top-k (combiner)
    def _score(t: pa.Table) -> pd.DataFrame:
        n_tok, hits = _explode(t)
        if len(hits) == 0:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "score8": pd.Series([], dtype=np.float64)})
        g = hits.to_pandas()
        tf = (g.groupby(["i", "tok"], sort=False).size()
              .rename("tf").reset_index())
        dl = n_tok.to_numpy(zero_copy_only=False).astype(np.float64)
        tfv = tf["tf"].to_numpy(dtype=np.float64)
        dlv = dl[tf["i"].to_numpy()]
        idfv = tf["tok"].map(idf).to_numpy(dtype=np.float64)
        # Term shape mirrors the SQL twin literally: idf · (tf·(k1+1))
        # / (tf + k1·(1−b + b·dl/avgdl)).
        term = (idfv * (tfv * k1p1)
                / (tfv + k1 * (one_minus_b + b * dlv / avgdl)))
        sc = (pd.DataFrame({"i": tf["i"], "term": term})
              .groupby("i", sort=False)["term"].sum())
        ids = t[id_col].to_numpy(zero_copy_only=False)[sc.index.to_numpy()]
        s8 = np.floor(sc.to_numpy() * 1e8 + 0.5) / 1e8
        out = pd.DataFrame({id_col: ids, "score8": s8})
        return (out.sort_values(["score8", id_col],
                                ascending=[False, True], kind="stable")
                .head(k))

    scored = ds.map_batches(_score, batch_format="pyarrow",
                            batch_size=None)
    return scored.sort(["score8", id_col],
                       descending=[True, False]).limit(k)
