"""Similarity search over an embedding column (``list<float>``).

- :func:`ann_cosine_topk` — brute-force cosine top-k: the query matrix is
  broadcast once, every batch does one matmul against it and emits its
  per-query partial top-k; a tiny ``groupby(query)`` merge finishes. The
  baseline ANN path per the task brief; exact.
- :func:`lsh_bucket_assign` — random-hyperplane LSH bucketing (Charikar
  2002; hyperplanes derived deterministically from splitmix64 streams):
  the scale path — bucket co-location turns all-pairs search into
  per-bucket search. Recall measured in tests, not promised.

Exactness trick for the DuckDB oracle: embeddings are quantized
``q = floor(x·1000 + 0.5)`` (float64, exact). Dot products and norms of
integer-valued doubles are ORDER-INDEPENDENT exact (all partial sums are
integers < 2^53), so numpy matmul (any blocking) and DuckDB
``list_dot_product`` produce bit-identical cosines after the final
division — no rounding slop in the comparison.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa


def quantize(emb: np.ndarray) -> np.ndarray:
    """float32/64 (N, D) → integer-valued float64 (×1000, half-up)."""
    return np.floor(emb.astype(np.float64) * 1000.0 + 0.5)


def _emb_matrix(batch: pa.Table, col: str) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if len(arr) == 0:
        return np.empty((0, 0), dtype=np.float64)
    if hasattr(arr, "flatten"):  # list<float> layout (parquet)
        flat = arr.flatten().to_numpy(zero_copy_only=False)
        d = len(arr[0])
        return flat.reshape(-1, d)
    # Ray's ArrowTensorArray layout (ndarray column from pandas blocks)
    return np.asarray(arr.to_numpy(zero_copy_only=False), dtype=np.float64)


def ann_cosine_topk(
    ds,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    quantized: bool = True,
):
    """Exact cosine top-k of broadcast queries vs the streaming embedding
    Dataset. Returns Dataset[(query_id, neighbor_id, cos_sim)], ties by
    neighbor_id ascending, self-matches excluded."""
    qid = np.asarray(query_ids, dtype=np.int64)
    q = quantize(np.asarray(query_vecs)) if quantized else np.asarray(query_vecs, np.float64)
    qnorm = np.sqrt((q * q).sum(axis=1))

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(_EMPTY_TOPK)
        e = _emb_matrix(batch, emb_col)
        e = quantize(e) if quantized else e.astype(np.float64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        dots = e @ q.T                      # (B, Q) — integer-exact
        enorm = np.sqrt((e * e).sum(axis=1))
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = dots / (enorm[:, None] * qnorm[None, :])
        cos = np.where(ids[:, None] == qid[None, :], -np.inf, cos)
        qcol, ncol, scol = _partial_topk_arrays(ids, cos, qid, k)
        return pa.table({"query_id": qcol, "neighbor_id": ncol,
                         "cos_sim": scol})

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return _topk_merge(g, k)

    from buteo_ray.stages.aggregate import bucketed_group_map

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None)
    # Query sets can reach 1e5+ at scale: bucketed routing for the
    # per-query merge, never one Ray group per query.
    return bucketed_group_map(partials, ["query_id"], _final)


def _hyperplanes(dim: int, nbits: int, table: int = 0,
                 quant: Optional[float] = None) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes from splitmix64 streams
    (uniform in [-1, 1), fixed for a given (dim, nbits, table)).

    ``quant`` (e.g. 1000) rounds coefficients to integer-valued float64
    (half-up, like :func:`quantize`): with quantized embeddings every
    sign test ``e · p > 0`` is then exact integer arithmetic —
    order-independent and bit-replayable by a SQL oracle — at a
    negligible direction perturbation (< 0.05% per coefficient)."""
    from buteo_ray.stages.dedup import _splitmix64

    idx = np.arange(dim * nbits, dtype=np.uint64) + np.uint64(table * dim * nbits)
    u = _splitmix64(idx).astype(np.float64) / 2.0**64
    planes = (u * 2.0 - 1.0).reshape(nbits, dim)
    if quant is not None:
        planes = np.floor(planes * float(quant) + 0.5)
    return planes


def _bucket_ids(e: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """(N, D) × (nbits, D) hyperplanes → uint64 sign-bit bucket ids."""
    signs = (e @ planes.T) > 0
    bucket = np.zeros(e.shape[0], dtype=np.uint64)
    for b in range(planes.shape[0]):
        bucket |= signs[:, b].astype(np.uint64) << np.uint64(b)
    return bucket


def _topk_merge(g: pd.DataFrame, k: int) -> pd.DataFrame:
    """Deterministic per-query merge shared by the exact and LSH paths:
    cos_sim desc, neighbor_id asc, head(k) — the tie rule the DuckDB
    oracle encodes; one definition so the two paths cannot diverge."""
    g = g.sort_values(["cos_sim", "neighbor_id"], ascending=[False, True],
                      kind="stable").head(k)
    return g.reset_index(drop=True)


_EMPTY_TOPK = {"query_id": np.empty(0, np.int64),
               "neighbor_id": np.empty(0, np.int64),
               "cos_sim": np.empty(0, np.float64)}


def _partial_topk_arrays(ids: np.ndarray, cos: np.ndarray,
                         qids: np.ndarray, k: int):
    """Per-query partial-top-k emit shared by the exact, LSH, and IVF
    search paths: ``cos`` is (N, Q) with self-matches pre-masked to
    -inf; per query, lexsort (cos desc, neighbor_id asc) — the
    deterministic tie rule the DuckDB oracle uses — take k, drop
    non-finite. ONE definition (like :func:`_topk_merge` on the merge
    side) so a tie/self-match fix cannot leave a path diverging.
    Returns (query_id, neighbor_id, cos_sim) arrays."""
    kk = min(k, cos.shape[0])
    out_q, out_n, out_s = [], [], []
    for col in range(cos.shape[1]):
        order = np.lexsort((ids, -cos[:, col]))[:kk]
        sim = cos[order, col]
        fin = np.isfinite(sim)
        out_q.append(np.full(int(fin.sum()), qids[col]))
        out_n.append(ids[order[fin]])
        out_s.append(sim[fin])
    if not out_q:
        return (_EMPTY_TOPK["query_id"], _EMPTY_TOPK["neighbor_id"],
                _EMPTY_TOPK["cos_sim"])
    return (np.concatenate(out_q), np.concatenate(out_n),
            np.concatenate(out_s))


def lsh_bucket_assign(ds, nbits: int = 16, emb_col: str = "embedding",
                      out_col: str = "lsh_bucket"):
    """Append a random-hyperplane LSH bucket id (uint64 of sign bits).
    Cosine-near vectors collide with high probability; downstream ANN
    groups by bucket (the co-location/scale path)."""
    planes_cache = {}

    def _fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column(out_col, pa.array(np.empty(0, np.int64)))
        e = _emb_matrix(batch, emb_col).astype(np.float64)
        d = e.shape[1]
        if d not in planes_cache:
            planes_cache[d] = _hyperplanes(d, nbits)
        # Shared _bucket_ids so this path can never desynchronize from
        # ann_lsh_topk's bucket derivation (same tables by construction).
        bucket = _bucket_ids(e, planes_cache[d])
        # int64 view: the bucket is a downstream group key (uint64 keys
        # hit Ray's pickled-object fallback).
        return batch.append_column(out_col, pa.array(bucket.view(np.int64)))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def _probe_buckets(bucket: int, nbits: int, probe_bits: int) -> list:
    """Multi-probe expansion: all buckets within Hamming distance
    ``probe_bits`` of ``bucket`` (0 → just the bucket; 1 → +nbits
    single-bit flips). Distances beyond 2 are not implemented — reject
    loudly rather than silently delivering lower recall than asked."""
    if probe_bits > 2:
        raise ValueError("probe_bits > 2 is not supported (implemented "
                         "expansions: Hamming distance 0, 1, 2)")
    out = [bucket]
    if probe_bits >= 1:
        out.extend(bucket ^ (1 << b) for b in range(nbits))
    if probe_bits >= 2:
        for b1 in range(nbits):
            for b2 in range(b1 + 1, nbits):
                out.append(bucket ^ (1 << b1) ^ (1 << b2))
    return out


def ann_lsh_topk(
    ds,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
    nbits: int = 8,
    n_tables: int = 4,
    probe_bits: int = 1,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    quantized: bool = True,
    plane_quant: Optional[float] = None,
):
    """End-to-end bucketed ANN search (the scale path composing
    :func:`lsh_bucket_assign`'s hyperplane buckets into a per-bucket
    top-k): queries are bucketed once on the driver — ``n_tables``
    independent hyperplane tables, multi-probe expansion per table — and
    broadcast; each corpus batch buckets its rows with the SAME tables
    and scores only rows whose bucket matches some query's probe set in
    ANY table (standard multi-table LSH candidate union); a tiny
    ``groupby(query_id)`` merges partial top-ks.

    No shuffle at all — the candidate generation is a broadcast bucket
    join inside ``map_batches``, so corpus flow is identical to the
    exact path but each batch matmuls only its candidate rows. Recall
    is measured in tests (vs :func:`ann_cosine_topk`), not promised.
    For huge query sets (too big to broadcast), reshape into a
    ``union`` + ``groupby(lsh_bucket)`` co-partitioned plan instead.
    Returns Dataset[(query_id, neighbor_id, cos_sim)]."""
    import ray

    qid = np.asarray(query_ids, dtype=np.int64)
    q = quantize(np.asarray(query_vecs)) if quantized else np.asarray(query_vecs, np.float64)
    qnorm = np.sqrt((q * q).sum(axis=1))
    tables = [_hyperplanes(q.shape[1], nbits, t, quant=plane_quant)
              for t in range(n_tables)]
    # Per table, a CSR probe index over the query set: sorted unique
    # probe buckets `keys`, segment offsets `seg_off`, query indices
    # `qidx` — so corpus batches match buckets with one searchsorted
    # instead of Python dict/set churn on the probe hot path.
    probe_tabs = []
    for t, planes in enumerate(tables):
        qbucket = _bucket_ids(q, planes)
        plists = [_probe_buckets(int(qbucket[qi]), nbits, probe_bits)
                  for qi in range(q.shape[0])]
        bks = np.array([bk for pl in plists for bk in pl], dtype=np.int64)
        # Repeat by ACTUAL per-query probe counts, so a future
        # variable-length / deduped probe expansion can't misalign
        # query/bucket pairs.
        qis = np.repeat(np.arange(q.shape[0], dtype=np.int64),
                        [len(pl) for pl in plists])
        order = np.lexsort((qis, bks))
        bks, qis = bks[order], qis[order]
        keys, starts = np.unique(bks, return_index=True)
        probe_tabs.append((keys, np.concatenate([starts, [len(bks)]]), qis))
    state_ref = ray.put((qid, q, qnorm, tables, probe_tabs))

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(_EMPTY_TOPK)
        qid_, q_, qnorm_, tables_, tabs_ = ray.get(state_ref)
        e = _emb_matrix(batch, emb_col)
        e = quantize(e) if quantized else e.astype(np.float64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        n_rows = e.shape[0]
        # Candidate union across tables: (query, row) pair arrays built
        # by sorted-key intersection — no per-row Python objects.
        pair_q, pair_r = [], []
        for t, planes in enumerate(tables_):
            keys, seg_off, qidx = tabs_[t]
            if len(keys) == 0:
                continue
            bucket = _bucket_ids(e, planes).astype(np.int64)
            pos = np.searchsorted(keys, bucket)
            pos_c = np.minimum(pos, len(keys) - 1)
            hit = np.nonzero(keys[pos_c] == bucket)[0]
            if hit.size == 0:
                continue
            ki = pos_c[hit]
            counts = seg_off[ki + 1] - seg_off[ki]
            total = int(counts.sum())
            starts_rep = np.repeat(seg_off[ki], counts)
            local = np.arange(total, dtype=np.int64) - np.repeat(
                np.cumsum(counts) - counts, counts)
            pair_q.append(qidx[starts_rep + local])
            pair_r.append(np.repeat(hit, counts))
        if not pair_q:
            return pa.table(_EMPTY_TOPK)
        # Dedup pairs across tables via one packed-key unique.
        packed = np.unique(np.concatenate(pair_q) * n_rows
                           + np.concatenate(pair_r))
        qi_u, row_u = np.divmod(packed, n_rows)
        enorm = np.sqrt((e * e).sum(axis=1))
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = ((e[row_u] * q_[qi_u]).sum(axis=1)
                   / (enorm[row_u] * qnorm_[qi_u]))
        cos = np.where(ids[row_u] == qid_[qi_u], -np.inf, cos)
        # Per-query top-k over the sorted pair segments. Tie rule must
        # match _partial_topk_arrays / _topk_merge / the DuckDB oracle:
        # cos desc, neighbor_id asc — NOT batch row position, or a
        # non-id-sorted corpus batch could keep a larger-id neighbor
        # over a tied smaller-id one at the rank-k boundary.
        order = np.lexsort((ids[row_u], -cos, qi_u))
        qs, cs, rs = qi_u[order], cos[order], row_u[order]
        seg_start = np.concatenate([[0], np.nonzero(np.diff(qs))[0] + 1])
        seg_len = np.diff(np.concatenate([seg_start, [len(qs)]]))
        rank = np.arange(len(qs), dtype=np.int64) - np.repeat(seg_start, seg_len)
        # Mirror the exact path's finiteness rule (_partial_topk_arrays):
        # -inf self-matches and NaN cosines (zero-norm embeddings) must
        # never reach the merge, or queries with < k finite candidates
        # would emit self-match / NaN rows.
        keep = (rank < k) & np.isfinite(cs)
        return pa.table({
            "query_id": qid_[qs[keep]],
            "neighbor_id": ids[rs[keep]],
            "cos_sim": cs[keep],
        })

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return _topk_merge(g, k)

    from buteo_ray.stages.aggregate import bucketed_group_map

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None)
    # Query sets can reach 1e5+ at scale: bucketed routing for the
    # per-query merge, never one Ray group per query.
    return bucketed_group_map(partials, ["query_id"], _final)


def _spherical_kmeans(X: np.ndarray, k: int, iters: int = 10,
                      seed: int = 13) -> np.ndarray:
    """Deterministic spherical k-means (unit-norm centroids, cosine
    assignment) on a driver-side sample. Pure numpy Lloyd iterations;
    empty clusters are re-seeded to the currently worst-served point."""
    rng = np.random.default_rng(seed)
    norms = np.linalg.norm(X, axis=1)
    Xn = X[norms > 0] / norms[norms > 0, None]
    k = min(k, Xn.shape[0])
    if k == 0:   # empty / all-zero-norm sample: no centroids to fit
        return np.zeros((0, X.shape[1] if X.ndim == 2 else 1))
    C = Xn[rng.choice(Xn.shape[0], size=k, replace=False)]
    for _ in range(iters):
        sims = Xn @ C.T
        assign = sims.argmax(axis=1)
        best = sims[np.arange(Xn.shape[0]), assign]
        newC = np.zeros_like(C)
        np.add.at(newC, assign, Xn)
        counts = np.bincount(assign, minlength=k)
        for c in np.nonzero(counts == 0)[0]:
            newC[c] = Xn[best.argmin()]
            best[best.argmin()] = 1.0
        lens = np.linalg.norm(newC, axis=1)
        lens[lens == 0] = 1.0
        C = newC / lens[:, None]
    return C


def ann_ivf_topk(
    ds,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    train_sample: int = 4096,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    quantized: bool = True,
    centroids: "np.ndarray | None" = None,
):
    """End-to-end IVF ANN search — the second scale path beside
    :func:`ann_lsh_topk` (standard IVF-flat: coarse quantizer + inverted
    lists, here realized as broadcast candidate masks instead of a
    shuffle).

    Train: a bounded driver-side sample — systematic over the WHOLE
    corpus (keep ``splitmix64(id) % stride == 0`` with stride from the
    leaf-metadata row count, then ``limit``), not a file-order prefix,
    so a corpus ordered/clustered on disk still trains representative
    centroids — fits ``n_centroids`` spherical-k-means centroids,
    broadcast once via ``ray.put``. Search: queries probe
    their ``nprobe`` nearest centroids; each corpus batch assigns its
    rows to centroids with one matmul and scores ONLY rows whose
    centroid is probed by some query (quantized-exact cosine, same
    scoring/tie rule as the exact path), then a tiny ``groupby``
    merges partial top-ks. No shuffle; per-batch work shrinks by
    ~nprobe/n_centroids. Recall is measured in tests, not promised.
    Returns Dataset[(query_id, neighbor_id, cos_sim)]."""
    import ray

    qid = np.asarray(query_ids, dtype=np.int64)
    q = quantize(np.asarray(query_vecs)) if quantized else np.asarray(query_vecs, np.float64)
    qnorm = np.sqrt((q * q).sum(axis=1))

    if centroids is not None:
        # Explicit coarse quantizer (skips training): with
        # integer-quantized fixed centroids every assignment / probe
        # score below is exact arithmetic a SQL oracle replays
        # bit-for-bit (the `ann_ivf_exact` driver query).
        C = np.asarray(centroids, dtype=np.float64)
    else:
        from buteo_ray.stages.dedup import _splitmix64
        from buteo_ray.state.skew import estimate_rows

        n_est = estimate_rows(ds)
        stride = max(1, n_est // int(train_sample)) if n_est else 1
        samp_ds = ds
        if stride > 1:
            def _thin(batch: pa.Table) -> pa.Table:
                ids_ = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
                keep = (_splitmix64(ids_.view(np.uint64))
                        % np.uint64(stride)) == 0
                return batch.filter(pa.array(keep))
            samp_ds = ds.map_batches(_thin, batch_format="pyarrow",
                                     batch_size=None)
        sample = samp_ds.limit(int(train_sample)).to_pandas()
        if len(sample) == 0:
            C = np.zeros((0, max(q.shape[1], 1)))
        else:
            S = np.stack([np.asarray(v, dtype=np.float64) for v in sample[emb_col]])
            C = _spherical_kmeans(S, n_centroids)

    if C.shape[0] == 0:
        cent_to_q = []
        cnorm = np.zeros(0)
    else:
        # Probe scores in dot/(|q|·|c|) form — NOT normalize-then-matmul
        # — so quantized-integer inputs give (exact-int dot) / (one
        # correctly-rounded sqrt product): bit-identical to the SQL
        # oracle's expression, and correct for ANY centroids (unit-norm
        # trained or fixed integer). Ties: stable argsort → smaller
        # centroid id, the oracle's ORDER BY score DESC, cid ASC.
        cnorm = np.sqrt((C * C).sum(axis=1))
        qn = np.where(qnorm > 0, qnorm, 1.0)
        cn = np.where(cnorm > 0, cnorm, 1.0)
        qscore = (q @ C.T) / (qn[:, None] * cn[None, :])
        probe = np.argsort(-qscore, axis=1, kind="stable")[:, :nprobe]
        cent_to_q = [np.nonzero((probe == c).any(axis=1))[0]
                     for c in range(C.shape[0])]
    state_ref = ray.put((qid, q, qnorm, C, cnorm, cent_to_q))

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(_EMPTY_TOPK)
        qid_, q_, qnorm_, C_, cnorm_, c2q = ray.get(state_ref)
        if C_.shape[0] == 0:   # empty corpus sample / all-zero norms
            return pa.table(_EMPTY_TOPK)
        e = _emb_matrix(batch, emb_col)
        e = quantize(e) if quantized else e.astype(np.float64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        enorm = np.sqrt((e * e).sum(axis=1))
        en = np.where(enorm > 0, enorm, 1.0)
        cn = np.where(cnorm_ > 0, cnorm_, 1.0)
        # Same dot/(|e|·|c|) form as the probe step (oracle-exact);
        # ties → np.argmax first index == ORDER BY score DESC, cid ASC.
        assign = ((e @ C_.T) / (en[:, None] * cn[None, :])).argmax(axis=1)
        out_q, out_n, out_s = [], [], []
        for c in np.unique(assign):
            qis = c2q[int(c)]
            if qis.size == 0:
                continue
            rows = np.nonzero(assign == c)[0]
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (e[rows] @ q_[qis].T) / (enorm[rows, None] * qnorm_[qis][None, :])
            cos = np.where(ids[rows][:, None] == qid_[qis][None, :], -np.inf, cos)
            qc, nc, sc = _partial_topk_arrays(ids[rows], cos, qid_[qis], k)
            out_q.append(qc)
            out_n.append(nc)
            out_s.append(sc)
        if not out_q:
            return pa.table(_EMPTY_TOPK)
        return pa.table({
            "query_id": np.concatenate(out_q),
            "neighbor_id": np.concatenate(out_n),
            "cos_sim": np.concatenate(out_s),
        })

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return _topk_merge(g, k)

    from buteo_ray.stages.aggregate import bucketed_group_map

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              batch_size=None)
    # Query sets can reach 1e5+ at scale: bucketed routing for the
    # per-query merge, never one Ray group per query.
    return bucketed_group_map(partials, ["query_id"], _final)


def centroids_per_label(ds, emb_col: str = "embedding", label_col: str = "label"):
    """Per-label mean embedding via in-batch partial sums → tiny final
    groupby (the IVF coarse-quantizer builder; also the pattern for the
    reference's scaler statistics at scale)."""

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            # label keeps the INPUT column's dtype — a hardcoded type
            # would break schema unification when an empty block meets
            # non-empty partials from e.g. an int64 label column.
            return pa.table({"label": pa.array([], type=batch.schema.field(label_col).type),
                             "vec_sum": pa.array([], type=pa.list_(pa.float64())),
                             "n": np.empty(0, np.int64)})
        e = _emb_matrix(batch, emb_col).astype(np.float64)
        labels = batch[label_col].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((uniq.shape[0], e.shape[1]))
        np.add.at(sums, inv, e)
        counts = np.bincount(inv)
        return pa.table({
            "label": uniq,
            "vec_sum": pa.array(list(sums), type=pa.list_(pa.float64())),
            "n": counts,
        })

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        total = np.stack(g["vec_sum"].to_numpy()).sum(axis=0)
        n = int(g["n"].sum())
        return pd.DataFrame({
            "label": [g["label"].iloc[0]],
            "centroid": [(total / n).tolist()],
            "n": [n],
        })

    return (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=None)
        .groupby("label")
        .map_groups(_final, batch_format="pandas")
    )


def _rp_signs(dim: int, out_dim: int, seed: int = 0) -> np.ndarray:
    """Deterministic ±1 sign matrix (out_dim, dim) from splitmix64 —
    the Achlioptas (2003) database-friendly JL projection. Shared by
    the Ray stage and the SQL-oracle builder so both sides multiply by
    the IDENTICAL matrix."""
    from buteo_ray.stages.dedup import _splitmix64

    idx = (np.arange(out_dim * dim, dtype=np.uint64)
           + np.uint64(seed) * np.uint64(0x9E3779B9))
    bits = _splitmix64(idx) & np.uint64(1)
    return np.where(bits.astype(bool), 1, -1).astype(
        np.int64).reshape(out_dim, dim)


def random_projection(ds, out_dim: int = 8, emb_col: str = "embedding",
                      id_col: str = "vec_id", seed: int = 0):
    """Signed random projection — the Johnson–Lindenstrauss dimension
    sketch with ±1 entries (Achlioptas 2003; public literature): the
    embedding-compression front of an ANN/clustering pipeline. Pure
    ``map_batches``: one integer matmul per batch against the
    closure-captured sign matrix (out_dim × D int64 — bytes, not a
    broadcast problem); no shuffle, no state.

    Embeddings quantize via :func:`quantize` first, so every projected
    coordinate is an exact integer (|Σ| < 2^53) — order-independent
    and bit-replayable by the SQL oracle. Output is LONG form:
    Dataset[(id, dim:int64, proj:int64)], out_dim rows per vector.
    """
    if out_dim <= 0:
        raise ValueError(f"out_dim must be positive, got {out_dim}")
    signs_cache = {}

    def _fn(batch: pa.Table) -> pa.Table:
        e = _emb_matrix(batch, emb_col)
        n = batch.num_rows
        if n == 0 or e.size == 0:
            # id type from the BATCH schema — a hardcoded int64 here
            # would conflict with non-int id columns on empty blocks
            id_type = (batch[id_col].type if id_col in batch.column_names
                       else pa.int64())
            return pa.table({id_col: pa.array([], id_type),
                             "dim": pa.array([], pa.int64()),
                             "proj": pa.array([], pa.int64())})
        d = e.shape[1]
        if d not in signs_cache:
            signs_cache[d] = _rp_signs(d, out_dim, seed).astype(
                np.float64)
        q = quantize(e)
        p = (q @ signs_cache[d].T).astype(np.int64)  # (n, out_dim)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: np.repeat(ids, out_dim),
            "dim": np.tile(np.arange(out_dim, dtype=np.int64), n),
            "proj": p.ravel(),
        })

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def random_projection_sql(table: str, dim: int, out_dim: int = 8,
                          emb_col: str = "embedding",
                          id_col: str = "vec_id", seed: int = 0) -> str:
    """DuckDB twin of :func:`random_projection`: the SAME sign matrix
    (same splitmix64 derivation) embedded as a VALUES literal, joined
    against the unnested embedding — exact integer sums."""
    signs = _rp_signs(dim, out_dim, seed)
    rows = ",".join(
        f"({j},{i + 1},{int(signs[j, i])})"
        for j in range(out_dim) for i in range(dim))
    return (
        f"WITH e AS (SELECT {id_col}, unnest({emb_col}) AS v, "
        f"generate_subscripts({emb_col}, 1) AS i FROM {table}), "
        f"s(j, i, sgn) AS (VALUES {rows}) "
        f"SELECT e.{id_col}, CAST(s.j AS BIGINT) AS dim, "
        # CAST to DOUBLE first: the embedding column is float32 and
        # DuckDB would evaluate REAL*1000+0.5 in FLOAT, crossing FLOOR
        # boundaries the stage's float64 quantize does not (~3e-5 of
        # random coordinates) — same rule as every sibling oracle
        "CAST(SUM(FLOOR(CAST(e.v AS DOUBLE) * 1000 + 0.5) * s.sgn) "
        "AS BIGINT) AS proj "
        f"FROM e JOIN s ON s.i = e.i GROUP BY e.{id_col}, s.j"
    )
