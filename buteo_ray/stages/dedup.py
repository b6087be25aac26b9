"""Deduplication operators for large-scale training-data pipelines.

- :func:`exact_dedup` — hash-partition + per-group first: content hash
  via vectorized 64-bit siphash (``pd.util.hash_pandas_object``,
  deterministic across processes), shuffle only (hash, id) width, keep
  the min-id row per identical content.
- :func:`minhash_signatures` / :func:`minhash_lsh_pairs` — near-dup via
  One-Permutation-Hashing MinHash (Li et al., NIPS 2012 — one hash pass
  over all shingles, bin-wise minima) + banded LSH: signature rows →
  explode to (band, band_hash) keys → groupby → candidate pairs →
  signature-estimated Jaccard filter. O(corpus) compute, shuffle only
  signature rows.
- :func:`simhash_signatures` — 64-bit SimHash over token hashes
  (Charikar 2002), for Hamming-distance near-dup.
- :func:`jaccard_pairs_brute` — exact n-gram Jaccard over all pairs
  (test oracle / small inputs only).

The reference's only dedup-adjacent op is exact ``_unique_values``
(``/root/reference/buteo/array/patches/util.py:217-238``); these extend
it to the document domain as first-class engine operators.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

_SHINGLE = 5
_BINS = 64  # OPH bins = signature length
_BLOCK_ROWS = 8192    # cosine_dup_pairs: target rows per block (N/B)
_SCORE_CHUNK = 1024   # cosine_dup_pairs: rows per cos-matrix slab
_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 constant (public)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (splitmix64, public domain)."""
    x = (x + _MIX).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x = x * np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x = x * np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def content_hash_column(texts: pd.Series) -> np.ndarray:
    """Vectorized deterministic 64-bit content hash, reinterpreted as
    int64: uint64 shuffle keys trip Ray's Arrow conversion into a
    pickled-object fallback in aggregate paths."""
    return pd.util.hash_pandas_object(texts, index=False).to_numpy().view(np.int64)


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: keep the min-``id_col`` row per distinct ``text_col``.

    Plan: vectorized content-hash column + per-block PARTIAL dedup (the
    combiner: duplicate texts inside one block never cross the wire) →
    ``groupby(hash % B)`` hash buckets → one vectorized sort +
    drop_duplicates(text) per bucket (collision-safe: dedup is on the
    actual text; equal texts share a hash, hence a bucket). Bucketing —
    not grouping by the raw hash — avoids one pandas call per distinct
    document; B is size-derived (~64 MB buckets).
    """
    from buteo_ray.state.skew import derive_num_partitions

    n_buckets = derive_num_partitions(ds)

    def _dedup(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable")
        return g.drop_duplicates(subset=[text_col], keep="first")

    def _hash_partial(batch: pd.DataFrame) -> pd.DataFrame:
        # The hash is consumed locally (bucket derivation only) — not
        # shipped: dedup keys on the text itself, so the 8-byte column
        # would be dead weight in the exchange and the output schema.
        h = content_hash_column(batch[text_col])
        batch = batch.assign(__bucket=(h.view(np.uint64) % n_buckets).view(np.int64))
        return _dedup(batch)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return _dedup(g).drop(columns="__bucket")

    return (
        ds.map_batches(_hash_partial, batch_format="pandas", batch_size=None)
        .groupby("__bucket")
        .map_groups(_final, batch_format="pandas")
    )


def _shingle_hashes(texts: List[str]) -> Tuple[np.ndarray, np.ndarray]:
    """Char-``_SHINGLE``-gram rolling hashes for a batch of texts.

    Returns (hashes, doc_offsets): one uint64 per shingle, concatenated
    per doc; fully vectorized via a sliding window over the concatenated
    byte buffer with doc-boundary masking.
    """
    if isinstance(texts, (pa.Array, pa.ChunkedArray)):
        # Zero-copy path: Arrow strings are already contiguous UTF-8 —
        # read (offsets, data) straight from the buffers instead of
        # to_pylist() + per-doc encode().
        data, starts, lens = _utf8_buffer_view(texts)
        n_texts = len(texts)
    else:
        bufs = [t.encode("utf-8") for t in texts]
        lens = np.array([len(b) for b in bufs], dtype=np.int64)
        data = np.frombuffer(b"".join(bufs), dtype=np.uint8)
        ends = np.cumsum(lens)
        starts = ends - lens
        n_texts = len(texts)
    if data.shape[0] < _SHINGLE:
        return np.empty(0, dtype=np.uint64), np.zeros(n_texts + 1, dtype=np.int64)

    win = np.lib.stride_tricks.sliding_window_view(data, _SHINGLE).astype(np.uint64)
    # Polynomial hash of the window then a splitmix finalizer.
    h = np.zeros(win.shape[0], dtype=np.uint64)
    for j in range(_SHINGLE):
        h = h * np.uint64(1099511628211) + win[:, j]  # FNV prime (public)
    h = _splitmix64(h)

    # Valid shingle start positions: within a doc, at least _SHINGLE from its end.
    idx, doc_offsets = _window_indices(starts, lens, _SHINGLE)
    return h[idx], doc_offsets


def _utf8_buffer_view(arr) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(data_bytes, starts, lens) views over an Arrow string column's
    UTF-8 buffers, normalized so ``starts`` indexes into ``data`` from 0.
    Nulls become empty strings."""
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        arr = pc.fill_null(arr, "")
    if pa.types.is_large_string(arr.type):
        odt = np.int64
    else:
        if not pa.types.is_string(arr.type):
            arr = arr.cast(pa.string())
        odt = np.int32
    n = len(arr)
    offs = np.frombuffer(arr.buffers()[1], dtype=odt)[arr.offset:arr.offset + n + 1]
    offs = offs.astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offs[0]:offs[-1]]
    starts = offs[:-1] - offs[0]
    lens = np.diff(offs)
    return data, starts, lens


def _window_indices(starts: np.ndarray, lens: np.ndarray,
                    k: int) -> Tuple[np.ndarray, np.ndarray]:
    """(idx, doc_offsets) for all k-byte windows that stay inside one
    doc of the concatenated buffer: ``idx`` are window START positions
    (doc-concatenated order), ``doc_offsets[i]:doc_offsets[i+1]`` slices
    doc i's windows. The boundary-masking half of the shingle machinery,
    shared by :func:`_shingle_hashes` and text._char_trigram_codes."""
    n_win = np.maximum(lens - k + 1, 0)
    doc_offsets = np.concatenate([[0], np.cumsum(n_win)])
    tot = int(doc_offsets[-1])
    if tot:
        # idx[j] = starts[doc(j)] + (j - doc_offsets[doc(j)]), vectorized
        rel = np.arange(tot, dtype=np.int64) - np.repeat(doc_offsets[:-1], n_win)
        idx = rel + np.repeat(starts, n_win)
    else:
        idx = np.empty(0, dtype=np.int64)
    return idx, doc_offsets


def oph_minhash(texts: List[str]) -> np.ndarray:
    """One-Permutation-Hashing MinHash signatures, shape (len(texts), 64).

    Bin = top-6 hash bits; signature[bin] = min hash in that bin; empty
    bins densified with the doc's minimum present signature value
    (deterministic)."""
    h, offsets = _shingle_hashes(texts)
    n = len(texts)
    sig = np.full((n, _BINS), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    if h.shape[0]:
        bins = (h >> np.uint64(58)).astype(np.int64)
        doc_of = np.repeat(np.arange(n), np.diff(offsets))
        flat = doc_of * _BINS + bins
        order = np.argsort(flat, kind="stable")
        flat_s, h_s = flat[order], h[order]
        uniq, starts = np.unique(flat_s, return_index=True)
        mins = np.minimum.reduceat(h_s, starts)
        sig.ravel()[uniq] = mins
    # Densify: replace empty bins with the doc's min present value.
    empty = sig == np.uint64(0xFFFFFFFFFFFFFFFF)
    if empty.any():
        fill = sig.min(axis=1)
        sig = np.where(empty, fill[:, None], sig)
    # Shingle-less docs (len < shingle size) would all share the 0xFF…
    # sentinel and be reported as mutual near-dups; give them signatures
    # derived from their full content instead (identical short texts
    # still collide — by design).
    n_shingles = np.diff(offsets)
    for i in np.nonzero(n_shingles == 0)[0]:
        t = texts[i]
        if not isinstance(t, str):  # Arrow scalar from the buffer path
            t = t.as_py() or ""
        data = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        hv = np.uint64(14695981039346656037)
        with np.errstate(over="ignore"):  # uint64 wraparound is the hash
            for b in data:
                hv = hv * np.uint64(1099511628211) + b
        sig[i] = _splitmix64(hv + np.arange(_BINS, dtype=np.uint64))
    return sig


def minhash_signatures(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset[(id, sig_0..sig_63)] — one OPH-MinHash row per document."""

    def _fn(batch: pa.Table) -> pa.Table:
        sig = oph_minhash(batch[text_col])
        cols = {id_col: batch[id_col]}
        for b in range(_BINS):
            cols[f"sig_{b}"] = pa.array(sig[:, b])
        return pa.table(cols)

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


_PAIR_CHUNK = 512  # blockwise pairing: bounds the eq tensor at ~16 MB


def minhash_lsh_pairs(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket: Optional[int] = None,
    broadcast_threshold: int = 64 << 20,
):
    """Candidate near-dup pairs via banded LSH over MinHash signatures.

    signature → ``bands`` band-hash rows per doc (shuffle key =
    (band, band_hash)) → per-bucket pairing → estimated Jaccard
    (matching signature fraction) ≥ threshold. Returns
    Dataset[(id_a, id_b, est_jaccard)] with id_a < id_b, deduped.

    Driver-free plan: the ONLY pinned intermediate is a per-DOC
    signature table (id, 512-B packed sig — 1/``bands`` the bytes of
    pinning per-band rows, and the minhash/shingling pass runs exactly
    once). Both consumers derive from it with a cheap FNV re-hash over
    the 64 cached bins: (1) sig-free (band, band_hash) probe rows feed
    a distributed count aggregate → multi-member buckets; (2) full
    band rows are restricted to those hot buckets (size-gated
    broadcast key filter, hash-partitioned ``left_semi`` join past the
    gate — no bucket keys on the driver). Per-bucket pairing is
    blockwise (``_PAIR_CHUNK``² pair tiles)
    so one degenerate boilerplate bucket cannot blow a worker's heap;
    ``max_bucket`` (optional) truncates pathological buckets to their
    ``max_bucket`` smallest ids (deterministic; documented recall trade —
    production CC dedup drops such buckets outright)."""
    if not (1 <= bands <= _BINS) or _BINS % bands != 0:
        # bands > _BINS makes every band hash collide (O(n²) pairing);
        # non-divisors silently drop trailing signature bins.
        raise ValueError(f"bands must divide {_BINS} and be in [1, {_BINS}]")
    rows = _BINS // bands

    def _band_hashes(sig: np.ndarray) -> np.ndarray:
        n = sig.shape[0]
        band_hash = np.zeros((n, bands), dtype=np.uint64)
        for b in range(bands):
            chunk = sig[:, b * rows:(b + 1) * rows]
            h = np.zeros(n, dtype=np.uint64)
            for j in range(rows):
                h = h * np.uint64(1099511628211) + chunk[:, j]
            band_hash[:, b] = _splitmix64(h + np.uint64(b))
        return band_hash

    def _sig_docs(batch: pa.Table) -> pa.Table:
        """One (id, sig) row per doc — the only pinned intermediate.
        The signature is packed into ONE 512-B binary cell, zero-copy
        from the contiguous (n, _BINS) uint64 array (offsets stay
        int32, so a >2 GiB block falls back to the per-row path)."""
        sig = oph_minhash(batch[text_col])
        n = sig.shape[0]
        width = _BINS * 8
        if n * width < 2 ** 31:
            flat = np.ascontiguousarray(sig)
            offs = np.arange(n + 1, dtype=np.int32) * width
            sig_arr = pa.BinaryArray.from_buffers(
                pa.binary(), n,
                [None, pa.py_buffer(offs), pa.py_buffer(flat)])
        else:
            sig_arr = pa.array([sig[i].tobytes() for i in range(n)],
                               type=pa.binary())
        return pa.table({id_col: batch[id_col], "sig": sig_arr})

    def _unpack(t: pa.Table) -> np.ndarray:
        col = t["sig"].to_numpy(zero_copy_only=False)
        if len(col) == 0:
            return np.empty((0, _BINS), dtype=np.uint64)
        return np.frombuffer(b"".join(col.tolist()),
                             dtype=np.uint64).reshape(len(col), _BINS)

    def _band_keys(t: pa.Table) -> pa.Table:
        """Sig-free probe rows — the count aggregate needs only the
        bucket keys, so neither ids nor signatures cross its shuffle."""
        band_hash = _band_hashes(_unpack(t))
        n = band_hash.shape[0]
        return pa.table({
            "band": np.tile(np.arange(bands, dtype=np.int64), n),
            "band_hash": band_hash.ravel().view(np.int64),
        })

    def _bands(t: pa.Table) -> pa.Table:
        sig = _unpack(t)
        n = sig.shape[0]
        band_hash = _band_hashes(sig)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        # Signature packed into ONE binary column (512 B) instead of 64
        # uint64 columns — ~8× less shuffle width per band row. Built
        # zero-copy from one repeated buffer (offsets stay int32, so the
        # >2 GiB-per-block case falls back to the per-row list path).
        width = _BINS * 8
        if n * bands * width < 2 ** 31:
            rep = np.ascontiguousarray(np.repeat(sig, bands, axis=0))
            offs = np.arange(n * bands + 1, dtype=np.int32) * width
            sig_arr = pa.BinaryArray.from_buffers(
                pa.binary(), n * bands,
                [None, pa.py_buffer(offs), pa.py_buffer(rep)])
        else:
            sig_bytes = [sig[i].tobytes() for i in range(n)]
            sig_arr = pa.array(
                [sig_bytes[i] for i in range(n) for _ in range(bands)],
                type=pa.binary())
        return pa.table({
            id_col: np.repeat(ids, bands),
            "band": np.tile(np.arange(bands, dtype=np.int64), n),
            # int64 view: uint64 group keys hit Ray's pickled-object
            # fallback in the aggregate path.
            "band_hash": band_hash.ravel().view(np.int64),
            "sig": sig_arr,
        })

    def _pair_tile(sig_a, sig_b, ids_a, ids_b, band, diag):
        """Pairs for one (chunk_a × chunk_b) tile; ``diag``=True means the
        tile is on the diagonal (same chunk) → upper triangle only."""
        eq = sig_a[:, None, :] == sig_b[None, :, :]  # (ca, cb, 64)
        est = eq.mean(axis=2)
        keep = est >= threshold
        if diag:
            keep &= np.triu(np.ones(keep.shape, dtype=bool), k=1)
        # Ownership rule instead of a global dedup shuffle: a pair is
        # emitted only by the FIRST band whose signature chunk matches —
        # computable locally since both signatures are in the bucket.
        chunk_eq = eq.reshape(eq.shape[0], eq.shape[1], bands, rows).all(axis=3)
        first_band = chunk_eq.argmax(axis=2)
        # chunk_eq.any guards the argmax-of-all-False → 0 artifact (a pair
        # present only via a ~2^-64 band-hash collision is dropped).
        keep &= chunk_eq.any(axis=2) & (first_band == band)
        ia, ib = np.nonzero(keep)
        return ids_a[ia], ids_b[ib], est[ia, ib]

    _EMPTY = {"id_a": pd.Series([], dtype="int64"),
              "id_b": pd.Series([], dtype="int64"),
              "est_jaccard": pd.Series([], dtype="float64")}

    def _pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        """All pairs for EVERY (band, band_hash) group in one hash
        bucket, in one vectorized pass. Ray's per-raw-key ``map_groups``
        paid ~ms of pandas overhead per near-dup cluster (the dominant
        cost of the whole job); here groups are found by boundary diffs
        on the sorted bucket and same-size groups are paired as one
        (G, s, s, 64) tensor op, chunked to bound the tensor at ~32 MB."""
        if len(g) < 2:
            return pd.DataFrame(_EMPTY)
        g = g.sort_values(["band_hash", "band", id_col], kind="stable")
        bh = g["band_hash"].to_numpy()
        bd = g["band"].to_numpy()
        ids = g[id_col].to_numpy()
        idx = np.arange(len(g))

        def _boundaries():
            return (bh[1:] == bh[:-1]) & (bd[1:] == bd[:-1])

        same = _boundaries()
        keep = np.ones(len(bh), dtype=bool)
        keep[1:] = ~(same & (ids[1:] == ids[:-1]))  # duplicate-id rows
        if not keep.all():
            bh, bd, ids, idx = bh[keep], bd[keep], ids[keep], idx[keep]
            same = _boundaries()
        if max_bucket is not None and len(bh):
            # Truncate pathological groups to their max_bucket smallest
            # ids (rows are id-sorted within a group, so "first rows").
            gid0 = np.concatenate([[0], np.cumsum(~same)])
            gstart = np.concatenate([[0], np.cumsum(np.bincount(gid0))])[gid0]
            keep = (np.arange(len(bh)) - gstart) < max_bucket
            if not keep.all():
                bh, bd, ids, idx = bh[keep], bd[keep], ids[keep], idx[keep]
                same = _boundaries()
        if len(bh) < 2:
            return pd.DataFrame(_EMPTY)
        sig_col = g["sig"].to_numpy()[idx]
        sig = np.frombuffer(b"".join(sig_col.tolist()),
                            dtype=np.uint64).reshape(len(bh), _BINS)
        sizes = np.bincount(np.concatenate([[0], np.cumsum(~same)]))
        starts = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        group_band = bd[starts]
        out_a, out_b, out_e = [], [], []
        for s in np.unique(sizes):
            if s < 2:
                continue
            sel = np.flatnonzero(sizes == s)
            if s > _PAIR_CHUNK:
                # Degenerate boilerplate clusters: blockwise tiles so one
                # bucket cannot blow the worker heap.
                for gi in sel:
                    i0g, m = starts[gi], int(s)
                    sg, ig = sig[i0g:i0g + m], ids[i0g:i0g + m]
                    for i0 in range(0, m, _PAIR_CHUNK):
                        i1 = min(i0 + _PAIR_CHUNK, m)
                        for j0 in range(i0, m, _PAIR_CHUNK):
                            j1 = min(j0 + _PAIR_CHUNK, m)
                            a, b, e = _pair_tile(
                                sg[i0:i1], sg[j0:j1], ig[i0:i1], ig[j0:j1],
                                int(group_band[gi]), i0 == j0)
                            out_a.append(a); out_b.append(b); out_e.append(e)
                continue
            gchunk = max(1, (32 << 20) // (int(s) * int(s) * _BINS))
            tri = np.triu(np.ones((s, s), dtype=bool), k=1)[None]
            for c0 in range(0, len(sel), gchunk):
                gsel = sel[c0:c0 + gchunk]
                rows_idx = (starts[gsel][:, None]
                            + np.arange(s)[None, :]).ravel()
                S = sig[rows_idx].reshape(len(gsel), s, _BINS)
                I = ids[rows_idx].reshape(len(gsel), s)
                eq = S[:, :, None, :] == S[:, None, :, :]
                est = eq.mean(axis=3)
                kp = (est >= threshold) & tri
                chunk_eq = eq.reshape(len(gsel), s, s, bands, rows).all(axis=4)
                first_band = chunk_eq.argmax(axis=3)
                kp &= chunk_eq.any(axis=3) \
                    & (first_band == group_band[gsel][:, None, None])
                gg, ia, ib = np.nonzero(kp)
                out_a.append(I[gg, ia]); out_b.append(I[gg, ib])
                out_e.append(est[gg, ia, ib])
        if not out_a:
            return pd.DataFrame(_EMPTY)
        return pd.DataFrame({
            "id_a": np.concatenate(out_a).astype(np.int64),
            "id_b": np.concatenate(out_b).astype(np.int64),
            "est_jaccard": np.concatenate(out_e).astype(np.float64),
        })

    # The ONLY pinned intermediate: one (id, sig) row per doc —
    # 1/bands the bytes of pinning per-band rows, the shingling/minhash
    # pass runs exactly once, and both consumers below re-derive band
    # hashes from the cached bins with a cheap FNV pass.
    sig_docs = ds.map_batches(_sig_docs, batch_format="pyarrow",
                              batch_size=None).materialize()

    # Nearly every bucket is a singleton: find multi-member buckets with a
    # vectorized count aggregate, then restrict the band rows to them with
    # a hash-partitioned LEFT SEMI join — fully distributed, no bucket
    # keys on the driver (the count table has ~n_docs·bands rows).
    from buteo_ray.stages.aggregate import bucketed_count
    from buteo_ray.state.skew import derive_num_partitions

    # Bucket cardinality is ~n_docs·bands (unbounded): bucketed
    # vectorized count, never one Ray group per LSH bucket. The probe
    # rows are sig-free (band, band_hash) pairs only.
    counts = bucketed_count(sig_docs.map_batches(_band_keys,
                                                 batch_format="pyarrow",
                                                 batch_size=None),
                            ["band", "band_hash"], alias="n")
    multi = counts.map_batches(
        lambda t: t.filter(np.greater_equal(t["n"].to_numpy(), 2)),
        batch_format="pyarrow", batch_size=None,
    ).materialize()
    if multi.count() == 0:
        import ray.data as rd

        return rd.from_pandas(pd.DataFrame(
            {"id_a": pd.Series([], dtype="int64"),
             "id_b": pd.Series([], dtype="int64"),
             "est_jaccard": pd.Series([], dtype="float64")}))

    # Full band rows (with the packed sig) derive lazily from the pinned
    # per-doc signatures, then restrict to the hot buckets.
    band_rows = sig_docs.map_batches(_bands, batch_format="pyarrow",
                                     batch_size=None)

    # Size-gated broadcast of the hot-bucket key set: `multi` has one row
    # per multi-member bucket (≈ near-dup clusters × bands), which is tiny
    # relative to the corpus in every realistic dedup run — ray.put the
    # packed keys once and filter band rows with a vectorized searchsorted
    # (saves a full-width all-to-all). Above the threshold (duplicate-
    # saturated corpora) fall back to the hash-partitioned left-semi join.
    mb = multi.size_bytes()
    if mb is not None and mb < broadcast_threshold:
        import ray as _ray

        mp = multi.to_pandas()
        # Packed key wraps mod 2^64 — not injective in the top bits, but a
        # collision only KEEPS an extra singleton row (the final groupby
        # re-keys on the exact (band, band_hash) pair); never drops one.
        mkey = np.sort(mp["band_hash"].to_numpy() * np.int64(bands)
                       + mp["band"].to_numpy())
        mref = _ray.put(mkey)

        def _hot_filter(t: pa.Table) -> pa.Table:
            keys = _ray.get(mref)
            k = (t["band_hash"].to_numpy() * np.int64(bands)
                 + t["band"].to_numpy())
            pos = np.clip(np.searchsorted(keys, k), 0, len(keys) - 1)
            return t.filter(pa.array(keys[pos] == k))

        hot = band_rows.map_batches(_hot_filter, batch_format="pyarrow",
                                    batch_size=None)
    else:
        hot = band_rows.join(
            multi, join_type="left_semi",
            num_partitions=derive_num_partitions(band_rows, multi),
            on=("band", "band_hash"),
        )
    # No pair-dedup shuffle needed: the first-matching-band ownership
    # rule inside the pair kernel makes each pair emit exactly once.
    # Group by a HASH BUCKET of the key, not the raw key: one vectorized
    # call finalizes every cluster in the bucket (exact grouping happens
    # via boundary diffs inside _pairs_bucket).
    n_pair_buckets = derive_num_partitions(hot)

    def _bucketize(t: pa.Table) -> pa.Table:
        k = (t["band_hash"].to_numpy().view(np.uint64) * np.uint64(bands)
             + t["band"].to_numpy().astype(np.uint64))
        b = _splitmix64(k) % np.uint64(n_pair_buckets)
        return t.append_column("__bucket", pa.array(b.view(np.int64)))

    # NOTE: empty sort partitions make map_groups emit SCHEMALESS empty
    # blocks (the group UDF is never invoked for them, and a follow-up
    # map_batches is skipped on empty blocks too, so they cannot be
    # normalized here). Consumers that hash-join the pair set must
    # coalesce those blocks away first — see training_data.py's
    # repartition before the anti-join.
    return (hot.map_batches(_bucketize, batch_format="pyarrow", batch_size=None)
            .groupby("__bucket")
            .map_groups(_pairs_bucket, batch_format="pandas"))


_FNV_PRIME = np.uint64(1099511628211)


def _token_polyhash(tokens) -> np.ndarray:
    """SQL-reproducible per-token hash: FNV-prime polynomial over the
    UTF-8 bytes (``h = Σ c_j·P^(L−1−j) mod 2^64``, the associative form
    of ``h = h·P + c``) finished with splitmix64. Fully vectorized — the
    segment sums use the wrap-around cumsum trick (uint64 cumsum is
    already modular, so ``cs[end−1] − cs[start−1]`` is each token's sum)."""
    arr = tokens if isinstance(tokens, (pa.Array, pa.ChunkedArray)) \
        else pa.array(tokens, type=pa.string())
    data, starts, lens = _utf8_buffer_view(arr)
    n = len(arr)
    sums = np.zeros(n, dtype=np.uint64)
    if data.shape[0]:
        maxlen = int(lens.max())
        pw = np.empty(maxlen, dtype=np.uint64)
        pw[0] = 1
        if maxlen > 1:  # modular: uint64 cumprod wraps mod 2^64
            pw[1:] = np.cumprod(np.full(maxlen - 1, _FNV_PRIME, dtype=np.uint64))
        pos = np.arange(data.shape[0], dtype=np.int64) - np.repeat(starts, lens)
        expo = np.repeat(lens, lens) - 1 - pos
        contrib = data.astype(np.uint64) * pw[expo]
        cs = np.cumsum(contrib, dtype=np.uint64)
        ends = starts + lens
        hi = np.where(ends > 0, cs[np.maximum(ends - 1, 0)], np.uint64(0))
        lo = np.where(starts > 0, cs[np.maximum(starts - 1, 0)], np.uint64(0))
        sums = np.where(lens > 0, hi - lo, np.uint64(0))
    return _splitmix64(sums)


def simhash64(texts: List[str]) -> np.ndarray:
    """64-bit SimHash over single-space tokens (Charikar 2002). Token
    hashes are FNV-polynomial + splitmix64 (:func:`_token_polyhash`) so
    the DuckDB oracle replays them bit-exactly and signatures don't
    depend on pandas' process-internal siphash. Null texts hash as "".

    Memory: the ±1 votes are accumulated per BIT (peak O(n_tokens), the
    64 iterations reuse one buffer) — a (n_tokens, 64) int64 vote matrix
    would be 512 B/token, an OOM on whole-block text batches."""
    n = len(texts)
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    tokens = pd.Series(["" if t is None else t for t in texts],
                       dtype=object).str.split(" ")
    n_tok = tokens.str.len().to_numpy().astype(np.int64)  # ≥1 per doc
    flat = tokens.explode()
    th = _token_polyhash(flat.to_numpy())
    doc_starts = np.concatenate([[0], np.cumsum(n_tok)[:-1]])
    out = np.zeros(n, dtype=np.uint64)
    for b in range(64):
        ones = np.add.reduceat(
            ((th >> np.uint64(b)) & np.uint64(1)).astype(np.int64), doc_starts)
        out |= ((2 * ones - n_tok) > 0).astype(np.uint64) << np.uint64(b)
    return out


def simhash_signatures(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Dataset[(id, simhash:uint64)]."""

    def _fn(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch[id_col],
            "simhash": pa.array(simhash64(batch[text_col].to_pylist())),
        })

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount for uint64 arrays (numpy 1.x has no
    array bit_count)."""
    x = x - ((x >> np.uint64(1)) & np.uint64(0x5555555555555555))
    x = (x & np.uint64(0x3333333333333333)) + \
        ((x >> np.uint64(2)) & np.uint64(0x3333333333333333))
    x = (x + (x >> np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    return (x * np.uint64(0x0101010101010101)) >> np.uint64(56)


def simhash_dup_pairs(ds, max_hamming: int = 3, text_col: str = "text",
                      id_col: str = "doc_id",
                      score_chunk: int = _SCORE_CHUNK):
    """SimHash near-duplicate pairs: every ``(id_a < id_b)`` whose
    64-bit SimHashes differ in at most ``max_hamming`` bits — EXACT
    with respect to the signatures (Manku/Jain/Sarma, WWW'07
    pigeonhole): split 64 bits into ``max_hamming+1`` bands; any pair
    within Hamming r must agree exactly on ≥1 band, so a groupby per
    band finds every qualifying pair with zero recall loss.

    Plan: signature rows explode to (band, band_bits) keys → ONE
    shuffle of (band, key, id, simhash) width → per-bucket chunked
    XOR-popcount verification. A pair colliding in several bands is
    owned by the FIRST matching band (recomputed from the signatures
    in-group — same driver-free ownership trick as
    :func:`minhash_lsh_pairs`, no pair-dedup shuffle). Returns
    Dataset[(id_a, id_b, hamming)]."""
    r = int(max_hamming)
    n_bands = r + 1
    if not 1 <= n_bands <= 64:
        raise ValueError("max_hamming must be in [0, 63]")
    width = 64 // n_bands
    sig = simhash_signatures(ds, text_col=text_col, id_col=id_col)

    def _band_bits(s: np.ndarray, band: int) -> np.ndarray:
        # Last band absorbs the remainder bits.
        shift = np.uint64(band * width)
        if band == n_bands - 1:
            return s >> shift
        return (s >> shift) & np.uint64((1 << width) - 1)

    def _explode(batch: pa.Table) -> pa.Table:
        s = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        parts = []
        for t in range(n_bands):
            parts.append(pa.table({
                "band": np.full(s.shape[0], t, dtype=np.int64),
                # int64 views: uint64 group keys hit Ray's pickled-object
                # fallback.
                "band_key": _band_bits(s, t).view(np.int64),
                "id": ids,
                "sig": s.view(np.int64),
            }))
        return pa.concat_tables(parts)

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        t = int(g["band"].iloc[0])
        ids = g["id"].to_numpy()
        s = g["sig"].to_numpy().view(np.uint64)
        n = s.shape[0]
        # Hoist the earlier-band ownership bits: recomputing them per
        # tile was O(tiles · t · n) redundant shift/mask work.
        prev = [_band_bits(s, tp) for tp in range(t)]
        out_a, out_b, out_h = [], [], []
        # Tile BOTH dimensions: a boilerplate-heavy bucket can hold
        # 100k+ rows, and a chunk × n slab (the SWAR popcount allocates
        # ~5 temporaries of it) would blow the worker heap; chunk² is a
        # bounded ~8 MB. Column tiles start at the row tile (the strict
        # upper triangle never reaches below the diagonal).
        for st in range(0, n, score_chunk):
            en = min(st + score_chunk, n)
            rows = np.arange(st, en)
            for ct in range(st, n, score_chunk):
                ce = min(ct + score_chunk, n)
                x = s[st:en, None] ^ s[ct:ce][None, :]
                h = _popcount64(x).astype(np.int64)
                # r < s (global) upper triangle, Hamming bound, and
                # first-band ownership: skip pairs already matching in
                # an earlier band.
                keep = h <= r
                keep &= rows[:, None] < np.arange(ct, ce)[None, :]
                for tp in range(t):
                    keep &= prev[tp][st:en, None] != prev[tp][ct:ce][None, :]
                rr, ss = np.nonzero(keep)
                out_a.append(ids[rr + st])
                out_b.append(ids[ss + ct])
                out_h.append(h[rr, ss])
        ia = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        ib = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        hh = np.concatenate(out_h) if out_h else np.empty(0, np.int64)
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "hamming": hh})

    # Pigeonhole-band buckets are unbounded in count (≈ docs × bands):
    # route by hash bucket and iterate the exact (band, band_key) groups
    # inside each bucket — never one Ray group per band bucket.
    from buteo_ray.stages.aggregate import bucketed_group_map

    exploded = sig.map_batches(_explode, batch_format="pyarrow",
                               batch_size=None)
    return bucketed_group_map(exploded, ["band", "band_key"], _pairs)


def exact_jaccard_for_pairs(corpus_ds, pairs_ds, text_col: str = "text",
                            id_col: str = "doc_id"):
    """Distributed exact n-gram Jaccard for candidate pairs — the
    verification stage downstream of LSH candidate generation (the
    engine's n-gram-Jaccard dedup mode as a first-class operator, not
    just the test oracle).

    Plan: the pair rows join to the corpus twice (id_a then id_b) via
    :func:`hash_join_auto` — under the broadcast threshold the corpus
    ships once per worker and the pair stream probes it; above it the
    same calls become hash-partitioned shuffle joins (at 100 TB,
    pre-restrict the corpus with a ``left_semi`` join on the involved
    ids first). The Jaccard itself is computed per batch. Returns
    Dataset[(id_a, id_b, jaccard)]."""
    from buteo_ray.stages.join_partitioned import hash_join_auto

    import pyarrow.compute as pc

    corpus = corpus_ds.select_columns([id_col, text_col])
    withA = hash_join_auto(pairs_ds, corpus, "id_a", id_col,
                           right_suffix="_a")
    withA = withA.map_batches(
        lambda t: t.rename_columns(
            [c if c != text_col else "text_a" for c in t.column_names]),
        batch_format="pyarrow", batch_size=None)
    both = hash_join_auto(withA, corpus, "id_b", id_col, right_suffix="_b")
    both = both.map_batches(
        lambda t: t.rename_columns(
            [c if c != text_col else "text_b" for c in t.column_names]),
        batch_format="pyarrow", batch_size=None)

    def _uniq_per_doc(h: np.ndarray, off: np.ndarray):
        """Per-doc unique shingle hashes: (doc_idx, hash) arrays, sorted."""
        n = len(off) - 1
        doc = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
        order = np.lexsort((h, doc))
        d, hh = doc[order], h[order]
        first = np.ones(len(hh), dtype=bool)
        first[1:] = (d[1:] != d[:-1]) | (hh[1:] != hh[:-1])
        return d[first], hh[first]

    def _jac(t: pa.Table) -> pa.Table:
        # Batch-vectorized byte-5-gram Jaccard via _shingle_hashes: the
        # same rolling-hash machinery as the MinHash signatures (ngram_set
        # semantics — UTF-8 byte windows — with 64-bit hashed shingles;
        # collision odds ~|set|²/2⁶⁴). No per-pair Python sets.
        n = t.num_rows
        ha, offa = _shingle_hashes(t["text_a"])
        hb, offb = _shingle_hashes(t["text_b"])
        da, ua = _uniq_per_doc(ha, offa)
        db, ub = _uniq_per_doc(hb, offb)
        ca = np.bincount(da, minlength=n)
        cb = np.bincount(db, minlength=n)
        # Merge the two per-doc-unique lists: a (doc, hash) duplicate
        # means the shingle is in BOTH docs of that pair.
        dc = np.concatenate([da, db])
        hc = np.concatenate([ua, ub])
        order = np.lexsort((hc, dc))
        d2, h2 = dc[order], hc[order]
        dup = (d2[1:] == d2[:-1]) & (h2[1:] == h2[:-1])
        inter = np.bincount(d2[1:][dup], minlength=n)
        union = ca + cb - inter
        jac = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        return pa.table({"id_a": t["id_a"], "id_b": t["id_b"],
                         "jaccard": pa.array(jac, type=pa.float64())})

    return both.map_batches(_jac, batch_format="pyarrow", batch_size=None)


def cosine_dup_pairs(
    ds,
    threshold: float = 0.4,
    n_blocks: Optional[int] = None,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    quantized: bool = True,
    score_chunk: int = _SCORE_CHUNK,
):
    """Exact embedding-cosine near-duplicate pairs: every ``(id_a <
    id_b)`` whose cosine similarity is ``>= threshold``.

    Plan (fully distributed, no driver state): each row is assigned a
    block ``b = splitmix64(id) % B`` and replicated to the ``B``
    unordered block-pair keys containing ``b``; one ``groupby`` over
    pair keys, then each group matmuls block ``i`` against block ``j``
    (the triangle when ``i == j``). Per-task compute is O((N/B)²·D) and
    the exchange is O(N·B) rows — the canonical exact all-pairs
    block-join; ``B`` defaults to row-derived (N/B ≈ 8k rows, estimated
    from leaf metadata), and in-group scoring is chunked so cos-matrix
    memory stays bounded even when a group is unexpectedly large. Exact
    all-pairs is inherently quadratic — the approximate scale path is
    :func:`buteo_ray.stages.ann.lsh_bucket_assign` bucketing with this
    operator's scoring applied per bucket.

    Cosines use the quantize-×1000 trick from ``stages/ann.py``:
    integer-valued-double dots are order-independent exact, so the
    threshold comparison is bit-identical to the DuckDB oracle.

    Extends the reference's exact-unique dedup
    (``/root/reference/buteo/array/patches/util.py:217-238``) to the
    embedding domain. Returns Dataset[(id_a, id_b, cos_sim)]."""
    from buteo_ray.stages.ann import _emb_matrix, quantize
    from buteo_ray.state.skew import estimate_bytes, estimate_rows

    if n_blocks is None:
        # Per-group memory is O((N/B)^2) pair math, so B must scale with
        # ROWS (bound N/B near _BLOCK_ROWS), not with source bytes — a
        # 13 MB / 50k-row table needs B≈7, which sqrt(bytes/64MB) would
        # put at the floor. Falls back to the byte heuristic only when
        # no leaf reports a row count.
        n_rows = estimate_rows(ds)
        if n_rows > 0:
            n_blocks = -(-n_rows // _BLOCK_ROWS)
        else:
            n_tasks = max(1, estimate_bytes(ds) // (64 << 20))
            n_blocks = np.ceil(np.sqrt(2.0 * n_tasks))
        n_blocks = int(max(2, min(1024, n_blocks)))
    B = int(n_blocks)

    def _replicate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"pk": np.empty(0, np.int64),
                             "blk": np.empty(0, np.int64),
                             "id": np.empty(0, np.int64),
                             "q": pa.array([], type=pa.list_(pa.float64()))})
        e = _emb_matrix(batch, emb_col)
        q = quantize(e) if quantized else e.astype(np.float64)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        blk = (_splitmix64(ids.view(np.uint64)) % np.uint64(B)).astype(np.int64)
        qcol = pa.array(list(q), type=pa.list_(pa.float64()))
        parts = []
        for x in range(B):
            i = np.minimum(blk, x)
            j = np.maximum(blk, x)
            parts.append(pa.table({"pk": i * B + j, "blk": blk,
                                   "id": ids, "q": qcol}))
        return pa.concat_tables(parts)

    def _score(Ma, ia_all, Mb, ib_all, diagonal: bool):
        """Chunked block scoring: cos-matrix memory is bounded at
        _SCORE_CHUNK × |Mb| regardless of group size (a 25k-row group
        must never allocate a 25k² matrix, and triu_indices on it would
        be a 5 GB index array). ``diagonal`` keeps only r < s pairs."""
        na = np.sqrt((Ma * Ma).sum(axis=1))
        nb = np.sqrt((Mb * Mb).sum(axis=1))
        out_a, out_b, out_s = [], [], []
        for st in range(0, Ma.shape[0], score_chunk):
            en = min(st + score_chunk, Ma.shape[0])
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (Ma[st:en] @ Mb.T) / (na[st:en, None] * nb[None, :])
            if diagonal:
                r_gl = np.arange(st, en)[:, None]
                cos = np.where(r_gl < np.arange(Mb.shape[0])[None, :],
                               cos, -np.inf)
            r, s = np.nonzero(cos >= threshold)
            out_a.append(ia_all[r + st])
            out_b.append(ib_all[s])
            out_s.append(cos[r, s])
        ia = np.concatenate(out_a) if out_a else np.empty(0, np.int64)
        ib = np.concatenate(out_b) if out_b else np.empty(0, np.int64)
        sim = np.concatenate(out_s) if out_s else np.empty(0, np.float64)
        return ia, ib, sim

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": np.empty(0, np.int64),
                              "id_b": np.empty(0, np.int64),
                              "cos_sim": np.empty(0, np.float64)})
        pk = int(g["pk"].iloc[0])
        i, j = pk // B, pk % B
        if i == j:
            M = np.stack(g["q"].to_numpy())
            ids = g["id"].to_numpy()
            ia, ib, sim = _score(M, ids, M, ids, diagonal=True)
        else:
            ga, gb = g[g["blk"] == i], g[g["blk"] == j]
            if len(ga) == 0 or len(gb) == 0:
                return empty
            Ma, Mb = np.stack(ga["q"].to_numpy()), np.stack(gb["q"].to_numpy())
            ia, ib, sim = _score(Ma, ga["id"].to_numpy(),
                                 Mb, gb["id"].to_numpy(), diagonal=False)
        lo = np.minimum(ia, ib)
        hi = np.maximum(ia, ib)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos_sim": sim})

    return (
        ds.map_batches(_replicate, batch_format="pyarrow", batch_size=None)
        .groupby("pk")
        .map_groups(_pairs, batch_format="pandas")
    )


def ngram_set(text: str, n: int = _SHINGLE) -> set:
    b = text.encode("utf-8")
    return {b[i:i + n] for i in range(max(len(b) - n + 1, 0))}


def jaccard_pairs_brute(texts: List[str], ids: List[int], threshold: float) -> List[Tuple[int, int, float]]:
    """Exact n-gram Jaccard over all pairs — oracle for LSH recall tests."""
    sets = [ngram_set(t) for t in texts]
    out = []
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            u = len(sets[i] | sets[j])
            jac = len(sets[i] & sets[j]) / u if u else 0.0
            if jac >= threshold:
                a, b = sorted((ids[i], ids[j]))
                out.append((a, b, jac))
    return out


def duplicate_spans(ds, window: int = 32, stride: int = 16,
                    text_col: str = "text", id_col: str = "doc_id",
                    exact: bool = True):
    """Duplicated-substring span detection: one output row per
    (``id_col``, byte position) whose ``window``-byte text window occurs
    at least twice anywhere in the corpus (same doc or another doc).

    The fixed-window-at-a-stride formulation is the streaming-friendly
    simplification of suffix-array substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a
    repeated passage of length >= window + stride - 1 is guaranteed to
    contain at least one sampled window on both sides, so spans flagged
    here are where a trimming pass would cut.

    Plan (exact, collision-safe, one shuffle):
      1. map_batches (Arrow, zero-copy buffer view): every window's
         64-bit polynomial hash, vectorized — ``window`` fused numpy
         passes over a strided window view per batch, no per-row Python.
      2. groupby(hash % B) hash-BUCKET shuffle (size-derived B, like
         exact_dedup — one pandas call per ~64 MB bucket, not one per
         distinct window). The window BYTES ride along so step 3 can
         compare exactly. (A probabilistic variant could drop the
         payload and trust the hash — at 1e12 docs * ~64 windows each,
         64-bit collisions are expected, so exactness keeps the bytes.)
      3. per-bucket: count identical byte windows (equal windows share a
         hash, hence a bucket), emit positions of those seen >= 2 times.

    At scale the exchange carries (id, pos, bucket, window-bytes) per
    sampled window — (window + 24) bytes per ``stride`` text bytes, i.e.
    ~3.5x the raw text bytes at the 32/16 defaults. That is the price of
    exact output (suffix arrays pay ~8x in memory instead); widening
    stride to 64 with window 64 brings it to ~1.4x and still catches
    any repeated passage >= 127 bytes.

    ``exact=False`` is the 100-TB knob: the window bytes are dropped
    from the exchange (24 bytes per stride bytes, ~1.5x text) and two
    windows are called equal when their 64-bit hashes collide — the
    splitmix-finalized hash is uniform, so the expected number of FALSE
    duplicate spans is ~W²/2⁶⁵ for W total windows (at 10¹² docs × 64
    windows, ~100k spurious spans among 6.4e13 — a ~1e-9 rate; each
    false span merely over-trims one window of text). Missed duplicates
    cannot happen in either mode.
    """
    from buteo_ray.state.skew import derive_num_partitions

    n_buckets = derive_num_partitions(ds)

    def _windows(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy()
        id_type = t.schema.field(id_col).type
        data, starts, lens = _utf8_buffer_view(t[text_col])
        counts = np.maximum((lens - window) // stride + 1, 0)
        tot = int(counts.sum())
        if tot == 0:
            cols = {id_col: pa.array([], id_type),
                    "pos": pa.array([], pa.int64()),
                    "__bucket": pa.array([], pa.int64())}
            cols["win" if exact else "h64"] = (
                pa.array([], pa.binary()) if exact else pa.array([], pa.int64()))
            return pa.table(cols)
        offs = np.concatenate([[0], np.cumsum(counts)])
        rel = (np.arange(tot, dtype=np.int64)
               - np.repeat(offs[:-1], counts)) * stride
        abs0 = rel + np.repeat(starts, counts)
        # One gather of the actual window bytes (tot, window) — index
        # vector + strided view, no (tot, window) int64 index matrix.
        wb = np.lib.stride_tricks.sliding_window_view(data, window)[abs0]
        h = np.zeros(tot, dtype=np.uint64)
        for j in range(window):
            h = h * np.uint64(1099511628211) + wb[:, j]
        h = _splitmix64(h)
        cols = {id_col: pa.array(np.repeat(ids, counts)).cast(id_type),
                "pos": pa.array(rel),
                "__bucket": pa.array((h % np.uint64(n_buckets)).view(np.int64))}
        if exact:
            buf = pa.py_buffer(np.ascontiguousarray(wb).tobytes())
            cols["win"] = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(window), tot, [None, buf]).cast(pa.binary())
        else:
            cols["h64"] = pa.array(h.view(np.int64))
        return pa.table(cols)

    key = "win" if exact else "h64"

    def _dups(g: pd.DataFrame) -> pd.DataFrame:
        # Rows in g share a hash bucket; count identical keys (exact
        # window bytes, or the full 64-bit hash in hash-only mode).
        vc = g[key].value_counts()
        keep = g[g[key].map(vc) >= 2]
        return keep[[id_col, "pos"]]

    return (ds.map_batches(_windows, batch_format="pyarrow", batch_size=None)
            .groupby("__bucket")
            .map_groups(_dups, batch_format="pandas"))


def duplicate_spans_brute(texts: List[str], ids: List[int],
                          window: int = 32, stride: int = 16) -> List[Tuple[int, int]]:
    """Brute-force oracle for duplicate_spans (pytest-side)."""
    from collections import Counter

    occ = []
    c: Counter = Counter()
    for i, s in zip(ids, texts):
        b = s.encode("utf-8")
        for p in range(0, max(len(b) - window + 1, 0), stride):
            w = b[p:p + window]
            occ.append((i, p, w))
            c[w] += 1
    return sorted((i, p) for i, p, w in occ if c[w] >= 2)


def _components_numpy(u: np.ndarray, v: np.ndarray
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """(node_ids, cluster_ids) of the edge list, via vectorized
    min-label propagation with pointer jumping (O(E log n) total work,
    no Python per-edge loop). Labels live in INDEX space over the
    sorted unique node ids, so the minimum index IS the minimum id."""
    ids = np.unique(np.concatenate([u, v]))
    ui = np.searchsorted(ids, u)
    vi = np.searchsorted(ids, v)
    lab = np.arange(len(ids), dtype=np.int64)
    while True:
        prev = lab
        lab = lab.copy()
        np.minimum.at(lab, ui, prev[vi])
        np.minimum.at(lab, vi, prev[ui])
        lab = np.minimum(lab, lab[lab])  # pointer jumping
        if np.array_equal(lab, prev):
            break
    while True:  # full path compression
        nxt = lab[lab]
        if np.array_equal(nxt, lab):
            break
        lab = nxt
    return ids, ids[lab]


def _star_contraction(edges, max_rounds: int = 64):
    """Connected components of a symmetrized edge Dataset[(u, v)] via
    ALTERNATING LARGE-STAR / SMALL-STAR contraction (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14) — O(log n)
    rounds regardless of graph diameter, vs label propagation's
    diameter rounds. This is the fallback :func:`dup_clusters` switches
    to when propagation exhausts ``max_iters`` on an adversarially
    chained dup graph (banded-LSH graphs are near-clique, diameter ≤4,
    and never get here).

    Each round is two bucketed vectorized folds over the node key plus
    a bucketed distinct — the engine's standard unbounded-cardinality
    primitives, never one Ray group per node:
      large-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v>u
      small-star(u): over hi→lo oriented edges, m = min(N(u) ∪ {u});
                     emit (x, m) for x ∈ N(u) ∪ {u}
    Both outputs are naturally hi→lo oriented and self-loop-free.
    Convergence: the distinct edge set's (count, wrapped-sum-of-hashes)
    fingerprint is unchanged — the joint fixpoint of the two operations
    is "every component is a star centered at its minimum id", so the
    final edges ARE the (node → cluster_id) label table. Only the
    distinct oriented edge list is pinned per round (≤ the input pair
    count — both operations emit at most one edge per input edge).
    Returns (labels Dataset[(node, lbl)], rounds used)."""
    from buteo_ray.stages.aggregate import (bucketed_count, bucketed_fold,
                                            nonempty_arrow_blocks)

    def _orient(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        hi, lo = np.maximum(u, v), np.minimum(u, v)
        keep = hi != lo
        return pa.table({"u": hi[keep], "v": lo[keep]})

    def _both_dirs(t: pa.Table) -> pa.Table:
        u = t["u"].combine_chunks()
        v = t["v"].combine_chunks()
        return pa.table({"u": pa.concat_arrays([u, v]),
                         "v": pa.concat_arrays([v, u])})

    def _large_star_fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy()
        v = g["v"].to_numpy()
        m = np.minimum(
            g.groupby("u", sort=False)["v"].transform("min").to_numpy(), u)
        keep = v > u
        return pd.DataFrame({"u": v[keep], "v": m[keep]})

    def _small_star_fold(g: pd.DataFrame) -> pd.DataFrame:
        u = g["u"].to_numpy()
        v = g["v"].to_numpy()
        m = g.groupby("u", sort=False)["v"].transform("min").to_numpy()
        first = ~pd.Series(u).duplicated().to_numpy()  # one (u, m) per group
        out_u = np.concatenate([v, u[first]])
        out_v = np.concatenate([m, m[first]])
        keep = out_u != out_v
        return pd.DataFrame({"u": out_u[keep], "v": out_v[keep]})

    def _fingerprint(ed) -> tuple:
        def _h(t: pa.Table) -> pa.Table:
            u = t["u"].to_numpy(zero_copy_only=False).view(np.uint64)
            v = t["v"].to_numpy(zero_copy_only=False).view(np.uint64)
            s = _splitmix64(u * _FNV_PRIME + _splitmix64(v)).sum(
                dtype=np.uint64)
            return pa.table({"s_hi": pa.array([int(s >> np.uint64(32))],
                                              type=pa.int64()),
                             "s_lo": pa.array([int(s & np.uint64(0xFFFFFFFF))],
                                              type=pa.int64()),
                             "n": pa.array([t.num_rows], type=pa.int64())})

        # One row per block, count carried in the same partial — the
        # driver folds n_blocks partials and the dataset executes ONCE
        # per round (a separate ed.count() would execute it twice).
        tot, n = 0, 0
        for t in nonempty_arrow_blocks(
                ed.map_batches(_h, batch_format="pyarrow", batch_size=None)):
            part = (t["s_hi"].to_numpy().astype(object) * 2**32
                    + t["s_lo"].to_numpy()).sum()
            tot = (tot + int(part)) % 2**64
            n += int(t["n"].to_numpy().sum())
        return n, tot

    ed = edges.map_batches(_orient, batch_format="pyarrow", batch_size=None)
    ed = bucketed_count(ed, ["u", "v"], alias="__n") \
        .select_columns(["u", "v"]).materialize()
    prev_fp = _fingerprint(ed)
    for rounds in range(1, max_rounds + 1):
        sym = ed.map_batches(_both_dirs, batch_format="pyarrow",
                             batch_size=None)
        ls = bucketed_fold(sym, ["u"], _large_star_fold)
        ss = bucketed_fold(ls, ["u"], _small_star_fold)
        ed = bucketed_count(ss, ["u", "v"], alias="__n") \
            .select_columns(["u", "v"]).materialize()
        fp = _fingerprint(ed)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(
            f"star contraction did not converge in max_rounds={max_rounds} "
            "(expected O(log n)); the edge list is pathological")

    def _leaves(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["u"], "lbl": t["v"]})

    def _roots(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["v"], "lbl": t["v"]})

    leaves = ed.map_batches(_leaves, batch_format="pyarrow", batch_size=None)
    roots = bucketed_count(ed.select_columns(["v"]), ["v"], alias="__n") \
        .map_batches(_roots, batch_format="pyarrow", batch_size=None)
    return leaves.union(roots), rounds


def dup_clusters(pairs_ds, id_a: str = "id_a", id_b: str = "id_b",
                 max_iters: int = 32,
                 driver_threshold: int = 64 << 20):
    """Connected components over a near-dup pair list → the cluster
    table every dedup pipeline needs to pick canonical representatives.

    Input: the edge list produced by :func:`minhash_lsh_pairs` /
    :func:`simhash_dup_pairs` / :func:`cosine_dup_pairs` (any Dataset
    with two integer id columns). Output: Dataset[(doc_id:int64,
    cluster_id:int64)], one row per document appearing in ≥1 pair,
    ``cluster_id`` = the MIN doc_id reachable through dup edges — keep
    the rows where ``cluster_id == doc_id``, drop the rest.

    Two tiers, gated on the materialized edge-list size (mirroring the
    engine's broadcast-join gate): under ``driver_threshold`` bytes the
    components come from one vectorized numpy pointer-jumping fold on
    the driver; past it, the distributed superstep plan below.

    Plan (min-label propagation; one Pregel-style superstep per round):
    edges are symmetrized once and pinned; labels start as each node's
    own id; each round joins current labels onto edge TARGETS
    (:func:`~buteo_ray.stages.join_partitioned.hash_join_auto` —
    broadcast under its size gate, hash-partitioned beyond it), folds
    the per-node min with a bucketed fold (node cardinality is
    unbounded, so Ray's raw groupby is off the table), and merges with
    the previous labels. Labels only DECREASE, so Σ labels is a
    monotone convergence certificate — one cheap distributed ``sum()``
    per round instead of a change-detection join (exact while
    Σ doc_ids < 2^63, i.e. any realistic id space; beyond that cap
    rounds explicitly). Per-round ``materialize()`` pins only the
    LABEL table — one row per node-in-pairs, orders of magnitude
    smaller than the corpus — never the corpus itself.

    Rounds needed = dup-graph diameter. Banded-LSH dup graphs are
    unions of band cliques (diameter 1-2; ≤4 rounds in practice). If
    propagation exhausts ``max_iters`` (adversarially chained graph),
    the plan switches to :func:`_star_contraction` — alternating
    large-star / small-star (Kiveris et al., SoCC'14; O(log n) rounds
    regardless of diameter), built from the same join/fold primitives.
    """
    import ray
    import pyarrow.compute as pc

    from buteo_ray.stages.aggregate import bucketed_fold
    from buteo_ray.stages.join_partitioned import hash_join_auto

    def _sym(t: pa.Table) -> pa.Table:
        a = t[id_a].cast(pa.int64()).combine_chunks()
        b = t[id_b].cast(pa.int64()).combine_chunks()
        # Fail loud on null ids (same convention as assign_shuffle_shards):
        # downstream to_numpy(zero_copy_only=False) would silently promote
        # the column to float64/NaN and produce garbage cluster ids.
        if a.null_count or b.null_count:
            raise ValueError(
                f"dup_clusters: pair list has null ids "
                f"({id_a}: {a.null_count} nulls, {id_b}: {b.null_count})")
        return pa.table({"u": pa.concat_arrays([a, b]),
                         "v": pa.concat_arrays([b, a])})

    edges = pairs_ds.map_batches(_sym, batch_format="pyarrow",
                                 batch_size=None).materialize()
    empty = pa.table({"doc_id": pa.array([], type=pa.int64()),
                      "cluster_id": pa.array([], type=pa.int64())})
    if edges.count() == 0:
        return ray.data.from_arrow(empty)

    # Size gate (same contract as hash_join_auto's broadcast gate): the
    # edge list is the DUP-PAIR graph — orders of magnitude smaller
    # than the corpus — and when it fits under the threshold, one
    # vectorized numpy fold on the driver beats paying Ray's fixed
    # per-execution overhead once per superstep (measured 13 s → ~0.1 s
    # at bench scale). Past the gate, the distributed superstep loop
    # below runs unchanged.
    if (edges.size_bytes() or 0) <= driver_threshold:
        from buteo_ray.stages.aggregate import nonempty_arrow_blocks

        et = pa.concat_tables(nonempty_arrow_blocks(edges))
        ids, cl = _components_numpy(
            et["u"].to_numpy(zero_copy_only=False),
            et["v"].to_numpy(zero_copy_only=False))
        return ray.data.from_arrow(pa.table({"doc_id": ids,
                                             "cluster_id": cl}))

    def _uniq_nodes(t: pa.Table) -> pa.Table:
        u = pc.unique(t["u"].combine_chunks())
        return pa.table({"node": u, "lbl": u})

    def _min_fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("node", sort=False, as_index=False)["lbl"].min()

    labels = bucketed_fold(
        edges.map_batches(_uniq_nodes, batch_format="pyarrow",
                          batch_size=None),
        ["node"], _min_fold).materialize()
    prev_sum = labels.sum("lbl")

    def _as_cand(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["u"], "lbl": t["lbl"]})

    for _ in range(max_iters):
        # lbl(v) shipped to each edge (u, v): labels is keyed UNIQUE on
        # node, so the join broadcasts while it fits and shuffles beyond.
        cand = hash_join_auto(edges, labels, left_on="v", right_on="node") \
            .map_batches(_as_cand, batch_format="pyarrow", batch_size=None)
        labels = bucketed_fold(cand.union(labels), ["node"],
                               _min_fold).materialize()
        s = labels.sum("lbl")
        if s == prev_sum:
            break
        prev_sum = s
    else:
        # Dup-graph diameter exceeds max_iters (adversarially chained
        # graph): switch to alternating star contraction — O(log n)
        # rounds regardless of diameter, same join/fold primitives.
        star_labels, _ = _star_contraction(edges)
        # Min-fold the star labels with the propagation labels rather
        # than replacing them: the contraction's _orient drops
        # self-loops, so a node whose EVERY edge is a self-loop has no
        # star row — its propagation row (label = itself) must survive.
        # For contracted nodes the star label is the exact component
        # minimum, always ≤ the partially-propagated label, so the min
        # picks the star answer.
        labels = bucketed_fold(star_labels.union(labels), ["node"],
                               _min_fold).materialize()

    def _out(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["node"], "cluster_id": t["lbl"]})

    return labels.map_batches(_out, batch_format="pyarrow", batch_size=None)


def dedup_paragraphs(ds, para_tokens: int = 16, text_col: str = "text",
                     id_col: str = "doc_id",
                     num_buckets: Optional[int] = None):
    """Corpus-wide paragraph dedup — the CCNet curation step (Wenzek et
    al., LREC 2020): segment every document into fixed ``para_tokens``-
    token windows ("paragraphs" — this corpus is single-line, so the
    window stands in for the newline split), keep only the FIRST
    occurrence of each distinct paragraph across the WHOLE corpus
    (first = smallest (id, paragraph index), compared lexicographically
    — no arithmetic key, so ids of any magnitude are safe), and
    reassemble each document from its surviving paragraphs in order.
    A document whose every paragraph was seen earlier disappears from
    the output entirely (the CCNet rule). Within-doc repeats are a
    special case and are removed too (the earlier index wins).

    Plan — two bucketed shuffles, both O(paragraph rows):
      1. segmentation via :func:`buteo_ray.stages.text.chunk_documents`
         with overlap 0 (one vectorized byte gather per block, no
         shuffle);
      2. per-block PARTIAL first-occurrence dedup (the combiner —
         duplicate paragraphs inside one block never cross the wire;
         valid because the locally-dropped row always loses to a row
         with a strictly smaller (id, index), so it can never be the
         global first) → hash-bucketed fold keyed on the paragraph
         TEXT: one stable sort + ``drop_duplicates(keep="first")`` per
         bucket (collision-safe — the hash only routes, equality is on
         the text);
      3. reassembly via :func:`buteo_ray.stages.aggregate
         .collect_ordered` (STRING_AGG ORDER BY paragraph index),
         hash-bucketed on the doc id.

    At 100 TB nothing is pinned: every stage streams, and the exchanged
    rows carry (id, index, paragraph) — ≤ input text bytes + 16 B/para.

    Returns Dataset[(id_col, text_clean, n_paras_kept)].
    """
    from buteo_ray.stages.aggregate import bucketed_fold, collect_ordered
    from buteo_ray.stages.text import chunk_documents

    paras = chunk_documents(ds.select_columns([id_col, text_col]),
                            chunk_tokens=para_tokens, overlap=0,
                            text_col=text_col)

    def _first(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "chunk_id"], kind="stable")
        return g.drop_duplicates(subset=["chunk"], keep="first")

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        return _first(df[[id_col, "chunk_id", "chunk"]])

    local = paras.map_batches(_partial, batch_format="pandas",
                              batch_size=None)
    kept = bucketed_fold(local, ["chunk"], _first, num_buckets)
    return collect_ordered(kept, id_col, ["chunk_id"], "chunk", sep=" ",
                           alias="text_clean",
                           count_alias="n_paras_kept",
                           num_buckets=num_buckets)


def dedup_against(new_ds, seen_ds, text_col: str = "text",
                  seen_text_col: Optional[str] = None,
                  broadcast_threshold: int = 64 << 20):
    """Incremental (snapshot-over-snapshot) exact dedup: drop every NEW
    document whose ``text_col`` already exists in the SEEN corpus — the
    monthly-crawl update step (dedup new data against everything already
    ingested, without re-shuffling the old corpus with the new).

    Plan: both sides are reduced to their 64-bit content-hash columns;
    the new side anti-joins the seen side's hash set via
    :func:`buteo_ray.stages.join_partitioned.anti_join_auto` (key-set
    broadcast under the byte gate, hash-partitioned ``left_anti``
    beyond). Only 8 B/doc of the seen corpus ever moves. Hash collision
    caveat (documented contract): a 64-bit collision can drop a
    false-positive new doc — at 10⁹ seen docs the expected collision
    count for one new doc is ~5e-11; callers needing certainty re-check
    survivors' texts against the colliding bucket.
    """
    from buteo_ray.stages.join_partitioned import anti_join_auto

    seen_col = seen_text_col or text_col

    def _h(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(__h=content_hash_column(df[text_col]))

    def _hs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"__h": np.unique(
            content_hash_column(df[seen_col]))})

    hashed = new_ds.map_batches(_h, batch_format="pandas",
                                batch_size=None)
    seen = seen_ds.map_batches(_hs, batch_format="pandas",
                               batch_size=None)
    # The hash table is ≤ the seen corpus's bytes, so the SOURCE
    # metadata size is a safe routing hint — without it a lazily-empty
    # seen side would take the shuffle tier and hit Ray 2.49's Acero
    # crash on schemaless empty blocks (see hash_join_auto).
    from buteo_ray.state.skew import estimate_bytes

    out = anti_join_auto(hashed, seen, "__h", "__h",
                         broadcast_threshold=broadcast_threshold,
                         right_bytes_hint=estimate_bytes(seen_ds))
    return out.drop_columns(["__h"])
