"""End-to-end training-data pipeline — the canonical 100 TB web-text
preparation chain composed from the engine's operators:

read pages → language ID (actor pool) → quality filter (vectorized
heuristics) → exact dedup (hash-partition + first) → near-dup removal
(selectable: OPH-MinHash LSH pairs, exact Hamming-radius SimHash pairs,
or embedding-cosine pairs — drop the higher id of each pair) → token
count → deterministic train/val split → resumable partitioned write.

Every stage streams; the only shuffles are the two dedup groupbys and
the near-dup pair join (broadcast of the small drop-set). All
randomness is hash-derived → any partition is recomputable.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from buteo_ray.stages.dedup import exact_dedup, minhash_lsh_pairs
from buteo_ray.stages.selection import add_split_column
from buteo_ray.stages.text import add_lang_pred, add_quality_score


def training_data_pipeline(
    pages_ds,
    id_col: str = "page_id",
    text_col: str = "text",
    keep_langs: Optional[set] = None,
    min_tokens: int = 10,
    near_dup_method: str = "minhash",
    near_dup_threshold: float = 0.85,
    near_dup_hamming: int = 3,
    near_dup_cosine: float = 0.95,
    cluster_drop: bool = False,
    emb_col: Optional[str] = None,
    val_frac: float = 0.05,
    write_to: Optional[str] = None,
    lang_concurrency: Optional[int] = None,
    drop_broadcast_threshold: int = 64 << 20,
    scrub_pii: bool = False,
    max_dup_bigram_frac: Optional[float] = None,
    chunk_tokens: Optional[int] = None,
    chunk_overlap: int = 16,
    para_dedup_tokens: Optional[int] = None,
    mixture_fractions: Optional[dict] = None,
    mixture_key: str = "source",
    mixture_seed: int = 42,
):
    """Run the chain over a page Dataset; returns the final Dataset (or
    lineage rows when ``write_to`` is set).

    ``id_col`` must be an integer column: the near-dup stage and the
    hash split coerce ids to int64/uint64. A string id (URL, hex hash)
    would either crash deep inside the LSH stage or — for numeric
    strings — make the anti-join compare string vs int64 and silently
    keep every near-dup. Checked loudly here instead.

    ``cluster_drop=True`` replaces the default drop-the-larger-id-of-
    each-pair rule with exact one-doc-per-connected-component dedup
    (:func:`~buteo_ray.stages.dedup.dup_clusters`): the pair rule
    under-drops star graphs whose hub carries the largest id. Costs one
    components pass over the pair list (size-gated driver fold /
    distributed supersteps); the drop-set then flows through the same
    anti-join machinery.

    ``near_dup_hamming`` is calibrated against the CURRENT simhash token
    hash family (FNV-polynomial + splitmix64, dedup.py:simhash64); a
    given near-dup pair's distance moves when the hash family changes,
    so recalibrate the radius on a labelled sample after any such
    change rather than assuming 3 transfers."""
    import pyarrow.compute as pc
    import pyarrow.types as pat

    # Fail fast on bad dispatch args: by the time the near-dup stage
    # would notice, the lang-ID pool, quality filters and the exact-dedup
    # shuffle have already run over the whole corpus — hours at 100 TB.
    if near_dup_method not in ("minhash", "simhash", "embedding"):
        raise ValueError(
            f"unknown near_dup_method {near_dup_method!r} "
            "(expected 'minhash', 'simhash', or 'embedding')")
    if near_dup_method == "embedding" and emb_col is None:
        raise ValueError("near_dup_method='embedding' needs emb_col")
    if chunk_tokens is not None and (
            chunk_tokens <= 0 or not (0 <= chunk_overlap < chunk_tokens)):
        raise ValueError(
            f"need chunk_tokens > 0 and 0 <= chunk_overlap < chunk_tokens "
            f"(got {chunk_tokens}, {chunk_overlap})")

    sch = pages_ds.schema()  # ray Schema wrapper: parallel names/types
    id_type = dict(zip(sch.names, sch.types))[id_col]
    if isinstance(id_type, pa.DataType):  # arrow blocks
        id_is_int = pat.is_integer(id_type)
    else:  # pandas blocks report numpy dtypes (object for strings)
        try:
            id_is_int = np.issubdtype(np.dtype(id_type), np.integer)
        except TypeError:
            id_is_int = False
    if not id_is_int:
        raise TypeError(
            f"training_data_pipeline: id_col '{id_col}' must be an integer "
            f"column (got {id_type}); map string ids to int64 first "
            "(e.g. a content-hash column via stages.dedup.content_hash_column)")

    ds = add_lang_pred(pages_ds, concurrency=lang_concurrency)
    if keep_langs:
        lang_set = pa.array(sorted(keep_langs), type=pa.string())

        def _lang_filter(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["lang_pred"], value_set=lang_set))

        ds = ds.map_batches(_lang_filter, batch_format="pyarrow", batch_size=None)

    ds = add_quality_score(ds, text_col=text_col)

    def _quality_filter(t: pa.Table) -> pa.Table:
        n = t["n_tokens"].to_numpy()
        return t.filter(pa.array(n >= min_tokens))

    ds = ds.map_batches(_quality_filter, batch_format="pyarrow", batch_size=None)

    if mixture_fractions is not None:
        # Mixture resampling (per-source keep rates, hash-thresholded on
        # id — stages/selection.py:mixture_sample). Applied EARLY — right
        # after the row-level gates and before the dedup shuffles — so
        # down-weighted sources never pay the expensive stages. Rates are
        # per-row keep probabilities over the post-filter population, not
        # achieved output proportions; keys absent from the dict drop.
        from buteo_ray.stages.selection import mixture_sample

        ds = mixture_sample(ds, key_col=mixture_key,
                            fractions=mixture_fractions,
                            id_col=id_col, seed=mixture_seed)

    if max_dup_bigram_frac is not None:
        # Gopher-style repetition gate: drop docs whose duplicate-bigram
        # share exceeds the cap. Computed inline per batch (stateless,
        # vectorized) — NOT a join against a rep_ngrams() Dataset, which
        # would re-read the corpus and shuffle it once more.
        from buteo_ray.stages.text import bigram_counts

        def _rep_filter(t: pa.Table) -> pa.Table:
            n, nd = bigram_counts(t[text_col])
            # n == 0 implies nd == 0, so the maximum() guard alone
            # yields dup_frac 0.0 for bigram-less docs.
            dup_frac = (n - nd) / np.maximum(n, 1)
            return t.filter(pa.array(dup_frac <= max_dup_bigram_frac))

        ds = ds.map_batches(_rep_filter, batch_format="pyarrow", batch_size=None)

    if scrub_pii:
        from buteo_ray.stages.text import pii_scrub

        # Scrub BEFORE dedup: two docs identical except for distinct
        # emails become exact duplicates post-redaction (the curation
        # order the public CC recipes use).
        ds = pii_scrub(ds, text_col=text_col, out_col=text_col)

    if para_dedup_tokens is not None:
        from buteo_ray.stages.text import drop_repeated_paras

        # Within-doc paragraph dedup (map-only tier) BEFORE exact
        # dedup: two docs differing only in how often they repeat the
        # same boilerplate collapse to identical cleaned text and fall
        # to the exact stage. The corpus-wide CCNet tier
        # (stages.dedup.dedup_paragraphs) stays a standalone op — it
        # re-keys the corpus to (id, text) and would drop the payload
        # columns this chain carries.
        ds = drop_repeated_paras(ds, para_tokens=para_dedup_tokens,
                                 text_col=text_col)

    # Exact dedup (min-id row per identical text). Materialize here: the
    # deduped set is consumed TWICE (LSH pair mining + final output) and
    # Ray Datasets are lazy — without pinning, the lang-ID pool, filters
    # and the dedup shuffle would all execute twice.
    ds = exact_dedup(ds, text_col=text_col, id_col=id_col).materialize()

    # Near-dup removal: candidate pairs → drop the larger id of each
    # kept pair via a hash-partitioned LEFT ANTI join on id_b. The pair
    # set never touches the driver, so a duplicate-heavy corpus (the
    # Common-Crawl case) cannot blow driver memory; duplicate id_b rows
    # on the right are harmless under anti-join semantics.
    from buteo_ray.state.skew import derive_num_partitions

    if near_dup_method == "minhash":
        pairs = minhash_lsh_pairs(ds, text_col=text_col, id_col=id_col,
                                  threshold=near_dup_threshold)
    elif near_dup_method == "simhash":
        from buteo_ray.stages.dedup import simhash_dup_pairs

        pairs = simhash_dup_pairs(ds, max_hamming=near_dup_hamming,
                                  text_col=text_col, id_col=id_col)
    else:  # "embedding" — validated at the top of the function
        from buteo_ray.stages.dedup import cosine_dup_pairs

        pairs = cosine_dup_pairs(ds, threshold=near_dup_cosine,
                                 id_col=id_col, emb_col=emb_col)
    if cluster_drop:
        # Exact one-doc-per-component dedup: the default drop-id_b rule
        # under-drops star graphs (pairs (a,c),(b,c) keep BOTH a and b
        # though {a,b,c} is one near-dup cluster). dup_clusters resolves
        # connected components; every non-representative becomes a drop
        # row, feeding the same anti-join machinery below.
        from buteo_ray.stages.dedup import dup_clusters

        def _nonrep(t: pa.Table) -> pa.Table:
            keep = pc.not_equal(t["doc_id"], t["cluster_id"])
            return pa.table({"id_b": t.filter(keep)["doc_id"]})

        drops = dup_clusters(pairs).map_batches(
            _nonrep, batch_format="pyarrow", batch_size=None).materialize()
    else:
        drops = pairs.select_columns(["id_b"]).materialize()
    n_drops = drops.count()
    # Gate on the MATERIALIZED byte size, not a fixed 8 bytes/id —
    # string id columns can be far larger than their row count implies.
    drop_bytes = drops.size_bytes() or n_drops * 8
    if n_drops > 0 and drop_bytes < drop_broadcast_threshold:
        # Typical corpora: the drop-set is a few percent of the rows —
        # exact size known post-materialize. Broadcast it once
        # (`ray.put`) and anti-filter with a vectorized searchsorted
        # probe: zero shuffles, no Acero, nested payload columns stream
        # untouched. The gate (64 MB per worker heap) sends
        # duplicate-saturated corpora to the partitioned join below.
        import ray as _ray

        # nonempty_arrow_blocks drops map_groups' schemaless / stray-
        # pandas empty blocks; only typed blocks carry ids.
        from buteo_ray.stages.aggregate import nonempty_arrow_blocks

        keys = np.unique(np.concatenate(
            [t["id_b"].to_numpy() for t in nonempty_arrow_blocks(drops)]
            or [np.array([], dtype=np.int64)]))
        kref = _ray.put(keys)

        def _anti(t: pa.Table) -> pa.Table:
            k = _ray.get(kref)
            ids = t[id_col].to_numpy()
            pos = np.clip(np.searchsorted(k, ids), 0, len(k) - 1)
            return t.filter(pa.array(k[pos] != ids))

        ds = ds.map_batches(_anti, batch_format="pyarrow", batch_size=None)
    elif n_drops > 0:
        # Ray's map_groups emits SCHEMALESS empty blocks for empty sort
        # partitions (the per-group UDF is never invoked, and map_batches
        # passes empty blocks through without running the UDF either);
        # Acero rejects a join partition made only of such blocks ("No
        # match for FieldRef id_b"). Coalesce them away: repartition with
        # block-count ≤ row-count merges every empty block into a typed
        # one (local split/merge, no all-to-all).
        drops = drops.repartition(
            max(1, min(derive_num_partitions(drops), n_drops))).materialize()
        # Acero (the per-partition join kernel) rejects nested payload
        # columns (list / tensor embeddings) — byte-pack them across
        # the shuffle and restore after.
        from buteo_ray.stages.nested_join import (nested_payload_columns,
                                                  pack_nested, unpack_nested)

        plan = nested_payload_columns(ds.schema())
        ds = pack_nested(ds, plan)
        ds = ds.join(drops, join_type="left_anti",
                     num_partitions=derive_num_partitions(ds, drops),
                     on=(id_col,), right_on=("id_b",))
        ds = unpack_nested(ds, plan)

    ds = add_split_column(ds, id_col=id_col, val_frac=val_frac)

    if chunk_tokens is not None:
        # Chunk AFTER the split: every chunk inherits its document's
        # train/val label, so one doc's overlapping windows can never
        # straddle the split (val leakage). The chunk becomes the text.
        from buteo_ray.stages.text import chunk_documents

        ds = chunk_documents(ds, chunk_tokens=chunk_tokens,
                             overlap=chunk_overlap, text_col=text_col)

        def _rename(t: pa.Table) -> pa.Table:
            # The chunk becomes the text; the doc-level quality columns
            # (n_tokens/n_chars_text/mean_token_len) describe the ORIGINAL
            # document, which no longer exists as a row — drop them so no
            # consumer mis-sizes packing from a stale n_tokens next to a
            # 128-token text. n_tokens_chunk is the per-row truth.
            stale = [c for c in ("n_tokens", "n_chars_text", "mean_token_len")
                     if c in t.column_names]
            t = t.drop_columns(stale)
            return t.rename_columns(
                [text_col if c == "chunk" else c for c in t.column_names])

        ds = ds.map_batches(_rename, batch_format="pyarrow", batch_size=None)

    if write_to is not None:
        # 'split' has 2-3 values — without sharding the whole train split
        # would funnel into ONE write task. Shard by id, size-derived
        # count (1 at bench scale, ~bytes/256 MB at scale).
        from buteo_ray.state.checkpoint import (derive_num_shards,
                                                write_partitioned_resumable)

        # hot_share=1.0 (default): 'train' can be ~all the bytes. On
        # resume the recorded scheme wins (estimates drift between runs).
        shards = derive_num_shards(ds, out_dir=write_to)
        return write_partitioned_resumable(
            ds, write_to, "split", op_version="training-data-v1",
            shard_col=id_col, num_shards=shards)
    return ds
