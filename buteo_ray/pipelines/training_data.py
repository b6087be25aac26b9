"""End-to-end training-data pipeline — the canonical 100 TB web-text
preparation chain composed from the engine's operators:

read pages → language ID (actor pool) → quality filter (vectorized
heuristics) → exact dedup (hash-partition + first) → near-dup removal
(OPH-MinHash LSH pairs → drop the higher id of each pair) → token count
→ deterministic train/val split → resumable partitioned write.

Every stage streams; the only shuffles are the two dedup groupbys and
the near-dup pair join (broadcast of the small drop-set). All
randomness is hash-derived → any partition is recomputable.
"""

from __future__ import annotations

from typing import Optional

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
    near_dup_threshold: float = 0.85,
    val_frac: float = 0.05,
    write_to: Optional[str] = None,
    lang_concurrency: Optional[int] = None,
):
    """Run the chain over a page Dataset; returns the final Dataset (or
    lineage rows when ``write_to`` is set)."""
    import pyarrow.compute as pc

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

    # Exact dedup (min-id row per identical text). Materialize here: the
    # deduped set is consumed TWICE (LSH pair mining + final output) and
    # Ray Datasets are lazy — without pinning, the lang-ID pool, filters
    # and the dedup shuffle would all execute twice.
    ds = exact_dedup(ds, text_col=text_col, id_col=id_col).materialize()

    # Near-dup removal: LSH candidate pairs → drop the larger id of each
    # kept pair via a hash-partitioned LEFT ANTI join on id_b. The pair
    # set never touches the driver, so a duplicate-heavy corpus (the
    # Common-Crawl case) cannot blow driver memory; duplicate id_b rows
    # on the right are harmless under anti-join semantics.
    from buteo_ray.state.skew import derive_num_partitions

    pairs = minhash_lsh_pairs(ds, text_col=text_col, id_col=id_col,
                              threshold=near_dup_threshold)
    drops = pairs.select_columns(["id_b"]).materialize()
    if drops.count() > 0:
        ds = ds.join(drops, join_type="left_anti",
                     num_partitions=derive_num_partitions(ds, drops),
                     on=(id_col,), right_on=("id_b",))

    ds = add_split_column(ds, id_col=id_col, val_frac=val_frac)

    if write_to is not None:
        from buteo_ray.state.checkpoint import write_partitioned_resumable

        return write_partitioned_resumable(ds, write_to, "split",
                                           op_version="training-data-v1")
    return ds
