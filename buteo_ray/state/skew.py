"""Skew handling: hot-key detection and salted two-level aggregation
(SURVEY.md §4 "salted keys for hot cells — required by the north rule").

Web pages geocode heavily into urban cells (the synthetic generator puts
30% of pages into one ~2° hot cluster on purpose); a bare
``groupby(cell)`` sends every hot-cell row to one reducer. The salted
plan:

1. cheap ``groupby(key).count()`` (tiny result) → hot-key set,
2. hot rows get ``salt = hash(row) % k``; cold rows salt 0,
3. wide op runs on ``(key, salt)`` — hot keys now spread over k
   reducers,
4. a second, small aggregation merges the k salted partials per key.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from buteo_ray.stages.dedup import _splitmix64


def estimate_bytes(ds) -> int:
    """Metadata-only dataset size estimate — NEVER executes the plan.

    ``Dataset.size_bytes()`` is metadata-only for raw reads and
    materialized datasets, but on a map-derived dataset Ray 2.49 falls
    through to ``self._plan.execute()`` — calling it at graph-build time
    silently materializes the whole upstream pipeline. Instead, walk the
    logical DAG to its leaf ops (Read / FromPandas / InputData) and sum
    their ``infer_metadata().size_bytes`` — the SOURCE bytes, an upper
    bound for the usual project/filter chains. Unknown leaves count 0.

    Leaves are counted once per DAG *path*, not once per object: a
    source reaching the sink via two branches (e.g. a union of two
    derivations of one read) executes twice at runtime, so it weighs
    twice here — deduping by object id would size downstream shuffles
    at half the true bytes."""
    try:
        if ds._plan.has_computed_output():
            return int(ds.size_bytes() or 0)
    except Exception:
        pass
    total = 0
    try:
        stack = [ds._logical_plan.dag]
        while stack:
            op = stack.pop()
            deps = getattr(op, "input_dependencies", None) or []
            if deps:
                stack.extend(deps)
                continue
            try:
                md = op.infer_metadata()
                total += int(md.size_bytes or 0)
            except Exception:
                pass
    except Exception:
        return 0
    return total


def estimate_rows(ds) -> int:
    """Metadata-only row-count estimate (same DAG walk as
    :func:`estimate_bytes` — never executes the plan). Source rows, an
    upper bound after filters; 0 when no leaf reports a count."""
    try:
        if ds._plan.has_computed_output():
            return int(ds.count() or 0)
    except Exception:
        pass
    total = 0
    try:
        stack = [ds._logical_plan.dag]
        while stack:
            op = stack.pop()
            deps = getattr(op, "input_dependencies", None) or []
            if deps:
                stack.extend(deps)
                continue
            try:
                md = op.infer_metadata()
                total += int(md.num_rows or 0)
            except Exception:
                pass
    except Exception:
        return 0
    return total


def derive_num_partitions(*datasets, target_bytes: int = 64 << 20,
                          lo: int = 8, hi: int = 4096) -> int:
    """Shuffle-partition count sized to the data, not hardcoded.

    ``ceil(sum(estimate_bytes) / target_bytes)`` clamped to [lo, hi];
    sizes come from :func:`estimate_bytes` (logical-plan metadata — never
    triggers execution, even on map-derived datasets).
    Byte-derived counts keep per-partition size near ``target_bytes`` at
    any scale: a 100 TB input gets thousands of partitions regardless of
    one node's core count, while a megabyte-scale input stays at ``lo``
    (measured: raising lo to the 32-core CPU count made Ray's
    hash-shuffle aggregator overhead DOMINATE small joins — 2.7× slower
    at sf0.1 — so the floor is deliberately low; large inputs reach full
    core fan-out through the bytes term alone)."""
    total = sum(estimate_bytes(ds) for ds in datasets)
    return int(max(lo, min(hi, -(-total // max(target_bytes, 1)))))


def key_counts(ds, key: str, top: Optional[int] = None) -> pd.DataFrame:
    """Per-key row counts (the skew probe — one cheap shuffle of
    pre-aggregated partials).

    The default (``top=None``) drives the FULL counts table to the
    driver — only safe for bounded-cardinality keys (cells, langs,
    tile ids). For high-cardinality keys pass ``top``: the counts stay
    distributed and only the ``top`` highest-count rows (a distributed
    sort + limit over the already-aggregated table) reach the driver."""
    from buteo_ray.stages.aggregate import bucketed_count

    agg = bucketed_count(ds, [key], alias="n")
    if top is not None:
        agg = agg.sort("n", descending=True).limit(top)
    return agg.to_pandas()


def hot_keys(ds, key: str, threshold: Optional[int] = None,
             max_keys: int = 65536) -> Dict:
    """Keys whose count exceeds ``threshold`` (default: 10× the median
    key count). Returns {key_value: count}.

    Driver-safe at any key cardinality: the counts table stays a
    Dataset; the median (threshold=None) comes from a distributed sort
    + single-row take at the midpoint, and at most ``max_keys`` hot
    rows (the highest counts) are collected.

    Median semantics: the midpoint row is ``sorted_counts[n_keys // 2]``
    — the UPPER middle element on even key counts (not the two-middle
    average pandas ``median()`` would interpolate). For a 10×-median
    hot-key heuristic the distinction is immaterial, and taking one row
    keeps the probe a single distributed ``split_at_indices`` + take.

    The counts themselves come from :func:`bucketed_count` — Ray's raw
    ``groupby(key)`` costs ~1.5 ms of reduce-side Python PER DISTINCT
    KEY (measured), which a skew probe over a high-cardinality key
    cannot afford."""
    from buteo_ray.stages.aggregate import bucketed_count

    counts_ds = bucketed_count(ds, [key], alias="n")
    if threshold is None:
        n_keys = counts_ds.count()
        if n_keys == 0:
            return {}
        mid = (counts_ds.sort("n").split_at_indices([n_keys // 2])[1]
               .limit(1).to_pandas())
        threshold = max(int(mid["n"].iloc[0]) * 10, 1000)
    thr = threshold

    def _filter_hot(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return t.filter(pc.greater(t["n"], thr))

    hot = (counts_ds.map_batches(_filter_hot, batch_format="pyarrow",
                                 batch_size=None)
           .sort("n", descending=True).limit(max_keys).to_pandas())
    if hot.empty or key not in hot.columns:
        # An all-cold dataset can come back as a schemaless empty frame.
        return {}
    return dict(zip(hot[key], hot["n"]))


def add_salt(ds, key: str, hot: Dict, salt_factor: int = 8,
             id_col: Optional[str] = None, salt_col: str = "salt"):
    """Append a salt column: ``hash(id) % salt_factor`` for hot keys,
    0 for cold. The hot-key set is broadcast in the task closure."""
    hot_set = set(hot)

    def _fn(batch: pa.Table) -> pa.Table:
        kv = batch[key].to_numpy(zero_copy_only=False)
        is_hot = np.isin(kv, np.array(list(hot_set), dtype=kv.dtype)) if hot_set else np.zeros(len(kv), bool)
        if id_col is not None:
            h = _splitmix64(batch[id_col].to_numpy(zero_copy_only=False).astype(np.uint64))
        else:
            h = _splitmix64(np.arange(len(kv), dtype=np.uint64))
        salt = np.where(is_hot, (h % np.uint64(salt_factor)).astype(np.int64), 0)
        return batch.append_column(salt_col, pa.array(salt))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def salted_count(ds, key: str, salt_factor: int = 8,
                 id_col: Optional[str] = None,
                 threshold: Optional[int] = None):
    """Two-level salted count per key — the canonical salted-aggregation
    plan (generalize by swapping the aggregate).

    Driver-safe AND fast at ANY key cardinality: both levels are
    bucketed vectorized folds (:func:`~buteo_ray.stages.aggregate.
    bucketed_count` / :func:`~buteo_ray.stages.aggregate.bucketed_fold`
    — never one Ray group per distinct key), and the result is returned
    as a Dataset[(key, n)]. Call ``.to_pandas()`` only when the key
    domain is bounded."""
    from buteo_ray.stages.aggregate import bucketed_count, bucketed_sum

    hot = hot_keys(ds, key, threshold)
    salted = add_salt(ds, key, hot, salt_factor, id_col=id_col)
    partial = bucketed_count(salted, [key, "salt"], alias="__sn")
    return bucketed_sum(partial, [key], {"n": "__sn"})
