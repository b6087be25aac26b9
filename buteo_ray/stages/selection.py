"""Dataset selection/sampling: train/val/test splits, stratified and
uniform sampling — the reference's ``ai/selection.py:11-240`` mapped to
Ray Data (SURVEY.md §2.9). Splits are seeded and hash-based so they are
deterministic, order-free and resumable (a row's split never depends on
partitioning)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

from buteo_ray.stages.dedup import _splitmix64


def _split_unit(ids: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic per-id uniform in [0, 1) from splitmix64."""
    h = _splitmix64(ids.astype(np.uint64) + np.uint64(seed * 0x9E3779B9))
    return h.astype(np.float64) / 2.0**64


def add_split_column(ds, id_col: str, val_frac: float = 0.1,
                     test_frac: float = 0.0, seed: int = 42,
                     out_col: str = "split"):
    """Append 'train'/'val'/'test' labels (≙ split_train_val(_test),
    reference ``ai/selection.py:11-140``; hash split instead of
    permutation → identical assignment at any scale/partitioning)."""

    def _fn(batch: pa.Table) -> pa.Table:
        u = _split_unit(batch[id_col].to_numpy(zero_copy_only=False), seed)
        lab = np.where(u < test_frac, "test",
                       np.where(u < test_frac + val_frac, "val", "train"))
        return batch.append_column(out_col, pa.array(lab, type=pa.string()))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def split_train_val(ds, id_col: str, val_frac: float = 0.1, seed: int = 42):
    """(train_ds, val_ds) via the hash split."""
    tagged = add_split_column(ds, id_col, val_frac=val_frac, seed=seed)
    train = tagged.filter(expr="split == 'train'")
    val = tagged.filter(expr="split == 'val'")
    return train, val


def split_train_val_test(ds, id_col: str, val_frac: float = 0.1,
                         test_frac: float = 0.2, seed: int = 42):
    """(train_ds, val_ds, test_ds) — 3-way hash split with the
    reference's proportions (``ai/selection.py:71-140``: the test cut is
    a fraction of the whole, the val cut a fraction of the remainder, so
    P(val) = val_frac·(1−test_frac))."""
    if not 0 < val_frac < 1 or not 0 < test_frac < 1:
        raise ValueError("val_frac and test_frac must be in (0, 1)")
    eff_val = val_frac * (1.0 - test_frac)
    tagged = add_split_column(ds, id_col, val_frac=eff_val,
                              test_frac=test_frac, seed=seed)
    return (tagged.filter(expr="split == 'train'"),
            tagged.filter(expr="split == 'val'"),
            tagged.filter(expr="split == 'test'"))


def split_train_val_test_arrays(
    X: np.ndarray, y: np.ndarray, val_size: float = 0.1,
    test_size: float = 0.2, random_state: Optional[int] = None,
) -> Tuple[np.ndarray, ...]:
    """Local-array 3-way split, bit-compatible with the reference
    (``ai/selection.py:71-140``): seed → full shuffle → test cut at
    ``(1−test)·n``, val cut at ``(1−val)`` of the remainder. Returns
    (X_train, X_val, X_test, y_train, y_val, y_test)."""
    X = np.asarray(X)
    y = np.asarray(y)
    if X.shape[0] != y.shape[0]:
        raise ValueError("X and y must have the same number of rows")
    if not 0 < val_size < 1 or not 0 < test_size < 1:
        raise ValueError("val_size and test_size must be in (0, 1)")
    if random_state is not None:
        np.random.seed(random_state)
    indices = np.arange(X.shape[0])
    np.random.shuffle(indices)
    test_split = int(X.shape[0] * (1 - test_size))
    val_split = int((1 - val_size) * test_split)
    return (X[indices[:val_split]], X[indices[val_split:test_split]],
            X[indices[test_split:]], y[indices[:val_split]],
            y[indices[val_split:test_split]], y[indices[test_split:]])


def sampling_random(ds, fraction: float, id_col: str, seed: int = 42):
    """Seeded uniform sample (≙ ``sampling_random``, selection.py:200-240)
    — hash-based, so the same rows are kept on re-runs."""

    def _fn(batch: pa.Table) -> pa.Table:
        u = _split_unit(batch[id_col].to_numpy(zero_copy_only=False), seed + 1)
        return batch.filter(pa.array(u < fraction))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def mixture_sample(ds, key_col: str, fractions: dict, id_col: str,
                   seed: int = 42, default: float = 0.0):
    """Deterministic mixture resampling: keep each row with its key's
    target rate — the data-mixing step of a training-corpus pipeline
    (down-weight over-represented sources to hit a target mixture).

    Per-row keep test is ``split_unit(id) < fractions[key]`` — the same
    hash-threshold contract as :func:`sampling_random`, so the kept set
    is independent of partitioning/order, identical on re-runs (resume
    safe), and composes with the hash splits: a row kept at rate f is a
    superset-stable choice (raising a source's rate only ADDS rows,
    never swaps them). Keys missing from ``fractions`` keep at
    ``default`` (0 = drop). Map-only — no shuffle at any scale.
    """

    def _fn(batch: pa.Table) -> pa.Table:
        u = _split_unit(batch[id_col].to_numpy(zero_copy_only=False),
                        seed + 1)
        keys = pd.Series(batch[key_col].to_numpy(zero_copy_only=False))
        rate = keys.map(fractions).fillna(default).to_numpy(dtype=np.float64)
        return batch.filter(pa.array(u < rate))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def sampling_stratified(ds, class_col: str, n_per_class: int, seed: int = 42):
    """Per-class fixed-size sample (≙ ``sampling_stratified``,
    selection.py:141-199): groupby(class) → seeded in-group choice."""

    def _take(g: pd.DataFrame) -> pd.DataFrame:
        # zlib.crc32 is process-stable (Python's str hash is salted per
        # process, which would break resumable determinism).
        import zlib

        class_hash = zlib.crc32(str(g[class_col].iloc[0]).encode())
        rng = np.random.default_rng((seed, class_hash))
        if len(g) <= n_per_class:
            return g
        # Positional choice over an ORDER-FREE row ordering: the group's
        # internal row order depends on upstream partitioning, so sort by
        # content first — identical runs then sample identical rows
        # regardless of block layout (the module's resumability contract).
        # Only scalar columns are sortable (embedding/tensor columns
        # raise in sort_values); non-scalar-only frames keep input order.
        sortable = [c for c in g.columns
                    if np.isscalar(g[c].iloc[0]) or g[c].iloc[0] is None
                    or isinstance(g[c].iloc[0], (bytes, pd.Timestamp))]
        if sortable:
            g = g.sort_values(sortable, kind="stable").reset_index(drop=True)
        idx = rng.choice(len(g), size=n_per_class, replace=False)
        return g.iloc[np.sort(idx)]

    return ds.groupby(class_col).map_groups(_take, batch_format="pandas")


def topk_per_group(ds, key_col: str, sort_cols: list, k: int,
                   ascending: bool = False):
    """Top-``k`` rows per key by ``sort_cols`` (SURVEY.md §2.9 per-key
    top-k). Two-level plan: a vectorized per-block PARTIAL top-k (at most
    k rows per key per block cross the shuffle — the combiner that keeps
    the exchange skinny at scale), then a hash-bucket groupby where ONE
    pandas sort+head per bucket finalizes every key in it (per-raw-key
    map_groups paid one Python call per key).

    Ties beyond ``sort_cols`` are broken by the remaining ORDERABLE
    columns so the result is deterministic regardless of block layout;
    nested columns (list/tensor embeddings, WKB payload structs) are
    excluded from the tie-break — pandas cannot sort them — so rows that
    differ only in a nested payload need a unique id in ``sort_cols``
    for full determinism."""
    from buteo_ray.state.skew import derive_num_partitions

    n_buckets = derive_num_partitions(ds)
    asc = [ascending] * len(sort_cols)

    def _orderable(g: pd.DataFrame, c) -> bool:
        s = g[c]
        if s.dtype != object:
            return True
        # Probe the first NON-NULL value: row 0 may be None while later
        # rows hold unsortable lists/arrays.
        nn = s.dropna()
        v = nn.iloc[0] if len(nn) else None
        return not isinstance(v, (list, np.ndarray, dict))

    def _partial(g: pd.DataFrame) -> pd.DataFrame:
        other = [c for c in g.columns
                 if c not in sort_cols and c != "__bucket" and _orderable(g, c)]
        out = (g.sort_values(sort_cols + other, ascending=asc + [ascending] * len(other),
                             kind="stable")
               .groupby(key_col, sort=False).head(k))
        return out

    def _block_partial(t: pa.Table) -> pa.Table:
        # Bucket from the ARROW column (dtype-stable hash): hashing the
        # pandas view would flip int keys to float64 on null-bearing
        # blocks and split a key across buckets. Same-key rows share a
        # bucket value, so attaching before _partial is safe (_partial
        # excludes __bucket from its tie-break columns).
        from buteo_ray.stages.aggregate import _hash_key_column

        b = _hash_key_column(t[key_col]) % np.uint64(n_buckets)
        g = t.to_pandas()
        g["__bucket"] = b.astype(np.int64)
        out = _partial(g)
        return pa.Table.from_pandas(out, preserve_index=False)

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return _partial(g).drop(columns="__bucket")

    return (ds.map_batches(_block_partial, batch_format="pyarrow", batch_size=None)
            .groupby("__bucket").map_groups(_final, batch_format="pandas"))


def sample_per_group(ds, key_col: str, n: int, id_col: str):
    """Deterministic per-key cap: keep at most ``n`` rows per ``key_col``
    value, chosen by a pseudo-random priority derived from ``id_col`` —
    the per-domain cap step of a web-corpus pipeline (bound how much any
    one domain contributes to the training set) as a distributed
    operator rather than a driver-side sample.

    The priority is the pair ``((id % p1) * m1 % p1, (id % p2) * m2 % p2)``
    with primes p1=1048573, p2=999983 and multipliers coprime to them:
    each component is a multiplicative permutation of the id's residue
    (multiply BEFORE reducing — a mod-then-multiply form would be
    monotone in id and silently degrade to head-n-by-id), and by CRT the
    pair is collision-free for ids below p1·p2 ≈ 1.05e12. Overflow-free
    in int64 for any non-negative id and reproducible in ANSI SQL (the
    driver oracle recomputes it in a window function), unlike a
    splitmix-style avalanche which SQL can't express. Remaining ties
    (ids ≥ p1·p2 sharing both residues) break by id, so the result is
    block-layout independent.

    Plan: one vectorized priority column + the two-level
    ``topk_per_group`` exchange (per-block partial head-n keeps at most
    n rows per key per block in the shuffle).
    """
    def _prio(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy()
        if len(ids) and ids.min() < 0:
            # numpy % is always non-negative, SQL % keeps the dividend's
            # sign — a negative id would silently diverge from the
            # documented (oracle-reproducible) priority. Fail loudly.
            raise ValueError(
                f"sample_per_group: id_col '{id_col}' must be non-negative")
        p1 = (ids % 1048573) * 2654435761 % 1048573
        p2 = (ids % 999983) * 97003 % 999983
        t = t.append_column("__prio1", pa.array(p1.astype(np.int64)))
        return t.append_column("__prio2", pa.array(p2.astype(np.int64)))

    def _drop(t: pa.Table) -> pa.Table:
        return t.drop_columns(["__prio1", "__prio2"])

    out = topk_per_group(
        ds.map_batches(_prio, batch_format="pyarrow", batch_size=None),
        key_col, ["__prio1", "__prio2", id_col], n, ascending=True)
    return out.map_batches(_drop, batch_format="pyarrow", batch_size=None)


def assign_shuffle_shards(ds, id_col: str, n_shards: int = 16,
                          seed: int = 0):
    """Deterministic global shuffle WITHOUT an all-to-all: each row gets
    a splitmix64 shuffle key from its id and a shard = key % n_shards —
    map-only, so at 100 TB the "shuffle" costs one streaming pass and a
    partitioned write (``write_parquet(partition_cols=["shard"])``),
    never Ray's ``random_shuffle`` exchange. Consumers get uniformly
    mixed shards; ordering within a shard is recoverable by sorting on
    the key at read time (each shard is 1/n_shards of the data — sort
    where it is cheap). Deterministic + order-free ⇒ a resumed run
    assigns every row the same shard.

    Adds ``shard`` (int64) and the key as two int64 halves
    (``skey_hi``/``skey_lo`` — the engine-wide convention for exposing
    uint64 to hash-comparing consumers, cf. simhash)."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive (got {n_shards})")

    def _fn(t: pa.Table) -> pa.Table:
        col = t[id_col]
        if col.null_count:
            # A null id would silently hash via NaN→INT64_MIN garbage;
            # shard assignment must be deterministic, so fail loud.
            raise ValueError(
                f"assign_shuffle_shards: id column '{id_col}' contains "
                "nulls; assign ids first")
        ids = col.to_numpy(zero_copy_only=False).astype(np.int64)
        h = _splitmix64(ids.view(np.uint64)
                        + np.uint64(seed) * np.uint64(0x9E3779B9))
        t = t.append_column("shard", pa.array(
            (h % np.uint64(n_shards)).astype(np.int64)))
        t = t.append_column("skey_hi", pa.array(
            (h >> np.uint64(32)).astype(np.int64)))
        return t.append_column("skey_lo", pa.array(
            (h & np.uint64(0xFFFFFFFF)).astype(np.int64)))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def quantile_threshold_filter(ds, group_col: str, value_col: str,
                              q: float = 0.75, thr_col: str = "thr",
                              max_pairs: int = 1 << 22):
    """Keep the rows STRICTLY ABOVE their group's discrete q-quantile
    of ``value_col`` (SQL: ``value > quantile_disc(value, q) OVER
    group``) — the keep-top-fraction-per-language quality gate of a
    training-data pipeline. Each kept row gains ``thr_col`` (its
    group's threshold, an actual data value).

    The discrete quantile is the value at 1-based rank ⌈q·n⌉ — matched
    to DuckDB's quantile_disc by EXACT integer arithmetic
    (``cum · 10⁴ ≥ round(q·10⁴) · n``, so q must carry ≤ 4 decimals):
    naive double ``ceil(q*n)`` misranks exact-integer boundaries
    (0.9 × 10 → 9.000000000000002). Null values are ignored for the
    quantile and never kept; null groups are dropped (SQL join rule).

    Scale: one bucketed (group, value) count pass — the distinct-pair
    table, NOT the corpus, reaches the driver (bounded by the value
    domain, e.g. ≤ group-count × max-doc-length for integer lengths;
    ``max_pairs`` fail-louds past the gate) — then one ray.put
    broadcast of the per-group thresholds and a streaming filter.
    """
    import ray
    import pyarrow.compute as pc

    from buteo_ray.stages.aggregate import bucketed_count

    q4 = int(round(q * 10000.0))
    if not 0 < q4 <= 10000 or abs(q4 / 10000.0 - q) > 1e-12:
        raise ValueError(f"q must be in (0, 1] with <= 4 decimals, got {q}")

    valid = ds.map_batches(
        lambda t: t.filter(pc.and_(pc.is_valid(t[group_col]),
                                   pc.is_valid(t[value_col]))),
        batch_format="pyarrow", batch_size=None)
    pairs = bucketed_count(valid.select_columns([group_col, value_col]),
                           [group_col, value_col], alias="__n")
    pdf = pairs.materialize()
    n_pairs = pdf.count()
    if n_pairs > max_pairs:
        raise ValueError(
            f"distinct ({group_col}, {value_col}) pairs {n_pairs} exceed "
            f"max_pairs={max_pairs}; quantile_threshold_filter needs a "
            "bounded value domain (bucketize the value first)")
    pdf = pdf.to_pandas().sort_values([group_col, value_col],
                                      kind="stable")
    grp = pdf.groupby(group_col, sort=False)
    cum = grp["__n"].cumsum().to_numpy()
    tot = grp["__n"].transform("sum").to_numpy()
    # exact-rational rank test: rank ⌈q·n⌉ ⇔ first cum with cum·10⁴ ≥ q4·n
    # (monotone within a group once it crosses, so 'first hit' = rank)
    thr = pdf[cum * 10000 >= q4 * tot].groupby(
        group_col, sort=False, as_index=False).first()
    thr_ref = ray.put((pa.array(thr[group_col]),
                       thr[value_col].to_numpy()))

    def _keep(t: pa.Table) -> pa.Table:
        groups_arr, thr_np = ray.get(thr_ref)
        thr_arr = pa.array(thr_np).cast(t[value_col].type)
        idx = pc.index_in(t[group_col], value_set=groups_arr)
        thr_v = pc.take(thr_arr, idx)  # null where group has no threshold
        keep = pc.and_(pc.is_valid(thr_v),
                       pc.fill_null(pc.greater(t[value_col], thr_v),
                                    False))
        out = t.filter(keep)
        return out.append_column(
            thr_col,
            pc.take(thr_arr, pc.index_in(out[group_col],
                                         value_set=groups_arr)))

    return ds.map_batches(_keep, batch_format="pyarrow", batch_size=None)


def ntile(ds, key_col: str, order_cols: list, k: int,
          alias: str = "tile", num_buckets: Optional[int] = None):
    """Per-key equi-depth bucketing — SQL ``NTILE(k) OVER (PARTITION BY
    key ORDER BY order_cols)`` — the per-group quartile/decile labeling
    step (quality tiers per language, activity tiers per user).

    Exact NTILE semantics (DuckDB / standard): with ``n`` rows and
    ``q = n // k``, ``rem = n % k``, the first ``rem`` tiles hold
    ``q + 1`` rows and the rest ``q``; when ``n < k`` each row gets its
    own tile ``1..n``. All-integer rank arithmetic — zero float risk.

    Keys are unbounded: one hash-bucketed fold, inside which a single
    stable sort + two vectorized groupby transforms label every key's
    rows at once (no per-key Python). ``order_cols`` must be a total
    order within each key for a deterministic result. Returns the
    input rows + ``alias:int64``.
    """
    from buteo_ray.stages.aggregate import bucketed_fold

    if k < 1:
        raise ValueError(f"k={k} must be >= 1")
    order_cols = list(order_cols)

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values([key_col, *order_cols], kind="stable")
             .reset_index(drop=True))
        grp = g.groupby(key_col, sort=False, dropna=False)
        r = grp.cumcount().to_numpy()
        n = grp[key_col].transform("size").to_numpy()
        q, rem = n // k, n % k
        cut = rem * (q + 1)
        big = r < cut
        tile = np.where(big, r // np.maximum(q + 1, 1),
                        rem + (r - cut) // np.maximum(q, 1)) + 1
        g[alias] = tile.astype(np.int64)
        return g

    return bucketed_fold(ds, [key_col], _fold, num_buckets)


def weighted_bernoulli_sample(ds, id_col: str, prob_col: str):
    """Keep each row independently with ITS OWN probability
    ``prob_col`` ∈ [0, 1] — quality-weighted corpus downsampling (keep
    high-quality documents at a higher rate), deterministic and
    bit-reproducible: u = (splitmix64(id) >> 11) · 2⁻⁵³ (the standard
    53-bit uniform; both the shift result and the power-of-two scale
    are exactly representable doubles, so NO libm enters) and the row
    survives iff u < p. The SQL twin replays the integer hash and the
    same two exact float ops, so the kept set matches bit-for-bit.

    Map-only: no shuffle, and the verdict depends only on the row
    itself — re-running a failed partition reproduces it exactly
    (resumable by construction). A null probability keeps nothing
    (u < NULL is no), matching SQL comparison semantics; null ids
    raise (a silent hash-of-garbage would sample arbitrarily).
    """

    def _fn(t: pa.Table) -> pa.Table:
        col = t[id_col]
        if col.null_count:
            raise ValueError(
                f"weighted_bernoulli_sample: {id_col} has "
                f"{col.null_count} null ids")
        ids = col.cast(pa.uint64()).to_numpy(zero_copy_only=False)
        u = (_splitmix64(ids) >> np.uint64(11)).astype(np.float64) * 2.0**-53
        p = t[prob_col].to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore"):  # null p → NaN → dropped
            return t.filter(pa.array(u < p))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def weighted_topk_per_group(ds, key_col: str, id_col: str,
                            weight_col: str, k: int,
                            num_buckets: Optional[int] = None):
    """Weighted sampling WITHOUT replacement, exactly min(k, group size)
    rows per group — the A-ES scheme (Efraimidis & Spirakis, IPL 2006):
    each row gets priority u^(1/w) with u its deterministic per-id
    splitmix uniform and w = ``weight_col`` (> 0 required, else the row
    is excluded as SQL would via a NULL key); the k LARGEST priorities
    per group are a correct weighted sample without replacement.

    Plan: the priority is row-local (map), so each block keeps its own
    top-k per key first (the combiner — a block's k+1-th row can never
    reach the global top k) and only ≤ k·(keys per block) rows enter
    the hash-bucketed fold. Ties break on id (deterministic at any
    partitioning). Returns the sampled input rows (priority dropped).
    """
    if k <= 0:
        raise ValueError(f"need k > 0 (got {k})")

    def _topk(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values([key_col, "__pri", id_col], kind="stable",
                              ascending=[True, False, True])
                .groupby(key_col, sort=False).head(k))

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = df[id_col].to_numpy(dtype=np.uint64)
        u = (_splitmix64(ids) >> np.uint64(11)).astype(np.float64) * 2.0**-53
        w = df[weight_col].to_numpy(dtype=np.float64)
        with np.errstate(divide="ignore", invalid="ignore"):
            pri = np.where(w > 0, u ** (1.0 / w), np.nan)
        df = df.assign(__pri=pri)
        return _topk(df[~np.isnan(pri)])

    local = ds.map_batches(_partial, batch_format="pandas",
                           batch_size=None)

    def _fold(g: pd.DataFrame) -> pd.DataFrame:
        return _topk(g).drop(columns="__pri")

    from buteo_ray.stages.aggregate import bucketed_fold

    return bucketed_fold(local, [key_col], _fold, num_buckets)


def winsorize_by_group(ds, group_col: str, value_col: str,
                       q_lo: float = 0.05, q_hi: float = 0.95,
                       lo_col: str = "q_lo", hi_col: str = "q_hi",
                       out_col: Optional[str] = None,
                       approx: bool = False):
    """Per-group winsorization: clip ``value_col`` into its group's
    discrete [q_lo, q_hi] quantile range (the outlier-taming transform
    before scaling/aggregating quality scores). Appends the clipped
    value (``out_col``, default ``value_col + '_w'``) plus both
    thresholds; null values pass through unclipped.

    Quantile convention = DuckDB ``quantile_disc``: the actual data
    value at 1-based rank ⌈q·n⌉, computed with the same exact-rational
    rank test as :func:`quantile_threshold_filter` (q ≤ 4 decimals).

    Plan: one ``groupby(group).map_groups`` computing the two ranks
    per group (per-group gather — exact quantiles of CONTINUOUS values
    need the group in one place), then ``ray.put`` of the tiny
    per-group threshold table and a streaming vectorized clip. Pinned
    bytes: 3 scalars per group. ``approx=True`` is the SCALE path for
    groups too large to gather: thresholds come from the two-pass
    histogram-CDF quantiles (sketch.py:approx_quantile_by_group —
    lower-bound of quantile_disc, error ≤ one bin width, no per-group
    gather anywhere); the clip stage is identical.
    """
    import ray
    import pyarrow.compute as pc

    q4_lo = int(round(q_lo * 10000.0))
    q4_hi = int(round(q_hi * 10000.0))
    for q, q4 in ((q_lo, q4_lo), (q_hi, q4_hi)):
        if not 0 < q4 <= 10000 or abs(q4 / 10000.0 - q) > 1e-12:
            raise ValueError(
                f"quantiles must be in (0, 1] with <= 4 decimals, got {q}")
    if q4_lo > q4_hi:
        raise ValueError("q_lo must be <= q_hi")
    out_col = out_col or value_col + "_w"

    def _thr(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[value_col].dropna().to_numpy())
        n = len(v)
        if n == 0:
            return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                                 lo_col: [np.nan], hi_col: [np.nan]})
        # 1-based rank ⌈q·n⌉ via exact integers: smallest r with
        # r·10⁴ ≥ q4·n
        r_lo = -(-q4_lo * n // 10000)
        r_hi = -(-q4_hi * n // 10000)
        return pd.DataFrame({group_col: [g[group_col].iloc[0]],
                             lo_col: [float(v[r_lo - 1])],
                             hi_col: [float(v[r_hi - 1])]})

    if approx:
        from buteo_ray.stages.sketch import approx_quantile_by_group

        # materialize the 2-column projection once: the histogram path
        # scans it twice by design, and without this every upstream
        # transform would re-execute per pass (pinned bytes: the
        # projection, spillable)
        proj = ds.select_columns([group_col, value_col]).materialize()
        qs = [q_lo] if q4_lo == q4_hi else [q_lo, q_hi]
        thr = approx_quantile_by_group(proj, [group_col], value_col,
                                       qs).to_pandas()
        # approx_quantile_by_group names columns by float(q); rename
        # one at a time (a dict literal with q_lo == q_hi would
        # silently collapse to a single key)
        thr = thr.rename(columns={f"q_{float(q_lo)}": lo_col})
        if q4_lo == q4_hi:
            thr[hi_col] = thr[lo_col]
        else:
            thr = thr.rename(columns={f"q_{float(q_hi)}": hi_col})
    else:
        thr = (ds.select_columns([group_col, value_col])
               .groupby(group_col).map_groups(_thr,
                                              batch_format="pandas")
               .to_pandas())
    ref = ray.put((pa.array(thr[group_col]),
                   thr[lo_col].to_numpy(), thr[hi_col].to_numpy()))

    def _clip(t: pa.Table) -> pa.Table:
        groups_arr, lo_np, hi_np = ray.get(ref)
        idx = pc.index_in(t[group_col], value_set=groups_arr)
        vt = t[value_col].type
        # mask= turns the all-null-group NaN sentinel into an Arrow
        # null BEFORE the cast — casting NaN to an int value type
        # would raise and kill the whole query
        if pa.types.is_integer(vt):
            # fractional thresholds (the approx tier's bin edges) must
            # round toward the clip interval before an int cast:
            # clip(v, lo, hi) over integers ≡ clip(v, ⌈lo⌉, ⌊hi⌋) —
            # a safe cast of 12.37 to int64 would raise instead.
            # An interval containing NO integer (incl. the degenerate
            # q_lo == q_hi point) pins both bounds to the half-up
            # midpoint so lo ≤ hi always holds.
            lo_i = np.ceil(lo_np)
            hi_i = np.floor(hi_np)
            mid = np.floor((lo_np + hi_np) / 2.0 + 0.5)
            deg = lo_i > hi_i
            lo_np = np.where(deg, mid, lo_i)
            hi_np = np.where(deg, mid, hi_i)
        lo_a = pa.array(lo_np, mask=np.isnan(lo_np)).cast(vt)
        hi_a = pa.array(hi_np, mask=np.isnan(hi_np)).cast(vt)
        lo_v = pc.take(lo_a, idx)
        hi_v = pc.take(hi_a, idx)
        v = t[value_col]
        clipped = pc.min_element_wise(pc.max_element_wise(v, lo_v), hi_v)
        # null value or unknown group → original value untouched
        clipped = pc.if_else(pc.and_(pc.is_valid(v), pc.is_valid(lo_v)),
                             clipped, v)
        t = t.append_column(out_col, clipped)
        t = t.append_column(lo_col, lo_v)
        return t.append_column(hi_col, hi_v)

    return ds.map_batches(_clip, batch_format="pyarrow", batch_size=None)


def pareto_front(ds, cols, distinct: bool = False):
    """Maximal (non-strictly-dominated) rows over ``cols``, all
    maximized: row p survives unless some row q has q ≥ p on every col
    and q > p on at least one — the skyline operator (Börzsönyi et
    al., ICDE'01; public literature). Duplicates of a front point all
    survive unless ``distinct``.

    Plan: a vectorized per-block LOCAL front (dominance is transitive,
    so any point dominated within a block is dominated globally —
    blocks only ever under-prune), then the surviving candidates
    gather into ONE final front pass. 2-D fronts use the sort +
    running-max O(n log n) path; higher dimensions the O(n²/chunk)
    broadcast check. The gather step pins the candidate front — fine
    for the typical tiny skyline, degenerate (≈ input-sized) for
    anti-correlated columns; there is no general sub-quadratic
    distributed skyline without that caveat.
    """
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("pareto_front needs >= 2 columns")

    def _front_mask(vals: np.ndarray) -> np.ndarray:
        n, d = vals.shape
        if n <= 1:
            return np.ones(n, bool)
        if d == 2:
            # x-desc scan with x-run bookkeeping: survivor ⇔ its y is
            # the run's max (ties within a run keep duplicates — no
            # strict component) AND strictly above every earlier run's
            # max (earlier run ⇒ strictly larger x, so y ≥ suffices to
            # dominate).
            order = np.lexsort((-vals[:, 1], -vals[:, 0]))
            x, y = vals[order, 0], vals[order, 1]
            first_of_run = np.concatenate([[True], x[1:] != x[:-1]])
            first_idx = np.flatnonzero(first_of_run)
            run_id = np.cumsum(first_of_run) - 1
            run_first_y = y[first_idx][run_id]  # run max (y desc in run)
            run_max_cum = np.maximum.accumulate(y[first_idx])
            prev_run_max = np.concatenate(
                [[-np.inf], run_max_cum[:-1]])[run_id]
            keep_sorted = (y == run_first_y) & (y > prev_run_max)
            keep = np.zeros(n, bool)
            keep[order] = keep_sorted
            return keep
        keep = np.ones(n, bool)
        for i in range(0, n, 128):  # chunked O(n²): (n,128,d) peak
            blk = vals[i:i + 128]
            ge = (vals[:, None, :] >= blk[None, :, :]).all(-1)
            gt = (vals[:, None, :] > blk[None, :, :]).any(-1)
            dominated = (ge & gt).any(0)
            keep[i:i + 128] &= ~dominated
        return keep

    def _local(t: pa.Table) -> pa.Table:
        vals = np.column_stack([
            t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            for c in cols])
        if np.isnan(vals).any():
            raise ValueError("pareto_front: null/NaN in skyline columns")
        return t.filter(pa.array(_front_mask(vals)))

    cand = ds.map_batches(_local, batch_format="pyarrow",
                          batch_size=None).repartition(1)
    out = cand.map_batches(_local, batch_format="pyarrow",
                           batch_size=None)
    if distinct:
        out = out.map_batches(
            lambda t: t.group_by(t.column_names).aggregate([]),
            batch_format="pyarrow", batch_size=None)
    return out
