"""Sketch + re-aggregation operators: exact heavy hitters (bucket
prefilter admits false positives, never false negatives), HyperLogLog
(error bound, split-invariance of the register max-merge), ROLLUP
re-aggregation, robust median/MAD group stats."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _exact_counts(col: pd.Series) -> pd.Series:
    return col.value_counts()


# --------------------------------------------------------------- clz64

def test_clz64_matches_bit_length():
    from buteo_ray.stages.sketch import _clz64

    rng = np.random.default_rng(7)
    x = rng.integers(0, 2**63, 1000, dtype=np.int64).astype(np.uint64)
    x = np.concatenate([x, np.array([0, 1, 2**63, 2**64 - 1],
                                    dtype=np.uint64)])
    got = _clz64(x)
    want = np.array([64 - int(v).bit_length() for v in x], dtype=np.int64)
    assert (got == want).all()


# -------------------------------------------------------- heavy hitters

def test_heavy_hitters_exact_vs_pandas(ray_session):
    import ray.data as rd

    from buteo_ray.stages.sketch import heavy_hitters

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    got = (heavy_hitters(ds, "user_id", threshold=20).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    vc = _exact_counts(pd.read_parquet(
        f"{SF}/events.parquet", columns=["user_id"])["user_id"])
    want = (vc[vc >= 20].rename("n").rename_axis("user_id").reset_index()
            .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got, want.astype({"n": "int64"}), check_dtype=False)


def test_heavy_hitters_tiny_bucket_count_still_exact(ray_session):
    """With B=2 every bucket is hot — the prefilter stops pruning but
    the result must stay exact (degenerates to a plain exact count)."""
    import ray.data as rd

    from buteo_ray.stages.sketch import heavy_hitters

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["event_type"])
    got = (heavy_hitters(ds, "event_type", threshold=1, num_buckets=2)
           .to_pandas().sort_values("event_type").reset_index(drop=True))
    vc = _exact_counts(pd.read_parquet(
        f"{SF}/events.parquet", columns=["event_type"])["event_type"])
    want = (vc.rename("n").rename_axis("event_type").reset_index()
            .sort_values("event_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_heavy_hitters_phi_mode(ray_session):
    """phi derives the threshold from the pass-1 totals: ceil(phi*n)."""
    import math

    import ray.data as rd

    from buteo_ray.stages.sketch import heavy_hitters

    df = pd.read_parquet(f"{SF}/events.parquet", columns=["event_type"])
    ds = rd.from_pandas(df)
    got = heavy_hitters(ds, "event_type", phi=0.15).to_pandas()
    thr = math.ceil(0.15 * len(df))
    vc = _exact_counts(df["event_type"])
    want = set(vc[vc >= thr].index)
    assert want, "fixture drifted: pick a phi that keeps survivors"
    assert set(got["event_type"]) == want
    # Above every key's frequency the result is empty.
    assert heavy_hitters(ds, "event_type", phi=0.9).count() == 0


def test_heavy_hitters_rejects_both_modes(ray_session):
    import ray.data as rd

    from buteo_ray.stages.sketch import heavy_hitters

    ds = rd.from_pandas(pd.DataFrame({"k": ["a"]}))
    with pytest.raises(ValueError):
        heavy_hitters(ds, "k", threshold=1, phi=0.1)
    with pytest.raises(ValueError):
        heavy_hitters(ds, "k")


# ---------------------------------------------------------- HyperLogLog

def test_hll_error_bound_high_cardinality(ray_session):
    """5k distinct int keys in one group: estimate within 5 % (rms
    error at p=12 is ~1.6 %; 5 % leaves 3 sigma)."""
    import ray.data as rd

    from buteo_ray.stages.sketch import hll_distinct

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 5000, 40_000, dtype=np.int64)
    n_true = len(np.unique(vals))
    df = pd.DataFrame({"g": np.repeat("x", len(vals)), "v": vals})
    est = hll_distinct(rd.from_pandas(df), ["g"], "v", p=12).to_pandas()
    assert len(est) == 1
    rel = abs(est["n_distinct_est"].iloc[0] - n_true) / n_true
    assert rel < 0.05, (est, n_true)


def test_hll_small_range_linear_counting(ray_session):
    """Tiny cardinalities ride the linear-counting correction and are
    near-exact."""
    import ray.data as rd

    from buteo_ray.stages.sketch import hll_distinct

    df = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "user_id"])
    est = (hll_distinct(rd.from_pandas(df), ["event_type"], "user_id",
                        p=12).to_pandas().set_index("event_type"))
    truth = df.groupby("event_type")["user_id"].nunique()
    rel = ((est["n_distinct_est"] - truth) / truth).abs()
    assert rel.max() < 0.02


def test_hll_split_invariance(ray_session):
    """Register max-merge is commutative/associative/idempotent — the
    estimate must be IDENTICAL across block layouts."""
    import ray.data as rd

    from buteo_ray.stages.sketch import hll_distinct

    df = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "user_id"])
    a = (hll_distinct(rd.from_pandas(df).repartition(1),
                      ["event_type"], "user_id").to_pandas()
         .sort_values("event_type").reset_index(drop=True))
    b = (hll_distinct(rd.from_pandas(df).repartition(8),
                      ["event_type"], "user_id").to_pandas()
         .sort_values("event_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_hll_rejects_silly_precision(ray_session):
    import ray.data as rd

    from buteo_ray.stages.sketch import hll_distinct

    ds = rd.from_pandas(pd.DataFrame({"g": ["a"], "v": [1]}))
    with pytest.raises(ValueError):
        hll_distinct(ds, ["g"], "v", p=2)


# --------------------------------------------------------------- rollup

def test_rollup_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from buteo_ray.stages.aggregate import rollup_aggregate

    df = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"])
    got = rollup_aggregate(
        rd.from_pandas(df), ["l_returnflag", "l_linestatus"],
        sums={"sum_qty": "l_quantity"}, count="cnt")
    con = duckdb.connect()
    con.register("lineitem", df)
    want = con.execute(
        "SELECT l_returnflag, l_linestatus, "
        "CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty, COUNT(*) AS cnt "
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
    ).df()
    key = ["l_returnflag", "l_linestatus"]
    got = got.sort_values(key, na_position="last").reset_index(drop=True)
    want = want.sort_values(key, na_position="last").reset_index(drop=True)
    # Rolled-out keys: pandas None == SQL NULL.
    pd.testing.assert_frame_equal(
        got.fillna({"l_linestatus": "␀", "l_returnflag": "␀"}),
        want.fillna({"l_linestatus": "␀", "l_returnflag": "␀"}),
        check_dtype=False)


def test_rollup_empty_input_emits_grand_total(ray_session):
    """SQL GROUP BY ROLLUP always emits the () grouping set: one
    grand-total row (NULL key, NULL sum, count 0) over empty input —
    verified against DuckDB."""
    import duckdb
    import ray.data as rd

    from buteo_ray.stages.aggregate import rollup_aggregate

    df = pd.DataFrame({"a": pd.Series([], dtype="object"),
                       "x": pd.Series([], dtype="float64")})
    out = rollup_aggregate(rd.from_pandas(df), ["a"], sums={"sx": "x"},
                          count="n")
    assert list(out.columns) == ["a", "sx", "n"]
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute("SELECT a, SUM(x) AS sx, COUNT(*) AS n FROM t "
                       "GROUP BY ROLLUP (a)").df()
    assert len(out) == len(want) == 1
    assert out["a"].iloc[0] is None and np.isnan(out["sx"].iloc[0])
    assert out["n"].iloc[0] == 0 == want["n"].iloc[0]


# ----------------------------------------------------- robust group stats

def test_robust_group_stats_vs_numpy(ray_session):
    import ray.data as rd

    from buteo_ray.stages.aggregate import robust_group_stats

    df = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    got = (robust_group_stats(rd.from_pandas(df), "event_type", "value",
                              z=3.0).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    rows = []
    for k, g in df.groupby("event_type"):
        x = g["value"].to_numpy(np.float64)
        med = float(np.median(x))
        ad = np.abs(x - med)
        mad = float(np.median(ad))
        rows.append((k, med, mad, int((ad > 3.0 * mad).sum())))
    want = pd.DataFrame(rows, columns=["event_type", "med", "mad",
                                       "n_out"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["n_out"] > 0).any()  # heavy tail actually exercised


# ------------------------------------------------------- json extraction

def test_json_extract_fast_matches_json_loads(ray_session):
    import json

    import ray.data as rd

    from buteo_ray.stages.semistruct import json_extract_scalar

    ds = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "props"])
    got = (json_extract_scalar(ds, "props", "k", "k", dtype="int64")
           .select_columns(["event_id", "k"]).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    df = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "props"])
    want = (df.assign(k=[json.loads(s)["k"] for s in df["props"]])
            [["event_id", "k"]].sort_values("event_id")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_json_extract_edge_payloads(ray_session):
    """Missing key, null row, malformed JSON, string-typed value and
    scientific notation — fast and strict paths agree: non-numbers
    null out of a numeric extraction, never crash."""
    import ray.data as rd

    from buteo_ray.stages.semistruct import json_extract_scalar

    rows = ['{"a": 1, "k": "x"}', '{"a": 2}', None, 'notjson',
            '{"k": -3.5e2}', '{"k": 7}']
    for strict in (False, True):
        ds = rd.from_pandas(pd.DataFrame({"p": rows}))
        out = json_extract_scalar(ds, "p", "k", "kf", dtype="float64",
                                  strict=strict).to_pandas()["kf"]
        assert out.tolist()[4:] == [-350.0, 7.0]
        assert out[:4].isna().all(), (strict, out.tolist())
        outs = json_extract_scalar(ds, "p", "k", "ks", dtype="string",
                                   strict=strict).to_pandas()["ks"]
        assert outs.iloc[0] == "x"


def test_json_extract_rejects_weird_key(ray_session):
    import ray.data as rd

    from buteo_ray.stages.semistruct import json_extract_scalar

    ds = rd.from_pandas(pd.DataFrame({"p": ['{"k": 1}']}))
    with pytest.raises(ValueError):
        json_extract_scalar(ds, "p", 'k"ey', "x")
    with pytest.raises(ValueError):
        json_extract_scalar(ds, "p", "k", "x", dtype="bool")


# ---------------------------------------------------- bloom decontamination

def test_bloom_filter_no_false_negatives_and_fp_bound():
    import math

    from buteo_ray.stages.text import bloom_from_hashes, bloom_probe_hashes

    rng = np.random.default_rng(11)
    members = rng.integers(0, 2**63, 50_000, dtype=np.int64).astype(np.uint64)
    m_bits, k = 1 << 20, 4
    bits = bloom_from_hashes(members, m_bits=m_bits, num_hashes=k)
    # Every member tests positive — no false negatives, ever.
    assert bloom_probe_hashes(bits, members, k).all()
    # Non-members: measured FP rate within 2x of (1 - e^(-kn/m))^k.
    probes = rng.integers(0, 2**63, 100_000, dtype=np.int64).astype(np.uint64)
    probes = probes[~np.isin(probes, members)]
    fp = bloom_probe_hashes(bits, probes, k).mean()
    bound = (1.0 - math.exp(-k * len(members) / m_bits)) ** k
    assert fp < 2.0 * bound, (fp, bound)


def test_bloom_decontaminate_superset_of_exact(ray_session):
    """One-sided error: everything the exact path drops, the bloom
    path drops too (no contamination leaks); extra bloom drops are
    bounded."""
    import ray.data as rd

    from buteo_ray.stages.text import bloom_decontaminate, decontaminate

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])

    def _split(eq):
        def _fn(t: pa.Table) -> pa.Table:
            m = t["doc_id"].to_numpy(zero_copy_only=False) % 53 == 0
            return t.filter(pa.array(m if eq else ~m))
        return _fn

    ev = docs.map_batches(_split(True), batch_format="pyarrow")
    cand = docs.map_batches(_split(False), batch_format="pyarrow")
    exact_kept = set(decontaminate(cand, ev, n=4)
                     .to_pandas()["doc_id"])
    bloom_kept = set(bloom_decontaminate(cand, ev, n=4)
                     .to_pandas()["doc_id"])
    n_cand = cand.count()
    exact_dropped = n_cand - len(exact_kept)
    # bloom keeps a SUBSET of exact's keeps (drops a superset).
    assert bloom_kept <= exact_kept
    # and the collateral (clean docs lost to bit collisions) is small.
    assert len(exact_kept) - len(bloom_kept) <= max(2, 0.01 * n_cand), (
        len(exact_kept), len(bloom_kept), exact_dropped)


def test_bloom_rejects_unaligned_bits():
    from buteo_ray.stages.text import bloom_from_hashes

    with pytest.raises(ValueError):
        bloom_from_hashes(np.array([1], dtype=np.uint64), m_bits=100)


# ----------------------------------------------- review-fix regressions (r05)

def test_hll_skips_nulls_like_count_distinct(ray_session):
    import ray.data as rd

    from buteo_ray.stages.sketch import hll_distinct

    df = pd.DataFrame({
        "g": ["a"] * 6 + ["b"] * 3,
        "v": pd.array([1, 2, 3, None, None, 1, None, None, None],
                      dtype="Int64"),
    })
    est = (hll_distinct(rd.from_pandas(df), ["g"], "v", p=12)
           .to_pandas().set_index("g")["n_distinct_est"])
    # COUNT(DISTINCT v): a → 3 (nulls skipped), b → 0 (group kept).
    assert abs(est["a"] - 3) < 0.5
    assert est["b"] == 0.0


def test_robust_stats_skip_nulls(ray_session):
    import ray.data as rd

    from buteo_ray.stages.aggregate import robust_group_stats

    df = pd.DataFrame({"k": ["a"] * 5 + ["b"],
                       "v": [1.0, 2.0, 3.0, None, 100.0, None]})
    out = (robust_group_stats(rd.from_pandas(df), "k", "v", z=3.0)
           .to_pandas().set_index("k"))
    # group a: median/MAD of [1,2,3,100] — the null must not poison it
    assert out.loc["a", "med"] == 2.5 and out.loc["a", "mad"] == 1.0
    assert out.loc["a", "n_out"] == 1  # 100 is the outlier
    # group b is ALL null: row survives with NaN stats, n_out 0
    assert np.isnan(out.loc["b", "med"]) and out.loc["b", "n_out"] == 0


def test_json_extract_int64_exact_or_null(ray_session):
    """Exact-or-null contract: large ints past 2^53 stay exact, out-of-
    range / fractional values null (never INT64_MIN garbage)."""
    import ray

    import ray.data as rd

    from buteo_ray.stages.semistruct import json_extract_scalar

    rows = ['{"k": 9007199254740993}', '{"k": 1e30}', '{"k": 3.7}',
            '{"k": 87.0}', '{"k": -9223372036854775808}']
    ds = rd.from_pandas(pd.DataFrame({"p": rows}))
    for strict in (False, True):
        out = json_extract_scalar(ds, "p", "k", "v", dtype="int64",
                                  strict=strict)
        t = pa.concat_tables(ray.get(out.to_arrow_refs()))
        got = t["v"].to_pylist()
        assert got == [9007199254740993, None, None, 87,
                       -9223372036854775808], (strict, got)


def test_heavy_tokens_null_text(ray_session):
    """NULL text emits no tokens (SQL unnest(string_split(NULL, ' '))
    rule) and does not inflate the phi denominator."""
    import ray.data as rd

    from buteo_ray.stages.sketch import heavy_hitters

    ds = rd.from_pandas(pd.DataFrame(
        {"token": pd.array(["a", "a", "b", None], dtype="object")}))
    # the operator itself counts a null KEY group if present (SQL
    # GROUP BY does too) — the q_heavy_tokens tokenizer is what must
    # never PRODUCE null tokens; emulate it here:
    import pyarrow.compute as pc

    def _tok(t: pa.Table) -> pa.Table:
        txt = t["token"].combine_chunks()
        return pa.table({"token": txt.filter(pc.is_valid(txt))})

    tok = ds.map_batches(_tok, batch_format="pyarrow")
    got = heavy_hitters(tok, "token", threshold=1).to_pandas()
    assert set(got["token"]) == {"a", "b"}
    assert got.set_index("token")["n"].to_dict() == {"a": 2, "b": 1}


# ------------------------------------------------- approximate quantiles

def test_approx_quantile_within_one_bin_of_quantile_disc(ray_session):
    import ray.data as rd

    from buteo_ray.stages.sketch import approx_quantile_by_group

    df = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    B = 4096
    out = (approx_quantile_by_group(
        rd.from_pandas(df), ["event_type"], "value", [0.5, 0.9, 0.99],
        num_bins=B).to_pandas().set_index("event_type"))
    for k, g in df.groupby("event_type"):
        sv = np.sort(g["value"].to_numpy())
        n = len(sv)
        width = (sv[-1] - sv[0]) / B
        for q in (0.5, 0.9, 0.99):
            exact = sv[max(int(np.ceil(q * n)), 1) - 1]  # quantile_disc
            got = out.loc[k, f"q_{q}"]
            assert got <= exact + 1e-12, (k, q, got, exact)
            assert exact - got <= width + 1e-12, (k, q, got, exact)


def test_approx_quantile_split_invariance(ray_session):
    """Histogram partial-sum is layout-free: identical output across
    block layouts."""
    import ray.data as rd

    from buteo_ray.stages.sketch import approx_quantile_by_group

    df = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"])
    a = (approx_quantile_by_group(rd.from_pandas(df).repartition(1),
                                  ["event_type"], "value", [0.5])
         .to_pandas().sort_values("event_type").reset_index(drop=True))
    b = (approx_quantile_by_group(rd.from_pandas(df).repartition(8),
                                  ["event_type"], "value", [0.5])
         .to_pandas().sort_values("event_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)


def test_approx_quantile_edge_groups(ray_session):
    """Constant-valued group → exact value; all-null group → NaN row;
    nulls skipped inside mixed groups; bad q rejected."""
    import ray.data as rd

    from buteo_ray.stages.sketch import approx_quantile_by_group

    df = pd.DataFrame({"k": ["a"] * 4 + ["b"] * 2 + ["c"],
                       "v": [1.0, 2.0, 3.0, None, 5.0, 5.0, None]})
    out = (approx_quantile_by_group(rd.from_pandas(df), ["k"], "v",
                                    [0.5]).to_pandas()
           .set_index("k")["q_0.5"])
    assert out["b"] == 5.0             # constant group: exact
    assert np.isnan(out["c"])          # all-null group kept, NaN
    assert abs(out["a"] - 2.0) < (3.0 - 1.0) / 4096 + 1e-12
    with pytest.raises(ValueError):
        approx_quantile_by_group(rd.from_pandas(df), ["k"], "v", [1.5])


# ------------------------------------------------------- count-min sketch

def test_cms_never_undercounts_and_bound(ray_session):
    import ray.data as rd

    from buteo_ray.stages.sketch import cms_estimate, count_min_sketch

    df = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    W, D = 1 << 14, 4
    grid, n = count_min_sketch(rd.from_pandas(df), "user_id",
                               width=W, depth=D)
    assert n == len(df)
    vc = df["user_id"].value_counts()
    probes = vc.index.to_numpy()
    est = cms_estimate(grid, probes)
    true = vc.to_numpy()
    assert (est >= true).all()                 # one-sided: never under
    assert (est - true).max() <= 2 * n / W + 1  # CM guarantee w.h.p.
    # absent keys estimate near zero
    ghost = cms_estimate(grid, np.array([10**12 + 7], dtype=np.int64))
    assert ghost[0] <= 2 * n / W + 1


def test_cms_split_invariance(ray_session):
    """Counter grids are sum-mergeable: identical across block layouts."""
    import ray.data as rd

    from buteo_ray.stages.sketch import count_min_sketch

    df = pd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    g1, n1 = count_min_sketch(rd.from_pandas(df).repartition(1),
                              "user_id", width=1 << 12, depth=3)
    g8, n8 = count_min_sketch(rd.from_pandas(df).repartition(8),
                              "user_id", width=1 << 12, depth=3)
    assert n1 == n8 and (g1 == g8).all()


# ----------------------------------------------------------------- cube

def test_cube_matches_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from buteo_ray.stages.aggregate import cube_aggregate

    df = pd.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity"])
    got = cube_aggregate(rd.from_pandas(df),
                         ["l_returnflag", "l_linestatus"],
                         sums={"sum_qty": "l_quantity"}, count="cnt")
    con = duckdb.connect()
    con.register("lineitem", df)
    want = con.execute(
        "SELECT l_returnflag, l_linestatus, "
        "CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty, COUNT(*) AS cnt "
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"
    ).df()
    key = ["l_returnflag", "l_linestatus", "sum_qty"]
    g = (got.sort_values(key, na_position="last").reset_index(drop=True)
         .fillna({"l_returnflag": "␀", "l_linestatus": "␀"}))
    w = (want.sort_values(key, na_position="last").reset_index(drop=True)
         .fillna({"l_returnflag": "␀", "l_linestatus": "␀"}))
    pd.testing.assert_frame_equal(g, w, check_dtype=False)


def test_cube_empty_input_emits_grand_total(ray_session):
    import ray.data as rd

    from buteo_ray.stages.aggregate import cube_aggregate

    df = pd.DataFrame({"a": pd.Series([], dtype="object"),
                       "x": pd.Series([], dtype="float64")})
    out = cube_aggregate(rd.from_pandas(df), ["a"], sums={"sx": "x"},
                         count="n")
    assert len(out) == 1
    assert out["a"].iloc[0] is None and out["n"].iloc[0] == 0
