"""Driver-contract query registry: one entry per implemented operator /
pipeline (SURVEY.md §2), each with a Ray Data implementation and — where
SQL-expressible — a DuckDB oracle producing identical rows (identical
column NAMES and, for floats, identical doubles or identically-rounded
aggregates).

Conventions that make the value-hash comparison deterministic:
- all derived coordinates/cells/tiles come from integer-exact hash
  arithmetic + exact float ops (see ``stages/geocode.py``) → bit-equal
  in numpy and DuckDB;
- aggregate floats are rounded to 4 decimals on BOTH sides (summation
  order differs between engines);
- every computed column is explicitly named, identically, on both sides.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import numpy as np
import pandas as pd
import pyarrow as pa

from buteo_ray.sources.aoi import aoi_rect_sql_cte, synth_aoi_rects
from buteo_ray.stages.cell_assign import assign_cell_xy, cell_xy_sql_exprs
from buteo_ray.stages.geocode import geocode, geocode_sql_exprs
from buteo_ray.stages.join import broadcast_bbox_join
from buteo_ray.stages.tiling import GridSpec, assign_tiles, tile_sql_exprs

_LAT_SQL, _LON_SQL = geocode_sql_exprs("doc_id")
_NUM_RECTS = 2000
_TILE_ZOOM = 6
_TILE_GRID = GridSpec.global_grid(_TILE_ZOOM)


def _docs(sf_dir: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


# ---------------------------------------------------------------- geocode

def q_geocode_cells(sf_dir: str):
    """Hash-geocode + cell assignment (≙ reference cell/grid keying;
    SURVEY.md §2.2 coordinate encodings + §1.3 cell columns)."""
    ds = _docs(sf_dir, columns=["doc_id"])
    ds = geocode(ds)
    ds = assign_cell_xy(ds, res=7)
    return ds


def sql_geocode_cells() -> str:
    x_sql, y_sql = cell_xy_sql_exprs(7, _LAT_SQL, _LON_SQL)
    return (
        f"SELECT doc_id, {_LAT_SQL} AS lat, {_LON_SQL} AS lon, "
        f"{x_sql} AS cell_x, {y_sql} AS cell_y FROM documents"
    )


# ---------------------------------------------------------------- joins

def q_pip_join_bbox(sf_dir: str):
    """Broadcast point-in-bbox inner join (≙ vector_intersect semantics
    with rectangular AOIs; reference vector/intersect.py:27-189)."""
    ds = _docs(sf_dir, columns=["doc_id"])
    ds = geocode(ds)
    ds = broadcast_bbox_join(ds, synth_aoi_rects(_NUM_RECTS), how="inner")
    return ds.select_columns(["doc_id", "aoi_id"])


def sql_pip_join_bbox() -> str:
    return (
        f"WITH aoi AS ({aoi_rect_sql_cte(_NUM_RECTS)}), "
        f"pts AS (SELECT doc_id, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM documents) "
        "SELECT p.doc_id, a.aoi_id FROM pts p JOIN aoi a ON "
        "p.lon >= a.bbox_xmin AND p.lon <= a.bbox_xmax AND "
        "p.lat >= a.bbox_ymin AND p.lat <= a.bbox_ymax"
    )


def q_pip_semi_join(sf_dir: str):
    """Spatial semi-join: documents with ≥1 AOI match (≙
    vector_extract_by_location, invert=False; reference
    vector/extract_by_location.py:28-169)."""
    ds = _docs(sf_dir, columns=["doc_id"])
    ds = geocode(ds)
    ds = broadcast_bbox_join(ds, synth_aoi_rects(_NUM_RECTS), how="semi")
    return ds.select_columns(["doc_id"])


def sql_pip_semi_join() -> str:
    return (
        f"WITH aoi AS ({aoi_rect_sql_cte(_NUM_RECTS)}), "
        f"pts AS (SELECT doc_id, {_LAT_SQL} AS lat, {_LON_SQL} AS lon FROM documents) "
        "SELECT p.doc_id FROM pts p WHERE EXISTS (SELECT 1 FROM aoi a WHERE "
        "p.lon >= a.bbox_xmin AND p.lon <= a.bbox_xmax AND "
        "p.lat >= a.bbox_ymin AND p.lat <= a.bbox_ymax)"
    )


def q_pip_anti_join(sf_dir: str):
    """Spatial anti-join (≙ vector_extract_by_location, invert=True)."""
    ds = _docs(sf_dir, columns=["doc_id"])
    ds = geocode(ds)
    ds = broadcast_bbox_join(ds, synth_aoi_rects(_NUM_RECTS), how="anti")
    return ds.select_columns(["doc_id"])


def sql_pip_anti_join() -> str:
    return sql_pip_semi_join().replace("WHERE EXISTS", "WHERE NOT EXISTS")


# ---------------------------------------------------------------- tiling

def q_tile_assign(sf_dir: str):
    """256×256 tile assignment on the global grid (≙ reference
    pixel-offset tiling, core_raster_offsets.py:143-304 applied to a
    global plate-carrée grid)."""
    ds = _docs(sf_dir, columns=["doc_id"])
    ds = geocode(ds)
    ds = assign_tiles(ds, _TILE_GRID)
    return ds.select_columns(["doc_id", "px", "py", "tile_x", "tile_y", "tile_off_x", "tile_off_y"])


def sql_tile_assign() -> str:
    e = tile_sql_exprs(_TILE_GRID, _LAT_SQL, _LON_SQL)
    return (
        f"SELECT doc_id, {e['px']} AS px, {e['py']} AS py, "
        f"{e['tile_x']} AS tile_x, {e['tile_y']} AS tile_y, "
        f"{e['tile_off_x']} AS tile_off_x, {e['tile_off_y']} AS tile_off_y "
        "FROM documents"
    )


# ---------------------------------------------------------------- relational core

def q_filter_project(sf_dir: str):
    """Vectorized attribute filter + projection (≙ vector_extract_by_
    attribute / vector_filter_by_function; reference
    vector/extract_by_attribute.py:23-238)."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_quantity",
                        "l_extendedprice", "l_discount", "l_shipdate", "l_returnflag"])

    def _f(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1995-01-01"), type=pa.timestamp("us"))),
            pc.greater(t["l_discount"], pa.scalar(0.05)),
        )
        mask = pc.and_(mask, pc.equal(t["l_returnflag"], pa.scalar("R")))
        return t.filter(mask).select(["l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"])

    return ds.map_batches(_f, batch_format="pyarrow")


def sql_filter_project() -> str:
    return (
        "SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_discount > 0.05 "
        "AND l_returnflag = 'R'"
    )


def q_agg_groupby(sf_dir: str):
    """Partial+final grouped aggregation (≙ zonal-statistics plan,
    reference raster/zonal_statistics.py:29-157, over attribute keys):
    TPC-H-Q1-shaped aggregate with in-batch revenue derivation."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Mean, Sum

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_linestatus", "l_quantity",
                        "l_extendedprice", "l_discount", "l_shipdate"])

    def _derive(t: pa.Table) -> pa.Table:
        mask = pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02"), type=pa.timestamp("us")))
        t = t.filter(mask)
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("revenue", rev)

    ds = ds.map_batches(_derive, batch_format="pyarrow")
    out = ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_base_price"),
        Sum("revenue", alias_name="sum_disc_price"),
        Mean("l_quantity", alias_name="avg_qty"),
        Count(alias_name="n_rows"),
    ).to_pandas()
    for c in ["sum_qty", "sum_base_price", "sum_disc_price", "avg_qty"]:
        out[c] = out[c].round(4)
    out["n_rows"] = out["n_rows"].astype("int64")
    return out


def sql_agg_groupby() -> str:
    return (
        "SELECT l_returnflag, l_linestatus, "
        "ROUND(SUM(l_quantity), 4) AS sum_qty, "
        "ROUND(SUM(l_extendedprice), 4) AS sum_base_price, "
        "ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 4) AS sum_disc_price, "
        "ROUND(AVG(l_quantity), 4) AS avg_qty, "
        "COUNT(*) AS n_rows "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus"
    )


def q_join_broadcast(sf_dir: str):
    """Broadcast hash join (small dimension side shipped via ray.put,
    probed per batch — the non-spatial sibling of the PiP join)."""
    import ray

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]).to_pandas()
    lookup_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

    ds = _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def _probe(t: pa.Table) -> pa.Table:
        lookup = ray.get(lookup_ref)
        seg = pd.Series(t["o_custkey"].to_numpy()).map(lookup)
        return pa.table({"c_mktsegment": pa.array(seg, type=pa.string()),
                         "o_totalprice": t["o_totalprice"]})

    from ray.data.aggregate import Count, Sum

    out = (
        ds.map_batches(_probe, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Count(alias_name="n_orders"), Sum("o_totalprice", alias_name="total_price"))
        .to_pandas()
    )
    out["total_price"] = out["total_price"].round(4)
    out["n_orders"] = out["n_orders"].astype("int64")
    return out


def sql_join_broadcast() -> str:
    return (
        "SELECT c.c_mktsegment, COUNT(*) AS n_orders, "
        "ROUND(SUM(o.o_totalprice), 4) AS total_price "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey "
        "GROUP BY c.c_mktsegment"
    )


def q_sort_topk(sf_dir: str):
    """Global top-k via sort+limit (≙ SURVEY.md §2.9 top-k mapping)."""
    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, True]).limit(25)


def sql_sort_topk() -> str:
    return (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 25"
    )


def q_distinct(sf_dir: str):
    """Distinct values (≙ _unique_values, array/patches/util.py:217-238)."""
    ds = _read(sf_dir, "events", columns=["event_type"])
    vals = sorted(ds.unique("event_type"))
    return pa.table({"event_type": pa.array(vals, type=pa.string())})


def sql_distinct() -> str:
    return "SELECT DISTINCT event_type FROM events"


def q_union_all(sf_dir: str):
    """Dataset union (≙ vector_merge_layers, core_vector_merge.py:24-122)."""
    a = _read(sf_dir, "region", columns=["r_regionkey", "r_name"])
    b = _read(sf_dir, "nation", columns=["n_nationkey", "n_name"])

    def _tag_r(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["r_regionkey"].cast(pa.int64()), "name": t["r_name"],
                         "layer": pa.array(["region"] * t.num_rows)})

    def _tag_n(t: pa.Table) -> pa.Table:
        return pa.table({"key": t["n_nationkey"].cast(pa.int64()), "name": t["n_name"],
                         "layer": pa.array(["nation"] * t.num_rows)})

    return a.map_batches(_tag_r, batch_format="pyarrow").union(
        b.map_batches(_tag_n, batch_format="pyarrow")
    )


def sql_union_all() -> str:
    return (
        "SELECT CAST(r_regionkey AS BIGINT) AS key, r_name AS name, 'region' AS layer FROM region "
        "UNION ALL "
        "SELECT CAST(n_nationkey AS BIGINT) AS key, n_name AS name, 'nation' AS layer FROM nation"
    )


# ---------------------------------------------------------------- registry

QUERIES: Dict[str, Callable[[str], Any]] = {
    "geocode_cells": q_geocode_cells,
    "pip_join_bbox": q_pip_join_bbox,
    "pip_semi_join": q_pip_semi_join,
    "pip_anti_join": q_pip_anti_join,
    "tile_assign": q_tile_assign,
    "filter_project": q_filter_project,
    "agg_groupby": q_agg_groupby,
    "join_broadcast": q_join_broadcast,
    "sort_topk": q_sort_topk,
    "distinct": q_distinct,
    "union_all": q_union_all,
}

ORACLE_SQL: Dict[str, str] = {
    "geocode_cells": sql_geocode_cells(),
    "pip_join_bbox": sql_pip_join_bbox(),
    "pip_semi_join": sql_pip_semi_join(),
    "pip_anti_join": sql_pip_anti_join(),
    "tile_assign": sql_tile_assign(),
    "filter_project": sql_filter_project(),
    "agg_groupby": sql_agg_groupby(),
    "join_broadcast": sql_join_broadcast(),
    "sort_topk": sql_sort_topk(),
    "distinct": sql_distinct(),
    "union_all": sql_union_all(),
}
