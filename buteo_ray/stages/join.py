"""Broadcast spatial joins: the Ray-native re-expression of the
reference's ``vector_intersect`` (inner spatial join via SpatiaLite
ST_INTERSECTS after R-tree indexing, ``/root/reference/buteo/vector/
intersect.py:27-189``) and ``vector_extract_by_location`` (semi/anti
join with predicate dispatch, ``vector/extract_by_location.py:28-169``).

Shape (SURVEY.md §3.3): the small build side (AOI polygons) is indexed
ONCE driver-side into a :class:`~buteo_ray.geom.index.GridIndex`,
``ray.put`` into the object store, and probed inside ``map_batches`` —
bbox prefilter via the grid, exact refinement via even-odd ray casting.
No shuffle; the probe side streams. At 100 TB the build side (10k
polygons, ~1 MB pickled) is fetched once per worker process, not per
batch: the actor-pool class caches it in ``__init__``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

from buteo_ray.geom.index import GridIndex
from buteo_ray.geom.polyset import PolygonSet
from buteo_ray.geom.wkb import parse_wkb


def build_aoi_index(aoi_table: pa.Table) -> GridIndex:
    """GridIndex over an AOI table (bbox columns + optional geom_wkb
    payload compiled to a :class:`PolygonSet` for vectorized exact
    refinement)."""
    payload = None
    if "geom_wkb" in aoi_table.column_names:
        ring_lists = []
        for wkb in aoi_table["geom_wkb"].to_pylist():
            kind, rings = parse_wkb(wkb)
            if kind == "polygon":
                ring_lists.append(rings)
            elif kind == "multipolygon":
                # flatten: even-odd parity over all member rings
                ring_lists.append([r for poly in rings for r in poly])
            else:
                raise ValueError(f"AOI geometry must be polygonal, got {kind}")
        payload = PolygonSet(ring_lists)
    return GridIndex(
        aoi_table["bbox_xmin"].to_numpy(),
        aoi_table["bbox_xmax"].to_numpy(),
        aoi_table["bbox_ymin"].to_numpy(),
        aoi_table["bbox_ymax"].to_numpy(),
        payload=payload,
    )


class BroadcastIndexProbe:
    """Actor-pool stage: fetches the broadcast index once per actor
    (``__init__``), probes per batch (``__call__``).

    how='inner'  → join rows (probe cols + ``aoi_id``), one per match;
    how='semi'   → probe rows with ≥1 match (reference ``invert=False``);
    how='anti'   → probe rows with no match (reference ``invert=True``).
    exact=False skips PiP refinement (pure bbox join, SQL-checkable).
    """

    def __init__(
        self,
        index_ref,
        how: str = "inner",
        exact: bool = True,
        lat_col: str = "lat",
        lon_col: str = "lon",
        aoi_id_col: str = "aoi_id",
        aoi_ids: Optional[np.ndarray] = None,
    ):
        import ray

        self.index: GridIndex = ray.get(index_ref) if not isinstance(index_ref, GridIndex) else index_ref
        if how not in ("inner", "semi", "anti"):
            raise ValueError(f"how must be inner|semi|anti, got {how}")
        self.how = how
        if exact and self.index.payload is None:
            # A silent downgrade to bbox-only would return false matches
            # (and drop rows in anti joins) without any signal.
            raise ValueError(
                "exact=True requires polygon geometry (geom_wkb) in the AOI "
                "table; pass exact=False for a bbox-only join"
            )
        self.exact = exact and self.index.payload is not None
        self.lat_col = lat_col
        self.lon_col = lon_col
        self.aoi_id_col = aoi_id_col
        self.aoi_ids = aoi_ids  # external ids; defaults to positional

    def _match(self, lon: np.ndarray, lat: np.ndarray):
        pi, gi = self.index.query_points(lon, lat)
        if self.exact and pi.size:
            keep = self.index.payload.contains_pairs(lon[pi], lat[pi], gi)
            pi, gi = pi[keep], gi[keep]
        return pi, gi

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch[self.lon_col].to_numpy(zero_copy_only=False)
        lat = batch[self.lat_col].to_numpy(zero_copy_only=False)
        pi, gi = self._match(lon, lat)
        if self.how == "inner":
            out = batch.take(pa.array(pi))
            ids = self.aoi_ids[gi] if self.aoi_ids is not None else gi
            return out.append_column(self.aoi_id_col, pa.array(ids.astype(np.int64)))
        matched = np.zeros(batch.num_rows, dtype=bool)
        matched[pi] = True
        if self.how == "anti":
            matched = ~matched
        return batch.filter(pa.array(matched))


def broadcast_pip_join(
    ds,
    aoi_table: pa.Table,
    how: str = "inner",
    exact: bool = True,
    lat_col: str = "lat",
    lon_col: str = "lon",
    concurrency: Optional[int] = None,
    batch_size: Optional[int] = None,
):
    """Point-in-polygon join of a streaming point Dataset against a small
    AOI polygon table (broadcast). Returns the joined/filtered Dataset."""
    index = build_aoi_index(aoi_table)
    aoi_ids = aoi_table["aoi_id"].to_numpy() if "aoi_id" in aoi_table.column_names else None

    # batch_size=None keeps whole blocks (zero-copy Arrow, no re-slicing);
    # callers lower it only for memory-heavy probes.
    kwargs = dict(batch_format="pyarrow", batch_size=batch_size)
    if concurrency is not None:
        import ray

        # Actor pool: the index travels as an object-store ref, fetched
        # once per actor in __init__.
        kwargs["concurrency"] = concurrency
        return ds.map_batches(
            BroadcastIndexProbe,
            fn_constructor_kwargs=dict(
                index_ref=ray.put(index), how=how, exact=exact,
                lat_col=lat_col, lon_col=lon_col, aoi_ids=aoi_ids,
            ),
            **kwargs,
        )
    # Task path: the index rides inside the serialized callable, which
    # Ray puts to the object store ONCE and caches per worker process —
    # no separate ray.put (that would store a second, never-read copy).
    probe = BroadcastIndexProbe(index, how=how, exact=exact,
                                lat_col=lat_col, lon_col=lon_col, aoi_ids=aoi_ids)
    return ds.map_batches(probe, **kwargs)


def broadcast_bbox_join(ds, rect_table: pa.Table, how: str = "inner",
                        lat_col: str = "lat", lon_col: str = "lon", **kw):
    """Pure bbox-containment join (no geometry payload): the SQL-checkable
    degenerate case of the PiP join (rectangular AOIs)."""
    return broadcast_pip_join(ds, rect_table, how=how, exact=False,
                              lat_col=lat_col, lon_col=lon_col, **kw)
