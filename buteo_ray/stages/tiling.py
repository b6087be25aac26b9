"""Tile assignment: points → fixed 256×256 pixel-grid tiles.

Maps the reference's pixel-offset tiling (``core_raster_offsets.py``,
``bbox/operations.py:19-98``) onto a global plate-carrée pixel grid: a
:class:`GridSpec` (geotransform + size) defines pixel coordinates; tiles
are ``tile_size × tile_size`` pixel blocks keyed ``(tile_x, tile_y)``.
Tile keys are the shuffle/partition key for rasterization, stitching and
zonal stages (SURVEY.md §7.4).

Pixel math is floor arithmetic on float64 — identical in numpy and SQL
(:func:`tile_sql_exprs`), so tile assignment is oracle-checkable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Tuple

import numpy as np
import pyarrow as pa

from buteo_ray.grid.cells import GLOBAL_BBOX


@dataclass(frozen=True)
class GridSpec:
    """A raster grid: geotransform + pixel dimensions + tile size.

    The Ray-side replacement for the reference's per-call metadata dict
    (``core_raster/core_raster_info.py:143-259``) — computed once,
    closure-captured, never recomputed per row.
    """

    origin_x: float
    origin_y: float
    pixel_width: float
    pixel_height: float  # negative for north-up
    width: int
    height: int
    tile_size: int = 256
    crs: str = "EPSG:4326"

    @classmethod
    def global_grid(cls, zoom: int, tile_size: int = 256) -> "GridSpec":
        """Plate-carrée global grid: 2^zoom × 2^(zoom-1) tiles of
        ``tile_size`` px (2:1 aspect like the world)."""
        width = (1 << zoom) * tile_size
        height = (1 << max(zoom - 1, 0)) * tile_size
        x_min, x_max, y_min, y_max = GLOBAL_BBOX
        return cls(
            origin_x=x_min,
            origin_y=y_max,
            pixel_width=(x_max - x_min) / width,
            pixel_height=-(y_max - y_min) / height,
            width=width,
            height=height,
            tile_size=tile_size,
        )

    @property
    def geotransform(self) -> List[float]:
        return [self.origin_x, self.pixel_width, 0.0, self.origin_y, 0.0, self.pixel_height]

    def pixel_of(self, lon: np.ndarray, lat: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Vectorized point → integer pixel coordinate (floor), clamped."""
        px = np.floor((np.asarray(lon, np.float64) - self.origin_x) / self.pixel_width).astype(np.int64)
        py = np.floor((np.asarray(lat, np.float64) - self.origin_y) / self.pixel_height).astype(np.int64)
        px = np.clip(px, 0, self.width - 1)
        py = np.clip(py, 0, self.height - 1)
        return px, py


def assign_tiles(ds, grid: GridSpec, lat_col: str = "lat", lon_col: str = "lon"):
    """Append ``px, py, tile_x, tile_y, tile_off_x, tile_off_y`` columns:
    global pixel coords, owning tile, and the within-tile pixel offset."""
    ts = grid.tile_size

    def _fn(batch: pa.Table) -> pa.Table:
        lon = batch[lon_col].to_numpy(zero_copy_only=False)
        lat = batch[lat_col].to_numpy(zero_copy_only=False)
        px, py = grid.pixel_of(lon, lat)
        return (
            batch.append_column("px", pa.array(px))
            .append_column("py", pa.array(py))
            .append_column("tile_x", pa.array(px // ts))
            .append_column("tile_y", pa.array(py // ts))
            .append_column("tile_off_x", pa.array(px % ts))
            .append_column("tile_off_y", pa.array(py % ts))
        )

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def tile_sql_exprs(grid: GridSpec, lat_sql: str, lon_sql: str) -> dict:
    """DuckDB expressions reproducing :func:`assign_tiles` bit-for-bit."""
    px = (
        f"LEAST(GREATEST(CAST(FLOOR((({lon_sql}) - ({grid.origin_x!r})) / "
        f"({grid.pixel_width!r})) AS BIGINT), 0), {grid.width - 1})"
    )
    py = (
        f"LEAST(GREATEST(CAST(FLOOR((({lat_sql}) - ({grid.origin_y!r})) / "
        f"({grid.pixel_height!r})) AS BIGINT), 0), {grid.height - 1})"
    )
    ts = grid.tile_size
    return {
        "px": px,
        "py": py,
        "tile_x": f"(({px}) // {ts})",
        "tile_y": f"(({py}) // {ts})",
        "tile_off_x": f"(({px}) % {ts})",
        "tile_off_y": f"(({py}) % {ts})",
    }


def compact_cells(cells_ds, res: int, min_res: int,
                  x_col: str = "x", y_col: str = "y",
                  num_buckets=None, driver_max_bytes: int = 64 << 20):
    """Quadtree cell-cover compaction — the H3 ``compact`` analog on
    the engine's power-of-two grid (grid/cells.py): given DISTINCT
    cells at resolution ``res``, repeatedly replace every COMPLETE
    sibling quartet (all 4 children of one parent present) with the
    parent cell, down to ``min_res``. The result is the minimal
    mixed-resolution cover of the same area — the standard compression
    step for an AOI cell cover before it is broadcast to a join.

    Two tiers, gated on the cover's metadata byte estimate (same
    pattern as ``dup_clusters``): a cover under ``driver_max_bytes``
    (16 B/cell — covers are AOI-sized, not corpus-sized) is collected
    once and compacted in a numpy loop (one ``np.unique`` per level —
    the per-level Ray shuffle's fixed overhead dominates small covers
    ~5×); a larger cover runs one hash-bucketed fold per level, keyed
    on the PARENT coordinates so every sibling quartet meets in one
    bucket. Round k shuffles only the rows still compacting
    (≤ input/4^k), so the distributed tier exchanges < 4/3 × the input
    rows regardless of depth. Input rows MUST be distinct cells
    (completeness is judged by group size — duplicates would fake
    complete quartets; dedup first).

    Returns Dataset[(res:int64, x, y)] with mixed resolutions.
    """
    if not (0 <= min_res <= res):
        raise ValueError(f"need 0 <= min_res <= res "
                         f"(got {min_res}, {res})")
    import pandas as pd

    from buteo_ray.stages.aggregate import bucketed_fold
    from buteo_ray.state.skew import estimate_bytes

    eb = estimate_bytes(cells_ds)
    if eb is not None and eb < driver_max_bytes:
        import ray

        from buteo_ray.stages.aggregate import nonempty_arrow_blocks

        tabs = nonempty_arrow_blocks(cells_ds)
        if tabs:
            t = pa.concat_tables([tb.select([x_col, y_col])
                                  for tb in tabs])
            x = t[x_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
            y = t[y_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        else:
            x = y = np.empty(0, dtype=np.int64)
        out_r, out_x, out_y = [], [], []
        for lvl in range(res, min_res, -1):
            pk = (x >> 1) << np.int64(32) | (y >> 1)
            uniq, inv, cnt = np.unique(pk, return_inverse=True,
                                       return_counts=True)
            comp = cnt[inv] == 4
            out_r.append(np.full(int((~comp).sum()), lvl,
                                 dtype=np.int64))
            out_x.append(x[~comp])
            out_y.append(y[~comp])
            par = uniq[cnt == 4]
            x, y = par >> np.int64(32), par & np.int64(0xFFFFFFFF)
            if not x.size:
                break
        else:
            out_r.append(np.full(x.size, min_res, dtype=np.int64))
            out_x.append(x)
            out_y.append(y)
        return ray.data.from_arrow(pa.table({
            "res": np.concatenate(out_r), "x": np.concatenate(out_x),
            "y": np.concatenate(out_y)}))

    def _norm(t: pa.Table, _xc: str, _yc: str) -> pa.Table:
        x = t[_xc].cast(pa.int64()).to_numpy(zero_copy_only=False)
        y = t[_yc].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({"x": x, "y": y, "px": x >> 1, "py": y >> 1})

    def _fold(g: pd.DataFrame, lvl: int) -> pd.DataFrame:
        n = g.groupby(["px", "py"], sort=False)["x"].transform("size")
        comp = (n == 4).to_numpy()
        parents = (g.loc[comp, ["px", "py"]].drop_duplicates()
                   .rename(columns={"px": "x", "py": "y"}))
        parents.insert(0, "res",
                       np.full(len(parents), lvl - 1, dtype=np.int64))
        rest = g.loc[~comp, ["x", "y"]].copy()
        rest.insert(0, "res", np.full(len(rest), lvl, dtype=np.int64))
        return pd.concat([parents, rest], ignore_index=True)

    cur = cells_ds
    finals = []
    for level in range(res, min_res, -1):
        # Bind the column names per round (lazy execution + closure
        # late-binding would otherwise read the post-loop values).
        keyed = cur.map_batches(
            lambda t, _x=x_col, _y=y_col: _norm(t, _x, _y),
            batch_format="pyarrow", batch_size=None)
        # Each level's result is consumed by TWO branches (finals
        # filter + next round) — materialize it so the fold chain runs
        # once per level, not once per downstream consumer (lazy
        # re-execution would make L levels cost O(L²) folds). Level k
        # holds ≤ input/4^(k-1) rows, object-store-spillable; Σ over
        # levels < 4/3 × input rows.
        out = bucketed_fold(keyed, ["px", "py"],
                            lambda g, _l=level: _fold(g, _l),
                            num_buckets).materialize()
        finals.append(out.filter(expr=f"res == {level}"))
        cur = out.filter(expr=f"res == {level - 1}").materialize()
        x_col, y_col = "x", "y"
        if cur.count() == 0:
            # No quartet completed at this level — nothing can complete
            # at any coarser level either; skip the dead rounds.
            break

    def _final_tag(t: pa.Table) -> pa.Table:
        return pa.table({
            "res": np.full(len(t), min_res, dtype=np.int64),
            "x": t["x"].cast(pa.int64()),
            "y": t["y"].cast(pa.int64())})

    result = cur.map_batches(_final_tag, batch_format="pyarrow",
                             batch_size=None)
    for f in finals:
        result = result.union(f.select_columns(["res", "x", "y"]))
    return result
