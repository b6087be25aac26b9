"""Deterministic hash-geocoder: integer id → (lat, lon).

The web-page table (BASELINE.json input_hint) has no coordinates; the
engine derives them deterministically so every system — the Ray pipeline,
the DuckDB SQL oracle, a NumPy test oracle — computes bit-identical
doubles from the same ids. All arithmetic is therefore:

- integer-exact in int64/BIGINT (multiplier bounded so no overflow even
  at 10^12-row id ranges: ``(id % 2^20) * mult`` ≤ 2^20·2.7e9 ≈ 2.8e15),
- followed by division by 2^32 (exact in float64) and one affine map
  (same operation order everywhere → identical IEEE rounding).

30% of ids land in a ~2°×2° hot cluster — deliberate skew so cell
partitioning must handle hot keys (SURVEY.md §7.5; the salting path is
exercised by it).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa

_M1 = 2654435761  # Knuth multiplicative hash constants (public)
_M2 = 2246822519
_Q1 = 40503
_Q2 = 65537
_TWO32 = 4294967296
_LOW = 1048576  # 2^20 split keeps every product within int64/BIGINT

HOT_MOD = 10
HOT_LT = 3  # ids with id % 10 < 3 are "hot" (30%)

HOT_LAT0, HOT_LAT_SPAN = 40.0, 2.0
HOT_LON0, HOT_LON_SPAN = -74.0, 2.0
COLD_LAT0, COLD_LAT_SPAN = -60.0, 120.0
COLD_LON0, COLD_LON_SPAN = -180.0, 360.0


def hash_u32(ids: np.ndarray, mult: int, qmult: int) -> np.ndarray:
    """Overflow-safe 32-bit integer hash, identical in int64 and BIGINT:
    ``((id % 2^20)·mult + (id // 2^20)·qmult + id) % 2^32``."""
    ids = np.asarray(ids, dtype=np.int64)
    return ((ids % _LOW) * mult + (ids // _LOW) * qmult + ids) % _TWO32


def hash_unit(ids: np.ndarray, mult: int, qmult: int) -> np.ndarray:
    """Hash → float64 in [0, 1) (division by 2^32 is exact)."""
    return hash_u32(ids, mult, qmult) / float(_TWO32)


def hash_coords_from_ids(ids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """ids → (lat, lon) float64 arrays; 30% hot cluster, rest world-wide."""
    ids = np.asarray(ids, dtype=np.int64)
    ux = hash_unit(ids, _M1, _Q1)
    uy = hash_unit(ids, _M2, _Q2)
    hot = (ids % HOT_MOD) < HOT_LT
    lat = np.where(hot, HOT_LAT0 + uy * HOT_LAT_SPAN, COLD_LAT0 + uy * COLD_LAT_SPAN)
    lon = np.where(hot, HOT_LON0 + ux * HOT_LON_SPAN, COLD_LON0 + ux * COLD_LON_SPAN)
    return lat, lon


def geocode(ds, id_col: str = "doc_id", lat_col: str = "lat", lon_col: str = "lon"):
    """Dataset stage: append deterministic lat/lon columns.

    Stateless vectorized ``map_batches`` over zero-copy Arrow batches —
    the Ray-native successor of the reference's per-feature attribute
    writes (``core_vector/core_vector_attributes.py:154-225``).
    """

    def _fn(batch: pa.Table) -> pa.Table:
        lat, lon = hash_coords_from_ids(batch[id_col].to_numpy(zero_copy_only=False))
        return batch.append_column(lat_col, pa.array(lat)).append_column(lon_col, pa.array(lon))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def _hash_sql(id_sql: str, mult: int, qmult: int) -> str:
    return (
        f"((({id_sql}) % {_LOW}) * {mult} + (({id_sql}) // {_LOW}) * {qmult}"
        f" + ({id_sql})) % {_TWO32}"
    )


def geocode_sql_exprs(id_sql: str = "doc_id") -> Tuple[str, str]:
    """(lat_sql, lon_sql) DuckDB expressions computing the identical
    doubles as :func:`hash_coords_from_ids` — single source of truth for
    the oracle SQL."""
    ux = f"(({_hash_sql(id_sql, _M1, _Q1)}) / {_TWO32})"
    uy = f"(({_hash_sql(id_sql, _M2, _Q2)}) / {_TWO32})"
    hot = f"(({id_sql}) % {HOT_MOD} < {HOT_LT})"
    lat = (
        f"(CASE WHEN {hot} THEN {HOT_LAT0} + {uy} * {HOT_LAT_SPAN}"
        f" ELSE {COLD_LAT0} + {uy} * {COLD_LAT_SPAN} END)"
    )
    lon = (
        f"(CASE WHEN {hot} THEN {HOT_LON0} + {ux} * {HOT_LON_SPAN}"
        f" ELSE {COLD_LON0} + {ux} * {COLD_LON_SPAN} END)"
    )
    return lat, lon
