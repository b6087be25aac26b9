"""Wide↔long reshape: UNPIVOT / melt (SURVEY.md §2.9 reshape family —
the inverse of ``aggregate.pivot_counts``; reference analog: the
band-axis unstacking around raster stacks, where per-band columns
become (band, value) rows).

Pure ``map_batches`` — no shuffle, no state: each wide row of k value
columns becomes k long rows inside its own block, so the op streams at
scan speed and composes with any downstream groupby on the variable
column. At 100 TB the output is k× the row count but carries only
(id_cols + 2) columns; pinned bytes: none.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa


def unpivot_longer(ds, id_cols: Sequence[str], value_cols: Sequence[str],
                   var_name: str = "variable", value_name: str = "value",
                   value_type: Optional[pa.DataType] = None):
    """UNPIVOT: turn ``value_cols`` into (``var_name``, ``value_name``)
    rows, repeating ``id_cols``. All value columns are cast to one
    common Arrow type (``value_type``; default float64 when any input
    floats, int64 when all are integers, else the first column's
    type) — same contract as SQL
    UNPIVOT, which requires union-compatible value columns. NULL values
    are KEPT as rows (SQL ``UNPIVOT INCLUDE NULLS``; filter after if
    you want the default excluding form).
    """
    id_cols, value_cols = list(id_cols), list(value_cols)
    if not value_cols:
        raise ValueError("unpivot_longer: value_cols must be non-empty")

    def _fn(t: pa.Table) -> pa.Table:
        vt = value_type
        if vt is None:
            types = [t.schema.field(c).type for c in value_cols]
            if any(pa.types.is_floating(x) for x in types):
                vt = pa.float64()
            elif all(pa.types.is_integer(x) for x in types):
                vt = pa.int64()  # widest int — mixed widths safe-cast up
            else:
                vt = types[0]
        n = t.num_rows
        parts = []
        for c in value_cols:
            cols = {k: t[k] for k in id_cols}
            cols[var_name] = pa.array(np.repeat(c, n), type=pa.string())
            col = t[c]
            cols[value_name] = col if col.type == vt else col.cast(vt)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)
