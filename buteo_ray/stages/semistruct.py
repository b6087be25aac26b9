"""Semi-structured (flat JSON) field extraction over string columns.

Web-scale event/doc tables routinely carry a JSON-string payload column
(here ``events.props``). The engine's op extracts one scalar field per
call, VECTORIZED: the fast path is one compiled RE2 scan per batch via
``pyarrow.compute.extract_regex`` (no Python per row), which is exact
for FLAT objects — the only ambiguity a regex cannot resolve is the
same key recurring at a nested level, so ``strict=True`` routes through
``json.loads`` per row for nested payloads (documented slow path; put
it behind an actor-pool ``map_batches`` stage if it ever becomes hot).

The reference engine has no semi-structured family at all (its
attribute tables are typed GDAL fields); this is a beyond-reference op
motivated by the training-data brief.
"""
from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# extract_regex demands NAMED capture groups (RE2 unnamed groups are
# rejected); the single group is always called "v".
_NUM_RE = r'(?P<v>-?\d+(?:\.\d+)?(?:[eE][-+]?\d+)?)'
_STR_RE = r'"(?P<v>(?:[^"\\]|\\.)*)"'


def json_extract_scalar(ds, col: str, key: str, out_col: str,
                        dtype: str = "int64", strict: bool = False):
    """Extract ``$.key`` from the JSON strings in ``col`` into
    ``out_col``. ``dtype``: ``int64`` / ``float64`` (numeric JSON
    literals) or ``string`` (quoted values, backslash-escapes left
    as-is). Missing key / non-matching value → null, matching SQL
    ``json_extract`` semantics. Map-only: no shuffle, zero-copy Arrow
    in and out."""
    if dtype not in ("int64", "float64", "string"):
        raise ValueError(f"unsupported dtype {dtype!r}")
    if not re.fullmatch(r"[A-Za-z0-9_\-]+", key):
        # RE2 has no lookbehind; a key needing escapes beyond this set
        # is safer through the strict path.
        raise ValueError(f"key {key!r} not a simple identifier — "
                         "use strict=True extraction")
    val = _STR_RE if dtype == "string" else _NUM_RE
    pattern = f'"{re.escape(key)}"\\s*:\\s*{val}'
    target = {"int64": pa.int64(), "float64": pa.float64(),
              "string": pa.string()}[dtype]

    def _fast(t: pa.Table) -> pa.Table:
        groups = pc.extract_regex(t[col], pattern)
        # extract_regex yields a struct with one field per NAMED
        # capture group ("v"); null where no match.
        raw = pc.struct_field(groups, "v")
        if dtype == "int64":
            # JSON ints may print as 87.0 in sloppy producers; go
            # through float64, then truncate toward zero (SQL CAST
            # of a fractional value errors instead — callers wanting
            # that strictness extract float64 and safe_cast it).
            f = raw.cast(pa.float64())
            out = f.cast(pa.int64(), safe=False)
        elif dtype == "float64":
            out = raw.cast(pa.float64())
        else:
            out = raw
        return t.append_column(out_col, out.cast(target))

    def _strict(t: pa.Table) -> pa.Table:
        import json

        vals = []
        for s in t[col].to_pylist():
            try:
                v = json.loads(s).get(key) if s is not None else None
            except (ValueError, AttributeError):
                v = None
            vals.append(v)
        if dtype == "string":
            arr = pa.array([None if v is None else str(v) for v in vals],
                           type=target)
        else:
            # Only genuine JSON numbers survive a numeric extraction —
            # strings/bools/containers become null (same rule as the
            # fast path's non-matching regex), never a cast crash.
            arr = pa.array(
                [v if isinstance(v, (int, float))
                 and not isinstance(v, bool) else None for v in vals],
                type=pa.float64()).cast(target, safe=False)
        return t.append_column(out_col, arr)

    fn = _strict if strict else _fast
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
