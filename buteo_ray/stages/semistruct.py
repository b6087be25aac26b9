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
    ``json_extract`` semantics. int64 extraction is EXACT or null —
    never silently rounded/truncated; the fast path conservatively
    nulls 19-20-digit integer literals (they can overflow and RE2 has
    no arbitrary-precision parse), where strict=True resolves them
    exactly via json.loads. Map-only: no shuffle, zero-copy Arrow in
    and out."""
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
            # Integer literals up to 18 digits parse DIRECTLY string →
            # int64 (exact past 2^53, where a float64 detour silently
            # rounds, e.g. 9007199254740993 → ...992). Everything else
            # (87.0, 1e5, 19+ digits) goes through float64 and survives
            # only if the round-trip back to float64 is EXACT — a
            # fractional/overflowing value nulls out rather than
            # emitting the INT64_MIN sentinel / truncated garbage an
            # unsafe cast would (callers wanting fractional payloads
            # extract float64).
            is_int = pc.match_substring_regex(
                pc.fill_null(raw, ""), r"^-?\d{1,18}$")
            direct = pc.if_else(is_int, raw, pa.scalar(None, pa.string()))
            di = direct.cast(pa.int64())
            f = pc.if_else(is_int, pa.scalar(None, pa.string()),
                           raw).cast(pa.float64())
            fn = f.to_numpy(zero_copy_only=False)
            with np.errstate(invalid="ignore"):
                in_range = (fn >= -2.0**63) & (fn < 2.0**63)
            safe = np.where(in_range, fn, 0.0)
            iv = safe.astype(np.int64)
            with np.errstate(invalid="ignore"):
                exact = in_range & (iv.astype(np.float64) == safe)
            via_float = pa.array(
                np.where(exact, iv, 0), type=pa.int64(),
                mask=~exact | pc.is_null(f).to_numpy(
                    zero_copy_only=False))
            out = pc.if_else(pc.is_valid(di), di, via_float)
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
            # Strings only — a bool/number/container nulls out, the
            # same rule the fast path's quoted-value regex enforces
            # (note: DuckDB json_extract_string instead stringifies
            # scalars; the oracle queries use numeric extraction where
            # that difference cannot bite).
            arr = pa.array([v if isinstance(v, str) else None
                            for v in vals], type=target)
        elif dtype == "int64":
            # Exact-int64 rule, matching the fast path: python ints
            # stay exact (json.loads is arbitrary-precision — never
            # route them through float64), integral floats convert,
            # everything else nulls.
            def _as_i64(v):
                if isinstance(v, bool) or v is None:
                    return None
                if isinstance(v, int):
                    return v if -(2**63) <= v < 2**63 else None
                if isinstance(v, float) and v.is_integer() \
                        and -(2.0**63) <= v < 2.0**63:
                    return int(v)
                return None

            arr = pa.array([_as_i64(v) for v in vals], type=target)
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
