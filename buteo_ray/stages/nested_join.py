"""Nested-column payload support for hash joins.

Ray 2.49's ``Dataset.join`` finalizes each partition with an Acero hash
join, and Acero rejects every nested payload type: ``list``,
``fixed_size_list`` and Ray's tensor-extension columns all raise
``ArrowInvalid: Data type ... is not supported in join non-key field``.
An engine whose corpora carry embedding columns (``list<float>`` per
the brief) must still be able to anti-/semi-join them, so these helpers
byte-pack nested numeric columns into binary — which Acero does accept
— on the way into a join and restore them on the way out:

    fixed_size_list<T>[d] / rectangular tensor → fixed_size_binary(d·w)
    list<T> (ragged)                           → large_binary

Both directions are vectorized buffer reinterpretations (``numpy``
``frombuffer``/``reshape``), not per-row loops; rows with nulls or
ragged object tensors take a documented per-row fallback. The value
dtype is captured driver-side from the schema (the packed binary type
alone can't disambiguate float64[4] from int32[8]); widths are
recovered from the binary type / byte lengths, so slicing and
chunk boundaries don't matter.

No reference analog (the reference joins via GDAL attribute filters);
this exists for the Ray-native join path.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import pyarrow as pa
import pyarrow.types as pat


def nested_payload_columns(schema) -> Dict[str, np.dtype]:
    """Map of column name → numpy value dtype for every column a Ray
    hash join cannot carry as payload (nested or extension-typed).

    ``schema`` is a Ray ``Schema`` wrapper or ``pa.Schema`` (parallel
    ``names``/``types``). Pandas-block datasets report numpy dtypes —
    those have no Arrow-nested columns and are skipped. Nested columns
    with non-numeric values raise: byte-packing can't round-trip
    variable-width strings without a real serializer.
    """
    out: Dict[str, np.dtype] = {}
    for name, typ in zip(schema.names, schema.types):
        if not isinstance(typ, pa.DataType):
            continue
        base = typ.storage_type if isinstance(typ, pa.BaseExtensionType) else typ
        if not (pat.is_fixed_size_list(base) or pat.is_list(base)
                or pat.is_large_list(base)):
            continue
        vt = base.value_type
        if not (pat.is_integer(vt) or pat.is_floating(vt) or pat.is_boolean(vt)):
            raise TypeError(
                f"nested_payload_columns: column '{name}' has nested "
                f"non-numeric values ({base}); cannot byte-pack for a join")
        out[name] = np.dtype(vt.to_pandas_dtype())
    return out


def _pack_column(col: pa.ChunkedArray, dt: np.dtype) -> pa.Array:
    arr = col.combine_chunks()
    if isinstance(arr.type, pa.BaseExtensionType):
        nd = arr.to_numpy(zero_copy_only=False)
        nd = np.asarray(nd)
        if nd.dtype == object:  # ragged tensor rows → per-row fallback
            return pa.array([None if v is None
                             else np.ascontiguousarray(v, dtype=dt).tobytes()
                             for v in nd], type=pa.large_binary())
        flat = np.ascontiguousarray(nd.reshape(len(arr), -1).astype(dt, copy=False))
        width = flat.shape[1] * dt.itemsize
        return pa.Array.from_buffers(pa.binary(width), len(arr),
                                     [None, pa.py_buffer(flat)])
    if arr.null_count:  # nulls shift flatten() alignment → per-row path
        return pa.array([None if v is None
                         else np.asarray(v, dtype=dt).tobytes()
                         for v in arr.to_pylist()], type=pa.large_binary())
    if pat.is_fixed_size_list(arr.type):
        d = arr.type.list_size
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(dt, copy=False)
        flat = np.ascontiguousarray(flat)
        return pa.Array.from_buffers(pa.binary(d * dt.itemsize), len(arr),
                                     [None, pa.py_buffer(flat)])
    # Variable-size list: values buffer + element offsets → byte offsets.
    values = arr.flatten().to_numpy(zero_copy_only=False).astype(dt, copy=False)
    values = np.ascontiguousarray(values)
    offs = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    # .offsets are physical — rebase to this slice's window.
    byte_offs = (offs - offs[0]) * dt.itemsize
    return pa.Array.from_buffers(
        pa.large_binary(), len(arr),
        [None, pa.py_buffer(np.ascontiguousarray(byte_offs)),
         pa.py_buffer(values)])


def _unpack_column(col: pa.ChunkedArray, dt: np.dtype) -> pa.Array:
    arr = col.combine_chunks()
    n = len(arr)
    if pat.is_fixed_size_binary(arr.type):
        d = arr.type.byte_width // dt.itemsize
        buf = arr.buffers()[1]
        flat = np.frombuffer(buf, dtype=dt,
                             count=(arr.offset + n) * d)[arr.offset * d:]
        return pa.FixedSizeListArray.from_arrays(pa.array(flat), d)
    # Variable binary (also the null/ragged fallback's output): byte
    # lengths recover element counts; one bytes-join keeps it near-C.
    vals = arr.to_pylist()
    counts = np.fromiter(
        (0 if v is None else len(v) // dt.itemsize for v in vals),
        dtype=np.int64, count=n)
    flat = np.frombuffer(b"".join(v for v in vals if v is not None), dtype=dt)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    out = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                   pa.array(flat))
    if any(v is None for v in vals):
        mask = pa.array([v is None for v in vals])
        out = pa.ListArray.from_arrays(out.offsets, out.values, mask=mask)
    return out


def pack_nested(ds, plan: Dict[str, np.dtype]):
    """Byte-pack the ``plan`` columns so ``ds`` can enter a hash join."""
    if not plan:
        return ds

    def _pack(t: pa.Table) -> pa.Table:
        for name, dt in plan.items():
            i = t.column_names.index(name)
            t = t.set_column(i, name, _pack_column(t[name], dt))
        return t

    return ds.map_batches(_pack, batch_format="pyarrow", batch_size=None)


def unpack_nested(ds, plan: Dict[str, np.dtype]):
    """Restore columns packed by :func:`pack_nested` to list arrays."""
    if not plan:
        return ds

    def _unpack(t: pa.Table) -> pa.Table:
        for name, dt in plan.items():
            i = t.column_names.index(name)
            t = t.set_column(i, name, _unpack_column(t[name], dt))
        return t

    return ds.map_batches(_unpack, batch_format="pyarrow", batch_size=None)
