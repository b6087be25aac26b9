"""Nested-column payload support for hash joins.

Ray 2.49's ``Dataset.join`` finalizes each partition with an Acero hash
join, and Acero rejects every nested payload type: ``list``,
``fixed_size_list`` and Ray's tensor-extension columns all raise
``ArrowInvalid: Data type ... is not supported in join non-key field``.
An engine whose corpora carry embedding columns (``list<float>`` per
the brief) must still be able to anti-/semi-join them, so these helpers
byte-pack nested numeric columns into binary — which Acero does accept
— on the way into a join and restore them on the way out.

The packed type is decided ONCE, driver-side, from the schema (not per
batch — a per-batch choice would emit ``fixed_size_binary`` for
null-free blocks and ``large_binary`` for blocks with a null, and the
join would then see two schemas for one column):

    fixed element count d (fixed_size_list<T>[d], fixed-shape tensor)
        → fixed_size_binary(d·itemsize), nulls kept via validity
    variable count (list<T>, large_list<T>)
        → large_binary

Ray's VARIABLE-shaped tensor extension (struct storage, per-row shape)
is rejected loudly at plan time: byte-packing would silently drop the
per-row shapes — cast to a plain list column before joining instead.

Both directions are vectorized buffer reinterpretations (``numpy``
``frombuffer``/``reshape``); rows with nulls take a documented per-row
fallback that still lands on the SAME arrow type. Unpack restores the
column to the exact pre-pack plain type recorded in the plan
(extension/tensor columns come back as the equivalent plain
``fixed_size_list``/``list`` — Ray treats the two interchangeably), so
the output schema does not depend on which blocks held nulls or on
whether the join path ran at all for list-typed inputs.

No reference analog (the reference joins via GDAL attribute filters);
this exists for the Ray-native join path.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.types as pat


class _ColPlan:
    """Packing decision for one column, computed driver-side.

    dtype: numpy value dtype; width: elements per row (None = ragged);
    orig: the plain Arrow type unpack restores (and casts back to).
    """

    __slots__ = ("dtype", "width", "orig")

    def __init__(self, dtype: np.dtype, width: Optional[int], orig: pa.DataType):
        self.dtype = dtype
        self.width = width
        self.orig = orig

    def __reduce__(self):  # pa.DataType pickles fine; keep plan shippable
        return (_ColPlan, (self.dtype, self.width, self.orig))


def nested_payload_columns(schema) -> Dict[str, _ColPlan]:
    """Map of column name → :class:`_ColPlan` for every column a Ray
    hash join cannot carry as payload (nested or extension-typed).

    ``schema`` is a Ray ``Schema`` wrapper or ``pa.Schema`` (parallel
    ``names``/``types``). Pandas-block datasets report numpy dtypes —
    those have no Arrow-nested columns and are skipped. Nested columns
    with non-numeric values raise: byte-packing can't round-trip
    variable-width strings without a real serializer.
    """
    out: Dict[str, _ColPlan] = {}
    for name, typ in zip(schema.names, schema.types):
        if not isinstance(typ, pa.DataType):
            continue
        is_ext = isinstance(typ, pa.BaseExtensionType)
        base = typ.storage_type if is_ext else typ
        if is_ext and pat.is_struct(base):
            # Ray's variable-shaped tensor type: struct<data, shape>.
            # Packing only the data would silently drop per-row shapes.
            raise TypeError(
                f"nested_payload_columns: column '{name}' is a "
                f"variable-shaped tensor ({typ}); byte-packing would drop "
                "the per-row shapes — cast it to a plain list column "
                "before the join")
        if not (pat.is_fixed_size_list(base) or pat.is_list(base)
                or pat.is_large_list(base)):
            continue
        vt = base.value_type
        if not (pat.is_integer(vt) or pat.is_floating(vt) or pat.is_boolean(vt)):
            raise TypeError(
                f"nested_payload_columns: column '{name}' has nested "
                f"non-numeric values ({base}); cannot byte-pack for a join")
        dt = np.dtype(vt.to_pandas_dtype())
        if is_ext:
            shape = getattr(typ, "shape", None)
            if shape is not None and all(s is not None for s in shape):
                width = int(np.prod(shape))
                orig = pa.list_(vt, width)
            else:  # extension over a plain variable list
                width, orig = None, pa.list_(vt)
        elif pat.is_fixed_size_list(base):
            width, orig = base.list_size, base
        else:
            width, orig = None, base
        out[name] = _ColPlan(dt, width, orig)
    return out


def _pack_column(col: pa.ChunkedArray, plan: _ColPlan) -> pa.Array:
    arr = col.combine_chunks()
    dt, width = plan.dtype, plan.width
    if isinstance(arr.type, pa.BaseExtensionType):
        if arr.null_count:
            # Null-check BEFORE to_numpy: ArrowTensorArray.to_numpy (and
            # even its to_pylist) crash on null rows. The storage array
            # is a plain list with the same validity — pack from that.
            return _pack_rows(arr.storage.to_pylist(), plan)
        nd = np.asarray(arr.to_numpy(zero_copy_only=False))
        if nd.dtype == object:
            return _pack_rows([None if v is None else np.asarray(v)
                               for v in nd], plan)
        flat = np.ascontiguousarray(
            nd.reshape(len(arr), -1).astype(dt, copy=False))
        if width is not None:
            return pa.Array.from_buffers(pa.binary(width * dt.itemsize),
                                         len(arr), [None, pa.py_buffer(flat)])
        row = flat.shape[1] * dt.itemsize  # rectangular batch of a ragged col
        offs = np.arange(len(arr) + 1, dtype=np.int64) * row
        return pa.Array.from_buffers(
            pa.large_binary(), len(arr),
            [None, pa.py_buffer(offs), pa.py_buffer(flat)])
    if arr.null_count:  # nulls shift flatten() alignment → per-row path
        return _pack_rows(arr.to_pylist(), plan)
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


def _pack_rows(rows, plan: _ColPlan) -> pa.Array:
    """Null-safe per-row fallback; lands on the SAME type as the
    vectorized path so block schemas stay consistent."""
    dt = plan.dtype
    packed = [None if v is None else np.asarray(v, dtype=dt).tobytes()
              for v in rows]
    typ = pa.large_binary() if plan.width is None else pa.binary(
        plan.width * dt.itemsize)
    return pa.array(packed, type=typ)


def _unpack_column(col: pa.ChunkedArray, plan: _ColPlan) -> pa.Array:
    arr = col.combine_chunks()
    dt, n = plan.dtype, len(arr)
    if pat.is_fixed_size_binary(arr.type) and not arr.null_count:
        d = arr.type.byte_width // dt.itemsize
        buf = arr.buffers()[1]
        flat = np.frombuffer(buf, dtype=dt,
                             count=(arr.offset + n) * d)[arr.offset * d:]
        out = pa.FixedSizeListArray.from_arrays(pa.array(flat), d)
        return out if out.type == plan.orig else out.cast(plan.orig)
    # Variable binary, or fixed with nulls: byte lengths recover element
    # counts; one bytes-join keeps it near-C. 64-bit offsets so a block
    # can exceed 2^31 elements before the final cast to plan.orig.
    vals = arr.to_pylist()
    counts = np.fromiter(
        (0 if v is None else len(v) // dt.itemsize for v in vals),
        dtype=np.int64, count=n)
    flat = np.frombuffer(b"".join(v for v in vals if v is not None), dtype=dt)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    mask = None
    if arr.null_count:
        mask = pa.array([v is None for v in vals])
    out = pa.LargeListArray.from_arrays(pa.array(offsets, type=pa.int64()),
                                        pa.array(flat), mask=mask)
    return out if out.type == plan.orig else out.cast(plan.orig)


def pack_nested(ds, plan: Dict[str, _ColPlan]):
    """Byte-pack the ``plan`` columns so ``ds`` can enter a hash join."""
    if not plan:
        return ds

    def _pack(t: pa.Table) -> pa.Table:
        for name, cp in plan.items():
            i = t.column_names.index(name)
            t = t.set_column(i, name, _pack_column(t[name], cp))
        return t

    return ds.map_batches(_pack, batch_format="pyarrow", batch_size=None)


def unpack_nested(ds, plan: Dict[str, _ColPlan]):
    """Restore columns packed by :func:`pack_nested` to their pre-pack
    plain list types."""
    if not plan:
        return ds

    def _unpack(t: pa.Table) -> pa.Table:
        for name, cp in plan.items():
            i = t.column_names.index(name)
            t = t.set_column(i, name, _unpack_column(t[name], cp))
        return t

    return ds.map_batches(_unpack, batch_format="pyarrow", batch_size=None)
