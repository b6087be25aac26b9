"""Checkpoint/resume with per-partition lineage (north rule: "resumable
from checkpoint with per-partition lineage + metrics").

The reference has no resume story — a failed run re-executes the whole
script (SURVEY.md §4). Here a pipeline's sink is a PARTITIONED parquet
layout, one directory per partition-key value, each written atomically
(tmp dir → rename), plus a manifest JSONL with one lineage row per
completed partition:

    {"partition": "…", "rows": N, "bytes": B, "op_version": "…",
     "wall_sec": …, "written_utc": "…"}

Resume = read the manifest, drop already-completed partitions from the
input with an anti-semi filter (broadcast set membership, no shuffle),
run the remainder, append to the manifest. A partition is either fully
present (rename is atomic on one filesystem) or absent — rerunning a
failed run never produces duplicates.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from datetime import datetime, timezone
from typing import List, Optional, Set

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

MANIFEST_NAME = "_manifest.jsonl"


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_NAME)


def completed_partitions(out_dir: str) -> Set[str]:
    """Partition values recorded as complete in the manifest."""
    path = _manifest_path(out_dir)
    if not os.path.exists(path):
        return set()
    done = set()
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                done.add(json.loads(line)["partition"])
    return done


def read_manifest(out_dir: str) -> List[dict]:
    path = _manifest_path(out_dir)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return [json.loads(l) for l in f if l.strip()]


def filter_completed(ds, partition_col: str, out_dir: str):
    """Drop rows whose partition is already complete (broadcast set
    membership inside map_batches — the anti-join resume step)."""
    done = completed_partitions(out_dir)
    if not done:
        return ds

    done_sorted = np.array(sorted(done), dtype=object)

    def _fn(batch: pa.Table) -> pa.Table:
        # Stringify through the SAME conversion _write_group uses for the
        # manifest (python str of the pandas value): an Arrow cast renders
        # floats/bools/timestamps differently ("1" vs "1.0", "true" vs
        # "True") and would silently never match → resume becomes a no-op.
        vals = batch[partition_col].to_pandas().astype(str).to_numpy()
        keep = ~np.isin(vals, done_sorted)
        return batch.filter(pa.array(keep))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def write_partitioned_resumable(
    ds,
    out_dir: str,
    partition_col: str,
    op_version: str = "v1",
    resume: bool = True,
):
    """Write a Dataset as one atomic parquet directory per partition
    value, with lineage rows appended to the manifest.

    Plan: [optional resume filter] → ``groupby(partition_col)`` → each
    group writes ``{out_dir}/{col}={value}/part.parquet`` via tmp+rename
    and RETURNS its lineage row; the small lineage Dataset is appended
    to the manifest by the driver in one atomic pass. Returns the list
    of lineage rows written this run.
    """
    os.makedirs(out_dir, exist_ok=True)
    # Sweep tmp dirs orphaned by crashed/retried writers from earlier
    # runs — they hold full parquet payloads and would leak unbounded
    # across resumes of a long job.
    import shutil

    for entry in os.listdir(out_dir):
        if entry.startswith("._tmp_"):
            shutil.rmtree(os.path.join(out_dir, entry), ignore_errors=True)
    if resume:
        ds = filter_completed(ds, partition_col, out_dir)

    def _write_group(g: pd.DataFrame) -> pd.DataFrame:
        value = str(g[partition_col].iloc[0])
        t0 = time.perf_counter()
        final_dir = os.path.join(out_dir, f"{partition_col}={value}")
        tmp_dir = os.path.join(out_dir, f"._tmp_{value}_{uuid.uuid4().hex[:8]}")
        os.makedirs(tmp_dir, exist_ok=True)
        table = pa.Table.from_pandas(g, preserve_index=False)
        pq.write_table(table, os.path.join(tmp_dir, "part.parquet"))
        nbytes = sum(
            os.path.getsize(os.path.join(tmp_dir, f)) for f in os.listdir(tmp_dir)
        )
        if os.path.exists(final_dir):  # crashed mid-rename on a retry
            import shutil

            shutil.rmtree(final_dir)
        os.rename(tmp_dir, final_dir)
        return pd.DataFrame({
            "partition": [value],
            "rows": [len(g)],
            "bytes": [nbytes],
            "op_version": [op_version],
            "wall_sec": [round(time.perf_counter() - t0, 4)],
            "written_utc": [datetime.now(timezone.utc).isoformat()],
        })

    lineage = ds.groupby(partition_col).map_groups(_write_group, batch_format="pandas")
    rows = lineage.to_pandas().to_dict("records")

    # Atomic manifest append: write-all to tmp, rename over.
    existing = read_manifest(out_dir)
    tmp = _manifest_path(out_dir) + f".tmp{uuid.uuid4().hex[:6]}"
    with open(tmp, "w") as f:
        for r in existing + rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, _manifest_path(out_dir))
    return rows


def read_partitioned(out_dir: str, columns: Optional[list] = None):
    """Read back a resumable layout (manifest partitions only)."""
    import ray.data as rd

    done = completed_partitions(out_dir)
    paths = []
    for d in sorted(os.listdir(out_dir)):
        if "=" in d and d.split("=", 1)[1] in done:
            part_dir = os.path.join(out_dir, d)
            paths.extend(os.path.join(part_dir, f) for f in sorted(os.listdir(part_dir))
                         if f.endswith(".parquet"))
    if not paths:
        # read_parquet([]) raises; a fresh/empty layout reads as empty.
        import ray.data

        return ray.data.from_items([])
    return rd.read_parquet(paths, columns=columns)
