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
SCHEME_NAME = "_scheme.json"


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST_NAME)


def _scheme_path(out_dir: str) -> str:
    return os.path.join(out_dir, SCHEME_NAME)


def check_scheme(out_dir: str, partition_col: str,
                 shard_col: Optional[str], num_shards: int) -> None:
    """Validate (and persist) the partition/shard scheme for a layout.

    Partition ids embed ``hash(shard_col) % num_shards``, so a resume
    with a DIFFERENT shard scheme would mark rows complete that the old
    shard dirs never contained (silent data loss) and read back
    duplicates for rows present under both schemes. The scheme is
    recorded in ``_scheme.json`` on first write; any later run against
    the same directory must match or clear the directory."""
    path = _scheme_path(out_dir)
    scheme = {"partition_col": partition_col,
              "shard_col": shard_col, "num_shards": int(num_shards)}
    if shard_col is not None and int(num_shards) > 1:
        # Shard ids embed the hash FUNCTION too: a layout sharded with
        # an older hash (pd.util.hash_array, pre-splitmix64) must not
        # be resumed by this code — every row would silently remap to a
        # new "#sNNNN" name and the output directory would double up.
        scheme["shard_hash"] = "splitmix64-v1"
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
        if existing != scheme:
            raise ValueError(
                f"partition scheme mismatch for {out_dir}: layout was written "
                f"with {existing}, this run uses {scheme}; resuming across "
                "scheme changes silently drops/duplicates rows — rerun with "
                "the recorded scheme or clear the output directory")
        return
    os.makedirs(out_dir, exist_ok=True)
    tmp = path + f".tmp{uuid.uuid4().hex[:6]}"
    with open(tmp, "w") as f:
        json.dump(scheme, f)
    os.rename(tmp, path)


def _safe_value(value: str) -> str:
    """Filesystem-safe partition value: percent-encode the characters
    that would break the `{col}={value}` directory layout ('/' and '\\\\'
    nest directories — rename then fails and readback never matches;
    '=' confuses the split; '%' escapes the escapes)."""
    return (value.replace("%", "%25").replace("/", "%2F")
            .replace("\\", "%5C").replace("=", "%3D"))


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


def _partition_strings(batch: pa.Table, partition_col: str,
                       shard_col: Optional[str], num_shards: int) -> np.ndarray:
    """Per-row partition id: ``str(value)`` or ``str(value)#sNN`` when
    sharding. Stringify through pandas str() — the SAME conversion
    _write_group uses for the manifest (an Arrow cast renders
    floats/bools/timestamps differently: "1" vs "1.0" — and a mismatch
    silently turns resume into a no-op)."""
    vals = batch[partition_col].to_pandas().astype(str).to_numpy()
    if shard_col is not None and num_shards > 1:
        # Dtype-stable hash: shard names must be identical across a
        # resume run even when block boundaries (and so per-block null
        # presence) change — a numpy int→float flip would silently remap
        # rows to new shards and break skip-finished-partitions.
        from buteo_ray.stages.aggregate import _hash_key_column

        sh = _hash_key_column(batch[shard_col]) % np.uint64(num_shards)
        vals = np.array([f"{v}#s{s:04d}" for v, s in zip(vals, sh)], dtype=object)
    return vals


def derive_num_shards(ds, out_dir: Optional[str] = None,
                      hot_share: float = 1.0,
                      target_bytes: int = 256 << 20,
                      cap: int = 65536) -> int:
    """Shard count for :func:`write_partitioned_resumable`.

    Sized so the HOT partition's per-shard write task is ~``target_bytes``:
    ``hot_share`` is the caller's estimate of the largest partition's
    share of total bytes (1.0 = assume one partition could hold
    everything — the conservative default for low-cardinality partition
    columns like 'split'). A low cap would silently recreate the giant-
    task problem at scale (100 TB / 256 cap ≈ 117 GB per task), so the
    cap is only a tiny-file backstop; small partitions fan out into at
    most ``min(rows, num_shards)`` dirs, and resume reads the manifest,
    not a directory scan.

    If ``out_dir`` already has a recorded scheme, its shard count is
    returned verbatim — a byte-estimate that drifts between runs must
    not change the scheme mid-resume (see :func:`check_scheme`)."""
    if out_dir is not None and os.path.exists(_scheme_path(out_dir)):
        with open(_scheme_path(out_dir)) as f:
            return int(json.load(f)["num_shards"])
    from buteo_ray.state.skew import estimate_bytes

    est = estimate_bytes(ds)
    return int(min(cap, max(1, int(est * hot_share) // target_bytes)))


def filter_completed(ds, partition_col: str, out_dir: str,
                     shard_col: Optional[str] = None, num_shards: int = 1):
    """Drop rows whose partition (or partition shard) is already complete
    (broadcast set membership inside map_batches — the anti-join resume
    step)."""
    done = completed_partitions(out_dir)
    if not done:
        return ds
    # A manifest exists: the partition ids about to be computed must use
    # the SAME shard scheme that produced it (see check_scheme).
    check_scheme(out_dir, partition_col, shard_col, num_shards)

    done_sorted = np.array(sorted(done), dtype=object)

    def _fn(batch: pa.Table) -> pa.Table:
        vals = _partition_strings(batch, partition_col, shard_col, num_shards)
        keep = ~np.isin(vals, done_sorted)
        return batch.filter(pa.array(keep))

    return ds.map_batches(_fn, batch_format="pyarrow", batch_size=None)


def write_partitioned_resumable(
    ds,
    out_dir: str,
    partition_col: str,
    op_version: str = "v1",
    resume: bool = True,
    shard_col: Optional[str] = None,
    num_shards: int = 1,
    rows_per_file: int = 1 << 20,
):
    """Write a Dataset as one atomic parquet directory per partition
    value, with lineage rows appended to the manifest.

    Plan: [optional resume filter] → ``groupby(partition id)`` → each
    group writes ``{out_dir}/{col}={value}/part-NNNN.parquet`` files
    (chunked every ``rows_per_file`` rows, never one giant file) via
    tmp+rename and RETURNS its lineage row; the small lineage Dataset is
    appended to the manifest by the driver in one atomic pass. Returns
    the list of lineage rows written this run.

    **Sharding** (``shard_col`` + ``num_shards``): a low-cardinality or
    hot-keyed ``partition_col`` (a 'split' column, the generator's hot
    cell) would otherwise funnel most of the corpus into ONE map_groups
    task. With sharding the write/resume unit becomes
    ``(value, hash(shard_col) % num_shards)`` — dirs named
    ``{col}={value}#sNNNN`` — restoring write parallelism and making
    resume granularity proportional to 1/num_shards of a partition.
    Partition values are percent-encoded in directory names (path
    separators would silently break rename and readback)."""
    os.makedirs(out_dir, exist_ok=True)
    # Sweep tmp dirs orphaned by crashed/retried writers from earlier
    # runs — they hold full parquet payloads and would leak unbounded
    # across resumes of a long job.
    import shutil

    for entry in os.listdir(out_dir):
        if entry.startswith("._tmp_"):
            shutil.rmtree(os.path.join(out_dir, entry), ignore_errors=True)
    check_scheme(out_dir, partition_col, shard_col, num_shards)
    if resume:
        ds = filter_completed(ds, partition_col, out_dir,
                              shard_col=shard_col, num_shards=num_shards)

    def _tag(batch: pa.Table) -> pa.Table:
        part = _partition_strings(batch, partition_col, shard_col, num_shards)
        return batch.append_column("__part", pa.array(part, type=pa.string()))

    def _write_group(g: pd.DataFrame) -> pd.DataFrame:
        part = str(g["__part"].iloc[0])
        g = g.drop(columns="__part")
        t0 = time.perf_counter()
        final_dir = os.path.join(out_dir, f"{partition_col}={_safe_value(part)}")
        tmp_dir = os.path.join(out_dir, f"._tmp_{uuid.uuid4().hex[:12]}")
        os.makedirs(tmp_dir, exist_ok=True)
        table = pa.Table.from_pandas(g, preserve_index=False)
        for i, start in enumerate(range(0, max(table.num_rows, 1), rows_per_file)):
            pq.write_table(table.slice(start, rows_per_file),
                           os.path.join(tmp_dir, f"part-{i:04d}.parquet"))
        nbytes = sum(
            os.path.getsize(os.path.join(tmp_dir, f)) for f in os.listdir(tmp_dir)
        )
        if os.path.exists(final_dir):  # crashed mid-rename on a retry
            import shutil

            shutil.rmtree(final_dir)
        os.rename(tmp_dir, final_dir)
        return pd.DataFrame({
            "partition": [part],
            "rows": [len(g)],
            "bytes": [nbytes],
            "op_version": [op_version],
            "wall_sec": [round(time.perf_counter() - t0, 4)],
            "written_utc": [datetime.now(timezone.utc).isoformat()],
        })

    tagged = ds.map_batches(_tag, batch_format="pyarrow", batch_size=None)
    lineage = tagged.groupby("__part").map_groups(_write_group, batch_format="pandas")
    rows = lineage.to_pandas().to_dict("records")

    # Atomic manifest rewrite: drop superseded rows for partitions
    # rewritten THIS run (a resume=False rerun would otherwise append
    # duplicates and double-count lineage metrics), then append.
    rewritten = {r["partition"] for r in rows}
    existing = [r for r in read_manifest(out_dir)
                if r["partition"] not in rewritten]
    tmp = _manifest_path(out_dir) + f".tmp{uuid.uuid4().hex[:6]}"
    with open(tmp, "w") as f:
        for r in existing + rows:
            f.write(json.dumps(r) + "\n")
    os.rename(tmp, _manifest_path(out_dir))
    return rows


def read_partitioned(out_dir: str, columns: Optional[list] = None):
    """Read back a resumable layout (manifest partitions only)."""
    import ray.data as rd

    done = {_safe_value(p) for p in completed_partitions(out_dir)}
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
