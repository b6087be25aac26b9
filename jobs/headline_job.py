#!/usr/bin/env python
"""Cluster job entrypoint for the flagship pipeline (north rule: "run via
ray job submit on fixed-size clusters at N and 4N nodes").

On a real cluster:

    ray job submit --working-dir . -- python jobs/headline_job.py \
        --input s3://bucket/pages/ --output s3://bucket/out/ --aoi 10000

In this sandbox the same script runs against local parquet. The script
owns its Ray session (guarded init — connects to the cluster when
RAY_ADDRESS is set by the job server, local otherwise) and uses the
resumable partitioned sink, so a preempted job re-submitted with the
same --output continues where it stopped.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", default="/tmp/buteo_ray_bench/pages_1000000",
                   help="parquet directory of pages")
    p.add_argument("--output", default="/tmp/buteo_ray_headline_job",
                   help="resumable partitioned output directory")
    p.add_argument("--aoi", type=int, default=10000, help="AOI polygon count")
    p.add_argument("--zoom", type=int, default=10)
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        # Under `ray job submit` RAY_ADDRESS points at the cluster; running
        # standalone it is unset/local and Ray starts a local instance.
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from buteo_ray.sources.aoi import synth_aoi_polygons
    from buteo_ray.stages.cell_assign import assign_cells
    from buteo_ray.stages.geocode import geocode
    from buteo_ray.stages.join import broadcast_pip_join
    from buteo_ray.stages.tiling import GridSpec, assign_tiles
    from buteo_ray.state.checkpoint import read_manifest, write_partitioned_resumable

    t0 = time.perf_counter()
    ds = rd.read_parquet(args.input,
                         columns=["url", "warc_ts", "text", "lang", "page_id"])
    ds = geocode(ds, id_col="page_id")
    ds = assign_cells(ds, resolutions=(5, 7, 9, 12))
    ds = broadcast_pip_join(ds, synth_aoi_polygons(args.aoi), how="inner", exact=True)
    ds = assign_tiles(ds, GridSpec.global_grid(args.zoom))
    written = write_partitioned_resumable(ds, args.output, "cell_r5",
                                          op_version="headline-job-v1")
    sec = time.perf_counter() - t0
    print(json.dumps({
        "partitions_written_this_run": len(written),
        "partitions_total": len(read_manifest(args.output)),
        "wall_sec": round(sec, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
