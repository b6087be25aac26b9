#!/usr/bin/env python
"""Cluster job entrypoint for the training-data curation chain (north
rule: "run via ray job submit on fixed-size clusters").

On a real cluster:

    ray job submit --working-dir . -- python jobs/training_job.py \
        --input s3://bucket/docs/ --output s3://bucket/curated/

In this sandbox the same script runs against local parquet. The script
owns its Ray session (connects to the cluster when RAY_ADDRESS is set
by the job server, local otherwise) and writes through the resumable
partitioned sink — a preempted job re-submitted with the same
--output continues where it stopped, and the lineage manifest carries
per-partition rows/bytes/wall metrics.
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
    p.add_argument("--input", default="/root/testdata/sf0.01/documents.parquet",
                   help="parquet file/dir of documents (doc_id, text)")
    p.add_argument("--output", default="/tmp/buteo_ray_training_job",
                   help="resumable partitioned output directory")
    p.add_argument("--id-col", default="doc_id")
    # The 5 languages the stopword lang-ID stage can actually predict;
    # anything else scores 'und' and would be silently dropped.
    p.add_argument("--langs", default="en,de,fr,es,da")
    p.add_argument("--min-tokens", type=int, default=5)
    # 'embedding' needs an emb_col this text-only entrypoint doesn't
    # read — not offered here rather than failing after the lang pass.
    p.add_argument("--near-dup", default="minhash",
                   choices=["minhash", "simhash"])
    p.add_argument("--near-dup-threshold", type=float, default=0.85)
    p.add_argument("--scrub-pii", action="store_true")
    p.add_argument("--max-dup-bigram-frac", type=float, default=None)
    p.add_argument("--chunk-tokens", type=int, default=None,
                   help="emit overlap-window chunks instead of whole docs")
    p.add_argument("--chunk-overlap", type=int, default=16)
    p.add_argument("--mixture", default=None,
                   help='JSON dict of per-key keep rates, e.g. '
                        '\'{"src0": 0.5, "src1": 1.0}\' — keys absent '
                        "from the dict drop (rate 0)")
    p.add_argument("--mixture-key", default="source",
                   help="column holding the mixture key (read only when "
                        "--mixture is given)")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "local"),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from buteo_ray.pipelines.training_data import training_data_pipeline
    from buteo_ray.state.checkpoint import read_manifest

    mixture = json.loads(args.mixture) if args.mixture else None
    cols = [args.id_col, "text"]
    if mixture is not None:
        cols.append(args.mixture_key)

    t0 = time.perf_counter()
    ds = rd.read_parquet(args.input, columns=cols)
    written = training_data_pipeline(
        ds, id_col=args.id_col,
        mixture_fractions=mixture,
        mixture_key=args.mixture_key,
        keep_langs=set(args.langs.split(",")) if args.langs else None,
        min_tokens=args.min_tokens,
        near_dup_method=args.near_dup,
        near_dup_threshold=args.near_dup_threshold,
        scrub_pii=args.scrub_pii,
        max_dup_bigram_frac=args.max_dup_bigram_frac,
        chunk_tokens=args.chunk_tokens,
        chunk_overlap=args.chunk_overlap,
        write_to=args.output,
    )
    sec = time.perf_counter() - t0
    print(json.dumps({
        "partitions_written_this_run": len(written),
        "partitions_total": len(read_manifest(args.output)),
        "wall_sec": round(sec, 2),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
