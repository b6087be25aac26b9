"""Flagship pipeline (SURVEY.md §7.1): the spatial-join + tiling chain the
north rule measures.

read_parquet(documents) → geocode (deterministic hash-geocoder)
→ assign_cells (quadcell r5..r12 + Z-order key)
→ broadcast point-in-polygon join vs the AOI polygon layer
→ assign_tiles (global 256×256 grid)
[→ write_parquet partitioned by cell_r5]

Every stage is a stateless vectorized ``map_batches`` over zero-copy
Arrow; the only cross-task state is the broadcast AOI index (``ray.put``
once). No shuffle anywhere in this chain — at 100 TB it is pure
streaming map work, embarrassingly parallel over blocks. The ``text``
column is carried through untouched (byte-identity invariant per url).
"""

from __future__ import annotations

from typing import Optional

from buteo_ray.sources.aoi import synth_aoi_polygons
from buteo_ray.stages.cell_assign import assign_cells
from buteo_ray.stages.geocode import geocode
from buteo_ray.stages.join import broadcast_pip_join
from buteo_ray.stages.tiling import GridSpec, assign_tiles

DEFAULT_ZOOM = 10
DEFAULT_NUM_AOI = 1000


def flagship_pipeline(
    sf_dir: str,
    num_aoi: int = DEFAULT_NUM_AOI,
    zoom: int = DEFAULT_ZOOM,
    write_to: Optional[str] = None,
    concurrency: Optional[int] = None,
):
    """Run the flagship chain over ``{sf_dir}/documents.parquet``.

    Returns the final Dataset (one row per (document, matched AOI) with
    cell, tile and text columns), or writes partitioned parquet when
    ``write_to`` is given.
    """
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet")
    ds = geocode(ds, id_col="doc_id")
    ds = assign_cells(ds)
    aoi = synth_aoi_polygons(num_aoi)
    ds = broadcast_pip_join(ds, aoi, how="inner", exact=True, concurrency=concurrency)
    ds = assign_tiles(ds, GridSpec.global_grid(zoom))
    if write_to is not None:
        # Resumable sink: one atomic dir per cell_r5 partition + lineage
        # manifest; a rerun skips completed partitions. Shard count is
        # size-derived (1 at bench scale): the generator deliberately puts
        # ~30% of docs into one hot cell, which would otherwise become a
        # single giant write task at 100 TB.
        from buteo_ray.state.checkpoint import (derive_num_shards,
                                                write_partitioned_resumable)

        # hot_share=0.35: the generator's hot cell holds ~30% of docs, so
        # the shard count targets THAT partition's bytes, not the total.
        # On resume the recorded scheme wins (estimates drift between runs).
        shards = derive_num_shards(ds, out_dir=write_to, hot_share=0.35)
        return write_partitioned_resumable(
            ds, write_to, "cell_r5", op_version="flagship-v1",
            shard_col="doc_id", num_shards=shards)
    return ds
