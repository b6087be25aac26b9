"""Pixel-offset tiling: the sharding unit of the engine.

Offsets are ``(x_start, y_start, x_size, y_size)`` int tuples — the same
tiling unit the reference uses for patch extraction and windowed reads
(semantics from ``/root/reference/buteo/core_raster/core_raster_offsets.py``;
each function cites the region whose arithmetic it reproduces exactly —
tile assignment must be bit-identical so distributed runs shard the same
way the reference does).

In the Ray engine these functions run driver-side (planning a tile grid)
or inside ``flat_map``-style generators emitting one row per tile.
"""

from __future__ import annotations

from math import ceil
from typing import List, Sequence, Tuple

Offset = Tuple[int, int, int, int]


def compute_patch_positions(
    length: int, patch_size: int, overlap: int, border_strategy: int
) -> List[int]:
    """Patch start positions along one axis.

    border_strategy: 1 = drop short border patches, 2 = shift the last patch
    back so it fits (oversample), 3 = let the last patch shrink. Matches
    reference ``core_raster_offsets.py:143-204`` (``_compute_patch_positions``)
    exactly, including the dedup-on-append and early-break behaviour.
    """
    positions: List[int] = []
    step = patch_size - overlap
    if step <= 0:
        raise ValueError("Overlap must be smaller than patch size.")
    if border_strategy == 2 and patch_size > length:
        # Shifting the last patch back would go negative; the reference's
        # GDAL windowed read fails loudly on negative offsets — match that
        # with a clear error instead of emitting a corrupt position.
        raise ValueError(
            f"border_strategy=2 needs patch_size <= axis length "
            f"(patch_size={patch_size}, length={length})"
        )

    pos = 0
    while pos < length:
        if pos + patch_size > length:
            if border_strategy == 1:
                break
            elif border_strategy == 2:
                pos = length - patch_size
            elif border_strategy == 3:
                pass  # strategy 3 keeps the position; the caller shrinks the final patch
        if pos not in positions:
            positions.append(pos)
        if pos + patch_size >= length:
            break
        pos += step

    return positions


def get_patch_offsets_fixed_size(
    image_shape: Sequence[int],
    patch_size_x: int,
    patch_size_y: int,
    border_strategy: int = 1,
    overlap: int = 0,
) -> List[Offset]:
    """Fixed-size tiling of a (channels, height, width) image.

    Returns row-major ``(x_start, y_start, x_size, y_size)`` offsets.
    Matches reference ``core_raster_offsets.py:207-304``
    (``_get_patch_offsets_fixed_size``) exactly, including border
    strategies 1/2/3 and the duplicate-position behaviour of strategy 2.
    """
    if patch_size_x <= 0 or patch_size_y <= 0:
        raise ValueError("patch sizes must be greater than 0.")
    if overlap < 0:
        raise ValueError("overlap must be non-negative.")
    if border_strategy not in (1, 2, 3):
        raise ValueError("border_strategy must be 1, 2, or 3.")
    if len(image_shape) != 3:
        raise ValueError("image_shape must have 3 dimensions (channels, height, width).")
    if overlap >= patch_size_x or overlap >= patch_size_y:
        raise ValueError("overlap must be smaller than patch sizes.")

    _channels, height, width = image_shape

    x_positions = compute_patch_positions(width, patch_size_x, overlap, border_strategy)
    y_positions = compute_patch_positions(height, patch_size_y, overlap, border_strategy)

    patch_offsets: List[Offset] = []
    for y_start in y_positions:
        for x_start in x_positions:
            x_pixels = patch_size_x
            y_pixels = patch_size_y
            if x_start + patch_size_x > width and border_strategy == 3:
                x_pixels = width - x_start
            if y_start + patch_size_y > height and border_strategy == 3:
                y_pixels = height - y_start
            x_pixels = min(x_pixels, width - x_start)
            y_pixels = min(y_pixels, height - y_start)
            if border_strategy in (1, 2) and (x_pixels != patch_size_x or y_pixels != patch_size_y):
                raise RuntimeError("Parsing error in offsets.")
            patch_offsets.append((x_start, y_start, x_pixels, y_pixels))

    return patch_offsets


def find_optimal_patch_factors(num_patches: int, width: int, height: int) -> Tuple[int, int]:
    """(h_patches, w_patches) split of an image into ``num_patches`` with
    minimal aspect-ratio + coverage waste. Matches reference
    ``core_raster_offsets.py:11-75`` (``_find_optimal_patch_factors``)."""
    if num_patches < 1:
        raise ValueError("num_patches must be greater than 0")
    if num_patches == 1:
        return (1, 1)

    best_factors = (1, 1)
    min_score = float("inf")
    target_aspect = width / height

    for i in range(1, num_patches + 1):
        if num_patches % i == 0:
            h_patches = i
            w_patches = num_patches // i
            patch_width = width / w_patches
            patch_height = height / h_patches
            aspect_diff = abs(patch_width / patch_height - target_aspect)
            total_pixels = width * height
            covered = (int(patch_width) * w_patches) * (int(patch_height) * h_patches)
            score = aspect_diff + (total_pixels - covered) / total_pixels
            if score < min_score:
                min_score = score
                best_factors = (h_patches, w_patches)

    return best_factors


def get_patch_offsets(
    image_shape: Sequence[int], num_patches: int, overlap: int = 0
) -> List[Offset]:
    """Divide a (channels, height, width) image into ``num_patches`` offsets
    (used for repartition planning). Matches reference
    ``core_raster_offsets.py:78-140`` (``_get_patch_offsets``)."""
    if len(image_shape) != 3:
        raise ValueError("image_shape must have 3 dimensions")
    if overlap < 0:
        raise ValueError("overlap must be non-negative")

    _channels, height, width = image_shape
    num_h, num_w = find_optimal_patch_factors(num_patches, width, height)

    offsets: List[Offset] = []
    for h in range(num_h):
        for w in range(num_w):
            h_start = h * (height // num_h)
            w_start = w * (width // num_w)
            h_end = height if h == num_h - 1 else (h + 1) * (height // num_h)
            w_end = width if w == num_w - 1 else (w + 1) * (width // num_w)
            offsets.append((w_start, h_start, w_end - w_start, h_end - h_start))

    if overlap > 0:
        overlap_half = ceil(overlap / 2)
        return [
            (
                max(0, x - overlap_half),
                max(0, y - overlap_half),
                min(size_x + overlap_half, width - max(0, x - overlap_half)),
                min(size_y + overlap_half, height - max(0, y - overlap_half)),
            )
            for x, y, size_x, size_y in offsets
        ]

    return offsets


def get_dither_offsets(tile_size: int, n_offsets: int) -> List[Tuple[int, int]]:
    """(y, x) offsets of the dithered patch grids: k·tile_size/(n+1) for
    k=0..n. Matches reference ``array/patches/util.py:68-97``
    (``_get_offsets``) exactly (round-then-int semantics included)."""
    import numpy as np

    if tile_size <= n_offsets:
        raise ValueError(f"Too many offsets ({n_offsets}) requested for tile_size {tile_size}")

    offset_props = np.arange(0, 1, 1 / (n_offsets + 1))[1:].tolist()
    offsets: List[Tuple[int, int]] = [(0, 0)]
    for val in offset_props:
        offset = int(round(val * tile_size, 2))
        offsets.append((offset, offset))
    return offsets


def split_number(num: int, parts: int):
    """Split ``num`` into ``parts`` near-equal integers, remainder
    distributed from the left (≙ reference utils_aux.py:190).

    >>> split_number(10, 3)
    [4, 3, 3]
    >>> split_number(10, 4)
    [3, 3, 2, 2]
    """
    if parts <= 0 or num < parts:
        raise ValueError("need 0 < parts <= num")
    base, rem = divmod(num, parts)
    return [base + 1 if i < rem else base for i in range(parts)]
