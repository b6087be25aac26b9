"""Patch (tile) extraction and stitching — reference-parity numpy kernels.

Semantics match ``/root/reference/buteo/array/patches/extraction.py`` and
``array/patches/util.py`` exactly, including the knowingly-duplicated
border patches of ``array_to_patches(border_check=True)``
(``extraction.py:229-233`` TODO) — parity requires reproducing the
duplicates, not fixing them (SURVEY.md §7.5).

Arrays are channel-last (H, W, C) like the reference's array module;
offsets are (y, x) pairs.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import numpy as np

from buteo_ray.grid.offsets import get_dither_offsets


def channel_first_to_last(arr: np.ndarray) -> np.ndarray:
    """(C, H, W) → (H, W, C); 4-D: (P, C, H, W) → (P, H, W, C).
    Reference ``array/utils_array.py:7-30``."""
    if arr.ndim == 3:
        return np.transpose(arr, (1, 2, 0))
    if arr.ndim == 4:
        return np.transpose(arr, (0, 2, 3, 1))
    raise ValueError("array must be 3D or 4D")


def channel_last_to_first(arr: np.ndarray) -> np.ndarray:
    """(H, W, C) → (C, H, W); 4-D: (P, H, W, C) → (P, C, H, W).
    Reference ``array/utils_array.py:31-55``."""
    if arr.ndim == 3:
        return np.transpose(arr, (2, 0, 1))
    if arr.ndim == 4:
        return np.transpose(arr, (0, 3, 1, 2))
    raise ValueError("array must be 3D or 4D")


def array_to_patches_single(
    arr: np.ndarray,
    tile_size: int,
    offset: Optional[Sequence[int]] = None,
) -> np.ndarray:
    """(H, W, C) → (P, t, t, C) grid patches from one (y, x) offset.
    Reference ``extraction.py:18-76`` (reshape/swapaxes construction)."""
    if offset is None:
        offset = [0, 0]
    patches_y = (arr.shape[0] - offset[0]) // tile_size
    patches_x = (arr.shape[1] - offset[1]) // tile_size
    cut_y = -((arr.shape[0] - offset[0]) % tile_size) or None
    cut_x = -((arr.shape[1] - offset[1]) % tile_size) or None
    reshaped = arr[offset[0]:cut_y, offset[1]:cut_x].reshape(
        patches_y, tile_size, patches_x, tile_size, arr.shape[2]
    )
    return reshaped.swapaxes(1, 2).reshape(-1, tile_size, tile_size, arr.shape[2])


def patches_to_array_single(
    patches: np.ndarray,
    shape: Sequence[int],
    tile_size: int,
    offset: Optional[Sequence[int]] = None,
    background_value: Optional[Union[int, float]] = None,
) -> np.ndarray:
    """Stitch (P, t, t, C) patches back into an (H, W, C) array; uncovered
    pixels get nan / int-min / ``background_value``.
    Reference ``extraction.py:78-173``."""
    if offset is None:
        offset = [0, 0]
    if background_value is None:
        if patches.dtype.kind in "ui":
            target = np.full(shape, np.iinfo(patches.dtype).min, dtype=patches.dtype)
        else:
            target = np.full(shape, np.nan, dtype=patches.dtype)
    else:
        target = np.full(shape, background_value, dtype=patches.dtype)

    target_y = ((shape[0] - offset[0]) // tile_size) * tile_size
    target_x = ((shape[1] - offset[1]) // tile_size) * tile_size
    cut_y = -((shape[0] - offset[0]) % tile_size) or None
    cut_x = -((shape[1] - offset[1]) % tile_size) or None
    num_y = target_y // tile_size
    num_x = target_x // tile_size

    reshape = patches.reshape(num_y, num_x, tile_size, tile_size, patches.shape[3], 1)
    destination = reshape.swapaxes(1, 2).reshape(
        num_y * tile_size, num_x * tile_size, patches.shape[3]
    )
    target[offset[0]:cut_y, offset[1]:cut_x] = destination
    return target


def _borders_are_necessary(arr, tile_size, offset) -> Tuple[bool, bool]:
    height, width = arr.shape[0], arr.shape[1]
    return ((height - offset[0]) % tile_size != 0,
            (width - offset[1]) % tile_size != 0)


def array_to_patches(
    arr: np.ndarray,
    tile_size: int,
    *,
    n_offsets: int = 0,
    border_check: bool = True,
    channel_last: bool = True,
) -> np.ndarray:
    """Multi-grid patch extraction: n_offsets dithered grids plus border
    grids when needed. Reference ``extraction.py:176-249`` exactly —
    including the possible duplicate border patches (:229-233)."""
    if not channel_last:
        arr = channel_first_to_last(arr)
    if arr.shape[0] < tile_size or arr.shape[1] < tile_size:
        raise ValueError("Array must be larger or equal to tile_size")

    offsets = get_dither_offsets(tile_size, n_offsets)

    if border_check:
        borders_y, borders_x = True, True
        for off in offsets:
            oy, ox = _borders_are_necessary(arr, tile_size, off)
            borders_y &= oy
            borders_x &= ox
            if not borders_y and not borders_x:
                break
        if borders_y or borders_x:
            offsets.append((0, arr.shape[1] - tile_size))
            offsets.append((arr.shape[0] - tile_size, 0))
            offsets.append((arr.shape[0] - tile_size, arr.shape[1] - tile_size))

    patches = np.concatenate(
        [array_to_patches_single(arr, tile_size, off) for off in offsets], axis=0
    )
    if not channel_last:
        patches = channel_last_to_first(patches)
    return patches


def get_kernel_weights(
    tile_size: int = 64, edge_distance: int = 5, epsilon: float = 1e-7
) -> np.ndarray:
    """Edge-distance weight kernel for overlapping-prediction merges.
    Reference ``array/patches/util.py:11-66`` (vectorized, same values)."""
    if not 0 <= edge_distance < tile_size // 2:
        raise ValueError("edge_distance must be in [0, tile_size/2)")
    if edge_distance == 0:
        # No feathering: uniform weights (the 0/0 division below would
        # silently produce an all-NaN kernel; the reference crashes here).
        return np.ones((tile_size, tile_size), dtype=np.float32)
    idx = np.arange(tile_size, dtype=np.float64)
    max_dist = edge_distance * 2
    val_top = np.maximum(edge_distance - idx, 0.0)
    val_bot = np.maximum((1 + edge_distance) - (tile_size - idx), 0.0)
    val_1d = val_top + val_bot
    val = (max_dist - np.abs(val_1d[:, None] + val_1d[None, :])) / max_dist
    val = np.where(val <= 0.0, epsilon, val)
    return val.astype(np.float32)


def patches_to_weights(patches: np.ndarray, edge_distance: int) -> np.ndarray:
    """(P, t, t, C) patches → (P, t, t, 1) edge weights.
    Reference ``array/patches/util.py:186-214``."""
    if patches.ndim != 4 or patches.shape[1] != patches.shape[2]:
        raise ValueError("patches must be 4D and square")
    w = get_kernel_weights(patches.shape[1], edge_distance)
    return np.repeat(w[np.newaxis, ...], patches.shape[0], axis=0)[..., np.newaxis]
