"""Tiling offsets vs an in-test oracle that is a direct transcription of the
reference arithmetic (core_raster_offsets.py:143-304, array/patches/util.py:
68-97) — FIXTURES.md §4 requires bit-for-bit identical offset lists."""

from math import ceil

import pytest
from hypothesis import given, settings, strategies as st

from buteo_ray.grid import (
    compute_patch_positions,
    find_optimal_patch_factors,
    get_dither_offsets,
    get_patch_offsets,
    get_patch_offsets_fixed_size,
)


def _oracle_positions(length, patch_size, overlap, border_strategy):
    # Direct transcription of the reference loop for cross-checking.
    positions = []
    step = patch_size - overlap
    pos = 0
    while pos < length:
        if pos + patch_size > length:
            if border_strategy == 1:
                break
            elif border_strategy == 2:
                pos = length - patch_size
        if pos not in positions:
            positions.append(pos)
        if pos + patch_size >= length:
            break
        pos += step
    return positions


def test_positions_simple():
    assert compute_patch_positions(10, 5, 0, 1) == [0, 5]
    assert compute_patch_positions(10, 5, 0, 2) == [0, 5]
    assert compute_patch_positions(10, 5, 0, 3) == [0, 5]
    # 12 with patch 5: border strategies differ
    assert compute_patch_positions(12, 5, 0, 1) == [0, 5]
    assert compute_patch_positions(12, 5, 0, 2) == [0, 5, 7]
    assert compute_patch_positions(12, 5, 0, 3) == [0, 5, 10]


def test_positions_overlap():
    assert compute_patch_positions(10, 5, 2, 1) == [0, 3]
    # pos: 0,3,6(+5=11>10 → strat2 pos=5),... check oracle below too
    assert compute_patch_positions(10, 5, 2, 2) == _oracle_positions(10, 5, 2, 2)
    # Strategy 3 stops once a patch reaches the end (6+5 >= 10 → break).
    assert compute_patch_positions(10, 5, 2, 3) == [0, 3, 6]


def test_overlap_must_be_smaller():
    with pytest.raises(ValueError):
        compute_patch_positions(10, 5, 5, 1)


@settings(max_examples=200, deadline=None)
@given(
    length=st.integers(1, 400),
    patch=st.integers(1, 64),
    overlap=st.integers(0, 63),
    strategy=st.sampled_from([1, 2, 3]),
)
def test_positions_match_oracle(length, patch, overlap, strategy):
    if overlap >= patch:
        return
    if strategy == 2 and patch > length:
        # The reference oracle emits a negative position here, which GDAL
        # then rejects at read time; this engine rejects it up front.
        with pytest.raises(ValueError, match="border_strategy=2"):
            compute_patch_positions(length, patch, overlap, strategy)
        return
    assert compute_patch_positions(length, patch, overlap, strategy) == \
        _oracle_positions(length, patch, overlap, strategy)


def test_fixed_size_offsets_10x10():
    offs = get_patch_offsets_fixed_size((3, 10, 10), 5, 5)
    assert offs == [(0, 0, 5, 5), (5, 0, 5, 5), (0, 5, 5, 5), (5, 5, 5, 5)]


def test_fixed_size_border_strategy3_shrinks():
    offs = get_patch_offsets_fixed_size((1, 12, 12), 5, 5, border_strategy=3)
    assert (10, 10, 2, 2) in offs
    assert all(x + w <= 12 and y + h <= 12 for x, y, w, h in offs)


def test_fixed_size_border_strategy2_oversamples():
    offs = get_patch_offsets_fixed_size((1, 12, 12), 5, 5, border_strategy=2)
    assert all(w == 5 and h == 5 for _, _, w, h in offs)
    assert (7, 7, 5, 5) in offs


def test_optimal_patch_factors():
    assert find_optimal_patch_factors(1, 100, 100) == (1, 1)
    h, w = find_optimal_patch_factors(4, 100, 100)
    assert h * w == 4 and h == 2 and w == 2
    h, w = find_optimal_patch_factors(6, 300, 100)
    assert h * w == 6


def test_get_patch_offsets_covers_image():
    offs = get_patch_offsets((1, 100, 100), 4)
    assert len(offs) == 4
    covered = set()
    for x, y, w, h in offs:
        covered.update((yy, xx) for yy in range(y, y + h) for xx in range(x, x + w))
    assert len(covered) == 100 * 100


def test_get_patch_offsets_overlap_bounds():
    offs = get_patch_offsets((1, 100, 100), 4, overlap=10)
    half = ceil(10 / 2)
    for x, y, w, h in offs:
        assert x >= 0 and y >= 0 and x + w <= 100 and y + h <= 100
        assert w >= 50 and w <= 50 + half and h >= 50 and h <= 50 + half


def test_dither_offsets_reference_cases():
    assert get_dither_offsets(64, 0) == [(0, 0)]
    assert get_dither_offsets(64, 1) == [(0, 0), (32, 32)]
    assert get_dither_offsets(64, 3) == [(0, 0), (16, 16), (32, 32), (48, 48)]
    # Reference rounds to 2 decimals then truncates: int(round(256*2/3, 2)) == 170.
    assert get_dither_offsets(256, 2) == [(0, 0), (85, 85), (170, 170)]
    with pytest.raises(ValueError):
        get_dither_offsets(4, 4)
