"""CLAHE + EFolki/GeFolki coregistration (the §2.3 family absent in
round 1; reference raster/gefolki.py, raster/coregister.py)."""

import numpy as np
import pytest

from buteo_ray.functions.convolution import convolve2d
from buteo_ray.functions.coregister import (
    clahe,
    coregister,
    efolki_flow,
    rank_transform,
    warp_bilinear,
)


@pytest.fixture
def textured():
    rng = np.random.default_rng(0)
    k = np.ones((7, 7)) / 49.0
    img = convolve2d(convolve2d(rng.normal(size=(140, 140)), k, "sum"), k, "sum")
    return img


def _shift(img, dy, dx):
    return warp_bilinear(img, np.full_like(img, -dx), np.full_like(img, -dy))


def test_efolki_recovers_known_shift(textured):
    moving = _shift(textured, 3.0, -2.0)
    u, v = efolki_flow(textured, moving, rank=None, levels=3)
    c = 30
    np.testing.assert_allclose(u[c:-c, c:-c].mean(), -2.0, atol=0.01)
    np.testing.assert_allclose(v[c:-c, c:-c].mean(), 3.0, atol=0.01)


def test_coregister_reduces_residual(textured):
    moving = _shift(textured, 3.0, -2.0)
    reg = coregister(textured, moving, rank=None, levels=3)
    c = 30
    before = np.abs(moving - textured)[c:-c, c:-c].mean()
    after = np.abs(reg - textured)[c:-c, c:-c].mean()
    assert after < before * 0.01


def test_gefolki_rank_mode_cross_modality(textured):
    """Nonlinear radiometry (exp) between the images — the rank
    transform makes the flow solvable anyway (the GeFolki SAR↔optical
    use case)."""
    moving = np.exp(_shift(textured, 3.0, -2.0) * 2.0)
    u, v = efolki_flow(textured, moving, rank=3, levels=3)
    c = 30
    np.testing.assert_allclose(u[c:-c, c:-c].mean(), -2.0, atol=0.05)
    np.testing.assert_allclose(v[c:-c, c:-c].mean(), 3.0, atol=0.05)


def test_rank_transform_properties(textured):
    r = rank_transform(textured, radius=2)
    assert r.min() >= 0.0 and r.max() <= 1.0
    # invariant under monotone radiometric changes
    r2 = rank_transform(np.exp(textured), radius=2)
    np.testing.assert_allclose(r, r2)


def test_clahe_properties():
    # constant image → zeros (no contrast to equalize)
    assert np.unique(clahe(np.full((64, 64), 5.0))).tolist() == [0.0]
    # output normalized to [0, 1]; low-contrast regions get stretched
    grad = np.tile(np.linspace(0, 1, 64), (64, 1)) ** 3
    out = clahe(grad, ntiles_x=4, ntiles_y=4)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # equalization flattens the histogram: the dark-crushed cubic ramp
    # must spread its mass (std of the histogram drops)
    h_in = np.histogram(grad, bins=16, range=(0, 1))[0]
    h_out = np.histogram(out, bins=16, range=(0, 1))[0]
    assert h_out.std() < h_in.std()
    # deterministic
    np.testing.assert_array_equal(out, clahe(grad, ntiles_x=4, ntiles_y=4))


def test_clahe_clip_limit_bounds_contrast():
    rng = np.random.default_rng(1)
    img = rng.normal(size=(64, 64))
    strong = clahe(img, clip_limit=1.0)   # no clipping: full equalization
    weak = clahe(img, clip_limit=0.005)   # heavy clipping: gentler mapping
    # heavier clipping → mapping closer to the identity ramp (less
    # contrast amplification): compare deviation from the global ramp
    lo, hi = img.min(), img.max()
    ramp = (img - lo) / (hi - lo)
    assert np.abs(weak - ramp).mean() <= np.abs(strong - ramp).mean() + 1e-9
