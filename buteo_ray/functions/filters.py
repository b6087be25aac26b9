"""Filters, morphology and edge detection — the reference's filter
toolbox (``/root/reference/buteo/array/filters.py:15-618``,
``morphology.py:15-359``, ``edge_detection.py:15-122``) as thin
compositions over :mod:`buteo_ray.functions.convolution`. All operate on
2-D or channel-last 3-D arrays and are applied over halo-padded tiles
inside ``map_batches``."""

from __future__ import annotations

from typing import Optional

import numpy as np

from buteo_ray.functions.convolution import convolve, kernel_base, kernel_sobel


def filter_blur(arr, radius: float = 1.0, nodata: Optional[float] = None):
    return convolve(arr, kernel_base(radius, circular=True, distance_weighted=True,
                                     method=3, normalised=True), "sum", nodata)


def filter_median(arr, radius: float = 1.0, nodata: Optional[float] = None):
    return convolve(arr, kernel_base(radius, circular=True, normalised=False),
                    "median", nodata)


def filter_min(arr, radius: float = 1.0, nodata: Optional[float] = None):
    return convolve(arr, kernel_base(radius, circular=True, normalised=False), "min", nodata)


def filter_max(arr, radius: float = 1.0, nodata: Optional[float] = None):
    return convolve(arr, kernel_base(radius, circular=True, normalised=False), "max", nodata)


def filter_sum(arr, radius: float = 1.0, nodata: Optional[float] = None):
    return convolve(arr, kernel_base(radius, circular=True, normalised=False), "sum", nodata)


def filter_mean(arr, radius: float = 1.0, nodata: Optional[float] = None):
    return convolve(arr, kernel_base(radius, circular=True, normalised=False), "mean", nodata)


def filter_mode(arr, radius: float = 1.0, nodata: Optional[float] = None):
    return convolve(arr, kernel_base(radius, circular=True, normalised=False), "mode", nodata)


def filter_variance(arr, radius: float = 1.0, nodata: Optional[float] = None):
    return convolve(arr, kernel_base(radius, circular=True, normalised=True), "var", nodata)


def filter_standard_deviation(arr, radius: float = 1.0, nodata: Optional[float] = None):
    return convolve(arr, kernel_base(radius, circular=True, normalised=True), "std", nodata)


def filter_center_difference(arr, radius: float = 1.0, nodata: Optional[float] = None):
    return convolve(arr, kernel_base(radius, circular=True, normalised=False),
                    "center_difference", nodata)


def filter_quantile(arr, radius: float = 1.0, q: float = 0.5, nodata: Optional[float] = None):
    return convolve(arr, kernel_base(radius, circular=True, normalised=False),
                    "quantile", nodata, quantile=q)


# ------------------------------------------------------------ morphology


def morph_erode(arr, radius: float = 1.0, spherical: bool = True,
                nodata: Optional[float] = None):
    """Min filter over the structuring element (reference
    ``morphology.py:77-112``; weightless min = plain neighborhood min)."""
    k = kernel_base(radius, circular=spherical, normalised=False)
    return convolve(arr, (k > 0).astype(np.float32), "min", nodata)


def morph_dilate(arr, radius: float = 1.0, spherical: bool = True,
                 nodata: Optional[float] = None):
    k = kernel_base(radius, circular=spherical, normalised=False)
    return convolve(arr, (k > 0).astype(np.float32), "max", nodata)


def morph_open(arr, radius: float = 1.0, spherical: bool = True,
               nodata: Optional[float] = None):
    """Erode → dilate (reference ``morphology.py:149-188``)."""
    return morph_dilate(morph_erode(arr, radius, spherical, nodata), radius, spherical, nodata)


def morph_close(arr, radius: float = 1.0, spherical: bool = True,
                nodata: Optional[float] = None):
    """Dilate → erode (reference ``morphology.py:191-230``)."""
    return morph_erode(morph_dilate(arr, radius, spherical, nodata), radius, spherical, nodata)


def morph_tophat(arr, radius: float = 1.0, spherical: bool = True,
                 nodata: Optional[float] = None):
    """arr − opened (reference ``morphology.py:233-272``)."""
    return np.asarray(arr, dtype=np.float64) - morph_open(arr, radius, spherical, nodata)


def morph_bothat(arr, radius: float = 1.0, spherical: bool = True,
                 nodata: Optional[float] = None):
    """closed − arr (reference ``morphology.py:275-314``)."""
    return morph_close(arr, radius, spherical, nodata) - np.asarray(arr, dtype=np.float64)


def morph_difference(arr, radius: float = 1.0, spherical: bool = True,
                     nodata: Optional[float] = None):
    """dilate − erode (reference ``morphology.py:317-359``)."""
    return morph_dilate(arr, radius, spherical, nodata) - morph_erode(arr, radius, spherical, nodata)


# --------------------------------------------------------- edge detection


def filter_edge_detection(arr, nodata: Optional[float] = None):
    """Sobel gradient magnitude (reference ``edge_detection.py:15-122``)."""
    gx, gy = kernel_sobel()
    ex = convolve(arr, gx, "sum", nodata)
    ey = convolve(arr, gy, "sum", nodata)
    return np.sqrt(ex * ex + ey * ey)


def filter_unsharp(arr, nodata: Optional[float] = None):
    from buteo_ray.functions.convolution import kernel_unsharp

    return convolve(arr, kernel_unsharp(), "sum", nodata)
