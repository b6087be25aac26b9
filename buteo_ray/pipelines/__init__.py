"""End-to-end pipelines and the driver-contract query registry."""

from buteo_ray.pipelines.flagship import flagship_pipeline

__all__ = ["flagship_pipeline"]
