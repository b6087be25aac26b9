"""buteo_ray — a from-scratch Ray-Data-native spatial data-processing engine.

Re-creates the query/data-processing capabilities of the reference engine
(casperfibaek/buteo, read-only at /root/reference) as streaming operators
over ``ray.data.Dataset`` pipelines of Arrow batches:

- grid/bbox/geotransform math with reference-exact arithmetic
  (``buteo_ray.grid``),
- pure-numpy geometry (WKB, point-in-polygon, spatial predicates,
  grid index) (``buteo_ray.geom``),
- sources/sinks for page tables, AOI layers and tile-row rasters
  (``buteo_ray.sources``),
- Dataset-level operators: geocode, cell assignment, spatial joins, kNN,
  tiling, zonal stats, dedup, text analysis, ANN (``buteo_ray.stages``),
- batch kernels: patches, convolution, filters, morphology, scalers,
  encodings (``buteo_ray.functions``),
- end-to-end pipelines + checkpoint/resume (``buteo_ray.pipelines``).

Nothing in this package calls ``ray.init``/``ray.shutdown`` — sessions are
owned by the caller (bench.py, tests/conftest.py, or the driver).
"""

__version__ = "0.1.0"
