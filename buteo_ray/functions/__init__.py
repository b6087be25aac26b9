"""Batch kernels: pure numpy functions applied inside ``map_batches``
stages — patch extraction/stitching, convolution, filters, morphology,
scalers, encodings, timeseries. Reference-parity semantics with citations
into /root/reference."""
