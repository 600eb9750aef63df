"""ertransfer_ray — a Ray-Data-native data-processing / entity-resolution engine.

A from-scratch re-implementation of the query and data-processing
capabilities of the reference harness still273/ertransfer (blocking →
pairwise matching → clustering over entity tables), re-expressed as
streaming Ray Data pipelines over Arrow batches:

- ``sources``   — readers and the deterministic synthetic web-page corpus
- ``functions`` — vectorized scalar/batch kernels (text normalization,
                  hashing/MinHash/SimHash, string similarity)
- ``stages``    — Dataset -> Dataset pipeline stages (blocking, scoring,
                  clustering, dedup, knn, joins, windows)
- ``pipelines`` — end-to-end wired pipelines + metrics/conformance layer
- ``state``     — per-partition lineage manifests for resumable output

Nothing in this package calls ``ray.init()``/``ray.shutdown()``; sessions
are owned by the caller (bench.py, CLI, test fixtures, or the driver).
"""

__version__ = "0.1.0"
