"""Pure deterministic kernels — no Ray imports allowed in this subpackage.

Every kernel here is used twice: by the distributed pipeline (inside
map_batches UDFs / actor classes) and by the sequential oracle
(`docling_serve_ray.corpus.oracle_convert`) that the correctness tests
compare against. Keeping them pure functions is what makes span-sequence
equality under parallelism testable.
"""
