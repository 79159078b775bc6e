"""docling_serve_ray — a Ray-Data-native document conversion / extraction engine.

A from-scratch reimplementation of the data-processing capabilities of the
NikolasTh90/docling-serve reference (an asyncio FastAPI service wrapping the
docling conversion library) as a streaming ``ray.data.Dataset`` pipeline over
Arrow tables of interleaved text+media documents.

Layout:
    kernels/    pure-Python deterministic kernels (no Ray) — shared by the
                distributed pipeline and the sequential oracle used in tests
    stages/     Ray Data stage wrappers (map_batches UDFs + actor classes)
    pipelines/  end-to-end pipeline builders (read → convert → export → write)
    state/      checkpoint manifest / resume logic
    ops/        general-purpose large-scale data ops (dedup, similarity,
                text analysis, relational) used by __ray_entry__.queries()
    sources/    input readers (parquet / lance-style layout)
"""

__version__ = "0.1.0"
