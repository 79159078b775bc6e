"""Large-scale data ops beyond the reference's own operator set: text
analysis, deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding cosine), similarity search, relational aggregates/joins/windows.

Every op here is a Ray Data pipeline over the driver's test tables and has a
DuckDB oracle twin in __ray_entry__.oracle_sql() unless stated otherwise.
"""
