"""Input sources: parquet corpus reader (pipelines.convert.read_input) and
the URL-manifest fetch stage (fetch.py)."""
