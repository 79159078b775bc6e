"""Ray Data stage wrappers: stateless map_batches UDFs and actor-pool
classes for the conversion pipeline."""
