# Submodules are imported directly (lucene_ray.index.build, .reader, ...)
# to keep `import lucene_ray.index.invert` cheap inside Ray workers.
