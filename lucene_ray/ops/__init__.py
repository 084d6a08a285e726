# Training-data-pipeline operators: text stats, dedup, ANN.
# Import submodules directly (lucene_ray.ops.text, .dedup, .ann).
