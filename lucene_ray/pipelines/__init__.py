# Named pipelines used by __ray_entry__ and bench.py.
