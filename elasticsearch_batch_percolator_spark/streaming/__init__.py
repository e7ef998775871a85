from .percolate_stream import multi_percolate, percolate_stream  # noqa: F401
