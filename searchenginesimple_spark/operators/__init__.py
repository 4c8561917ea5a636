"""Relational/dataflow operators: dedup, posting construction, BM25 top-k, ANN."""
