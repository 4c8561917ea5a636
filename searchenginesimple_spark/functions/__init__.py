"""Vectorized scalar/array functions: tokenization, simhash, codecs, text stats."""
