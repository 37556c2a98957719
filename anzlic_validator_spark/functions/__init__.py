"""Scalar/vectorized functions: audio codecs + decode checks, hashing."""
