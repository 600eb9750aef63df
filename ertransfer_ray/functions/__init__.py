"""Vectorized batch kernels: text normalization, hashing, similarity."""
