"""Scalar/vectorized functions: tokenization, scoring, posting codec, text utils."""
