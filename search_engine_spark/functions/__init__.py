"""Scalar / vectorized text functions used by the engine's operators."""
