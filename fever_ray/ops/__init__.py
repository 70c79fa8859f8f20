"""Operator library: vectorized per-batch transforms and stateful actor stages."""
