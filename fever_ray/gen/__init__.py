"""Deterministic synthetic-data generators (seeded; no wall clock)."""
