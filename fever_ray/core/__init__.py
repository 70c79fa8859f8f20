"""Mergeable-UDAF driver: per-batch sketch partials → associative merges."""
