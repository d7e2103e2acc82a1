"""Distributed operators: tile joins, kNN, dedup, ANN, remap, stats,
rollups, raster↔vector joins, as-of joins."""
