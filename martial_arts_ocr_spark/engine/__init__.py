"""Spark wiring: schemas, extraction job, partitioning, catalog, resume."""
