"""Deterministic synthetic fixtures (seeded; no external data)."""
