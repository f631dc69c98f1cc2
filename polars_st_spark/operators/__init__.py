"""Distributed operators: spatial join, grouped spatial aggregation helpers,
dedup / similarity / text-analysis pipeline operators."""
