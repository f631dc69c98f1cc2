"""Spark-facing ``st_*`` functions (to be populated)."""

__all__: list[str] = []
