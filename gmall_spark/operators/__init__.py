"""Reusable relational/stateful operators (dedup, windows, joins, UV…)."""
