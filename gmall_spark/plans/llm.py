"""LLM-training-data pipeline operators (dedup, similarity, text analysis)."""

from __future__ import annotations
