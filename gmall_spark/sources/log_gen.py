"""Deterministic log-envelope derivation from the driver's ``events`` table
(FIXTURES.md §2) — filled in with the traffic pipelines."""

from __future__ import annotations
