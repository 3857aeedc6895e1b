"""Scalar function library (datetime, text, vector helpers)."""
