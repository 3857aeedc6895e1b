"""Structured Streaming shell over the batch-core pipelines."""
