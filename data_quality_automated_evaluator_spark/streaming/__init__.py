"""Structured Streaming variants of the quality pipeline."""
