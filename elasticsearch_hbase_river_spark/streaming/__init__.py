"""Structured Streaming form of the river pipeline."""
