"""Continuous / incremental sync on Structured Streaming (SURVEY §2.H)."""
