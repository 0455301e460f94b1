"""Training-data pipeline operators: dedup, similarity search, text
analysis, multimodal column plumbing (BASELINE.json north-star extras)."""
