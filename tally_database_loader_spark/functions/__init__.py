"""Expression language + scalar function library (SURVEY §2.C, §2.G)."""
