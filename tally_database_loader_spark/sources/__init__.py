"""Source connectors and the schema registry (SURVEY §2.A)."""
