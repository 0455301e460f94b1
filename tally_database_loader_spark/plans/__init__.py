"""Report/analytics query plans (SURVEY §2.F) and the driver-gate registry."""
