"""Report/analytics query plans (SURVEY §2.F) and the driver-gate registry.

Importing this package registers every gate query: ``gate`` (report +
incremental operators) and ``llm_gate`` (training-data pipeline operators)
both append to ``gate.QUERIES`` / ``gate.ORACLES``.
"""

from . import gate  # noqa: F401
from . import llm_gate  # noqa: F401

QUERIES = gate.QUERIES
ORACLES = gate.ORACLES
