"""Sink/writer layer (SURVEY §2.B) — CSV, JSON, JDBC, CDM, config table."""

from .writers import (  # noqa: F401
    jdbc_writer_options,
    overwrite_table,
    write_cdm,
    write_config_table,
    write_csv,
    write_jdbc,
    write_json,
)
